"""Connected-components convergence: chains, hubs, singletons (FIXTURES.md §3)."""

from __future__ import annotations

from kgsum_spark.canonicalize import canonical_map, connected_components


def _run(spark, nodes, edges):
    ndf = spark.createDataFrame([(n,) for n in nodes], "norm string")
    edf = spark.createDataFrame(edges or [("_", "_")], "a string, b string")
    if not edges:
        edf = edf.filter("a != a")
    return {
        r["norm"]: r["label"] for r in connected_components(ndf, edf).collect()
    }


def test_chain_20(spark):
    nodes = [f"e{i:02d}" for i in range(20)]
    edges = [(f"e{i:02d}", f"e{i+1:02d}") for i in range(19)]
    lab = _run(spark, nodes, edges)
    assert set(lab.values()) == {"e00"}


def test_hub_component_and_singleton(spark):
    nodes = ["hub"] + [f"s{i}" for i in range(6)] + ["lonely"]
    edges = [("hub", f"s{i}") for i in range(6)]
    lab = _run(spark, nodes, edges)
    assert lab["lonely"] == "lonely"
    assert {lab[n] for n in nodes if n != "lonely"} == {"hub"}


def test_two_components(spark):
    nodes = ["a1", "a2", "b1", "b2"]
    lab = _run(spark, nodes, [("a1", "a2"), ("b1", "b2")])
    assert lab["a1"] == lab["a2"] == "a1"
    assert lab["b1"] == lab["b2"] == "b1"


def test_canonical_map_mint(spark):
    ndf = spark.createDataFrame([("zorblax labs",), ("zorblax",)], "norm string")
    edf = spark.createDataFrame([("zorblax labs", "zorblax")], "a string, b string")
    got = {r["norm"]: r["canonical_id"] for r in canonical_map(ndf, edf).collect()}
    assert got == {"zorblax labs": "ent:zorblax", "zorblax": "ent:zorblax"}


def test_distributed_loop_matches_driver_cc(spark):
    """Force the distributed path (threshold=0) and assert identical labels."""
    import random

    from kgsum_spark.canonicalize import connected_components

    rnd = random.Random(9)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(0, 40)]          # long chain
    edges += [(f"n{rnd.randrange(60, 120):03d}", f"n{rnd.randrange(60, 120):03d}")
              for _ in range(40)]                                          # random clumps
    ndf = spark.createDataFrame([(n,) for n in nodes], "norm string")
    edf = spark.createDataFrame(edges, "a string, b string")
    dist = {r["norm"]: r["label"] for r in
            connected_components(ndf, edf, driver_threshold=0).collect()}
    drv = {r["norm"]: r["label"] for r in
           connected_components(ndf, edf, driver_threshold=10**9).collect()}
    assert dist == drv


def test_hot_block_edge_count_routes_to_distributed_path(spark, monkeypatch):
    """A small vocabulary with one hot block (quadratic similarity edges)
    must NOT take the driver collect — the edge gate, not the node gate,
    decides. _driver_cc is patched to fail loudly if reached."""
    import itertools

    import kgsum_spark.canonicalize as canon

    nodes = [f"h{i:02d}" for i in range(30)]
    edges = list(itertools.combinations(nodes, 2))  # 435 edges, 30 nodes

    def boom(*a, **k):
        raise AssertionError("driver fast path taken despite edge overflow")

    monkeypatch.setattr(canon, "_driver_cc", boom)
    ndf = spark.createDataFrame([(n,) for n in nodes], "norm string")
    edf = spark.createDataFrame(edges, "a string, b string")
    lab = {r["norm"]: r["label"] for r in
           canon.connected_components(
               ndf, edf, driver_threshold=10**9, driver_edge_threshold=100
           ).collect()}
    assert set(lab.values()) == {"h00"}  # one component, min-label h00
