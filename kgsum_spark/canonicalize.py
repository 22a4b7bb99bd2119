"""Canonicalization: iterative connected components over mention-similarity
edges, then canonical-id minting.

Algorithm: min-label propagation with pointer jumping — each round every
node takes the min of (its label, its neighbors' labels, its label's
label). Pointer jumping gives O(log d) rounds on diameter-d components
(components in mention graphs are star-ish; the synthetic spine includes a
12-node chain to prove multi-hop convergence). `localCheckpoint()` per
round truncates the plan lineage that would otherwise grow linearly — the
standard fix for iterative DataFrame algorithms.

Scale design: the node set is the *distinct normalized mention vocabulary*
(linking.py dedups before similarity), which is orders of magnitude smaller
than the corpus — even a 10^12-turn corpus has a vocabulary in the
10^6-10^8 range. The loop therefore repartitions its tables to a size
proportional to the vocabulary (`~100k nodes per partition`), not to the
session's corpus-sized shuffle setting — at bench scale that collapses
every round to single-task jobs (11.5s → ~2s for a 230-node graph), and at
100 TB it spreads exactly as wide as the data needs.

Reference analog: kgsum only *collects* the owl:sameAs edge set
(/root/reference/src/dataset_preparation.py:354-368); closure/canonical
ids have no reference counterpart and are specified by the north_rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_cc(spark, lab: DataFrame, edges: DataFrame) -> DataFrame:
    """Small-graph fast path: classic union-find on the driver. The
    iterative DataFrame loop costs ~10 s of fixed multi-job latency per
    run; a vocabulary-sized graph under the threshold is a few MB — solve
    it in milliseconds and ship the map back. Same deterministic min-label
    semantics as the distributed loop (tests assert equality)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes_local = [r[0] for r in lab.select("node").collect()]
    for a, b in edges.select("a", "b").collect():
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in nodes_local]
    return spark.createDataFrame(rows, "node string, label string")


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 50,
    rows_per_partition: int = 100_000, driver_threshold: int = 1_000_000,
    driver_edge_threshold: int = 20_000_000,
) -> DataFrame:
    """nodes(norm) ∪ edges(a, b) → (norm, label) with label = component min.

    Scale-adaptive: graphs with ≤ driver_threshold nodes AND ≤
    driver_edge_threshold edges solve driver-side (union-find,
    milliseconds); larger ones run the distributed loop. The edge gate
    matters independently of the node gate: blocking-based similarity
    edges are O(block²), so a modest vocabulary with one hot block can
    produce tens of millions of edges — collecting those would OOM the
    driver even though the node set fits. Convergence in the distributed
    loop is decided from a `changed` flag computed inside the same round
    (one aggregate over the just-checkpointed frame — no extra join);
    max_iter is a safety bound, hit only on pathological inputs (a chain
    of length 2^50).
    """
    lab = nodes.select(F.col("norm").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()
    n_nodes = lab.count()
    # One materialization serves the edge-count gate and whichever path
    # runs (driver collect / distributed loop) — no double computation of
    # the upstream similarity-edge plan.
    edges = edges.select("a", "b").localCheckpoint()
    if n_nodes <= driver_threshold and edges.count() <= driver_edge_threshold:
        out = _driver_cc(nodes.sparkSession, lab, edges)
        return out.select(F.col("node").alias("norm"), "label")
    nparts = max(2, min(int(n_nodes // rows_per_partition) + 1, 10_000))
    lab = lab.repartition(nparts, "node").localCheckpoint()
    sym = (
        edges.select("a", "b")
        .unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(nparts, "b")
        .localCheckpoint()
    )

    for _ in range(max_iter):
        nmin = (
            sym.join(lab, sym.a == lab.node)
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        l2 = (
            lab.join(nmin, "node", "left")
            .select("node", "label", F.least("label", "nlabel").alias("l2"))
        )
        # pointer jump: candidate := label(l2)
        ptr = lab.select(F.col("node").alias("l2"), F.col("label").alias("plabel"))
        l3 = (
            l2.join(ptr, "l2", "left")
            .select(
                "node",
                F.least("l2", "plabel").alias("newlabel"),
                (F.least("l2", "plabel") != F.col("label")).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = l3.agg(F.sum(F.col("chg").cast("int"))).first()[0] or 0
        lab = l3.select("node", F.col("newlabel").alias("label"))
        if changed == 0:
            break
    return lab.select(F.col("node").alias("norm"), "label")


def canonical_map(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(norm, canonical_id) — canonical id is minted from the component's
    lexicographically-min norm: `ent:<min_norm with spaces→_>` (deterministic
    analog of the reference's URL-encoded IRI mint,
    /root/reference/src/generate_profile.py:226-237)."""
    cc = connected_components(nodes, edges)
    return cc.select(
        "norm",
        F.concat(F.lit("ent:"), F.regexp_replace("label", " ", "_")).alias("canonical_id"),
    )
