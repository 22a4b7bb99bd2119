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


def _driver_cc(spark, nodes_local: list, edges_local: list) -> DataFrame:
    """Small-graph fast path: classic union-find on the driver over
    already-collected node/edge lists. The iterative DataFrame loop costs
    ~10 s of fixed multi-job latency per run; a vocabulary-sized graph
    under the threshold is a few MB — solve it in milliseconds and ship
    the map back. Same deterministic min-label semantics as the
    distributed loop (tests assert equality)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges_local:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in nodes_local]
    return spark.createDataFrame(rows, "node string, label string")


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 50,
    rows_per_partition: int = 100_000, driver_threshold: int = 1_000_000,
    driver_edge_threshold: int = 2_000_000,
    stats_out: dict | None = None,
) -> DataFrame:
    """nodes(norm) ∪ edges(a, b) → (norm, label) with label = component min.

    Scale-adaptive: graphs with ≤ driver_threshold nodes AND ≤
    driver_edge_threshold edges solve driver-side (union-find,
    milliseconds); larger ones run the distributed loop. The edge gate
    matters independently of the node gate: blocking-based similarity
    edges are O(block²), so a modest vocabulary with one hot block can
    produce tens of millions of edges — collecting those would OOM the
    driver even though the node set fits.

    driver_edge_threshold = 2M is MEASURED, not asserted (r5, local[32],
    24g driver): collect wall / union-find wall / peak python RSS were
    10s/4s/1.0GB at 2M two-string edge rows, 21s/10s/2.2GB at 5M,
    150s/75s/8.2GB at 20M (the r4 default — strictly worse than the
    ~10s distributed loop it was supposed to undercut, and past the 8g
    default driver heap). 2M is the break-even with the distributed
    loop's fixed multi-job cost; an over-threshold graph's wasted probe
    is bounded at T+1 rows ≈ 10s and ~1GB, never the unbounded collect.

    The gates are probed with capped collects (`limit(threshold+1)`):
    for the common small-vocabulary case the probe IS the fetch, so the
    fast path costs exactly two jobs (nodes, edges) instead of the
    checkpoint+count+collect triple per side it used to — those four
    extra scheduling-bound round-trips were ~half the entities stage's
    fixed cost at bench scale. An over-threshold graph abandons the
    capped rows and falls through to the distributed loop, which
    re-materializes what it needs; that extra compute is noise next to
    the loop itself. Convergence in the distributed loop is decided from
    a `changed` flag computed inside the same round (one aggregate over
    the just-checkpointed frame — no extra join); max_iter is a safety
    bound, hit only on pathological inputs (a chain of length 2^50).
    """
    node_plan = nodes.select(F.col("norm").alias("node")).distinct()
    edge_plan = edges.select("a", "b")
    node_rows = node_plan.limit(driver_threshold + 1).collect()
    if stats_out is not None:
        # r6: expose what the gate probe already learned — the exact node
        # count when the graph fit under the driver threshold, else None.
        # Callers (survivors_from_pairs) size their drop-set broadcast
        # decision from this for free instead of running another count.
        stats_out["n_nodes"] = (
            len(node_rows) if len(node_rows) <= driver_threshold else None
        )
    if len(node_rows) <= driver_threshold:
        edge_rows = edge_plan.limit(driver_edge_threshold + 1).collect()
        if len(edge_rows) <= driver_edge_threshold:
            out = _driver_cc(
                nodes.sparkSession,
                [r[0] for r in node_rows],
                [(r[0], r[1]) for r in edge_rows],
            )
            return out.select(F.col("node").alias("norm"), "label")
    lab = node_plan.withColumn("label", F.col("node")).localCheckpoint()
    n_nodes = lab.count()
    edges = edge_plan.localCheckpoint()
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
