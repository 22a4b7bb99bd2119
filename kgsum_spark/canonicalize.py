"""Canonicalization: iterative connected components over mention-similarity
edges, then canonical-id minting.

Algorithm: min-label propagation with pointer jumping — each round every
node takes the min of (its label, its neighbors' labels, its label's
label). Pointer jumping gives O(log d) rounds on diameter-d components
(components in mention graphs are star-ish; the synthetic spine includes a
12-node chain to prove multi-hop convergence). `localCheckpoint()` per
round truncates the plan lineage that would otherwise grow linearly — the
standard fix for iterative DataFrame algorithms.

Reference analog: kgsum only *collects* the owl:sameAs edge set
(/root/reference/src/dataset_preparation.py:354-368); closure/canonical
ids have no reference counterpart and are specified by the north_rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """nodes(norm) ∪ edges(a, b) → (norm, label) with label = component min.

    Convergence is checked with a single count aggregate per round
    (`agg(sum(changed))` pattern); max_iter is a safety bound, hit only on
    pathological inputs (a chain of length 2^50).
    """
    sym = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    lab = nodes.select(F.col("norm").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        nmin = (
            sym.join(lab, sym.a == lab.node)
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        l2 = (
            lab.join(nmin, "node", "left")
            .select("node", F.least("label", "nlabel").alias("label"))
        )
        # pointer jump: label := label(label)
        ptr = l2.select(F.col("node").alias("label"), F.col("label").alias("plabel"))
        l3 = (
            l2.join(ptr, "label", "left")
            .select("node", F.least("label", "plabel").alias("label"))
        ).localCheckpoint()
        changed = (
            l3.join(lab.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        lab = l3
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
