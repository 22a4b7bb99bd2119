"""Candidate entity linking: token-blocking + similarity joins, with
hot-key salting utilities for skewed blocks.

Design for 10^12-turn scale: similarity runs over the *distinct normalized
vocabulary* (norms), not over mention occurrences — dedup-before-join
collapses the power-law occurrence skew (a hot entity appearing in 10% of
turns is still ONE vocabulary row). The occurrence→canonical mapping is a
broadcast join of the small vocabulary map against the big triples table;
`salted_broadcast_map` provides the salted shuffle-join fallback for when
the vocabulary itself outgrows broadcast.

Reference analog: the owl:sameAs edge set (select_local_con,
/root/reference/src/dataset_preparation.py:354-368) is the only linking
signal kgsum has; we add token-blocking similarity edges on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rules import JACCARD_THRESHOLD
from .schemas import PRED_SAMEAS


def distinct_norms(mentions: DataFrame) -> DataFrame:
    """Vocabulary table: one row per normalized mention, with its block key
    and token set. This is the skew-collapsing dedup."""
    return (
        mentions.select("norm", "block_key")
        .distinct()
        .withColumn("tokens", F.split(F.col("norm"), " "))
    )


def similarity_edges(norms: DataFrame, threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Within-block self-join, token-set Jaccard ≥ threshold → edges(a, b).

    The self-join is on block_key (hash shuffle); a < b halves the pairs.
    Jaccard via array_intersect/size — all JVM expressions, codegen'd.
    At scale: block sizes are bounded by vocabulary (not corpus) frequency;
    AQE skew-join splits any residual hot block.
    """
    a = norms.select(
        F.col("norm").alias("a"), F.col("block_key").alias("bk"),
        F.col("tokens").alias("ta"),
    )
    b = norms.select(
        F.col("norm").alias("b"), F.col("block_key").alias("bk"),
        F.col("tokens").alias("tb"),
    )
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    union = F.size(F.col("ta")) + F.size(F.col("tb")) - inter
    return (
        a.join(b, "bk")
        .filter(F.col("a") < F.col("b"))
        .withColumn("jac", inter / union)
        .filter(F.col("jac") >= threshold)
        .select("a", "b")
    )


def sameas_edges(raw_triples: DataFrame) -> DataFrame:
    """Explicit alias edges from extracted `owl:sameAs` triples whose object
    is itself a mention (the 'also known as' rule) — normalized pairs."""
    norm = lambda c: F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))  # noqa: E731
    return (
        raw_triples.filter((F.col("pred") == PRED_SAMEAS) & F.col("obj_is_mention"))
        .select(norm(F.col("subj")).alias("a"), norm(F.col("obj")).alias("b"))
        .filter((F.col("a") != "") & (F.col("b") != ""))
        .distinct()
    )


def all_edges(mentions: DataFrame, raw_triples: DataFrame,
              norms: DataFrame | None = None) -> DataFrame:
    """similarity ∪ sameAs edges. Pass a pre-materialized `norms`
    (distinct_norms output, e.g. localCheckpointed) to avoid recomputing
    the mention scan for the similarity side."""
    if norms is None:
        norms = distinct_norms(mentions)
    return similarity_edges(norms).unionByName(sameas_edges(raw_triples)).distinct()


def salted_broadcast_map(
    big: DataFrame, mapping: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skew-proof equi-join of a big fact table against a mapping table.

    Salts the big side's key (`pmod(hash(full row key), n_salts)`) and
    replicates the mapping ×n_salts, so one hot key spreads over n_salts
    reducers even under a shuffle join. Used when `mapping` outgrows the
    broadcast threshold; otherwise `big.join(broadcast(mapping), key)` wins
    (no shuffle at all) and is what the pipeline does by default.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(F.col(key), F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salted_map = mapping.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(salted_map, [key, "_salt"], "left").drop("_salt")
    return out


def minhash_similarity_edges(norms: DataFrame,
                             threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """MinHash+LSH alternative to token-blocking for the similarity edges
    (the north_rule names both): unigram shingles over the normalized
    vocabulary = token-SET Jaccard, exact-verified on LSH candidates.

    Strictly higher recall than token-blocking at the same threshold:
    blocking only pairs norms sharing their FIRST token, minhash pairs any
    candidates with overlapping token sets ('acme labs' ↔ 'labs acme').
    Cost is vocabulary-sized either way (linking dedups before similarity).
    """
    from .datapipe.dedup import minhash_neardup_verified

    df = norms.select(F.col("norm"))
    return (
        minhash_neardup_verified(df, id_col="norm", text_col="norm",
                                 n=1, threshold=threshold)
        .select("a", "b")
    )
