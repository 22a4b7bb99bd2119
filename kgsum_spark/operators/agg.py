"""Aggregations, top-k, sampling, voting (SURVEY.md §2.5/§2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_group_count(df: DataFrame, key: str, k: int = 1000,
                     count_alias: str = "cnt") -> DataFrame:
    """A1/Q2/Q3 — GROUP BY key, COUNT, ORDER BY count DESC LIMIT k
    (/root/reference/src/dataset_preparation.py:65-87). Ties broken by key
    ascending so top-k *membership* is deterministic (the reference's
    unordered LIMIT is not — SURVEY.md §7 hard-part 4). Physical plan:
    partial+final hash agg, then TakeOrderedAndProject (no full sort)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .orderBy(F.col(count_alias).desc(), F.col(key).asc())
        .limit(k)
    )


def set_union_agg(df: DataFrame, group: str, col: str,
                  alias: str = "vals") -> DataFrame:
    """A3 — per-group sorted distinct values
    (remove_duplicates sorted-set, /root/reference/src/preprocessing.py:178-188)."""
    return df.groupBy(group).agg(
        F.array_sort(F.collect_set(col)).alias(alias)
    )


def vote_argmax(df: DataFrame, group: str, label: str,
                alias: str = "winner") -> DataFrame:
    """A4 — plurality vote per group: most frequent label, ties broken
    lexicographically (majority_vote, /root/reference/src/pipeline_build.py:107-149;
    plurality variant /root/reference/src/autoencoder_pipeline.py:371-387)."""
    counts = df.groupBy(group, label).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(group).orderBy(F.col("_n").desc(), F.col(label).asc())
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(group, F.col(label).alias(alias))
    )


def score_argmax(df: DataFrame, group: str, label: str, score: str,
                 alias: str = "winner") -> DataFrame:
    """A4 (score variant) — best score wins, ties broken by label
    (/root/reference/src/pipeline_build.py:107-149: best accuracy wins,
    fallback first)."""
    w = Window.partitionBy(group).orderBy(F.col(score).desc(), F.col(label).asc())
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(group, F.col(label).alias(alias))
    )


def keep_last(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """J3 — keep-last dedup with EXPLICIT ordering (the reference's pandas
    drop_duplicates keep='last', /root/reference/src/util.py:235, depends on
    implicit row order; distributed engines must name the order column)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )


def systematic_sample(df: DataFrame, group: str, order_col: str,
                      every: int) -> DataFrame:
    """A6 (deterministic analog) — per-group systematic sample: every Nth
    row in a stable order. The reference's oversample/stratified split
    (/root/reference/src/pipeline_build.py:217-236) is seeded-random; for
    oracle-checkable determinism across engines we expose the systematic
    variant; seeded sampling is `stratified_oversample` below."""
    w = Window.partitionBy(group).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter((F.col("_r") - 1) % every == 0)
        .drop("_r")
    )


def stratified_oversample(df: DataFrame, label: str, seed: int = 42,
                          factor: float = 3.0) -> DataFrame:
    """A6 — oversample minority classes toward the majority count, capped at
    len*factor (/root/reference/src/pipeline_build.py:217-236). Integer part
    via explode(array_repeat), fractional remainder via seeded sampleBy —
    fully distributed, no driver-side concat."""
    counts = {r[label]: r["n"] for r in
              df.groupBy(label).agg(F.count(F.lit(1)).alias("n")).collect()}
    if not counts:
        return df
    target = max(counts.values())
    whole, frac = {}, {}
    for k, n in counts.items():
        desired = min(target, int(n * factor))
        whole[k] = desired // n
        frac[k] = desired / n - whole[k]
    rep = F.create_map(*[x for k in whole for x in (F.lit(k), F.lit(whole[k]))])
    replicated = (
        df.withColumn("_rep", rep[F.col(label)])
        .withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("_rep"))))
        .drop("_rep", "_i")
    )
    remainder = df.sampleBy(label, fractions=frac, seed=seed)
    return replicated.unionByName(remainder)


def stratified_split(df: DataFrame, label: str, weights=(0.8, 0.1, 0.1),
                     seed: int = 42):
    """A7 — stratified train/val/test split
    (/root/reference/src/pipeline_build.py:424-439, 80/10/10 seed 42).
    Deterministic hash-free split via seeded rand + per-class quantile-free
    thresholding (proportions hold in expectation per class)."""
    r = df.withColumn("_u", F.rand(seed))
    w1, w2 = weights[0], weights[0] + weights[1]
    train = r.filter(F.col("_u") < w1).drop("_u")
    val = r.filter((F.col("_u") >= w1) & (F.col("_u") < w2)).drop("_u")
    test = r.filter(F.col("_u") >= w2).drop("_u")
    return train, val, test


def classification_metrics(df: DataFrame, label: str, pred: str) -> DataFrame:
    """A8 — accuracy + per-class precision/recall/F1 from (label, pred)
    (/root/reference/src/pipeline_build.py:539-561). One shuffle: a single
    groupBy over the confusion pairs, then tiny driver-side math-free
    aggregation expressed relationally."""
    pairs = df.groupBy(label, pred).agg(F.count(F.lit(1)).alias("n"))
    tp = (
        pairs.filter(F.col(label) == F.col(pred))
        .select(F.col(label).alias("cls"), F.col("n").alias("tp"))
    )
    actual = pairs.groupBy(label).agg(F.sum("n").alias("support")) \
        .withColumnRenamed(label, "cls")
    predicted = pairs.groupBy(pred).agg(F.sum("n").alias("predicted")) \
        .withColumnRenamed(pred, "cls")
    out = (
        actual.join(predicted, "cls", "outer")
        .join(tp, "cls", "left")
        .na.fill({"tp": 0, "support": 0, "predicted": 0})
        .withColumn("precision", F.col("tp") / F.greatest(F.col("predicted"), F.lit(1)))
        .withColumn("recall", F.col("tp") / F.greatest(F.col("support"), F.lit(1)))
    )
    return out.withColumn(
        "f1",
        F.when(F.col("precision") + F.col("recall") > 0,
               2 * F.col("precision") * F.col("recall")
               / (F.col("precision") + F.col("recall"))).otherwise(F.lit(0.0)),
    )
