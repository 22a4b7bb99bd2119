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


def mixture_sample(df: DataFrame, group_col: str, rates: dict[str, float],
                   id_col: str, default_rate: float = 0.0,
                   salt: str = "mix") -> DataFrame:
    """Deterministic per-group mixture sampling (r5): keep each row with
    its group's target rate — the data-mixing step of a training-corpus
    recipe ("web at 0.3, books at 1.0, per-language weights"). The keep
    decision is a pure function of (id, salt): u = md5-derived 60-bit
    uniform in [0,1), keep iff u < rate[group]. Re-running over a grown
    corpus keeps exactly the same rows for unchanged ids, so mixtures
    are reproducible and incremental — unlike seeded `sample`, which
    reshuffles with partitioning.

    Scale shape: rates ship as a `create_map` literal (no join), the
    hash is a codegen'd JVM expression chain — map-only, no UDF, no
    shuffle; at 100 TB this is a scan-time filter that pipelines into
    the next stage. The 15-hex-digit md5 slice (60 bits < 2^63) is the
    repo's portable-hash idiom, reproducible bit-for-bit in ANSI SQL."""
    rate_map = F.create_map(
        *[x for k, v in rates.items()
          for x in (F.lit(k), F.lit(float(v)))])
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"),
                               F.lit("|" + salt))), 18, 15),
            16, 10
        ).cast("long") / F.lit(float(1 << 60))
    )
    rate = F.coalesce(rate_map[F.col(group_col)], F.lit(float(default_rate)))
    return df.filter(u < rate)


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
                     seed: int = 42, order_key=None):
    """A7 — EXACTLY stratified train/val/test split, mirroring
    `train_test_split(stratify=y)` semantics
    (/root/reference/src/pipeline_build.py:424-439, 80/10/10 seed 42).

    Per class: rows are ranked by a seeded hash (deterministic shuffle,
    full-row tiebreak so duplicate rows still order stably), then cut at
    round(n·w) boundaries — every class lands within rounding of the target
    proportions in every fold, not just in expectation (the r1 global-rand
    version could put a small class entirely in train). One shuffle (the
    per-class window); the three folds share the ranked plan.

    Pass `order_key` (a Column) to rank by an engine-portable key (e.g.
    md5 of a unique id) instead of the default seeded xxhash64 — that
    variant is SQL-oracle-able cross-engine."""
    cols = df.columns
    ord_key = order_key if order_key is not None else \
        F.xxhash64(F.lit(seed), *[F.col(c) for c in cols])
    w = Window.partitionBy(label).orderBy(ord_key, *[F.col(c) for c in cols])
    ranked = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(label)))
    )
    w1, w2 = weights[0], weights[0] + weights[1]
    c1 = F.round(F.col("_n") * w1).cast("long")
    c2 = F.round(F.col("_n") * w2).cast("long")
    train = ranked.filter(F.col("_rn") <= c1).drop("_rn", "_n")
    val = ranked.filter((F.col("_rn") > c1) & (F.col("_rn") <= c2)).drop("_rn", "_n")
    test = ranked.filter(F.col("_rn") > c2).drop("_rn", "_n")
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


def running_accuracy(df: DataFrame, label: str, pred: str, order_col,
                     partition_by: str | None = None) -> DataFrame:
    """A9 — cumulative hit/miss accuracy over an ordered eval stream
    (the reference's live-eval counter,
    /root/reference/src/service/lod_category_llm.py:99-145).

    One window expression: avg(hit) over rows unbounded preceding. The
    reference's stream is inherently sequential (one global counter); pass
    `partition_by` to track per-stream counters instead — the global form
    funnels through a single task by definition and is meant for eval-set
    sizes, not corpus scale."""
    hit = (F.col(label) == F.col(pred)).cast("int")
    base = Window.partitionBy(partition_by) if partition_by else Window.partitionBy()
    w = base.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.withColumn("hit", hit)
        .withColumn("hits_so_far", F.sum("hit").over(w))
        .withColumn("n_so_far", F.count(F.lit(1)).over(w))
        .withColumn("running_accuracy",
                    F.col("hits_so_far") / F.col("n_so_far"))
    )


def funnel_steps(df: DataFrame, user_col: str, type_col: str, ts_col,
                 steps: list[str]) -> DataFrame:
    """Funnel analysis: per user, the deepest step of `steps` reached IN
    ORDER (each step strictly after the previous one's chosen event) —
    the windowFunnel-style operator analytics engines ship natively.

    Plan: one filtered scan per step + greedy min-ts joins. Greedy is
    optimal here: taking the EARLIEST valid occurrence of step k maximizes
    the events available for step k+1, so depth is exact. k-1 small joins
    on the user key (each side one row per user) — no per-user event
    collection, state stays user-cardinality-sized."""
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    out = cur.select(user_col, F.lit(1).alias("depth"), F.col("t1").alias("_t"))
    prev = cur.withColumnRenamed("t1", "_t")
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            df.filter(F.col(type_col) == step)
            .join(prev.select(user_col, "_t"), user_col)
            .filter(F.col(ts_col) > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t2"))
        )
        prev = nxt.withColumnRenamed("_t2", "_t")
        out = out.unionByName(
            prev.select(user_col, F.lit(i).alias("depth"), F.col("_t"))
        )
    w = Window.partitionBy(user_col).orderBy(F.col("depth").desc())
    return (
        out.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(user_col, "depth", F.col("_t").alias("reached_ts"))
    )
