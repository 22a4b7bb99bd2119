"""Joins (SURVEY.md §2.4, J1-J6). All reference joins are tiny-dimension
equi/theta joins → broadcast-friendly; helpers keep the semantics explicit
and let Catalyst pick physical strategy (forced broadcast on known-small
sides)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def outer_merge(a: DataFrame, b: DataFrame, on: str = "id") -> DataFrame:
    """J1 — profile ⨝ VoID merge: outer equi-join, b's conflicting columns
    dropped (the reference drops *_dup columns after a pandas outer merge,
    /root/reference/src/preprocessing.py:381-394), then dedup on the key."""
    dup = [c for c in b.columns if c != on and c in a.columns]
    return (
        a.join(b.drop(*dup), on, "outer")
        .dropDuplicates([on])
    )


def left_merge(a: DataFrame, b: DataFrame, on: list[str]) -> DataFrame:
    """J2 — left equi-join on a composite key
    (/root/reference/src/lov_data_preparation.py:310, merge on [id, category])."""
    return a.join(b, on, "left")


def union_keep_last(frames: list[DataFrame], key: str,
                    rank_col: str = "_src_rank") -> DataFrame:
    """J3 — vertical concat + drop_duplicates(keep='last')
    (/root/reference/src/util.py:231-235). keep-last is made explicit with a
    source-rank column: later frames in the list win."""
    ranked = [
        f.withColumn(rank_col, F.lit(i)) for i, f in enumerate(frames)
    ]
    all_ = ranked[0]
    for f in ranked[1:]:
        all_ = all_.unionByName(f, allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy(F.col(rank_col).desc())
    return (
        all_.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r", rank_col)
    )


def containment_join(big: DataFrame, small: DataFrame, big_col: str,
                     small_col: str) -> DataFrame:
    """J4 — substring-containment theta join (the reference's O(n·m) nested
    loop with the author's own 'should use binary search' comment,
    /root/reference/src/util.py:186-202). Spark executes this as
    BroadcastNestedLoopJoin with the small side broadcast — the right
    physical plan for a theta join with one tiny input."""
    return big.join(
        F.broadcast(small),
        F.col(big_col).contains(F.col(small_col)),
    )


def hash_match_join(files: DataFrame, catalog: DataFrame, file_hash_col: str,
                    catalog_id_col: str = "id") -> DataFrame:
    """J5 — filename→id hash-match: equi-join on computed sha256 key
    (the reference's linear scan comparing sha256(id) to a filename hash,
    /root/reference/src/util.py:91-109). Computed-key equi-join → hash join."""
    return files.join(
        catalog.withColumn("_h", F.sha2(F.col(catalog_id_col), 256)),
        files[file_hash_col] == F.col("_h"),
    ).drop("_h")


def dependent_semi_join(fact: DataFrame, dim_keys: DataFrame, on: str) -> DataFrame:
    """J6/Q11 — the reference's two-phase dependent-join loop (fetch dataset
    subjects, then query per subject, /root/reference/src/dataset_preparation.py:281-317)
    becomes ONE broadcast semi-join."""
    return fact.join(F.broadcast(dim_keys), on, "left_semi")


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str,
              right_cols: list[str]) -> DataFrame:
    """As-of (point-in-time) join: for every left row, attach `right_cols`
    from the LATEST right row with right.ts <= left.ts within the same
    `on` key. Spark has no native ASOF; this is the standard union +
    forward-fill-window composition — ONE shuffle (the per-key window),
    no range cross-product. Oracle: DuckDB's native ASOF JOIN.

    Right rows must be unique per (on, ts_col) — pre-aggregate if not.
    Caveat: legitimately-NULL right values are forward-filled through
    (ignorenulls semantics); wrap values in a struct upstream if NULL is
    a payload you need to preserve."""
    clash = set(right_cols) & set(left.columns)
    if clash:
        # a left column named like a right payload column would merge into
        # the same union slot and poison the forward fill — refuse loudly
        raise ValueError(f"right_cols {sorted(clash)} collide with left columns")
    r = right.select(on, ts_col, *right_cols).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before co-timestamped left rows → '<=' semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               start_col: str, end_col: str, granularity: float,
               on: list[str] | None = None) -> DataFrame:
    """Range (interval) join: pair every point row with every interval row
    where start <= point <= end (and the optional `on` keys match). Spark
    plans a raw inequality join as a broadcast nested loop — quadratic;
    this is the standard BIN-BUCKETING rewrite: each interval explodes to
    the fixed-size bins it covers, each point lives in exactly one bin, so
    the join is an equi-join on (bins..., on...) followed by the exact
    range filter. No duplicates (a point has one bin) and no
    cross-product; cost tracks intervals × bins-per-interval. Pick
    `granularity` near the median interval length (bins/interval ≈ 2).
    Degenerate intervals (end < start) are dropped, matching what an
    inequality join would do — F.sequence would otherwise throw on the
    negative step.

    Inner-join semantics only: the post-join range filter evaluates NULL
    for unmatched rows, so a `how` parameter would silently degrade any
    outer variant to inner (left-join callers should left-join the result
    back to `points` on the point key)."""
    if granularity <= 0:
        raise ValueError("granularity must be positive")
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    gb = F.lit(float(granularity))
    ibin = F.explode(
        F.sequence(
            F.floor(F.col(start_col) / gb).cast("long"),
            F.floor(F.col(end_col) / gb).cast("long"),
        )
    ).alias("_bin")
    iv = intervals.select("*", ibin)
    pt = points.withColumn("_bin", F.floor(F.col(point_col) / gb).cast("long"))
    keys = ["_bin"] + (on or [])
    return (
        pt.join(iv, keys, "inner")
        .filter((F.col(point_col) >= F.col(start_col))
                & (F.col(point_col) <= F.col(end_col)))
        .drop("_bin")
    )
