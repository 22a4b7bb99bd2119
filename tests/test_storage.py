"""Bucketed layout: co-located joins must plan with NO shuffle Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgsum_spark.storage import bucketed_join, write_bucketed


def test_bucketed_join_is_shuffle_free(spark):
    import shutil

    for t in ("t_bucket_a", "t_bucket_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        shutil.rmtree(f"{loc.removeprefix('file:')}/{t}", ignore_errors=True)
    df = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    other = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    write_bucketed(df, "t_bucket_a", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(other, "t_bucket_b", ["k"], n_buckets=8, sort_cols=["k"])

    # hint the LEFT INPUT (a hint on the joined frame is a no-op) to keep
    # the broadcast strategy from hiding the bucketing evidence
    joined = spark.table("t_bucket_a").hint("merge").join(
        spark.table("t_bucket_b"), ["k"])
    assert bucketed_join(spark, "t_bucket_a", "t_bucket_b", ["k"]).count() == 10_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: no shuffle on either side
    assert joined.count() == 10_000

    # contrast: the same join from plain (unbucketed) frames DOES shuffle
    plain = df.hint("merge").join(other, ["k"])
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan
