"""Bucketed table layout — the co-located-join scale path (SURVEY.md §4).

At 100 TB the dominant cost of a repeated equi-join is the shuffle of the
big fact table. Spark's native bucketing pre-hash-partitions the data ON
DISK: two tables bucketed by the same key into the same bucket count join
with NO Exchange at all (and no sort, when sortBy matches the join key).
The reference has no counterpart — kgsum re-reads and re-joins per query —
this is pure engine-side capability.

Local mode writes into the session's spark-warehouse; on a cluster the
same calls target the catalog (Hive metastore / Iceberg `writeTo`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_cols: list[str],
    n_buckets: int = 64, sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` hash-bucketed by `bucket_cols` (optionally sorted
    within buckets). Joins and aggregations keyed on `bucket_cols` against
    another table bucketed the same way run shuffle-free."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The physical plan
    must contain no shuffle Exchange — asserted in tests; verify on new
    layouts with `df.explain()`."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
