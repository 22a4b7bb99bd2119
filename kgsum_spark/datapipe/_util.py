"""Shared datapipe plumbing.

`spread` widens under-partitioned inputs before cardinality-exploding
stages (shingle/token explodes, per-row vector math). A small parquet
file arrives as 1-2 scan partitions; exploding it would then run on 1-2
cores. One cheap shuffle of the narrow input buys a fully parallel
explode. No-op when the scan is already at least as wide as the cluster
(the 100 TB case).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# --- tracked persist: bounded cache lifetime for lazy-return operators ----
#
# Near-dup/ANN operators persist self-join inputs (signatures, candidate
# pairs, pruned shingles) because without the persist Spark recomputes the
# whole upstream subtree once per consumer. But the operators RETURN lazy
# DataFrames, so they cannot unpersist before the caller's action — and a
# long session running many such queries (the driver runs all 70; bench
# runs each 3x) would accumulate MEMORY_AND_DISK blocks that compete with
# execution memory. persist_tracked registers every such frame;
# unpersist_tracked() releases them all — callers invoke it after their
# consuming action (bench.py) or at the start of the next query
# (__spark_entry__), bounding live cache to one query's intermediates.
# Unpersisting a frame that a still-live plan references is safe: Spark
# just recomputes it (correctness unaffected).

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def unpersist_tracked(blocking: bool = False) -> int:
    """Release every tracked persisted frame; returns how many."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist(blocking)
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    _TRACKED.clear()
    return n

# Above this many input files we never stat sizes: Spark's bin-packing
# formula (FilePartition.maxSplitBytes) targets >= leaf-node default
# parallelism partitions via bytesPerCore whenever there are enough
# bytes, and stat'ing thousands of files is driver RPC cost for nothing.
_MAX_STAT_FILES = 512


# File extensions whose codec cannot be split mid-stream: the whole file
# is one scan partition no matter its size. (bzip2 IS splittable in
# Hadoop; parquet/orc compress per-page inside a splittable container, so
# `.snappy.parquet` never reaches this check — the extension test below
# looks at the FINAL suffix only.)
_NON_SPLITTABLE_EXTS = (".gz", ".zst", ".zstd", ".lz4", ".snappy", ".deflate")


def _estimated_scan_partitions(df: DataFrame, files: list[str]) -> int:
    """Estimate scan-partition count from file-size metadata using Spark's
    own packing formula (FilePartition.maxSplitBytes in the Spark source):

        totalBytes   = sum(len(f) + openCostInBytes)
        bytesPerCore = totalBytes / defaultParallelism
        maxSplit     = min(maxPartitionBytes, max(openCostInBytes, bytesPerCore))
        partitions  ~= ceil(totalBytes / maxSplit)

    Files with a non-splittable compression extension (.gz text/JSON
    etc.) are excluded from the byte-packing estimate and counted as ONE
    partition each: the formula above assumes splittable input, so a few
    large gz files would otherwise estimate wide while actually scanning
    one partition per file — and the narrow scan would never be widened
    (ADVICE r4).

    Driver-side metadata only — no job, no physical planning. Raises on
    any FS weirdness; callers fall back to the RDD probe."""
    import os

    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    ju = jvm.org.apache.spark.network.util.JavaUtils
    max_pb = ju.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = ju.byteStringAsBytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4m"))
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    total = 0
    unsplittable: list[int] = []
    for f in files:
        p = Path(f)
        size = p.getFileSystem(hconf).getFileStatus(p).getLen() + open_cost
        total += size
        if os.path.splitext(f)[1].lower() in _NON_SPLITTABLE_EXTS:
            unsplittable.append(size)
    per_core = total // max(spark.sparkContext.defaultParallelism, 1)
    max_split = min(max_pb, max(open_cost, per_core))
    # Spark bin-packs non-splittable files like everything else — many
    # SMALL .gz files coalesce into few FilePartitions — but cannot split
    # one LARGE .gz mid-stream, so such a file is one whole partition no
    # matter its size. Counting every unsplittable file as one partition
    # (the r5 estimate) over-counted small-gz dirs and made spread() skip
    # widening genuinely narrow scans (ADVICE r5). Estimate: large
    # unsplittable files (> maxSplit) get one partition each and leave
    # the packing pool; everything else packs at maxSplit granularity.
    n_large = sum(1 for s in unsplittable if s > max_split)
    packable = total - sum(s for s in unsplittable if s > max_split)
    split_parts = -(-packable // max(max_split, 1)) if packable else 0
    return max(1, split_parts + n_large)


def spread(df: DataFrame, key: str) -> DataFrame:
    """Repartition `df` to defaultParallelism on `key` iff the scan would
    be narrower than the cluster.

    Probe order (cheapest sufficient evidence wins):
    1. len(inputFiles()) > _MAX_STAT_FILES — plenty of files: Spark's
       bin-packing targets >= default parallelism whenever there are
       enough bytes; skip stat'ing thousands of files and no-op.
    2. Size-based estimate of Spark's own bin-packing (file-status
       metadata, driver-only). A LOW file count alone proves nothing:
       parquet and text are splittable, so one multi-GB file scans as
       many maxPartitionBytes splits — the size formula handles both the
       tiny-file and the large-single-file case (ADVICE r3).
    3. df.rdd.getNumPartitions() for derived/non-file plans — the only
       probe that forces physical planning; last resort.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — streaming / non-file plans
        files = []
    if files:
        if len(files) > _MAX_STAT_FILES:
            return df  # enough bytes that Spark packs to >= parallelism
        try:
            n_parts = _estimated_scan_partitions(df, files)
        except Exception:  # noqa: BLE001
            n_parts = df.rdd.getNumPartitions()
    else:
        n_parts = df.rdd.getNumPartitions()
    if n_parts < target:
        return df.repartition(target, key)
    return df
