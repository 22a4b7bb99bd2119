"""Streaming near-dup throughput (VERDICT r3 #8): give the streaming tier
a number like every other tier.

Measures, at $SPARK_GRAFT_SF_DIR documents (default /root/testdata/sf0.1):
- stage 1: docs/sec through streaming_minhash_signatures' foreachBatch
  (availableNow over the documents parquet, several micro-batches);
- stage 2: wall seconds for one neardup_refresh over the accumulated
  signature store (LSH banding + exact verify), and the pair count.

Appends/replaces its own section in BENCH/BASELINE.md (delimited by the
section header, up to the next '## ' heading — same convention as
tools/scaling_bench.py).

Usage: python tools/streaming_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SECTION = "## Streaming near-dup throughput"


def main() -> None:
    from pyspark.sql import functions as F

    from kgsum_spark.session import build_session
    from kgsum_spark.streaming import neardup_refresh, streaming_minhash_signatures

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("kgsum_streaming_bench", cores=cpus,
                          shuffle_partitions=cpus)
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # Replicate in-plan into distinct doc ids (per-word suffix decorrelates
    # the replicas for MinHash, same trick as tools/neardup_scale_bench.py):
    # at sf0.1's 5k docs the ~1-2 s fixed cost per micro-batch would
    # dominate; at ~100k docs the number is steady-state per-doc cost.
    replicate = int(os.environ.get("SPARK_GRAFT_STREAM_REPLICATE", "20"))
    docs = (
        base.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
        .withColumn("doc_id", F.col("doc_id") * replicate + F.col("rep"))
        .withColumn("text", F.when(F.col("rep") == 0, F.col("text")).otherwise(
            F.regexp_replace(
                "text", F.lit(r"(\S+)"),
                F.concat(F.lit("$1_"), F.col("rep").cast("string")))))
        .drop("rep")
    )
    # Re-shard so availableNow sees several micro-batches (one per file):
    # throughput is then steady-state foreachBatch cost, not one giant batch.
    work = f"/tmp/kgsum_stream_bench_{cpus}"
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    docs.repartition(8).write.parquet(src)
    docs = spark.read.parquet(src)
    n_docs = docs.count()

    sig_path = os.path.join(work, "sigs")
    ckpt = os.path.join(work, "ckpt")
    # warm-up pass (JVM/codegen/python workers), then the timed run
    for label, ck, sp in (("warm", ckpt + "_w", sig_path + "_w"),
                          ("timed", ckpt, sig_path)):
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        t0 = time.time()
        q = streaming_minhash_signatures(stream, sp, ck)
        q.awaitTermination(600)
        wall = time.time() - t0
    sig_rows = spark.read.parquet(sig_path).count()
    n_epochs = spark.read.parquet(sig_path).select("epoch").distinct().count()
    stage1_dps = n_docs / wall

    # Stage 2 at the UNREPLICATED sf corpus — the same scale every batch
    # near-dup bench row uses. (Replication multiplies the corpus's exact
    # template clusters, which the aggressive 32x2 banding turns into a
    # quadratic candidate set — a corpus-construction artifact, not a
    # refresh cost; the batch tier's 10x evidence is
    # tools/neardup_scale_bench.py.)
    src0 = os.path.join(work, "src0")
    base.repartition(4).write.parquet(src0)
    base_docs = spark.read.parquet(src0)
    n_base = base_docs.count()
    stream0 = (spark.readStream.schema(base_docs.schema)
               .option("maxFilesPerTrigger", 1).parquet(src0))
    sig0 = os.path.join(work, "sigs0")
    q = streaming_minhash_signatures(stream0, sig0, os.path.join(work, "ckpt0"))
    q.awaitTermination(600)
    t0 = time.time()
    pairs = neardup_refresh(spark, sig0, base_docs, threshold=0.5)
    n_pairs = pairs.count()
    refresh_wall = time.time() - t0

    # Stage 3: refresh with one degenerate exact-template cluster injected
    # — the regime neardup_refresh's max_bucket_size default exists for. A
    # 20,000-copy template lands every copy in the same bucket in each of
    # the 32 bands: ~C(20k,2) ≈ 2.0e8 candidate pairs (and that many
    # 64-long signature rows through the verify join) from ONE document,
    # before a single true near-dup is found. The cap drops those buckets,
    # so refresh cost returns to the true-pair-proportional base corpus
    # cost. (The full REPLICATED store is deliberately NOT the stage-3
    # input: probing showed its candidate mass — 2e8 pairs — comes from
    # mid-size buckets of genuinely-templated synthetic docs, max bucket
    # 3,083 but p99.9 = 182, which no bucket cap can remove without
    # removing the answer; a corpus where everything resembles everything
    # has a quadratic near-dup RESULT, and belongs to exact dedup +
    # stricter thresholds, not a bigger refresh box.)
    cluster = (
        spark.range(20_000)
        .select((F.col("id") + 10_000_000).alias("doc_id"),
                F.lit("common boilerplate template body that appears on "
                      "every page of the mirrored site verbatim").alias("text"))
    )
    skewed = base_docs.select("doc_id", "text").unionByName(cluster)
    src_skew = os.path.join(work, "src_skew")
    skewed.repartition(4).write.parquet(src_skew)
    skew_docs = spark.read.parquet(src_skew)
    stream_s = (spark.readStream.schema(skew_docs.schema)
                .option("maxFilesPerTrigger", 1).parquet(src_skew))
    sig_s = os.path.join(work, "sigs_skew")
    q = streaming_minhash_signatures(stream_s, sig_s, os.path.join(work, "ckpt_skew"))
    q.awaitTermination(600)
    t0 = time.time()
    pairs_skew = neardup_refresh(spark, sig_s, skew_docs, threshold=0.5)
    n_pairs_skew = pairs_skew.count()
    refresh_skew_wall = time.time() - t0

    md = f"""{SECTION}

Generated by `python tools/streaming_bench.py` at {sf_dir}
(local[{cpus}], {n_docs:,} documents re-sharded into 8 files → one
micro-batch per file via maxFilesPerTrigger=1; warm-up pass untimed).

| stage | wall (s) | rate |
|---|---|---|
| stage 1: per-batch MinHash signatures over {n_docs:,} docs (foreachBatch, {n_epochs} epochs, idempotent per-epoch write) | {wall:.2f} | {stage1_dps:,.0f} docs/sec |
| stage 2: neardup_refresh over the unreplicated {n_base:,}-doc store (LSH banding + exact verify; {sig_rows:,} sigs accumulated in stage 1) | {refresh_wall:.2f} | {n_pairs} verified pairs |
| stage 3: neardup_refresh over the {n_base:,}-doc store + an injected 20,000-copy exact-template cluster (max_bucket_size=2000 default drops its buckets) | {refresh_skew_wall:.2f} | {n_pairs_skew} verified pairs |

Stage 1 is strictly per-doc work (no cross-doc join in-stream) — it scales
with executors like any map stage. Stage 2 is the periodic batch refresh;
its cost is candidate-proportional (same LSH path as the batch operator).
Stage 3 is the degenerate-skew regime: ONE 20,000-copy template emits
~C(20k,2) ≈ 2.0e8 candidate pairs uncapped — a refresh-killing candidate
set from a single document. The bucket cap drops those buckets before the
self-join, so the skewed refresh costs roughly the clean stage-2 refresh;
the template mass itself is exact-dup work (hash-groupBy, no pair space).
A corpus that is quadratic through MID-size buckets (everything genuinely
resembles everything, e.g. heavily templated synthetic text) is out of
scope for any cap — there the near-dup ANSWER is quadratic and thresholds
/ exact dedup are the tools.
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    old = open(path).read() if os.path.exists(path) else ""
    start = old.find(SECTION)
    if start != -1:
        nxt = old.find("\n## ", start + len(SECTION))
        old = old[:start] + (old[nxt + 1:] if nxt != -1 else "")
    if old and not old.endswith("\n"):
        old += "\n"
    with open(path, "w") as f:
        f.write(old + md)
    print(json.dumps({"n_docs": n_docs, "stage1_wall_s": round(wall, 2),
                      "docs_per_sec": round(stage1_dps, 1),
                      "epochs": n_epochs,
                      "refresh_wall_s": round(refresh_wall, 2),
                      "pairs": n_pairs,
                      "refresh_skewed_wall_s": round(refresh_skew_wall, 2),
                      "pairs_skewed": n_pairs_skew}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
