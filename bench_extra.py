#!/usr/bin/env python
"""Supplementary benchmarks (r6). bench.py is the FROZEN driver contract;
everything exploratory lives here.

Subcommands:

  noop [q1,q2,...]   Time declared queries with the noop sink (guide
                     §1.4 — forces every column of every row, no count()
                     column pruning) and record a LOAD FINGERPRINT
                     (1-min loadavg before/after each query) so box-
                     variance claims are data, not folklore (r5 VERDICT
                     #4). Median of 3 after the bench.py-style warmup.

  pack_stress [n_docs] [n_parts]
                     pack_sequences with the range shuffle forced to
                     n_parts partitions (default 10,000): proves the
                     per-partition totals collect (1 tiny row per
                     partition) and the driver offset map stay flat at
                     10^4 partitions (r5 VERDICT #6). Prints wall for
                     the prefix-sum + assignment count, driver peak RSS,
                     and the partition count actually used.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from kgsum_spark.session import build_session  # noqa: E402

DEFAULT_QUERIES = [
    "dedup_ngram_pairs", "dedup_ngram_prefix", "minhash_neardup_docs",
    "simhash_neardup_docs", "ann_lsh_pairs_embeddings",
    "dedup_neardup_survivors", "embedding_neardup_survivors",
    "curation_full_docs", "decontaminate_ngram", "kg_flagship_histogram",
    "kg_pipeline_triples",
]


def cmd_noop(argv: list[str]) -> None:
    import __spark_entry__ as entry_mod

    names = argv[0].split(",") if argv else DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("bench_extra_noop", cores=cpus,
                          shuffle_partitions=cpus)
    qs = entry_mod.queries()
    for warm in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for n in names:
            qs[n](spark, warm).write.format("noop").mode("overwrite").save()
    per: dict[str, list] = {n: [] for n in names}
    loads: dict[str, list] = {n: [] for n in names}
    for _ in range(3):
        for n in names:
            spark.sparkContext.setJobDescription(f"noop:{n}")
            l0 = os.getloadavg()[0]
            t0 = time.time()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            per[n].append(round(time.time() - t0, 3))
            loads[n].append((round(l0, 1), round(os.getloadavg()[0], 1)))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "mode": "noop", "sf_dir": sf_dir, "cpus": cpus,
        "queries": {n: {"median": sorted(v)[1], "runs": v,
                        "loadavg_1m": loads[n]} for n, v in per.items()},
    }))
    spark.stop()


def cmd_pack_stress(argv: list[str]) -> None:
    import resource

    from kgsum_spark.datapipe.textstats import pack_sequences

    n_docs = int(argv[0]) if argv else 2_000_000
    n_parts = int(argv[1]) if len(argv) > 1 else 10_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # shuffle.partitions drives repartitionByRange's width; AQE coalescing
    # is left ON deliberately — the totals pass groups by the PHYSICAL
    # partition id, so whatever width actually materializes is the width
    # the offset map must cover.
    spark = build_session("bench_extra_pack", cores=cpus,
                          shuffle_partitions=n_parts)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 997).cast("string"),
                 F.lit(" word another few tokens here padding text "),
                 (F.col("id") % 31).cast("string")).alias("text"))
    docs = docs.localCheckpoint()  # isolate generation from the timed pack
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.time()
    out = pack_sequences(docs, "doc_id", "text", capacity=2048)
    n_assign = out.count()
    wall = round(time.time() - t0, 2)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({
        "mode": "pack_stress", "n_docs": n_docs,
        "shuffle_partitions": n_parts, "assignments": n_assign,
        "wall_s": wall, "driver_maxrss_mb_before": round(rss0, 1),
        "driver_maxrss_mb_after": round(rss1, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "noop"
    if cmd == "noop":
        cmd_noop(sys.argv[2:])
    elif cmd == "pack_stress":
        cmd_pack_stress(sys.argv[2:])
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")
