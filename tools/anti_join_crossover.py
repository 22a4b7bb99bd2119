#!/usr/bin/env python
"""Measure the broadcast vs shuffled LEFT ANTI join crossover that sizes
dedup.BROADCAST_DROP_THRESHOLD (r6; the methodology twin of the r5 CC
edge-gate measurement in canonicalize.py).

For drop-set sizes 1M / 10M / 50M rows against a fixed 100M-row corpus,
time `corpus LEFT ANTI drop` with (a) an explicit broadcast hint and
(b) a plain shuffled anti-join, and record the JVM RSS delta around the
broadcast build (local mode: driver and executor share the JVM, so this
is exactly the executor-side hash-relation cost that OOMs at scale).

Usage: python tools/anti_join_crossover.py [corpus_rows]
Prints one JSON line per (size, strategy).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kgsum_spark.session import build_session  # noqa: E402


def jvm_rss_mb() -> float:
    with open(f"/proc/{os.getpid()}/task/../status") as f:  # pragma: no cover
        pass
    # the JVM is a child of this python process; find it
    import subprocess

    out = subprocess.run(
        ["ps", "-o", "pid=,rss=,comm=", "--ppid", str(os.getpid())],
        capture_output=True, text=True).stdout
    best = 0
    for line in out.splitlines():
        parts = line.split()
        if len(parts) >= 3 and "java" in parts[2]:
            best = max(best, int(parts[1]))
    return round(best / 1024, 1)


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("anti_join_crossover", cores=cpus,
                          shuffle_partitions=cpus)
    corpus = spark.range(n_corpus).select(F.col("id"))
    for m in (1_000_000, 10_000_000, 50_000_000):
        step = n_corpus // m
        drop = spark.range(n_corpus).filter(F.col("id") % step == 0).select(
            F.col("id").alias("__drop_id"))
        for strategy in ("broadcast", "shuffle"):
            d = F.broadcast(drop) if strategy == "broadcast" else drop
            q = corpus.join(d, F.col("id") == F.col("__drop_id"), "left_anti")
            rss0 = jvm_rss_mb()
            t0 = time.time()
            try:
                n = q.count()
                err = None
            except Exception as e:  # noqa: BLE001
                n, err = -1, str(e)[:200]
            wall = round(time.time() - t0, 2)
            print(json.dumps({
                "drop_rows": m, "strategy": strategy, "wall_s": wall,
                "survivors": n, "jvm_rss_mb_before": rss0,
                "jvm_rss_mb_after": jvm_rss_mb(), "err": err,
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
