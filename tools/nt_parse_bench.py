#!/usr/bin/env python
"""N-Triples ingestion throughput (S1 at scale).

Serializes the bench corpus's extracted triples to an .nt text corpus once
(cached under .cache/), then times `sources.read_ntriples` — the
spark.read.text + vectorized-regex path every 100 TB ingest would take.
Prints one JSON line: lines/s, MB/s, wall.

  python tools/nt_parse_bench.py [n_convs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kgsum_spark.assembly import assemble_turns  # noqa: E402
from kgsum_spark.extraction import extract_raw_triples  # noqa: E402
from kgsum_spark.session import build_session  # noqa: E402
from kgsum_spark.sources import nt_lines_from_triples, read_ntriples  # noqa: E402
from kgsum_spark.synth import write_corpus  # noqa: E402


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 380_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tpath, _ = write_corpus(os.path.join(repo, ".cache",
                                         f"bench_corpus_{n_convs}"),
                            n_convs, seed=42)
    spark = build_session("nt_bench", cores=cpus, shuffle_partitions=cpus)

    nt_dir = os.path.join(repo, ".cache", f"nt_corpus_{n_convs}")
    if not os.path.exists(os.path.join(nt_dir, "_SUCCESS")):
        transcripts = spark.read.parquet(tpath)
        raw = extract_raw_triples(assemble_turns(transcripts).drop("rn"))
        t = raw.select(
            F.col("subj").alias("s"), F.col("pred").alias("p"),
            F.col("obj").alias("o"), F.col("obj_is_iri").alias("o_is_iri"))
        nt_lines_from_triples(t).repartition(cpus) \
            .write.mode("overwrite").text(nt_dir)

    size_mb = sum(
        os.path.getsize(os.path.join(nt_dir, f))
        for f in os.listdir(nt_dir) if not f.startswith(("_", "."))
    ) / 1e6
    read_ntriples(spark, nt_dir).count()  # warm-up (JIT + page cache)
    runs = []
    n_triples = 0
    for _ in range(3):
        t0 = time.time()
        n_triples = read_ntriples(spark, nt_dir).count()
        runs.append(time.time() - t0)
    sec = sorted(runs)[1]
    print(json.dumps({
        "n_triples": n_triples, "nt_mb": round(size_mb, 1),
        "parse_sec": round(sec, 3),
        "lines_per_sec": round(n_triples / sec, 1),
        "mb_per_sec": round(size_mb / sec, 1),
        "cpus": cpus, "runs": [round(r, 3) for r in runs],
    }))


if __name__ == "__main__":
    main()
