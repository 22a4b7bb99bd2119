#!/usr/bin/env python
"""Salted-join parity + timing at bench scale (VERDICT r2 task 5).

Builds the bench transcript corpus (same cached parquet as bench.py),
extracts raw triples, then makes the canonicalization join DELIBERATELY
skewed: a fixed fraction of subject norms is remapped to one hot
vocabulary key. The stage-3 join then runs twice —

  broadcast : big.join(broadcast(map))        (the pipeline default)
  salted    : linking.salted_broadcast_map    (the shuffle fallback for
              when the map outgrows the broadcast threshold; salt spreads
              the hot key over n_salts reducers)

— and we assert multiset parity (count + order-independent hash aggregate
over all output columns) and report wall-times. Usage:

  python tools/salted_bench.py [n_convs] [hot_pct] [n_salts] [replicate]

`replicate` multiplies the corpus in-plan into distinct conversations
(bench.py's pattern) — replicate=8 reaches the 16.4M-turn bench point.
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
from kgsum_spark.linking import salted_broadcast_map  # noqa: E402
from kgsum_spark.session import build_session  # noqa: E402
from kgsum_spark.synth import write_corpus  # noqa: E402

HOT_KEY = "acme hot entity"


def agg_hash(df):
    """Order-independent multiset hash: sum of per-row xxhash64 over every
    column (as decimal — ANSI-safe against bigint overflow)."""
    h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                     for c in df.columns])
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("h"),
    ).first()


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 380_000
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    n_salts = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    replicate = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(repo, ".cache", f"bench_corpus_{n_convs}")
    tpath, _ = write_corpus(cache, n_convs, seed=42)

    spark = build_session(
        "salted_bench", cores=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
                    "spark.sql.files.openCostInBytes": "131072"},
    )
    transcripts = spark.read.parquet(tpath)
    if replicate > 1:
        transcripts = (
            transcripts.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
            .withColumn("conv_id", F.concat(
                "conv_id", F.lit("#"), F.col("rep").cast("string")))
            .drop("rep")
        )

    # raw triples with a skewed subject-norm column, materialized once so
    # both join variants read identical input (and neither pays extraction)
    norm = F.trim(F.regexp_replace(F.lower(F.col("subj")), "[^a-z0-9]+", " "))
    raw = extract_raw_triples(assemble_turns(transcripts).drop("rn")).select(
        "subj", "pred", "obj",
        F.when(F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(100)) < hot_pct,
               F.lit(HOT_KEY)).otherwise(norm).alias("subj_norm"),
    )
    skewed_path = "/tmp/salted_bench_raw"
    raw.write.mode("overwrite").parquet(skewed_path)
    big = spark.read.parquet(skewed_path)
    n_rows = big.count()
    hot_rows = big.filter(F.col("subj_norm") == HOT_KEY).count()

    smap = big.select("subj_norm").distinct().select(
        "subj_norm", F.sha2(F.col("subj_norm"), 256).alias("canon"))
    smap.count()  # materialize the dedup once (it's vocabulary-sized)

    def run(kind):
        t0 = time.time()
        if kind == "broadcast":
            out = big.join(F.broadcast(smap), "subj_norm", "left")
        else:
            out = salted_broadcast_map(big, smap, "subj_norm", n_salts)
        r = agg_hash(out.select("subj", "pred", "obj", "canon"))
        return round(time.time() - t0, 3), r

    results = {}
    for kind in ("broadcast", "salted", "broadcast", "salted"):
        sec, r = run(kind)  # first pass warms, second is reported
        results[kind] = {"sec": sec, "n": r["n"], "h": str(r["h"])}

    parity = (results["broadcast"]["n"] == results["salted"]["n"]
              and results["broadcast"]["h"] == results["salted"]["h"])
    print(json.dumps({
        "n_rows": n_rows, "hot_rows": hot_rows, "hot_pct": hot_pct,
        "n_salts": n_salts, "cpus": cpus,
        "broadcast_sec": results["broadcast"]["sec"],
        "salted_sec": results["salted"]["sec"],
        "parity": parity,
    }))
    assert parity, "salted output != broadcast output"


if __name__ == "__main__":
    main()
