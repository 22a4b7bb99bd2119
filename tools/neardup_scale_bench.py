#!/usr/bin/env python
"""Near-dup / ANN suite at 1x and 10x documents (VERDICT r2 task 7).

Scales the sf0.1 documents (and embeddings) tables by a replication factor
R with DECORRELATED replicas: every WORD gets a rep-specific suffix, so
replica token sets are pairwise disjoint across reps — replica r of doc A
is still a near-dup of replica r of doc B iff A~B, but never of any other
replica, for every representation (shingle Jaccard, MinHash, SimHash token
votes). That reproduces how a 10x web corpus actually behaves (near-dup
pair count grows ~linearly with corpus size); naive replication would
instead make every replica pair an exact dup — a quadratic pathological
corpus that no index can (or should) survive. (A rep token INJECTED between
words fails for SimHash: it occurs n_words times and dominates the
fingerprint's bit votes, colliding all same-rep docs — measured before the
per-word suffix.) Embeddings are decorrelated by per-rep random sign-flip
masks (a diagonal orthogonal transform — exact intra-rep geometry, random
cross-rep mixing; cyclic rotation left structured vectors correlated).

Prints one JSON line per (scale, query): wall seconds + output pair count,
so candidate-proportionality is checkable (pairs and wall ~R, not R^2).

  python tools/neardup_scale_bench.py [R] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kgsum_spark.datapipe import dedup as dd  # noqa: E402
from kgsum_spark.datapipe import similarity as sim  # noqa: E402
from kgsum_spark.datapipe._util import unpersist_tracked  # noqa: E402
from kgsum_spark.session import build_session  # noqa: E402


def replicate_docs(d, r):
    rep = F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("rep")
    suffixed = F.regexp_replace(
        "text", F.lit(r"(\S+)"),
        F.concat(F.lit("$1zz"), F.col("rep").cast("string")))
    return d.select("doc_id", "text", rep).select(
        (F.col("doc_id") + F.col("rep").cast("long") * 10_000_000).alias("doc_id"),
        suffixed.alias("text"),
    )


def replicate_vecs(e, r, spark):
    import numpy as np

    rep = F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("rep")
    dim = len(e.select("embedding").first()["embedding"])
    # per-rep random +-1 sign masks: a diagonal orthogonal transform, so
    # intra-rep cosine geometry is EXACTLY preserved while cross-rep
    # cosines mix random signs -> decorrelated. (A cyclic rotation is NOT
    # enough: structured/clustered vectors stay autocorrelated under
    # shifts — measured 5096 pairs at 10x vs the expected ~390 before this
    # fix, with a 47x wall blow-up from genuine cross-rep candidates.)
    rnd = np.random.RandomState(7)
    masks = [[1.0] * dim] + [
        (rnd.randint(0, 2, dim) * 2.0 - 1.0).tolist() for _ in range(r - 1)
    ]
    mask_df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(masks)], "rep int, mask array<double>")
    flipped = F.zip_with("embedding", "mask", lambda x, y: x * y)
    return (
        e.select("vec_id", "embedding", rep)
        .join(F.broadcast(mask_df), "rep")
        .select(
            (F.col("vec_id") + F.col("rep").cast("long") * 10_000_000).alias("vec_id"),
            flipped.alias("embedding"),
        )
    )


def main() -> None:
    r10 = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("neardup_scale", cores=cpus, shuffle_partitions=cpus)

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(e.select("embedding").first()["embedding"])

    def queries(docs, vecs):
        return {
            "dedup_ngram_prefix": lambda: dd.ngram_jaccard_pairs_prefix(
                docs, "doc_id", "text", n=3, threshold=0.6).count(),
            "minhash_neardup": lambda: dd.minhash_neardup_verified(
                docs, "doc_id", "text", n=3, threshold=0.5).count(),
            "simhash_neardup": lambda: dd.simhash_hamming_pairs(
                dd.simhash64(docs, "doc_id", "text"), max_hamming=3).count(),
            "ann_lsh_pairs": lambda: sim.ann_pairs_verified(
                vecs, dim=dim, threshold=0.48).count(),
        }

    # warm-up: compile every query's codegen once on a tiny slice so the
    # 1x pass isn't charged for JIT (the 64-aggregate MinHash plan alone
    # costs seconds to compile)
    for name, fn in queries(d.select("doc_id", "text").limit(60),
                            e.select("vec_id", "embedding").limit(60)).items():
        fn()
        unpersist_tracked()

    for scale, rr in (("1x", 1), (f"{r10}x", r10)):
        docs = replicate_docs(d, rr) if rr > 1 else d.select("doc_id", "text")
        vecs = (replicate_vecs(e, rr, spark) if rr > 1
                else e.select("vec_id", "embedding"))
        dpath, vpath = f"/tmp/nds_docs_{rr}", f"/tmp/nds_vecs_{rr}"
        docs.repartition(cpus).write.mode("overwrite").parquet(dpath)
        vecs.repartition(cpus).write.mode("overwrite").parquet(vpath)
        docs = spark.read.parquet(dpath)
        vecs = spark.read.parquet(vpath)
        n_docs = docs.count()
        for name, fn in queries(docs, vecs).items():
            t0 = time.time()
            pairs = fn()
            sec = round(time.time() - t0, 3)
            unpersist_tracked()
            print(json.dumps({"scale": scale, "n_docs": n_docs,
                              "query": name, "sec": sec, "pairs": pairs}),
                  flush=True)


if __name__ == "__main__":
    main()
