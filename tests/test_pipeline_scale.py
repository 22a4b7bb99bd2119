"""t2-scale correctness: ~50k-turn corpus (FIXTURES.md §1), P/R ≥ 0.95.

The module-scoped e2e suite runs at ~1k turns for speed; this one runs the
full pipeline at the scale the driver's correctness gate uses, so scale-
dependent effects (more partitions, bigger vocabulary, denser hot-entity
collisions) are exercised before the driver sees them.
"""

from __future__ import annotations

from kgsum_spark import schemas
from kgsum_spark.pipeline import run_pipeline
from kgsum_spark.synth import generate_corpus


def test_t2_scale_precision_recall(spark, tmp_path):
    c = generate_corpus(n_convs=9500, seed=42)
    assert len(c.transcripts) > 40_000
    tdf = spark.createDataFrame(c.transcripts, schema=schemas.TRANSCRIPTS)
    res = run_pipeline(spark, tdf, str(tmp_path / "t2"), resume=False)
    emitted = {
        (r["subj"], r["pred"], r["obj"])
        for r in res.triples.select("subj", "pred", "obj").distinct().collect()
    }
    golden = set(map(tuple, c.golden[["subj", "pred", "obj"]].drop_duplicates().values))
    inter = emitted & golden
    p = len(inter) / len(emitted)
    r = len(inter) / len(golden)
    assert p >= 0.95, f"precision {p}: {list(emitted - golden)[:5]}"
    assert r >= 0.95, f"recall {r}: {list(golden - emitted)[:5]}"
    # stage metrics carry full stage walls + per-partition lineage
    for stage in ("raw_triples", "entities", "triples"):
        meta = res.metrics["stages"][stage]
        assert meta["stage_wall_sec"] >= meta["wall_sec"] * 0.5
        assert meta["rows"] > 0
