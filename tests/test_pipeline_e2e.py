"""End-to-end: golden-triple P/R ≥ 0.95 (north_rule), resume correctness,
lineage markers, salted-join parity."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from kgsum_spark.pipeline import run_pipeline


def _pr(triples_df, golden_pdf):
    emitted = {
        (r["subj"], r["pred"], r["obj"])
        for r in triples_df.select("subj", "pred", "obj").distinct().collect()
    }
    golden = set(
        map(tuple, golden_pdf[["subj", "pred", "obj"]].drop_duplicates().values)
    )
    inter = emitted & golden
    return len(inter) / len(emitted), len(inter) / len(golden), emitted


@pytest.fixture(scope="module")
def work_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipeline")
    return str(d)


@pytest.fixture(scope="module")
def result(spark, transcripts_df, work_dir):
    return run_pipeline(spark, transcripts_df, work_dir, resume=False)


@pytest.fixture(scope="module")
def baseline_set(result):
    # collected eagerly: later tests rewrite the checkpoint dir, which would
    # invalidate lazy re-reads of result.triples
    return {
        (r["subj"], r["pred"], r["obj"])
        for r in result.triples.select("subj", "pred", "obj").distinct().collect()
    }


def test_precision_recall(result, corpus):
    p, r, _ = _pr(result.triples, corpus.golden)
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"


def test_markers_and_lineage(result, work_dir):
    for stage in ["raw_triples", "entities", "triples"]:
        mp = os.path.join(work_dir, f"_MARKER_{stage}.json")
        assert os.path.exists(mp)
        meta = json.load(open(mp))
        assert meta["rows"] > 0
        assert sum(p["rows"] for p in meta["lineage"]) == meta["rows"]


def test_resume_skips_all_stages(spark, transcripts_df, work_dir, baseline_set, corpus):
    res2 = run_pipeline(spark, transcripts_df, work_dir, resume=True)
    assert set(res2.metrics["resumed"]) == {"raw_triples", "entities", "triples"}
    _, _, e2 = _pr(res2.triples, corpus.golden)
    assert baseline_set == e2


def test_resume_mid_pipeline_identical_triples(
    spark, transcripts_df, work_dir, baseline_set, corpus
):
    # kill after stage 2: drop the triples marker → only stage 3 recomputes
    os.remove(os.path.join(work_dir, "_MARKER_triples.json"))
    shutil.rmtree(os.path.join(work_dir, "triples"))
    res3 = run_pipeline(spark, transcripts_df, work_dir, resume=True)
    assert set(res3.metrics["resumed"]) == {"raw_triples", "entities"}
    _, _, e3 = _pr(res3.triples, corpus.golden)
    assert baseline_set == e3


def test_salted_join_same_triples(spark, transcripts_df, tmp_path, baseline_set):
    res_s = run_pipeline(
        spark, transcripts_df, str(tmp_path / "salted"), resume=False,
        use_salted_join=True, n_salts=4,
    )
    b = {
        tuple(r) for r in res_s.triples.select("subj", "pred", "obj").distinct().collect()
    }
    assert baseline_set == b


def test_pred_partitioned_layout(work_dir):
    parts = os.listdir(os.path.join(work_dir, "triples"))
    assert any(p.startswith("pred=") for p in parts)
