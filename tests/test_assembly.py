"""Turn-assembly invariants (BASELINE.json input_hint):
per-turn text equality under stable ordering; rn == turn_idx + 1."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kgsum_spark.assembly import assemble_turns, dedupe_turns_keep_last
from kgsum_spark import schemas


def test_row_number_equals_turn_idx(spark, transcripts_df):
    out = assemble_turns(transcripts_df)
    bad = out.filter(F.col("rn") != F.col("turn_idx") + 1).count()
    assert bad == 0


def test_per_turn_text_equality(spark, transcripts_df, corpus):
    out = (
        assemble_turns(transcripts_df)
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    inp = (
        corpus.transcripts[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert out.equals(inp)


def test_keep_last_dedup(spark):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "user", "old text", None, ts),
        ("c1", 0, "user", "new text", None, ts + datetime.timedelta(seconds=5)),
        ("c1", 1, "assistant", "only", None, ts + datetime.timedelta(seconds=10)),
    ]
    df = spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)
    out = dedupe_turns_keep_last(df).orderBy("turn_idx").collect()
    assert len(out) == 2
    assert out[0]["text"] == "new text"
    assert out[1]["text"] == "only"


def test_with_context_frame(spark):
    from kgsum_spark.assembly import with_context

    rows = [("c", 0, "u", "t0.", None, 0), ("c", 1, "u", "t1.", None, 1),
            ("c", 2, "u", "t2.", None, 2), ("c", 3, "u", "t3.", None, 3)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts long")
    got = {r["turn_idx"]: r["context_text"] for r in
           with_context(df, n_prev=2).collect()}
    assert got == {0: "t0.", 1: "t0. t1.", 2: "t0. t1. t2.", 3: "t1. t2. t3."}
