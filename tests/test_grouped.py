"""applyInPandas grouped-map operators (SURVEY.md §2.12)."""

from __future__ import annotations

import datetime

from kgsum_spark.operators.grouped import dialogue_features, group_event_stats
from kgsum_spark import schemas


def test_group_event_stats(spark):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (10, ts, 1, "click", 1.0, "{}"),
        (11, ts + datetime.timedelta(seconds=5), 1, "view", 1.0, "{}"),
        (12, ts + datetime.timedelta(seconds=2), 1, "click", 1.0, "{}"),
        (20, ts, 2, "error", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    got = {r["group_key"]: r for r in group_event_stats(df).collect()}
    assert got[1]["n_events"] == 3 and got[1]["n_types"] == 2
    assert got[1]["first_event_id"] == 10 and got[1]["last_event_id"] == 11
    assert got[2]["n_events"] == 1


def test_dialogue_features(spark, transcripts_df, corpus):
    feats = {r["conv_id"]: r for r in dialogue_features(transcripts_df).collect()}
    sizes = corpus.transcripts.groupby("conv_id").size()
    conv = sizes.index[0]
    assert feats[conv]["n_turns"] == int(sizes[conv])
    assert feats[conv]["total_chars"] > 0
    assert feats[conv]["span_sec"] >= 0.0


def test_group_event_stats_null_keys_and_custom_id(spark):
    rows = [
        (10, 1, 1, "click"),
        (11, 2, 1, "view"),
        (99, 1, None, "error"),   # null group key → dropped by policy
    ]
    df = spark.createDataFrame(
        rows, "msg_id long, seq long, conv long, event_type string")
    out = group_event_stats(df, key="conv", order_cols=("seq", "msg_id")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["group_key"] == 1 and r["first_event_id"] == 10 and r["last_event_id"] == 11
