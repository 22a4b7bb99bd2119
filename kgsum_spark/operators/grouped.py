"""Grouped-map operators (applyInPandas): per-group pandas logic for
shapes the relational API can't express cleanly (SURVEY.md §2.12).

The turn-assembly analog: per-conversation / per-user session features
computed with whole-group visibility. Each group arrives as one pandas
DataFrame (Arrow-batched); the group key is the shuffle key — same
partitioning discipline as extraction (repartition by conv_id).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

GROUP_STATS_SCHEMA = (
    "group_key bigint, n_events bigint, n_types bigint, "
    "first_event_id bigint, last_event_id bigint"
)


def group_event_stats(df: DataFrame, key: str = "user_id",
                      order_cols: tuple[str, str] = ("ts", "event_id"),
                      type_col: str = "event_type") -> DataFrame:
    """Per-group session stats via applyInPandas: event count, distinct
    types, first/last id under stable `order_cols` ordering (the id column
    is order_cols[1]). Chosen to be SQL-expressible so the DuckDB oracle can
    verify the grouped-map plumbing end-to-end (ordering inside groups,
    Arrow round-trip, key handling).

    Rows with a null group key are dropped up front: a null key would reach
    the pandas worker as NaN and fail the integer cast mid-job; dropping is
    the explicit policy (callers wanting a null-key bucket should fillna a
    sentinel first)."""
    from pyspark.sql import functions as F

    id_col = order_cols[1]

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        return pd.DataFrame(
            {
                "group_key": [int(pdf[key].iloc[0])],
                "n_events": [len(pdf)],
                "n_types": [pdf[type_col].nunique()],
                "first_event_id": [int(pdf[id_col].iloc[0])],
                "last_event_id": [int(pdf[id_col].iloc[-1])],
            }
        )

    return (
        df.filter(F.col(key).isNotNull())
        .groupBy(key)
        .applyInPandas(per_group, schema=GROUP_STATS_SCHEMA)
    )


def dialogue_features(transcripts: DataFrame) -> DataFrame:
    """Per-conversation dialogue features (the KG-pipeline flavor): turn
    counts by role, text volume, wall-clock span."""

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort")
        text_len = pdf["text"].fillna("").str.len()
        span = (pdf["ts"].max() - pdf["ts"].min()).total_seconds() if len(pdf) else 0.0
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_turns": [len(pdf)],
                "n_user_turns": [int((pdf["role"] == "user").sum())],
                "n_tool_turns": [int((pdf["role"] == "tool").sum())],
                "total_chars": [int(text_len.sum())],
                "span_sec": [float(span)],
            }
        )

    schema = ("conv_id string, n_turns bigint, n_user_turns bigint, "
              "n_tool_turns bigint, total_chars bigint, span_sec double")
    return transcripts.groupBy("conv_id").applyInPandas(per_conv, schema=schema)
