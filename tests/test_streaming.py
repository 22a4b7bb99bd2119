"""Structured Streaming: incremental extraction with checkpointed
micro-batches, windowed aggregates with watermark."""

from __future__ import annotations

import os

import pytest

from kgsum_spark import schemas, streaming
from kgsum_spark.synth import generate_corpus


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    c = generate_corpus(n_convs=60, seed=5)
    df = spark.createDataFrame(c.transcripts, schema=schemas.TRANSCRIPTS)
    # several files → several micro-batches with maxFilesPerTrigger
    df.repartition(6).write.mode("overwrite").parquet(str(d / "transcripts"))
    return str(d / "transcripts"), c


def test_streaming_extraction_stateless(spark, stream_src, tmp_path):
    path, c = stream_src
    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    stream = streaming.stream_transcripts(spark, path, max_files_per_trigger=2)
    q = streaming.streaming_extraction(stream, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == len(c.golden)

    # resume semantics: restarting with the same checkpoint adds nothing
    q2 = streaming.streaming_extraction(
        streaming.stream_transcripts(spark, path), out, ckpt
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(c.golden)


def test_streaming_foreach_batch_with_window(spark, stream_src, tmp_path):
    path, c = stream_src
    out = str(tmp_path / "triples_fb")
    ckpt = str(tmp_path / "ckpt_fb")
    stream = streaming.stream_transcripts(spark, path, max_files_per_trigger=2)
    q = streaming.streaming_extraction_foreach_batch(stream, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == len(c.golden)
    assert got.select("epoch").distinct().count() >= 2  # several micro-batches


def test_turns_per_window_agg(spark, stream_src, tmp_path):
    path, _ = stream_src
    stream = streaming.stream_transcripts(spark, path)
    agg = streaming.turns_per_window(stream, window="10 minutes")
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("winagg").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM winagg").collect()
    assert len(rows) > 0
    assert all(r["n_turns"] >= r["n_triple_turns"] for r in rows)
