"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
mapInPandas, Arrow batch shape, deterministic fake decoders. The actual
codec work is stubbed: this container ships no image/audio libraries, so
`decode_image(..., fake=False)` raises NotImplementedError at the exact
seam where Pillow/ffmpeg would plug in. The fake decoders are deterministic
functions of the bytes (sha-derived), so tests are stable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("content", T.BinaryType(), True),    # opaque payload
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, sha string"
)

AUDIO_FEATURES_SCHEMA = "media_id long, sample_rate int, n_samples long, sha string"

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_sha string"


def _sha(b: bytes) -> str:
    return hashlib.sha256(b or b"").hexdigest()


def decode_image(media: DataFrame, fake: bool = True) -> DataFrame:
    """Image decode / feature extraction over binary content via mapInPandas.

    fake=True → deterministic dimensions derived from the payload hash
    (the tested plumbing); fake=False → the seam for a real decoder
    (PIL.Image.open over io.BytesIO per Arrow batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires Pillow; install and decode "
                    "pdf['content'] per batch here"
                )
            shas = pdf["content"].map(_sha)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": shas.map(lambda s: 16 + int(s[:4], 16) % 4080).astype("int32"),
                    "height": shas.map(lambda s: 16 + int(s[4:8], 16) % 4080).astype("int32"),
                    "channels": 3,
                    "sha": shas,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def extract_audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Audio feature extraction stub (sample rate / length from metadata or
    fake-derived)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real audio decode requires soundfile/ffmpeg")
            shas = pdf["content"].map(_sha)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": 16000,
                    "n_samples": shas.map(lambda s: int(s[8:14], 16)).astype("int64"),
                    "sha": shas,
                }
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "content")
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
    )


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 8,
                  fake: bool = True) -> DataFrame:
    """Video frame sampling stub: emits ≤max_frames rows per video, frame
    ids every_n apart — the UDTF-shaped (one row in, many out) plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                s = _sha(content)
                n = min(max_frames, 1 + int(s[:2], 16) % max_frames)
                for i in range(n):
                    rows.append((mid, i * every_n, _sha(f"{s}:{i}".encode())))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha"])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes content through, records target dims in meta
    (real implementation replaces content bytes per batch)."""
    return media.withColumn(
        "meta",
        F.map_concat(
            F.coalesce(F.col("meta"), F.create_map().cast("map<string,string>")),
            F.create_map(
                F.lit("resize_w"), F.lit(str(width)),
                F.lit("resize_h"), F.lit(str(height)),
            ),
        ),
    )
