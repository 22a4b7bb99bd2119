"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Two tiers (r2):
- REAL decoders for library-free formats — PPM and uncompressed BMP images
  (numpy), PCM WAV audio (stdlib `wave`), concatenated-PPM frame streams —
  `decode_image_real`, `resize_images`, `extract_audio_features_real`,
  `sample_frames_real`: actual pixels/samples, batch-shaped in mapInPandas.
- Library seams for compressed formats (JPEG/PNG/MP4): this container
  ships no Pillow/ffmpeg, so `decode_image(..., fake=False)` raises
  NotImplementedError at the exact plug-in point; the deterministic fake
  decoders (sha-derived) keep that plumbing tested.
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


# --- r2: REAL decoders for formats that need no external libraries --------
#
# The container ships no Pillow/ffmpeg, but several real formats are
# decodable with stdlib + numpy: PPM (P6/P3), uncompressed 24-bit BMP, and
# PCM WAV (stdlib `wave`). These upgrade the image/audio paths from
# deterministic fakes to real codec work — batch-shaped inside mapInPandas,
# numpy-vectorized per frame. Compressed formats (JPEG/PNG/MP4) still route
# to the library seams above.

IMAGE_FEATURES_REAL_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "mean_r double, mean_g double, mean_b double, sha string"
)

AUDIO_FEATURES_REAL_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, channels int, "
    "rms double, duration_sec double, sha string"
)


def _decode_ppm(b: bytes):
    """PPM P6 (binary) / P3 (ascii) → (h, w, 3) uint8 array. Grammar per
    the public Netpbm spec: magic, whitespace/comment-separated width,
    height, maxval, then raster."""
    import re

    import numpy as np

    m = re.match(rb"(P[36])\s", b)
    if not m:
        raise ValueError("not a PPM payload")
    magic = m.group(1)
    # header tokens with comment support
    pos, vals = m.end(), []
    while len(vals) < 3:
        chunk = re.match(rb"\s*(?:#[^\n]*\n\s*)*(\d+)", b[pos:])
        if not chunk:
            raise ValueError("truncated PPM header")
        vals.append(int(chunk.group(1)))
        pos += chunk.end()
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    if magic == b"P6":
        raster = b[pos + 1: pos + 1 + w * h * 3]  # single whitespace after maxval
        arr = np.frombuffer(raster, dtype=np.uint8, count=w * h * 3)
    else:
        arr = np.array(b[pos:].split()[: w * h * 3], dtype=np.uint8)
    return arr.reshape(h, w, 3)


def _encode_ppm(arr) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def _decode_bmp(b: bytes):
    """Uncompressed 24/32-bit BI_RGB BMP → (h, w, 3) uint8 array (top-down
    row order). Layout per the public BMP file-format spec."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<IiI", b, 14)[0], *struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    nch = bpp // 8
    flip = h > 0          # positive height = bottom-up rows
    h = abs(h)
    row_bytes = (w * nch + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(b, dtype=np.uint8, offset=data_off,
                         count=row_bytes * h).reshape(h, row_bytes)
    px = rows[:, : w * nch].reshape(h, w, nch)
    if flip:
        px = px[::-1]
    # BGR(A) → RGB
    return px[:, :, [2, 1, 0]].copy()


_IMAGE_DECODERS = {
    "image/x-portable-pixmap": _decode_ppm,
    "image/ppm": _decode_ppm,
    "image/bmp": _decode_bmp,
}


def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL image decode + feature extraction for library-free formats
    (PPM, uncompressed BMP): dimensions and per-channel means from the
    actual pixels. Unknown/compressed mimes raise per row with the format
    name — route those through the Pillow seam (decode_image fake=False)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, content in zip(pdf["media_id"], pdf["mime"], pdf["content"]):
                dec = _IMAGE_DECODERS.get(mime or "")
                if dec is None:
                    raise NotImplementedError(
                        f"no library-free decoder for {mime!r}; PPM/BMP are "
                        "supported natively, others need the Pillow seam"
                    )
                px = dec(bytes(content))
                means = px.reshape(-1, px.shape[2]).mean(axis=0)
                rows.append((mid, px.shape[1], px.shape[0], px.shape[2],
                             float(means[0]), float(means[1]), float(means[2]),
                             _sha(bytes(content))))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "channels",
                "mean_r", "mean_g", "mean_b", "sha"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "mime", "content")
        .mapInPandas(run, schema=IMAGE_FEATURES_REAL_SCHEMA)
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize (nearest-neighbor via numpy index grids) for PPM/BMP
    content; output content is re-encoded as PPM. Returns the media table
    with content replaced and meta recording the transform — the
    production-scale shape for a decode→transform→re-encode stage."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yi = None
        for pdf in batches:
            out_content, out_mime = [], []
            for mime, content in zip(pdf["mime"], pdf["content"]):
                dec = _IMAGE_DECODERS.get(mime or "")
                if dec is None:
                    raise NotImplementedError(f"no library-free decoder for {mime!r}")
                px = dec(bytes(content))
                h0, w0, _ = px.shape
                yi = (np.arange(height) * h0) // height
                xi = (np.arange(width) * w0) // width
                out_content.append(_encode_ppm(px[yi][:, xi]))
                out_mime.append("image/x-portable-pixmap")
            out = pdf.copy()
            out["content"] = out_content
            out["mime"] = out_mime
            return_meta = [{**(m or {}), "resize_w": str(width),
                            "resize_h": str(height)} for m in pdf["meta"]]
            out["meta"] = return_meta
            yield out

    return (
        media.filter(F.col("kind") == "image")
        .mapInPandas(run, schema=MEDIA_SCHEMA)
    )


def extract_audio_features_real(media: DataFrame) -> DataFrame:
    """REAL audio decode for PCM WAV via the stdlib `wave` module: sample
    rate, sample count, channels, RMS of the 16-bit PCM signal."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                with wave.open(io.BytesIO(bytes(content))) as wf:
                    sr = wf.getframerate()
                    n = wf.getnframes()
                    ch = wf.getnchannels()
                    if wf.getsampwidth() != 2:
                        raise NotImplementedError("only 16-bit PCM WAV supported")
                    sig = np.frombuffer(wf.readframes(n), dtype="<i2").astype(np.float64)
                rms = float(np.sqrt((sig ** 2).mean())) if len(sig) else 0.0
                rows.append((mid, sr, n, ch, rms, n / sr if sr else 0.0,
                             _sha(bytes(content))))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "n_samples", "channels",
                "rms", "duration_sec", "sha"])

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "content")
        .mapInPandas(run, schema=AUDIO_FEATURES_REAL_SCHEMA)
    )


FRAME_FEATURES_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, mean_lum double"
)


def sample_frames_real(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling over a concatenated-PPM stream ('video' as a
    sequence of P6 frames back to back — the library-free container).
    Decodes every_n-th frame and emits real per-frame features; MP4/WebM
    still require the ffmpeg seam (sample_frames fake=False)."""
    import re

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                # walk frames sequentially — raster bytes may contain 'P6',
                # so searching for magics would false-positive
                pos, fi = 0, 0
                while pos < len(b):
                    hdr = re.match(rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s",
                                   b[pos:])
                    if not hdr:
                        raise ValueError(f"bad PPM stream at offset {pos}")
                    w, h = int(hdr.group(1)), int(hdr.group(2))
                    frame_len = hdr.end() + w * h * 3
                    if fi % every_n == 0:
                        px = _decode_ppm(b[pos: pos + frame_len])
                        lum = px.reshape(-1, 3).astype("float64") @ (0.2126, 0.7152, 0.0722)
                        rows.append((mid, fi, w, h, float(lum.mean())))
                    pos += frame_len
                    fi += 1
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "width", "height", "mean_lum"])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(run, schema=FRAME_FEATURES_SCHEMA)
    )
