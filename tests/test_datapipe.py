"""Training-data pipeline ops: dedup, similarity, text stats, multimodal."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kgsum_spark.datapipe import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "The quick brown fox jumps over the lazy dog!"),   # exact dup of 0 post-norm
        (2, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (3, "completely different text about spark engines"),
        (4, "another unrelated document discussing query plans"),
        (5, "the quick brown fox jumps over the lazy dog"),    # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_dups"] == 3 and g["keep_id"] == 0 and g["dup_ids"] == [0, 1, 5]


def test_dedup_exact_keeps_min_id(docs):
    kept = sorted(r["doc_id"] for r in dedup.dedup_exact(docs, "doc_id", "text").collect())
    assert kept == [0, 2, 3, 4]


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical post-norm
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0
    assert (3, 4) not in pairs


def test_minhash_identical_signatures(docs):
    sigs = {r["id"]: r["sig"] for r in
            dedup.minhash_signatures(docs, "doc_id", "text", num_perm=32).collect()}
    assert sigs[0] == sigs[1] == sigs[5]
    assert sigs[0] != sigs[3]


def test_minhash_lsh_finds_near_dups(docs):
    # 32x2 banding: P(catch | J=0.56) = 1-(1-0.56^2)^32 ≈ 1-1e-5 — the r1
    # 16x4 config caught the (0,2) near-dup only with P≈0.81 (luck-coupled
    # to the shingle hash values; the struct-shingle change reshuffled them)
    pairs = {(r["a"], r["b"]): r["est_jaccard"] for r in
             dedup.minhash_dedup_pairs(docs, "doc_id", "text", num_perm=64,
                                       bands=32, rows_per_band=2, threshold=0.4).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # near-dup caught
    assert all(not (a in (3, 4) or b in (3, 4)) for a, b in pairs)


def test_simhash_hamming(docs):
    sim = dedup.simhash64(docs, "doc_id", "text")
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             dedup.simhash_near_pairs(sim, max_hamming=10, prefix_bits=8).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0
    if (0, 2) in pairs:
        assert pairs[(0, 2)] > 0


# --- similarity ----------------------------------------------------------

def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.cosine_topk(df, [1.0, 0.0, 0.0], k=2).collect()
    assert [r["id"] for r in got] == [0, 1]
    # embeddings are float32 on disk → ~1e-7 representation error
    assert abs(got[0]["sim"] - 1.0) < 1e-6
    assert abs(got[1]["sim"] - 0.9 / math.sqrt(0.82)) < 1e-6


def test_ann_lsh_recall_vs_bruteforce(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.normal(size=(30, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, [float(x) for x in v]))
        rows.append((i * 2 + 1, [float(x) for x in v + rng.normal(scale=0.01, size=8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["a"], r["b"]) for r in
           similarity.ann_lsh_pairs(df, dim=8, n_planes=8, threshold=0.99).collect()}
    expected = {(i * 2, i * 2 + 1) for i in range(30)}
    recall = len(got & expected) / len(expected)
    assert recall >= 0.6  # single-table LSH; multi-table unioning raises it
    assert got <= expected | {(a, b) for a in range(60) for b in range(60)}


def test_knn_join(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(100, [9.0, 1.0])], "vec_id long, embedding array<float>"
    )
    got = similarity.knn_join(corpus, queries, k=3).collect()
    assert [r["id"] for r in got] == [9, 8, 7]
    assert [r["rank"] for r in got] == [1, 2, 3]


# --- textstats -----------------------------------------------------------

def test_quality_metrics(spark):
    df = spark.createDataFrame([("Hello, world! 42 times.",)], ["text"])
    r = textstats.quality_metrics(df).first()
    assert r["n_tokens"] == 4
    assert r["n_chars"] == 23
    assert r["n_punct"] == 3  # comma, exclamation, period
    assert r["n_digits"] == 2
    assert r["n_upper"] == 1  # just the H


def test_token_counts_empty(spark):
    df = spark.createDataFrame([("",), ("   ",), ("one two",)], ["text"])
    got = [r["n"] for r in df.select(textstats.token_count(F.col("text")).alias("n")).collect()]
    assert got == [0, 0, 2]


def test_detect_language(spark):
    df = spark.createDataFrame(
        [("the cat is in the house and it is warm",),
         ("der hund ist nicht in das haus und die katze",),
         ("zzz qqq xxx",)],
        ["text"],
    )
    got = [r["lang_pred"] for r in textstats.detect_language(df).collect()]
    assert got == ["en", "de", "und"]


def test_fingerprint_stable_under_jitter(spark):
    df = spark.createDataFrame(
        [(0, "Hello World"), (1, "hello,   world!!"), (2, "different")],
        ["id", "text"],
    )
    got = {r["id"]: r["fingerprint"] for r in textstats.fingerprint(df).collect()}
    assert got[0] == got[1] != got[2]
    assert len(got[0]) == 16


# --- multimodal ----------------------------------------------------------

@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", bytearray(b"imgbytes0"), "image/png", {"w": "raw"}),
        (1, "image", bytearray(b"imgbytes1"), "image/png", None),
        (2, "audio", bytearray(b"audiobytes"), "audio/wav", None),
        (3, "video", bytearray(b"videobytes"), "video/mp4", None),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_decode_image_fake_deterministic(media):
    a = {r["media_id"]: (r["width"], r["height"], r["sha"]) for r in
         multimodal.decode_image(media, fake=True).collect()}
    b = {r["media_id"]: (r["width"], r["height"], r["sha"]) for r in
         multimodal.decode_image(media, fake=True).collect()}
    assert a == b and set(a) == {0, 1}
    assert all(16 <= v[0] <= 4096 for v in a.values())


def test_decode_image_real_raises(media):
    import py4j

    with pytest.raises(Exception) as exc:
        multimodal.decode_image(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_sample_frames_udtf_shape(media):
    rows = multimodal.sample_frames(media, every_n=5, max_frames=4).collect()
    assert all(r["media_id"] == 3 for r in rows)
    assert 1 <= len(rows) <= 4
    assert [r["frame_idx"] for r in rows] == [i * 5 for i in range(len(rows))]


def test_resize_stub_meta(media):
    out = multimodal.resize_stub(media, 224, 224).filter(F.col("media_id") == 0).first()
    assert out["meta"]["resize_w"] == "224" and out["meta"]["w"] == "raw"


# --- r2: exact-verified surfaces (hash-independent emitted rows) ----------


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_minhash_verified_equals_bruteforce(spark, sf_docs):
    """LSH candidates + exact verify must reproduce brute-force trigram
    Jaccard truth exactly (recall 1.0, precision 1.0 by construction)."""
    truth = {(r["a"], r["b"], round(r["jaccard"], 12)) for r in
             dedup.ngram_jaccard_pairs(sf_docs, "doc_id", "text", n=3,
                                       threshold=0.5, max_shingle_df=None).collect()}
    got = {(r["a"], r["b"], round(r["jaccard"], 12)) for r in
           dedup.minhash_neardup_verified(sf_docs, "doc_id", "text", n=3,
                                          threshold=0.5).collect()}
    assert got == truth and len(truth) > 0


def test_simhash_pigeonhole_recall_guaranteed(spark, sf_docs):
    """Multi-block candidates must find EVERY pair at hamming ≤ 3 — the
    pigeonhole guarantee, checked against an all-pairs cross join."""
    sim = dedup.simhash_md5(sf_docs, "doc_id", "text").cache()
    a = sim.select(F.col("id").alias("a"), F.col("simhash").alias("ha"))
    b = sim.select(F.col("id").alias("b"), F.col("simhash").alias("hb"))
    truth = {(r["a"], r["b"], r["hamming"]) for r in
             a.join(b, a.a < b.b)
             .select("a", "b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
             .filter(F.col("hamming") <= 3).collect()}
    got = {(r["a"], r["b"], r["hamming"]) for r in
           dedup.simhash_hamming_pairs(sim, max_hamming=3).collect()}
    assert got == truth and len(truth) > 0


def test_simhash_md5_portable_vs_duckdb(spark, sf_docs):
    """The md5-based simhash must be bit-identical to an independent
    pure-Python computation (the same definition DuckDB evaluates)."""
    import hashlib
    import re

    sample = sf_docs.orderBy("doc_id").limit(20).collect()
    got = {r["id"]: r["simhash"] for r in
           dedup.simhash_md5(spark.createDataFrame(sample), "doc_id", "text").collect()}
    for row in sample:
        toks = [t for t in re.sub(r"[^a-z0-9]+", " ", row["text"].lower()).strip().split(" ") if t]
        if not toks:
            assert row["doc_id"] not in got
            continue
        counts = [0] * 60
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[17:32], 16)
            for bit in range(60):
                counts[bit] += 1 if (h >> bit) & 1 else -1
        expect = sum(1 << bit for bit in range(60) if counts[bit] > 0)
        assert got[row["doc_id"]] == expect


def test_ann_verified_equals_bruteforce(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = e.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    a = v.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    truth = {(r["a"], r["b"], round(r["sim"], 12)) for r in
             a.join(b, a.a < b.b)
             .select("a", "b", similarity.cosine(F.col("va"), F.col("vb")).alias("sim"))
             .filter(F.col("sim") >= 0.45).collect()}
    got = {(r["a"], r["b"], round(r["sim"], 12)) for r in
           similarity.ann_pairs_verified(e, dim=64, n_planes=4, n_tables=48,
                                         threshold=0.45).collect()}
    assert got == truth and len(truth) > 0


def test_minhash_band_bounds_raise(spark, docs):
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", num_perm=8)
    with pytest.raises(ValueError):
        dedup.minhash_lsh_candidates(sigs, bands=8, rows_per_band=4, num_perm=8)


def test_exact_duplicates_dup_ids_cap(spark):
    rows = [(i, "same text") for i in range(50)] + [(99, "unique")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_duplicates(df, "doc_id", "text", max_dup_ids=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_dups"] == 50 and r["keep_id"] == 0
    assert r["dup_ids"] == list(range(10))  # capped at 10 smallest ids


# --- r2: REAL multimodal decoders (library-free formats) -------------------


def _ppm_bytes(w, h, rgb):
    import numpy as np
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[:, :] = rgb
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _bmp_bytes(w, h, rgb):
    """Minimal bottom-up 24-bit BI_RGB BMP."""
    import struct
    row = (bytes((rgb[2], rgb[1], rgb[0])) * w + b"\x00" * 3)[: (w * 3 + 3) & ~3]
    raster = row * h
    off = 54
    header = (b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                            2835, 2835, 0, 0))
    return header + raster


def _wav_bytes(sr, samples):
    import io
    import struct
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


@pytest.fixture(scope="module")
def real_media(spark):
    rows = [
        (1, "image", bytearray(_ppm_bytes(8, 4, (10, 20, 30))),
         "image/x-portable-pixmap", {}),
        (2, "image", bytearray(_bmp_bytes(5, 3, (200, 100, 50))), "image/bmp", {}),
        (3, "audio", bytearray(_wav_bytes(8000, [0, 1000, -1000, 1000])), "audio/wav", {}),
        (4, "video", bytearray(_ppm_bytes(4, 2, (9, 9, 9)) * 5),
         "video/x-ppm-stream", {}),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_decode_image_real_ppm_and_bmp(real_media):
    got = {r["media_id"]: r for r in multimodal.decode_image_real(real_media).collect()}
    p = got[1]
    assert (p["width"], p["height"], p["channels"]) == (8, 4, 3)
    assert (p["mean_r"], p["mean_g"], p["mean_b"]) == (10.0, 20.0, 30.0)
    b = got[2]
    assert (b["width"], b["height"]) == (5, 3)
    assert (b["mean_r"], b["mean_g"], b["mean_b"]) == (200.0, 100.0, 50.0)


def test_resize_images_real(real_media, spark):
    out = multimodal.resize_images(real_media, 4, 2).collect()
    assert len(out) == 2
    resized = spark.createDataFrame(out, multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in multimodal.decode_image_real(resized).collect()}
    for mid, want in ((1, (10.0, 20.0, 30.0)), (2, (200.0, 100.0, 50.0))):
        f = feats[mid]
        assert (f["width"], f["height"]) == (4, 2)
        assert (f["mean_r"], f["mean_g"], f["mean_b"]) == want  # solid color survives
        assert {r["media_id"]: r["meta"] for r in out}[mid]["resize_w"] == "4"


def test_extract_audio_features_real(real_media):
    import math
    got = multimodal.extract_audio_features_real(real_media).collect()
    assert len(got) == 1
    a = got[0]
    assert (a["sample_rate"], a["n_samples"], a["channels"]) == (8000, 4, 1)
    assert math.isclose(a["rms"], (3_000_000 / 4) ** 0.5)
    assert math.isclose(a["duration_sec"], 4 / 8000)


def test_sample_frames_real(real_media):
    got = multimodal.sample_frames_real(real_media, every_n=2).collect()
    idx = sorted(r["frame_idx"] for r in got)
    assert idx == [0, 2, 4]  # 5 frames, every 2nd
    assert all((r["width"], r["height"]) == (4, 2) for r in got)
    assert all(abs(r["mean_lum"] - 9.0) < 1e-9 for r in got)


def test_decode_image_real_unknown_mime_raises(spark):
    rows = [(9, "image", bytearray(b"\x89PNG..."), "image/png", {})]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="decoder|Pillow|NotImplemented"):
        multimodal.decode_image_real(df).collect()


# --- r2: IVF ANN -----------------------------------------------------------


def test_ivf_recall_vs_bruteforce(spark):
    """On near-random testdata embeddings recall grows monotonically with
    nprobe and full probe equals brute force exactly (IVF's pruning is
    only an approximation when the data has no cluster structure — see
    the clustered test below for the regime IVF is built for)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qrow = e.filter(F.col("vec_id") == 0).first()
    q = [float(x) for x in qrow["embedding"]]
    corpus = e.filter(F.col("vec_id") != 0)
    truth = [r["id"] for r in similarity.cosine_topk(corpus, q, k=10).collect()]

    centers, assigned = similarity.ivf_build(corpus, dim=64, n_cells=16)
    assigned = assigned.cache()
    recalls = []
    for nprobe in (2, 8, 16):
        got = [r["id"] for r in
               similarity.ivf_search(assigned, centers, q, k=10,
                                     nprobe=nprobe).collect()]
        recalls.append(len(set(got) & set(truth)) / len(truth))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] == 1.0  # full probe == brute force
    got_all = [r["id"] for r in
               similarity.ivf_search(assigned, centers, q, k=10,
                                     nprobe=16).collect()]
    assert got_all == truth


def test_ivf_clustered_high_recall_few_probes(spark):
    """The regime IVF is designed for: clustered vectors. With 8 real
    clusters and nprobe=2 of 8 cells, top-10 recall must be ~1 while
    scanning a quarter of the corpus."""
    import numpy as np

    rng = np.random.RandomState(3)
    centers_np = rng.normal(scale=10.0, size=(8, 16))
    rows = []
    vid = 0
    for ci in range(8):
        for _ in range(50):
            v = centers_np[ci] + rng.normal(scale=0.5, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in centers_np[0] + rng.normal(scale=0.5, size=16)]
    truth = [r["id"] for r in similarity.cosine_topk(df, q, k=10).collect()]
    centers, assigned = similarity.ivf_build(df, dim=16, n_cells=8)
    got = [r["id"] for r in
           similarity.ivf_search(assigned.cache(), centers, q, k=10,
                                 nprobe=2).collect()]
    assert len(set(got) & set(truth)) / len(truth) >= 0.9


def test_ivf_deterministic(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1, a1 = similarity.ivf_build(e, dim=64, n_cells=8, seed=7)
    c2, a2 = similarity.ivf_build(e, dim=64, n_cells=8, seed=7)
    assert c1 == c2
    m1 = {r["id"]: r["cell"] for r in a1.collect()}
    m2 = {r["id"]: r["cell"] for r in a2.collect()}
    assert m1 == m2


# --- r2: prefix-filtering exact similarity join -----------------------------


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_prefix_join_equals_bruteforce(spark, threshold):
    """Prefix filtering must lose NOTHING: identical output to the full
    inverted-index join at every threshold, on real testdata."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    truth = {(r["a"], r["b"], round(r["jaccard"], 12)) for r in
             dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=3,
                                       threshold=threshold,
                                       max_shingle_df=None).collect()}
    got = {(r["a"], r["b"], round(r["jaccard"], 12)) for r in
           dedup.ngram_jaccard_pairs_prefix(d, "doc_id", "text", n=3,
                                            threshold=threshold).collect()}
    assert got == truth and len(truth) > 0


def test_prefix_join_small_fixture(spark, docs):
    got = {(r["a"], r["b"]) for r in
           dedup.ngram_jaccard_pairs_prefix(docs, "doc_id", "text", n=3,
                                            threshold=0.5).collect()}
    assert (0, 1) in got and (0, 5) in got and (1, 5) in got and (0, 2) in got
    assert all(not (a in (3, 4) or b in (3, 4)) for a, b in got)


# --- r3: guard + lifecycle fixes (ADVICE round 2) ---------------------------


def test_minhash_band_guard_derives_length_from_data(spark, docs):
    """Signatures built with fewer perms than bands*rows_per_band must
    raise at runtime (data-derived length), not silently collapse every
    doc into one empty-band bucket."""
    sigs8 = dedup.minhash_signatures(docs, "doc_id", "text", n=2, num_perm=8)
    with pytest.raises(Exception, match="signature length"):
        dedup.minhash_lsh_candidates(sigs8, bands=16, rows_per_band=4,
                                     num_perm=64).count()


def test_minhash_band_guard_static(spark, docs):
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", n=2, num_perm=8)
    with pytest.raises(ValueError, match="exceeds"):
        dedup.minhash_lsh_candidates(sigs, bands=16, rows_per_band=4,
                                     num_perm=8)


def test_unpersist_tracked_releases_frames(spark, docs):
    from kgsum_spark.datapipe._util import _TRACKED, unpersist_tracked

    unpersist_tracked()
    out = dedup.minhash_neardup_verified(docs, "doc_id", "text", n=2,
                                         threshold=0.5)
    out.count()
    assert len(_TRACKED) > 0  # sigs + pairs + pruned shingles registered
    persisted = [df for df in _TRACKED if df.storageLevel.useMemory
                 or df.storageLevel.useDisk]
    assert persisted
    n = unpersist_tracked()
    assert n == len(persisted) or n >= len(persisted)
    assert not _TRACKED
    for df in persisted:
        assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)


# --- r3: materialized IVF layout — file-level partition pruning -------------


def test_ivf_write_pruned_search(spark, tmp_path):
    """ivf_search_pruned over an ivf_write layout must (a) return exactly
    the in-memory ivf_search result, (b) carry PartitionFilters on the
    scan (Catalyst partition pruning, not a row filter), and (c) list only
    the probed cells' files in the pruned relation."""
    import io
    import contextlib

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in
         e.filter(F.col("vec_id") == 0).first()["embedding"]]
    centers, assigned = similarity.ivf_build(
        e.filter(F.col("vec_id") != 0), dim=len(q), n_cells=8)
    path = str(tmp_path / "ivf_idx")
    similarity.ivf_write(assigned, path, centers)

    mem = [(r["id"], round(r["sim"], 10)) for r in
           similarity.ivf_search(assigned, centers, q, k=10, nprobe=3).collect()]
    pruned = similarity.ivf_search_pruned(spark, path, q, k=10, nprobe=3)
    got = [(r["id"], round(r["sim"], 10)) for r in pruned.collect()]
    assert got == mem and len(got) == 10

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    lines = [ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln]
    assert lines and "cell" in lines[0] and " IN " in lines[0], lines

    # the probed relation's file list stays inside the 3 probed cell dirs
    probe = set(similarity.rank_cells(centers, q, 3))
    probed_read = spark.read.parquet(
        *[f"{path}/cell={c}" for c in sorted(probe)])
    n_probed_files = len(probed_read.inputFiles())
    n_all_files = len(spark.read.parquet(path).inputFiles())
    assert n_probed_files < n_all_files  # genuinely fewer files than full scan


def test_ivf_centers_sidecar_roundtrip(spark, tmp_path):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centers, assigned = similarity.ivf_build(
        e.filter(F.col("vec_id") != 0), dim=64, n_cells=4)
    path = str(tmp_path / "ivf_rt")
    similarity.ivf_write(assigned, path, centers)
    assert similarity.ivf_read_centers(spark, path) == centers


def test_detect_language_multilingual_accuracy(spark):
    """Seeded multilingual corpus: 12 languages x 8 sentences sampled from
    each language's own stopword inventory (+ neutral filler). The scorer
    must id every sentence correctly and return 'und' on symbol noise."""
    import random

    rnd = random.Random(42)
    rows = []
    for lang, words in sorted(textstats.STOPWORDS.items()):
        for i in range(8):
            sent = rnd.sample(words, 12) + [f"zkq{i}", "foo9"]
            rnd.shuffle(sent)
            rows.append((lang, " ".join(sent)))
    rows.append(("und", "@@@ ### 12345 :::"))
    rows.append(("und", ""))
    df = spark.createDataFrame(rows, ["expected", "text"])
    got = textstats.detect_language(df).collect()
    wrong = [(r["expected"], r["lang_pred"]) for r in got
             if r["lang_pred"] != r["expected"]]
    acc = 1 - len(wrong) / len(got)
    assert acc >= 0.95, f"accuracy {acc}: {wrong[:10]}"


def test_spread_no_shuffle_for_large_single_splittable_file(spark, tmp_path):
    """ADVICE r3: one multi-partition-sized file is NOT a narrow scan —
    parquet splits at maxPartitionBytes, so spread() must no-op instead of
    forcing a full shuffle; a genuinely tiny file still widens."""
    import pandas as pd

    from kgsum_spark.datapipe._util import spread

    big = tmp_path / "big.parquet"
    pd.DataFrame({"doc_id": range(60_000),
                  "text": ["payload " * 30] * 60_000}).to_parquet(
        big, row_group_size=2_000, compression=None)
    small = tmp_path / "small.parquet"
    pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]}).to_parquet(small)

    old = spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes", "4m")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", "1024")
        wide = spread(spark.read.parquet(str(big)), "doc_id")
        assert "Exchange" not in wide._jdf.queryExecution().executedPlan().toString(), \
            "large single splittable file must not be reshuffled"
        narrow = spread(spark.read.parquet(str(small)), "doc_id")
        assert "Exchange" in narrow._jdf.queryExecution().executedPlan().toString(), \
            "tiny file should be widened"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def test_spread_widens_large_gz_file(spark, tmp_path):
    """ADVICE r4: a large NON-splittable (.gz) file scans as ONE partition
    regardless of byte size — the size-based estimate must count it as 1,
    not bytes/maxSplit, so spread() widens the genuinely narrow scan."""
    import gzip

    from kgsum_spark.datapipe._util import spread

    gz = tmp_path / "big.json.gz"
    with gzip.open(gz, "wt") as f:
        for i in range(30_000):
            f.write('{"doc_id": %d, "text": "%s"}\n' % (i, "payload " * 30))
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes", "4m")
    try:
        # small enough that the BYTE formula would call the file wide
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        spark.conf.set("spark.sql.files.openCostInBytes", "512")
        df = spark.read.schema("doc_id long, text string").json(str(gz))
        wide = spread(df, "doc_id")
        assert "Exchange" in wide._jdf.queryExecution().executedPlan().toString(), \
            "large gz file is one scan partition and must be widened"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def test_derive_lsh_params_scale_rule():
    """VERDICT r3: the occupancy rule is the DEFAULT. At the calibration
    point (the 2k-vector sf0.1 embeddings table) the defaults are 4x48; at
    the measured 10x point (20k vectors) the derived params match the
    measured-good tuning (8x96, BENCH/BASELINE.md); growth is logarithmic
    (one extra plane per doubling)."""
    from kgsum_spark.datapipe.similarity import derive_lsh_params

    assert derive_lsh_params(2_000) == (4, 48)
    assert derive_lsh_params(500) == (4, 48)         # never below floor
    assert derive_lsh_params(20_000) == (8, 96)      # the measured 10x point
    k1, l1 = derive_lsh_params(10**9)
    assert k1 == 4 + 19 and l1 == round(48 * 2 ** (19 / 4))


def test_multi_lsh_candidates_derives_params_from_count(spark):
    """Leaving n_planes/n_tables None derives them from df.count() and
    still returns the near pair."""
    import numpy as np

    from kgsum_spark.datapipe import similarity as sim

    rng = np.random.RandomState(7)
    base = rng.normal(size=8)
    rows = [(0, [float(x) for x in base]),
            (1, [float(x) for x in base + rng.normal(scale=0.01, size=8)])]
    rows += [(i, [float(x) for x in rng.normal(size=8)]) for i in range(2, 40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["a"], r["b"]) for r in
           sim.multi_lsh_candidates(df, dim=8).collect()}
    assert (0, 1) in got


def test_lsh_bucket_cap_drops_degenerate_cluster(spark):
    """max_bucket_size: a 40-doc exact-template cluster (identical text →
    identical signatures → every band bucket has 40 members) must emit ZERO
    pairs under a cap of 20, while a genuine near-dup pair in a small
    bucket survives. Uncapped, the same corpus emits C(40,2)=780 cluster
    pairs — the quadratic regime that hung the 100k-doc streaming refresh."""
    rows = [(i, "the exact same boilerplate page body repeated verbatim")
            for i in range(40)]
    rows += [(100, "unique aardvark zebra quokka document body"),
             (101, "unique aardvark zebra quokka document text")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", n=3, num_perm=64)

    capped = {(r["a"], r["b"]) for r in
              dedup.minhash_lsh_candidates(sigs, bands=32, rows_per_band=2,
                                           max_bucket_size=20).collect()}
    assert (100, 101) in capped
    assert all(a >= 100 and b >= 100 for a, b in capped)

    uncapped = {(r["a"], r["b"]) for r in
                dedup.minhash_lsh_candidates(sigs, bands=32,
                                             rows_per_band=2).collect()}
    assert (100, 101) in uncapped
    assert sum(1 for a, b in uncapped if a < 100 and b < 100) == 780


def test_ngram_contamination(spark):
    """A training doc sharing a 3-gram with a benchmark doc is flagged with
    exact hit counts; disjoint docs are not; overlap shorter than n is not."""
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text about spark plans"),
         (3, "quick brown only")],       # 2-gram overlap < n=3 → clean
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run"),
         (101, "the quick brown cat")],   # shares 'the quick brown' too
        "doc_id int, text string",
    )
    got = {r["id"]: (r["n_hit_shingles"], r["n_bench_docs"]) for r in
           dedup.ngram_contamination(train, bench, "doc_id", "text", n=3).collect()}
    # doc 1 shares 'the quick brown' (both bench) + 'quick brown fox' (100)
    assert got == {1: (2, 2)}


def test_decontaminate_drop(spark):
    """The DROP step removes exactly the flagged docs: flag ∪ survivors =
    corpus, flag ∩ survivors = ∅, and clean docs pass through unchanged."""
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text about spark plans"),
         (3, "quick brown only")],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "doc_id int, text string",
    )
    kept = dedup.decontaminate_drop(train, bench, "doc_id", "text", n=3)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    assert kept.columns == train.columns  # anti join keeps the left schema
    flagged = {r["id"] for r in dedup.ngram_contamination(
        train, bench, "doc_id", "text", n=3).collect()}
    assert flagged == {1}


def test_neardup_dedup_survivors(spark):
    """pairs → CC → min-id survivor: a 3-doc near-dup chain keeps only its
    min id, singletons survive, and minhash ≡ ngram on the same corpus.
    Ids 9/10/11 force the numeric-vs-string min distinction ('10' < '9'
    lexicographically, but 9 must win)."""
    rows = [
        (9, "alpha beta gamma delta epsilon zeta eta theta"),
        (10, "alpha beta gamma delta epsilon zeta eta iota"),   # ~dup of 9
        (11, "beta gamma delta epsilon zeta eta theta kappa"),  # ~dup of 9
        (2, "totally different text about query planning stuff"),
        (3, "short"),                                           # no trigrams
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for method in ("ngram", "minhash"):
        kept = dedup.neardup_dedup(df, "doc_id", "text", n=3, threshold=0.4,
                                   method=method, max_shingle_df=None)
        assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 9], method
    with pytest.raises(ValueError):
        dedup.neardup_dedup(df, "doc_id", "text", method="nope")


def test_quality_filter_bounds(spark):
    """Each bound drops exactly its offender: too short, too long, too
    much punctuation, too many digits, too repetitive; a clean doc stays.
    Pass-through defaults keep everything."""
    rows = [
        (1, "a solid document with exactly eight words here"),
        (2, "short"),                                      # < min_tokens
        (3, " ".join(f"w{i}" for i in range(30))),         # > max_tokens
        (4, "lots of punctuation !!! ??? ;;; ::: ... @@@"),
        (5, "numbers 12345 67890 12345 67890 everywhere 99"),
        (6, "dup dup dup dup dup dup dup unique"),          # repetitive
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    kept = textstats.quality_filter(
        df, "text", min_tokens=3, max_tokens=20,
        max_punct_ratio=0.1, max_digit_ratio=0.1, max_dup_token_frac=0.5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1]
    assert df.count() == textstats.quality_filter(df, "text").count()


def test_embedding_neardup_dedup(spark):
    """Two near-identical vectors collapse to the min id; the orthogonal
    one survives. Exercises survivors_from_pairs on the vector path."""
    rows = [
        (9, [1.0, 0.0, 0.0, 0.0]),
        (10, [0.999, 0.01, 0.0, 0.0]),   # cos ≈ 1 with 9
        (2, [0.0, 1.0, 0.0, 0.0]),       # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    kept = similarity.embedding_neardup_dedup(
        df, dim=4, threshold=0.9, n_planes=2, n_tables=8)
    assert sorted(r["vec_id"] for r in kept.collect()) == [2, 9]


def test_curate_corpus_three_stages(spark):
    """exact dup collapses first (4 survives as min of {4,5}), near-dup
    cluster keeps its min (9 of {9,10}), contaminated doc 1 drops last,
    clean docs pass through; bench=None skips decontamination."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text about spark plans today"),
         (4, "identical duplicated sentence body here"),
         (5, "Identical DUPLICATED sentence body here!"),       # exact dup of 4
         (9, "alpha beta gamma delta epsilon zeta eta theta"),
         (10, "alpha beta gamma delta epsilon zeta eta iota")],  # near dup of 9
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "doc_id int, text string",
    )
    kept = dedup.curate_corpus(docs, bench, "doc_id", "text",
                               n=3, threshold=0.5, method="ngram",
                               max_shingle_df=None, contamination_n=3)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4, 9]
    no_decon = dedup.curate_corpus(docs, None, "doc_id", "text",
                                   n=3, threshold=0.5, method="ngram",
                                   max_shingle_df=None)
    assert sorted(r["doc_id"] for r in no_decon.collect()) == [1, 2, 4, 9]


def test_redact_pii(spark):
    from kgsum_spark.datapipe import textstats as ts
    rows = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org now"),
         (2, "server at 192.168.0.1 fell over"),
         (3, "call +1(415)555-0199 today"),
         (4, "versions 1.2 and 3.4.5 are clean"),      # not an IP (2/3 octets)
         (5, "no pii here at all")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["red"] for r in
           rows.select("doc_id", ts.redact_pii(F.col("text")).alias("red")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server at <IP> fell over"
    assert got[3] == "call <PHONE> today"
    assert got[4] == "versions 1.2 and 3.4.5 are clean"
    assert got[5] == "no pii here at all"


def test_repetition_metrics(spark):
    from kgsum_spark.datapipe import textstats as ts
    rows = spark.createDataFrame(
        [(1, "buy buy buy now now cheap"),   # 6 toks, 3 distinct, top=3
         (2, "all words are unique here")],  # 5 toks, 5 distinct, top=1
        "doc_id int, text string",
    )
    got = {r["id"]: r for r in ts.repetition_metrics(rows).collect()}
    assert got[1]["n_tokens"] == 6
    assert abs(got[1]["dup_token_frac"] - 0.5) < 1e-12
    assert abs(got[1]["top_token_frac"] - 0.5) < 1e-12
    assert got[2]["dup_token_frac"] == 0.0
    assert abs(got[2]["top_token_frac"] - 0.2) < 1e-12


def test_chunk_documents(spark):
    from kgsum_spark.datapipe import textstats as ts
    rows = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),  # 10 toks, w4 s3 → 3 chunks
         (2, "short doc"),                            # < width → 1 whole chunk
         (3, "   ")],                                 # empty → no chunks
        "doc_id int, text string",
    )
    got = [(r["id"], r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
           for r in ts.chunk_documents(rows, width=4, stride=3)
                      .orderBy("id", "chunk_idx").collect()]
    assert got == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 4, "t6 t7 t8 t9"),
        (2, 0, 2, "short doc"),
    ]


def test_dedup_against_reference(spark):
    """New docs whose normalized text exists in the reference drop (case
    and punctuation differences still match); unseen texts survive; the
    broadcast_ref variant returns the identical set."""
    new = spark.createDataFrame(
        [(1, "Hello, WORLD!"), (2, "a brand new document"),
         (3, "shared text")],
        "doc_id int, text string")
    ref = spark.createDataFrame(
        [(100, "hello world"), (101, "shared   text")],
        "doc_id int, text string")
    for bc in (False, True):
        kept = dedup.dedup_against_reference(
            new, ref, "doc_id", "text", broadcast_ref=bc)
        assert sorted(r["doc_id"] for r in kept.collect()) == [2]


def test_pack_sequences_invariants(spark):
    """Concat-and-split semantics: every token of every non-empty doc is
    assigned exactly once, every sequence holds exactly `capacity`
    tokens except the last, docs span boundaries, empties drop, and the
    slices are contiguous within each doc."""
    rows = [(1, "a b c"), (2, "d e f g"), (3, "h"), (4, ""),
            (5, " ".join(f"t{i}" for i in range(10)))]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = textstats.pack_sequences(df, capacity=4).collect()
    assert sum(r["tok_len"] for r in out) == 18          # 3+4+1+10
    per_seq = {}
    for r in out:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["tok_len"]
    last = max(per_seq)
    assert all(v == 4 for s, v in per_seq.items() if s != last)
    assert per_seq[last] == 18 - 4 * last
    assert not any(r["id"] == 4 for r in out)            # empty dropped
    assert {r["seq_id"] for r in out if r["id"] == 2} == {0, 1}  # spans
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["id"], r["tok_start"])):
        by_doc.setdefault(r["id"], []).append((r["tok_start"], r["tok_len"]))
    for slices in by_doc.values():
        pos = 0
        for start, ln in slices:
            assert start == pos and ln > 0
            pos += ln


def test_pack_sequences_partition_invariant(spark):
    """The assignment depends only on the order column, not on the
    physical partitioning of the input: 1-partition and 16-partition
    inputs produce identical tables (the two-phase prefix sum is
    boundary-independent)."""
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(1 + i % 7)))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = sorted(map(tuple, textstats.pack_sequences(
        df.coalesce(1), capacity=16).collect()))
    b = sorted(map(tuple, textstats.pack_sequences(
        df.repartition(16), capacity=16).collect()))
    assert a == b
    with pytest.raises(ValueError):
        textstats.pack_sequences(df, capacity=0)


def test_pack_sequences_text_materialization(spark):
    """The materialized shards agree with the assignment table: every
    sequence holds exactly `capacity` tokens except the last, and the
    concatenation of all sequences equals the corpus token stream in
    document order (boundary-crossing docs reassemble correctly)."""
    rows = [(1, "a b c"), (2, "d e f g"), (3, "h"),
            (5, " ".join(f"t{i}" for i in range(10)))]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = sorted(textstats.pack_sequences_text(df, capacity=4).collect(),
                 key=lambda r: r["seq_id"])
    assert [r["n_tokens"] for r in out] == [4, 4, 4, 4, 2]
    stream = " ".join(r["seq_text"] for r in out)
    assert stream == "a b c d e f g h " + " ".join(f"t{i}" for i in range(10))


def test_pack_sequences_multibatch_carry(spark):
    """The running offset carries across Arrow batches WITHIN a
    partition: with maxRecordsPerBatch=7 a 300-row single partition
    spans many batches, and the result must equal the single-batch
    run."""
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(1 + i % 5)))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id int, text string").coalesce(1)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        small = sorted(map(tuple, textstats.pack_sequences(
            df, capacity=16).collect()))
    finally:
        spark.conf.set(key, old)
    big = sorted(map(tuple, textstats.pack_sequences(
        df, capacity=16).collect()))
    assert small == big and len(small) > 0


def test_curate_corpus_quality_and_mixture_stages(spark):
    """The optional stage-0 quality filter and final mixture stage
    compose with the dedup core: the low-quality doc drops first, the
    exact dup collapses, and a rate-1.0/0.0 mixture keeps exactly the
    'en' survivors."""
    docs = spark.createDataFrame(
        [(1, "a solid little document with plenty of words here", "en"),
         (2, "a solid little document with plenty of words here", "en"),
         (3, "!!! ??? ;;; :::", "en"),                 # fails quality
         (4, "another perfectly reasonable document right here", "de")],
        "doc_id int, text string, lang string")
    out = dedup.curate_corpus(
        docs, None, "doc_id", "text", method="ngram", max_shingle_df=None,
        quality_bounds=dict(min_tokens=3, max_punct_ratio=0.2),
        mixture=("lang", {"en": 1.0}, 0.0),
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1]


def test_datapipe_scale_plan_shapes(spark):
    """Scale-property regressions: the map-only curation ops plan with
    ZERO exchanges, and sequence packing's only shuffle is its range
    repartition (a hashpartitioning exchange here would mean the
    redundant Window-style shuffle crept back)."""
    from kgsum_spark.operators.agg import mixture_sample

    docs = spark.createDataFrame(
        [(i, f"some words here number {i}", "en") for i in range(50)],
        "doc_id int, text string, lang string")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    assert "Exchange" not in plan(textstats.quality_filter(
        docs, "text", min_tokens=2))
    assert "Exchange" not in plan(mixture_sample(
        docs, "lang", {"en": 0.5}, id_col="doc_id"))
    assert "Exchange hashpartitioning" not in plan(
        textstats.pack_sequences(docs, capacity=16))


def test_pack_sequences_empty_and_single(spark):
    """Degenerate inputs: an all-empty corpus packs to zero rows (the
    totals collect sees no partitions with rows); a single short doc
    yields one partial sequence."""
    empty = spark.createDataFrame([(1, "   "), (2, "")],
                                  "doc_id int, text string")
    assert textstats.pack_sequences(empty, capacity=8).count() == 0
    assert textstats.pack_sequences_text(empty, capacity=8).count() == 0
    one = spark.createDataFrame([(7, "just three words")],
                                "doc_id int, text string")
    got = textstats.pack_sequences_text(one, capacity=8).collect()
    assert [(r["seq_id"], r["n_tokens"], r["seq_text"]) for r in got] == \
        [(0, 3, "just three words")]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.integers(min_value=0, max_value=40),   # token count per doc
    min_size=1, max_size=60),
    st.integers(min_value=1, max_value=17))
def test_pack_sequences_matches_sequential_reference(spark, ntoks, cap):
    """Property: the distributed two-phase prefix sum produces exactly
    the assignment a naive sequential packer computes — for arbitrary
    token-count profiles (including zero-token docs, docs larger than
    the capacity, and capacity 1)."""
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(n)))
            for i, n in enumerate(ntoks)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = sorted(map(tuple, textstats.pack_sequences(
        df, capacity=cap).collect()))
    # sequential reference
    expect, off = [], 0
    for i, n in enumerate(ntoks):
        if n == 0:
            continue
        for seq in range(off // cap, (off + n - 1) // cap + 1):
            start = max(0, seq * cap - off)
            end = min(n, (seq + 1) * cap - off)
            expect.append((seq, i, start, end - start))
        off += n
    assert got == sorted(expect)


def test_survivors_broadcast_gate_strategies_identical(spark):
    """r6 (r5 VERDICT #1): survivors_from_pairs must return IDENTICAL
    survivors whether the drop set is broadcast or shuffled — the auto
    gate only changes the physical join. Forcing the shuffled path with a
    zero threshold must also actually take it (no broadcast hint left)."""
    rows = [
        (9, "alpha beta gamma delta epsilon zeta eta theta"),
        (10, "alpha beta gamma delta epsilon zeta eta iota"),
        (11, "beta gamma delta epsilon zeta eta theta kappa"),
        (2, "totally different text about query planning stuff"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=3,
                                      threshold=0.4, max_shingle_df=None)
    base = sorted(r["doc_id"] for r in dedup.survivors_from_pairs(
        df, "doc_id", pairs, broadcast_drop=True).collect())
    forced = dedup.survivors_from_pairs(
        df, "doc_id", pairs, broadcast_drop=False)
    assert sorted(r["doc_id"] for r in forced.collect()) == base == [2, 9]
    auto_shuffled = dedup.survivors_from_pairs(
        df, "doc_id", pairs, broadcast_drop="auto",
        broadcast_drop_threshold=0)
    assert sorted(r["doc_id"] for r in auto_shuffled.collect()) == base


def test_decontaminate_drop_gate_strategies_identical(spark):
    """r6: decontaminate_drop's hit-set broadcast auto-gate — broadcast,
    forced-shuffle, and a zero-threshold auto decision must all drop the
    same contaminated rows."""
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "totally clean document"),
         (3, "other clean words here")],
        "doc_id int, text string")
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps high")], "doc_id int, text string")
    expected = [2, 3]
    for kw in ({"broadcast_hits": True}, {"broadcast_hits": False},
               {"broadcast_hits": "auto"}):
        kept = dedup.decontaminate_drop(train, bench, "doc_id", "text",
                                        n=3, **kw)
        assert sorted(r["doc_id"] for r in kept.collect()) == expected, kw


def test_ann_verify_broadcast_gate_paths_identical(spark):
    """r6: ann_pairs_verified must emit BIT-IDENTICAL (a, b, sim) rows
    whether the verify stage join-attaches vectors (the 100 TB shape) or
    broadcasts the id→vector matrix into the UDF (the small-corpus fast
    path) — the gate only changes how vectors reach the cosine. A
    zero-byte ceiling must force the join path through "auto" too."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    join_path = sorted(similarity.ann_pairs_verified(
        e, dim=64, n_planes=4, n_tables=48, threshold=0.45,
        broadcast_vectors=False).collect())
    bcast_path = sorted(similarity.ann_pairs_verified(
        e, dim=64, n_planes=4, n_tables=48, threshold=0.45,
        broadcast_vectors=True).collect())
    auto_forced_join = sorted(similarity.ann_pairs_verified(
        e, dim=64, n_planes=4, n_tables=48, threshold=0.45,
        broadcast_vectors="auto", broadcast_vectors_max_bytes=0).collect())
    assert join_path == bcast_path == auto_forced_join
    assert len(join_path) > 0


def test_lsh_bucket_cap_accounting_observable(spark):
    """r6 (r5 VERDICT #3): the max_bucket_size cap's accounting is
    observable — a hot near-identical cluster lands in over-cap buckets,
    the Observation reports the dropped banded-row mass, and the
    candidate count stays sub-quadratic in the cluster size."""
    n_cluster, n_bg = 2000, 200
    cluster = spark.range(n_cluster).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("shared template words alpha beta gamma delta "
                       "epsilon zeta eta theta iota kappa uniq"),
                 F.col("id").cast("string")).alias("text"))
    bg = spark.range(n_bg).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("bg"), F.col("id").cast("string"),
                 F.lit("x completely "),
                 F.lit("different "), F.col("id").cast("string"),
                 F.lit(" words "), (F.col("id") * 7).cast("string")).alias("text"))
    docs = cluster.unionByName(bg)
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", n=3)
    sigs = sigs.localCheckpoint()  # probe + candidates share one compute
    cand = dedup.minhash_lsh_candidates(
        sigs, bands=32, rows_per_band=2, max_bucket_size=64)
    n_cand = cand.count()
    got = dedup.lsh_bucket_stats(sigs, bands=32, rows_per_band=2,
                                 max_bucket_size=64)
    assert got["dropped_rows"] > 0          # the hot cluster hit the cap
    assert got["banded_rows"] >= got["dropped_rows"]
    # most of the template cluster collides in its hottest bucket
    assert got["max_bucket"] >= n_cluster * 0.9
    # sub-quadratic: uncapped, the 2000-doc near-identical cluster alone
    # would emit ~C(2000,2) = 2M candidates; the cap bounds each bucket
    # at C(64,2) pairs
    assert n_cand < 200_000


def test_curation_template_cluster_time_budget(spark):
    """r6 (r5 VERDICT #3): one 10^5-member exact-template cluster plus a
    varied background corpus through the DEFAULT curate_corpus path
    (minhash) — exact dedup must consume the cluster before the pair
    space exists, so the whole five-stage run finishes in seconds, not
    the hours a quadratic candidate blowup would take. Pinned with a
    generous wall budget so only a complexity regression trips it."""
    import time

    n_cluster, n_bg = 100_000, 3_000
    cluster = spark.range(n_cluster).select(
        F.col("id").alias("doc_id"),
        F.lit("the exact same boilerplate page body repeated verbatim "
              "across the whole crawl shard").alias("text"))
    bg = spark.range(n_bg).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit("organic doc "), F.col("id").cast("string"),
                 F.lit(" with words "), (F.col("id") * 13).cast("string"),
                 F.lit(" and tail "), (F.col("id") * 7).cast("string")).alias("text"))
    docs = cluster.unionByName(bg)
    t0 = time.time()
    kept = dedup.curate_corpus(docs, None, "doc_id", "text",
                               n=3, threshold=0.5, method="minhash")
    n_kept = kept.count()
    wall = time.time() - t0
    # exact dedup keeps one cluster representative; background docs are
    # pairwise distinct and (modulo rare near-dup collisions) survive
    assert n_kept >= n_bg * 0.9 + 1
    assert n_kept <= n_bg + 1
    assert wall < 180, f"template-cluster curation took {wall:.0f}s"
