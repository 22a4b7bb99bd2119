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
    pairs = {(r["a"], r["b"]): r["est_jaccard"] for r in
             dedup.minhash_dedup_pairs(docs, "doc_id", "text", num_perm=64,
                                       bands=16, rows_per_band=4, threshold=0.5).collect()}
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
