"""Spark vectorized extraction ≡ single-process reference oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgsum_spark.assembly import assemble_turns
from kgsum_spark.extraction import extract_raw_triples, mentions_from_raw
from kgsum_spark.rules import (
    block_key_of,
    extract_sentence,
    normalize_mention,
    split_sentences,
)


def _oracle_extract(transcripts_pdf):
    """Pure-Python single-process extraction over the corpus (the reference
    path: per-row loops as kgsum does, /root/reference/src/preprocessing.py:308)."""
    out = set()
    for _, row in transcripts_pdf.iterrows():
        for sent in split_sentences(row["text"] or ""):
            hit = extract_sentence(sent)
            if hit:
                rule, s, o = hit
                out.add((s, rule.pred, o, row["conv_id"], int(row["turn_idx"])))
    return out


def test_spark_extraction_matches_oracle(spark, transcripts_df, corpus):
    raw = extract_raw_triples(assemble_turns(transcripts_df).drop("rn"))
    got = {
        (r["subj"], r["pred"], r["obj"], r["conv_id"], r["turn_idx"])
        for r in raw.collect()
    }
    want = _oracle_extract(corpus.transcripts)
    assert got == want


def test_extraction_count_matches_golden(spark, transcripts_df, corpus):
    n = extract_raw_triples(transcripts_df).count()
    assert n == len(corpus.golden)


def test_mentions_norm_and_block(spark, transcripts_df):
    raw = extract_raw_triples(transcripts_df)
    m = mentions_from_raw(raw).limit(500).collect()
    assert len(m) > 0
    for r in m:
        assert r["norm"] == normalize_mention(r["mention"])
        assert r["block_key"] == block_key_of(r["norm"])


def test_part_id_lineage_present(spark, transcripts_df):
    raw = extract_raw_triples(transcripts_df)
    assert raw.filter(F.col("part_id").isNull()).count() == 0


def test_first_match_wins_matches_oracle(spark):
    """ADVICE r1: a sentence fullmatching two rules ('A was created by B
    same as http://u.') emitted 2 triples on the Spark path but 1 from the
    single-process oracle. Both paths must be first-match-wins now."""
    from kgsum_spark.rules import extract_sentence

    s = "A was created by B same as http://u."
    rule, subj, obj = extract_sentence(s)
    df = spark.createDataFrame([("c0", 0, s)], "conv_id string, turn_idx int, text string")
    rows = extract_raw_triples(df).collect()
    assert len(rows) == 1
    assert (rows[0]["pred"], rows[0]["subj"], rows[0]["obj"]) == (rule.pred, subj, obj)
