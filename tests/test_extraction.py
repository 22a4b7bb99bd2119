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


def test_hostile_inputs(spark):
    """None / empty / unicode / huge / near-miss turns must not crash the
    extractor or emit spurious triples."""
    rows = [
        ("c0", 0, None),
        ("c0", 1, ""),
        ("c0", 2, "   "),
        ("c0", 3, "Ünïcødé 漢字 is a test."),          # non-ascii subject: rule obj ok
        ("c0", 4, "almost is a"),                      # near-miss: no final period
        ("c0", 5, "x was created by"),                 # near-miss: missing obj
        ("c0", 6, ("verylong " * 12000) + "Z is a token."),  # ~100KB turn
        ("c0", 7, "A is a b. " * 500),                 # many sentences, one rule
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = extract_raw_triples(df).collect()
    by_turn = {}
    for r in got:
        by_turn.setdefault(r["turn_idx"], []).append(r)
    assert set(by_turn) <= {3, 6, 7}
    assert len(by_turn.get(6, [])) == 1 and by_turn[6][0]["subj"].endswith("Z")
    assert len(by_turn.get(7, [])) == 500
    # unicode subject survives byte-identically
    assert by_turn[3][0]["subj"] == "Ünïcødé 漢字"


def test_empty_dataframe_extraction(spark):
    df = spark.createDataFrame([], "conv_id string, turn_idx int, text string")
    assert extract_raw_triples(df).count() == 0


def test_jvm_fastpath_dispatch_parity_with_oracle(spark):
    """r6: extract_raw_triples routes JVM-portable rows through a pure
    Catalyst-expression plan and everything else through the mapInPandas
    path. The UNION of both branches must equal the single-process
    oracle on a mix that exercises the dispatch — including \\r (the one
    ASCII char where Java `.` and Python `.` disagree, so it MUST take
    the Python branch) and the Arrow-fallback hostiles."""
    from kgsum_spark.extraction import _JVM_NON_PORTABLE_RE
    from kgsum_spark.rules import extract_sentence, split_sentences
    import re as _re

    texts = [
        None, "", "A is a b.", "A is a b. C was created by D.",
        "A was created by B same as http://u.",
        "CR\rX is a b.",                  # \r inside subject → Python path
        "A is a b.\rC is a d.",           # \r as split whitespace
        "Ünïcode is a tëst.",             # unicode → Python path
        'E titled "".',                    # empty quoted object (JVM path)
        "tab\tis a b.\n\nH has subject k.",
        "J uses vocabulary http://v.org/v. K has identifier id9.",
        "x is a b is a c.",               # lazy backtracking
        "no anchor sentence here.", "trailing. ",
        "F\x0corm feed is a b.",          # \f stays on the JVM path
    ]
    # the dispatch predicate itself must send \r/unicode to Python
    assert _re.search(_JVM_NON_PORTABLE_RE, "CR\rX") is not None
    assert _re.search(_JVM_NON_PORTABLE_RE, "F\x0corm") is None
    rows = [(f"c{i}", i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = sorted(
        (r["subj"], r["pred"], r["obj"], r["obj_is_iri"], r["obj_is_mention"],
         r["conv_id"], r["turn_idx"])
        for r in extract_raw_triples(df).collect())
    exp = []
    for i, t in enumerate(texts):
        for s in split_sentences(t or ""):
            r = extract_sentence(s)
            if r:
                rule, subj, obj = r
                exp.append((subj, rule.pred, obj, rule.obj_kind == "I",
                            rule.obj_kind == "M", f"c{i}", i))
    assert got == sorted(exp)
    assert len(got) > 0


def test_arrow_fastpath_parity_with_python_oracle():
    """r6: the extraction UDF runs an Arrow/RE2 fast path for rows whose
    characters are 'portable' (printable ASCII + tab/newline/FF/CR) and
    routes everything else to the original pandas/Python-`re` path. Both
    paths must agree byte-for-byte with the single-process oracle
    (rules.extract_sentence over rules.split_sentences), including on
    rows that force the fallback: unicode, NBSP, vertical tab, \\x1c
    (Python treats it as whitespace, RE2 does not), and the \\x00 split
    sentinel itself."""
    import pandas as pd

    from kgsum_spark.extraction import _OUT_COLS, _extract_batches
    from kgsum_spark.rules import extract_sentence, split_sentences

    texts = [
        None, "", "   ", "A is a b.", "A is a b. C was created by D.",
        "A was created by B same as http://u.",     # two-rule overlap
        "x is a b is a c.",                         # lazy backtracking
        "Ünïcode is a tëst.",                       # unicode → fallback
        "NB SP is a b.",                       # NBSP → fallback
        "V\x0bT is a b.",                           # \x0b → fallback
        "A is a b.\x1cC is a d.",                   # \x1c whitespace → fallback
        "S\x00entinel is a b.",                     # \x00 byte → fallback
        'E titled "".',                             # empty quoted object
        "tab\tis a b.\n\nH has subject k.",
        "multi.  space. I has theme t.",
        "no anchor sentence here.",
        "J uses vocabulary http://v.org/v. K has identifier id9.",
        "trailing. ",
    ]
    pdf = pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(len(texts))],
        "turn_idx": list(range(len(texts))),
        "text": texts,
    })
    pdf["part_id"] = 7
    got = list(_extract_batches(iter([pdf])))
    got = (pd.concat(got, ignore_index=True) if got
           else pd.DataFrame(columns=_OUT_COLS))
    exp = []
    for i, t in enumerate(texts):
        for s in split_sentences(t or ""):
            r = extract_sentence(s)
            if r:
                rule, subj, obj = r
                exp.append((subj, rule.pred, obj, rule.obj_kind == "I",
                            rule.obj_kind == "M", f"c{i}", i, 7))
    got_rows = sorted(map(tuple, got[_OUT_COLS].itertuples(index=False, name=None)))
    assert got_rows == sorted(exp)
