"""Unit tests for the shared rule table and normalization (SURVEY.md §5.1)."""

from __future__ import annotations

from hypothesis import given, strategies as st

from kgsum_spark.rules import (
    canonical_id,
    extract_sentence,
    jaccard_tokens,
    normalize_mention,
    split_sentences,
)
from kgsum_spark.synth import FILLERS


def test_isa_rule():
    r = extract_sentence("Zorblax Labs is a dataset.")
    assert r is not None
    rule, s, o = r
    assert rule.pred == "rdf:type" and s == "Zorblax Labs" and o == "dataset"


def test_created_by_rule():
    rule, s, o = extract_sentence("Velara Corp was created by ZORBLAX.")
    assert rule.pred == "dcterms:creator" and s == "Velara Corp" and o == "ZORBLAX"


def test_same_as_uri():
    rule, s, o = extract_sentence("Velara same as http://ex.org/r/5.")
    assert rule.pred == "owl:sameAs" and o == "http://ex.org/r/5"
    assert rule.obj_kind == "I"


def test_titled_quoted():
    rule, s, o = extract_sentence('Velara titled "open linked atlas".')
    assert rule.pred == "dcterms:title" and o == "open linked atlas"


def test_filler_never_matches():
    for f in FILLERS:
        sent = f.format(url="http://ex.org/r/1", n=7)
        assert extract_sentence(sent) is None, sent


def test_sentence_split_roundtrip():
    text = 'Velara is a corpus. see http://ex.org/r/2 for details. Velara titled "atlas report".'
    sents = split_sentences(text)
    assert len(sents) == 3
    assert extract_sentence(sents[0]) is not None
    assert extract_sentence(sents[1]) is None
    assert extract_sentence(sents[2]) is not None


def test_normalize():
    assert normalize_mention("Zorblax-Labs") == "zorblax labs"
    assert normalize_mention("  ZORBLAX  Labs. ") == "zorblax labs"
    assert normalize_mention("zorblax labs") == "zorblax labs"


def test_normalize_idempotent_examples():
    for s in ["Acme Corp", "ACME", "a-b-c", "x  y"]:
        n = normalize_mention(s)
        assert normalize_mention(n) == n


@given(st.text(max_size=40))
def test_normalize_idempotent_property(s):
    n = normalize_mention(s)
    assert normalize_mention(n) == n


def test_jaccard():
    assert jaccard_tokens("zorblax labs", "zorblax") == 0.5
    assert jaccard_tokens("zorblax labs", "zorblax labs") == 1.0
    assert jaccard_tokens("a b", "c d") == 0.0


def test_canonical_id():
    assert canonical_id("zorblax labs") == "ent:zorblax_labs"
