"""Property-based tests (hypothesis) for the pure-Python parsing layers —
the grammar corners fixed in r2 (ECHAR escapes, PN_LOCAL dots) hold for
arbitrary inputs, not just the regression fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kgsum_spark.sources import parse_turtle


def _echar_escape(s: str) -> str:
    """Mirror of the NT/Turtle sink's ECHAR chain (backslash first)."""
    for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        s = s.replace(raw, esc)
    return s


literals = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
    max_size=200,
)


@settings(max_examples=300, deadline=None)
@given(literals)
def test_turtle_literal_roundtrip(lit):
    doc = f'<http://s> <http://p> "{_echar_escape(lit)}" .'
    rows = parse_turtle(doc)
    assert len(rows) == 1
    assert rows[0][2] == lit
    assert rows[0][3] is False


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True),
    st.from_regex(r"[A-Za-z][A-Za-z0-9.]{0,6}[A-Za-z0-9]|[A-Za-z]", fullmatch=True),
), min_size=1, max_size=20))
def test_turtle_prefixed_statements(pairs):
    """Prefixed names with interior dots must not swallow the statement
    terminator; every generated statement parses to exactly one triple."""
    doc = "@prefix ex: <http://ex/> .\n" + "\n".join(
        f"ex:{s} ex:p ex:{o} ." for s, o in pairs
    )
    rows = parse_turtle(doc)
    assert len(rows) == len(pairs)
    for (s, o), row in zip(pairs, rows):
        assert row[0] == f"http://ex/{s}"
        assert row[2] == f"http://ex/{o}"
        assert row[3] is True
