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


# --- r3: TriG / RDF-XML / collections -------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True),
    st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True),
), min_size=1, max_size=12),
    st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True))
def test_trig_named_graph_statements(pairs, gname):
    """Every triple inside a named block carries exactly that graph IRI."""
    from kgsum_spark.sources import parse_trig

    body = " ".join(f"ex:{s} ex:p ex:{o} ." for s, o in pairs)
    doc = f"@prefix ex: <http://ex/> .\nex:{gname} {{ {body} }}"
    rows = parse_trig(doc)
    assert len(rows) == len(pairs)
    assert all(r[6] == f"http://ex/{gname}" for r in rows)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True),
                min_size=0, max_size=8))
def test_turtle_collection_walk(items):
    """Any collection parses to a well-formed rdf:first/rest chain that
    walks back to the original item sequence."""
    from kgsum_spark.sources import parse_turtle

    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    doc = ("@prefix ex: <http://ex/> .\n"
           "ex:s ex:list ( " + " ".join(f"ex:{w}" for w in items) + " ) .")
    rows = parse_turtle(doc)
    by_sp = {(r[0], r[1]): r[2] for r in rows}
    node = by_sp[("http://ex/s", "http://ex/list")]
    walked = []
    while node != rdf + "nil":
        walked.append(by_sp[(node, rdf + "first")])
        node = by_sp[(node, rdf + "rest")]
    assert walked == [f"http://ex/{w}" for w in items]


# XML 1.0 cannot carry most control chars AT ALL (even escaped), and
# parsers normalize \r per the line-end rules — restrict to representable
# text (this is a property of the FORMAT, not the parser).
xml_literals = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),
        blacklist_characters="".join(
            chr(c) for c in range(0x20) if c not in (0x09, 0x0A)
        ) + "\x0b\x0c",
    ),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(xml_literals)
def test_rdfxml_literal_roundtrip(lit):
    """Arbitrary XML-representable literal content survives the
    encode→parse trip."""
    from xml.sax.saxutils import escape

    from kgsum_spark.sources import parse_rdfxml

    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:ex="http://ex/">'
        '<rdf:Description rdf:about="http://ex/s">'
        f"<ex:p>{escape(lit)}</ex:p>"
        "</rdf:Description></rdf:RDF>"
    )
    rows = parse_rdfxml(doc)
    assert len(rows) == 1
    assert rows[0][2] == (lit or "")
    assert rows[0][3] is False


# --- r4: N3 sugar ----------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True),
    st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True),
    st.sampled_from(["plain", "has", "is_of", "same"]),
), min_size=1, max_size=20))
def test_n3_sugar_desugars_to_plain_triples(stmts):
    """Every N3 sugar form desugars to the same triple its plain-Turtle
    equivalent yields; `is p of` swaps subject and object."""
    from kgsum_spark.sources import parse_n3

    owl_same = "http://www.w3.org/2002/07/owl#sameAs"
    lines, expected = [], []
    for s, o, form in stmts:
        if form == "plain":
            lines.append(f"ex:{s} ex:p ex:{o} .")
            expected.append((f"http://ex/{s}", "http://ex/p", f"http://ex/{o}"))
        elif form == "has":
            lines.append(f"ex:{s} has ex:p ex:{o} .")
            expected.append((f"http://ex/{s}", "http://ex/p", f"http://ex/{o}"))
        elif form == "is_of":
            lines.append(f"ex:{s} is ex:p of ex:{o} .")
            expected.append((f"http://ex/{o}", "http://ex/p", f"http://ex/{s}"))
        else:
            lines.append(f"ex:{s} = ex:{o} .")
            expected.append((f"http://ex/{s}", owl_same, f"http://ex/{o}"))
    doc = "@prefix ex: <http://ex/> .\n" + "\n".join(lines)
    rows = parse_n3(doc)
    assert [(r[0], r[1], r[2]) for r in rows] == expected


@settings(max_examples=200, deadline=None)
@given(literals)
def test_turtle_uchar_roundtrip(lit):
    """Any text encoded entirely as UCHAR (\\uXXXX / \\UXXXXXXXX) escapes
    decodes back to the original through the Turtle string path."""
    enc = "".join(
        f"\\U{ord(c):08X}" if ord(c) > 0xFFFF else f"\\u{ord(c):04X}"
        for c in lit
    )
    doc = f'<http://s> <http://p> "{enc}" .'
    rows = parse_turtle(doc)
    assert len(rows) == 1
    assert rows[0][2] == lit


@settings(max_examples=200, deadline=None)
@given(literals)
def test_nt_vectorized_uchar_decode(lit):
    """The N-Triples reader's vectorized decode agrees: the same all-UCHAR
    encoding through the pandas one-pass replace yields the original."""
    import pandas as pd

    from kgsum_spark.sources import _unescape_echar

    enc = "".join(
        f"\\U{ord(c):08X}" if ord(c) > 0xFFFF else f"\\u{ord(c):04X}"
        for c in lit
    )
    assert _unescape_echar(pd.Series([enc]))[0] == lit
