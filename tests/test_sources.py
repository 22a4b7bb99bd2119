"""S1 multi-format RDF sources + N-Triples sink round-trip."""

from __future__ import annotations

import pytest

from kgsum_spark import sources

NT = """\
# a comment line
<http://d/s1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://v/Person> .
<http://d/s1> <http://www.w3.org/2000/01/rdf-schema#label> "Alice" .
<http://d/s2> <http://www.w3.org/2000/01/rdf-schema#label> "K\\"noten"@de .
_:b1 <http://ex/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .

<http://d/s3> <http://ex/p> <http://d/s4> <http://graphs/g1> .
not a triple line
"""


@pytest.fixture(scope="module")
def nt_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("nt") / "data.nt"
    p.write_text(NT)
    return str(p)


def test_read_ntriples(spark, nt_path):
    rows = {(r["s"], r["p"], r["o"]): r for r in
            sources.read_ntriples(spark, nt_path).collect()}
    assert len(rows) == 5  # comment/blank/garbage skipped
    typed = rows[("http://d/s1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                  "http://v/Person")]
    assert typed["o_is_iri"] is True
    lab = rows[("http://d/s1", "http://www.w3.org/2000/01/rdf-schema#label", "Alice")]
    assert lab["o_is_iri"] is False and lab["o_lang"] is None
    de = rows[("http://d/s2", "http://www.w3.org/2000/01/rdf-schema#label", 'K"noten')]
    assert de["o_lang"] == "de"  # escape decoded, lang tag kept
    b = rows[("_:b1", "http://ex/p", "42")]
    assert b["o_datatype"] == "http://www.w3.org/2001/XMLSchema#integer"
    q = rows[("http://d/s3", "http://ex/p", "http://d/s4")]
    assert q["g"] == "http://graphs/g1"  # n-quads graph field


def test_rdflib_gate_raises(spark, nt_path):
    with pytest.raises(NotImplementedError):
        sources.read_rdf_with_rdflib(spark, nt_path, "turtle")


def test_guess_and_read_nt(spark, nt_path):
    assert sources.guess_and_read(spark, nt_path).count() == 5


def test_nt_roundtrip(spark, nt_path, tmp_path):
    t = sources.read_ntriples(spark, nt_path).filter("g IS NULL")
    lines = sources.nt_lines_from_triples(
        t.selectExpr("s", "p", "o", "o_is_iri")
    )
    out = str(tmp_path / "roundtrip.nt")
    lines.coalesce(1).write.mode("overwrite").text(out)
    back = sources.read_ntriples(spark, out)
    a = {(r["s"], r["p"], r["o"], r["o_is_iri"]) for r in t.collect()}
    b = {(r["s"], r["p"], r["o"], r["o_is_iri"]) for r in back.collect()}
    assert a == b


def test_profile_to_triples(spark):
    from kgsum_spark.profile import profile_to_triples

    prof = spark.createDataFrame(
        [("g1", "My Graph", ["d1", "d2"], ["alice"], ["http://lic/mit"],
          ["http://d/sparql"], ["http://voc/1"], ["http://same/1"],
          ["geo"], ["label a"], ["org"])],
        "id string, title string, dsc array<string>, creator array<string>, "
        "license array<string>, sparql array<string>, voc array<string>, "
        "con array<string>, sbj array<string>, lab array<string>, tlds array<string>",
    )
    t = profile_to_triples(prof, base_iri="http://kg/ds/")
    rows = {(r["subj"], r["pred"], r["obj"]) for r in t.collect()}
    assert ("http://kg/ds/g1", "rdf:type", "dcat:Dataset") in rows
    assert ("http://kg/ds/g1", "dcterms:title", "My Graph") in rows
    assert ("http://kg/ds/g1", "dcterms:description", "d1") in rows
    assert ("http://kg/ds/g1", "owl:sameAs", "http://same/1") in rows
    assert ("http://kg/ds/g1", "dcat:keyword", "label a") in rows
    assert len(rows) == 12


def test_echar_escape_roundtrip(spark, tmp_path):
    """ADVICE r1: sequential str.replace corrupted encoded 'C:\\new'
    (raw C:\new → 'C:' + LF + 'ew'); sink dropped LF/CR/TAB escaping so
    multi-line literals produced invalid NT. Both must round-trip now."""
    hard = [
        "C:\\new",          # raw backslash followed by 'n' — the decode trap
        "line1\nline2",      # real LF — the sink trap
        "tab\there",
        "cr\rhere",
        'quote " backslash \\ mix \\n',  # raw chars: " \ \n (backslash+n)
    ]
    df = spark.createDataFrame(
        [("http://d/s", f"http://ex/p{i}", o, False) for i, o in enumerate(hard)],
        "s string, p string, o string, o_is_iri boolean",
    )
    out = str(tmp_path / "echar.nt")
    sources.nt_lines_from_triples(df).coalesce(1).write.mode("overwrite").text(out)
    back = sources.read_ntriples(spark, out)
    got = {r["p"]: r["o"] for r in back.collect()}
    assert got == {f"http://ex/p{i}": o for i, o in enumerate(hard)}
