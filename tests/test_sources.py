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


# --- r2: Turtle-subset parser ----------------------------------------------

TTL = """\
@prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex:   <http://ex/> .
@base <http://d/> .

# a comment
<s1> a <http://v/Person> ;
     rdfs:label "Alice" , "K\\"noten"@de .
ex:s2 ex:p "42"^^<http://www.w3.org/2001/XMLSchema#integer> ;
      ex:q 7 ;
      ex:r 1.5 ;
      ex:bool true .
_:b1 ex:p ex:s2 .
<s3> rdfs:comment \"\"\"multi
line\"\"\" .
"""


def test_parse_turtle_subset():
    rows = sources.parse_turtle(TTL)
    got = {(r[0], r[1], r[2]) for r in rows}
    assert ("http://d/s1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://v/Person") in got
    assert ("http://d/s1", "http://www.w3.org/2000/01/rdf-schema#label",
            "Alice") in got
    by = {(r[0], r[2]): r for r in rows}
    de = by[("http://d/s1", 'K"noten')]
    assert de[4] == "de" and de[3] is False
    num = by[("http://ex/s2", "42")]
    assert num[5] == "http://www.w3.org/2001/XMLSchema#integer"
    assert by[("http://ex/s2", "7")][5].endswith("integer")
    assert by[("http://ex/s2", "1.5")][5].endswith("decimal")
    assert by[("http://ex/s2", "true")][5].endswith("boolean")
    bn = by[("_:b1", "http://ex/s2")]
    assert bn[3] is True  # prefixed-name object is an IRI
    assert by[("http://d/s3", "multi\nline")][3] is False
    assert len(rows) == 9


def test_read_turtle_matches_nt_twin(spark, tmp_path):
    """The .ttl fixture must parse to the same triples table as its .nt
    twin (VERDICT r1 task 9)."""
    ttl = tmp_path / "g.ttl"
    ttl.write_text(
        "@prefix ex: <http://ex/> .\n"
        "ex:s1 a ex:Person ; ex:label \"Alice\" .\n"
        "ex:s2 ex:p ex:s1 .\n"
    )
    nt = tmp_path / "g.nt"
    nt.write_text(
        "<http://ex/s1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/Person> .\n"
        '<http://ex/s1> <http://ex/label> "Alice" .\n'
        "<http://ex/s2> <http://ex/p> <http://ex/s1> .\n"
    )
    t1 = {tuple(r) for r in sources.guess_and_read(spark, str(ttl))
          .select("s", "p", "o", "o_is_iri").collect()}
    t2 = {tuple(r) for r in sources.guess_and_read(spark, str(nt))
          .select("s", "p", "o", "o_is_iri").collect()}
    assert t1 == t2 and len(t1) == 3


def test_turtle_malformed_raises():
    with pytest.raises(ValueError):
        sources.parse_turtle("undefined:s <http://p> <http://o> .")
    with pytest.raises(ValueError):
        sources.parse_turtle("<http://s> <http://p> <http://o> ")  # no dot


# --- r3: Turtle [...] / (...) + TriG + RDF/XML ------------------------------


def test_turtle_bnode_property_lists():
    rows = sources.parse_turtle(
        "@prefix ex: <http://ex/> .\n"
        'ex:alice ex:knows [ ex:name "Bob" ; ex:age 42 ] .\n'
        '[ ex:label "anon" ] ex:p ex:q .\n'
    )
    got = {(r[0], r[1], r[2]) for r in rows}
    # the anonymous node links subject and nested properties consistently
    bn = next(o for s, p, o in got
              if (s, p) == ("http://ex/alice", "http://ex/knows"))
    assert (bn, "http://ex/name", "Bob") in got
    assert (bn, "http://ex/age", "42") in got
    anon_subj = next(s for s, p, o in got if o == "anon")
    assert (anon_subj, "http://ex/p", "http://ex/q") in got
    assert len(rows) == 5


def test_turtle_collections():
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rows = sources.parse_turtle(
        "@prefix ex: <http://ex/> .\n"
        'ex:s ex:list ( ex:a "x" ) .\nex:s ex:empty () .\n'
    )
    by_sp = {(r[0], r[1]): r[2] for r in rows}
    head = by_sp[("http://ex/s", "http://ex/list")]
    assert by_sp[(head, rdf + "first")] == "http://ex/a"
    nxt = by_sp[(head, rdf + "rest")]
    assert by_sp[(nxt, rdf + "first")] == "x"
    assert by_sp[(nxt, rdf + "rest")] == rdf + "nil"
    assert by_sp[("http://ex/s", "http://ex/empty")] == rdf + "nil"


def test_parse_trig_graph_blocks():
    rows = sources.parse_trig(
        "@prefix ex: <http://ex/> .\n"
        "ex:top ex:p ex:q .\n"
        '{ ex:d ex:in "default" . }\n'
        "ex:g1 { ex:a ex:b ex:c . }\n"
        "GRAPH <http://ex/g2> { ex:x ex:y ex:z }\n"
    )
    by_g = {}
    for r in rows:
        by_g.setdefault(r[6], set()).add((r[0], r[1], r[2]))
    assert ("http://ex/top", "http://ex/p", "http://ex/q") in by_g[None]
    assert ("http://ex/d", "http://ex/in", "default") in by_g[None]
    assert by_g["http://ex/g1"] == {("http://ex/a", "http://ex/b", "http://ex/c")}
    assert by_g["http://ex/g2"] == {("http://ex/x", "http://ex/y", "http://ex/z")}


def test_read_trig_matches_nq_twin(spark, tmp_path):
    trig = tmp_path / "g.trig"
    trig.write_text(
        "@prefix ex: <http://ex/> .\n"
        "ex:g1 { ex:a ex:b ex:c . ex:a ex:l \"lit\" . }\n"
    )
    nq = tmp_path / "g.nq"
    nq.write_text(
        "<http://ex/a> <http://ex/b> <http://ex/c> <http://ex/g1> .\n"
        '<http://ex/a> <http://ex/l> "lit" <http://ex/g1> .\n'
    )
    cols = ["s", "p", "o", "o_is_iri", "g"]
    t1 = {tuple(r) for r in sources.guess_and_read(spark, str(trig)).select(*cols).collect()}
    t2 = {tuple(r) for r in sources.guess_and_read(spark, str(nq)).select(*cols).collect()}
    assert t1 == t2 and len(t1) == 2


RDFXML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex/" xml:lang="en">
  <rdf:Description rdf:about="http://ex/alice">
    <ex:name>Alice</ex:name>
    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
    <ex:knows rdf:resource="http://ex/bob"/>
    <ex:addr rdf:parseType="Resource"><ex:city xml:lang="de">Rom</ex:city></ex:addr>
    <ex:friend><ex:Person rdf:nodeID="b7"><ex:name>Carol</ex:name></ex:Person></ex:friend>
  </rdf:Description>
  <ex:Bag rdf:about="http://ex/bag"><rdf:li>one</rdf:li><rdf:li>two</rdf:li></ex:Bag>
</rdf:RDF>"""


def test_parse_rdfxml_subset():
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rows = sources.parse_rdfxml(RDFXML)
    by_sp = {(r[0], r[1]): r for r in rows}
    name = by_sp[("http://ex/alice", "http://ex/name")]
    assert name[2] == "Alice" and name[4] == "en"  # inherited xml:lang
    age = by_sp[("http://ex/alice", "http://ex/age")]
    assert age[5].endswith("integer") and age[4] is None
    assert by_sp[("http://ex/alice", "http://ex/knows")][3] is True
    addr_bn = by_sp[("http://ex/alice", "http://ex/addr")][2]
    city = by_sp[(addr_bn, "http://ex/city")]
    assert city[2] == "Rom" and city[4] == "de"
    assert by_sp[("_:b7", rdf + "type")][2] == "http://ex/Person"
    assert by_sp[("http://ex/alice", "http://ex/friend")][2] == "_:b7"
    assert by_sp[("http://ex/bag", rdf + "_1")][2] == "one"
    assert by_sp[("http://ex/bag", rdf + "_2")][2] == "two"


def test_read_rdfxml_matches_nt_twin(spark, tmp_path):
    xml = tmp_path / "g.rdf"
    xml.write_text(
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:ex="http://ex/">\n'
        '<rdf:Description rdf:about="http://ex/s1">'
        '<ex:label>Alice</ex:label>'
        '<ex:p rdf:resource="http://ex/o1"/></rdf:Description>\n'
        "</rdf:RDF>"
    )
    nt = tmp_path / "g.nt"
    nt.write_text(
        '<http://ex/s1> <http://ex/label> "Alice" .\n'
        "<http://ex/s1> <http://ex/p> <http://ex/o1> .\n"
    )
    cols = ["s", "p", "o", "o_is_iri"]
    t1 = {tuple(r) for r in sources.guess_and_read(spark, str(xml)).select(*cols).collect()}
    t2 = {tuple(r) for r in sources.guess_and_read(spark, str(nt)).select(*cols).collect()}
    assert t1 == t2 and len(t1) == 2


def test_rdfxml_out_of_subset_raises():
    with pytest.raises(NotImplementedError):
        sources.parse_rdfxml(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
            ' xmlns:ex="http://ex/">'
            '<rdf:Description rdf:about="http://ex/s">'
            '<ex:p rdf:parseType="Literal"><b>x</b></ex:p>'
            "</rdf:Description></rdf:RDF>"
        )


def test_sniff_format():
    assert sources.sniff_format('<?xml version="1.0"?><rdf:RDF>') == "xml"
    assert sources.sniff_format("@prefix ex: <http://e/> .\nex:a ex:b ex:c .") == "turtle"
    assert sources.sniff_format("PREFIX ex: <http://e/>\nex:a ex:b ex:c .") == "turtle"
    assert sources.sniff_format(
        "@prefix ex: <http://e/> .\nex:g { ex:a ex:b ex:c . }") == "trig"
    assert sources.sniff_format(
        "<http://s> <http://p> <http://o> .\n<http://s> <http://p> \"x\" .") == "nt"


def test_sniff_and_read_extensionless(spark, tmp_path):
    """A .txt (unknown-extension) Turtle document routes through the
    sniffer to the native parser."""
    p = tmp_path / "mystery.txt"
    p.write_text("@prefix ex: <http://ex/> .\nex:a ex:b ex:c .\n")
    got = sources.guess_and_read(spark, str(p)).collect()
    assert len(got) == 1 and got[0]["o"] == "http://ex/c"
    x = tmp_path / "mystery2.txt"
    x.write_text(
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:ex="http://ex/">'
        '<rdf:Description rdf:about="http://ex/s"><ex:p>v</ex:p>'
        "</rdf:Description></rdf:RDF>\n"
    )
    got = sources.guess_and_read(spark, str(x)).collect()
    assert len(got) == 1 and got[0]["o"] == "v"


# --- r4: document-scoped bnodes, TriG ';.', rdf:ID base, native n3 ---------


def test_multi_file_bnodes_not_conflated(spark, tmp_path):
    """ADVICE r3: anonymous/explicit bnode labels are document-scoped —
    two files both using `[...]` (and both writing `_:b1`) must yield
    DISTINCT node ids after a directory read."""
    d = tmp_path / "ttl"
    d.mkdir()
    doc = ('@prefix ex: <http://ex/> .\n'
           'ex:s%d ex:p [ ex:q "v" ] .\n'
           '_:b1 ex:r ex:s%d .\n')
    (d / "a.ttl").write_text(doc % (1, 1))
    (d / "b.ttl").write_text(doc % (2, 2))
    rows = sources.read_turtle(spark, str(d)).collect()
    anon = {r["o"] for r in rows if r["p"] == "http://ex/p"}
    explicit = {r["s"] for r in rows if r["p"] == "http://ex/r"}
    assert len(anon) == 2, "anonymous bnodes from different files conflated"
    assert len(explicit) == 2, "explicit _:b1 from different files conflated"
    # within one doc the generated label is still consistent (subject of q)
    q_subjects = {r["s"] for r in rows if r["p"] == "http://ex/q"}
    assert q_subjects == anon


def test_trig_trailing_semicolon_before_dot():
    """ADVICE r3: 'ex:g { ex:a ex:b ex:c ; . }' is legal TriG."""
    rows = sources.parse_trig(
        "@prefix ex: <http://ex/> .\nex:g { ex:a ex:b ex:c ; . }")
    assert [(r[0], r[1], r[2], r[6]) for r in rows] == [
        ("http://ex/a", "http://ex/b", "http://ex/c", "http://ex/g")]


def test_rdfxml_rdf_id_resolves_against_xml_base():
    doc = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
           ' xmlns:ex="http://ex/" xml:base="http://base.org/doc">'
           '<rdf:Description rdf:ID="thing"><ex:p>v</ex:p></rdf:Description>'
           "</rdf:RDF>")
    rows = sources.parse_rdfxml(doc)
    assert rows[0][0] == "http://base.org/doc#thing"


def test_rdfxml_rdf_id_without_base_routes_to_seam():
    doc = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
           ' xmlns:ex="http://ex/">'
           '<rdf:Description rdf:ID="thing"><ex:p>v</ex:p></rdf:Description>'
           "</rdf:RDF>")
    with pytest.raises(NotImplementedError):
        sources.parse_rdfxml(doc)


N3_DOC = """\
@prefix : <http://ex/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@keywords a .
:alice a foaf:Person ; foaf:knows :bob .
:bob has foaf:name "Bob" .
:carol is foaf:knows of :alice .
:alice = :al1ce .
"""


def test_parse_n3_sugar():
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    foaf = "http://xmlns.com/foaf/0.1/"
    rows = {(r[0], r[1], r[2]) for r in sources.parse_n3(N3_DOC)}
    assert ("http://ex/alice", rdf + "type", foaf + "Person") in rows
    assert ("http://ex/bob", foaf + "name", "Bob") in rows          # has
    assert ("http://ex/alice", foaf + "knows", "http://ex/carol") in rows  # is..of
    assert ("http://ex/alice",
            "http://www.w3.org/2002/07/owl#sameAs", "http://ex/al1ce") in rows


def test_parse_n3_keywords_bare_words():
    rows = sources.parse_n3(
        "@prefix : <http://ex/> .\n@keywords a .\nalice a :Person .\n")
    assert rows[0][0] == "http://ex/alice"
    assert rows[0][2] == "http://ex/Person"


def test_parse_n3_is_turtle_superset():
    ttl = ('@prefix ex: <http://ex/> .\n'
           'ex:a ex:p [ ex:q ( 1 2 ) ] ; ex:r "lit"@en .\n')
    assert sources.parse_n3(ttl) == sources.parse_turtle(ttl)


@pytest.mark.parametrize("doc", [
    "@prefix : <http://ex/> .\n{ :a :b :c } => { :d :e :f } .",
    "@prefix : <http://ex/> .\n?x :b :c .",
    "@prefix : <http://ex/> .\n:a!:b :c :d .",
    "@prefix : <http://ex/> .\n@forAll :x .",
])
def test_parse_n3_out_of_subset_routes_to_seam(doc):
    with pytest.raises(NotImplementedError):
        sources.parse_n3(doc)


def test_read_n3_matches_nt_twin(spark, tmp_path):
    n3 = tmp_path / "g.n3"
    n3.write_text(
        "@prefix ex: <http://ex/> .\n"
        'ex:a ex:b ex:c .\nex:d is ex:b of ex:a .\nex:a ex:l "lit" .\n')
    nt = tmp_path / "g.nt"
    nt.write_text(
        "<http://ex/a> <http://ex/b> <http://ex/c> .\n"
        "<http://ex/a> <http://ex/b> <http://ex/d> .\n"
        '<http://ex/a> <http://ex/l> "lit" .\n')
    cols = ["s", "p", "o", "o_is_iri"]
    t1 = {tuple(r) for r in
          sources.guess_and_read(spark, str(n3)).select(*cols).collect()}
    t2 = {tuple(r) for r in
          sources.guess_and_read(spark, str(nt)).select(*cols).collect()}
    assert t1 == t2 and len(t1) == 3


def test_sniff_and_read_extensionless_n3(spark, tmp_path):
    """An extensionless doc with N3 sugar sniffs as 'turtle' and must
    still parse — the sniffed-turtle bucket dispatches to read_n3 (a
    strict Turtle superset)."""
    p = tmp_path / "data_noext"
    p.write_text("@prefix ex: <http://ex/> .\n"
                 "ex:d is ex:b of ex:a .\nex:a ex:l \"x\" .\n")
    rows = {(r["s"], r["p"], r["o"]) for r in
            sources.sniff_and_read(spark, str(p)).collect()}
    assert rows == {("http://ex/a", "http://ex/b", "http://ex/d"),
                    ("http://ex/a", "http://ex/l", "x")}


# --- r4: UCHAR (\uXXXX / \UXXXXXXXX) escapes ---------------------------------

UCHAR_NT = """\
<http://d/caf\\u00E9> <http://ex/p> "caf\\u00E9 \\U0001F600" .
<http://d/s> <http://ex/lit> "literal \\\\u0041 backslash-u" .
<http://d/s> <http://ex/bad> "lone \\uD800 surrogate" .
"""


def test_nt_uchar_decode(spark, tmp_path):
    """rdflib (the reference parser, /root/reference/src/dataset_preparation.py)
    decodes UCHAR escapes in both IRI and literal positions; real LOD dumps
    use them heavily. A literal backslash-u (encoded \\\\u0041) must NOT
    decode, and a lone surrogate keeps its escape verbatim."""
    p = tmp_path / "uchar.nt"
    p.write_text(UCHAR_NT)
    rows = {(r["s"], r["p"]): r["o"] for r in
            sources.read_ntriples(spark, str(p)).collect()}
    assert rows[("http://d/café", "http://ex/p")] == "café \U0001F600"
    assert rows[("http://d/s", "http://ex/lit")] == "literal \\u0041 backslash-u"
    assert rows[("http://d/s", "http://ex/bad")] == "lone \\uD800 surrogate"


def test_turtle_uchar_decode():
    rows = sources.parse_turtle(
        '@prefix ex: <http://ex/> .\n'
        '<http://d/caf\\u00E9> ex:p "na\\u00EFve \\U0001F600" .\n'
    )
    assert rows == [("http://d/café", "http://ex/p",
                     "naïve \U0001F600", False, None, None, None)]


def test_nt_uchar_sink_roundtrip(spark, tmp_path):
    """Decoded code points are written back as raw UTF-8 by the sink and
    survive a second read; a literal backslash-u survives the re-escape."""
    hard = ["café \U0001F600", "literal \\u0041 backslash-u"]
    df = spark.createDataFrame(
        [("http://d/s", f"http://ex/p{i}", o, False) for i, o in enumerate(hard)],
        "s string, p string, o string, o_is_iri boolean",
    )
    out = str(tmp_path / "uchar_rt.nt")
    sources.nt_lines_from_triples(df).coalesce(1).write.mode("overwrite").text(out)
    got = {r["p"]: r["o"] for r in sources.read_ntriples(spark, out).collect()}
    assert got == {f"http://ex/p{i}": o for i, o in enumerate(hard)}


def test_turtle_pn_local_escapes():
    """PN_LOCAL_ESC (W3C Turtle grammar): ex:foo\\.bar and escaped
    '&'/'#' in local names resolve to the bare characters, and a
    trailing escaped dot does not swallow the statement terminator."""
    rows = sources.parse_turtle(
        "@prefix ex: <http://ex/> .\n"
        "ex:foo\\.bar ex:p\\&q ex:end\\. .\n"
    )
    assert rows == [("http://ex/foo.bar", "http://ex/p&q",
                     "http://ex/end.", True, None, None, None)]


def test_read_rdf_dir_mixed_formats(spark, tmp_path):
    """A directory mixing .nt, .ttl, .rdf and an extensionless N3 file
    reads as one union — jobs per FORMAT, not per file — and bnode
    scoping still holds across the mix."""
    d = tmp_path / "dump"
    d.mkdir()
    (d / "a.nt").write_text('<http://d/s1> <http://p/x> "one" .\n')
    (d / "b.ttl").write_text(
        "@prefix ex: <http://p/> .\n<http://d/s2> ex:x \"two\" .\n")
    (d / "c.rdf").write_text(
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:ex="http://p/">\n'
        '  <rdf:Description rdf:about="http://d/s3"><ex:x>three</ex:x>'
        '</rdf:Description>\n'
        "</rdf:RDF>\n")
    (d / "noext") .write_text(
        "@prefix ex: <http://p/> .\nex:s5 is ex:x of ex:s4 .\n")
    rows = {(r["s"], r["p"], r["o"]) for r in
            sources.read_rdf_dir(spark, str(d)).collect()}
    assert rows == {
        ("http://d/s1", "http://p/x", "one"),
        ("http://d/s2", "http://p/x", "two"),
        ("http://d/s3", "http://p/x", "three"),
        ("http://p/s4", "http://p/x", "http://p/s5"),
    }


def test_read_metrics_counts_bad_nt_lines(spark, nt_path):
    """Unparseable NT lines are COUNTED, not silently dropped (r4 VERDICT
    #3), and the clean rows are byte-identical to an uncounted read."""
    m = sources.ReadMetrics(spark)
    rows = sources.read_ntriples(spark, nt_path, metrics=m).collect()
    assert len(rows) == 5
    assert m.bad_lines == 1        # 'not a triple line'; comment/blank ≠ bad
    assert m.bad_docs == 0
    plain = sources.read_ntriples(spark, nt_path).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, plain))


def test_whole_doc_quarantine_counts_and_keeps_scan_alive(spark, tmp_path):
    """A corrupt .ttl fails the read by default; under
    on_malformed='quarantine' it is skipped + counted and the good file
    still parses — one corrupt shard must not kill a 100 TB crawl read."""
    (tmp_path / "good.ttl").write_text(
        '@prefix ex: <http://e/> .\nex:a ex:p "v" .\n')
    (tmp_path / "bad.ttl").write_text("@prefix broken <oops % not turtle\n")
    with pytest.raises(Exception, match="tokenize|prefix"):
        sources.read_turtle(spark, str(tmp_path)).collect()
    m = sources.ReadMetrics(spark)
    rows = sources.read_turtle(
        spark, str(tmp_path), metrics=m, on_malformed="quarantine").collect()
    assert [(r["s"], r["p"], r["o"]) for r in rows] == [
        ("http://e/a", "http://e/p", "v")]
    assert m.bad_docs == 1 and m.bad_lines == 0
    with pytest.raises(ValueError, match="on_malformed"):
        sources.read_turtle(spark, str(tmp_path), on_malformed="skip")


def test_read_rdf_dir_threads_metrics(spark, tmp_path):
    """read_rdf_dir surfaces per-read bad-line AND bad-doc counts across
    its per-format readers (r4 VERDICT #3 'surfaced through read_rdf_dir')."""
    d = tmp_path / "dump"
    d.mkdir()
    (d / "a.nt").write_text('<http://d/s> <http://d/p> "x" .\nNOT NT AT ALL\n')
    (d / "good.ttl").write_text('@prefix ex: <http://e/> .\nex:a ex:p "v" .\n')
    (d / "bad.ttl").write_text("@prefix broken <oops\n")
    m = sources.ReadMetrics(spark)
    rows = {(r["s"], r["p"], r["o"]) for r in sources.read_rdf_dir(
        spark, str(d), metrics=m, on_malformed="quarantine").collect()}
    assert rows == {("http://d/s", "http://d/p", "x"),
                    ("http://e/a", "http://e/p", "v")}
    assert m.bad_lines == 1 and m.bad_docs == 1


def test_read_rdf_dir_empty_raises(spark, tmp_path):
    d = tmp_path / "nothing"
    d.mkdir()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sources.read_rdf_dir(spark, str(d))
