"""Sources: multi-format RDF ingestion and tabular scans (SURVEY.md §2.1).

S1 — the reference try-parses files as ttl/xml/nt/trig/n3/nquads with
rdflib (/root/reference/src/dataset_preparation.py:371-378, formats :19).
Spark-first: N-Triples/N-Quads are line-oriented → `spark.read.text` +
one vectorized regex per batch inside mapInPandas (C-speed, splittable,
100 TB-ready). Turtle, TriG, RDF/XML, and N3 are NOT line-oriented; they
parse per FILE with the built-in rdflib-free parsers (parse_turtle /
parse_trig / parse_rdfxml / parse_n3 — full Turtle incl. `[...]`/`(...)`,
TriG graph blocks, the documented RDF/XML subset, formula-free N3);
subset-exceeding documents (n3 formulae/rules, rdf:ID without xml:base,
parseType=Literal/Collection) go through the import-gated rdflib seam
(not shipped in this container).

S2/S3 — CSV/JSON catalog scans are plain `spark.read` with explicit schema.
S6 — sinks are `df.write.parquet` / Iceberg `writeTo` (pipeline.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# One regex decodes an N-Triples/N-Quads line into subject, predicate,
# object (IRI | blank | literal with optional lang/datatype), and optional
# graph. Grammar per the public W3C N-Triples spec.
NT_LINE = (
    r"^\s*"
    r"(?:<(?P<s_iri>[^>]*)>|(?P<s_bnode>_:\S+))\s+"
    r"<(?P<p>[^>]*)>\s+"
    r"(?:<(?P<o_iri>[^>]*)>"
    r"|(?P<o_bnode>_:\S+)"
    r'|"(?P<o_lit>(?:[^"\\]|\\.)*)"'
    r"(?:@(?P<o_lang>[A-Za-z0-9-]+)|\^\^<(?P<o_dt>[^>]*)>)?"
    r")"
    r"(?:\s+(?:<(?P<g>[^>]*)>|(?P<g_bnode>_:\S+)))?"
    r"\s*\.\s*$"
)

TRIPLES_NT_SCHEMA = (
    "s string, p string, o string, o_is_iri boolean, o_lang string, "
    "o_datatype string, g string"
)

# ECHAR + UCHAR decode (W3C N-Triples grammar: ECHAR for the short
# escapes, UCHAR \uXXXX / \UXXXXXXXX for arbitrary code points — real
# dumps use \u escapes heavily, and rdflib — the reference parser —
# decodes them). Decoding MUST be a single left-to-right pass: sequential
# str.replace corrupts inputs like the encoded 'C:\\new' (raw C:\new),
# where the \n rule would eat half of \\, and '\\u0041' (a literal
# backslash-u) must NOT decode to 'A'.
_ECHAR = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
          "\\": "\\", '"': '"', "'": "'"}
_ESCAPE_RE = r"\\([ntrbf\\\"'])|\\u([0-9a-fA-F]{4})|\\U([0-9a-fA-F]{8})"
_UCHAR_RE = r"\\u([0-9a-fA-F]{4})|\\U([0-9a-fA-F]{8})"


def _decode_escape_match(m) -> str:
    if m.group(1) is not None:
        return _ECHAR[m.group(1)]
    cp = int(m.group(2) or m.group(3), 16)
    if 0xD800 <= cp <= 0xDFFF:  # lone surrogate: invalid — keep the escape
        return m.group(0)
    return chr(cp)


def _unescape_echar(lit: pd.Series) -> pd.Series:
    """One-pass ECHAR+UCHAR decode for literal values."""
    return lit.str.replace(
        _ESCAPE_RE, _decode_escape_match, regex=True
    )


def _decode_uchar_match(m) -> str:
    cp = int(m.group(1) or m.group(2), 16)
    if 0xD800 <= cp <= 0xDFFF:  # lone surrogate: invalid — keep the escape
        return m.group(0)
    return chr(cp)


def _unescape_uchar(iri: pd.Series) -> pd.Series:
    """IRIs allow only UCHAR escapes (no ECHAR per the grammar)."""
    return iri.str.replace(_UCHAR_RE, _decode_uchar_match, regex=True)


class ReadMetrics:
    """Malformed-input accounting for the native RDF readers (r5 — the
    r4 parsers dropped unparseable lines with NO counter: silent data
    loss on a 100 TB crawl; the reference at least surfaces failure by
    raising, /root/reference/src/dataset_preparation.py:371-378).

    Accumulator-backed: workers add counts as tasks run, so values are
    meaningful only AFTER an action has consumed the returned DataFrame,
    and task retries/speculation may over-count (standard Spark
    accumulator semantics — these are monitoring metrics, not
    exactly-once bookkeeping). bad_lines counts unparseable N-Triples/
    N-Quads lines (comments/blanks are NOT malformed); bad_docs counts
    whole documents a ttl-family/XML reader quarantined under
    on_malformed='quarantine'."""

    def __init__(self, spark: SparkSession):
        self._bad_lines = spark.sparkContext.accumulator(0)
        self._bad_docs = spark.sparkContext.accumulator(0)

    @property
    def bad_lines(self) -> int:
        return self._bad_lines.value

    @property
    def bad_docs(self) -> int:
        return self._bad_docs.value


def _parse_nt_batches(bad_acc=None):
    """Factory: vectorized NT/NQ line-parser for mapInPandas, optionally
    counting unparseable lines into `bad_acc` (a ReadMetrics accumulator
    — picklable, updates flow back to the driver with task results)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = pdf["value"].fillna("")
            keep = ~lines.str.match(r"^\s*(#|$)")
            lines = lines[keep]
            if lines.empty:
                continue
            cap = lines.str.extract(NT_LINE)
            ok = cap["p"].notna()
            if bad_acc is not None:
                n_bad = int((~ok).sum())
                if n_bad:
                    bad_acc.add(n_bad)
            cap = cap[ok]
            if cap.empty:
                continue
            o_lit = _unescape_echar(cap["o_lit"])
            # UCHAR escapes in IRI positions (é etc., common in real
            # dumps): decode only when the batch actually contains any —
            # the probe is one vectorized substring scan, the decode five.
            iri = {k: cap[k] for k in ("s_iri", "p", "o_iri", "o_dt", "g")}
            if any(
                col.str.contains("\\u", regex=False, na=False).any()
                or col.str.contains("\\U", regex=False, na=False).any()
                for col in iri.values()
            ):
                iri = {k: _unescape_uchar(v) for k, v in iri.items()}
            out = pd.DataFrame(
                {
                    "s": iri["s_iri"].fillna(cap["s_bnode"]),
                    "p": iri["p"],
                    "o": iri["o_iri"].fillna(cap["o_bnode"]).fillna(o_lit),
                    "o_is_iri": cap["o_iri"].notna(),
                    "o_lang": cap["o_lang"],
                    "o_datatype": iri["o_dt"],
                    "g": iri["g"].fillna(cap["g_bnode"]),
                }
            )
            yield out

    return gen


def read_ntriples(
    spark: SparkSession, path: str, metrics: ReadMetrics | None = None
) -> DataFrame:
    """S1 (nt/nquads): text scan → vectorized line parser → triples table.
    Splittable (line-oriented), pushdown-friendly columnar output. Pass a
    ReadMetrics to count unparseable lines (read after an action)."""
    bad = metrics._bad_lines if metrics is not None else None
    return spark.read.text(path).mapInPandas(
        _parse_nt_batches(bad), TRIPLES_NT_SCHEMA)


def read_rdf_with_rdflib(spark: SparkSession, path: str, fmt: str = "turtle") -> DataFrame:
    """S1 (ttl/xml/trig/n3): whole-document formats need a real RDF parser.
    Gated on rdflib availability (not in this container — the seam mirrors
    the reference's _guess_format_and_parse)."""
    try:
        import rdflib  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "turtle/xml parsing requires rdflib; nt/nquads are supported "
            "natively via read_ntriples"
        ) from e
    # pragma: no cover — executed only where rdflib is installed
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import rdflib

        for pdf in batches:
            g = rdflib.Graph()
            g.parse(data="\n".join(pdf["value"]), format=fmt)
            rows = []
            for s, p, o in g:
                rows.append((str(s), str(p), str(o),
                             isinstance(o, rdflib.URIRef),
                             getattr(o, "language", None),
                             str(getattr(o, "datatype", "") or "") or None, None))
            yield pd.DataFrame(rows, columns=["s", "p", "o", "o_is_iri",
                                              "o_lang", "o_datatype", "g"])

    return spark.read.text(path, wholetext=True).mapInPandas(parse, TRIPLES_NT_SCHEMA)


def guess_and_read(spark: SparkSession, path: str) -> DataFrame:
    """S1 try-parse chain analog: nt/nq, ttl, trig, rdf/xml, and n3 native
    (rdflib-free); subset-exceeding documents via rdflib
    (/root/reference/src/dataset_preparation.py:371-378)."""
    if path.endswith((".nt", ".nq", ".nquads")):
        return read_ntriples(spark, path)
    if path.endswith((".ttl", ".turtle")):
        return read_turtle(spark, path)
    if path.endswith(".trig"):
        return read_trig(spark, path)
    if path.endswith((".rdf", ".xml", ".owl")):
        return read_rdfxml(spark, path)
    if path.endswith(".n3"):
        return read_n3(spark, path)
    return sniff_and_read(spark, path)


def sniff_format(sample: str) -> str:
    """Guess an RDF serialization from document head text (the reference
    try-parses formats in a fixed order; we sniff instead — one cheap
    driver-side read beats running a distributed parse per candidate).
    Returns one of: 'xml', 'trig', 'turtle', 'nt'."""
    import re

    head = sample.lstrip()
    body = re.sub(r"#[^\n]*", "", sample)  # strip comments before sniffing
    # NT first: '<http://...>' would otherwise look like an XML open tag
    lines = [ln for ln in body.splitlines() if ln.strip()]
    if lines:
        nt_like = sum(bool(re.match(NT_LINE, ln)) for ln in lines[:50])
        if nt_like >= max(1, len(lines[:50]) // 2):
            return "nt"
    if head.startswith("<?xml") or head.startswith("<rdf:RDF") \
            or re.match(r"<[A-Za-z_][\w.-]*(:[A-Za-z_])?[^>]*\bxmlns", head):
        return "xml"
    if re.search(r"(?m)(^|\s)GRAPH\s|\{", body):
        return "trig"
    return "turtle"  # Turtle is the NT superset among our native parsers


def sniff_and_read(spark: SparkSession, path: str) -> DataFrame:
    """S1 for extensionless/unknown paths: sniff the first file's head
    (driver-side, first 8 KB) and dispatch to the matching native reader.
    The reference's analog parses the whole file once per candidate format
    (/root/reference/src/dataset_preparation.py:371-378)."""
    sample = "\n".join(
        r["value"] for r in spark.read.text(path).limit(60).collect()
    )[:8192]
    fmt = sniff_format(sample)
    return {
        "nt": read_ntriples,
        # parse_n3 is a strict Turtle superset (tested), so the sniffed
        # 'turtle' bucket dispatches to read_n3: an extensionless N3 doc
        # (is..of / @keywords sugar) parses instead of erroring, and pure
        # Turtle yields identical triples either way.
        "turtle": read_n3,
        "trig": read_trig,
        "xml": read_rdfxml,
    }[fmt](spark, path)


def _hadoop_list_files(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """(name, full_path) for the immediate FILES of `path`, via the Hadoop
    FileSystem API — works for every scheme Spark itself can read (file:/,
    hdfs:/, s3a:/ ...), unlike os.listdir which only sees driver-local
    paths (ADVICE r4). Flat by design: nested dump dirs are separate
    datasets; call read_rdf_dir per directory."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    out = []
    for st in fs.listStatus(jpath):
        if st.isFile():
            p = st.getPath()
            out.append((p.getName(), p.toString()))
    return sorted(out)


def _hadoop_read_head(spark: SparkSession, full_path: str,
                      nbytes: int = 8192) -> str:
    """First nbytes of a file through the Hadoop FS (any scheme), decoded
    for sniffing. BoundedInputStream caps the read; IOUtils returns the
    byte[] straight into Python via py4j."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(full_path)
    fs = jpath.getFileSystem(hconf)
    stream = fs.open(jpath)
    try:
        bounded = jvm.org.apache.commons.io.input.BoundedInputStream(
            stream, nbytes)
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(bounded))
    finally:
        stream.close()
    return data.decode("utf-8", errors="replace")


def read_rdf_dir(spark: SparkSession, path: str,
                 metrics: ReadMetrics | None = None,
                 on_malformed: str = "raise") -> DataFrame:
    """S1 for a MIXED-format dump directory (real LOD drops mix .nt/.ttl/
    .rdf/... files): group files by extension — sniffing each extensionless
    file's head driver-side — then run ONE native read per format group
    over its whole path list and unionByName the results.

    Scale shape: Spark jobs scale with the number of FORMATS present
    (≤ 5), never with file count — each group is a single multi-path scan
    with per-file parallelism inside it. Listing and head-sniffing go
    through the Hadoop FileSystem API, so any scheme Spark reads works
    (s3a://, hdfs:// — not just driver-local paths); the listing is flat
    (one list call; nested dirs are separate datasets). The per-file head
    sniff only runs for extensionless files (8 KB read each), mirroring
    sniff_and_read. The reference's analog is a per-file Python loop over
    rdflib (/root/reference/src/dataset_preparation.py:526-586).

    metrics/on_malformed thread through to every per-format reader:
    unparseable NT/NQ LINES are dropped and counted in metrics.bad_lines;
    whole-doc formats raise by default or, under
    on_malformed='quarantine', skip + count in metrics.bad_docs."""
    import os

    ext_bucket = {
        ".nt": "nt", ".nq": "nt", ".nquads": "nt",
        ".ttl": "turtle", ".turtle": "turtle",
        ".trig": "trig",
        ".rdf": "xml", ".xml": "xml", ".owl": "xml",
        ".n3": "n3",
    }
    groups: dict[str, list[str]] = {}
    for fn, full in _hadoop_list_files(spark, path):
        if fn.startswith((".", "_")):
            continue
        ext = os.path.splitext(fn)[1].lower()
        if ext in ext_bucket:
            groups.setdefault(ext_bucket[ext], []).append(full)
        else:
            head = _hadoop_read_head(spark, full)
            fmt = sniff_format(head)
            # sniffed-turtle dispatches to n3 (strict superset; same rule
            # as sniff_and_read)
            groups.setdefault("n3" if fmt == "turtle" else fmt, []).append(full)
    if not groups:
        raise ValueError(f"read_rdf_dir: no readable RDF files in {path!r}")
    frames = []
    for fmt, paths in sorted(groups.items()):
        if fmt == "nt":
            frames.append(read_ntriples(spark, paths, metrics))
        else:
            reader = {"turtle": read_turtle, "trig": read_trig,
                      "xml": read_rdfxml, "n3": read_n3}[fmt]
            frames.append(reader(spark, paths, metrics, on_malformed))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def read_catalog_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S2 — CSV catalog scan with explicit schema (never inferSchema in
    prod; reference: pd.read_csv at /root/reference/src/util.py:147-149)."""
    return spark.read.csv(path, header=True, schema=schema)


def read_json_shards(spark: SparkSession, path: str, schema) -> DataFrame:
    """S3 — JSON shard scan (reference: pd.read_json(orient='records'),
    /root/reference/src/util.py:221-228)."""
    return spark.read.schema(schema).json(path)


def merge_shards_keep_last(frames: list[DataFrame], key: str = "id") -> DataFrame:
    """The reference's merge_dataset: concat shards + dedup on id keeping
    the last occurrence (/root/reference/src/util.py:212-236) — see
    operators.joins.union_keep_last for the explicit-order core."""
    from .operators.joins import union_keep_last

    return union_keep_last(frames, key)


def nt_lines_from_triples(t: DataFrame) -> DataFrame:
    """S7 textual sink: serialize a triples table back to N-Triples lines
    (with the literal escaping the reference applies,
    /root/reference/src/generate_profile.py:185-197). Accepts either the
    parser naming (s, p, o, o_is_iri) or the engine's canonical triples
    naming (subj, pred, obj, obj_is_iri)."""
    if "subj" in t.columns:
        t = t.select(
            F.col("subj").alias("s"), F.col("pred").alias("p"),
            F.col("obj").alias("o"), F.col("obj_is_iri").alias("o_is_iri"),
        )
    # ECHAR-escape per the N-Triples grammar: backslash FIRST (so later
    # rules don't double-escape), then quote and the control chars — a
    # literal holding a real LF/CR/TAB must serialize to \n/\r/\t or the
    # emitted file is invalid multi-line NT the reader would drop.
    esc = F.col("o")
    for pat, rep in ((r"\\", r"\\\\"), ('"', r"\\\""),
                     ("\n", r"\\n"), ("\r", r"\\r"), ("\t", r"\\t")):
        esc = F.regexp_replace(esc, pat, rep)
    obj = F.when(F.col("o_is_iri"), F.concat(F.lit("<"), F.col("o"), F.lit(">"))) \
        .otherwise(F.concat(F.lit('"'), esc, F.lit('"')))
    return t.select(
        F.concat(
            F.lit("<"), F.col("s"), F.lit("> <"), F.col("p"), F.lit("> "),
            obj, F.lit(" ."),
        ).alias("value")
    )


# --- S1: pure-Python Turtle-subset parser (r2) -----------------------------
#
# Covers the common Turtle grammar per the public W3C spec: @prefix/@base
# (and SPARQL-style PREFIX/BASE), IRIs, prefixed names, 'a', blank-node
# labels, ';'/',' predicate-object lists, short/long single/double-quoted
# literals with @lang / ^^datatype, numeric and boolean abbreviations.
# Anonymous blank-node property lists '[...]' and collections '(...)' are
# NOT in the subset — inputs using them raise with a pointer to the rdflib
# seam (read_rdf_with_rdflib), mirroring the reference's try-parse chain
# (/root/reference/src/dataset_preparation.py:371-378).

_TTL_TOKEN = __import__("re").compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<lstr>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<str>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
      # IRIREF ::= '<' ([^#x00-#x20<>"{}|^`\] | UCHAR)* '>'
    | (?P<iri><(?:[^<>"{}|^`\\\x00-\x20]|\\u[0-9a-fA-F]{4}|\\U[0-9a-fA-F]{8})*>)
    | (?P<kw>@prefix|@base|(?i:PREFIX|BASE)(?=[\s<]))
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtype>\^\^)
    | (?P<op><=|=>|=|!|\^)
    | (?P<qvar>\?[A-Za-z_][\w-]*)
    | (?P<punct>[;,.\[\](){}])
    | (?P<num>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
      # PN_LOCAL / bnode labels may contain dots but must not END with one
      # (else 'ex:a.' would swallow the statement terminator); PN_LOCAL
      # also admits PN_LOCAL_ESC backslash escapes (ex:foo\.bar — W3C
      # Turtle grammar), stripped in resolve_pname; the third alternative
      # is the empty-prefix pname ':local' (default namespace)
    | (?P<pname>[A-Za-z_][\w.-]*?:(?:(?:[\w.:%-]|\\[_~.!$&'()*+,;=/?#@%-])*
                                     (?:[\w:%-]|\\[_~.!$&'()*+,;=/?#@%-]))?
               |_:[\w.-]*[\w-]
               |:(?:(?:[\w.%-]|\\[_~.!$&'()*+,;=/?#@%-])*
                    (?:[\w%-]|\\[_~.!$&'()*+,;=/?#@%-]))?
               |[A-Za-z_][\w-]*:?)
    """,
    __import__("re").VERBOSE,
)

_XSD = "http://www.w3.org/2001/XMLSchema#"


def _ttl_tokens(text: str):
    pos, n = 0, len(text)
    while pos < n:
        if text[pos].isspace():
            pos += 1
            continue
        m = _TTL_TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"turtle: cannot tokenize at offset {pos}: "
                             f"{text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "comment":
            continue
        yield kind, m.group()


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def parse_turtle(text: str, doc_salt: str | None = None) -> list[tuple]:
    """Parse a Turtle document → rows matching TRIPLES_NT_SCHEMA:
    (s, p, o, o_is_iri, o_lang, o_datatype, g=None). Covers prefixes/base,
    pnames, lang/datatype literals, `;`/`,` lists, anonymous blank-node
    property lists `[...]` and RDF collections `(...)` (fresh `_:gb<n>`
    labels, rdf:first/rest/nil encoding per the W3C Turtle grammar).
    doc_salt (the readers pass a file-path hash) scopes EVERY bnode label
    — generated and explicit `_:` alike — to this document: bnode labels
    are document-scoped in RDF, so two files both using `_:b1` denote
    distinct nodes and must not be conflated after a multi-file read."""
    return _parse_ttl_family(text, allow_graphs=False, doc_salt=doc_salt)


def parse_trig(text: str, doc_salt: str | None = None) -> list[tuple]:
    """Parse a TriG document (Turtle + graph blocks): `{...}` (default
    graph), `<g> {...}` / `pname {...}` / `GRAPH <g> {...}` — the g column
    carries the graph IRI (None for the default graph). Everything Turtle
    supports is legal inside a block and at the top level."""
    return _parse_ttl_family(text, allow_graphs=True, doc_salt=doc_salt)


def parse_n3(text: str, doc_salt: str | None = None) -> list[tuple]:
    """Parse a formula-free Notation3 document (the last of the reference's
    six formats, /root/reference/src/dataset_preparation.py:19). The
    supported subset is the full Turtle grammar plus the N3 sugar that
    desugars to plain triples: `@keywords` (bare words → default-prefix
    names), `has <p>` (identity), `<o> is <p> of <s>` (inverse), and `=`
    (owl:sameAs). Formulae `{...}`, variables `?x`, rules `=>`/`<=` and
    paths `!`/`^` have no triple desugaring — they raise
    NotImplementedError so callers route through the rdflib seam
    (read_rdf_with_rdflib), mirroring the reference's try-parse chain."""
    return _parse_ttl_family(text, allow_graphs=False, doc_salt=doc_salt,
                             n3=True)


_OWL_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"


def _parse_ttl_family(text: str, allow_graphs: bool,
                      doc_salt: str | None = None,
                      n3: bool = False) -> list[tuple]:
    import re

    prefixes: dict[str, str] = {}
    base = [""]
    toks = list(_ttl_tokens(text))
    i = 0
    rows: list[tuple] = []
    graph: list[str | None] = [None]   # current graph IRI (TriG blocks)
    bn_counter = [0]
    keywords_mode = [False]            # n3 @keywords: bare words = :name
    salt = f"{doc_salt}_" if doc_salt else ""

    def fresh_bnode() -> str:
        bn_counter[0] += 1
        return f"_:gb{salt}{bn_counter[0]}"

    def scoped_bnode(tok: str) -> str:
        # explicit _:label — document-scoped, so salt it like generated ones
        return f"_:{salt}{tok[2:]}" if salt else tok

    def resolve_iri(tok: str) -> str:
        iri = tok[1:-1]
        if "\\" in iri:  # IRIREF admits UCHAR escapes (Turtle grammar)
            iri = re.sub(_UCHAR_RE, _decode_uchar_match, iri)
        if base[0] and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return base[0] + iri
        return iri

    def resolve_pname(tok: str) -> str:
        if tok.startswith("_:"):
            return scoped_bnode(tok)
        if keywords_mode[0] and ":" not in tok:
            # n3 @keywords: a bare word is a name in the default namespace
            if ":" not in prefixes:
                raise ValueError("n3: bare word with no default @prefix :")
            return prefixes[":"] + tok
        pfx, _, local = tok.partition(":")
        if pfx + ":" not in prefixes:
            raise ValueError(f"turtle: undefined prefix {pfx!r}:")
        if "\\" in local:  # PN_LOCAL_ESC: '\.' etc. denote the bare char
            local = re.sub(r"\\([_~.!$&'()*+,;=/?#@%-])", r"\1", local)
        return prefixes[pfx + ":"] + local

    def unquote(tok: str) -> str:
        body = tok[3:-3] if tok[:3] in ('"""', "'''") else tok[1:-1]
        # STRING_LITERAL* ::= ... (ECHAR | UCHAR) — same one-pass decode
        # as the N-Triples reader so all five formats agree.
        return re.sub(_ESCAPE_RE, _decode_escape_match, body)

    def emit(subj, pred, obj):
        if obj[0] == "lit":
            rows.append((subj[1], pred[1], obj[1], False,
                         obj[2], obj[3], graph[0]))
        else:
            rows.append((subj[1], pred[1], obj[1], obj[0] == "iri",
                         None, None, graph[0]))

    def term(j: int, as_subject: bool = False):
        kind, tok = toks[j]
        if kind == "iri":
            return ("iri", resolve_iri(tok)), j + 1
        if kind == "pname":
            if tok == "a" and not as_subject:
                return ("iri", _RDF_NS + "type"), j + 1
            if tok in ("true", "false"):
                return ("lit", tok, None, _XSD + "boolean"), j + 1
            return (("bnode", scoped_bnode(tok)) if tok.startswith("_:")
                    else ("iri", resolve_pname(tok))), j + 1
        if kind in ("str", "lstr"):
            val = unquote(tok)
            if j + 1 < len(toks) and toks[j + 1][0] == "langtag":
                return ("lit", val, toks[j + 1][1][1:], None), j + 2
            if j + 1 < len(toks) and toks[j + 1][0] == "dtype":
                dt, j2 = term(j + 2)
                return ("lit", val, None, dt[1]), j2
            return ("lit", val, None, None), j + 1
        if kind == "num":
            dt = ("integer" if re.fullmatch(r"[+-]?\d+", tok)
                  else "double" if "e" in tok.lower() else "decimal")
            return ("lit", tok, None, _XSD + dt), j + 1
        if kind == "punct" and tok == "[":
            # anonymous blank-node property list: [ p1 o1 ; p2 o2 ]
            node = ("bnode", fresh_bnode())
            j += 1
            if toks[j] != ("punct", "]"):
                j = parse_pol(j, node, stop="]")
            return node, expect_punct(j, "]")
        if kind == "punct" and tok == "(":
            # RDF collection → rdf:first/rdf:rest chain, () → rdf:nil
            j += 1
            items = []
            while toks[j] != ("punct", ")"):
                item, j = term(j)
                items.append(item)
            nil = ("iri", _RDF_NS + "nil")
            if not items:
                return nil, j + 1
            nodes = [("bnode", fresh_bnode()) for _ in items]
            for k, item in enumerate(items):
                emit(nodes[k], ("iri", _RDF_NS + "first"), item)
                emit(nodes[k], ("iri", _RDF_NS + "rest"),
                     nodes[k + 1] if k + 1 < len(items) else nil)
            return nodes[0], j + 1
        if n3 and (kind == "qvar" or (kind == "punct" and tok == "{")):
            raise NotImplementedError(
                f"n3 subset: {tok!r} (formulae/variables) needs rdflib — "
                "route through read_rdf_with_rdflib")
        if n3 and kind == "op" and tok in ("!", "^"):
            raise NotImplementedError(
                f"n3 subset: path operator {tok!r} needs rdflib")
        raise ValueError(f"turtle: unexpected token {tok!r}")

    def verb(j: int):
        """predicate position: a term, or (n3) `has p` / `is p of` /
        `=` / `=>` / `<=`. Returns (pred, j, inverse)."""
        if n3 and j < len(toks):
            kind, tok = toks[j]
            if kind == "op":
                if tok == "=":
                    return ("iri", _OWL_SAME_AS), j + 1, False
                raise NotImplementedError(
                    f"n3 subset: operator {tok!r} needs rdflib")
            if kind == "pname" and tok == "has":
                pred, j2 = term(j + 1)
                return pred, j2, False
            if kind == "pname" and tok == "is":
                pred, j2 = term(j + 1)
                if j2 >= len(toks) or toks[j2] != ("pname", "of"):
                    raise ValueError("n3: expected 'of' after 'is <pred>'")
                return pred, j2 + 1, True
        pred, j = term(j)
        return pred, j, False

    def parse_pol(j: int, subj, stop: str = ".") -> int:
        """predicateObjectList: p o (, o)* (; p o ...)* — returns the index
        of the terminating punct (not consumed)."""
        while True:
            pred, j, inverse = verb(j)
            while True:
                obj, j = term(j)
                if inverse:
                    # n3 `o is p of s`: the parsed object is the SUBJECT
                    if obj[0] == "lit":
                        raise ValueError("n3: literal subject in 'is..of'")
                    emit(obj, pred, subj)
                else:
                    emit(subj, pred, obj)
                if j < len(toks) and toks[j] == ("punct", ","):
                    j += 1
                    continue
                break
            if j < len(toks) and toks[j] == ("punct", ";"):
                j += 1
                # trailing ';' before the terminator is legal — and inside
                # a TriG graph block BOTH '}' and the statement '.' are
                # terminators ('ex:g { ex:a ex:b ex:c ; . }' is legal TriG)
                if j < len(toks) and toks[j][0] == "punct" \
                        and toks[j][1] in (stop, "."):
                    break
                continue
            break
        return j

    def expect_punct(j: int, ch: str) -> int:
        if j >= len(toks) or toks[j] != ("punct", ch):
            got = toks[j][1] if j < len(toks) else "<eof>"
            raise ValueError(f"turtle: expected {ch!r}, got {got!r}")
        return j + 1

    def parse_block(j: int) -> int:
        """TriG graph block body: { triples* } with graph[0] already set."""
        j = expect_punct(j, "{")
        while j < len(toks) and toks[j] != ("punct", "}"):
            subj, j = term(j, as_subject=True)
            j = parse_pol(j, subj, stop="}")
            if j < len(toks) and toks[j] == ("punct", "."):
                j += 1  # statement '.' is optional before '}' in TriG
        return expect_punct(j, "}")

    while i < len(toks):
        kind, tok = toks[i]
        if n3 and kind == "langtag" and tok.lower() in (
                "@keywords", "@forall", "@forsome"):
            if tok.lower() != "@keywords":
                raise NotImplementedError(
                    f"n3 subset: {tok} quantification needs rdflib")
            # consume the keyword list (bare words / 'a', comma-separated)
            keywords_mode[0] = True
            i += 1
            while i < len(toks) and toks[i] != ("punct", "."):
                i += 1
            i = expect_punct(i, ".")
            continue
        if kind == "kw":
            kw = tok.lower().lstrip("@")
            if kw == "prefix":
                pfx = toks[i + 1][1]
                iri = resolve_iri(toks[i + 2][1])
                prefixes[pfx if pfx.endswith(":") else pfx + ":"] = iri
                i += 3
            else:  # base
                base[0] = toks[i + 1][1][1:-1]
                i += 2
            if i < len(toks) and toks[i] == ("punct", "."):
                i += 1  # @prefix form ends with '.'; SPARQL PREFIX doesn't
            continue
        if allow_graphs:
            if tok == "{":  # default graph block
                graph[0] = None
                i = parse_block(i)
                continue
            if kind == "pname" and tok.lower() == "graph":
                gterm, i = term(i + 1)
                graph[0] = gterm[1]
                i = parse_block(i)
                graph[0] = None
                continue
            if (kind in ("iri", "pname") and i + 1 < len(toks)
                    and toks[i + 1] == ("punct", "{")):
                gterm, i = term(i)
                graph[0] = gterm[1]
                i = parse_block(i)
                graph[0] = None
                continue
        subj, i = term(i, as_subject=True)
        i = parse_pol(i, subj, stop=".")
        i = expect_punct(i, ".")
    return rows


def _whole_doc_reader(
    spark: SparkSession, path: str, parse_fn,
    metrics: ReadMetrics | None = None, on_malformed: str = "raise",
) -> DataFrame:
    """Shared per-file reader for the non-splittable formats: whole-document
    scan → parse per file inside mapInPandas. Parallelism is per-FILE — a
    directory of shards parallelizes; one giant document does not (convert
    to .nt for that). Each document's bnode labels are salted with a short
    hash of its file path (bnode labels are document-scoped in RDF — two
    files both writing `_:b1` denote DIFFERENT nodes, and a multi-file read
    must not conflate them in downstream joins/dedup/canonicalization).

    on_malformed: 'raise' (default) fails the job on the first document
    the subset parser rejects — the right call for curated inputs;
    'quarantine' skips the document, counts it in metrics.bad_docs, and
    keeps the scan alive — the right call for a crawl where one corrupt
    shard must not kill a 100 TB read (Spark's PERMISSIVE/badRecordsPath
    idiom). NotImplementedError (subset-exceeding but well-formed RDF)
    always raises: quarantining it would silently drop GOOD data the
    rdflib seam can parse."""
    import hashlib

    if on_malformed not in ("raise", "quarantine"):
        raise ValueError(
            f"on_malformed must be 'raise' or 'quarantine', got {on_malformed!r}")
    bad_acc = metrics._bad_docs if metrics is not None else None
    quarantine = on_malformed == "quarantine"

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["s", "p", "o", "o_is_iri", "o_lang", "o_datatype", "g"]
        for pdf in batches:
            for fname, doc in zip(pdf["_file"], pdf["value"]):
                salt = hashlib.md5(
                    (fname or doc or "").encode()).hexdigest()[:8]
                try:
                    rows = parse_fn(doc or "", doc_salt=salt)
                except NotImplementedError:
                    raise  # well-formed RDF beyond the subset → rdflib seam
                except Exception:
                    # The subset parsers raise ValueError/SyntaxError
                    # (xml.etree's ParseError) on bad input by contract,
                    # but a truncated or pathological document can
                    # surface IndexError/KeyError/AttributeError from the
                    # hand-rolled code paths — quarantine mode must
                    # quarantine those too instead of killing the scan
                    # (ADVICE r5). raise-mode still propagates everything.
                    if not quarantine:
                        raise
                    if bad_acc is not None:
                        bad_acc.add(1)
                    continue
                yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.text(path, wholetext=True)
        .select(F.input_file_name().alias("_file"), "value")
        .mapInPandas(parse, TRIPLES_NT_SCHEMA)
    )


def read_turtle(spark: SparkSession, path: str,
                metrics: ReadMetrics | None = None,
                on_malformed: str = "raise") -> DataFrame:
    """S1 (ttl, rdflib-free subset): whole-document scan → parse_turtle per
    file inside mapInPandas (per-file parallelism + per-document bnode
    scoping: see _whole_doc_reader)."""
    return _whole_doc_reader(spark, path, parse_turtle, metrics, on_malformed)


def read_trig(spark: SparkSession, path: str,
              metrics: ReadMetrics | None = None,
              on_malformed: str = "raise") -> DataFrame:
    """S1 (trig, rdflib-free): per-file parse_trig inside mapInPandas; the
    g column carries the graph IRI (None = default graph)."""
    return _whole_doc_reader(spark, path, parse_trig, metrics, on_malformed)


def read_n3(spark: SparkSession, path: str,
            metrics: ReadMetrics | None = None,
            on_malformed: str = "raise") -> DataFrame:
    """S1 (n3, rdflib-free subset): per-file parse_n3 inside mapInPandas —
    full Turtle plus the triple-desugaring N3 sugar (@keywords, has,
    is..of, =). Formulae/variables/rules raise NotImplementedError from
    the parser; route those documents through read_rdf_with_rdflib."""
    return _whole_doc_reader(spark, path, parse_n3, metrics, on_malformed)


# --- RDF/XML (stdlib ElementTree subset, r3) -------------------------------

_RDF_TAG = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
_XML_TAG = "{http://www.w3.org/XML/1998/namespace}"


def parse_rdfxml(text: str, doc_salt: str | None = None) -> list[tuple]:
    """Parse an RDF/XML document (subset, stdlib ElementTree — no rdflib)
    → rows matching TRIPLES_NT_SCHEMA. Covered, per the public W3C RDF/XML
    grammar: rdf:RDF root (or a bare node element), rdf:Description and
    typed node elements, rdf:about / rdf:ID / rdf:nodeID subjects,
    property elements with rdf:resource / rdf:nodeID / nested node
    elements / literal content, xml:lang (element-local or inherited from
    the node element), rdf:datatype, rdf:parseType="Resource", rdf:li
    container items (expanded to rdf:_n). Outside the subset (raises
    NotImplementedError → route through read_rdf_with_rdflib):
    parseType="Literal"/"Collection", property attributes, reification."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    rows: list[tuple] = []
    counter = [0]
    salt = f"{doc_salt}_" if doc_salt else ""
    xml_base = (root.get(_XML_TAG + "base") or "").split("#")[0]

    def fresh() -> str:
        counter[0] += 1
        return f"_:xb{salt}{counter[0]}"

    def scoped(nid: str) -> str:
        # rdf:nodeID labels are document-scoped like Turtle _: labels
        return f"_:{salt}{nid}"

    def expand(tag: str) -> str:
        if not tag.startswith("{"):
            raise NotImplementedError(
                f"rdf/xml subset: unqualified element {tag!r}")
        return tag[1:].replace("}", "")

    def emit(subj, pred, obj, lang=None, dtype=None):
        if obj[0] == "lit":
            rows.append((subj[1], pred, obj[1], False, lang, dtype, None))
        else:
            rows.append((subj[1], pred, obj[1], obj[0] == "iri",
                         None, None, None))

    def subject_of(el):
        about = el.get(_RDF_TAG + "about")
        rid = el.get(_RDF_TAG + "ID")
        nid = el.get(_RDF_TAG + "nodeID")
        if about is not None:
            return ("iri", about)
        if rid is not None:
            # rdf:ID denotes <base#id>; without a document base the IRI
            # would be relative and collide across files → rdflib seam
            if not xml_base:
                raise NotImplementedError(
                    "rdf/xml subset: rdf:ID without xml:base needs a "
                    "document base — route through read_rdf_with_rdflib")
            return ("iri", xml_base + "#" + rid)
        if nid is not None:
            return ("bnode", scoped(nid))
        return ("bnode", fresh())

    def do_props(subj, el, inherited_lang):
        li_n = 0
        for prop in el:
            ptag = expand(prop.tag)
            if ptag == _RDF_NS + "li":
                li_n += 1
                ptag = _RDF_NS + f"_{li_n}"
            ptype = prop.get(_RDF_TAG + "parseType")
            lang = prop.get(_XML_TAG + "lang", inherited_lang)
            res = prop.get(_RDF_TAG + "resource")
            nid = prop.get(_RDF_TAG + "nodeID")
            dtype = prop.get(_RDF_TAG + "datatype")
            children = list(prop)
            if ptype == "Resource":
                b = ("bnode", fresh())
                emit(subj, ptag, b)
                do_props(b, prop, lang)
            elif ptype is not None:
                raise NotImplementedError(
                    f"rdf/xml subset: parseType={ptype!r} needs rdflib")
            elif res is not None:
                emit(subj, ptag, ("iri", res))
            elif nid is not None:
                emit(subj, ptag, ("bnode", scoped(nid)))
            elif children:
                obj = do_node(children[0], lang)
                emit(subj, ptag, obj)
            else:
                emit(subj, ptag, ("lit", prop.text or ""),
                     lang=None if dtype else lang, dtype=dtype)

    def do_node(el, inherited_lang=None):
        subj = subject_of(el)
        tag = expand(el.tag)
        lang = el.get(_XML_TAG + "lang", inherited_lang)
        if tag != _RDF_NS + "Description":
            emit(subj, _RDF_NS + "type", ("iri", tag))
        do_props(subj, el, lang)
        return subj

    if expand(root.tag) == _RDF_NS + "RDF":
        lang = root.get(_XML_TAG + "lang")
        for child in root:
            do_node(child, lang)
    else:
        do_node(root)
    return rows


def read_rdfxml(spark: SparkSession, path: str,
                metrics: ReadMetrics | None = None,
                on_malformed: str = "raise") -> DataFrame:
    """S1 (rdf/xml, rdflib-free subset): per-file parse_rdfxml inside
    mapInPandas; same per-file parallelism + bnode-scoping contract as
    read_turtle (_whole_doc_reader)."""
    return _whole_doc_reader(spark, path, parse_rdfxml, metrics, on_malformed)
