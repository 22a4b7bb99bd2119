"""Sources: multi-format RDF ingestion and tabular scans (SURVEY.md §2.1).

S1 — the reference try-parses files as ttl/xml/nt/trig/n3/nquads with
rdflib (/root/reference/src/dataset_preparation.py:371-378, formats :19).
Spark-first: N-Triples/N-Quads are line-oriented → `spark.read.text` +
one vectorized regex per batch inside mapInPandas (C-speed, splittable,
100 TB-ready). Turtle/RDF-XML are NOT line-oriented; they parse via rdflib
per batch when available (import-gated — not shipped in this container).

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

# ECHAR decode map (W3C N-Triples grammar). Decoding MUST be a single
# left-to-right pass: sequential str.replace corrupts inputs like the
# encoded 'C:\\new' (raw C:\new), where the \n rule would eat half of \\.
_ECHAR = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
          "\\": "\\", '"': '"', "'": "'"}
_ECHAR_RE = r"\\([ntrbf\\\"'])"


def _unescape_echar(lit: pd.Series) -> pd.Series:
    return lit.str.replace(
        _ECHAR_RE, lambda m: _ECHAR[m.group(1)], regex=True
    )


def _parse_nt_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        lines = pdf["value"].fillna("")
        keep = ~lines.str.match(r"^\s*(#|$)")
        lines = lines[keep]
        if lines.empty:
            continue
        cap = lines.str.extract(NT_LINE)
        ok = cap["p"].notna()
        cap = cap[ok]
        if cap.empty:
            continue
        o_lit = _unescape_echar(cap["o_lit"])
        out = pd.DataFrame(
            {
                "s": cap["s_iri"].fillna(cap["s_bnode"]),
                "p": cap["p"],
                "o": cap["o_iri"].fillna(cap["o_bnode"]).fillna(o_lit),
                "o_is_iri": cap["o_iri"].notna(),
                "o_lang": cap["o_lang"],
                "o_datatype": cap["o_dt"],
                "g": cap["g"].fillna(cap["g_bnode"]),
            }
        )
        yield out


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """S1 (nt/nquads): text scan → vectorized line parser → triples table.
    Splittable (line-oriented), pushdown-friendly columnar output."""
    return spark.read.text(path).mapInPandas(_parse_nt_batches, TRIPLES_NT_SCHEMA)


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
    """S1 try-parse chain analog: nt/nq native, ttl via the built-in
    subset parser (rdflib-free), remaining formats via rdflib
    (/root/reference/src/dataset_preparation.py:371-378)."""
    if path.endswith((".nt", ".nq", ".nquads")):
        return read_ntriples(spark, path)
    if path.endswith((".ttl", ".turtle")):
        return read_turtle(spark, path)
    for fmt in ("turtle", "xml", "trig", "n3"):
        try:
            return read_rdf_with_rdflib(spark, path, fmt)
        except NotImplementedError:
            raise
        except Exception:  # noqa: BLE001 — try next format, like the reference
            continue
    raise ValueError(f"no RDF format parsed {path}")


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
    | (?P<iri><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<kw>@prefix|@base|(?i:PREFIX|BASE)(?=[\s<]))
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtype>\^\^)
    | (?P<punct>[;,.\[\]()])
    | (?P<num>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
      # PN_LOCAL / bnode labels may contain dots but must not END with one
      # (else 'ex:a.' would swallow the statement terminator)
    | (?P<pname>[A-Za-z_][\w.-]*?:(?:[\w.:%-]*[\w:%-])?
               |_:[\w.-]*[\w-]
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


def parse_turtle(text: str) -> list[tuple]:
    """Parse a Turtle document (subset) → rows matching TRIPLES_NT_SCHEMA:
    (s, p, o, o_is_iri, o_lang, o_datatype, g=None)."""
    import re

    prefixes: dict[str, str] = {}
    base = [""]
    toks = list(_ttl_tokens(text))
    i = 0
    rows: list[tuple] = []

    def resolve_iri(tok: str) -> str:
        iri = tok[1:-1]
        if base[0] and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return base[0] + iri
        return iri

    def resolve_pname(tok: str) -> str:
        if tok.startswith("_:"):
            return tok
        pfx, _, local = tok.partition(":")
        if pfx + ":" not in prefixes:
            raise ValueError(f"turtle: undefined prefix {pfx!r}:")
        return prefixes[pfx + ":"] + local

    def unquote(tok: str) -> str:
        body = tok[3:-3] if tok[:3] in ('"""', "'''") else tok[1:-1]
        return re.sub(
            r"\\([ntrbf\\\"'])", lambda m: _ECHAR[m.group(1)], body
        )

    def term(j: int, as_subject: bool = False):
        kind, tok = toks[j]
        if kind == "iri":
            return ("iri", resolve_iri(tok)), j + 1
        if kind == "pname":
            if tok == "a" and not as_subject:
                return ("iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), j + 1
            if tok in ("true", "false"):
                return ("lit", tok, None, _XSD + "boolean"), j + 1
            return (("bnode", tok) if tok.startswith("_:")
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
        if kind == "punct" and tok in "[(":
            raise NotImplementedError(
                "turtle subset: anonymous blank nodes '[...]' and "
                "collections '(...)' need rdflib (read_rdf_with_rdflib)"
            )
        raise ValueError(f"turtle: unexpected token {tok!r}")

    def expect_punct(j: int, ch: str) -> int:
        if j >= len(toks) or toks[j] != ("punct", ch):
            got = toks[j][1] if j < len(toks) else "<eof>"
            raise ValueError(f"turtle: expected {ch!r}, got {got!r}")
        return j + 1

    while i < len(toks):
        kind, tok = toks[i]
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
        subj, i = term(i, as_subject=True)
        while True:
            pred, i = term(i)
            while True:
                obj, i = term(i)
                if obj[0] == "lit":
                    rows.append((subj[1], pred[1], obj[1], False,
                                 obj[2], obj[3], None))
                else:
                    rows.append((subj[1], pred[1], obj[1], obj[0] == "iri",
                                 None, None, None))
                if i < len(toks) and toks[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if i < len(toks) and toks[i] == ("punct", ";"):
                i += 1
                if i < len(toks) and toks[i] == ("punct", "."):  # trailing ;
                    break
                continue
            break
        i = expect_punct(i, ".")
    return rows


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """S1 (ttl, rdflib-free subset): whole-document scan → parse_turtle per
    file inside mapInPandas. Turtle is not splittable (prefix state spans
    the document), so parallelism is per-FILE — a directory of shards
    parallelizes; one giant .ttl does not (convert to .nt for that)."""
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["s", "p", "o", "o_is_iri", "o_lang", "o_datatype", "g"]
        for pdf in batches:
            for doc in pdf["value"]:
                yield pd.DataFrame(parse_turtle(doc or ""), columns=cols)

    return spark.read.text(path, wholetext=True).mapInPandas(
        parse, TRIPLES_NT_SCHEMA
    )
