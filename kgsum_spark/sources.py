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
    """S1 try-parse chain analog: nt/nq native, else rdflib formats
    (/root/reference/src/dataset_preparation.py:371-378)."""
    if path.endswith((".nt", ".nq", ".nquads")):
        return read_ntriples(spark, path)
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
