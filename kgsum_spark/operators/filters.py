"""Filters and predicates (SURVEY.md §2.2, F1-F8)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# F3 — the reference ships a static blacklist of URI prefixes
# (/root/reference/src/filter/filter.json; applied via is_curi_allowed /
# is_voc_allowed, /root/reference/src/util.py:52-64: keep a URI iff NO
# blacklist entry is a substring). The lists below mirror the reference's
# *shape* (w3 core + social/wiki hosts); the engine takes them as params.
DEFAULT_CURI_BLACKLIST = [
    "www.w3.org", "purl.org/dc/", "xmlns.com/foaf", "schema.org",
    "rdfs.org", "wikiba.se", "wikidata.org",
]
DEFAULT_VOC_BLACKLIST = [
    "www.w3.org", "purl.org", "xmlns.com", "schema.org", "rdfs.org",
    "ogp.me", "wikiba.se", "creativecommons.org", "usefulinc.com",
    "openlinksw.com", "wikidata.org", "rdf-vocabulary",
]


def category_exclusion(df: DataFrame, col: str = "category",
                       excluded: str = "user_generated") -> DataFrame:
    """F1 — drop rows whose (fillna+strip) category equals the excluded one
    (/root/reference/src/dataset_preparation.py:444)."""
    return df.filter(F.trim(F.coalesce(F.col(col), F.lit(""))) != excluded)


def non_empty(df: DataFrame, cols: list[str]) -> DataFrame:
    """F2 — dropna + != '' per column
    (/root/reference/src/pipeline_build.py:206-214 remove_empty_rows)."""
    out = df.na.drop(subset=cols)
    for c in cols:
        out = out.filter(F.col(c) != "")
    return out


def uri_allowed(uri: Column, blacklist: list[str]) -> Column:
    """F3 — keep URI iff no blacklist entry is a substring
    (/root/reference/src/util.py:52-64). The static list is precompiled
    into ONE regex alternation → a single JVM rlike per row instead of
    N contains() calls."""
    import re as _re

    pattern = "|".join(_re.escape(b) for b in blacklist)
    return ~uri.rlike(pattern)


def filter_blacklisted_uris(df: DataFrame, col: str,
                            blacklist: list[str] | None = None) -> DataFrame:
    return df.filter(uri_allowed(F.col(col), blacklist or DEFAULT_CURI_BLACKLIST))


def predicate_prefix_filter(p: Column) -> Column:
    """F5 — vocab discovery keeps http:// predicates outside w3.org core
    (/root/reference/src/dataset_preparation.py:31-33)."""
    return p.startswith("http://") & ~p.startswith("http://www.w3.org")


def lang_filter_with_fallback(df: DataFrame, lang_col: str = "o_lang",
                              lang: str = "en", min_rows: int = 2) -> DataFrame:
    """F6 — prefer rows in `lang`; if fewer than min_rows match, fall back
    to the unfiltered set (/root/reference/src/dataset_preparation.py:136-168
    re-queries without the language filter when the first pass is empty).

    ONE declarative plan (no eager count() job): the match count is a
    1-row aggregate broadcast-cross-joined back, and the filter keeps a row
    iff it matches OR the whole set is falling back. The r1 version ran an
    extra job + second scan whenever the fallback fired."""
    is_match = F.col(lang_col) == lang
    counts = df.agg(
        F.count(F.when(is_match, F.lit(1))).alias("_n_match")
    )
    return (
        df.crossJoin(F.broadcast(counts))
        .filter(is_match | (F.col("_n_match") < min_rows))
        .drop("_n_match")
    )


def scrub_empty_lists(df: DataFrame, cols: list[str]) -> DataFrame:
    """F7 — normalize [] / null list values to empty arrays (the reference
    oscillates between [], "", "[]", None — /root/reference/src/preprocessing.py:137-144,
    191-199; our schemas keep ArrayType and normalize once here)."""
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.array().cast("array<string>"))
        )
    return out


def title_skip(df: DataFrame, col: str = "title", needle: str = "wikidata") -> DataFrame:
    """F8 — skip rows whose lowercase title contains the needle
    (/root/reference/src/dataset_extraction/zenodo_records_extraction.py:199-201)."""
    return df.filter(~F.lower(F.col(col)).contains(needle))
