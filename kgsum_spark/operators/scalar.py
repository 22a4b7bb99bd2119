"""Scalar string/URI functions (SURVEY.md §2.9, C1-C14).

Each function returns a Column built only from JVM expressions; reference
behavior cited per function. Regex pattern strings are kept verbatim from
the reference where they act as the spec (C5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# C5 — two distinct URI predicates the reference uses; they disagree on
# e.g. "www.x.com", so both are kept.
# /root/reference/src/lov_data_preparation.py:18-19
IS_URI_STRICT = r"^https?://[^\s<>\"']+$"
# /root/reference/src/pipeline_build.py:65-69 (looser: ftp/file/www/bare domain)
IS_URI_LOOSE = r"^(?:(?:https?|ftp|file)://|www\.)[^\s<>\"']+$|^[a-zA-Z0-9.-]+\.[a-z]{2,}(?:/[^\s]*)?$"


def namespace_of(uri: Column) -> Column:
    """C1 — namespace split: up to '#' if present, else drop the last
    '/'-segment (/root/reference/src/dataset_preparation.py:48-55)."""
    return F.when(
        uri.contains("#"), F.substring_index(uri, "#", 1)
    ).otherwise(F.regexp_replace(uri, "/[^/]*$", ""))


def local_name_of(uri: Column) -> Column:
    """C2 — local name: after '#' if present else after last '/'
    (/root/reference/src/preprocessing.py:235-249)."""
    return F.substring_index(F.substring_index(uri, "#", -1), "/", -1)


def host_of(url: Column) -> Column:
    """C4 — host component of an http(s) URL."""
    return F.substring_index(F.substring_index(url, "/", 3), "/", -1)


def tld_of(url: Column) -> Column:
    """C4/Q5 — last dot-segment of the host
    (/root/reference/src/dataset_preparation.py:189-199)."""
    return F.substring_index(host_of(url), ".", -1)


def analyze_uri(uri: Column) -> Column:
    """C3 — struct(namespace, local_name, tld) in one pass
    (/root/reference/src/preprocessing.py:147-165 does three regex
    searches per URI; here three codegen'd extracts in one projection)."""
    return F.struct(
        namespace_of(uri).alias("namespace"),
        local_name_of(uri).alias("local_name"),
        tld_of(uri).alias("tld"),
    )


def is_uri_strict(s: Column) -> Column:
    return s.rlike(IS_URI_STRICT)


def is_uri_loose(s: Column) -> Column:
    return s.rlike(IS_URI_LOOSE)


def clean_text(s: Column) -> Column:
    """C7 — strip bracket characters, collapse whitespace
    (/root/reference/src/pipeline_build.py:354-360)."""
    return F.trim(F.regexp_replace(F.regexp_replace(s, r"[\[\]\(\)\{\}]", " "), r"\s+", " "))


def normalize_label(s: Column) -> Column:
    """C9 — label normalization: lowercase, strip quotes/punctuation
    (/root/reference/src/pipeline_gemma.py:16-22)."""
    return F.trim(F.regexp_replace(F.lower(s), r"""["'`.,;:!?]+""", ""))


def parse_list_string(s: Column) -> Column:
    """C10 — permissive parse of a string-serialized list: JSON first,
    fall back to wrapping the raw string as a 1-element array
    (/root/reference/src/pipeline_build.py:362-396)."""
    parsed = F.from_json(s, "array<string>")
    return F.coalesce(parsed, F.array(s))


def flatten_stringify(arr: Column) -> Column:
    """C11 — flatten nested string arrays and drop empties
    (/root/reference/src/generate_profile.py:131-154)."""
    return F.filter(F.flatten(arr), lambda x: x != "")


def space_join(arr: Column) -> Column:
    """C12 — space-join a list (/root/reference/src/preprocessing.py:168-175)."""
    return F.array_join(arr, " ")


def sha256_of(s: Column) -> Column:
    """C13 — sha256 hex of a column (/root/reference/src/util.py:104,123)."""
    return F.sha2(s, 256)


def mint_entity_iri(base: str, norm: Column) -> Column:
    """C14 — deterministic IRI mint: base + sha256(norm). Replaces the
    reference's URL-encode mint (/root/reference/src/generate_profile.py:226-237)
    with a collision-resistant, encoding-free form."""
    return F.concat(F.lit(base), F.sha2(norm, 256))


def first_valid_uri(arr: Column) -> Column:
    """O4 — first URI-ish element, else first non-empty element, else null
    (/root/reference/src/generate_profile.py:157-182)."""
    uris = F.filter(arr, lambda x: x.rlike(IS_URI_STRICT))
    nonempty = F.filter(arr, lambda x: x != "")
    return F.coalesce(F.try_element_at(uris, F.lit(1)), F.try_element_at(nonempty, F.lit(1)))
