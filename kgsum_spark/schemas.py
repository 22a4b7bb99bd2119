"""Explicit StructTypes for every table in the pipeline.

The reference's schema system is implicit/dynamic (pandas inference;
column-name lists at /root/reference/src/dataset_preparation.py:565-580).
We fix every schema explicitly: strings at the edges, an `obj_is_iri`
boolean carrying the only type tag the reference ever uses (SPARQL
uri-vs-literal bindings, /root/reference/src/dataset_preparation_remote.py:41,165),
and ArrayType(StringType) for the ragged list-valued profile features.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary input (BASELINE.json input_hint): Iceberg/parquet transcript table.
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Extraction output — the analog of kgsum's profile triples
# (/root/reference/src/generate_profile.py:240-284).
RAW_TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),   # surface form pre-canonicalization
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_is_iri", T.BooleanType(), False),
        T.StructField("obj_is_mention", T.BooleanType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
    ]
)

# Canonical triples: subj/obj are canonical entity ids where applicable.
TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_is_iri", T.BooleanType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("part_id", T.IntegerType(), True),  # lineage: extracting partition
    ]
)

# Entity-linking input (FIXTURES.md §3).
MENTIONS = T.StructType(
    [
        T.StructField("mention", T.StringType(), False),
        T.StructField("norm", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("block_key", T.StringType(), False),
    ]
)

# Canonicalization output: norm → canonical entity id.
ENTITIES = T.StructType(
    [
        T.StructField("norm", T.StringType(), False),
        T.StructField("canonical_id", T.StringType(), False),
    ]
)

# sameAs / similarity edge set (analog of select_local_con,
# /root/reference/src/dataset_preparation.py:354-368).
EDGES = T.StructType(
    [
        T.StructField("a", T.StringType(), False),
        T.StructField("b", T.StringType(), False),
    ]
)

# Closed predicate vocabulary, mirroring kgsum's emitted vocabulary
# (/root/reference/src/generate_profile.py:240-284,313,319,343).
PRED_TYPE = "rdf:type"
PRED_CREATOR = "dcterms:creator"
PRED_TITLE = "dcterms:title"
PRED_DESCRIPTION = "dcterms:description"
PRED_LICENSE = "dcterms:license"
PRED_SUBJECT = "dcterms:subject"
PRED_IDENTIFIER = "dcterms:identifier"
PRED_SAMEAS = "owl:sameAs"
PRED_VOCABULARY = "void:vocabulary"
PRED_KEYWORD = "dcat:keyword"
PRED_THEME = "dcat:theme"

PREDICATES = [
    PRED_TYPE,
    PRED_CREATOR,
    PRED_TITLE,
    PRED_DESCRIPTION,
    PRED_LICENSE,
    PRED_SUBJECT,
    PRED_IDENTIFIER,
    PRED_SAMEAS,
    PRED_VOCABULARY,
    PRED_KEYWORD,
    PRED_THEME,
]
