"""Operator library: the reference's relational surface (SURVEY.md §2)
re-expressed as reusable Spark column expressions and DataFrame functions.

Everything here is pure built-in `pyspark.sql.functions` — JVM-side,
whole-stage-codegen'd, no Python in the hot path.
"""
