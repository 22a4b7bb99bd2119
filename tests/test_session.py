"""Session-builder conf pins (settings with measured rationale)."""

from __future__ import annotations


def test_codegen_cache_sized_to_plan_working_set(spark):
    """The whole-stage-codegen class cache must hold the app's plan
    working set (~400 generated classes for the bench suite; default 100
    thrashes — ~400 Janino recompilations per bench pass, measured via
    CodegenMetrics in OPTIMIZATION_r06.md #9)."""
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 4096
