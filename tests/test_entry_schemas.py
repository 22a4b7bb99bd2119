"""Guard: no __spark_entry__.queries() output may contain a container-typed
column. The driver's correctness harness canonicalizes results with pandas
``sort_values`` + row hashing, which throws ``unhashable type: 'list'`` on
array/map/struct cells (round-2 red row f7_scrub_empty_lists). Every query
must serialize containers at its boundary (``F.array_join`` / ``to_json``)
mirrored in the DuckDB oracle (``array_to_string``).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _container_cols(schema: StructType) -> list[str]:
    return [
        f.name for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def test_queries_and_oracles_paired():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    missing = sorted(set(oracles) - set(qs))
    assert not missing, f"oracle_sql() keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_no_container_typed_output(spark, name):
    fn = entry_mod.queries()[name]
    # .schema triggers analysis only (no job) for lazily-planned queries;
    # a few probes (q16_liveness etc.) run tiny actions — fine at sf0.001.
    df = fn(spark, SF_DIR)
    bad = _container_cols(df.schema)
    assert not bad, (
        f"{name} emits container-typed column(s) {bad}; serialize with "
        "array_join/to_json on BOTH engines (see a3_set_union)"
    )
