#!/usr/bin/env python
"""Dump .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/dump_plans.py <out_dir> <suffix> q1,q2,...

Writes <out_dir>/<query>_<suffix>.txt for each query. The plan is the
pre-execution formatted physical plan (AdaptiveSparkPlan isFinalPlan=false)
at $SPARK_GRAFT_SF_DIR (default sf0.1) — the same artifact the r06
_before files captured.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from kgsum_spark.session import build_session  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump_plans", cores=cpus, shuffle_partitions=cpus)
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
        from kgsum_spark.datapipe._util import unpersist_tracked

        unpersist_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
