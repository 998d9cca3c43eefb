#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/r14/.

Usage: python scripts/r14_capture_plan.py <suffix> <short> [<short> ...]
Writes plans/r14/<short>_<suffix>.txt for each query short id.

Plan construction only — no actions are triggered for pure-DAG
queries. Queries whose builders run eager jobs (l23's CC probe
counts, build-once table builds) will execute those; run on a quiet
box when timing matters elsewhere.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    shorts = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from graal_cdc_spark.session import get_spark

    spark = get_spark(app_name="r14-plan-capture", master="local[4]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    from graal_cdc_spark.queries import all_specs

    os.makedirs("plans/r14", exist_ok=True)
    for name, spec in all_specs().items():
        short = name.split("_")[0]
        if short not in shorts:
            continue
        df = spec.spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"plans/r14/{short}_{suffix}.txt"
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
