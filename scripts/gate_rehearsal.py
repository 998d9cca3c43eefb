#!/usr/bin/env python
"""Full correctness-gate rehearsal: every oracle-gated query compared
against its DuckDB twin at the gate scale factor, under a driver-like
plain session (non-UTC timezone, no engine confs — the engine must
self-configure). Prints one line per failure and a final summary.

Usage: python scripts/gate_rehearsal.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("gate-rehearsal")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from graal_cdc_spark.queries import all_specs
    from graal_cdc_spark.testing import compare_query

    specs = {n: s for n, s in all_specs().items() if s.oracle is not None}
    t0 = time.time()
    failures = []
    for i, (name, spec) in enumerate(specs.items(), 1):
        try:
            compare_query(spark, spec, sf_dir)
        except Exception as ex:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"FAIL {name}: {type(ex).__name__} {str(ex)[:300]}",
                  flush=True)
        if i % 25 == 0:
            print(f"... {i}/{len(specs)} ({time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
    print(
        f"rehearsal: {len(specs)} oracle specs, failures={len(failures)} "
        f"{failures} in {time.time() - t0:.1f}s @ {sf_dir}"
    )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
