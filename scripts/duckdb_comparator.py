#!/usr/bin/env python
"""DuckDB baseline comparator — times every oracle SQL at a scale
factor so the suite-level engine comparison (BENCH_r{N} vs this) is
measured on THIS machine against the CURRENT oracle inventory, not a
stale snapshot.

Writes DUCKDB_BASELINE.json next to the repo root and prints one JSON
line: {"metric": "duckdb_oracle_suite", "value": sec, "sf": ...,
"n_queries": N, "slowest": {...top 15...}}.

Usage: python scripts/duckdb_comparator.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None  # cosmetic metadata; never abort the baseline run

    from graal_cdc_spark.queries import all_specs
    from graal_cdc_spark.testing import duckdb_connect

    specs = {n: s for n, s in all_specs().items() if s.oracle is not None}
    con = duckdb_connect(sf_dir)
    timings: dict[str, float] = {}
    t_suite = time.time()
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        con.execute(spec.oracle).fetchall()
        timings[name] = round(time.time() - t0, 3)
        print(f"{name}: {timings[name]:.2f}s", file=sys.stderr)
    total = round(time.time() - t_suite, 3)
    con.close()

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DUCKDB_BASELINE.json",
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "metric": "duckdb_oracle_suite",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "queries": timings,
            },
            f,
            indent=1,
        )
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:15])
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_suite",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "slowest": slowest,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
