#!/usr/bin/env python
"""DuckDB baseline comparator — standalone CLI wrapper.

The actual suite logic lives in ``graal_cdc_spark/benchset.py`` so the
query set is SHARED with ``bench.py`` (one skip list, both engines) —
and ``bench.py`` itself runs the DuckDB pass in the same process right
after the Spark pass, emitting both artifacts under identical machine
conditions. This wrapper exists for running the DuckDB side alone.

Writes DUCKDB_BASELINE.json next to the repo root and prints one JSON
line: {"metric": "duckdb_oracle_suite", "value": sec, "sf": ...,
"n_queries": N, "slowest": {...top 15...}}.

Usage: python scripts/duckdb_comparator.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from graal_cdc_spark.benchset import run_duckdb_oracle_suite

    art = run_duckdb_oracle_suite(
        sf_dir, progress=lambda s: print(s, file=sys.stderr)
    )

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DUCKDB_BASELINE.json",
    )
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    slowest = dict(sorted(art["queries"].items(), key=lambda kv: -kv[1])[:15])
    headline = {
        k: v for k, v in art.items()
        if k not in ("queries", "warm_queries")
    }
    headline["slowest"] = slowest
    headline.pop("skipped", None)
    headline.pop("spark_only", None)
    print(json.dumps(headline, separators=(",", ":")))


if __name__ == "__main__":
    main()
