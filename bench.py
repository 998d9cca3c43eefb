#!/usr/bin/env python
"""Benchmark harness — runs the engine's query suite at a scale factor.

Prints ONE JSON line:
  {"metric": "...", "value": <suite seconds>, "unit": "sec",
   "sf": <sf>, "n_queries": N, "queries": {"<id>": sec, ...40 slowest},
   "other_queries_total": sec, "skipped": [...],
   "duckdb_matched_sec": sec, "suite_ratio_matched": x,
   "spark_warm_matched_sec": sec, "suite_ratio_warm": x}

Protocol: ONE query set for both engines (graal_cdc_spark/benchset.py)
— the DuckDB comparator runs in this same process right after the
Spark pass, so both artifacts land under identical machine conditions.
Every query is timed COLD (headline: includes per-plan Catalyst +
codegen compile, ~0.3-1.5 s/query) and WARM (immediate re-run —
marginal execution cost, the number that predicts cluster throughput;
the compile constant amortizes to nothing over 100 TB). Same
cold+warm protocol on the DuckDB side.

The "queries" keys are the short query ids — the prefix of the full
query name before the first underscore ("r01" for
"r01_scan_filter_project"); ids are unique across the suite and match
CORRECTNESS_r{N}.json / BASELINE.md one-to-one. The driver captures
only the LAST 2000 chars of stdout and a truncated JSON line is
unparseable (that is what happened to BENCH_r02.json); at 215
queries even short-id timings are ~2.6 kB, so stdout carries the 40
slowest queries plus the residual total, and the COMPLETE full-name
per-query breakdown is written to ``BENCH_FULL.json`` next to this
script after every run.

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)

Query set: every oracle-gated query except the deliberately quadratic
exact shingle-Jaccard (l02 — its pair join materializes ~1.5e9 rows at
sf0.1 by construction; the scale path for near-dup is MinHash-LSH,
which IS benched as l06), plus the scale-path rows-only operators
(l06/l07/l12, mm02/mm03).

Results are materialized with the noop sink — full execution, no
driver-side collect cost.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from graal_cdc_spark.queries import all_specs
    from graal_cdc_spark.session import get_spark

    spark = get_spark(
        app_name="graal-cdc-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_specs()
    # ONE query set for both engines (graal_cdc_spark/benchset.py):
    # the skip list is shared with the DuckDB comparator, and the
    # DuckDB pass runs below IN THIS SAME PROCESS right after the
    # Spark pass, so BENCH_FULL.json and DUCKDB_BASELINE.json are
    # recorded under identical machine conditions by construction
    # (VERDICT r7 "What's wrong" #2).
    from graal_cdc_spark.benchset import (
        BENCH_SKIP as skip,
        bench_names,
        run_duckdb_oracle_suite,
    )

    names = bench_names(specs)

    t_prime = time.time()
    # Warmup (untimed per-query, but REPORTED as priming_sec): first-query
    # JVM/codegen spin-up, the
    # envelope-synthesis codegen path, and the Python worker pool
    # (first pandas/mapInPandas query otherwise pays ~4 s of
    # interpreter+numpy startup across 32 workers). c06 warms BOTH
    # envelope fixtures (raw + parsed-persisted) — previously c02
    # warmed only the raw one and the first parsed-envelope query
    # (c03) absorbed the one-time fixture materialization (~2 s).
    specs["r14_global_topk"].spark(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    specs["c06_latest_by_key_compaction"].spark(spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()
    import pandas as _pd

    def _py_warm(it):
        # pay the heavy imports in every worker, not just the driver:
        # the first real pandas-UDF query otherwise absorbs the
        # per-worker numpy/pandas interpreter start (~3 s across 32
        # workers in the round-5 driver run, booked against mm02)
        import numpy as _np  # noqa: F401

        for p in it:
            yield _pd.DataFrame({"x": [len(p)]})

    spark.range(32).repartition(32).mapInPandas(
        _py_warm, "x long"
    ).write.mode("overwrite").format("noop").save()

    # Centroid-table priming (not timed): trained centroids are
    # build-once index artifacts shared by the k-means family (l31/
    # l32/l33 at k=8 x 2 rounds; l75/l77 at k=32 x 1 round) through
    # the session memo in operators/clustering.py — the same
    # amortization a cluster deployment gets by training the index
    # once and serving many queries. Priming both keys here removes
    # the one-time training cost from whichever family member the
    # suite order happens to hit first.
    from graal_cdc_spark.operators.clustering import train_centroids
    from graal_cdc_spark.sources.tables import (
        load_table,
        with_min_parallelism,
    )

    emb_plain = load_table(spark, sf_dir, "embeddings")
    emb_par = with_min_parallelism(spark, emb_plain)
    train_centroids(emb_plain, k=8, iters=2, scale=10_000)
    train_centroids(emb_par, k=32, iters=1, scale=10_000)
    # PQ codebooks (l78) ride the same build-once contract: m tiny
    # trainings memoized per (slice, k, iters) by train_centroids.
    from graal_cdc_spark.operators.pq import train_pq_codebooks

    train_pq_codebooks(emb_plain, m=4, k=8, iters=1, scale=10_000)
    # The warmup + index-training cost is a real cold-start cost; it is
    # excluded from per-query timings under the build-once assumption
    # but reported so the engine comparison can be read either way
    # (DUCKDB_BASELINE.json symmetrically reports kmeans_training /
    # value_build_once — ADVICE r6 #1).
    priming_sec = round(time.time() - t_prime, 3)

    # Each query is timed COLD (first run: Catalyst analysis + Janino
    # whole-stage-codegen compilation + execution) and then WARM
    # (immediate re-run: the compiled classes are still in the codegen
    # cache, so this is the marginal execution cost). The headline
    # stays COLD; the warm suite is the disclosed secondary reading —
    # the per-plan compile constant (~0.3-1.5 s/query) is ~60% of the
    # cold suite at sf0.1 but amortizes to noise over 100 TB, so the
    # warm number is what predicts cluster throughput. The DuckDB
    # comparator below runs the SAME cold+warm protocol, so both
    # readings stay like-for-like. Warm re-runs come right after their
    # cold run (not as a second full pass) because the codegen cache
    # holds ~100 entries — a 224-query round trip would evict them
    # and re-measure compilation, not execution. Disable with
    # SPARK_GRAFT_BENCH_WARM=0.
    do_warm = os.environ.get("SPARK_GRAFT_BENCH_WARM", "1") != "0"
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    t_suite = time.time()
    for name in names:
        t0 = time.time()
        df = specs[name].spark(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"{name}: {timings[name]:.2f}s", file=sys.stderr)
        if do_warm:
            t0 = time.time()
            specs[name].spark(spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            warm[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    warm_total = round(sum(warm.values()), 3) if warm else None
    wall = round(time.time() - t_suite, 3)

    # DuckDB comparator pass — same process, same query set, same
    # machine conditions. The engine ratio is computed over the
    # matched set (benched queries that HAVE an oracle); Spark-only
    # rows-only queries are excluded from the ratio and listed in the
    # comparator artifact as spark_only.
    duck = None
    try:
        duck = run_duckdb_oracle_suite(
            sf_dir, specs, progress=lambda s: print(s, file=sys.stderr)
        )
        duck_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "DUCKDB_BASELINE.json"
        )
        with open(duck_path, "w") as f:
            json.dump(duck, f, indent=1)
    except Exception as exc:  # bench must still emit the Spark line
        print(f"duckdb comparator failed: {exc!r}", file=sys.stderr)

    ratio = None
    warm_ratio = None
    spark_matched_sec = None
    warm_matched_sec = None
    if duck is not None:
        matched = set(duck["queries"])
        spark_matched_sec = round(
            sum(t for n, t in timings.items() if n in matched), 3
        )
        if duck["value"] > 0:
            ratio = round(spark_matched_sec / duck["value"], 2)
        if warm and duck.get("warm_value"):
            warm_matched_sec = round(
                sum(t for n, t in warm.items() if n in matched), 3
            )
            warm_ratio = round(warm_matched_sec / duck["warm_value"], 2)

    full = {
        "metric": "suite_wall_clock",
        # value = sum of per-query COLD timings — numerically the
        # same thing prior rounds' cold-only loop wall-clock measured
        # (loop overhead was <0.1%); the warm pass interleaves, so the
        # raw wall including warm re-runs is reported as wall_sec
        "value": total,
        "unit": "sec",
        "queries": timings,
        "warm_queries": warm,
        "warm_value": warm_total,
        "wall_sec": wall,
        "sf": float(sf),
        "priming_sec": priming_sec,
        "skipped": skip,
        "duckdb_matched_sec": duck["value"] if duck else None,
        "duckdb_warm_matched_sec": duck.get("warm_value") if duck else None,
        "spark_matched_sec": spark_matched_sec,
        "spark_warm_matched_sec": warm_matched_sec,
        "suite_ratio_matched": ratio,
        "suite_ratio_warm": warm_ratio,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    try:
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass

    # The driver captures only the LAST 2000 chars of stdout, and a
    # truncated JSON line is unparseable (that is what happened to
    # BENCH_r02). At 215 queries even short-id per-query timings are
    # ~2.6 kB, so stdout carries the headline + the top-40 slowest
    # queries (short ids) + the residual as one number; the complete
    # per-query breakdown is always in BENCH_FULL.json.
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:40]
    short = {name.split("_", 1)[0]: t for name, t in slowest}
    rest = round(total - sum(t for _, t in slowest), 3)
    print(
        json.dumps(
            {
                "metric": full["metric"],
                "value": total,
                "unit": "sec",
                "sf": full["sf"],
                "n_queries": len(timings),
                "priming_sec": priming_sec,
                "queries": short,
                "other_queries_total": rest,
                "skipped": sorted(n.split("_", 1)[0] for n in skip),
                "duckdb_matched_sec": duck["value"] if duck else None,
                "duckdb_warm_matched_sec": (
                    duck.get("warm_value") if duck else None
                ),
                "spark_matched_sec": spark_matched_sec,
                "spark_warm_matched_sec": warm_matched_sec,
                "suite_ratio_matched": ratio,
                "suite_ratio_warm": warm_ratio,
                "full_breakdown": "BENCH_FULL.json",
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
