#!/usr/bin/env python
"""Round-14 isolation experiments (guide §1: measure first).

Interleaved A/B harness: every variant of a target runs in the SAME
session, alternating round-robin across variants x REPS, and medians
are compared — the only readout this box's VM noise respects
(memory: r13 lesson). Targets are the VERDICT r13 queue: r93 / mm11
python-stage fan-out, l90 partition-count re-measure, r99 bucketed
write fan-out, l23 CC probe cadence.

Usage: python scripts/r14_experiments.py [target ...]
Targets: mm11 r93 l90 r99 l23  (default: all)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graal_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("R14_REPS", "5"))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def interleave(spark, variants: dict, reps: int = REPS):
    """variants: name -> zero-arg callable that builds AND runs."""
    samples = {k: [] for k in variants}
    # one untimed warm pass each (codegen)
    for k, fn in variants.items():
        spark.sparkContext.setJobDescription(f"warm:{k}")
        fn()
    for r in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"rep{r}:{k}")
            samples[k].append(timed(fn))
    for k, vals in samples.items():
        print(
            f"  {k}: med={statistics.median(vals):.3f} "
            f"min={min(vals):.3f} samples={vals}"
        )
    return samples


def main() -> None:
    targets = sys.argv[1:] or ["mm11", "r93", "l90", "r99", "l23"]
    spark = get_spark(
        app_name="r14-experiments",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    from graal_cdc_spark.sources.tables import load_table, reblock_sf_dir

    sf_dir = reblock_sf_dir(spark, SF_DIR)
    print(f"reblocked: {sf_dir}", file=sys.stderr)

    # python-worker warm pool (same as bench.py priming)
    import pandas as _pd

    def _py_warm(it):
        import numpy as _np  # noqa: F401

        for p in it:
            yield _pd.DataFrame({"x": [len(p)]})

    spark.range(32).repartition(32).mapInPandas(_py_warm, "x long").write.mode(
        "overwrite"
    ).format("noop").save()

    if "mm11" in targets:
        print("== mm11: python codec census fan-out ==")
        from graal_cdc_spark.operators.multimodal import png_pipeline_stats
        from graal_cdc_spark.sources.tables import ordered_result

        def mk(n_part):
            def run():
                docs = load_table(spark, sf_dir, "documents").filter(
                    (F.length("text") > 0) & (F.col("doc_id") % 3 == 1)
                )
                if n_part:
                    docs = docs.repartition(n_part)
                noop(ordered_result(png_pipeline_stats(docs), "media_id"))

            return run

        interleave(
            spark,
            {
                "scan(plain)": mk(0),
                "rep2": mk(2),
                "rep4": mk(4),
                "rep8": mk(8),
                "rep32": mk(32),
            },
        )

    if "r93" in targets:
        print("== r93: pre-pandas exchange width ==")
        from graal_cdc_spark.operators.ledger import capped_running_balance
        from graal_cdc_spark.sources.tables import ordered_result
        import graal_cdc_spark.operators.ledger as ledger_mod

        def ev_frame():
            return load_table(spark, sf_dir, "events").select(
                "user_id",
                F.unix_micros("ts").alias("s"),
                "event_id",
                (
                    F.floor(F.col("value") * 100).cast("long")
                    * F.when(
                        F.col("event_type").isin("purchase", "error"), -1
                    ).otherwise(1)
                ).alias("amt"),
            )

        def mk(n_par):
            import pandas as pd

            def run():
                ev = ev_frame()
                cols = ["user_id", "s", "event_id", "amt"]
                cap = 50_000

                def _scan(pdf):
                    pdf = pdf.sort_values(["s", "event_id"])
                    bal = n_capped = n_floored = 0
                    for amt in pdf["amt"].to_numpy():
                        bal += int(amt)
                        if bal > cap:
                            bal, n_capped = cap, n_capped + 1
                        elif bal < 0:
                            bal, n_floored = 0, n_floored + 1
                    return pd.DataFrame(
                        {
                            "user_id": [pdf["user_id"].iloc[0]],
                            "final_balance": [bal],
                            "n_capped": [n_capped],
                            "n_floored": [n_floored],
                        }
                    )

                out = (
                    ev.select(*cols)
                    .repartition(n_par, "user_id")
                    .groupBy("user_id")
                    .applyInPandas(
                        _scan,
                        "user_id bigint, final_balance bigint, "
                        "n_capped bigint, n_floored bigint",
                    )
                )
                noop(ordered_result(out, "user_id"))

            return run

        interleave(
            spark, {"rep2": mk(2), "rep4": mk(4), "rep8": mk(8), "rep32": mk(32)}
        )

    if "l90" in targets:
        print("== l90: heavy-hitters scan width ==")
        from graal_cdc_spark.operators.sketch import (
            heavy_hitters_exact_chargrams,
        )
        from graal_cdc_spark.sources.tables import ordered_result

        def mk(n_part):
            def run():
                docs = load_table(spark, sf_dir, "documents").filter(
                    F.length("text") >= 3
                )
                if n_part:
                    docs = docs.repartition(n_part)
                total = docs.agg(
                    F.sum(F.length("text") - 2).cast("long").alias("n_total")
                )
                noop(
                    ordered_result(
                        heavy_hitters_exact_chargrams(docs, "text", 3, 60, total),
                        F.desc("cnt"),
                        "token",
                    )
                )

            return run

        interleave(
            spark,
            {"scan(plain)": mk(0), "rep2": mk(2), "rep4": mk(4), "rep8": mk(8)},
        )

    if "r99" in targets:
        print("== r99: bucketed table build fan-out ==")
        import tempfile

        def build(tag, pre_repartition):
            def run():
                db = f"r99x_{tag}_{int(time.time() * 1000) % 10_000_000}"
                loc = tempfile.mkdtemp(prefix="r99-exp-")
                spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
                o = load_table(spark, sf_dir, "orders").select(
                    "o_orderkey", "o_orderpriority"
                )
                l = load_table(spark, sf_dir, "lineitem").select(
                    F.col("l_orderkey").alias("o_orderkey"),
                    F.col("l_quantity").cast("long").alias("qty"),
                    (F.floor(F.col("l_extendedprice") * 100))
                    .cast("long")
                    .alias("price_cents"),
                )
                if pre_repartition:
                    o = o.repartition(8, "o_orderkey")
                    l = l.repartition(8, "o_orderkey")
                o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
                    "overwrite"
                ).saveAsTable(f"{db}.orders_b")
                l.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
                    "overwrite"
                ).saveAsTable(f"{db}.lineitem_b")
                # count bucket files
                import glob

                nf = len(glob.glob(f"{loc}/*/part-*"))
                spark.sql(f"DROP DATABASE {db} CASCADE")
                print(f"    [{tag}] files={nf}")

            return run

        interleave(
            spark,
            {"as-is": build("a", False), "rep8key": build("b", True)},
            reps=3,
        )

    if "l23" in targets:
        print("== l23: CC construction cost / round count ==")
        import graal_cdc_spark.operators.dedup as D
        from graal_cdc_spark.sources.tables import (
            ordered_result,
            with_min_parallelism,
        )

        # instrument: count jobs via a wrapper on DataFrame.count
        def run_l23():
            docs = with_min_parallelism(
                spark, load_table(spark, sf_dir, "documents")
            )
            pairs = D.lsh_component_edges(docs, "doc_id", "text")
            t0 = time.time()
            cc = D.connected_components(pairs)
            t_build = time.time() - t0
            out = ordered_result(
                cc.select(
                    F.col("node").alias("doc_id"),
                    "component",
                    F.when(F.col("node") == F.col("component"), 1)
                    .otherwise(0)
                    .alias("is_canonical"),
                ),
                "doc_id",
            )
            t1 = time.time()
            noop(out)
            print(
                f"    cc-build={t_build:.3f}s exec={time.time() - t1:.3f}s"
            )

        for _ in range(3):
            run_l23()

    spark.stop()


if __name__ == "__main__":
    main()
