#!/usr/bin/env python
"""Round-14 in-session interleaved A/B experiments.

Each experiment alternates variants within ONE session (the r13
variance rule: cross-run deltas on this box are weather, same-session
interleaved medians are signal). Noop sink, labelled jobs.

Usage: python scripts/r14_experiments2.py <exp> [args]
  aqe <short> [<short>...]   -- per-query AQE on/off alternation
  l23jobs                    -- job/round census of l23's CC loop
  r79                        -- old-vs-new edge-build cold shape
"""

from __future__ import annotations

import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from graal_cdc_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r14-exp", master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def exp_aqe(shorts: list[str]) -> None:
    spark = _spark()
    from graal_cdc_spark.queries import all_specs
    from graal_cdc_spark.sources.tables import reblock_sf_dir

    sf_dir = reblock_sf_dir(spark, SF_DIR)
    specs = {n.split("_")[0]: s for n, s in all_specs().items()}
    for short in shorts:
        spec = specs[short]
        # cold once (untimed here) to compile plans under current conf
        _noop(spec.spark(spark, sf_dir))
        res = {"on": [], "off": []}
        for _ in range(5):
            for mode in ("on", "off"):
                spark.conf.set(
                    "spark.sql.adaptive.enabled",
                    "true" if mode == "on" else "false",
                )
                spark.sparkContext.setJobDescription(f"{short} aqe={mode}")
                t0 = time.time()
                _noop(spec.spark(spark, sf_dir))
                res[mode].append(time.time() - t0)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        print(
            f"{short}: aqe_on med {median(res['on']):.3f}s "
            f"aqe_off med {median(res['off']):.3f}s "
            f"(on {['%.2f' % x for x in res['on']]} "
            f"off {['%.2f' % x for x in res['off']]})",
            flush=True,
        )
    spark.stop()


def exp_l23jobs() -> None:
    spark = _spark()
    from graal_cdc_spark.queries import all_specs
    from graal_cdc_spark.sources.tables import reblock_sf_dir

    sf_dir = reblock_sf_dir(spark, SF_DIR)
    spec = all_specs()["l23_lsh_components"]
    sc = spark.sparkContext
    # warm once (builds the LSH memo)
    _noop(spec.spark(spark, sf_dir))
    tracker = sc.statusTracker()
    for rep in range(3):
        before = tracker.getJobIdsForGroup(None)
        t0 = time.time()
        df = spec.spark(spark, sf_dir)
        t1 = time.time()
        _noop(df)
        t2 = time.time()
        print(
            f"l23 warm rep{rep}: construct {t1-t0:.2f}s (eager CC jobs) "
            f"+ noop {t2-t1:.2f}s = {t2-t0:.2f}s",
            flush=True,
        )
    spark.stop()


def exp_r79() -> None:
    # old-vs-new EDGE BUILD, interleaved in one session: materialize
    # each shape with a noop sink (the memo is bypassed — we build the
    # frames directly).
    from pyspark.sql import functions as F

    spark = _spark()
    from graal_cdc_spark.sources.tables import load_table, reblock_sf_dir

    sf_dir = reblock_sf_dir(spark, SF_DIR)

    def raw_pairs():
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        return (
            orders.select("o_orderkey", "o_custkey")
            .join(li.select("l_orderkey", "l_suppkey"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .select(
                (F.col("o_custkey") * 2).alias("a"),
                (F.col("l_suppkey") * 2 + 1).alias("b"),
            )
        )

    def old_edges():
        pairs = raw_pairs().distinct()
        return pairs.unionByName(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).repartition("a")

    def new_edges():
        return (
            raw_pairs()
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("a"), F.col("b")),
                        F.struct(
                            F.col("b").alias("a"), F.col("a").alias("b")
                        ),
                    )
                ).alias("__e")
            )
            .select("__e.a", "__e.b")
            .repartition("a")
            .dropDuplicates(["a", "b"])
        )

    # codegen warm for both shapes
    _noop(old_edges())
    _noop(new_edges())
    res = {"old": [], "new": []}
    for rep in range(5):
        for mode, build in (("old", old_edges), ("new", new_edges)):
            spark.sparkContext.setJobDescription(f"r79 edges {mode} rep{rep}")
            t0 = time.time()
            _noop(build())
            res[mode].append(time.time() - t0)
    print(
        f"r79 edge-build old med {median(res['old']):.3f}s "
        f"new med {median(res['new']):.3f}s "
        f"(old {['%.2f' % x for x in res['old']]} "
        f"new {['%.2f' % x for x in res['new']]})",
        flush=True,
    )
    n_old = old_edges().count()
    n_new = new_edges().count()
    print(f"edge counts old {n_old} new {n_new}", flush=True)
    spark.stop()


if __name__ == "__main__":
    exp = sys.argv[1]
    if exp == "aqe":
        exp_aqe(sys.argv[2:])
    elif exp == "l23jobs":
        exp_l23jobs()
    elif exp == "r79":
        exp_r79()
    else:
        raise SystemExit(f"unknown experiment {exp}")
