#!/usr/bin/env python
"""Isolate per-query timing + formatted plans (optimization round r13).

Runs the named queries at sf0.1 with the noop sink (guide §1.4),
labels each job (§1.5), records cold + N warm samples, and writes
``.explain("formatted")`` to plans/r13/<short>_<tag>.txt.

Usage:
  python scripts/profile_queries.py [--tag before] [--reps 5] q1 q2 ...
  (no names: the standing tail list)

The session mirrors bench.py exactly (get_spark, re-blocked scan copy,
shuffle=8, same warmups) so numbers are comparable to BENCH_FULL.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAIL = [
    "l02_shingle_jaccard_neardup",
    "l23_lsh_components",
    "l07_simhash_neardup",
    "l57_minhash_accuracy_audit",
    "l94_containment_census",
    "l95_containment_probe",
    "l25_decontamination",
    "l52_eval_overlap_rate",
    "l82_simhash_portable",
    "l68_winnowing_fingerprints",
    "r79_pagerank_quantized",
    "r47_python_udtf",
    "l62_embedding_norm_outliers",
    "l93_quantile_sketch_audit",
    "l33_ann_ivf_trained",
    "l06_minhash_lsh_candidates",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()
    names = args.names or TAIL

    from graal_cdc_spark.queries import all_specs
    from graal_cdc_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8"))
    spark = get_spark(
        app_name="graal-cdc-spark-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    from graal_cdc_spark.sources.tables import reblock_sf_dir

    sf_dir = reblock_sf_dir(spark, sf_dir)

    # same warmups as bench.py
    specs["r14_global_topk"].spark(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    specs["c06_latest_by_key_compaction"].spark(spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()
    import pandas as _pd

    def _py_warm(it):
        import numpy as _np  # noqa: F401

        for p in it:
            yield _pd.DataFrame({"x": [len(p)]})

    spark.range(32).repartition(32).mapInPandas(_py_warm, "x long").write.mode(
        "overwrite"
    ).format("noop").save()
    from graal_cdc_spark.operators.clustering import train_centroids
    from graal_cdc_spark.operators.pq import train_pq_codebooks
    from graal_cdc_spark.sources.tables import load_table, with_min_parallelism

    emb_plain = load_table(spark, sf_dir, "embeddings")
    emb_par = with_min_parallelism(spark, emb_plain)
    train_centroids(emb_plain, k=8, iters=2, scale=10_000)
    train_centroids(emb_par, k=32, iters=1, scale=10_000)
    train_pq_codebooks(emb_plain, m=4, k=8, iters=1, scale=10_000)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        spec = specs[name]
        short = name.split("_", 1)[0]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        samples = []
        cold = None
        for i in range(args.reps + 1):
            t0 = time.time()
            df = spec.spark(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            if i == 0:
                cold = dt
            else:
                samples.append(dt)
        if not args.no_plans:
            plan = (
                spec.spark(spark, sf_dir)
                ._jdf.queryExecution()
                .explainString("formatted")
            )
            with open(
                os.path.join(plans_dir, f"{short}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
        out[name] = {
            "cold": cold,
            "warm": samples,
            "warm_med": round(statistics.median(samples), 3) if samples else None,
            "warm_min": round(min(samples), 3) if samples else None,
        }
        print(
            f"{name}: cold={cold} warm_med={out[name]['warm_med']} "
            f"warm_min={out[name]['warm_min']} warm={samples}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
