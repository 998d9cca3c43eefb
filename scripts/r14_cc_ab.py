#!/usr/bin/env python
"""Interleaved A/B: old connected_components (lazy localCheckpoint
sym) vs new (persist sym hash-partitioned by dst), on l23's real LSH
edge set at the bench scale factor."""

from __future__ import annotations

import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_cc(edges, a_col="doc_a", b_col="doc_b", max_iter=30):
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    return _loop(sym, max_iter, None)


def new_cc(edges, a_col="doc_a", b_col="doc_b", max_iter=30):
    spark = edges.sparkSession
    n_par = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .repartition(n_par, "dst")
        .persist()
    )
    return _loop(sym, max_iter, sym)


def _loop(sym, max_iter, to_unpersist):
    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("mn")).alias("label"),
        )
        .localCheckpoint(eager=False)
    )

    def one_round(labels):
        nbr = sym.join(labels, sym["dst"] == labels["node"]).select(
            F.col("src").alias("node"), "label", F.lit(0).alias("s")
        )
        cand = nbr.unionByName(
            labels.select("node", "label", F.lit(1).alias("s"))
        )
        agg = cand.groupBy("node").agg(
            F.min("label").alias("lab1"),
            F.min(F.when(F.col("s") == 1, F.col("label"))).alias("old_label"),
        )
        parents = agg.select(
            F.col("node").alias("pnode"), F.col("lab1").alias("plabel")
        )
        return agg.join(
            parents, agg["lab1"] == parents["pnode"], "left"
        ).select(
            "node",
            F.least(
                F.col("lab1"), F.coalesce(F.col("plabel"), F.col("lab1"))
            ).alias("new_label"),
            "old_label",
        )

    rounds_done = 0
    probes = 0
    while rounds_done < max_iter:
        first = one_round(labels)
        rounds_done += 1
        if rounds_done < max_iter:
            probe_src = one_round(
                first.select("node", F.col("new_label").alias("label"))
            )
            rounds_done += 1
        else:
            probe_src = first
        new_labels = probe_src.localCheckpoint(eager=False)
        changed = new_labels.filter(
            F.col("new_label") != F.col("old_label")
        ).count()
        probes += 1
        labels = new_labels.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    if to_unpersist is not None:
        to_unpersist.unpersist()
    print(f"    rounds={rounds_done} probes={probes}", flush=True)
    return labels.select("node", F.col("label").alias("component"))


def main():
    from graal_cdc_spark.session import get_spark
    from graal_cdc_spark.sources.tables import reblock_sf_dir

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="r14-cc-ab", master=f"local[{cpus}]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = reblock_sf_dir(spark, SF_DIR)
    from graal_cdc_spark.operators.dedup import lsh_component_edges
    from graal_cdc_spark.queries.llm import _par_table

    docs = _par_table(spark, sf_dir, "documents")
    edges = lsh_component_edges(docs, "doc_id", "text")
    edges.count()  # materialize the memoized edge checkpoint

    # warm both shapes once
    old_cc(edges).write.mode("overwrite").format("noop").save()
    new_cc(edges).write.mode("overwrite").format("noop").save()
    res = {"old": [], "new": []}
    for rep in range(5):
        for mode, fn in (("old", old_cc), ("new", new_cc)):
            spark.sparkContext.setJobDescription(f"cc {mode} rep{rep}")
            t0 = time.time()
            fn(edges).write.mode("overwrite").format("noop").save()
            res[mode].append(time.time() - t0)
    print(
        f"cc old med {median(res['old']):.3f}s new med "
        f"{median(res['new']):.3f}s (old {['%.2f' % x for x in res['old']]} "
        f"new {['%.2f' % x for x in res['new']]})",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
