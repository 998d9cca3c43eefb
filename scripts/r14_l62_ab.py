#!/usr/bin/env python
"""Interleaved A/B for l62's nsq stage: interpreted HOF
(transform+aggregate, the current shape) vs codegen'd
explode+hash-aggregate with the IDENTICAL round expression.

Also pins frame equality of the two spellings on the real data.
"""

from __future__ import annotations

import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from graal_cdc_spark.session import get_spark
    from graal_cdc_spark.sources.tables import reblock_sf_dir

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="r14-l62-ab", master=f"local[{cpus}]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = reblock_sf_dir(spark, SF_DIR)
    from graal_cdc_spark.queries.llm import _par_table

    emb = _par_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    staged = emb.select("vec_id", "label", v.alias("__v"), mx.alias("__mx"))
    safe = F.when(F.col("__mx") == 0.0, F.lit(1.0)).otherwise(F.col("__mx"))

    def hof():
        qcol = F.transform(
            F.col("__v"),
            lambda x: F.round(x.cast("double") * 127.0 / safe).cast("int"),
        )
        return staged.select(
            "vec_id",
            "label",
            F.aggregate(
                qcol,
                F.lit(0).cast("bigint"),
                lambda a, x: a + x.cast("bigint") * x.cast("bigint"),
            ).alias("nsq"),
        )

    def exploded():
        q = (
            F.round(F.col("__x").cast("double") * 127.0 / F.col("__s"))
            .cast("int")
            .cast("bigint")
        )
        return (
            staged.select(
                "vec_id",
                "label",
                safe.alias("__s"),
                F.explode_outer("__v").alias("__x"),
            )
            .groupBy("vec_id", "label")
            .agg(
                F.coalesce(F.sum(q * q), F.lit(0).cast("bigint")).alias("nsq")
            )
        )

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # equality pin on the real corpus
    diff = (
        hof().withColumnRenamed("nsq", "a")
        .join(exploded().withColumnRenamed("nsq", "b"), ["vec_id", "label"],
              "full_outer")
        .filter(
            (F.col("a").isNull())
            | (F.col("b").isNull())
            | (F.col("a") != F.col("b"))
        )
        .count()
    )
    print(f"nsq frame diff rows: {diff}", flush=True)

    noop(hof()); noop(exploded())
    res = {"hof": [], "exploded": []}
    for rep in range(5):
        for mode, build in (("hof", hof), ("exploded", exploded)):
            spark.sparkContext.setJobDescription(f"l62 nsq {mode} rep{rep}")
            t0 = time.time()
            noop(build())
            res[mode].append(time.time() - t0)
    print(
        f"l62 nsq hof med {median(res['hof']):.3f}s exploded med "
        f"{median(res['exploded']):.3f}s "
        f"(hof {['%.2f' % x for x in res['hof']]} "
        f"exploded {['%.2f' % x for x in res['exploded']]})",
        flush=True,
    )
    spark.stop()




def full_ab():
    """Old full-query shape (inline copy of the pre-r14 _l62 tail) vs
    the committed new shape, interleaved."""
    from graal_cdc_spark.session import get_spark
    from graal_cdc_spark.sources.tables import reblock_sf_dir, ordered_result

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="r14-l62-full-ab", master=f"local[{cpus}]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = reblock_sf_dir(spark, SF_DIR)
    from graal_cdc_spark.queries import all_specs
    from graal_cdc_spark.queries.llm import _par_table

    spec = all_specs()["l62_embedding_norm_outliers"]

    def old_l62():
        emb = _par_table(spark, sf_dir, "embeddings")
        v = F.col("embedding")
        mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
        staged = emb.select("vec_id", "label", v.alias("__v"), mx.alias("__mx"))
        safe = F.when(F.col("__mx") == 0.0, F.lit(1.0)).otherwise(F.col("__mx"))
        qcol = F.transform(
            F.col("__v"),
            lambda x: F.round(x.cast("double") * 127.0 / safe).cast("int"),
        )
        normsq = staged.select(
            "vec_id", "label",
            F.aggregate(
                qcol, F.lit(0).cast("bigint"),
                lambda a, x: a + x.cast("bigint") * x.cast("bigint"),
            ).alias("nsq"),
        ).localCheckpoint(eager=False)
        stats = normsq.groupBy("label").agg(
            F.count(F.lit(1)).alias("n"), F.sum("nsq").alias("s"))
        j = normsq.join(F.broadcast(stats), "label")
        dev = F.abs(F.col("nsq") * F.col("n") - F.col("s"))
        devs = j.select("label", "n", dev.alias("dev"))
        mad = devs.groupBy("label").agg(
            F.max("n").alias("n"), F.sum("dev").alias("dev_sum"),
            F.max("dev").alias("max_dev"))
        out = devs.join(
            F.broadcast(mad.select("label", F.col("dev_sum").alias("ds"))),
            "label",
        ).filter(F.col("dev") * F.col("n") > F.col("ds") * 2)
        outliers = out.groupBy("label").agg(
            F.count(F.lit(1)).alias("n_outliers"))
        return ordered_result(
            mad.join(outliers, "label", "left").select(
                "label", "n", "dev_sum", "max_dev",
                F.coalesce("n_outliers", F.lit(0)).alias("n_outliers")),
            "label")

    def new_l62():
        return spec.spark(spark, sf_dir)

    a = [tuple(r) for r in old_l62().collect()]
    b = [tuple(r) for r in new_l62().collect()]
    print(f"full-result equal: {a == b} rows={len(a)}", flush=True)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    noop(old_l62()); noop(new_l62())
    res = {"old": [], "new": []}
    for rep in range(5):
        for mode, build in (("old", old_l62), ("new", new_l62)):
            spark.sparkContext.setJobDescription(f"l62 {mode} rep{rep}")
            t0 = time.time()
            noop(build())
            res[mode].append(time.time() - t0)
    print(
        f"l62 full old med {median(res['old']):.3f}s new med "
        f"{median(res['new']):.3f}s "
        f"(old {['%.2f' % x for x in res['old']]} "
        f"new {['%.2f' % x for x in res['new']]})",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    import sys as _s
    (full_ab if "full" in _s.argv[1:] else main)()
