"""Partition-pruning plan audits — the scan-level 100 TB guard that
column pruning / predicate pushdown (test_plans) doesn't cover: a
partitioned layout must let Spark skip whole directories, both for
literal predicates (static pruning) and for predicates only known at
runtime from a joined dim (dynamic partition pruning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graal_cdc_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def day_partitioned(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_by_day"))
    (
        load_table(spark, SF, "events")
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    return path


def test_static_partition_pruning(spark, day_partitioned):
    df = (
        spark.read.parquet(day_partitioned)
        .filter(F.col("day") == "2024-01-15")
        .select("event_id")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan
    # the pruned scan must read exactly the one matching partition
    n_parts = (
        spark.read.parquet(day_partitioned)
        .select("day")
        .distinct()
        .count()
    )
    assert n_parts > 1  # layout actually has multiple partitions
    assert df.count() == (
        load_table(spark, SF, "events")
        .filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-15")
        .count()
    )


def test_dynamic_partition_pruning(spark, day_partitioned, tmp_path):
    """A selective filter on a NON-partition dim attribute reaches the
    partitioned fact scan at runtime (DPP): the fact's
    PartitionFilters carry a dynamicpruning subquery fed by the
    broadcast dim — the star-schema shape where static pruning can't
    apply because the surviving days are only known at run time."""
    dim_path = str(tmp_path / "calendar_dim")
    (
        spark.read.parquet(day_partitioned)
        .select("day")
        .distinct()
        .withColumn(
            "tag",
            F.when(
                F.dayofweek(F.to_date("day")).isin(2, 3, 4, 5, 6), "wd"
            ).otherwise("we"),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    fact = spark.read.parquet(day_partitioned)
    # An EQUALITY predicate: DPP's insertion rule only fires behind a
    # "likely selective" dim filter (EqualTo/In/Like...); a bare
    # boolean NOT column does not qualify and silently skips pruning.
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "we")
    joined = fact.join(dim, "day").select("event_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result is the weekend subset
    want = (
        spark.read.parquet(day_partitioned)
        .filter(F.dayofweek(F.to_date("day")).isin(1, 7))
        .count()
    )
    assert joined.count() == want


def test_runtime_bloom_filter_injection(spark):
    """Runtime bloom-filter injection (SPARK-32268): a selective dim
    filter materializes as a bloom filter applied BELOW the fact
    side's shuffle, cutting shuffle volume — the row-level sibling of
    DPP. Preconditions the rule checks, reproduced here: the app side
    must contain a shuffle (plain scan-joins are skipped), the scan
    size threshold must be met (default 10GB — lowered for local
    data), and the join must not be broadcast."""
    old_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        j = agg.join(o, agg.l_orderkey == o.o_orderkey).select("q")
        op = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in op.lower() or "might_contain" in op.lower(), op[:1500]
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thresh,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
