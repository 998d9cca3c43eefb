"""Bucketed tables — shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
sides. Bucketing (hash-partitioned table layout with per-bucket files,
``df.write.bucketBy(n, key).sortBy(key).saveAsTable``) moves that
shuffle to WRITE time, once; every subsequent join or aggregation on
the bucket key reads co-located buckets and skips the exchange
entirely — visible in the plan as a join with NO ``Exchange`` on the
bucketed sides.

This is the Spark-native answer to the reference's total absence of a
storage layer (Chronicle Queue is an unindexed log). The silver-layer
CDC materialization (compaction output) should be bucketed by ``key``
so repeated downstream merges/joins never reshuffle it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    ``n_buckets`` should match downstream ``spark.sql.shuffle.partitions``
    (or divide it) so bucket-to-partition alignment holds; sorting
    within buckets additionally removes the Sort before sort-merge
    joins.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, table_a: str, table_b: str) -> bool:
    """True when both tables are bucketed compatibly (same bucket count
    on the join key) — i.e. a join between them needs no exchange."""
    try:
        da = spark.catalog.listColumns(table_a)
        db = spark.catalog.listColumns(table_b)
        ba = {c.name for c in da if c.isBucket}
        bb = {c.name for c in db if c.isBucket}
        return bool(ba) and ba == bb
    except Exception:
        return False
