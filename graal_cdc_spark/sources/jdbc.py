"""Partitioned JDBC snapshot source — the scale path for the
reference's initial-snapshot phase (op='r' rows, S3 in SURVEY.md §2.1:
Debezium snapshots the table before streaming the log,
``DebeziumEngineManager.java:76-121``).

A single-connection JDBC read serializes the whole snapshot through
one task; at scale the snapshot MUST be a range-partitioned parallel
scan. This module wraps Spark's JDBC source with the production
ergonomics Debezium users expect:

* auto-probed partition bounds (one ``SELECT min(c), max(c)`` pushed
  to the database) so callers only name the split column;
* ``num_partitions`` parallel range scans (Spark generates disjoint
  ``WHERE c BETWEEN ...`` per task — each executor opens its own
  connection);
* filters/projections still push down to the database (Spark's JDBC
  relation emits them as WHERE/SELECT — asserted in the live test).

The snapshot rows then enter the same envelope pipeline as the log
(op='r' passes F6, ``cdc/filters.py:47``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def probe_bounds(
    spark: SparkSession,
    url: str,
    table: str,
    column: str,
    properties: dict[str, str] | None = None,
) -> tuple[int, int]:
    """Push a 1-row min/max aggregate to the database. The database
    answers from its index (or one scan) — never ship the table to
    find its bounds."""
    bounds_query = (
        f"(SELECT MIN({column}) AS lo, MAX({column}) AS hi FROM {table}) b"
    )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", bounds_query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    # positional access: databases disagree on unquoted-identifier
    # case (Derby/Oracle uppercase, postgres lowercases)
    row = reader.load().collect()[0]
    lo, hi = row[0], row[1]
    if lo is None:
        raise ValueError(f"jdbc snapshot: {table}.{column} has no rows")
    return int(lo), int(hi)


def read_jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower: int | None = None,
    upper: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Range-partitioned parallel snapshot scan.

    With ``partition_column`` set, bounds are auto-probed unless
    given, and the scan runs as ``num_partitions`` disjoint range
    queries. Without it, falls back to a single-partition read (only
    acceptable for dimension-sized tables — the caller is choosing
    that explicitly).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower is None or upper is None:
            lo, hi = probe_bounds(
                spark, url, table, partition_column, properties
            )
            lower = lo if lower is None else lower
            upper = hi if upper is None else upper
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
