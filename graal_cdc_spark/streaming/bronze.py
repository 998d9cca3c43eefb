"""Bronze-layer raw append — the durable-log write (Q1).

The reference appends every surviving event's raw JSON to a Chronicle
Queue before any consumer sees it ("prevent in-memory queue explosion,
fast write to local queue" — ``DebeziumEngineRecordHandler.java:180-181``,
hourly-rolled segments ``:89-93``). The lakehouse analog is a bronze
parquet append of the UNfiltered envelope frame: replayable, auditable,
and the recovery source of truth when the upstream transport ages out.

Differences from the reference, by design:
- The append happens BEFORE the F3–F7 filter chain (the reference
  appends after filtering) so tombstones and malformed events are
  preserved for audit; the filter chain runs on read instead
  (filters are cheap codegen predicates; storage is the scarce thing
  the reference was optimizing, and parquet+zstd makes raw cheap).
- Hourly roll ≙ ``ingest_date``/``ingest_hour`` partition columns —
  partition pruning gives the same bounded-segment reads.

Scale notes: executor-parallel append, no driver data path; the
partition columns keep file listing and retention (drop old
partitions) O(hours), not O(files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bronze_append(batch_df: DataFrame, bronze_dir: str) -> None:
    """``foreachBatch`` body (or direct batch call): append the raw
    envelope frame with ingest-time partition columns."""
    (
        batch_df.withColumn("ingest_date", F.current_date())
        .withColumn("ingest_hour", F.hour(F.current_timestamp()))
        .write.mode("append")
        .partitionBy("ingest_date", "ingest_hour")
        .parquet(bronze_dir)
    )


def bronze_sink(bronze_dir: str):
    """Adapter: a foreachBatch callable bound to a bronze directory."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bronze_append(batch_df, bronze_dir)

    return sink


def read_bronze(spark, bronze_dir: str) -> DataFrame:
    """Read the bronze log back as the envelope frame (partition
    columns retained for pruning; drop them for replay)."""
    return spark.read.parquet(bronze_dir)
