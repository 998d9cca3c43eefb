"""Incremental aggregate maintenance over the CDC stream (c11).

The materialized-view half of a CDC engine: keep an aggregate (here
per-table SUM(after.value) + live row count) continuously correct as
changes stream in, WITHOUT rescanning the full state per batch. The
reference's scripts can only re-upsert documents one at a time
(``ElasticsearchUtils`` K1/K2); this is the set-oriented Spark
extension — the classic delta-maintenance rule for distributive
aggregates:

    agg' = agg + SUM(new live contribution) - SUM(old live contribution)

evaluated only over the keys touched by the micro-batch.

Replay safety (at-least-once, SURVEY.md §2.3.3): deltas are computed
as (state-after - state-before) restricted to the batch's keys, and
the underlying ``CompactionStateSink.merge`` is idempotent — a
replayed batch leaves state unchanged, so its delta is exactly zero
and the aggregate does not double-count. This makes the whole sink
idempotent without any seq bookkeeping of its own.

Exactness: values are summed as integer cents (``decimal(18,2) * 100``
→ BIGINT), so the running aggregate never drifts the way a float
accumulator would over millions of deltas.

Scale notes:
- The before/after lookups join state against the batch's distinct
  keys — a broadcast of O(batch keys) against the keyed state table.
  With parquet state this scans state files (local-mode stand-in);
  on a cluster the state table is Delta/Iceberg clustered on ``key``,
  so the same join prunes to the touched files.
- The delta aggregation is partial map-side and shuffles O(groups)
  rows; the aggregate-table merge is O(groups) — independent of both
  state size and stream length.
- No driver-side data path: the aggregate table lives as a (tiny)
  parquet directory, merged executor-side, swapped atomically like
  the compaction state.

Reference: ElasticsearchUtils.java:131-177 (per-doc upserts — the
record-at-a-time ceiling this generalizes); DebeziumEngineRecordHandler.java:120-121
(ordered replay the delta rule relies on).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graal_cdc_spark.streaming.compaction import CompactionStateSink

_CENTS = "CAST(CAST(get_json_object(after_json, '$.value') AS DECIMAL(18,2)) * 100 AS BIGINT)"


class IncrementalAggSink:
    """``foreachBatch`` sink maintaining per-``group_col`` totals of
    ``after.value`` over the live (compacted, deletes-applied) CDC
    state, by delta — never recomputing from full state."""

    def __init__(
        self,
        spark: SparkSession,
        state_sink: CompactionStateSink,
        agg_dir: str,
        group_col: str = "tbl",
    ) -> None:
        self.spark = spark
        self.state_sink = state_sink
        self.agg_dir = agg_dir
        self.group_col = group_col

    def _live_contrib(self, keys: DataFrame) -> DataFrame:
        """(group, total_cents, n_live) for the live state rows whose
        key is in ``keys``. Empty-state → empty contribution."""
        try:
            live = self.state_sink.current_table(drop_deletes=True)
        except FileNotFoundError:
            return self._empty_agg()
        return (
            live.join(F.broadcast(keys), "key")
            .select(
                F.col(self.group_col).alias("grp"),
                F.expr(_CENTS).alias("cents"),
            )
            .groupBy("grp")
            .agg(
                F.sum("cents").cast("long").alias("total_cents"),
                F.count(F.lit(1)).alias("n_live"),
            )
        )

    def _empty_agg(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "grp string, total_cents long, n_live long"
        )

    def _agg(self) -> DataFrame:
        if not os.path.isdir(self.agg_dir):
            return self._empty_agg()
        return self.spark.read.parquet(self.agg_dir)

    def merge(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        if batch_df.isEmpty():
            return
        keys = batch_df.select("key").distinct()
        # Materialize BEFORE the state swap: the contribution plan
        # reads the state parquet files lazily, and merge() replaces
        # them — an uncheckpointed `before` would re-execute against
        # deleted files. O(touched groups) rows, cheap to pin.
        before = self._live_contrib(keys).localCheckpoint()
        self.state_sink.merge(batch_df, batch_id)
        after = self._live_contrib(keys).localCheckpoint()

        delta = (
            after.withColumnRenamed("total_cents", "a_cents")
            .withColumnRenamed("n_live", "a_n")
            .join(
                before.withColumnRenamed("total_cents", "b_cents")
                .withColumnRenamed("n_live", "b_n"),
                "grp",
                "full_outer",
            )
            .select(
                "grp",
                (
                    F.coalesce("a_cents", F.lit(0))
                    - F.coalesce("b_cents", F.lit(0))
                ).alias("d_cents"),
                (F.coalesce("a_n", F.lit(0)) - F.coalesce("b_n", F.lit(0))).alias(
                    "d_n"
                ),
            )
        )
        merged = (
            self._agg()
            .join(delta, "grp", "full_outer")
            .select(
                "grp",
                (
                    F.coalesce("total_cents", F.lit(0))
                    + F.coalesce("d_cents", F.lit(0))
                )
                .cast("long")
                .alias("total_cents"),
                (F.coalesce("n_live", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
                .cast("long")
                .alias("n_live"),
            )
            .filter(F.col("n_live") > 0)
        )
        tmp = f"{self.agg_dir}.tmp.{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{self.agg_dir}.old.{uuid.uuid4().hex[:8]}"
        if os.path.isdir(self.agg_dir):
            os.rename(self.agg_dir, old)
        os.rename(tmp, self.agg_dir)
        shutil.rmtree(old, ignore_errors=True)

    def current_agg(self) -> DataFrame:
        """The maintained view: (grp, live_total decimal-string, n_live)."""
        return self._agg().select(
            F.col("grp").alias(self.group_col),
            # decimal/decimal division — exact; a double intermediate
            # could misround cents at the .005 boundary
            F.expr(
                "CAST(CAST(total_cents AS DECIMAL(18,0)) / 100 AS DECIMAL(18,2))"
            )
            .cast("string")
            .alias("live_total"),
            F.col("n_live"),
        )
