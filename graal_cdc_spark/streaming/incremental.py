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

Exactly-once protocol (at-least-once replay + idempotent effects,
SURVEY.md §2.3.3). A naive "merge state, then update agg" is NOT
replay-safe: a crash between the two leaves state merged, and the
replayed batch then observes a zero delta — the aggregate loses the
batch's contribution forever. The sink therefore commits in three
idempotent phases, keyed by the ``foreachBatch`` batch id:

1. **Stage** the delta to a write-ahead parquet dir *before* any
   state mutation (the delta's "after" side is computed virtually —
   state ∪ batch compacted — without writing state).
2. **Merge** the compaction state (idempotent by construction).
3. **Commit** the new aggregate as a versioned directory carrying an
   ``_applied_<app_id>-<batch_id>`` marker, then flip a pointer FILE
   with ``os.replace`` (atomic) — never a rename dance on the live
   dir. The marker key includes an app/checkpoint namespace because
   batch ids restart at 0 on a checkpoint reset.

A replayed batch finds either the applied marker (skip), or a
complete staged delta (redo phases 2-3 idempotently), or no staging
(recompute from scratch — state untouched, by phase order). This is
the same txn-marker recipe Delta's ``txnAppId``/``txnVersion`` gives
``foreachBatch`` sinks on a cluster.

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
- No driver-side data path: deltas and aggregate versions are parquet
  written by executors; the driver only flips the pointer file.

Reference: ElasticsearchUtils.java:131-177 (per-doc upserts — the
record-at-a-time ceiling this generalizes);
DebeziumEngineRecordHandler.java:120-121 (ordered replay the delta
rule relies on).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graal_cdc_spark.cdc.compaction import latest_by_key
from graal_cdc_spark.streaming.compaction import CompactionStateSink

_CENTS = "CAST(CAST(get_json_object(after_json, '$.value') AS DECIMAL(18,2)) * 100 AS BIGINT)"


class IncrementalAggSink:
    """``foreachBatch`` sink maintaining per-``group_col`` totals of
    ``after.value`` over the live (compacted, deletes-applied) CDC
    state, by staged delta — never recomputing from full state."""

    def __init__(
        self,
        spark: SparkSession,
        state_sink: CompactionStateSink,
        agg_dir: str,
        group_col: str = "tbl",
        app_id: str | None = None,
    ) -> None:
        self.spark = spark
        self.state_sink = state_sink
        self.agg_dir = agg_dir  # base name: versions live at <agg_dir>.v*
        self.group_col = group_col
        # Markers and staging dirs are keyed by (app_id, batch_id), not
        # batch_id alone: Spark batch ids restart at 0 on a checkpoint
        # reset, and a bare-id marker from a previous run would make
        # the skip-check treat NEW data as already applied (Delta's
        # txnAppId/txnVersion splits the key the same way). Ad-hoc use
        # (no app_id given) gets a per-instance namespace.
        self.app_id = app_id if app_id is not None else f"adhoc{uuid.uuid4().hex[:8]}"
        self._fallback_id = 0  # per-instance ids for ad-hoc batch use

    # -- aggregate storage: versioned dirs + atomic pointer file -----

    def _pointer(self) -> str:
        return self.agg_dir + ".CURRENT"

    def _current_dir(self) -> str | None:
        try:
            with open(self._pointer()) as f:
                path = f.read().strip()
        except FileNotFoundError:
            return None
        return path if os.path.isdir(path) else None

    def _agg(self) -> DataFrame:
        cur = self._current_dir()
        if cur is None:
            return self._empty_agg()
        return self.spark.read.parquet(cur)

    def _empty_agg(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "grp string, total_cents long, n_live long, n_val long"
        )

    # -- contributions ------------------------------------------------

    def _contrib(self, live: DataFrame, keys: DataFrame) -> DataFrame:
        """(grp, total_cents, n_live, n_val) over ``live`` rows whose
        key is in ``keys``. ``n_val`` counts non-null values so the
        view can reproduce SQL SUM semantics (all-null group → NULL,
        not 0) — a bare cents total cannot distinguish the two."""
        return (
            live.join(F.broadcast(keys), "key")
            .select(
                F.col(self.group_col).alias("grp"),
                F.expr(_CENTS).alias("cents"),
            )
            .groupBy("grp")
            .agg(
                F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("total_cents"),
                F.count(F.lit(1)).alias("n_live"),
                F.count("cents").alias("n_val"),
            )
        )

    def _before_contrib(self, keys: DataFrame) -> DataFrame:
        try:
            live = self.state_sink.current_table(drop_deletes=True)
        except FileNotFoundError:
            return self._empty_agg()
        return self._contrib(live, keys)

    def _after_contrib(self, batch_df: DataFrame, keys: DataFrame) -> DataFrame:
        """Post-merge live contribution, computed VIRTUALLY (state ∪
        batch, compacted) so the delta can be staged before any state
        write."""
        kc = list(self.state_sink.key_cols)
        oc = self.state_sink.order_col
        compact_batch = latest_by_key(batch_df, kc, oc)
        state = self.state_sink._state()
        combined = (
            compact_batch
            if state is None
            else state.unionByName(compact_batch)
        )
        live = latest_by_key(combined, kc, oc).filter(F.col("op") != "d")
        return self._contrib(live, keys)

    # -- the three-phase commit ---------------------------------------

    def merge(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        if batch_df.isEmpty():
            return
        if batch_id is None:
            batch_id = self._fallback_id
            self._fallback_id += 1
        txn = f"{self.app_id}-{batch_id}"

        cur = self._current_dir()
        if cur is not None and os.path.isfile(
            os.path.join(cur, f"_applied_{txn}")
        ):
            # Replay of a fully committed batch: bring state up (a
            # no-op merge) and leave the aggregate alone.
            self.state_sink.merge(batch_df, batch_id)
            shutil.rmtree(f"{self.agg_dir}.delta_{txn}", ignore_errors=True)
            return

        # Phase 1 — stage the delta BEFORE any state mutation.
        staging = f"{self.agg_dir}.delta_{txn}"
        if not os.path.isfile(os.path.join(staging, "_SUCCESS")):
            keys = batch_df.select("key").distinct()
            before = self._before_contrib(keys)
            after = self._after_contrib(batch_df, keys)
            delta = (
                after.withColumnRenamed("total_cents", "a_cents")
                .withColumnRenamed("n_live", "a_n")
                .withColumnRenamed("n_val", "a_nv")
                .join(
                    before.withColumnRenamed("total_cents", "b_cents")
                    .withColumnRenamed("n_live", "b_n")
                    .withColumnRenamed("n_val", "b_nv"),
                    "grp",
                    "full_outer",
                )
                .select(
                    "grp",
                    (
                        F.coalesce("a_cents", F.lit(0))
                        - F.coalesce("b_cents", F.lit(0))
                    ).alias("d_cents"),
                    (
                        F.coalesce("a_n", F.lit(0)) - F.coalesce("b_n", F.lit(0))
                    ).alias("d_n"),
                    (
                        F.coalesce("a_nv", F.lit(0)) - F.coalesce("b_nv", F.lit(0))
                    ).alias("d_nv"),
                )
            )
            delta.write.mode("overwrite").parquet(staging)

        # Phase 2 — idempotent state merge.
        self.state_sink.merge(batch_df, batch_id)

        # Phase 3 — commit agg version + marker, flip pointer atomically.
        delta = self.spark.read.parquet(staging)
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
                (F.coalesce("n_val", F.lit(0)) + F.coalesce("d_nv", F.lit(0)))
                .cast("long")
                .alias("n_val"),
            )
            .filter(F.col("n_live") > 0)
        )
        new_dir = f"{self.agg_dir}.v{txn}.{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(new_dir)
        with open(os.path.join(new_dir, f"_applied_{txn}"), "w"):
            pass
        old = self._current_dir()
        ptr_tmp = self._pointer() + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(ptr_tmp, "w") as f:
            f.write(new_dir)
        os.replace(ptr_tmp, self._pointer())  # atomic commit point
        shutil.rmtree(staging, ignore_errors=True)
        # Reclaim every superseded version dir: the pointer's previous
        # target AND any orphan left by a crash between a version write
        # and its pointer flip (the retry writes a fresh uuid-suffixed
        # dir, so the first attempt would otherwise leak forever).
        base = os.path.basename(self.agg_dir) + ".v"
        parent = os.path.dirname(self.agg_dir) or "."
        for name in os.listdir(parent):
            full = os.path.join(parent, name)
            if name.startswith(base) and full != new_dir and os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
        if old is not None and old != new_dir:
            shutil.rmtree(old, ignore_errors=True)

    def current_agg(self) -> DataFrame:
        """The maintained view: (grp, live_total decimal-string, n_live).
        A group whose live rows all carry NULL values reports a NULL
        total (``n_val`` gate) — matching SQL SUM, and therefore the
        c11 batch twin, exactly."""
        return self._agg().select(
            F.col("grp").alias(self.group_col),
            # decimal/decimal division — exact; a double intermediate
            # could misround cents at the .005 boundary
            F.when(
                F.col("n_val") > 0,
                F.expr(
                    "CAST(CAST(total_cents AS DECIMAL(18,0)) / 100 AS DECIMAL(18,2))"
                ).cast("string"),
            ).alias("live_total"),
            F.col("n_live"),
        )


def run_incremental_agg_stream(
    spark: SparkSession,
    replay_dir: str,
    state_dir: str,
    agg_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> IncrementalAggSink:
    """End-to-end materialized-view pipeline, streaming form:
    file-stream envelope source → F3–F7 filter chain → three-phase
    incremental aggregate commit per micro-batch. AvailableNow;
    re-invoke with the same checkpoint to resume from the cursor
    (DebeziumEngineRecordHandler.java:129 tailer semantics)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from graal_cdc_spark.cdc.envelope import parse_envelope
    from graal_cdc_spark.streaming.replay import read_file_stream

    schema = StructType(
        [
            StructField("seq", LongType()),
            StructField("key", StringType()),
            StructField("value", StringType()),
        ]
    )
    raw = read_file_stream(spark, replay_dir, schema, max_files_per_trigger)
    parsed = parse_envelope(raw)

    # Namespace txn markers by the checkpoint identity: batch ids are
    # only unique per checkpoint, and a resumed query (same checkpoint,
    # new process) must keep the same namespace to recognize replays.
    app = hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:8]
    sink = IncrementalAggSink(
        spark, CompactionStateSink(spark, state_dir), agg_dir, app_id=f"ckpt{app}"
    )
    q = (
        parsed.writeStream.foreachBatch(sink.merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink
