"""Streaming latest-by-key compaction — the CDC materialization sink.

Reference semantics being reproduced (SURVEY.md §2.3.2-3):
- ordered replay per pipeline: a tailer advances only after the event
  is fully processed (``DebeziumEngineRecordHandler.java:120-121``);
- at-least-once delivery + id-keyed idempotent upsert to the sink
  (``ElasticsearchUtils.java:131-177``), so replays converge;
- deletes (``op='d'``) remove the document (K3/K4).

Spark form: a checkpointed streaming query whose ``foreachBatch``
merges each micro-batch into a keyed state table:

    state' = latest_by_key(state ∪ batch, key, seq)

Tombstone rows (op='d') are RETAINED in state so a delete beats any
older upsert replayed later (idempotence under at-least-once);
``current_table`` projects the live view (op != 'd') exactly like the
reference's ES index after deletes.

Scale notes:
- The merge is one hash shuffle on ``key`` per micro-batch; incoming
  batches are pre-compacted (latest per key within the batch) before
  touching state, so state churn is O(distinct keys in batch), not
  O(batch rows).
- On a real cluster the state table is Delta/Iceberg ``MERGE INTO``
  (same logical op); the atomic directory swap below is the
  filesystem-only equivalent for local parquet. The swap runs on the
  driver but moves no data through it — executors write the files.
- Exactly-once: checkpoint gives at-least-once batch replay, and the
  merge is idempotent (same batch merged twice = same state), the
  standard Spark recipe for effectively-exactly-once sinks.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graal_cdc_spark.cdc.compaction import latest_by_key
from graal_cdc_spark.cdc.envelope import parse_envelope


class CompactionStateSink:
    """Keyed upsert state table backed by a parquet directory.

    ``merge(batch_df)`` is the ``foreachBatch`` body; it is idempotent
    and safe under Spark's batch-replay recovery.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_cols: tuple[str, ...] = ("key",),
        order_col: str = "seq",
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.key_cols = key_cols
        self.order_col = order_col

    def _next_dir(self) -> str:
        return self.state_dir + ".next"

    def _prev_dir(self) -> str:
        return self.state_dir + ".prev"

    def _recover(self) -> None:
        """Repair an interrupted swap before any read or merge. The
        swap protocol uses FIXED sibling names (.next/.prev), so every
        crash point leaves a recognizable layout:

        - state missing, complete ``.next`` present → crash between the
          two renames: roll FORWARD (the merged result is durable and
          the batch will replay idempotently anyway).
        - state missing, only ``.prev`` present → roll BACK to the old
          state; the interrupted batch replays on top of it.
        - state present → any leftover ``.next`` is a pre-commit
          attempt whose batch will replay, and ``.prev`` is already
          superseded: drop both.
        """
        nxt, prv = self._next_dir(), self._prev_dir()
        if not os.path.isdir(self.state_dir):
            if os.path.isdir(nxt) and os.path.isfile(
                os.path.join(nxt, "_SUCCESS")
            ):
                os.rename(nxt, self.state_dir)
            elif os.path.isdir(prv):
                os.rename(prv, self.state_dir)
        if os.path.isdir(self.state_dir):
            shutil.rmtree(prv, ignore_errors=True)
            shutil.rmtree(nxt, ignore_errors=True)

    def _state(self) -> DataFrame | None:
        self._recover()
        if not os.path.isdir(self.state_dir):
            return None
        return self.spark.read.parquet(self.state_dir)

    def merge(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        # Empty micro-batches (no-data triggers, watermark-only ticks)
        # must not rewrite the state table.
        if batch_df.isEmpty():
            return
        # Pre-compact the incoming batch: only the newest row per key
        # can change state, so drop the rest before the state join.
        compact_batch = latest_by_key(batch_df, self.key_cols, self.order_col)
        state = self._state()
        merged = (
            compact_batch
            if state is None
            else latest_by_key(
                state.unionByName(compact_batch), self.key_cols, self.order_col
            )
        )
        # Write-then-swap: never read and overwrite the same directory
        # in one job. Swap is metadata-only (executors wrote the data)
        # and CRASH-RECOVERABLE: the fixed .next/.prev names let
        # ``_recover`` finish or unwind a half-done swap — a uuid-named
        # temp dir would leave an unidentifiable orphan and, worse, a
        # window with no state dir at all that a replayed batch would
        # silently rebuild from the batch alone.
        nxt, prv = self._next_dir(), self._prev_dir()
        merged.write.mode("overwrite").parquet(nxt)
        if os.path.isdir(self.state_dir):
            os.rename(self.state_dir, prv)
        os.rename(nxt, self.state_dir)
        shutil.rmtree(prv, ignore_errors=True)

    def current_table(self, drop_deletes: bool = True) -> DataFrame:
        """The materialized view — live rows (deletes applied)."""
        state = self._state()
        if state is None:
            raise FileNotFoundError(f"no state at {self.state_dir}")
        return state.filter(F.col("op") != "d") if drop_deletes else state


def run_cdc_compaction_stream(
    spark: SparkSession,
    replay_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> CompactionStateSink:
    """End-to-end CDC pipeline, streaming form (the reference's whole
    hot path): file-stream envelope source → F3–F7 filter chain →
    projection → per-batch latest-by-key merge into keyed state.

    Runs with AvailableNow and returns after draining the source; call
    again with the same checkpoint to resume exactly where it stopped
    (the tailer-cursor semantics, ``DebeziumEngineRecordHandler.java:129``).
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

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

    sink = CompactionStateSink(spark, state_dir)
    q = (
        parsed.writeStream.foreachBatch(sink.merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


class MergeIntoStateSink:
    """Lakehouse-table variant of ``CompactionStateSink``: the state
    lives in a catalog table whose format supports row-level MERGE
    (Delta, Iceberg, Hudi), and each micro-batch is applied as one
    ``MERGE INTO`` — the same logical op as the directory-swap sink
    but transactional and incremental: only touched files rewrite,
    concurrent readers see snapshots, no swap window.

    Semantics are identical to ``CompactionStateSink.merge``: the
    batch is pre-compacted per key, tombstones are retained as state
    (a delete beats an older replayed upsert), and the ``seq`` guard
    makes replays idempotent — ``WHEN MATCHED AND s.seq > t.seq``
    never regresses a key.

    No lakehouse format ships in this test environment, so ``run_sql``
    is injectable (default ``spark.sql``) and statement generation is
    unit-tested; on a cluster with Delta/Iceberg on the classpath this
    class works as-is against a created table.
    """

    def __init__(
        self,
        spark: SparkSession,
        target_table: str,
        key_cols: tuple[str, ...] = ("key",),
        order_col: str = "seq",
        run_sql=None,
    ) -> None:
        self.spark = spark
        self.target_table = target_table
        self.key_cols = key_cols
        self.order_col = order_col
        self.run_sql = run_sql if run_sql is not None else spark.sql

    def merge_statement(self, source_view: str) -> str:
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.key_cols)
        return (
            f"MERGE INTO {self.target_table} t\n"
            f"USING {source_view} s\n"
            f"ON {on}\n"
            f"WHEN MATCHED AND s.{self.order_col} > t.{self.order_col} "
            f"THEN UPDATE SET *\n"
            f"WHEN NOT MATCHED THEN INSERT *"
        )

    def merge(self, batch_df: DataFrame, batch_id: int | None = None) -> str | None:
        """``foreachBatch`` body. Returns the statement it ran (or None
        for an empty batch) for observability, like the JDBC sink.

        The source view is a GLOBAL temp view: inside ``foreachBatch``
        the batch DataFrame belongs to a per-micro-batch session clone,
        and a session-local view registered there would be invisible to
        the session executing the MERGE. Global temp views are shared
        across all sessions of the SparkContext, so the statement
        resolves regardless of which session runs it."""
        if batch_df.isEmpty():
            return None
        compact_batch = latest_by_key(batch_df, self.key_cols, self.order_col)
        view = f"__cdc_batch_{uuid.uuid4().hex[:8]}"
        compact_batch.createOrReplaceGlobalTempView(view)
        stmt = self.merge_statement(f"global_temp.{view}")
        try:
            self.run_sql(stmt)
        finally:
            batch_df.sparkSession.catalog.dropGlobalTempView(view)
        return stmt

    def current_table(self, drop_deletes: bool = True) -> DataFrame:
        state = self.spark.table(self.target_table)
        return state.filter(F.col("op") != "d") if drop_deletes else state
