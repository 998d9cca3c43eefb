"""Operational runbook: the three lifecycle jobs that keep a CDC lake
healthy at 100 TB, composed from the engine's gated operators.

1. **Log retention** (``compact_log``, gated as c27): collapse the
   replay log's head to latest-per-key (tombstones retained) behind a
   moving boundary — the job that BOUNDS replay storage. The
   reference's Chronicle Queue rolls hourly but never compacts; its
   disk grows without bound.
2. **GDPR erasure** (``purge_keys``, gated as c29): remove requested
   keys from the serving lake by rewriting ONLY the parquet files
   that contain them (intent-marker commit, crash-to-completion
   recovery).
3. **Small-file compaction** (``compact_partitions``): rewrite
   fragmented partitions to target-size files so file listing stays
   off the scan's critical path.
4. **Retention re-runs over parked consumers**: compact_log on any
   cadence; a consumer checkpointed before a SERIES of compactions
   resumes with zero head replay via the chained remap.
5. **Versioned serving table** (``sinks/versioned_lake``, gated as
   c31): atomic key-merges into a transaction-logged table with
   snapshot isolation, time travel, and vacuum-bounded storage.
6. **Maintenance that costs consumers nothing** (r12, gated as
   c33/c35/c37): OPTIMIZE is a ``dataChange:false`` commit the
   change feed skips without reading a byte; ``vacuum(spark=...)``
   persists per-commit deltas before reclaiming pre-image files, so
   the feed keeps serving PAST the retention horizon; column renames
   are metadata-only commits over pinned physical names.
7. **Layout lifecycle on a LIVE table** (r13, gated as c41/c42/st22):
   incremental OPTIMIZE folds only the small-file tail (log row
   counts decide, zero I/O; reruns are commit-free no-ops) and
   ``commit_repartition`` evolves the hive layout as one
   data-identical commit — old versions time-travel under their own
   layout, the change feed serves zero rows for the rewrite.

Each is idempotent and crash-repairable, so the runbook is "run them
on a schedule; rerun freely after failures".

Run: python examples/lake_operations.py
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graal_cdc_spark.cdc.compaction import latest_by_key
from graal_cdc_spark.cdc.envelope import parse_envelope
from graal_cdc_spark.session import get_spark
from graal_cdc_spark.sinks.lake import (
    compact_partitions,
    purge_keys,
    write_partitioned,
)
from graal_cdc_spark.sources import cdc_log_ds as DS

BASE = "/tmp/graal_example_lake_ops"


def _envelope(op: str, key: str, n: int) -> str:
    after = None if op == "d" else {"id": key, "n": n}
    return json.dumps(
        {"payload": {"op": op, "before": None, "after": after,
                     "source": {"db": "appdb", "table": "users"}}}
    )


def run(spark, base: str):
    log = os.path.join(base, "log")
    lake = os.path.join(base, "lake")
    DS.register(spark)

    # a day of traffic: every key updated many times, one key deleted
    for day in range(3):
        DS.append_segment(
            log,
            [
                (day * 100 + i, f"u{i % 10}",
                 _envelope("d" if (day == 2 and i % 10 == 3) else
                           ("c" if day == 0 else "u"), f"u{i % 10}",
                           day * 100 + i))
                for i in range(1, 40)
            ],
            seal=True,
        )

    # --- job 1: log retention (keep the last day verbatim) ---
    before = spark.read.format("graal_cdc_log").load(log).count()
    DS.compact_log(spark, log, upto_seq=199)
    after = spark.read.format("graal_cdc_log").load(log).count()
    assert after < before  # head collapsed to O(live keys)

    # refresh the serving lake from the compacted log (fragmented on
    # purpose: many small files per partition). ROUND-ROBIN
    # repartition, deliberately: repartition(8, "key") would be ELIDED
    # here — latest_by_key's window already hash-partitions by key, so
    # when shuffle.partitions matches, Catalyst collapses the
    # repartition into that exchange and AQE byte-coalesces the tiny
    # shuffle to ONE partition (one file). Round-robin can never
    # satisfy the window's partitioning, so the explicit-N node
    # survives and stays AQE-exempt — a refinement of the documented
    # byte-blind-coalescing trap (the l02 rule).
    parsed = parse_envelope(
        spark.read.format("graal_cdc_log").load(log)
    )
    state = latest_by_key(parsed, ["key"], "seq").filter(
        F.col("op") != "d"
    ).select("tbl", "key", "seq")
    write_partitioned(state.repartition(6), lake, ["tbl"])

    # --- job 2: GDPR erasure request for two subjects ---
    stats = purge_keys(spark, lake, "key", ["u1", "u7"])
    assert stats["rows_purged"] == 2, stats
    remaining = {r.key for r in spark.read.parquet(lake).collect()}
    assert {"u1", "u7"}.isdisjoint(remaining)
    assert "u3" not in remaining  # deleted upstream via tombstone

    # --- job 3: small-file compaction of the fragmented partitions ---
    rewritten = compact_partitions(
        spark, lake, target_file_bytes=1 << 20, min_files=2
    )
    assert rewritten, "fragmented partition should compact"
    (files_before, files_after), = rewritten.values()
    assert files_after < files_before
    # content unchanged by compaction
    assert {r.key for r in spark.read.parquet(lake).collect()} == remaining

    # --- job 4: retention RE-RUNS never strand parked consumers ---
    # A consumer checkpointed BEFORE a whole series of retention runs
    # resumes with zero head replay: each compact_log appends its
    # remap to the CHAIN in .compact-remap.json, and the reader
    # translates its old offsets transitively through every
    # generation (round 10; see sources/cdc_log_ds.py
    # _translate_compacted). Operationally this means retention can
    # run on any cadence without coordinating with consumers.
    out_dir = os.path.join(base, "consumer_out")
    ck = os.path.join(base, "consumer_ck")
    q = (
        spark.readStream.format("graal_cdc_log").load(log)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = spark.read.parquet(out_dir).count()
    # two more retention cycles over data the consumer has fully
    # drained (the zero-replay contract covers drained generations;
    # data that arrives between a checkpoint and a compaction is
    # re-delivered under at-least-once, never lost), then fresh
    # traffic after both
    DS.compact_log(spark, log, upto_seq=220)
    DS.compact_log(spark, log, upto_seq=239)
    DS.append_segment(
        log, [(300 + i, f"u{i}", _envelope("u", f"u{i}", 300 + i))
              for i in range(1, 4)], seal=True)
    manifest = json.load(
        open(os.path.join(log, ".compact-remap.json"), encoding="utf-8")
    )
    assert len(manifest["chain"]) >= 2  # one remap per retention run
    q = (
        spark.readStream.format("graal_cdc_log").load(log)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    resumed = spark.read.parquet(out_dir).count()
    # exactly the three new rows — no replay of the compacted head
    # despite the checkpoint predating BOTH compactions
    assert resumed == drained + 3, (drained, resumed)

    # --- job 5: versioned serving table (transaction log, gated as
    # c31) --- the lake's serving layer as a Delta/Iceberg-shaped
    # versioned table: atomic key-merge of each retention cycle's
    # compacted state, snapshot-isolated readers, time travel for
    # audits, vacuum bounding storage.
    from graal_cdc_spark.sinks import versioned_lake as VL

    vt = os.path.join(base, "versioned")
    cur = parse_envelope(
        spark.read.format("graal_cdc_log").load(log)
        .select("seq", "key", "value")
    )
    state_now = latest_by_key(cur, ["key"], "seq").filter(
        F.col("op") != "d"
    ).select("key", "seq")
    VL.commit_append(spark, state_now, vt)                      # v0
    VL.commit_upsert_keys(
        spark,
        state_now.withColumn("seq", F.col("seq") + 1000).limit(2),
        vt,
        ["key"],
    )                                                           # v1
    assert VL.latest_version(vt) == 1
    n_v0 = VL.read_table(spark, vt, version=0).count()
    n_v1 = VL.read_table(spark, vt).count()
    assert n_v1 == n_v0  # merge replaced keys, never duplicated them
    VL.vacuum(vt, keep_versions=2)
    assert VL.read_table(spark, vt, version=0).count() == n_v0

    # --- job 6: incremental downstream consumer of the serving table
    # (graal_vlake streaming source, gated as st19) --- a checkpointed
    # availableNow stream drains the change feed per commit; parked
    # across the next merge, it resumes with ONLY the new commit's
    # deltas (zero replay), so a 100 TB downstream job processes
    # per-commit changes, never full snapshots.
    from graal_cdc_spark.sources import vlake_ds

    vlake_ds.register(spark)
    feed_out = os.path.join(base, "feed_out")
    feed_ck = os.path.join(base, "feed_ck")

    def drain_feed():
        q = (
            spark.readStream.format("graal_vlake").load(vt)
            .writeStream.format("parquet")
            .option("path", feed_out)
            .option("checkpointLocation", feed_ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(feed_out)

    first = drain_feed().count()
    # consumer parked; another merge lands (v2)
    VL.commit_upsert_keys(
        spark,
        state_now.withColumn("seq", F.col("seq") + 2000).limit(1),
        vt,
        ["key"],
    )
    resumed_feed = drain_feed()
    v2_rows = resumed_feed.filter("_commit_version = 2").count()
    assert v2_rows == 2  # one delete + one insert for the merged key
    # zero replay: earlier versions' rows appear exactly once
    assert resumed_feed.count() == first + v2_rows

    # --- job 7 (r12): maintenance that costs consumers nothing ---
    # OPTIMIZE bin-packs the serving table as a data-identical commit
    # (dataChange:false): the parked feed consumer drains NOTHING new.
    VL.commit_optimize(spark, vt, n_files=1)
    after_opt = drain_feed()
    assert after_opt.count() == first + v2_rows, "optimize fed rows!"
    # vacuum with spark= back-fills persisted deltas before deleting
    # the pre-image files, so the FULL feed still answers afterwards
    VL.vacuum(vt, keep_versions=1, spark=spark)
    replayed = VL.read_changes(spark, vt, 0, 2).count()
    assert replayed == first + v2_rows, (replayed, first, v2_rows)
    # column rename: metadata-only, zero rewrites, old files readable
    files_before_rename = set(VL.live_files(vt))
    VL.rename_column(vt, "seq", "version_seq")
    assert set(VL.live_files(vt)) == files_before_rename
    assert VL.read_table(spark, vt).columns == ["key", "version_seq"]

    # --- job 8 (r12): governed, partitioned serving table ---
    # partition columns as a log action (every write keeps the
    # layout; pruned reads skip non-matching partitions from log
    # metadata alone), a CHECK constraint enforced at commit time,
    # and log retention bounding the _vlog directory.
    pt = os.path.join(base, "partitioned_state")
    src = state_now.withColumn(
        "shard", F.pmod(F.crc32(F.col("key")), F.lit(4)).cast("int")
    )
    VL.commit_append(spark, src, pt, partition_by=["shard"])
    VL.add_constraint(pt, "seq_nonneg", "seq >= 0", spark=spark)
    try:
        VL.commit_append(
            spark, src.withColumn("seq", F.lit(-1).cast("long")), pt
        )
        raise AssertionError("constraint admitted violating rows")
    except VL.ConstraintViolation:
        pass  # rejected atomically: no version claimed, no row visible
    one_shard = VL.read_table(spark, pt, prune={"shard": (2, 2)})
    assert one_shard.filter("shard = 2").count() == src.filter(
        "shard = 2"
    ).count()
    for i in range(4):
        VL.commit_upsert_keys(
            spark,
            src.limit(1).withColumn("seq", F.lit(9000 + i).cast("long")),
            pt,
            ["key"],
        )
    VL.vacuum(pt, keep_versions=2, spark=spark)
    expired = VL.expire_log(pt, keep_versions=2)
    assert expired  # the log directory is bounded now
    assert VL.table_partition_cols(pt) == ["shard"]
    assert VL.table_constraints(pt) == {"seq_nonneg": "seq >= 0"}

    # --- job 9 (r13): layout lifecycle on a LIVE table ---
    # (a) incremental OPTIMIZE: a CDC-fed table accumulates a
    # small-file tail; only that tail is rewritten (selected from
    # log row counts, zero I/O to decide) — the well-sized file
    # keeps its exact path; a rerun with nothing to fold writes NO
    # commit (cron-safe). On a fresh unpartitioned table so the
    # tail/bulk split is visible (a hive-partitioned fold re-splits
    # per value and would blur the demo).
    it = os.path.join(base, "incremental_state")
    VL.commit_append(spark, state_now, it, n_files=1)
    for i in range(3):
        VL.commit_append(
            spark,
            state_now.limit(1).withColumn(
                "key", F.concat(F.col("key"), F.lit(f"#t{i}"))
            ),
            it,
            n_files=1,
        )
    before_files = VL.live_files(it)
    thr = max(before_files.values())
    v_inc = VL.commit_optimize(spark, it, n_files=1, small_file_rows=thr)
    assert {p for p, r in before_files.items() if r >= thr} <= set(
        VL.live_files(it)
    )
    assert len(VL.live_files(it)) == 2  # bulk file + folded tail
    assert VL.commit_optimize(
        spark, it, n_files=1, small_file_rows=thr
    ) == v_inc  # no-op rerun: no commit
    # (b) partition EVOLUTION: re-layout the live table as one
    # data-identical commit — old versions keep time-traveling under
    # the old layout, the change feed serves zero rows for it.
    n_now = VL.read_table(spark, pt).count()
    v_rep = VL.commit_repartition(spark, pt, [])  # de-partition
    assert VL.read_table(spark, pt).count() == n_now
    assert VL.table_partition_cols(pt) == []
    assert VL.table_partition_cols(pt, version=v_rep - 1) == ["shard"]
    assert VL.read_changes(spark, pt, v_rep, v_rep).count() == 0

    return {"log_rows": (before, after), "purge": stats,
            "compaction": rewritten,
            "parked_consumer": (drained, resumed),
            "versioned_table": VL.table_history(vt),
            "change_feed": (first, v2_rows)}


def main() -> None:
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark(app_name="lake-ops-example", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, BASE)
    print("lake-ops:", out)
    print("lake-ops: OK")
    spark.stop()


if __name__ == "__main__":
    main()
