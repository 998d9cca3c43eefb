"""Snapshot-then-stream bootstrap — Debezium initial-snapshot parity.

The reference's engines snapshot the source table before tailing the
log (``DebeziumEngineManager.java:76-121``: Debezium's initial
snapshot emits one op='r' envelope per current row, then switches to
streaming). The Spark-native equivalent: seed the replay/log
directory with the snapshot rendered as op='r' envelopes at a seq
BELOW every log seq, so any downstream consumer — compaction,
fan-out pipelines, incremental aggregates — observes
snapshot-then-log through the ONE code path it already has. No
special bootstrap mode exists downstream; the snapshot is just the
oldest segment.

Pairs with ``sources/jdbc.read_jdbc_snapshot`` (range-partitioned
parallel snapshot scan) for a live database, or any batch DataFrame.

Scale: rendering is a pure map (struct → to_json); the seed write is
one parquet append of the snapshot at its natural partitioning. The
constant below-log seq is correct because a snapshot holds ONE row
per key — per-key ordering against the log is all compaction needs
(SURVEY.md §2.3 Q3 semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SNAPSHOT_SEQ = -1


def snapshot_envelopes(
    snapshot: DataFrame,
    key_col: str,
    db: str = "appdb",
    table: str | Column = "users",
    seq: int = SNAPSHOT_SEQ,
) -> DataFrame:
    """Render a snapshot (one row per key) as op='r' CDC envelopes
    ``(seq, key, value)`` — the exact shape ``parse_envelope`` and the
    F3–F7 filter chain consume. ``table`` may be a literal name or a
    Column for per-row routing."""
    tbl = table if isinstance(table, Column) else F.lit(table)
    after = F.struct(*[F.col(c) for c in snapshot.columns])
    payload = F.struct(
        F.lit("r").alias("op"),
        after.alias("after"),
        F.struct(F.lit(db).alias("db"), tbl.alias("table")).alias("source"),
    )
    return snapshot.select(
        F.lit(seq).cast("long").alias("seq"),
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(payload.alias("payload"))).alias("value"),
    )


def bootstrap_replay_dir(snapshot_env: DataFrame, replay_dir: str) -> None:
    """Seed a replay directory with the snapshot as its oldest
    segment. Must run before the first log chunk lands — the file
    source replays segments in mtime order, and the snapshot must be
    segment zero."""
    import os

    from graal_cdc_spark.streaming.replay import append_chunk

    if os.path.isdir(replay_dir) and any(
        n.endswith(".parquet") for n in os.listdir(replay_dir)
    ):
        raise ValueError(
            f"bootstrap_replay_dir: {replay_dir} already has log "
            "segments; the snapshot must be the oldest segment"
        )
    append_chunk(snapshot_env, replay_dir)
