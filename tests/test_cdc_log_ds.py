"""Custom ``graal_cdc_log`` Python DataSource — batch + streaming.

The source plugin is the Spark-native analog of the reference's
Debezium-engine queue tailer (segment-rolled log directory, named
cursor = checkpointed offset). These tests cover the full lifecycle:
batch read, per-segment partitioning, incremental micro-batches,
exactly-once restart from checkpoint, and drop-in compatibility with
the engine's envelope data plane.
"""

from __future__ import annotations

import os

import pytest

from graal_cdc_spark.sources import cdc_log_ds as DS


@pytest.fixture()
def log_dir(tmp_path, spark):
    DS.register(spark)
    return str(tmp_path / "log")


def _start(spark, log, out, ck):
    return (
        spark.readStream.format("graal_cdc_log")
        .load(log)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )


def test_batch_read_and_schema(spark, log_dir):
    DS.append_segment(log_dir, [(1, "k1", '{"a":1}'), (2, "k2", None)])
    DS.append_segment(log_dir, [(3, "k3", '{"b":2}')], seal=True)
    df = spark.read.format("graal_cdc_log").load(log_dir)
    assert df.schema.simpleString() == (
        "struct<seq:bigint,key:string,value:string>"
    )
    rows = {r.seq: (r.key, r.value) for r in df.collect()}
    assert rows == {
        1: ("k1", '{"a":1}'),
        2: ("k2", None),  # tombstone survives as NULL value
        3: ("k3", '{"b":2}'),
    }


def test_batch_partitions_per_segment(spark, log_dir):
    for i in range(4):
        DS.append_segment(log_dir, [(i, f"k{i}", "v")], seal=True)
    df = spark.read.format("graal_cdc_log").load(log_dir)
    # one input partition per sealed segment — the unit of parallelism
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 4


def test_append_segment_roll_contract(log_dir):
    f1 = DS.append_segment(log_dir, [(1, "a", "x")])
    f2 = DS.append_segment(log_dir, [(2, "b", "y")])  # same active segment
    f3 = DS.append_segment(log_dir, [(3, "c", "z")], seal=True)
    assert f1 == f2 and f3 != f2
    assert len([n for n in os.listdir(log_dir) if n.endswith(".jsonl")]) == 2


def test_stream_incremental_and_restart_exactly_once(spark, tmp_path, log_dir):
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    DS.append_segment(log_dir, [(1, "k1", "a"), (2, "k2", None)])
    DS.append_segment(log_dir, [(3, "k3", "c")], seal=True)

    q = _start(spark, log_dir, out, ck)
    q.processAllAvailable()
    # active-segment growth picked up by the next trigger
    DS.append_segment(log_dir, [(4, "k4", "d")])
    q.processAllAvailable()
    q.stop()
    assert sorted(r.seq for r in spark.read.parquet(out).collect()) == [
        1, 2, 3, 4,
    ]

    # data lands while the query is DOWN; restart must deliver exactly
    # the unseen lines (checkpointed offsets = the named tailer cursor)
    DS.append_segment(log_dir, [(5, "k5", "e")], seal=True)
    q2 = _start(spark, log_dir, out, ck)
    q2.processAllAvailable()
    q2.stop()
    assert sorted(r.seq for r in spark.read.parquet(out).collect()) == [
        1, 2, 3, 4, 5,
    ]


def test_stream_idle_trigger_no_rows(spark, tmp_path, log_dir):
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    DS.append_segment(log_dir, [(1, "k", "v")])
    q = _start(spark, log_dir, out, ck)
    q.processAllAvailable()
    q.processAllAvailable()  # no new data: empty planned batch is fine
    q.stop()
    assert spark.read.parquet(out).count() == 1


def test_source_feeds_envelope_data_plane(spark, log_dir):
    """The plugin's frame is the canonical cdc_events shape: the F3–F7
    parse/filter chain consumes it unchanged."""
    from graal_cdc_spark.cdc.envelope import parse_envelope
    from graal_cdc_spark.session import configure

    configure(spark)
    good = (
        '{"payload":{"op":"c","before":null,"after":{"v":1},'
        '"source":{"db":"appdb","table":"users"}}}'
    )
    DS.append_segment(
        log_dir,
        [
            (10, "u1", good),
            (11, "u1", None),  # tombstone -> F3
            (12, "u2", '{"noPayload":true}'),  # malformed -> F4
        ],
    )
    df = spark.read.format("graal_cdc_log").load(log_dir)
    parsed = parse_envelope(df)
    rows = parsed.collect()
    assert len(rows) == 1
    assert (rows[0].op, rows[0].db, rows[0].tbl) == ("c", "appdb", "users")
