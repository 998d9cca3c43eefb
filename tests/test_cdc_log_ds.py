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


def test_batch_write_round_trip_and_append(spark, log_dir, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, "c", "z")],
        "seq long, key string, value string",
    )
    # Python data sources accept only Append/Overwrite save modes;
    # append IS the log's native semantic
    df.write.mode("append").format("graal_cdc_log").save(log_dir)
    back = spark.read.format("graal_cdc_log").load(log_dir)
    assert {(r.seq, r.key, r.value) for r in back.collect()} == {
        (1, "a", "x"), (2, "b", None), (3, "c", "z"),
    }
    # second write APPENDS new sealed segments (log semantics)
    spark.createDataFrame(
        [(4, "d", "w")], "seq long, key string, value string"
    ).write.mode("append").format("graal_cdc_log").save(log_dir)
    assert spark.read.format("graal_cdc_log").load(log_dir).count() == 4
    # no staged leftovers
    staging = os.path.join(log_dir, ".staging")
    assert not os.path.isdir(staging) or not os.listdir(staging)


def test_batch_write_overwrite_rejected(spark, log_dir):
    df = spark.createDataFrame(
        [(1, "a", "x")], "seq long, key string, value string"
    )
    with pytest.raises(Exception, match="append-only"):
        df.write.mode("overwrite").format("graal_cdc_log").save(log_dir)


def test_stream_writer_epoch_commit_idempotent(tmp_path):
    """A replayed micro-batch (same batchId after a crash between sink
    commit and checkpoint advance) must publish NOTHING the second
    time — the epoch marker makes the sink exactly-once."""
    from graal_cdc_spark.sources.cdc_log_ds import (
        CdcLogStreamWriter,
        _stage_rows,
    )
    from pyspark.sql import Row

    log = str(tmp_path / "log")
    w = CdcLogStreamWriter({"path": log}, overwrite=False)
    rows = [Row(seq=1, key="a", value="x"), Row(seq=2, key="b", value="y")]
    m1 = _stage_rows(log, iter(rows))
    w.commit([m1], batchId=7)
    assert len(DS._segments(log)) == 1
    # replay of the same epoch: new staged file, same batchId
    m2 = _stage_rows(log, iter(rows))
    w.commit([m2], batchId=7)
    assert len(DS._segments(log)) == 1  # nothing new published
    assert not os.listdir(os.path.join(log, ".staging"))
    # next epoch publishes normally
    m3 = _stage_rows(log, iter(rows))
    w.commit([m3], batchId=8)
    assert len(DS._segments(log)) == 2


def test_stream_relay_log_to_log(spark, tmp_path, log_dir):
    """End-to-end relay: readStream from one log, writeStream into
    another through the same connector — the downstream log holds
    exactly the upstream rows (the fan-out pattern the reference runs
    between its queue and consumers)."""
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    DS.append_segment(log_dir, [(1, "a", "x"), (2, "b", None)])
    DS.append_segment(log_dir, [(3, "c", "z")], seal=True)
    q = (
        spark.readStream.format("graal_cdc_log")
        .load(log_dir)
        .writeStream.format("graal_cdc_log")
        .option("path", dst)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.seq, r.key, r.value)
        for r in spark.read.format("graal_cdc_log").load(dst).collect()
    }
    assert got == {(1, "a", "x"), (2, "b", None), (3, "c", "z")}


def test_max_lines_per_trigger_batches(spark, tmp_path, log_dir):
    """The line-granular rate limit yields deterministic micro-batch
    boundaries: 10 lines at maxLinesPerTrigger=4 -> batches of
    4/4/2, all rows delivered exactly once."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    DS.append_segment(log_dir, [(i, f"k{i}", "v") for i in range(6)])
    DS.append_segment(log_dir, [(i, f"k{i}", "v") for i in range(6, 10)],
                      seal=True)
    q = (
        spark.readStream.format("graal_cdc_log")
        .option("maxLinesPerTrigger", "4")
        .load(log_dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    import glob

    got = spark.read.parquet(out)
    assert sorted(r.seq for r in got.collect()) == list(range(10))
    # one committed offset entry per non-empty batch: ceil(10/4) == 3+
    offsets = glob.glob(os.path.join(ck, "offsets", "*"))
    assert len(offsets) >= 3


def test_bad_records_null_mode_feeds_f4_filter(spark, log_dir, tmp_path):
    """badRecords=null quarantines corrupt lines as (null, null, raw)
    instead of failing the scan — and the F4 malformed filter drops
    them downstream (fail mode raises)."""
    seg = os.path.join(log_dir, "segment-00000000.jsonl")
    os.makedirs(log_dir, exist_ok=True)
    with open(seg, "w", encoding="utf-8") as f:
        f.write('{"seq": 1, "key": "a", "value": "x"}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"seq": 2, "key": "b", "value": "y"}\n')

    rows = (
        spark.read.format("graal_cdc_log")
        .option("badRecords", "null")
        .load(log_dir)
        .collect()
    )
    assert len(rows) == 3
    bad = [r for r in rows if r.seq is None]
    assert len(bad) == 1 and bad[0].value == "THIS IS NOT JSON"

    with pytest.raises(Exception, match="corrupt log line"):
        spark.read.format("graal_cdc_log").load(log_dir).collect()


def test_available_now_with_cap_drains_one_batch_per_run(
    spark, tmp_path, log_dir
):
    """Pinned semantic: Trigger.AvailableNow snapshots ONE capped
    latestOffset as the run target, so each run with maxLinesPerTrigger
    drains exactly one capped batch (repeated runs make progress from
    the checkpoint; an uncapped availableNow drains fully)."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    DS.append_segment(log_dir, [(i, f"k{i}", "v") for i in range(10)])

    def run_once():
        q = (
            spark.readStream.format("graal_cdc_log")
            .option("maxLinesPerTrigger", "4")
            .load(log_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_once()
    assert spark.read.parquet(out).count() == 4
    run_once()
    assert spark.read.parquet(out).count() == 8
    run_once()
    assert sorted(
        r.seq for r in spark.read.parquet(out).collect()
    ) == list(range(10))


def test_segment_naming_survives_retention_gap(spark, log_dir):
    """After retention deletes old segments, new names must come from
    max-index+1, never the segment COUNT — count-based naming would
    silently overwrite a surviving sealed segment."""
    for i in range(3):
        DS.append_segment(log_dir, [(i, f"k{i}", "v")], seal=True)
    os.remove(os.path.join(log_dir, "segment-00000000.jsonl"))  # retention
    f = DS.append_segment(log_dir, [(9, "k9", "v")], seal=True)
    assert f.endswith("segment-00000003.jsonl")
    rows = sorted(
        r.seq
        for r in spark.read.format("graal_cdc_log").load(log_dir).collect()
    )
    assert rows == [1, 2, 9]  # nothing clobbered

    # the writers allocate the same way
    spark.createDataFrame(
        [(20, "x", "y")], "seq long, key string, value string"
    ).write.mode("append").format("graal_cdc_log").save(log_dir)
    rows = sorted(
        r.seq
        for r in spark.read.format("graal_cdc_log").load(log_dir).collect()
    )
    assert rows == [1, 2, 9, 20]


def test_stream_writer_crash_between_marker_and_publish(tmp_path):
    """Crash-safety of the two-phase epoch commit: once the intent
    marker exists, a replay COMPLETES the recorded plan exactly once —
    whether the crash happened before any rename, mid-loop, or after
    all renames."""
    import json as _json

    from graal_cdc_spark.sources.cdc_log_ds import (
        CdcLogStreamWriter,
        _stage_rows,
    )
    from pyspark.sql import Row

    log = str(tmp_path / "log")
    w = CdcLogStreamWriter({"path": log}, overwrite=False)
    rows = [Row(seq=1, key="a", value="x")]
    rows2 = [Row(seq=2, key="b", value="y")]

    # simulate: marker written, crash BEFORE the renames ran
    m1 = _stage_rows(log, iter(rows))
    m2 = _stage_rows(log, iter(rows2))
    plan = [
        (m1.staged, "segment-00000000.jsonl"),
        (m2.staged, "segment-00000001.jsonl"),
    ]
    os.makedirs(os.path.join(log, ".epochs"), exist_ok=True)
    with open(os.path.join(log, ".epochs", "3.json"), "w") as f:
        _json.dump({"plan": plan}, f)
    # partial crash: first rename completed, second did not
    os.rename(m1.staged, os.path.join(log, "segment-00000000.jsonl"))

    # replayed epoch 3 with fresh duplicate staging
    d1 = _stage_rows(log, iter(rows))
    d2 = _stage_rows(log, iter(rows2))
    w.commit([d1, d2], batchId=3)

    segs = DS._segments(log)
    assert segs == ["segment-00000000.jsonl", "segment-00000001.jsonl"]
    assert not os.listdir(os.path.join(log, ".staging"))
    # content appears exactly once
    seqs = []
    for seg in segs:
        with open(os.path.join(log, seg)) as f:
            seqs += [_json.loads(l)["seq"] for l in f if l.strip()]
    assert sorted(seqs) == [1, 2]


def test_stream_writer_cleans_empty_partition_staging(tmp_path):
    from graal_cdc_spark.sources.cdc_log_ds import (
        CdcLogStreamWriter,
        _stage_rows,
    )
    from pyspark.sql import Row

    log = str(tmp_path / "log")
    w = CdcLogStreamWriter({"path": log}, overwrite=False)
    empty = _stage_rows(log, iter([]))
    full = _stage_rows(log, iter([Row(seq=1, key="a", value="x")]))
    w.commit([empty, full], batchId=0)
    assert not os.listdir(os.path.join(log, ".staging"))
    assert len(DS._segments(log)) == 1


# --- compact_log: Kafka-style retention over the segment log ---


def _read_all(spark, log):
    return {
        (r.seq, r.key, r.value)
        for r in spark.read.format("graal_cdc_log").load(log).collect()
    }


def test_compact_log_latest_per_key_head_verbatim_tail(spark, log_dir):
    DS.append_segment(log_dir, [
        (1, "a", "a1"), (2, "b", "b1"), (3, "a", "a2"),
    ], seal=True)
    DS.append_segment(log_dir, [
        (4, "b", None),          # tombstone is b's latest head record
        (5, "c", "c1"),
        (6, "a", "a3"), (7, "c", "c2"),  # tail: kept verbatim
    ], seal=True)
    DS.compact_log(spark, log_dir, upto_seq=5)
    assert _read_all(spark, log_dir) == {
        (3, "a", "a2"),   # a's latest head survives
        (4, "b", None),   # tombstone RETAINED (late joiners see delete)
        (5, "c", "c1"),
        (6, "a", "a3"), (7, "c", "c2"),
    }
    # idempotent: compacting again at the same boundary is a no-op
    DS.compact_log(spark, log_dir, upto_seq=5)
    assert len(_read_all(spark, log_dir)) == 5


def test_compact_log_drops_keyless_head_keeps_keyless_tail(spark, log_dir):
    DS.append_segment(log_dir, [
        (1, None, "junk-head"), (2, "a", "a1"),
        (3, None, "junk-tail"), (4, "a", "a2"),
    ], seal=True)
    DS.compact_log(spark, log_dir, upto_seq=2)
    assert _read_all(spark, log_dir) == {
        (2, "a", "a1"), (3, None, "junk-tail"), (4, "a", "a2"),
    }


def test_compact_log_crash_repair_restores_old_log(spark, log_dir):
    import shutil

    DS.append_segment(log_dir, [(1, "a", "a1"), (2, "a", "a2")], seal=True)
    before = _read_all(spark, log_dir)
    # simulate a crash between the two renames: the old log was moved
    # aside and the new one never landed
    shutil.move(log_dir, log_dir + ".compact-old")
    DS.compact_log(spark, log_dir, upto_seq=2)
    assert _read_all(spark, log_dir) == {(2, "a", "a2")}
    assert not os.path.isdir(log_dir + ".compact-old")
    assert before == {(1, "a", "a1"), (2, "a", "a2")}


def test_compact_log_roundtrips_envelope_json(spark, log_dir):
    """Values survive the rewrite byte-identically (JSON strings with
    quotes/unicode) — the rewrite must not re-encode payloads."""
    v = '{"payload":{"op":"c","after":{"x":"q\\"uoteé"}}}'
    DS.append_segment(log_dir, [(1, "k", v), (2, "k", v)], seal=True)
    DS.compact_log(spark, log_dir, upto_seq=2)
    assert _read_all(spark, log_dir) == {(2, "k", v)}


def test_compact_log_matches_reference_on_random_logs(spark, log_dir):
    """Property (fixed seeds, real Spark round-trips are slow so not
    hypothesis-driven): compact_log over randomized logs — duplicate
    (key, seq) pairs, null keys, tombstones, multiple segments, and a
    randomized boundary — equals a sequential python reference of the
    retention contract."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        d = f"{log_dir}-{seed}"
        rows = []
        for seq in range(1, rng.randint(10, 40)):
            key = rng.choice(["a", "b", "c", "d", None])
            value = rng.choice([None, f"v{seq}", f"w{seq}"])
            rows.append((seq, key, value))
        # duplicate (key, seq) from an at-least-once producer
        if len(rows) > 3:
            rows.append(rows[2])
        for i in range(0, len(rows), 7):
            DS.append_segment(d, rows[i : i + 7], seal=True)
        upto = rng.randint(1, max(r[0] for r in rows))
        DS.compact_log(spark, d, upto)

        # reference: latest per key in head (ties -> max value), drop
        # keyless head rows, tail verbatim
        latest = {}
        for seq, key, value in rows:
            if seq > upto or key is None:
                continue
            prev = latest.get(key)
            cand = (seq, value)
            if prev is None or cand[0] > prev[0] or (
                cand[0] == prev[0]
                and (prev[1] is None or (cand[1] or "") > (prev[1] or ""))
            ):
                latest[key] = cand
        want = sorted(
            [(s, k, v) for k, (s, v) in latest.items()]
            + [(s, k, v) for s, k, v in rows if s > upto]
        )
        got = sorted(
            (r.seq, r.key, r.value)
            for r in spark.read.format("graal_cdc_log").load(d).collect()
        )
        assert got == want, f"seed {seed} upto {upto}"


def _drain(spark, log, out, ck):
    """One availableNow pass: read everything currently in the log."""
    q = (
        spark.readStream.format("graal_cdc_log")
        .load(log)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _sunk(spark, out):
    return [
        (r.seq, r.key, r.value)
        for r in spark.read.parquet(out).collect()
    ]


def test_compact_log_offset_preservation_drained_consumer(
    spark, tmp_path, log_dir
):
    """VERDICT r8 #7 lifecycle: stream reads, compaction runs, stream
    resumes from the SAME checkpoint. A consumer that had fully
    drained the log before compaction resumes with ZERO replay (the
    remap marks the compacted head consumed; preserved tail names
    carry their offsets) — and later appends still flow."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    DS.append_segment(log_dir, [(1, "a", "a1"), (2, "b", "b1")], seal=True)
    DS.append_segment(log_dir, [(3, "a", "a2"), (4, "c", "c1")], seal=True)
    DS.append_segment(log_dir, [(5, "b", "b2"), (6, "c", "c2")], seal=True)
    _drain(spark, log_dir, out, ck)
    assert len(_sunk(spark, out)) == 6

    DS.compact_log(spark, log_dir, upto_seq=4)
    # resume from the same checkpoint: nothing new -> NOTHING replayed
    _drain(spark, log_dir, out, ck)
    assert len(_sunk(spark, out)) == 6, "drained consumer must not replay"

    # appends after compaction still flow to the same consumer
    DS.append_segment(log_dir, [(7, "d", "d1")], seal=True)
    _drain(spark, log_dir, out, ck)
    got = _sunk(spark, out)
    assert len(got) == 7 and (7, "d", "d1") in got


def test_compact_log_offset_preservation_midtail_consumer(
    spark, tmp_path, log_dir
):
    """A consumer parked mid-TAIL (head fully drained, tail segment
    partially read) resumes without head replay: preserved tail
    segments keep their names so the line offset carries over; the
    only acceptable extra rows are at-least-once duplicates, and here
    there are NONE because the preserved file is byte-identical."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    DS.append_segment(log_dir, [(1, "a", "a1"), (2, "b", "b1")], seal=True)
    DS.append_segment(log_dir, [(3, "a", "a2"), (4, "c", "c1")], seal=True)
    # tail segment, written before the consumer's first pass
    DS.append_segment(log_dir, [(5, "b", "b2"), (6, "c", "c2")], seal=True)
    _drain(spark, log_dir, out, ck)
    assert len(_sunk(spark, out)) == 6

    DS.compact_log(spark, log_dir, upto_seq=4)
    # append INTO the preserved tail era after compaction
    DS.append_segment(log_dir, [(7, "a", "a3")], seal=True)
    _drain(spark, log_dir, out, ck)
    got = _sunk(spark, out)
    # exactly the one new row — no head replay, no tail re-read
    assert sorted(got)[-1] == (7, "a", "a3")
    assert len(got) == 7


def test_compact_log_midhead_consumer_replays_compacted_head_only(
    spark, tmp_path, log_dir
):
    """A consumer parked MID-HEAD replays the compacted head (O(live
    keys)) — never loses rows, and duplicates stay within the
    at-least-once contract (only rows it already saw can repeat)."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    DS.append_segment(log_dir, [(1, "a", "a1"), (2, "b", "b1")], seal=True)
    # consumer drains ONLY the first segment
    _drain(spark, log_dir, out, ck)
    assert len(_sunk(spark, out)) == 2
    # more head + tail arrives, then compaction
    DS.append_segment(log_dir, [(3, "a", "a2"), (4, "c", "c1")], seal=True)
    DS.append_segment(log_dir, [(5, "b", "b2"), (6, "c", "c2")], seal=True)
    DS.compact_log(spark, log_dir, upto_seq=4)

    _drain(spark, log_dir, out, ck)
    got = _sunk(spark, out)
    keyed = {}
    for seq, k, v in got:
        keyed[k] = max(keyed.get(k, 0), seq)
    # no loss: every key's latest state reached the consumer
    assert keyed == {"a": 3, "b": 5, "c": 6}
    # bounded replay: the compacted head is latest-per-key, so the
    # sink holds at most first-pass rows + compacted head + tail
    assert len(got) <= 2 + 3 + 2


def test_compact_log_chained_remap_two_compactions_zero_replay(
    spark, tmp_path, log_dir
):
    """VERDICT r9 #4 lifecycle: write → compact → write → compact →
    resume a checkpoint that last committed BEFORE the first
    compaction. The remap CHAIN translates transitively: a consumer
    that had fully drained every rewritten generation resumes with
    zero replay — only the genuinely new rows arrive."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    DS.append_segment(log_dir, [(1, "a", "a1"), (2, "b", "b1")], seal=True)
    DS.append_segment(log_dir, [(3, "a", "a2"), (4, "c", "c1")], seal=True)
    _drain(spark, log_dir, out, ck)
    assert len(_sunk(spark, out)) == 4

    DS.compact_log(spark, log_dir, upto_seq=4)       # gen 1
    DS.append_segment(log_dir, [(5, "b", "b2"), (6, "c", "c2")], seal=True)
    DS.compact_log(spark, log_dir, upto_seq=4)       # gen 2 (tail preserved)

    # checkpoint predates BOTH compactions; chain = [R1, R2]
    _drain(spark, log_dir, out, ck)
    got = _sunk(spark, out)
    assert sorted(got)[-2:] == [(5, "b", "b2"), (6, "c", "c2")]
    assert len(got) == 6, "transitive translation must not replay the head"

    # a third write still flows on the same checkpoint
    DS.append_segment(log_dir, [(7, "d", "d1")], seal=True)
    _drain(spark, log_dir, out, ck)
    assert len(_sunk(spark, out)) == 7


def test_compact_log_chained_remap_head_compacted_twice(
    spark, tmp_path, log_dir
):
    """Both compactions REWRITE (second one consumes the first's
    compacted head plus a newer segment the consumer also drained):
    translation walks gen1's outputs into gen2's inputs."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    DS.append_segment(log_dir, [(1, "a", "a1"), (2, "b", "b1")], seal=True)
    _drain(spark, log_dir, out, ck)
    DS.compact_log(spark, log_dir, upto_seq=2)       # gen 1
    DS.append_segment(log_dir, [(3, "a", "a2")], seal=True)
    _drain(spark, log_dir, out, ck)                  # drains gen1 head + new seg
    n_before = len(_sunk(spark, out))
    DS.compact_log(spark, log_dir, upto_seq=3)       # gen 2: rewrites head + seg
    _drain(spark, log_dir, out, ck)
    assert len(_sunk(spark, out)) == n_before, "fully drained: zero replay"


def test_compact_log_never_reuses_rewritten_segment_names(
    spark, tmp_path, log_dir
):
    """After a compaction that rewrites EVERY segment, the directory
    holds only compacted names with small numeric tails; naming must
    still start above the rewritten indexes (a reused name would let
    a parked consumer resume mid-file inside different content — data
    SKIP, worse than replay)."""
    DS.append_segment(log_dir, [(1, "a", "a1")], seal=True)   # segment-00000000
    DS.append_segment(log_dir, [(2, "b", "b1")], seal=True)   # segment-00000001
    DS.compact_log(spark, log_dir, upto_seq=2)  # rewrites both
    live = DS._segments(log_dir)
    assert all("+c" in n for n in live), live
    new = os.path.basename(DS.append_segment(log_dir, [(3, "c", "c1")], seal=True))
    assert new == "segment-00000002.jsonl", new
    # and the writer path takes the same high-water mark
    spark.createDataFrame([(4, "d", "d1")], "seq long, key string, value string") \
        .write.format("graal_cdc_log").mode("append").save(log_dir)
    assert "segment-00000000.jsonl" not in DS._segments(log_dir)
    assert "segment-00000001.jsonl" not in DS._segments(log_dir)


def test_retention_reruns_never_strand_parked_consumer(
    spark, tmp_path, log_dir
):
    """VERDICT r10 #5 golden (promoted from examples/lake_operations.py
    job 4): a LIVE readStream consumer checkpointed before a SERIES of
    retention runs resumes with zero head replay — each compact_log
    appends its remap to the chain and the reader translates its old
    offsets transitively — and fresh traffic appended after both runs
    arrives exactly once. Retention can run on any cadence without
    coordinating with consumers."""
    import json

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    # a realistically shaped log: four sealed segments, churning keys
    for s in range(4):
        DS.append_segment(
            log_dir,
            [
                (s * 10 + i, f"k{i % 5}", f"v{s * 10 + i}")
                for i in range(1, 8)
            ],
            seal=True,
        )
    _drain(spark, log_dir, out, ck)
    drained = len(_sunk(spark, out))
    assert drained == 28

    # two retention cycles over fully drained data, then fresh traffic
    DS.compact_log(spark, log_dir, upto_seq=20)
    DS.compact_log(spark, log_dir, upto_seq=36)
    DS.append_segment(
        log_dir, [(100 + i, f"n{i}", f"nv{i}") for i in range(1, 4)],
        seal=True,
    )
    with open(
        os.path.join(log_dir, DS.REMAP_NAME), encoding="utf-8"
    ) as f:
        manifest = json.load(f)
    assert len(manifest["chain"]) >= 2  # one remap per retention run

    _drain(spark, log_dir, out, ck)
    got = _sunk(spark, out)
    # exactly the three new rows — no replay of the compacted head
    # despite the checkpoint predating BOTH compactions
    assert len(got) == drained + 3, (drained, len(got))
    assert sorted(got)[-3:] == [
        (101, "n1", "nv1"),
        (102, "n2", "nv2"),
        (103, "n3", "nv3"),
    ]


def test_legacy_manifest_derives_naming_high_water_mark(spark, log_dir):
    """ADVICE r10 #4: a log LAST compacted by pre-round-10 code has a
    legacy single-remap manifest with NO max_index, and its live
    directory may hold only compacted-head names (small tails) — the
    high-water mark must be derived from the numeric tails of the
    manifest's old_lines/rewritten names, never left at -1 (a reused
    rewritten name is the data-skip hazard _next_index_for prevents)."""
    import json

    DS.append_segment(log_dir, [(1, "a", "a1")], seal=True)   # segment-00000000
    DS.append_segment(log_dir, [(2, "a", "a2")], seal=True)   # segment-00000001
    DS.compact_log(spark, log_dir, upto_seq=2)  # rewrites both
    manifest_path = os.path.join(log_dir, DS.REMAP_NAME)
    with open(manifest_path, encoding="utf-8") as f:
        m = json.load(f)
    # rewrite as the legacy format: bare single-remap dict, no chain,
    # no max_index (exactly what pre-chained compact_log persisted)
    legacy = {k: v for k, v in m["chain"][-1].items()}
    legacy.pop("max_index", None)
    with open(manifest_path, "w", encoding="utf-8") as f:
        json.dump(legacy, f)

    chain, hw = DS._load_remap_chain(log_dir)
    assert len(chain) == 1
    assert hw >= 1, f"high-water mark must cover segment-00000001, got {hw}"
    assert DS._next_index_for(log_dir) >= 2
    new = os.path.basename(
        DS.append_segment(log_dir, [(3, "b", "b1")], seal=True)
    )
    assert new == "segment-00000002.jsonl", new
    # and a NEW-code compaction folds the derived mark forward
    DS.compact_log(spark, log_dir, upto_seq=3)
    _, hw2 = DS._load_remap_chain(log_dir)
    assert hw2 >= 2


def test_stream_reader_translates_stale_end_offsets(spark, log_dir):
    """ADVICE r9 (medium): a WAL-planned-but-uncommitted batch replayed
    after restart carries a checkpointed END offset that can still name
    segments compact_log deleted; partitions() must never plan a read
    of a missing file (the stream would wedge on FileNotFoundError
    forever). A fully-drained stale end maps onto the rewritten head
    (no-op batch); a mid-head stale end defers to the next batch."""
    DS.append_segment(log_dir, [(1, "a", "a1"), (2, "b", "b1")], seal=True)
    DS.append_segment(log_dir, [(3, "a", "a2"), (4, "c", "c1")], seal=True)
    DS.compact_log(spark, log_dir, upto_seq=4)
    reader = DS.CdcLogStreamReader({"path": log_dir})

    stale_full = {"segment-00000000.jsonl": 2, "segment-00000001.jsonl": 2}
    parts = reader.partitions({"pos": dict(stale_full)}, {"pos": dict(stale_full)})
    for p in parts:
        assert os.path.exists(os.path.join(log_dir, p.segment)) or p.end == 0
        list(reader.read(p))  # must not raise FileNotFoundError

    # mid-head end: stale names drop from the end; nothing read yet,
    # the head arrives in the NEXT planned batch instead
    stale_mid = {"segment-00000000.jsonl": 1}
    parts = reader.partitions({"pos": {}}, {"pos": dict(stale_mid)})
    for p in parts:
        assert os.path.exists(os.path.join(log_dir, p.segment)) or p.end == 0
        list(reader.read(p))


def test_compact_remap_old_lines_counts_raw_lines(spark, log_dir):
    """ADVICE r9: checkpoint offsets are RAW line indices (blank lines
    tolerated but counted); the remap's drained check must use the
    same base. A consumer parked before records that FOLLOW a blank
    line must NOT pass as fully drained (that skipped unread data)."""
    DS.append_segment(log_dir, [(1, "a", "a1")], seal=True)
    # blank line injected mid-segment (crash/manual-edit tolerance)
    with open(os.path.join(log_dir, "segment-00000000.jsonl"), "a") as f:
        f.write("\n")
    DS.append_segment(log_dir, [(2, "b", "b1")])  # same segment, line 2
    DS.compact_log(spark, log_dir, upto_seq=2)
    chain, _ = DS._load_remap_chain(log_dir)
    assert chain[-1]["old_lines"] == {"segment-00000000.jsonl": 3}

    reader = DS.CdcLogStreamReader({"path": log_dir})
    # parked at raw offset 2: saw seq 1 (line 0) and the blank (line 1)
    # but NOT seq 2 (line 2) — must fall back to head replay
    s = reader._translate_compacted({"segment-00000000.jsonl": 2})
    assert s == {}, s
    # parked at raw offset 3 (all lines): fully drained -> zero replay
    s = reader._translate_compacted({"segment-00000000.jsonl": 3})
    live = DS._segments(log_dir)
    assert s and all(name in live for name in s), s
