"""``graal_vlake`` streaming source — per-commit change-feed
micro-batches over the versioned table format: full drain, parked
consumer resume with zero replay, skipchangecommits, vacuum contract,
feed-fold == snapshot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graal_cdc_spark.sinks import versioned_lake as VL
from graal_cdc_spark.sources import vlake_ds


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _drain(spark, table, out, ckpt, **options):
    """availableNow drain into a parquet sink (checkpoint-recoverable,
    unlike the memory sink); returns the cumulative sink contents."""
    vlake_ds.register(spark)
    reader = spark.readStream.format("graal_vlake")
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load(table)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_stream_drains_full_change_feed(spark, tmp_path):
    t = str(tmp_path / "t")
    VL.commit_append(spark, _df(spark, [(1, "a"), (2, "b")]), t)
    VL.commit_upsert_keys(spark, _df(spark, [(1, "A"), (3, "c")]), t, ["k"])
    VL.commit_delete_where(spark, t, "k = 2")
    got = {
        tuple(r)
        for r in _drain(spark, t, str(tmp_path / "out"), str(tmp_path / "ck")).collect()
    }
    assert got == {
        (1, "a", "insert", 0),
        (2, "b", "insert", 0),
        (1, "a", "delete", 1),
        (1, "A", "insert", 1),
        (3, "c", "insert", 1),
        (2, "b", "delete", 2),
    }


def test_parked_consumer_resumes_without_replay(spark, tmp_path):
    """A consumer checkpointed at version N sees ONLY commits > N on
    restart — the Delta-streaming offset contract."""
    t = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    VL.commit_append(spark, _df(spark, [(1, "a")]), t)
    first = _drain(spark, t, out, ck).collect()
    assert {tuple(r) for r in first} == {(1, "a", "insert", 0)}
    # consumer parked; table moves on
    VL.commit_append(spark, _df(spark, [(2, "b")]), t)
    VL.commit_upsert_keys(spark, _df(spark, [(1, "A")]), t, ["k"])
    resumed = _drain(spark, t, out, ck).collect()  # cumulative sink
    got = sorted(tuple(r) for r in resumed)
    # zero head replay: the sink holds version 0's insert exactly ONCE
    # plus the two new commits' deltas — 4 rows, no duplicates
    assert got == sorted(
        [
            (1, "a", "insert", 0),
            (2, "b", "insert", 1),
            (1, "a", "delete", 2),
            (1, "A", "insert", 2),
        ]
    )


def test_skipchangecommits_streams_appends_only(spark, tmp_path):
    t = str(tmp_path / "t")
    VL.commit_append(spark, _df(spark, [(1, "a")]), t)
    VL.commit_upsert_keys(spark, _df(spark, [(1, "A")]), t, ["k"])
    VL.commit_append(spark, _df(spark, [(2, "b")]), t)
    got = {
        tuple(r)
        for r in _drain(
            spark, t, str(tmp_path / "out"), str(tmp_path / "ck"),
            skipchangecommits="true",
        ).collect()
    }
    assert got == {(1, "a", "insert", 0), (2, "b", "insert", 2)}


def test_stream_feed_fold_equals_head_snapshot(spark, tmp_path):
    t = str(tmp_path / "t")
    VL.commit_append(
        spark, _df(spark, [(i, f"v{i}") for i in range(20)]), t, n_files=3
    )
    VL.commit_upsert_keys(
        spark, _df(spark, [(3, "X"), (25, "new")]), t, ["k"]
    )
    VL.commit_delete_where(spark, t, "k % 5 = 0")
    feed = _drain(spark, t, str(tmp_path / "out"), str(tmp_path / "ck"))
    ins = feed.filter("_change_type = 'insert'").select("k", "v")
    dele = feed.filter("_change_type = 'delete'").select("k", "v")
    folded = {(r.k, r.v) for r in ins.exceptAll(dele).collect()}
    head = {(r.k, r.v) for r in VL.read_table(spark, t).collect()}
    assert folded == head


def test_vacuumed_preimage_fails_cleanly(spark, tmp_path):
    t = str(tmp_path / "t")
    VL.commit_append(spark, _df(spark, [(1, "a")]), t, n_files=1)
    VL.commit_upsert_keys(spark, _df(spark, [(1, "A")]), t, ["k"])
    VL.commit_append(spark, _df(spark, [(9, "z")]), t)
    VL.vacuum(t, keep_versions=2)  # v0's file (v1's pre-image) gone
    vlake_ds.register(spark)
    q = (
        spark.readStream.format("graal_vlake")
        .load(t)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="vacuumed"):
        q.awaitTermination()
    # a consumer starting past the vacuum horizon works
    got = {
        tuple(r)
        for r in _drain(
            spark, t, str(tmp_path / "out2"), str(tmp_path / "ck2"),
            startingversion="2",
        ).collect()
    }
    assert got == {(9, "z", "insert", 2)}
