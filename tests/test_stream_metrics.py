"""Observed data-quality metrics — batch Observation + streaming listener.

The metrics ride the data plane (no second scan): the batch test
cross-checks the observation against a direct aggregate over the same
input; the streaming test replays deterministic chunks and asserts the
per-micro-batch metric rows reconstruct exactly what each chunk
contained.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from graal_cdc_spark.sources.tables import load_table
from graal_cdc_spark.streaming.metrics import (
    QualityMetricsListener,
    observed_quality,
)
from graal_cdc_spark.streaming.replay import append_chunk, read_file_stream


def test_batch_observation_matches_direct_aggregate(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    df, obs = observed_quality(
        ev, ts_col="ts", null_cols=["props", "value"]
    )
    assert obs is not None
    n = df.count()  # the action that materializes the observation
    got = obs.get
    direct = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("nv"),
        F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
    ).collect()[0]
    assert got["n_rows"] == n == direct["n"]
    assert got["n_null_props"] == direct["np"]
    assert got["n_null_value"] == direct["nv"]
    assert got["min_ts"] == direct["mn"] and got["max_ts"] == direct["mx"]


def _wait_for(listener, name, n_batches, timeout=30.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        rows = [r for r in listener.rows(name) if r["n_rows"] > 0]
        if len(rows) >= n_batches:
            return rows
        time.sleep(0.2)
    raise AssertionError(
        f"only {len(listener.rows(name))} metric rows after {timeout}s"
    )


def test_streaming_per_batch_quality_metrics(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    chunk1 = ev.filter(F.col("event_id") % 2 == 0)
    chunk2 = ev.filter(F.col("event_id") % 2 == 1)
    replay = str(tmp_path / "replay")
    append_chunk(chunk1.coalesce(2), replay)
    append_chunk(chunk2.coalesce(2), replay)

    listener = QualityMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = read_file_stream(
            spark, replay, ev.schema, max_files_per_trigger=1
        )
        observed, _ = observed_quality(
            stream, name="q_stream_metrics", ts_col="ts"
        )
        q = (
            observed.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("metrics_sink")
            .outputMode("complete")
            .option(
                "checkpointLocation", str(tmp_path / "ck")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = _wait_for(listener, "q_stream_metrics", 2)
    finally:
        spark.streams.removeListener(listener)

    # chunk-at-a-time arrival (one file per chunk, 1 per trigger) —
    # each non-empty batch's bundle must reconstruct its chunk exactly
    c1 = chunk1.agg(
        F.count(F.lit(1)).alias("n"), F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
    ).collect()[0]
    c2 = chunk2.agg(
        F.count(F.lit(1)).alias("n"), F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
    ).collect()[0]
    assert [r["n_rows"] for r in rows] == [c1["n"], c2["n"]]
    assert rows[0]["min_ts"] == c1["mn"] and rows[0]["max_ts"] == c1["mx"]
    assert rows[1]["min_ts"] == c2["mn"] and rows[1]["max_ts"] == c2["mx"]
    # and the data plane itself was untouched by the observation
    total = spark.sql(
        "select sum(n) s from metrics_sink"
    ).collect()[0]["s"]
    assert total == c1["n"] + c2["n"]
