"""End-to-end: graal_cdc_log source -> quality metrics -> lake sink.

The full Spark-native ingest loop a reference user migrates to:

1. a producer appends Debezium-style envelopes to a segment-rolled
   log directory (`append_segment` — in production this is the CDC
   engine's durable queue);
2. a streaming query reads it through the custom `graal_cdc_log`
   data source (checkpointed offsets = the named tailer cursor),
   parses/filters the envelope (F3-F7), observes in-flight quality
   metrics, and upserts latest-by-key state into a partitioned
   parquet lake table via foreachBatch;
3. restart-safe: kill it anywhere and rerun — offsets + idempotent
   compaction converge to the same state.

Run: python examples/log_source_to_lake.py
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
from graal_cdc_spark.sources import cdc_log_ds as DS
from graal_cdc_spark.streaming.metrics import (
    QualityMetricsListener,
    observed_quality,
)

BASE = "/tmp/graal_example_log_to_lake"


def envelope(op: str, key: str, value: float, tbl: str = "users") -> str:
    after = (
        "null"
        if op == "d"
        else json.dumps({"user_id": key, "value": value})
    )
    return (
        '{"payload":{"op":"%s","before":null,"after":%s,'
        '"source":{"db":"appdb","table":"%s"}}}' % (op, after, tbl)
    )


def main() -> None:
    shutil.rmtree(BASE, ignore_errors=True)
    log, lake, ck = (os.path.join(BASE, d) for d in ("log", "lake", "ck"))

    # 1. producer: two segments of changes (create, update, delete)
    DS.append_segment(log, [
        (10, "u1", envelope("c", "u1", 5.0)),
        (20, "u2", envelope("c", "u2", 7.0)),
        (30, "u1", envelope("u", "u1", 9.0)),
    ])
    DS.append_segment(log, [
        (40, "u2", envelope("d", "u2", 0.0)),
        (50, "u3", envelope("c", "u3", 1.0)),
        (60, None, None),  # tombstone — dropped by F3
    ], seal=True)

    spark = get_spark(app_name="log-to-lake-example", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    DS.register(spark)
    listener = QualityMetricsListener()
    spark.streams.addListener(listener)

    # 2. the streaming ingest loop
    raw = spark.readStream.format("graal_cdc_log").load(log)
    observed, _ = observed_quality(raw, name="ingest", null_cols=["value"])

    def upsert(batch, batch_id):
        # persist: foreachBatch bodies that run several actions would
        # otherwise re-read the source per action — and every re-read
        # re-counts in the observed metrics (see streaming/metrics.py)
        batch.persist()
        try:
            parsed = parse_envelope(batch)
            if parsed.isEmpty():
                return
            state = latest_by_key(parsed, ["key"], "seq").filter(
                F.col("op") != "d"
            )
            merged = state.select("key", "op", "seq", "tbl", "after_json")
            if os.path.isdir(lake):
                prev = batch.sparkSession.read.parquet(lake)
                merged = latest_by_key(
                    prev.unionByName(merged), ["key"], "seq"
                ).filter(F.col("op") != "d")
            merged.write.mode("overwrite").parquet(lake + ".tmp")
            out = batch.sparkSession.read.parquet(lake + ".tmp")
            out.write.mode("overwrite").parquet(lake)
            shutil.rmtree(lake + ".tmp", ignore_errors=True)
        finally:
            batch.unpersist()

    q = (
        observed.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    print("lake state (latest per key, deletes applied):")
    for row in spark.read.parquet(lake).orderBy("key").collect():
        print(" ", row.key, row.op, row.seq, row.after_json)
    print("per-batch observed metrics:")
    for m in listener.rows("ingest"):
        print(" ", m)
    spark.streams.removeListener(listener)
    spark.stop()


if __name__ == "__main__":
    main()
