"""Streaming SLO percentiles, end to end: the exact-percentile split.

An unbounded stream cannot keep every raw value, so exact streaming
percentiles split into:

1. STREAM: the decomposable half — per-(window, type, value-bin)
   counts (`windowed_value_histogram`, st16) written idempotently to
   a lake table via foreachBatch (O(bins) state, restart-safe);
2. BATCH over the tiny histogram: the non-decomposable half — locate
   each group's p50/p95 bin from cumulative bin weights (the same
   math as operators/robust.py pass 1), giving bin-resolution
   percentiles whose error is bounded by the bin width.

Run: python examples/streaming_slo.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from graal_cdc_spark.session import get_spark
from graal_cdc_spark.sources.tables import load_table
from graal_cdc_spark.streaming import append_chunk, read_file_stream
from graal_cdc_spark.streaming.windows import windowed_value_histogram

BASE = "/tmp/graal_example_streaming_slo"
BIN_CENTS = 1000


def run(spark, sf_dir: str, base: str):
    from graal_cdc_spark.sources.tables import events_schema

    EVENTS_SCHEMA = events_schema()

    replay = os.path.join(base, "replay")
    lake = os.path.join(base, "hist")
    ck = os.path.join(base, "ck")

    # producer: the events table replayed in two chunks
    events = load_table(spark, sf_dir, "events")
    append_chunk(events.filter(F.col("event_id") % 2 == 0).coalesce(1), replay)
    append_chunk(events.filter(F.col("event_id") % 2 == 1).coalesce(1), replay)

    # 1. stream the histogram into the lake (complete-mode rewrite per
    # batch is fine: the frame is O(windows x types x bins))
    stream = read_file_stream(spark, replay, EVENTS_SCHEMA)
    q = (
        windowed_value_histogram(stream, bin_width_cents=BIN_CENTS)
        .writeStream.outputMode("complete")
        .foreachBatch(
            lambda df, _id: df.write.mode("overwrite").parquet(lake)
        )
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # 2. percentile location over the emitted histogram
    hist = spark.read.parquet(lake)
    wcum = (
        Window.partitionBy("window_start", "event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("window_start", "event_type")
    cum = hist.withColumn("cum", F.sum("n").over(wcum)).withColumn(
        "tot", F.sum("n").over(wtot)
    )

    def pct_bin(p: float, name: str):
        return F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(p) * F.col("tot")), F.col("bin"))
        ).alias(name)

    return (
        cum.groupBy("window_start", "event_type")
        .agg(
            F.sum("n").alias("n"),
            pct_bin(0.5, "p50_bin"),
            pct_bin(0.95, "p95_bin"),
        )
        .withColumn("p50_cents_lo", F.col("p50_bin") * BIN_CENTS)
        .withColumn("p95_cents_lo", F.col("p95_bin") * BIN_CENTS)
        .orderBy("window_start", "event_type")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark(app_name="streaming-slo-example")
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, sf_dir, BASE)
    print("windows:", out.count())
    out.show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
