"""File-stream replay — the test-time stand-in for a CDC source.

The reference's durable log is a Chronicle Queue directory with
hourly-rolled segment files and named tailer cursors
(``DebeziumEngineRecordHandler.java:89-93,129``). The Spark equivalent
is a directory file stream: appended parquet chunks are the segments,
the checkpoint is the cursor, and ``maxFilesPerTrigger`` recreates
segment-at-a-time arrival for deterministic multi-batch tests.

At production scale the same pipeline code reads Kafka
(``spark.readStream.format("kafka")``) — only this source module
changes; every transform downstream is source-agnostic.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def append_chunk(df: DataFrame, path: str) -> None:
    """Append one "segment" of rows to a replay directory.

    Each call lands new files with a strictly later modification time
    than the previous call's, so Spark's file source (which orders by
    mtime) replays chunks in append order — mirroring the log order
    the reference's tailers observe.
    """
    before = set(os.listdir(path)) if os.path.isdir(path) else set()
    prev = max(
        (
            os.path.getmtime(os.path.join(path, n))
            for n in before
            if n.endswith(".parquet")
        ),
        default=0.0,
    )
    df.write.mode("append").parquet(path)
    # File-source ordering is by mtime; stamp ONLY this call's files,
    # strictly later than every existing chunk's. (A proximity-based
    # "touch recent files" heuristic is wrong: two appends < its window
    # apart re-stamp the earlier chunk too, the chunks tie on mtime,
    # and the source replays them in arbitrary order — late-data rows
    # then get dropped behind an already-advanced watermark.)
    stamp = max(time.time(), prev + 1.0)
    for name in os.listdir(path):
        if name not in before and name.endswith(".parquet"):
            full = os.path.join(path, name)
            os.utime(full, (stamp, stamp))


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a replay directory as a streaming DataFrame."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def run_to_memory(
    sdf: DataFrame,
    name: str | None = None,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a
    memory sink; returns the sink table.

    AvailableNow processes everything currently in the source — in
    multiple ordered micro-batches when the source rate limit
    (``maxFilesPerTrigger``) says so — then stops. This is the
    deterministic harness for golden tests.
    """
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    writer = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return sdf.sparkSession.table(name)
