"""Structured Streaming surface.

The reference's streaming machinery is hand-built: a Chronicle Queue
durable log, per-script named tailers, semaphore fan-out, and blocking
ordered replay (``DebeziumEngineRecordHandler.java:89-148``). In Spark
all of that collapses into Structured Streaming primitives:

- durable log + tailer cursor  → replayable source + ``checkpointLocation``
- fan-out to N scripts         → N streaming queries over the same source
- ordered blocking replay (Q3) → ordered micro-batches per query
- id-keyed ES upsert (K1/K2)   → idempotent ``foreachBatch`` merge

plus event-time semantics the reference lacks entirely (SURVEY.md
§2.2): watermarks, tumbling/sliding/session windows (ST1–ST3).

Every transform here is written against a plain DataFrame so it runs
identically in batch (the gated oracle twin) and on ``readStream``
(the golden-file streaming tests) — batch/streaming unification.
"""

from graal_cdc_spark.streaming.windows import (
    session_counts,
    session_coverage,
    sliding_counts,
    tumbling_counts,
)
from graal_cdc_spark.streaming.replay import (
    append_chunk,
    read_file_stream,
    run_to_memory,
)
from graal_cdc_spark.streaming.compaction import (
    CompactionStateSink,
    MergeIntoStateSink,
    run_cdc_compaction_stream,
)
from graal_cdc_spark.streaming.bronze import bronze_append, bronze_sink, read_bronze
from graal_cdc_spark.streaming.stateful import (
    running_latest_by_key,
    streaming_exact_dedup,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "session_coverage",
    "append_chunk",
    "read_file_stream",
    "run_to_memory",
    "CompactionStateSink",
    "MergeIntoStateSink",
    "run_cdc_compaction_stream",
    "bronze_append",
    "bronze_sink",
    "read_bronze",
    "running_latest_by_key",
    "streaming_exact_dedup",
]
