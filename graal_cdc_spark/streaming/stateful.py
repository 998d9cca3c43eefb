"""Custom stateful streaming operator: running latest-by-key.

The ``foreachBatch`` merge sink (``streaming.compaction``) materializes
state to a table; this operator instead keeps the per-key state INSIDE
the streaming engine (``applyInPandasWithState``) and emits a change
feed of key-state updates — the streaming-native shape of the
reference's upsert flow, useful when downstream is another stream
rather than a table.

Semantics per key: track (seq, op) with the highest seq ever seen;
whenever a micro-batch advances a key's seq, emit one row with the new
latest. At-least-once replays re-emit but never regress (monotonic
seq guard), so downstream idempotent consumers converge — the same
contract as the reference's id-keyed upserts (SURVEY.md §2.3.3).

Scale notes: state is one (seq, op) pair per distinct key, hash-
partitioned by key across executors — the minimum state for the
semantics. Arrow-batched pandas per group-partition, not per row.
GroupStateTimeout is deliberately off: CDC keys live forever (a
delete is itself state); bound the key space upstream via routing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key STRING, seq BIGINT, op STRING"
STATE_SCHEMA = "seq BIGINT, op STRING"


def _update_latest(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    best_seq, best_op = state.get if state.exists else (None, None)
    changed = False
    for pdf in pdfs:
        if pdf.empty:
            continue
        i = pdf["seq"].idxmax()
        seq, op = int(pdf["seq"][i]), pdf["op"][i]
        if best_seq is None or seq > best_seq:
            best_seq, best_op, changed = seq, op, True
    if changed:
        state.update((best_seq, best_op))
        yield pd.DataFrame({"key": [key[0]], "seq": [best_seq], "op": [best_op]})


def streaming_exact_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — keep the first occurrence of each key.

    ``dropDuplicatesWithinWatermark`` bounds the seen-keys state to the
    watermark horizon (keys older than the watermark are evicted), the
    correct streaming analog of batch ``dropDuplicates`` for sources
    that can re-deliver (at-least-once transports, S1/S2): a redelivery
    within the horizon is suppressed, and horizon width = the
    transport's max redelivery lag.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def running_latest_by_key(parsed: DataFrame) -> DataFrame:
    """Streaming change feed of latest (seq, op) per key.

    Input: a *streaming* parsed-envelope DataFrame (``parse_envelope``
    output). Output mode must be ``append``/``update``.
    """
    return (
        parsed.select("key", "seq", "op")
        .groupBy("key")
        .applyInPandasWithState(
            _update_latest,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
