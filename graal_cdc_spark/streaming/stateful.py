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
from pyspark.sql import functions as F
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


def _tws_available() -> bool:
    """transformWithStateInPandas needs the StatefulProcessor API
    (Spark >= 4.0) AND protobuf — its state server speaks protobuf to
    the Python driver worker, and the worker crashes at startup when
    ``google.protobuf`` is missing (as in this test container)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        return True
    except ImportError:  # pragma: no cover — env-dependent
        return False


if _tws_available():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LatestByKeyProcessor(StatefulProcessor):
        """``transformWithStateInPandas`` form of the running
        latest-by-key change feed — the successor API to
        ``applyInPandasWithState`` (SPARK-46815, arbitrary stateful
        processing v2): typed value state, composable with timers,
        and the shape Spark is standardizing on for custom stateful
        operators.

        Identical semantics to ``running_latest_by_key``: per key,
        emit one row whenever a micro-batch advances the key's max
        seq; the monotonic-seq guard makes at-least-once replays
        converge downstream.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._latest = handle.getValueState("latest", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            held = self._latest.get() if self._latest.exists() else None
            best_seq = held[0] if held else None
            best_op = held[1] if held else None
            changed = False
            for pdf in rows:
                if pdf.empty:
                    continue
                i = pdf["seq"].idxmax()
                seq, op = int(pdf["seq"][i]), pdf["op"][i]
                if best_seq is None or seq > best_seq:
                    best_seq, best_op, changed = seq, op, True
            if changed:
                self._latest.update((best_seq, best_op))
                yield pd.DataFrame(
                    {"key": [key[0]], "seq": [best_seq], "op": [best_op]}
                )

        def close(self) -> None:
            pass


def running_latest_by_key_tws(parsed: DataFrame) -> DataFrame:
    """``running_latest_by_key`` on the transformWithState API.

    Same contract (streaming change feed of the latest ``(seq, op)``
    per key); state layout and emissions are identical, so the two
    implementations are interchangeable behind the same golden test.
    """
    if not _tws_available():  # pragma: no cover
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0 with "
            "protobuf installed (the state server protocol)"
        )
    return (
        parsed.select("key", "seq", "op")
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=LatestByKeyProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Streaming bounded top-k per key
# ---------------------------------------------------------------------------

TOPK_OUTPUT_SCHEMA = (
    "user_id BIGINT, rank INT, event_id BIGINT, value DOUBLE, emit BIGINT"
)
_TOPK_STATE_SCHEMA = "vals ARRAY<DOUBLE>, ids ARRAY<BIGINT>, emit BIGINT"


def _topk_update(k: int):
    def update(key, pdfs, state: GroupState):
        if state.exists:
            vals, ids, emit = state.get
            pairs = list(zip(vals, ids))
        else:
            pairs, emit = [], 0
        changed = False
        for pdf in pdfs:
            for v, i in zip(pdf["value"], pdf["event_id"]):
                pairs.append((float(v), int(i)))
                changed = True
        if not changed:
            return
        # total order (value DESC, event_id ASC) — ties deterministic
        pairs.sort(key=lambda p: (-p[0], p[1]))
        pairs = pairs[:k]
        emit += 1
        state.update(([p[0] for p in pairs], [p[1] for p in pairs], emit))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(pairs),
                "rank": range(1, len(pairs) + 1),
                "event_id": [p[1] for p in pairs],
                "value": [p[0] for p in pairs],
                "emit": [emit] * len(pairs),
            }
        )

    return update


def running_topk_by_key(events: DataFrame, k: int = 3) -> DataFrame:
    """Streaming per-key top-k maintenance (custom stateful operator).

    Each micro-batch merges the key's new (value, event_id) pairs into
    a bounded k-element state — O(k) per key, the minimum for the
    semantics, vs. the unbounded buffer a naive ranking window would
    need — and re-emits the key's current top-k rows stamped with a
    monotonically increasing ``emit`` counter (consumers keep the
    max-emit set per key; replays re-emit but never regress).

    The batch twin (one big micro-batch) is exactly the ranking-window
    query ``row_number() OVER (PARTITION BY user ORDER BY value DESC,
    event_id) <= k`` — the oracle gate for ``st9``.

    Scale: state is k pairs per distinct key, hash-partitioned by key;
    input batches are Arrow-transferred per group-partition.
    """
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _topk_update(k),
            outputStructType=TOPK_OUTPUT_SCHEMA,
            stateStructType=_TOPK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming per-(key, window) quota admission
# ---------------------------------------------------------------------------

QUOTA_OUTPUT_SCHEMA = (
    "user_id BIGINT, window_start TIMESTAMP, event_id BIGINT, rank INT"
)
_QUOTA_STATE_SCHEMA = "admitted INT"


def _quota_update(k: int, grace_ms: int):
    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # watermark passed the window + grace: the quota counter
            # can never admit again — drop it (bounded state lifetime)
            state.remove()
            return
        admitted = state.get[0] if state.exists else 0
        rows = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            # event-order admission: ties broken (ts, event_id) so a
            # prefix-chunked replay equals the batch twin exactly
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid in pdf["event_id"]:
                if admitted >= k:
                    break
                admitted += 1
                rows.append((int(eid), admitted))
        if rows:
            state.update((admitted,))
        if state.exists and grace_ms >= 0:
            ws = key[1]  # window-start timestamp from the grouping key
            state.setTimeoutTimestamp(
                int(ws.timestamp() * 1000) + grace_ms
            )
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows),
                    "window_start": [key[1]] * len(rows),
                    "event_id": [r[0] for r in rows],
                    "rank": [r[1] for r in rows],
                }
            )

    return update


def quota_admission(
    events: DataFrame,
    k: int = 3,
    window: str = "10 minutes",
    watermark: str | None = None,
    grace: str | None = None,
) -> DataFrame:
    """Streaming per-(user, event-time-window) quota admission: admit
    at most ``k`` events per user per tumbling window, in event order
    (ts, event_id) — the rate-limit / sampling-cap operator an ingest
    edge runs. Custom stateful operator (``applyInPandasWithState``)
    with an O(1) counter per live (user, window) key.

    With ``watermark`` + ``grace`` set, state uses EventTimeTimeout:
    once the watermark passes window_start + grace the counter is
    removed — state is bounded by the number of windows inside the
    watermark horizon, not by history. Without a watermark the
    operator runs with NoTimeout (test/replay mode).

    The batch twin (one big micro-batch, event-order arrival) is
    exactly ``row_number() OVER (PARTITION BY user_id, window ORDER BY
    ts, event_id) <= k`` — the st13 oracle gate.

    Scale: one shuffle on (user_id, window_start); state is a single
    INT per live key; Arrow-batched per group-partition.
    """
    from pyspark.sql import functions as F

    src = events
    timeout = GroupStateTimeout.NoTimeout
    grace_ms = -1
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
        n, unit = (grace or "10 minutes").split()
        unit_ms = {"seconds": 1000, "minutes": 60_000, "hours": 3_600_000}
        grace_ms = int(n) * unit_ms[unit]
    keyed = src.select(
        "user_id",
        F.window("ts", window).getField("start").alias("window_start"),
        "ts",
        "event_id",
    )
    return keyed.groupBy("user_id", "window_start").applyInPandasWithState(
        _quota_update(k, grace_ms),
        outputStructType=QUOTA_OUTPUT_SCHEMA,
        stateStructType=_QUOTA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Streaming clamped ledger (incremental twin of operators/ledger.py)
# ---------------------------------------------------------------------------

LEDGER_OUTPUT_SCHEMA = (
    "user_id BIGINT, final_balance BIGINT, n_capped BIGINT, "
    "n_floored BIGINT, emit BIGINT"
)
_LEDGER_STATE_SCHEMA = (
    "bal BIGINT, n_capped BIGINT, n_floored BIGINT, emit BIGINT"
)


def _ledger_update(cap: int):
    def update(key, pdfs, state: GroupState):
        if state.exists:
            bal, n_capped, n_floored, emit = state.get
        else:
            bal = n_capped = n_floored = emit = 0
        changed = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            # event order within the batch; cross-batch order is the
            # replay contract (prefix chunks), as for quota admission
            pdf = pdf.sort_values(["s", "event_id"])
            for amt in pdf["amt"].to_numpy():
                bal += int(amt)
                if bal > cap:
                    bal, n_capped = cap, n_capped + 1
                elif bal < 0:
                    bal, n_floored = 0, n_floored + 1
                changed = True
        if not changed:
            return
        emit += 1
        state.update((bal, n_capped, n_floored, emit))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "final_balance": [bal],
                "n_capped": [n_capped],
                "n_floored": [n_floored],
                "emit": [emit],
            }
        )

    return update


def running_capped_balance(events: DataFrame, cap: int) -> DataFrame:
    """Streaming clamped ledger: per-user balance accumulating ``amt``
    and saturating at ``[0, cap]`` after every event — the incremental
    form of ``operators/ledger.capped_running_balance`` (r93). Because
    the clamp is a NON-ASSOCIATIVE recurrence, the operator is
    order-sensitive: events must arrive in per-key (s, event_id) order
    across micro-batches (the replay/ingest contract — a CDC log or
    partitioned Kafka topic delivers per-key order); within a batch
    the operator sorts. Each batch emits the key's updated running
    totals (`update` mode change stream).

    State is O(1) per key (three BIGINT counters), NoTimeout by design:
    ledger keys live as long as the account does, exactly like CDC
    compaction keys.

    Expects columns: user_id, s (event-time micros), event_id, amt.
    """
    return (
        events.select("user_id", "s", "event_id", "amt")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ledger_update(cap),
            outputStructType=LEDGER_OUTPUT_SCHEMA,
            stateStructType=_LEDGER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters (Misra–Gries per hash bucket)
# ---------------------------------------------------------------------------

HH_OUTPUT_SCHEMA = "bucket INT, token STRING, weight BIGINT, emit BIGINT"
_HH_STATE_SCHEMA = "tokens ARRAY<STRING>, weights ARRAY<BIGINT>, emit BIGINT"


def _hh_update(k: int):
    from graal_cdc_spark.operators.sketch import mg_merge

    def update(key, pdfs, state: GroupState):
        if state.exists:
            toks, ws, emit = state.get
            summary = pd.Series(
                list(ws), index=list(toks), dtype="int64"
            )
        else:
            summary, emit = pd.Series(dtype="int64"), 0
        changed = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            changed = True
            summary = mg_merge(summary, pdf["token"].value_counts(), k)
        if not changed:
            return
        emit += 1
        state.update(
            (
                [str(t) for t in summary.index],
                [int(v) for v in summary.values],
                emit,
            )
        )
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(summary),
                "token": summary.index.astype(str),
                "weight": summary.values,
                "emit": [emit] * len(summary),
            }
        )

    return update


def running_heavy_hitters(
    tokens: DataFrame, k: int = 8, n_buckets: int = 4
) -> DataFrame:
    """Streaming Misra–Gries heavy hitters (custom stateful operator —
    the streaming leg of ``operators/sketch.py``): tokens hash into
    ``n_buckets`` groups via the engine-portable md5 bucket family,
    and each group maintains ONE capacity-``k`` MG summary across
    micro-batches, re-emitting its current survivor set per trigger
    stamped with an ``emit`` counter (consumers keep the max-emit set
    per bucket; replays re-emit but never regress).

    Guarantee carried across batches: the MG merge never undercounts
    any token by more than (bucket stream length)/(k+1), so every
    token with bucket frequency > n_bucket/(k+1) is IN the survivor
    set at end-of-stream — the candidate-generation contract the
    exact-verify stage (batch: ``heavy_hitters_exact``; streaming: a
    foreachBatch count of candidates) relies on.

    Scale: state is O(k) per bucket no matter the stream length or
    vocabulary size — the point of the sketch; the alternative
    (streaming groupBy count per token) keeps data-sized state.
    """
    from graal_cdc_spark.operators.sketch import md5_bucket

    bucket = md5_bucket("token", n_buckets)
    return (
        tokens.select(bucket.alias("bucket"), F.col("token"))
        .groupBy("bucket")
        .applyInPandasWithState(
            _hh_update(k),
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=_HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_KMV_OUTPUT_SCHEMA = (
    "grp STRING, n_state INT, est_distinct BIGINT, emit INT"
)
_KMV_STATE_SCHEMA = "hashes ARRAY<STRING>, emit INT"


def _kmv_update(k: int):
    def update(key, pdfs, state: GroupState):
        if state.exists:
            hashes, emit = state.get
            cur = set(hashes)
        else:
            cur, emit = set(), 0
        changed = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            changed = True
            # bottom-k is mergeable: union then re-take the k
            # smallest — so folding each batch's hashes into the
            # capped set IS the whole-stream bottom-k
            cur.update(pdf["h"].astype(str))
            if len(cur) > 4 * k:
                cur = set(sorted(cur)[:k])  # opportunistic re-cap
        if not changed:
            return
        smallest = sorted(cur)[:k]
        emit += 1
        state.update((smallest, emit))
        n = len(smallest)
        if n < k:
            est = n  # under capacity the sketch IS exact
        else:
            hk = max(int(smallest[-1][:10], 16), 1)
            est = (k - 1) * (1 << 40) // hk
        yield pd.DataFrame(
            {
                "grp": [key[0]],
                "n_state": [n],
                "est_distinct": [est],
                "emit": [emit],
            }
        )

    return update


def running_kmv_distinct(hashed: DataFrame, k: int = 64) -> DataFrame:
    """Streaming KMV (bottom-k) distinct estimator — the streaming
    leg of the l96 batch audit, the same pairing as
    ``running_heavy_hitters`` ↔ l90/st18. Input is ``(grp, h)`` where
    ``h`` is the value's md5 hex computed UPSTREAM with ``F.md5``
    (JVM-side, whole-stage codegen) — the Python state op only merges
    bounded string sets, never hashes rows. Each group keeps the k
    smallest hashes across micro-batches (bottom-k is mergeable:
    union → re-take bottom-k), re-emitting its current estimate per
    trigger stamped with ``emit`` (consumers keep the max-emit row
    per group; replays re-emit but never regress). Under capacity the
    estimate is EXACT (the state holds every distinct hash seen);
    at capacity D-hat = (k-1) * 2^40 / hk over the 40-bit prefix —
    the identical integer arithmetic the gated l96/st23 twins pin.

    Scale: state is O(k) hashes per group no matter the stream
    length or value cardinality — the alternative (streaming
    count-distinct per group) keeps data-sized state."""
    return (
        hashed.select(F.col("grp"), F.col("h"))
        .groupBy("grp")
        .applyInPandasWithState(
            _kmv_update(k),
            outputStructType=_KMV_OUTPUT_SCHEMA,
            stateStructType=_KMV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
