"""Event-time windowed aggregations (ST1–ST3).

The reference processes events in arrival (log) order with no event-time
semantics at all (``DebeziumEngineRecordHandler.java:130-146`` — see
SURVEY.md §2.2 "streaming watermarks: none"). These operators are the
idiomatic-Spark upgrade: event-time windows + watermark-bounded state.

Unified batch/stream: each function takes any DataFrame with a ``ts``
timestamp column. In batch mode (watermark=None) the same expressions
compute the gated oracle twins; on a ``readStream`` DataFrame with a
watermark they run incrementally with bounded state.

Scale notes:
- ``window()``/``session_window()`` aggregation is one hash shuffle on
  (window, keys) with map-side partial aggregation — the minimum for
  this semantics. State size is bounded by (watermark horizon ×
  distinct keys), not stream length.
- Window starts are epoch-aligned, so outputs are deterministic and
  partition-stable across any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _with_watermark(df: DataFrame, watermark: str | None) -> DataFrame:
    return df.withWatermark("ts", watermark) if watermark else df


def tumbling_counts(
    df: DataFrame,
    window: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """ST1 — tumbling-window event counts per event_type.

    Output: (window_start STRING, event_type, n) — window start
    formatted as UTC 'yyyy-MM-dd HH:mm:ss' so batch/stream/oracle
    compare byte-identically.
    """
    return (
        _with_watermark(df, watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n",
        )
    )


def sliding_counts(
    df: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """ST2 — sliding-window counts (each event lands in window/slide
    overlapping windows; 10m/5m ⇒ 2 windows per event)."""
    return (
        _with_watermark(df, watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_counts(
    df: DataFrame,
    gap: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """ST3 — session windows per user: a session closes after ``gap``
    of inactivity. Session end follows Spark's definition:
    last-event-ts + gap (the oracle twin mirrors it as max(ts)+gap).

    Output: (user_id, session_start STRING, session_end STRING, n).
    """
    return (
        _with_watermark(df, watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            F.date_format("w.end", _TS_FMT).alias("session_end"),
            "n",
        )
    )


def session_coverage(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """ST15 — per-session covered time: each event opens a ``gap``
    interval; Spark's session_window merges overlaps, and the session
    span (end - start = last event + gap - first event) IS the
    interval-union length of that island — the streaming-capable twin
    of the batch islands formulation (r83). Microsecond-exact.

    Output: (user_id, session_start STRING, n, covered_us BIGINT).
    """
    return (
        _with_watermark(df, watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            "n",
            (F.unix_micros("w.end") - F.unix_micros("w.start")).alias(
                "covered_us"
            ),
        )
    )


def hourly_rollup_of_tumbling(
    df: DataFrame,
    window: str = "10 minutes",
    hour: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """ST8 — CHAINED event-time aggregations: 10-minute tumbling
    counts rolled up into hourly (n_windows, max_n, sum_n) per
    event_type — the multi-resolution rollup a metrics pipeline keeps.

    In streaming this is two stateful operators in one query —
    supported since Spark 3.5 for time-window chains because
    ``window_time()`` re-exposes an event-time column from the first
    aggregate's window struct, letting the watermark propagate into
    the second. Output mode must be ``append``; an hour emits once
    the watermark passes its end.

    Scale: stage 1 shuffles on (10-min window, event_type) with
    map-side partials; stage 2's input is already reduced to
    O(windows × keys) rows — negligible. State: watermark-bounded on
    both operators.
    """
    ten = (
        _with_watermark(df, watermark)
        .groupBy(F.window("ts", window).alias("w10"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    return (
        ten.groupBy(F.window(F.window_time("w10"), hour).alias("wh"), "event_type")
        .agg(
            F.count("*").alias("n_windows"),
            F.max("n").alias("max_n"),
            F.sum("n").alias("sum_n"),
        )
        .select(
            F.date_format("wh.start", _TS_FMT).alias("hour_start"),
            "event_type",
            "n_windows",
            "max_n",
            "sum_n",
        )
    )


def windowed_distinct_users(
    df: DataFrame,
    window: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """ST11 — EXACT distinct users per tumbling window via two chained
    stateful aggregations: stage 1 reduces to one row per
    (window, user_id) — the dedup — and stage 2 counts the reduced
    rows per window re-derived through ``window_time()`` (the same
    watermark-propagation chain as ST8).

    Scale: stage 1 shuffles the events once on (window, user) with
    map-side partials; stage 2's input is O(windows × distinct users)
    — already deduplicated. Exact, unlike approx_count_distinct; state
    on both operators is watermark-bounded. The per-(window,user)
    grouping key is high-cardinality, so no per-window skew bottleneck
    (compare r57's first-appearance trick for the all-time variant).
    """
    per_user = (
        _with_watermark(df, watermark)
        .groupBy(F.window("ts", window).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        per_user.groupBy(
            F.window(F.window_time("w"), window).alias("w2")
        )
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_events").alias("n_events"),
        )
        .select(
            F.date_format("w2.start", _TS_FMT).alias("window_start"),
            "n_users",
            "n_events",
        )
    )


def admitted_counts(
    df: DataFrame,
    denylist: DataFrame,
    window: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """ST12 — streaming admission control: drop events from denylisted
    users (stream-static LEFT ANTI join — the denylist is a static
    side, re-read per micro-batch, so updates to it apply from the
    next batch on), then tumbling-window counts of the admitted
    traffic per event_type.

    Scale: the anti-join broadcasts the denylist (bounded: it is a
    moderation/abuse list, not a fact table); the stream never
    shuffles for the membership test. The windowed agg is the only
    stateful operator — watermark-bounded state. (No distinct
    aggregate here: streaming aggs cannot contain DISTINCT — the
    chained-dedup formulation in ``windowed_distinct_users`` is the
    supported shape for that.)

    ``denylist`` must have a single ``user_id`` column.
    """
    admitted = _with_watermark(df, watermark).join(
        F.broadcast(denylist), "user_id", "left_anti"
    )
    return (
        admitted.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_admitted"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_admitted",
        )
    )


def windowed_value_histogram(
    df: DataFrame,
    window: str = "10 minutes",
    bin_width_cents: int = 1000,
    watermark: str | None = None,
) -> DataFrame:
    """ST16 — tumbling-window VALUE HISTOGRAM per event_type: row
    counts per (window, type, value-bin), integer cents.

    This is the streaming half of the exact-percentile pattern
    (operators/robust.py): bin counts are fully decomposable (a plain
    windowed aggregate — partial combine, watermark-finalizable,
    restart-safe), while the non-decomposable percentile LOCATION step
    runs downstream over the tiny emitted histogram. Streaming an
    exact percentile directly would need every raw value in state;
    the histogram keeps state at O(bins) per (window, type) — the
    only shape that survives unbounded streams.

    Output: (window_start STRING, event_type, bin BIGINT, n BIGINT).
    """
    bin_col = F.floor(
        F.floor(F.col("value") * 100) / F.lit(bin_width_cents)
    ).cast("long")
    return (
        _with_watermark(df, watermark)
        .withColumn("bin", bin_col)
        .groupBy(F.window("ts", window).alias("w"), "event_type", "bin")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "bin",
            "n",
        )
    )
