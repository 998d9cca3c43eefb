"""Stream-stream interval join (ST4).

The reference fans events out to independent consumers but never
correlates two streams (SURVEY.md §2.2 — no joins of any kind). This
is the idiomatic-Spark extension: correlate two event streams on a
key within a time interval — e.g. every error a user hit in the half
hour leading up to a purchase.

Unified batch/stream: the same function body runs on batch DataFrames
(the oracle-gated twin) and on ``readStream`` inputs. For streaming,
BOTH sides carry watermarks and the join condition bounds event time
on both sides; Spark derives the state retention from
``watermark + lookback`` and evicts older rows — state is bounded by
(lookback horizon x arrival rate), not stream length.

Scale notes: the join shuffles both sides on the key — one shuffle
each, the minimum for an equi-key correlated join. The time-range
predicate is evaluated post-shuffle within the key group; AQE handles
skewed keys (a hot user with many events) by splitting oversized
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_pairs(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    lookback: str = "30 minutes",
    watermark: str | None = None,
    how: str = "inner",
    keep_ts: bool = False,
) -> DataFrame:
    """Pairs (key, left_id, right_id) where the right event happened in
    ``[left.ts - lookback, left.ts]`` for the same key.

    ``how='inner'`` — matches emit as soon as both sides arrive
    (streaming append mode); the watermark only bounds state, it does
    not delay inner-join output.

    ``keep_ts=True`` additionally returns the left event time (as
    ``l_ts``) — required when the join output feeds a downstream
    event-time operator (windowed aggregation, another join): the
    chained operator needs a watermarked event-time column, and
    ``l_ts`` inherits the left watermark through the join.

    ``how='left_outer'`` — unmatched left rows emit with a NULL
    ``right_id``. In streaming, Spark can declare a left row
    unmatched only once the watermark has passed the row's whole
    join window, so null-padded output is delayed by
    ``watermark + lookback`` — the price of a correct outer result
    under late data (both sides MUST carry watermarks).
    """
    l = left.withWatermark(ts_col, watermark) if watermark else left
    r = right.withWatermark(ts_col, watermark) if watermark else right
    l = l.select(
        F.col(key).alias("k"),
        F.col(ts_col).alias("l_ts"),
        F.col(id_col).alias("left_id"),
    )
    r = r.select(
        F.col(key).alias("r_k"),
        F.col(ts_col).alias("r_ts"),
        F.col(id_col).alias("right_id"),
    )
    cond = (
        (l["k"] == r["r_k"])
        & (r["r_ts"] >= l["l_ts"] - F.expr(f"INTERVAL {lookback}"))
        & (r["r_ts"] <= l["l_ts"])
    )
    # coalesce the key: for full_outer, right-unmatched rows carry the
    # key only on the right side (no-op for inner/left_outer, where k
    # is never null)
    cols = [
        F.coalesce(F.col("k"), F.col("r_k")).alias(key),
        F.col("left_id"),
        F.col("right_id"),
    ]
    if keep_ts:
        cols.insert(1, F.col("l_ts"))
    return l.join(r, cond, how).select(*cols)
