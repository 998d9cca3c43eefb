"""Latest-by-key compaction — CDC materialization.

The reference applies changes in per-script log order with id-keyed
upserts to Elasticsearch, so the materialized state is "latest event
per key, deletes remove the doc" (Q3 ordered replay +
``ElasticsearchUtils`` K1–K4 upsert/delete; SURVEY.md §2.3.2-3).

Batch form: a ranking window over the change log. Streaming form: see
``graal_cdc_spark.streaming.compaction``.

Scale note: ``row_number`` over ``PARTITION BY key`` is one hash
shuffle on the compaction key — the minimal possible data movement for
this semantics. AQE handles skewed keys (hot rows). No driver-side
state; state size is bounded by distinct keys per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep the most recent row per key (highest ``order_col``).

    ``tiebreak_cols`` break order ties deterministically (descending),
    mirroring the determinism protocol's total-order requirement.
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def assert_one_row_per_key(
    df: DataFrame, key_cols: Sequence[str], context: str
) -> None:
    """Fail fast when a batch carries more than one row per key.

    Sinks that apply upserts and deletes as sets (ES ``_bulk``, JDBC
    MERGE) silently mis-order multi-event keys — the reference replays
    the log strictly in order (Q3), so the *final* event per key must
    win. A batch that was not pre-compacted and has no sequence column
    to compact on is ambiguous; refuse it instead of guessing.
    """
    dup = (
        df.groupBy(*[F.col(c) for c in key_cols])
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        key = {c: dup[0][c] for c in key_cols}
        raise ValueError(
            f"{context}: batch has multiple rows for key {key} and no "
            f"sequence column to order them; pre-compact with "
            f"latest_by_key or provide seq_col"
        )


def compact_cdc(parsed: DataFrame, drop_deletes: bool = True) -> DataFrame:
    """Materialize a CDC log: latest row per key, optionally dropping
    keys whose final op is a delete (``op='d'``)."""
    latest = latest_by_key(parsed, ["key"], "seq")
    if drop_deletes:
        latest = latest.filter(F.col("op") != "d")
    return latest
