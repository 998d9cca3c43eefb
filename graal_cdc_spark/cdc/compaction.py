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


def compact_cdc(parsed: DataFrame, drop_deletes: bool = True) -> DataFrame:
    """Materialize a CDC log: latest row per key, optionally dropping
    keys whose final op is a delete (``op='d'``)."""
    latest = latest_by_key(parsed, ["key"], "seq")
    if drop_deletes:
        latest = latest.filter(F.col("op") != "d")
    return latest
