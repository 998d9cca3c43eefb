"""Skew-handling operators: salted aggregation and salted join.

AQE's skew-join splitting (on in ``session.RUNTIME_CONFS``) handles
most runtime skew; these are the *explicit* forms for the cases AQE
cannot fix — a single hot grouping key that overwhelms one reducer, or
a shuffle join where one key's rows exceed an executor's memory. They
trade one extra (cheap, pre-reduced) shuffle for bounded per-task
input, which is the difference between finishing and OOM at 100 TB
with power-law keys (user_id, token, URL host, ...).

Both are deterministic: the salt is a hash of the full row, not a
random number, so results are stable and retries are idempotent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure name -> (partial fn, final fn)
_DECOMPOSABLE = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _row_salt(df: DataFrame, n_salts: int):
    """Deterministic per-row salt: hash of every column, mod n."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    ``measures`` maps output column name -> (fn, input col) with fn in
    {count, sum, min, max} (the decomposable aggregates). Phase 1
    reduces on (keys, salt) — a hot key's rows spread over ``n_salts``
    reducers — phase 2 combines the ≤ n_salts partials per key, a
    trivially small shuffle.

    Equivalent to ``df.groupBy(keys).agg(...)`` for all inputs; use
    when one key dominates (map-side combine alone still funnels a hot
    key's combined partials from every map task into one reducer —
    fine until the per-key row count per map task is itself huge).
    """
    for name, (fn, _col) in measures.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(
                f"measure {name!r}: {fn!r} is not decomposable "
                f"(supported: {sorted(_DECOMPOSABLE)})"
            )
    salted = df.withColumn("__salt", _row_salt(df, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _DECOMPOSABLE[fn][0](F.col(col)).alias(f"__p_{name}")
            for name, (fn, col) in measures.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][1](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _col) in measures.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where the LEFT side has skewed join keys.

    The skewed side gets a deterministic row salt; the other side is
    replicated ``n_salts`` times (explode of a literal range — cheap
    when that side is the smaller one). The join key becomes
    (keys, salt), so a hot key's rows land on ``n_salts`` tasks
    instead of one.

    Supports inner and left joins (replication preserves exactly one
    match per (row, salt) pair; unmatched left rows survive with any
    salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    left = skewed.withColumn("__salt", _row_salt(skewed, n_salts))
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, [*on, "__salt"], how).drop("__salt")
