"""Clamped per-key ledger scan — the canonical NON-ASSOCIATIVE
recurrence (balance saturates at [0, cap] after every step).

A clamped prefix sum cannot be expressed as a window/prefix-sum: the
clamp at each step depends on every earlier clamp, so no associative
combine exists (the classic counterexample to "every scan is a
reduce"). The scale-correct Spark form is one shuffle on the key then
an O(group) Arrow-batched scan per key with O(1) state — the same
parallelism contract as greedy packing (operators/packing.py): size
keys so one key's history fits a task, which a per-user/per-account
ledger does by construction.

Reference: SURVEY.md §2.4 R93; the DuckDB twin unrolls the recurrence
as a recursive CTE, so the operator is oracle-gated despite being
imperative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capped_running_balance(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    amt_col: str,
    cap: int,
) -> DataFrame:
    """Scan each key's rows in ``order_cols`` order accumulating
    ``amt_col`` (integers), clamping the balance into ``[0, cap]``
    after every row. Returns one row per key:
    ``(key_col, final_balance, n_capped, n_floored)`` where the
    counters are the number of clamps at each bound.
    """
    import pandas as pd

    if cap < 0:
        raise ValueError("capped_running_balance: cap must be >= 0")

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        bal = n_capped = n_floored = 0
        for amt in pdf[amt_col].to_numpy():
            bal += int(amt)
            if bal > cap:
                bal, n_capped = cap, n_capped + 1
            elif bal < 0:
                bal, n_floored = 0, n_floored + 1
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "final_balance": [bal],
                "n_capped": [n_capped],
                "n_floored": [n_floored],
            }
        )

    cols = [key_col, *order_cols, amt_col]
    # Pin the grouping partitioning explicitly: AQE's byte-based
    # coalescing folds the small shuffle to ONE partition and
    # serializes every per-key python scan in a single task (the r67
    # rule — per-group python cost is invisible to byte-based
    # planners). repartition(N, key) is AQE-exempt and satisfies the
    # grouping distribution, so no second exchange is planned.
    n_par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(*cols)
        .repartition(n_par, key_col)
        .groupBy(key_col)
        .applyInPandas(
            _scan,
            f"{key_col} bigint, final_balance bigint, n_capped bigint, "
            "n_floored bigint",
        )
    )
