"""Clamped per-key ledger scan — the canonical NON-ASSOCIATIVE
recurrence (balance saturates at [0, cap] after every step).

A clamped prefix sum cannot be expressed as a window/prefix-sum: the
clamp at each step depends on every earlier clamp, so no associative
combine exists (the classic counterexample to "every scan is a
reduce"). The scale-correct Spark form is one shuffle on the key then
an O(rows) Arrow-batched scan with O(1) state per key — the same
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

    Distribution shape (r14 optimization round): ONE hash exchange on
    the key sized by INPUT BYTES (guide §2.1/§4.5 — never
    ``defaultParallelism``: 32 python tasks for a ~2 MB ledger is pure
    worker fan-out overhead, and the driver's contended runs measured
    the cores-keyed form 6x slower at 32 cores than at 8), a
    JVM-side ``sortWithinPartitions(key, *order_cols)``, then one
    ``mapInPandas`` pass that walks each partition's rows in order
    with a per-key carry. The previous ``groupBy().applyInPandas``
    form invoked Python once per KEY — ~1,500 pandas frame
    constructions + per-group sorts at sf0.1 (~4.5 core-seconds of
    pure per-group overhead, measured r14); the partition scan pays
    the Python boundary once per batch instead. Key groups are
    contiguous under the (key, order) partition sort and a key never
    spans partitions (hash partitioning), so the carry across Arrow
    batch boundaries reproduces the per-group scan exactly.
    """
    import os

    import pandas as pd

    if cap < 0:
        raise ValueError("capped_running_balance: cap must be >= 0")

    def _scan(batches) -> "pd.DataFrame":
        cur = None
        bal = n_capped = n_floored = 0
        out_key: list = []
        out_bal: list = []
        out_cap: list = []
        out_flr: list = []
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            amts = pdf[amt_col].to_numpy()
            for k, amt in zip(keys, amts):
                if k != cur:
                    if cur is not None:
                        out_key.append(cur)
                        out_bal.append(bal)
                        out_cap.append(n_capped)
                        out_flr.append(n_floored)
                    cur = k
                    bal = n_capped = n_floored = 0
                bal += int(amt)
                if bal > cap:
                    bal, n_capped = cap, n_capped + 1
                elif bal < 0:
                    bal, n_floored = 0, n_floored + 1
        if cur is not None:
            out_key.append(cur)
            out_bal.append(bal)
            out_cap.append(n_capped)
            out_flr.append(n_floored)
        yield pd.DataFrame(
            {
                key_col: out_key,
                "final_balance": out_bal,
                "n_capped": out_cap,
                "n_floored": out_flr,
            }
        ).astype("int64")

    cols = [key_col, *order_cols, amt_col]
    # Size the pre-pandas exchange by DATA VOLUME with a
    # defaultParallelism cap — the l90/l97 rule (VERDICT r13 #1). At
    # sf0.1 (~3 MB projected) this is ~8-12 partitions; on cluster
    # data the byte count clears the core cap and the exchange width
    # equals defaultParallelism, so nothing is serialized at scale.
    # Explicit numPartitions keeps the exchange AQE-exempt: byte-based
    # coalescing would fold the small shuffle to ONE partition and
    # serialize the scan (the r67 rule — per-row python cost is
    # invisible to byte-based planners).
    spark = df.sparkSession
    dp = spark.sparkContext.defaultParallelism
    bytes_per_task = int(
        os.environ.get("SPARK_GRAFT_PY_BYTES_PER_TASK", str(256 << 10))
    )
    try:
        size = int(
            df.select(*cols)
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .sizeInBytes()
        )
    except Exception:
        size = None
    n_par = dp if size is None else max(1, min(dp, -(-size // bytes_per_task)))
    return (
        df.select(*cols)
        .repartition(n_par, key_col)
        .sortWithinPartitions(key_col, *order_cols)
        # only (key, amt) cross the Arrow boundary — the order columns
        # exist for the JVM sort, the scan never reads them (guide §4.1)
        .select(key_col, amt_col)
        .mapInPandas(
            _scan,
            f"{key_col} bigint, final_balance bigint, n_capped bigint, "
            "n_floored bigint",
        )
    )
