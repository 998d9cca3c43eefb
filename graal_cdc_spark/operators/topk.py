"""Tree-merged exact global top-k — the LARGE-k leg of the top-k
family (SURVEY.md §2.4 R14 global top-k).

R14's `ORDER BY … LIMIT k` compiles to TakeOrderedAndProject: every
partition keeps its local top-k, then the DRIVER merges
``n_partitions × k`` rows. At small k that is the right plan; at
large k on a 100 TB table (say k = 1M over 100k partitions) the
driver merge is a 100-billion-row gather — the classic driver OOM.

``tree_topk`` is the treeAggregate-shaped alternative: rows hash into
``b`` buckets, each bucket keeps its top-k (one window, one shuffle),
then the bucket count shrinks by ``fanout`` per round until one
bucket remains. Every round's shuffle carries at most ``b × k`` rows,
the final merge sorts at most ``fanout × k`` rows, and nothing
bigger than that ever sits in one task — executor AND driver memory
stay bounded by ``fanout × k`` regardless of input size.

Correctness: for ANY partitioning of the rows into buckets, each
global top-k row is also a top-k row of its own bucket (removing
other rows can only improve its rank), so per-bucket truncation never
drops a global winner. Ties are broken by the caller's ORDER BY
columns, which must form a total order for a deterministic result
(the repo-wide determinism protocol).

All JVM-side: hash bucketing (`xxhash64`), per-bucket `row_number`
windows, and a final TakeOrdered over the last ``fanout × k`` rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tree_topk(
    df: DataFrame,
    order_by: list[Column],
    k: int,
    bucket_cols: list[str] | None = None,
    fanout: int = 32,
    initial_buckets: int | None = None,
) -> DataFrame:
    """Exact global top-k of ``df`` under ``order_by`` (a TOTAL order —
    include tiebreak columns), merged as a ``fanout``-ary tree.

    ``bucket_cols`` seed the row hash (default: every input column);
    any assignment is correct (see module docstring), the hash only
    balances the buckets. ``initial_buckets`` defaults to the square
    of ``fanout`` — two reduction rounds, enough to model the shape;
    at real scale size it to ``n_partitions``.

    Returns the top-k rows with a ``rank`` column (1-based).
    """
    if k < 1:
        raise ValueError("tree_topk: k must be >= 1")
    if fanout < 2:
        raise ValueError("tree_topk: fanout must be >= 2")
    if bucket_cols is not None and not bucket_cols:
        raise ValueError("tree_topk: bucket_cols must be non-empty or None")
    cols = df.columns
    hcols = bucket_cols if bucket_cols is not None else cols
    b = initial_buckets if initial_buckets is not None else fanout * fanout
    cur = df.withColumn(
        "__b", F.pmod(F.xxhash64(*hcols), F.lit(b)).cast("int")
    )
    while b > 1:
        w = Window.partitionBy("__b").orderBy(*order_by)
        cur = (
            cur.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
        b = max(1, math.ceil(b / fanout))
        cur = cur.withColumn("__b", F.pmod(F.col("__b"), F.lit(b)))
    # survivors: <= fanout * k rows — TakeOrdered merges them cheaply
    final = Window.orderBy(*order_by)
    return (
        cur.drop("__b")
        .orderBy(*order_by)
        .limit(k)
        .withColumn("rank", F.row_number().over(final))
        .select(*cols, "rank")
    )
