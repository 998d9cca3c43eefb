"""Binned interval join — the scale path for pure range joins.

A point-in-interval join WITHOUT an equi key (``p.ts BETWEEN lo AND
hi``) gives Catalyst nothing to hash on: the plan degenerates to a
broadcast-nested-loop (or cartesian) join — O(N*M) comparisons, the
operator that dies first at 100 TB.

The standard fix (DuckDB/Trino call it an IEJoin problem; Spark users
bin): discretize time into fixed-width bins. A point belongs to
exactly one bin; an interval covers ``floor(lo/w) .. floor(hi/w)``.
Exploding the interval side over its covered bins turns the range
predicate into an EQUI-join on ``bin`` plus an exact residual filter.
Cost: a shuffle hash join with duplication factor
``span/bin_width + 1`` on the interval side — pick ``bin_width`` near
the typical interval span so the factor stays ~2.

Each (point, interval) pair meets in exactly one bin (the point's),
so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(ts: Column, width_s: int) -> Column:
    # Integer arithmetic on epoch micros — deterministic, no doubles.
    # Spark's `/` is double division (floor(us / w) would round through
    # a 53-bit mantissa), so floor-divide exactly instead: subtract the
    # positive remainder (pmod floors toward -inf), divide the now
    # exactly-divisible numerator as decimal, and narrow back.
    width_us = F.lit(width_s * 1_000_000)
    us = F.unix_micros(ts)
    num = (us - F.pmod(us, width_us)).cast("decimal(38,0)")
    return (num / width_us).cast("bigint")


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_col: str,
    hi_col: str,
    bin_width_s: int = 3600,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``lo <= point_ts <= hi``, as an equi-join on time bins.

    Returns points columns + intervals columns (callers project/alias
    beforehand to avoid name clashes).
    """
    if bin_width_s < 1:
        raise ValueError("binned_interval_join: bin_width_s must be >= 1")
    p = points.withColumn("__bin", _bin(F.col(point_ts), bin_width_s))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(F.col(lo_col), bin_width_s), _bin(F.col(hi_col), bin_width_s)
            )
        ),
    )
    return (
        p.join(iv, "__bin")
        .filter(
            (F.col(point_ts) >= F.col(lo_col)) & (F.col(point_ts) <= F.col(hi_col))
        )
        .drop("__bin")
    )
