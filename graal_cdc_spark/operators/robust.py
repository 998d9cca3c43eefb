"""Robust statistics operators — exact, scale-safe medians and MAD.

The naive per-group exact median (cumulative window PARTITIONed by the
group) sorts the whole table inside one task per group value — a
scale-killer when the group key is low-cardinality (VERDICT r4 on the
original r64). ``binned_group_median`` is the reusable two-pass form:

  pass 1: hash-aggregate row counts per (group, value-bin) — map-side
          partials; the histogram is O(groups x bins) rows;
  locate: a cumulative window over the TINY histogram finds each
          group's median bin and the count preceding it;
  pass 2: only rows inside the median bin are re-aggregated per
          distinct value and scanned with a window over O(distinct
          values in one bin) rows.

No task ever sorts more than one bin of one group, at any scale.
The result is the LOWER median: min v with cum_count(v) * 2 >= total —
exactly ``min(v) FILTER (cum*2 >= tot)`` in an engine that can afford
the full sort, so a plain-SQL oracle can verify it.

Reference: SURVEY.md §2.2 (aggregate surface beyond the reference's
Java shell); the binning idea is the classic two-pass exact quantile.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def binned_group_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float = 64.0,
) -> DataFrame:
    """Exact lower median of ``value_col`` per ``group_col``.

    The p=0.5 case of :func:`binned_group_quantiles` (lower median =
    min v with cum*2 >= tot = rank-at-ceil(0.5*n)); one code path so
    every fix to the two-pass logic lands everywhere.
    Returns (group_col, median).
    """
    q = binned_group_quantiles(
        df, group_col, value_col, probabilities=(0.5,), bin_width=bin_width
    )
    return q.select(group_col, F.col("value").alias("median"))


def mad_outlier_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    bin_width: float = 64.0,
) -> DataFrame:
    """Median / MAD / robust-outlier profile per group, exact.

    MAD = lower median of |v - group median|; outliers are rows with
    |v - median| > k * MAD.  Both medians run through the binned
    two-pass operator, so the whole profile is scale-safe even for a
    3-value group key.  Returns (group, median, mad, n, n_outliers).
    """
    med = binned_group_median(df, group_col, value_col, bin_width)
    src = df.select(group_col, F.col(value_col).alias("__v")).join(
        F.broadcast(med), group_col
    )
    dev = src.withColumn("__d", F.abs(F.col("__v") - F.col("median")))
    mad = (
        binned_group_median(dev, group_col, "__d", bin_width)
        .withColumnRenamed("median", "mad")
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .groupBy(group_col, "median", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("__d") > F.lit(k) * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(group_col, "median", "mad", "n", "n_outliers")
    )


def binned_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    bin_width: float = 64.0,
) -> DataFrame:
    """Exact DISCRETE quantiles (rank-at-ceil(p*n), the r76/DuckDB
    ``quantile_disc`` convention) per group, scale-safe.

    Same two-pass shape as :func:`binned_group_median`, generalized to
    any probability list: the histogram is built ONCE; each (group, p)
    locates its target bin on the tiny cumulative frame; pass 2 reads
    only the union of needed bins. At 100 TB this is the only exact
    global/low-cardinality-group percentile that avoids a single-task
    sort of the whole table.

    Returns (group_col, p DOUBLE, value) — one row per group x p.
    """
    src = df.select(group_col, F.col(value_col).alias("__v")).withColumn(
        "__bin", F.floor(F.col("__v") / F.lit(bin_width)).cast("long")
    )
    hist = src.groupBy(group_col, "__bin").agg(
        F.count(F.lit(1)).alias("__bw")
    )
    wbin = (
        Window.partitionBy(group_col)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(group_col)
    hist = hist.withColumn("__cum", F.sum("__bw").over(wbin)).withColumn(
        "__tot", F.sum("__bw").over(wtot)
    )
    # integer-exact target ranks: ceil(p*n) computed as
    # (num*n + den - 1) div den from p's exact decimal rational —
    # double arithmetic (0.2*10 = 2.0000000000000004) would ceil to
    # the wrong order statistic for non-dyadic p
    from fractions import Fraction

    fracs = [Fraction(str(float(p))) for p in probabilities]
    ps = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(float(p)).alias("p"),
                    F.lit(fr.numerator).alias("num"),
                    F.lit(fr.denominator).alias("den"),
                )
                for p, fr in zip(probabilities, fracs)
            ]
        )
    ).alias("__pr")
    targets = hist.select(
        group_col, "__bin", "__bw", "__cum", "__tot", ps
    ).select(
        group_col,
        "__bin",
        "__bw",
        "__cum",
        "__tot",
        F.col("__pr.p").alias("p"),
        F.expr(
            "CAST((__pr.num * __tot + __pr.den - 1) div __pr.den AS BIGINT)"
        ).alias("__target"),
    )
    tbin = (
        targets.filter(F.col("__cum") >= F.col("__target"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(group_col, "p").orderBy("__bin")
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(
            F.col(group_col).alias("__tg"),
            F.col("p"),
            F.col("__bin").alias("__tbin"),
            (F.col("__cum") - F.col("__bw")).alias("__prev_cum"),
            "__target",
        )
    )
    inbin = src.join(
        F.broadcast(tbin),
        (F.col(group_col) == F.col("__tg"))
        & (F.col("__bin") == F.col("__tbin")),
    ).select(group_col, "p", "__v", "__prev_cum", "__target")
    vals = inbin.groupBy(group_col, "p", "__v", "__prev_cum", "__target").agg(
        F.count(F.lit(1)).alias("__vw")
    )
    wval = (
        Window.partitionBy(group_col, "p")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        vals.withColumn(
            "__cum", F.col("__prev_cum") + F.sum("__vw").over(wval)
        )
        .filter(F.col("__cum") >= F.col("__target"))
        .groupBy(group_col, "p")
        .agg(F.min("__v").alias("value"))
    )
