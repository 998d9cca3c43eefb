"""Data-layout operators: z-order clustering for scan pruning.

A 100 TB table is read mostly through min/max-based file and row-group
skipping (parquet statistics). Sorting by a single column gives
perfect skipping on that column and none on any other; interleaving
the bits of two (or more) normalized keys — the Morton / z-order
curve — gives every interleaved column locality proportional to its
bit share, so multi-dimensional point/range filters prune files on
ALL of them. This is the same layout operation Delta/Iceberg expose
as ``OPTIMIZE ... ZORDER BY``; here it is a plain DataFrame transform:
compute the z-key, range-partition + sort by it, write.

The z-key is pure integer arithmetic (shift/mask/or), deterministic
and engine-portable — the oracle twin (r66) runs the identical
expression in DuckDB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits kept per dimension; 2 dims -> 32-bit z-key


def normalize_expr(col: str, lo: int, hi: int, bits: int = ZBITS) -> Column:
    """Scale ``col`` into [0, 2^bits) by LITERAL [lo, hi] bounds —
    integer arithmetic only (exact, engine-portable): the bounds come
    from a driver-side min/max pass or table statistics."""
    span = max(hi - lo, 1)
    return F.expr(
        f"(CAST({col} AS BIGINT) - {lo}) * {(1 << bits) - 1} DIV {span}"
    )


def zorder_key2(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of x -> bit 2i, bit i of y -> bit 2i+1. Pure shift/mask/or —
    whole-stage-codegen'd JVM integer ops, no UDF.
    """
    xi = x.cast("bigint")
    yi = y.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xi, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(yi, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zkey")


def zorder_key2_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """The identical interleave as portable SQL (DuckDB oracle twin)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def cluster_by_zorder(
    df: DataFrame, x: str, y: str, n_files: int, bits: int = ZBITS
) -> DataFrame:
    """Layout pass: range-partition by the z-key into ``n_files``
    output partitions and sort within each — every written file then
    covers a compact z-range, i.e. a small rectangle in (x, y) space,
    so parquet min/max stats prune on BOTH columns.

    The caller normalizes x/y to non-negative ints first (see
    ``normalize_expr``); repartitionByRange samples the z-key to build
    balanced range bounds — one shuffle, the layout pass's inherent
    cost, paid once per table rewrite.
    """
    keyed = df.withColumn("__z", zorder_key2(F.col(x), F.col(y), bits))
    return (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
