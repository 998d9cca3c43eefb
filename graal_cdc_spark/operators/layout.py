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


def default_zbits(n_dims: int) -> int:
    """Bits per dimension for an N-column interleave: ZBITS when it
    fits, else the widest per-dim share keeping the key inside a
    non-negative BIGINT (n * bits <= 62)."""
    if n_dims < 2:
        raise ValueError(f"z-order needs >= 2 columns, got {n_dims}")
    return max(1, min(ZBITS, 62 // n_dims))


def zorder_key(cols: list[Column], bits: int | None = None) -> Column:
    """Interleave the low ``bits`` bits of N non-negative ints
    round-robin: bit i of dimension d lands at bit ``i*n + d`` (for
    n=2 this is exactly the classic Morton x->2i / y->2i+1). Pure
    shift/mask/or — whole-stage-codegen'd JVM integer ops, no UDF.
    Each dimension gets an equal bit share; ``default_zbits`` keeps
    the composed key inside a non-negative BIGINT for any N."""
    n = len(cols)
    b = default_zbits(n) if bits is None else bits
    if n * b > 62:
        raise ValueError(
            f"zorder_key: {n} dims x {b} bits = {n * b} > 62 "
            "(BIGINT sign bit) — lower bits or columns"
        )
    terms = []
    for i in range(b):
        for d, c in enumerate(cols):
            terms.append(
                F.shiftleft(
                    F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1)),
                    i * n + d,
                )
            )
    return reduce(lambda a, b2: a.bitwiseOR(b2), terms).alias("zkey")


def zorder_key_sql(cols: list[str], bits: int | None = None) -> str:
    """The identical N-way interleave as portable SQL (DuckDB oracle
    twin) — same bit placement, same term order."""
    n = len(cols)
    b = default_zbits(n) if bits is None else bits
    terms = []
    for i in range(b):
        for d, c in enumerate(cols):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + d})")
    return " | ".join(terms)


def zorder_key2(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Two-column Morton key (bit i of x -> 2i, of y -> 2i+1) — the
    N-way :func:`zorder_key` at n=2."""
    return zorder_key([x, y], bits)


def zorder_key2_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """The identical interleave as portable SQL (DuckDB oracle twin)."""
    return zorder_key_sql([x, y], bits)


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


def cluster_by_zorder_n(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int | None = None,
) -> DataFrame:
    """N-column layout pass: range-partition by the N-way z-key into
    ``n_files`` output partitions and sort within — every written
    file covers a compact z-range, a small hyper-rectangle in the
    N-dim space, so parquet min/max stats prune on EVERY interleaved
    column (bit share 1/N each). Caller normalizes the columns to
    non-negative ints first (``normalize_expr``)."""
    keyed = df.withColumn(
        "__z", zorder_key([F.col(f"`{c}`") for c in cols], bits)
    )
    return (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
