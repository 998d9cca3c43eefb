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


def hilbert_key2_frame(
    df: DataFrame, x: str, y: str, bits: int = 8, out: str = "hkey"
) -> DataFrame:
    """Append the 2-D HILBERT index of ``(x, y)`` (both already
    normalized into [0, 2^bits)) as column ``out`` — the
    locality-better alternative to the Morton key: consecutive
    Hilbert cells are always Manhattan-distance-1 neighbors (no
    quadrant jumps), so equal-size file ranges cover tighter
    (x, y) rectangles and per-file min/max stats prune harder.

    The walk keeps rotation/reflection STATE per bit, which has no
    closed form — it unrolls as ``bits`` chained projections over
    named columns (linear plan text, unlike textual substitution
    which grows 3^bits). Pure 64-bit integer CASE/shift/mask steps,
    whole-plan deterministic and engine-portable:
    :func:`hilbert_key2_sql_ctes` emits the IDENTICAL chain as SQL
    CTEs for the DuckDB oracle twin. Verified a true Hilbert curve
    (bijective on the grid, unit-step adjacent) by the
    ``tests/test_scale_ops.py`` property test."""
    cur = df.select(
        "*",
        F.col(x).cast("bigint").alias("__hx"),
        F.col(y).cast("bigint").alias("__hy"),
        F.lit(0).cast("bigint").alias(out),
    )
    for i in reversed(range(bits)):
        s = 1 << i
        rx = f"((__hx >> {i}) & 1)"
        ry = f"((__hy >> {i}) & 1)"
        others = [
            f"`{c}`" for c in cur.columns if c not in (out, "__hx", "__hy")
        ]
        cur = cur.selectExpr(
            *others,
            f"{out} + {s * s} * (({rx} * 3) ^ {ry}) AS {out}",
            f"CASE WHEN {ry} = 1 THEN __hx WHEN {rx} = 1 "
            f"THEN {s - 1} - __hy ELSE __hy END AS __hx",
            f"CASE WHEN {ry} = 1 THEN __hy WHEN {rx} = 1 "
            f"THEN {s - 1} - __hx ELSE __hx END AS __hy",
        )
    return cur.drop("__hx", "__hy")


def hilbert_key2_sql_ctes(
    src: str,
    x: str,
    y: str,
    cols: list[str],
    bits: int = 8,
    out: str = "hkey",
    prefix: str = "h",
) -> tuple[str, str]:
    """The identical Hilbert chain as SQL CTE text for the DuckDB
    oracle twin: returns ``(cte_sql, final_cte_name)``. ``cols`` are
    pass-through columns; DuckDB spells bitwise XOR as ``xor()``
    (its ``^`` is POWER — the one operator the two dialects disagree
    on, so the Spark side uses ``^`` and this emits ``xor``)."""
    keep = ", ".join(cols)
    parts = [
        f"{prefix}0 AS (SELECT {keep}, CAST({x} AS BIGINT) AS hx, "
        f"CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS {out} "
        f"FROM {src})"
    ]
    step = 0
    for i in reversed(range(bits)):
        s = 1 << i
        rx = f"((hx >> {i}) & 1)"
        ry = f"((hy >> {i}) & 1)"
        parts.append(
            f"{prefix}{step + 1} AS (SELECT {keep}, "
            f"{out} + {s * s} * xor({rx} * 3, {ry}) AS {out}, "
            f"CASE WHEN {ry} = 1 THEN hx WHEN {rx} = 1 "
            f"THEN {s - 1} - hy ELSE hy END AS hx, "
            f"CASE WHEN {ry} = 1 THEN hy WHEN {rx} = 1 "
            f"THEN {s - 1} - hx ELSE hx END AS hy "
            f"FROM {prefix}{step})"
        )
        step += 1
    return ",\n".join(parts), f"{prefix}{step}"
