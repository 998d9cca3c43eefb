"""DuckDB-oracle parity harness.

Replicates the driver's correctness gate locally: run the Spark query
and the oracle SQL over the same sf dir, then compare row count,
column names, and canonicalized values (columns sorted by name, rows
sorted — order-insensitive value compare, per FIXTURES.md §4).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math

import duckdb

from graal_cdc_spark.sources.tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


# Result-surface types the external gate's value hash cannot
# canonicalize across engines (round-5 postmortem: every hash FAIL had
# a HUGEINT — DuckDB `//` on BIGINT — or raw DECIMAL output column;
# every pass had neither). The portable-type protocol: result columns
# are BIGINT/INT-family, DOUBLE, VARCHAR, DATE/TIMESTAMP, BOOLEAN, or
# lists/structs thereof. Decimals render via CAST(... AS VARCHAR) /
# .cast("string"); `//` quotients via CAST(... AS BIGINT).
_NONPORTABLE_DUCK = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_result_types(sql: str, sf_dir: str) -> list[tuple[str, str]]:
    """(column, duckdb type string) of the oracle's result surface,
    from the relation's inferred types (no full execution)."""
    con = duckdb_connect(sf_dir)
    try:
        rel = con.sql(sql)
        return list(zip(rel.columns, [str(t) for t in rel.types]))
    finally:
        con.close()


def nonportable_columns(
    spark_df, oracle_sql: str, sf_dir: str
) -> list[str]:
    """Result columns (either engine) whose type the gate hash cannot
    canonicalize — empty list means the spec obeys the protocol."""
    bad = [
        f"spark:{f.name}:{f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if f.dataType.simpleString().startswith("decimal")
    ]
    for col, typ in oracle_result_types(oracle_sql, sf_dir):
        if any(typ.upper().startswith(p) for p in _NONPORTABLE_DUCK):
            bad.append(f"oracle:{col}:{typ}")
    return bad


def canon_value(v) -> str:
    """Canonicalize one cell to a comparison string."""
    if v is None:
        return r"\N"
    if isinstance(v, float):
        if math.isnan(v):
            return r"\N"
        return repr(v)
    if isinstance(v, _dec.Decimal):
        # Preserve exact scale ("123.40", not 123.4). Collapsing to
        # float here masked the round-5 driver FAIL class (the driver's
        # value hash distinguishes Decimal/HUGEINT from float/int, so
        # the rehearsal must too). Decimal on a result surface is now
        # also rejected outright by the registry type lint
        # (tests/test_oracle_types.py) — this branch only keeps the
        # rehearsal honest if one slips through.
        return f"dec:{v}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_query(spark, spec, sf_dir: str) -> None:
    """Assert the Spark query matches its DuckDB oracle. Raises AssertionError."""
    sdf = spec.spark(spark, sf_dir)
    bad = nonportable_columns(sdf, spec.oracle, sf_dir)
    assert not bad, (
        f"{spec.name}: non-portable result types (gate hash cannot "
        f"canonicalize): {bad}"
    )
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(spec.oracle, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"{spec.name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{spec.name}: row count mismatch spark={len(s_rows)} oracle={len(o_rows)}"
    )
    cs = canon_rows(s_cols, s_rows)
    co = canon_rows(o_cols, o_rows)
    if cs != co:
        diffs = [
            (a, b) for a, b in zip(cs, co) if a != b
        ][:5]
        raise AssertionError(
            f"{spec.name}: value mismatch; first diffs (spark, oracle): {diffs}"
        )
