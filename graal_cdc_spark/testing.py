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


def canon_value(v) -> str:
    """Canonicalize one cell to a comparison string."""
    if v is None:
        return r"\N"
    if isinstance(v, float):
        if math.isnan(v):
            return r"\N"
        return repr(v)
    if isinstance(v, _dec.Decimal):
        return repr(float(v))
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
