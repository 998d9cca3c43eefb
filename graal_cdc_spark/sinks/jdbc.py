"""JDBC sink — keyed upsert via dialect MERGE in ``foreachBatch``.

The reference README claims "built-in Elasticsearch and JDBC sinks"
(``README.md:10``) but contains no JDBC code (SURVEY.md §2.2); this
module honors the claim Spark-first:

- append/overwrite loads: plain ``df.write.jdbc`` (built-in, parallel
  per partition).
- upsert (the CDC materialization case): Spark's JDBC writer cannot
  MERGE, so ``write_jdbc_batch`` stages the micro-batch into a temp
  table with ``df.write.jdbc`` and issues one dialect-specific
  merge statement — the standard ``foreachBatch`` upsert recipe.

``merge_statement`` is a pure function (unit-tested without a
database); execution requires a JDBC driver jar on the cluster and is
exercised only when a ``jdbc_url`` is configured.

Scale notes: the stage-write is executor-parallel; the single MERGE
runs in the database (set-based, index-backed), not in Spark. Task
retries re-stage into a fresh temp table, and MERGE is idempotent on
the key — at-least-once + idempotent sink, same contract as the ES
sink (SURVEY.md §2.3.3).
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class JdbcSinkConfig:
    url: str  # jdbc:postgresql://... | jdbc:mysql://...
    table: str
    key_cols: tuple[str, ...]
    user: str = ""
    password: str = ""

    def __post_init__(self) -> None:
        if not self.url.startswith("jdbc:"):
            raise ValueError(f"jdbc sink: url must start with 'jdbc:': {self.url!r}")
        if not self.table.strip():
            raise ValueError("jdbc sink: table is required")
        if not self.key_cols:
            raise ValueError("jdbc sink: key_cols is required")

    @property
    def dialect(self) -> str:
        return self.url.split(":", 2)[1]


def merge_statement(
    dialect: str,
    table: str,
    staging: str,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> str:
    """Upsert-from-staging SQL for the target dialect.

    postgresql → ``INSERT .. ON CONFLICT (keys) DO UPDATE``
    mysql      → ``INSERT .. ON DUPLICATE KEY UPDATE``
    (the two source databases the reference captures from,
    ``DbType.java:12-13``; generic → ANSI ``MERGE INTO``)
    """
    all_cols = list(key_cols) + [c for c in value_cols if c not in key_cols]
    cols = ", ".join(all_cols)
    if dialect == "postgresql":
        updates = ", ".join(
            f"{c} = EXCLUDED.{c}" for c in all_cols if c not in key_cols
        )
        conflict = ", ".join(key_cols)
        return (
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging} "
            f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
        )
    if dialect == "mysql":
        updates = ", ".join(
            f"{c} = VALUES({c})" for c in all_cols if c not in key_cols
        )
        return (
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging} "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
    updates = ", ".join(f"t.{c} = s.{c}" for c in all_cols if c not in key_cols)
    inserts = ", ".join(f"s.{c}" for c in all_cols)
    return (
        f"MERGE INTO {table} t USING {staging} s ON ({on}) "
        f"WHEN MATCHED THEN UPDATE SET {updates} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({inserts})"
    )


def delete_statement(
    table: str, staging: str, key_cols: Sequence[str]
) -> str:
    """Propagate CDC deletes: remove target rows whose key appears in
    the staging table (K3/K4 analog for JDBC). Correlates on the bare
    table name (no alias) — valid in every target dialect including
    Derby, whose DELETE does not accept a correlation name."""
    on = " AND ".join(f"{table}.{c} = s.{c}" for c in key_cols)
    return (
        f"DELETE FROM {table} WHERE EXISTS "
        f"(SELECT 1 FROM {staging} s WHERE {on})"
    )


def drop_statement(dialect: str, table: str) -> str:
    """Staging-table cleanup. Derby has no ``IF EXISTS``; the staging
    table always exists at drop time (we just wrote it), so the plain
    form is safe there."""
    if dialect == "derby":
        return f"DROP TABLE {table}"
    return f"DROP TABLE IF EXISTS {table}"


def prepare_cdc_batch(
    batch_df: DataFrame,
    key_cols: Sequence[str],
    op_col: str | None,
    seq_col: str | None,
    context: str = "jdbc sink",
) -> tuple[DataFrame, DataFrame | None]:
    """Compact a CDC batch to one row per key, then split it into
    (upserts, deletes).

    Pre-compaction makes the subsequent MERGE/DELETE order immaterial
    (each key appears in exactly one of the two sets) and guarantees
    Postgres ``ON CONFLICT`` never sees the same key twice in one
    INSERT ("cannot affect row a second time"). A delete followed by a
    re-insert of the same key within one batch resolves to the
    re-insert, matching the reference's log-order replay (Q3). Batches
    without a sequence column are asserted unique per key instead.
    """
    from graal_cdc_spark.cdc.compaction import assert_one_row_per_key, latest_by_key

    if seq_col is not None and seq_col in batch_df.columns:
        batch_df = latest_by_key(batch_df, key_cols, seq_col)
    else:
        assert_one_row_per_key(batch_df, key_cols, context)
    if op_col is None or op_col not in batch_df.columns:
        return batch_df, None
    deletes = batch_df.filter(batch_df[op_col] == "d").drop(op_col)
    upserts = batch_df.filter(batch_df[op_col] != "d").drop(op_col)
    return upserts, deletes


def write_jdbc_batch(
    batch_df: DataFrame,
    cfg: JdbcSinkConfig,
    batch_id: int | None = None,
    op_col: str | None = None,
    seq_col: str | None = "seq",
    run_sql=None,
    staging_column_types: dict[str, str] | None = None,
) -> dict[str, str]:
    """``foreachBatch`` body: compact the batch to one row per key
    (see ``prepare_cdc_batch``), stage it, MERGE upserts, DELETE
    tombstones. Returns the statements it ran (for observability).

    ``run_sql(sql)`` executes a statement on the target database; by
    default it uses the JVM DriverManager via the active SparkContext
    (requires the JDBC driver jar, cluster-only).

    ``staging_column_types`` maps column names to SQL types for the
    staging CREATE (Spark's ``createTableColumnTypes``). Needed when
    the writer's default mapping is not MERGE-comparable with the
    target — e.g. Derby maps StringType to CLOB, which cannot equal-
    compare against a VARCHAR primary key.
    """
    staging = f"{cfg.table}_stage_{uuid.uuid4().hex[:8]}"
    props = {"user": cfg.user, "password": cfg.password}

    upserts, deletes = prepare_cdc_batch(
        batch_df, cfg.key_cols, op_col, seq_col
    )

    value_cols = [c for c in upserts.columns if c not in cfg.key_cols]
    stmts: dict[str, str] = {
        "merge": merge_statement(
            cfg.dialect, cfg.table, staging, cfg.key_cols, value_cols
        )
    }
    if deletes is not None:
        stmts["delete"] = delete_statement(cfg.table, f"{staging}_del", cfg.key_cols)

    if run_sql is None:
        run_sql = _jvm_run_sql(batch_df, cfg)
    # Spark's JDBC writer QUOTES column names in the CREATE it issues
    # for the staging table. Dialects that fold unquoted identifiers to
    # uppercase (Derby, and ANSI dialects generally) then can't resolve
    # the merge's unquoted `s.col` against a quoted lowercase "col" —
    # stage with the dialect's folded case so unquoted SQL resolves.
    fold = str.upper if cfg.dialect == "derby" else (lambda c: c)

    def _stage_props(cols) -> dict[str, str]:
        if not staging_column_types:
            return props
        ents = [
            f"{fold(c)} {staging_column_types[c]}"
            for c in cols
            if c in staging_column_types
        ]
        if not ents:
            return props
        return {**props, "createTableColumnTypes": ", ".join(ents)}

    up_props = _stage_props(upserts.columns)
    upserts = upserts.toDF(*[fold(c) for c in upserts.columns])
    upserts.write.jdbc(cfg.url, staging, mode="overwrite", properties=up_props)
    try:
        run_sql(stmts["merge"])
    finally:
        run_sql(drop_statement(cfg.dialect, staging))
    if deletes is not None:
        deletes.select(*cfg.key_cols).toDF(
            *[fold(c) for c in cfg.key_cols]
        ).write.jdbc(
            cfg.url, f"{staging}_del", mode="overwrite",
            properties=_stage_props(cfg.key_cols),
        )
        try:
            run_sql(stmts["delete"])
        finally:
            run_sql(drop_statement(cfg.dialect, f"{staging}_del"))
    return stmts


def _jvm_run_sql(df: DataFrame, cfg: JdbcSinkConfig):
    """Statement runner over the JVM's DriverManager (needs driver jar)."""

    def run(sql: str) -> None:
        jvm = df.sparkSession._jvm
        conn = jvm.java.sql.DriverManager.getConnection(
            cfg.url, cfg.user, cfg.password
        )
        try:
            stmt = conn.createStatement()
            stmt.execute(sql)
            stmt.close()
        finally:
            conn.close()

    return run
