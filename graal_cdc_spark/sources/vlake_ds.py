"""``graal_vlake`` — streaming source over the versioned table format
(`sinks/versioned_lake.py`), the Delta-streaming-source analog built
on the public PySpark Python DataSource API (same construction as
``graal_cdc_log``; the reference has no table format or streaming
reader at all — its only sink is ES upserts,
``ElasticsearchUtils.java:131-177``).

Semantics: one micro-batch PER COMMIT (offsets are commit versions,
checkpointed by Structured Streaming), each emitting the commit's
row-level CHANGE FEED — the same copy-on-write file-diff
reconstruction as :func:`versioned_lake.read_changes` (rows in added
files minus rows in removed files = inserts, the reverse = deletes;
survivors rewritten unchanged cancel), tagged ``_change_type`` /
``_commit_version``. An append-only consumer gets exactly the
appended rows; a CDC consumer folds inserts minus deletes and holds
the table. ``skipchangecommits`` (Delta's option of the same name)
drops delete/upsert commits instead of streaming their deltas.

Scale shape: ``latestOffset`` is one directory listing; a micro-batch
plans one input partition per commit and reads ONLY the files that
commit touched (never the table); the multiset diff is a
weight-summed groupby over those rows inside the partition reader.
Commits whose pre-image files were vacuumed raise cleanly (narrow the
starting version or raise the retention horizon) — the same contract
as the batch ``read_changes``.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from graal_cdc_spark.sinks import versioned_lake as VL

_EXTRA_DDL = "_change_type string, _commit_version int"

# pyarrow type name prefix -> Spark DDL type for the data columns.
# Deliberately the common scalar surface; exotic nested/decimal types
# raise with a clear message rather than corrupting silently.
_PA_TO_DDL = {
    "bool": "boolean",
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "binary": "binary",
    "large_binary": "binary",
    "date32": "date",
}


def _table_ddl(table: str) -> tuple[str, list[str]]:
    """(full stream DDL incl. the two feed columns, data column names)
    derived from one live parquet footer at the newest version."""
    import pyarrow.parquet as pq

    files = VL.live_files(table)
    if not files:
        raise ValueError(
            f"graal_vlake: table {table!r} has no committed data to "
            "derive a schema from"
        )
    sch = pq.read_schema(os.path.join(table, next(iter(sorted(files)))))
    parts, names = [], []
    for field in sch:
        t = str(field.type)
        if t.startswith("timestamp"):
            ddl = "timestamp_ntz" if "tz=" not in t else "timestamp"
        else:
            ddl = _PA_TO_DDL.get(t)
        if ddl is None:
            raise ValueError(
                f"graal_vlake: unsupported column type {t!r} for "
                f"column {field.name!r} (supported: "
                f"{sorted(_PA_TO_DDL)}, timestamp)"
            )
        parts.append(f"`{field.name}` {ddl}")
        names.append(field.name)
    return ", ".join(parts) + ", " + _EXTRA_DDL, names


class VLakeCommitPartition(InputPartition):
    def __init__(self, table, version, added, removed, cols):
        self.table = table
        self.version = version
        self.added = added
        self.removed = removed
        self.cols = cols


class VLakeStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset JSON ``{"version": N}`` = commits
    ``<= N`` consumed. Options: ``startingversion`` (default 0),
    ``skipchangecommits`` ('true' drops delete/upsert commits)."""

    def __init__(self, options):
        self.table = options.get("path")
        if not self.table:
            raise ValueError("graal_vlake requires a path")
        self.start_version = int(options.get("startingversion", "0"))
        self.skip_change = (
            options.get("skipchangecommits", "false").lower() == "true"
        )
        _, self.cols = _table_ddl(self.table)

    def initialOffset(self) -> dict:
        return {"version": self.start_version - 1}

    def latestOffset(self) -> dict:
        head = VL.latest_version(self.table)
        return {"version": max(head, self.start_version - 1)}

    def partitions(self, start: dict, end: dict):
        out = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            added, removed = VL.commit_actions(self.table, v)
            if self.skip_change and removed:
                continue
            for p in added + removed:
                if not os.path.isfile(os.path.join(self.table, p)):
                    raise ValueError(
                        f"graal_vlake: commit {v} needs data file {p}, "
                        "which was vacuumed — start from a newer "
                        "version or raise the retention horizon"
                    )
            if added or removed:
                out.append(
                    VLakeCommitPartition(
                        self.table, v, added, removed, self.cols
                    )
                )
        # Structured Streaming requires >= 1 partition per batch; an
        # empty range (all commits skipped) plans one empty partition
        if not out:
            out.append(
                VLakeCommitPartition(
                    self.table, int(end["version"]), [], [], self.cols
                )
            )
        return out

    def read(self, partition: VLakeCommitPartition):
        if not partition.added and not partition.removed:
            return
        import pandas as pd
        import pyarrow.parquet as pq

        def frames(paths):
            for p in paths:
                yield pq.read_table(
                    os.path.join(partition.table, p)
                ).to_pandas()

        cols = partition.cols
        parts = []
        for sign, paths in ((1, partition.added), (-1, partition.removed)):
            for f in frames(paths):
                f = f[cols].copy()
                f["__w"] = sign
                parts.append(f)
        allf = pd.concat(parts, ignore_index=True)
        # multiset diff: net weight per distinct full row; survivors
        # rewritten unchanged appear +1 and -1 and cancel to 0
        net = (
            allf.groupby(cols, dropna=False, sort=False)["__w"]
            .sum()
            .reset_index()
        )
        net = net[net["__w"] != 0]
        # positional access: itertuples renames leading-underscore
        # fields, so the weight is row[len(cols)]
        for row in net.itertuples(index=False):
            vals = tuple(
                None if pd.isna(v) else v for v in row[: len(cols)]
            )
            w = int(row[len(cols)])
            change = "insert" if w > 0 else "delete"
            for _ in range(abs(w)):
                yield vals + (change, partition.version)

    def commit(self, end: dict) -> None:
        pass  # offsets are checkpointed by the engine


class VLakeDataSource(DataSource):
    """``graal_vlake`` — versioned-lake change-feed streaming source."""

    @classmethod
    def name(cls) -> str:
        return "graal_vlake"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("graal_vlake requires a path")
        ddl, _ = _table_ddl(path)
        return ddl

    def streamReader(self, schema) -> VLakeStreamReader:
        return VLakeStreamReader(self.options)


def register(spark) -> None:
    """Register the source with a session (idempotent)."""
    spark.dataSource.register(VLakeDataSource)
