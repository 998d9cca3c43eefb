"""Versioned parquet table format — a Delta/Iceberg-shaped
transaction log over plain parquet (VERDICT r10 #7 capability
extension; public designs: Delta Lake transaction-log protocol,
Iceberg snapshot metadata — re-expressed minimally, no code reuse).

The reference has no table format at all (its only sink is
Elasticsearch upserts, ``ElasticsearchUtils.java:131-177``); a lake
deployment of this engine needs what every 100 TB lake needs:
ATOMIC multi-file commits, snapshot-isolated reads, time travel, and
safe file cleanup. The design is the standard one:

- **Data files are immutable.** Every write lands new uuid-named
  parquet files; nothing ever appends to or rewrites a live file.
- **The log is the table.** ``_vlog/{version:08d}.json`` commit files
  each hold a list of actions (``{"add": {"path", "rows"}}`` /
  ``{"remove": {"path"}}``). A reader folds the action stream up to
  its chosen version into the live file set and reads exactly those
  files — data files not referenced by a committed version are
  invisible by construction, so a crashed writer leaves orphans,
  never corruption.
- **Commits are atomic + optimistic.** A writer stages its commit
  JSON to a temp name and claims version N with an O_EXCL create —
  the filesystem arbitrates exactly one winner per version; a loser
  re-reads the log (its snapshot is stale) and retries or raises on
  logical conflict. This is snapshot isolation: readers never see a
  partial commit, concurrent appends serialize cleanly.
- **Checkpoints bound log replay.** Every ``checkpoint_every``
  commits, the full live set is written to
  ``{version:08d}.checkpoint.json``; readers start from the newest
  checkpoint at-or-below their version and fold only the tail.
- **Vacuum respects time travel.** ``vacuum`` deletes only data
  files unreferenced by EVERY version >= the retained horizon, and
  drops the pre-horizon log entries after folding them into a
  checkpoint.
- **Data-identical commits carry ``dataChange: false``.** OPTIMIZE
  rewrites every live file with the same rows; its commit is marked
  so change-feed consumers (batch ``read_changes`` and the
  ``graal_vlake`` streaming source) skip it WITHOUT reading a byte —
  Delta's ``dataChange`` flag. Without the marker a 100 TB no-op
  compaction would cost every CDC consumer two full-table scans to
  emit zero rows (VERDICT r11 #1).
- **Change commits persist their row deltas at write time.**
  ``commit_delete_where`` / ``commit_upsert_keys`` compute the NET
  row delta they are about to apply anyway; it is written once to
  ``_changes/`` parquet and referenced from the commit body
  (``"cdf": [...]`` — Delta's persisted change-data files). Every
  downstream consumer then reads the delta as a plain distributed
  parquet scan instead of re-deriving it with two table-sized
  ``exceptAll`` shuffles per consumer, and the feed stays servable
  after the pre-image files are vacuumed.
- **Schema evolution is a log action.** A commit whose DataFrame
  carries new columns records the MERGED column list in its body
  (``"schema"`` — Delta's ``metaData`` analog); readers at version v
  apply the schema as of v (missing columns in older files read as
  null), and a same-name/different-type append is rejected at commit
  time instead of corrupting reads later. RENAME and DROP are
  metadata-only commits over stable PHYSICAL column names (Delta
  column mapping): a rename pins the field's on-disk name and only
  changes the logical one (zero rewrites, old files stay readable),
  a drop retires the physical name so a re-added column of the same
  logical name gets a fresh physical identity and old bytes never
  resurrect.

Scale shape: commit files are O(files touched) JSON; readers list one
directory and read a checkpoint + tail (no full-log fold after the
first checkpoint); the data plane is plain parquet with Spark's full
scan pushdown, so Catalyst sees an ordinary multi-file relation.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from typing import NamedTuple
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_DIR = "_vlog"
CDF_DIR = "_changes"

# hive's spelling for a NULL partition value in a directory name
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class CommitConflict(Exception):
    """Another writer claimed the version this commit raced for."""


class ConstraintViolation(Exception):
    """Incoming rows break a table CHECK constraint; nothing committed."""


class _Snapshot(NamedTuple):
    """Everything a snapshot reader needs, from ONE log replay."""

    files: dict[str, int]            # {relative data path: rows}
    stats: dict[str, dict]           # {path: {physical col: [lo, hi]}}
    schema: list[dict] | None        # [{"name", "type", "physical"?}]
    retired: list[str]               # retired physical column names
    partition_cols: list[str]        # PHYSICAL partition column names
    constraints: dict[str, str]      # {constraint name: SQL expr}


def _log_path(table: str) -> str:
    return os.path.join(table, LOG_DIR)


def _versions(table: str) -> list[int]:
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    out = []
    for n in os.listdir(log):
        if n.endswith(".json") and not n.endswith(".checkpoint.json"):
            stem = n[: -len(".json")]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


def _checkpoints(table: str) -> list[int]:
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    out = []
    for n in os.listdir(log):
        if n.endswith(".checkpoint.json"):
            stem = n[: -len(".checkpoint.json")]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


def latest_version(table: str) -> int:
    """Newest committed version, or -1 for an empty/absent table."""
    vs = _versions(table)
    return vs[-1] if vs else -1


def commit_body(table: str, version: int) -> dict:
    """The raw commit JSON for ``version``."""
    with open(
        os.path.join(_log_path(table), f"{version:08d}.json"),
        encoding="utf-8",
    ) as f:
        return json.load(f)


def _commit_body_retained(table: str, version: int) -> dict:
    """:func:`commit_body`, but a commit deleted by ``expire_log``
    (including one expired by a RACING expiry after the caller listed
    the log) surfaces as an actionable ValueError naming the retention
    mechanism and the retained range, not a raw ENOENT (ADVICE r12)."""
    try:
        return commit_body(table, version)
    except FileNotFoundError:
        vs = _versions(table)
        rng = f"[{vs[0]}, {vs[-1]}]" if vs else "(empty log)"
        raise ValueError(
            f"commit {version} was expired from the log (expire_log); "
            f"retained versions are {rng} — restart this consumer "
            "from a retained version"
        ) from None


def _fold_log(table: str, version: int | None = None) -> _Snapshot:
    """ONE checkpoint+tail replay producing everything a snapshot
    reader needs (see :class:`_Snapshot`). All public snapshot
    accessors derive from this single fold — a pruned read replays
    the log once, not three times (ADVICE r11)."""
    target = latest_version(table) if version is None else version
    if target < 0:
        return _Snapshot({}, {}, None, [], [], {})
    vs = _versions(table)
    if target not in vs:
        raise ValueError(
            f"version {target} does not exist (have {vs[:3]}..{vs[-3:]})"
            if len(vs) > 6
            else f"version {target} does not exist (have {vs})"
        )
    log = _log_path(table)
    files: dict[str, int] = {}
    stats: dict[str, dict] = {}
    schema: list[dict] | None = None
    retired: list[str] = []
    pcols: list[str] = []
    constraints: dict[str, str] = {}
    start = 0
    cps = [c for c in _checkpoints(table) if c <= target]
    if cps:
        cp = cps[-1]
        with open(
            os.path.join(log, f"{cp:08d}.checkpoint.json"),
            encoding="utf-8",
        ) as f:
            body = json.load(f)
        files = dict(body["live"])
        stats = dict(body.get("stats", {}))
        schema = body.get("schema")
        retired = list(body.get("schema_retired", []))
        pcols = list(body.get("partition_cols", []))
        constraints = dict(body.get("constraints", {}))
        start = cp + 1
    for v in vs:
        if v < start or v > target:
            continue
        with open(os.path.join(log, f"{v:08d}.json"), encoding="utf-8") as f:
            commit = json.load(f)
        if commit.get("schema"):
            schema = commit["schema"]
        if commit.get("schema_retired") is not None:
            retired = list(commit["schema_retired"])
        if commit.get("partition_cols") is not None:
            # [] is meaningful: commit_repartition de-partitioning
            pcols = list(commit["partition_cols"])
        if commit.get("constraints") is not None:
            constraints = dict(commit["constraints"])
        for action in commit["actions"]:
            if "add" in action:
                p = action["add"]["path"]
                files[p] = int(action["add"]["rows"])
                st = action["add"].get("stats")
                if st:
                    stats[p] = st
                else:
                    stats.pop(p, None)
            elif "remove" in action:
                p = action["remove"]["path"]
                files.pop(p, None)
                stats.pop(p, None)
    return _Snapshot(files, stats, schema, retired, pcols, constraints)


def live_files(table: str, version: int | None = None) -> dict[str, int]:
    """``{relative data path: rows}`` live at ``version`` (default:
    newest). Folds the newest checkpoint at-or-below the version,
    then the commit tail — O(tail), not O(history)."""
    return _fold_log(table, version)[0]


def live_file_stats(
    table: str, version: int | None = None
) -> dict[str, dict]:
    """``{relative data path: {column: [min, max]}}`` for the files
    live at ``version`` — the file-skipping metadata each commit's
    add actions carry (Delta add.stats / Iceberg manifest-metrics
    analog). Files committed before stats existed (or columns whose
    types carry no stats) are simply absent — absence means "never
    prune", so pruning is advisory and can never change results."""
    snap = _fold_log(table, version)
    return {p: st for p, st in snap.stats.items() if p in snap.files}


def schema_fields(
    table: str, version: int | None = None
) -> list[dict] | None:
    """The ``[{"name", "type"}]`` column list as of ``version`` from
    the log's schema actions, or ``None`` for a pre-evolution log
    (whose schema is whatever its uniform parquet files carry)."""
    return _fold_log(table, version)[2]


def table_schema(
    table: str, version: int | None = None
) -> T.StructType | None:
    """The Spark schema as of ``version`` (``None`` if the log
    carries no schema action — legacy tables)."""
    fields = schema_fields(table, version)
    if fields is None:
        return None
    ddl = ", ".join(f"`{f['name']}` {f['type']}" for f in fields)
    return T.StructType.fromDDL(ddl)


def _phys(field: dict) -> str:
    """A field's PHYSICAL (on-disk) column name — pinned at column
    creation and NEVER changed by renames (Delta column-mapping
    analog), so every data file ever written stays readable."""
    return field.get("physical", field["name"])


def _phys_preds(
    fields: list[dict] | None, predicates: dict[str, tuple]
) -> dict[str, tuple]:
    """Map logical predicate columns to physical names (stats come
    from parquet footers, which know only physical names)."""
    if fields is None:
        return predicates
    m = {f["name"]: _phys(f) for f in fields}
    return {m.get(c, c): rng for c, rng in predicates.items()}


def _physical_schema(fields: list[dict]) -> T.StructType:
    ddl = ", ".join(f"`{_phys(f)}` {f['type']}" for f in fields)
    return T.StructType.fromDDL(ddl)


def _read_data(
    spark: SparkSession,
    table: str,
    paths: list[str],
    fields: list[dict] | None,
) -> DataFrame:
    """Read data files under the PHYSICAL schema (files written
    before a column existed serve NULL), then alias each column to
    its current LOGICAL name — the whole rename machinery is one
    plan-time projection, zero data movement."""
    if fields is None:
        return spark.read.parquet(*[os.path.join(table, p) for p in paths])
    df = spark.read.schema(_physical_schema(fields)).parquet(
        *[os.path.join(table, p) for p in paths]
    )
    if any(_phys(f) != f["name"] for f in fields):
        df = df.select(
            *[F.col(_phys(f)).alias(f["name"]) for f in fields]
        )
    return df


def _keep_after_prune(
    files: dict[str, int],
    stats: dict[str, dict],
    predicates: dict[str, tuple],
) -> list[str]:
    kept = []
    for p in files:
        st = stats.get(p, {})
        keep = True
        for col, (lo, hi) in predicates.items():
            rng = st.get(col)
            if rng is None:
                continue  # no stats -> cannot prune on this column
            try:
                disjoint = rng[1] < lo or rng[0] > hi
            except TypeError:
                continue  # incomparable types -> conservatively keep
            if disjoint:
                keep = False
                break
        if keep:
            kept.append(p)
    return kept


def pruned_files(
    table: str,
    predicates: dict[str, tuple],
    version: int | None = None,
) -> list[str]:
    """The live files that MAY hold rows matching every
    ``{column: (lo, hi)}`` inclusive range — files whose committed
    min/max DISPROVE intersection are skipped; files or columns
    without stats are conservatively kept. This is file skipping from
    log metadata alone: no parquet footer is opened, which is the
    point at 100 TB — a point lookup on a table clustered by
    ``commit_optimize(sort_cols=...)`` plans one file, not thousands."""
    snap = _fold_log(table, version)
    return _keep_after_prune(
        snap.files, snap.stats, _phys_preds(snap.schema, predicates)
    )


def _read_files(
    spark: SparkSession,
    table: str,
    paths: list[str],
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read data files with the table schema applied: files written
    before a column existed serve NULL for it (plain parquet schema
    evolution under an explicit read schema)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*[os.path.join(table, p) for p in paths])


def read_table(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    prune: dict[str, tuple] | None = None,
) -> DataFrame:
    """Snapshot read: the DataFrame over exactly the data files live
    at ``version`` (default newest) — time travel is just an older
    version number. ``prune`` ({column: (lo, hi)} inclusive ranges)
    skips files whose committed min/max stats disprove intersection
    BEFORE Spark ever lists them; it is advisory metadata pruning —
    the caller still applies its own row filter, so results are
    identical with or without it. The read applies the schema as of
    ``version`` when the log records one, so a table whose column
    set evolved serves older files with NULL for the later columns.
    An empty table raises (no schema to serve). One log replay total
    (fold once, prune from the same fold — ADVICE r11)."""
    snap = _fold_log(table, version)
    files, stats, fields = snap.files, snap.stats, snap.schema
    if not files:
        raise ValueError(f"versioned table {table!r} is empty at {version}")
    keep = (
        _keep_after_prune(files, stats, _phys_preds(fields, prune))
        if prune
        else list(files)
    )
    if not keep:
        # every file pruned: zero rows, schema from any live file
        return _read_data(
            spark, table, [next(iter(files))], fields
        ).limit(0)
    return _read_data(spark, table, keep, fields)


def commit_actions(table: str, version: int) -> tuple[list[str], list[str]]:
    """(added paths, removed paths) recorded by commit ``version``."""
    commit = commit_body(table, version)
    added = [a["add"]["path"] for a in commit["actions"] if "add" in a]
    removed = [
        a["remove"]["path"] for a in commit["actions"] if "remove" in a
    ]
    return added, removed


def _feed_schema(table: str, version: int) -> T.StructType | None:
    """The change-feed data schema at ``version`` + _change_type."""
    schema = table_schema(table, version)
    if schema is None:
        return None
    return T.StructType(
        list(schema.fields)
        + [T.StructField("_change_type", T.StringType())]
    )


def _align(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project to ``schema``'s columns exactly, serving a TYPED NULL
    for absent ones — the cross-schema-version alignment every feed
    union/diff needs (an untyped null column would break exceptAll)."""
    have = set(df.columns)
    return df.select(
        *[
            F.col(f.name)
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )


def read_changes(
    spark: SparkSession,
    table: str,
    start_version: int,
    end_version: int | None = None,
) -> DataFrame:
    """Row-level change feed for commits ``start_version..end_version``
    (inclusive; default: newest) — the Delta-CDF-shaped incremental
    read. Each row is tagged ``_change_type`` ('insert'/'delete') and
    ``_commit_version``; the feed carries exactly the NET row changes
    per commit (survivor rows rewritten unchanged by a copy-on-write
    commit never appear).

    Per-commit source, cheapest first:

    - ``dataChange: false`` commits (OPTIMIZE) are skipped without
      reading a byte — a no-op compaction costs consumers nothing.
    - Commits with persisted change files (``"cdf"``) are served by a
      plain parquet scan of those files — no diff at read time, and
      servable even after the commit's pre-image data files were
      vacuumed.
    - Append commits are served by scanning their added files as
      inserts — no diff needed, appends remove nothing.
    - Legacy change commits (written before persisted CDF) fall back
      to the file-diff reconstruction: rows in ADDED files
      ``exceptAll`` rows in REMOVED files are the inserts, the
      reverse the deletes. This needs the commit's files to still
      exist; a vacuumed range raises cleanly.

    Scale shape: every source is O(rows the commit touched), never
    the table; only the legacy fallback shuffles (one hash shuffle
    per diff leg)."""
    head = latest_version(table)
    end = head if end_version is None else end_version
    vs = _versions(table)
    if start_version not in vs or end not in vs or start_version > end:
        hint = (
            " — versions below were expired from the log (expire_log);"
            " restart this consumer from a retained version"
            if vs and start_version < vs[0]
            else ""
        )
        raise ValueError(
            f"change range [{start_version}, {end}] outside log {vs}"
            f"{hint}"
        )
    end_fields = schema_fields(table, end)
    feed_schema = _feed_schema(table, end)
    feed_fields = (
        end_fields
        + [{"name": "_change_type", "type": "string"}]
        if end_fields is not None
        else None
    )
    parts: list[DataFrame] = []
    for v in range(start_version, end + 1):
        if v not in vs:
            continue
        body = _commit_body_retained(table, v)
        if body.get("dataChange", True) is False:
            continue  # data-identical commit: nothing to feed
        added = [a["add"]["path"] for a in body["actions"] if "add" in a]
        removed = [
            a["remove"]["path"] for a in body["actions"] if "remove" in a
        ]
        if not added and not removed:
            continue
        cdf = body.get("cdf")
        if cdf is not None:
            cdf_paths = [c["path"] for c in cdf]
            missing = [
                p
                for p in cdf_paths
                if not os.path.isfile(os.path.join(table, p))
            ]
            if missing:
                raise ValueError(
                    f"change feed at version {v}: persisted change "
                    f"file {missing[0]} is gone"
                )
            if not cdf_paths:
                continue  # change commit whose net delta was empty
            part = _read_data(spark, table, cdf_paths, feed_fields)
        elif not removed:
            # pure append: the added files ARE the inserts
            for p in added:
                if not os.path.isfile(os.path.join(table, p)):
                    raise ValueError(
                        f"change feed at version {v} needs data file "
                        f"{p}, which was vacuumed — narrow the range "
                        "or raise the retention horizon (vacuum with "
                        "spark= persists deltas before reclaiming)"
                    )
            part = _read_data(
                spark, table, added, end_fields
            ).withColumn("_change_type", F.lit("insert"))
        else:
            # legacy change commit: reconstruct from the file diff
            for p in added + removed:
                if not os.path.isfile(os.path.join(table, p)):
                    raise ValueError(
                        f"change feed at version {v} needs data file "
                        f"{p}, which was vacuumed — narrow the range "
                        "or raise the retention horizon"
                    )
            add_df = (
                _read_files(spark, table, added) if added else None
            )
            rem_df = (
                _read_files(spark, table, removed) if removed else None
            )
            if add_df is None:
                add_df = rem_df.limit(0)
            if rem_df is None:
                rem_df = add_df.limit(0)
            cols = add_df.columns
            rem_df = rem_df.select(*cols)
            inserts = add_df.exceptAll(rem_df).withColumn(
                "_change_type", F.lit("insert")
            )
            deletes = rem_df.exceptAll(add_df).withColumn(
                "_change_type", F.lit("delete")
            )
            part = inserts.unionByName(deletes)
            if end_fields is not None:
                # the raw diff carries PHYSICAL column names — project
                # to the current logical names before alignment
                have = set(part.columns)
                part = part.select(
                    *[
                        F.col(_phys(f)).alias(f["name"])
                        for f in end_fields
                        if _phys(f) in have
                    ],
                    F.col("_change_type"),
                )
        if feed_schema is not None:
            part = _align(part, feed_schema)
        parts.append(
            part.withColumn("_commit_version", F.lit(v).cast("int"))
        )
    if not parts:
        # a valid range holding only data-identical (or empty-delta)
        # commits feeds ZERO rows — computed from metadata alone,
        # without reading a single data file (Delta dataChange:false)
        return (
            read_table(spark, table, version=end)
            .limit(0)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(0).cast("int"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def table_history(table: str) -> list[dict]:
    """One dict per commit (version, operation, n_add, n_remove) —
    the audit surface."""
    out = []
    for v in _versions(table):
        c = _commit_body_retained(table, v)
        out.append(
            {
                "version": v,
                "operation": c.get("operation", "?"),
                "n_add": sum(1 for a in c["actions"] if "add" in a),
                "n_remove": sum(1 for a in c["actions"] if "remove" in a),
            }
        )
    return out


def _file_stats(md) -> dict[str, list]:
    """Per-column [min, max] from a parquet footer's row-group
    statistics — the file-skipping metadata every commit carries
    (Delta's add.stats / Iceberg's manifest metrics analog). Only
    JSON-safe scalar columns participate; anything else is simply
    absent, and absence means "never prune on this column"."""
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            name = col.path_in_schema
            lo, hi = st.min, st.max
            if not isinstance(lo, (int, float, str, bool)):
                continue
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    return {c: [mins[c], maxs[c]] for c in mins if c in maxs}


def _stage_parquet(
    df: DataFrame,
    table: str,
    subdir: str,
    prefix: str,
    n_files: int | None = None,
    with_stats: bool = True,
) -> list[tuple[str, int, dict]]:
    """Write ``df`` as new immutable uuid-named parquet files under
    ``table/subdir``; returns [(relative path, rows, column stats)].
    The files are INVISIBLE until a commit references them."""
    staging = os.path.join(table, f".staging-{uuid.uuid4().hex}")
    w = df if n_files is None else df.repartition(n_files)
    w.write.mode("overwrite").parquet(staging)
    dest = os.path.join(table, subdir) if subdir else table
    os.makedirs(dest, exist_ok=True)
    out: list[tuple[str, int, dict]] = []
    import pyarrow.parquet as pq

    for n in sorted(os.listdir(staging)):
        if not n.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(staging, n))
        rows = md.num_rows
        if rows == 0:
            continue  # empty task outputs never enter the log
        name = f"{prefix}-{uuid.uuid4().hex}.parquet"
        rel = os.path.join(subdir, name) if subdir else name
        os.rename(os.path.join(staging, n), os.path.join(table, rel))
        out.append((rel, rows, _file_stats(md) if with_stats else {}))
    shutil.rmtree(staging, ignore_errors=True)
    return out


def _to_physical(df: DataFrame, fields: list[dict] | None) -> DataFrame:
    """Rename logical columns to their stable physical names before
    writing (extra non-data columns like _change_type pass through);
    data files then always carry physical names regardless of later
    renames."""
    if fields is None:
        return df
    m = {f["name"]: _phys(f) for f in fields}
    if all(m.get(c, c) == c for c in df.columns):
        return df
    return df.select(
        *[F.col(c).alias(m.get(c, c)) for c in df.columns]
    )


def _parse_part_value(raw: str, typ: str):
    """A hive directory segment's value, restored to the column's
    type (directory names stringify everything)."""
    if raw == _HIVE_NULL:
        return None
    v = unquote(raw)
    t = typ.lower()
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return int(v)
    if t in ("float", "double"):
        return float(v)
    if t == "boolean":
        return v.lower() == "true"
    return v


def _stage_partitioned(
    pdf: DataFrame,
    table: str,
    fields: list[dict] | None,
    pcols: list[str],
) -> list[tuple[str, int, dict, dict]]:
    """Stage ``pdf`` (already physical-named) hive-partitioned by the
    PHYSICAL columns ``pcols``. The partition columns STAY in the
    data files (readers keep one ordinary multi-file parquet relation
    with full pushdown — the directory split exists only at staging
    time); each file's add action records its exact partition values,
    which also enter the file's stats as exact [v, v] ranges so
    ``pruned_files`` skips non-matching partitions from log metadata
    alone. Returns [(path, rows, stats, partition_values)]."""
    typ = {_phys(f): f["type"] for f in (fields or [])}
    hp = {f"__hp_{i}": c for i, c in enumerate(pcols)}
    dup = pdf
    for hcol, c in hp.items():
        dup = dup.withColumn(hcol, F.col(f"`{c}`"))
    staging = os.path.join(table, f".staging-{uuid.uuid4().hex}")
    dup.write.mode("overwrite").partitionBy(*hp).parquet(staging)
    out: list[tuple[str, int, dict, dict]] = []
    import pyarrow.parquet as pq

    for root, _dirs, names in os.walk(staging):
        rel_dir = os.path.relpath(root, staging)
        vals: dict[str, object] = {}
        for seg in rel_dir.split(os.sep):
            if "=" not in seg:
                continue
            k, raw = seg.split("=", 1)
            if k not in hp:
                continue
            col = hp[k]
            vals[col] = _parse_part_value(raw, typ.get(col, "string"))
        if len(vals) != len(pcols):
            continue  # not a leaf partition directory
        for n in sorted(names):
            if not n.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, n))
            if md.num_rows == 0:
                continue
            name = f"part-{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(root, n), os.path.join(table, name))
            st = _file_stats(md)
            for c, v in vals.items():
                # only types _parse_part_value restores faithfully may
                # prune; date/timestamp/decimal values stay strings in
                # the action metadata and never enter stats (absence =
                # never prune — conservative, results unchanged).
                # 'float' (32-bit) is excluded too: Spark's shortest
                # directory repr round-trips to the FLOAT, not to its
                # widened double, so double(str(v)) can differ from
                # the double(v32) reads compare against by ~1e-8 rel —
                # a prune bound landing between the two would silently
                # drop a matching file. The parquet footer stats for
                # the column are already exact; keep those (ADVICE r12)
                t = typ.get(c, "string").lower()
                if v is not None and (
                    t in ("tinyint", "smallint", "int", "integer",
                          "bigint", "long", "double",
                          "boolean", "string")
                ):
                    st[c] = [v, v]  # exact: the file holds ONLY v
            out.append((name, md.num_rows, st, dict(vals)))
    shutil.rmtree(staging, ignore_errors=True)
    return out


def _stage_data_files(
    df: DataFrame,
    table: str,
    n_files: int | None = None,
    fields: list[dict] | None = None,
    pcols: list[str] | None = None,
    pre_shaped: bool = False,
) -> list[tuple[str, int, dict, dict]]:
    """Stage data files; with ``pcols`` (physical partition columns)
    the write is hive-split per partition value. Unless ``pre_shaped``,
    a partitioned stage first hash-repartitions by the partition
    columns (the standard dynamic-partition-insert shuffle) so each
    value lands in ONE task — one file per partition value per commit,
    not one per (input task × value)."""
    pdf = _to_physical(df, fields)
    if pcols:
        # a subset-write omitting a partition column would otherwise
        # die inside the hive split with a raw AnalysisException on an
        # internal __hp_N alias — name the real problem up front
        # (ADVICE r12)
        absent = [c for c in pcols if c not in pdf.columns]
        if absent:
            raise ValueError(
                "write to partitioned table omits partition column(s) "
                f"{_logical_names(fields, absent)} — every commit to a "
                "partitioned table must supply its partition columns"
            )
        if not pre_shaped:
            cols = [F.col(f"`{c}`") for c in pcols]
            pdf = (
                pdf.repartition(n_files, *cols)
                if n_files
                else pdf.repartition(*cols)
            )
        return _stage_partitioned(pdf, table, fields, pcols)
    return [
        (p, r, st, {})
        for p, r, st in _stage_parquet(pdf, table, "", "part", n_files)
    ]


def _add_action(p: str, r: int, st: dict, part: dict) -> dict:
    body = {"path": p, "rows": r, "stats": st}
    if part:
        body["partition"] = part
    return {"add": body}


def _stage_cdf_files(
    feed: DataFrame, table: str, fields: list[dict] | None = None
) -> list[dict]:
    """Persist a commit's net row delta (data columns +
    ``_change_type``) under ``_changes/``, physical column names;
    returns the ``"cdf"`` entries for the commit body."""
    return [
        {"path": p, "rows": r}
        for p, r, _ in _stage_parquet(
            _to_physical(feed, fields), table, CDF_DIR, "cdf",
            with_stats=False,
        )
    ]


def _schema_fields_of(df: DataFrame) -> list[dict]:
    return [
        {"name": f.name, "type": f.dataType.simpleString()}
        for f in df.schema.fields
    ]


def _merged_schema(
    existing: list[dict] | None,
    incoming: list[dict],
    context: str,
    retired: list[str] | None = None,
) -> list[dict] | None:
    """Existing columns first (types must match by logical name),
    then the incoming-only columns appended — the additive evolution
    contract. A new column whose name collides with a physical name
    still present in old data files (a retired dropped column, or a
    rename's pinned physical) gets a fresh uuid-suffixed physical
    name, so old bytes can never resurrect under the new column.
    Returns the fields to RECORD (None = no schema action needed)."""
    used = set(retired or [])
    if existing is None:
        return incoming
    by_name = {f["name"]: f["type"] for f in existing}
    used |= {_phys(f) for f in existing}
    for f in incoming:
        have = by_name.get(f["name"])
        if have is not None and have != f["type"]:
            raise ValueError(
                f"{context}: column {f['name']!r} is {have} in the "
                f"table but {f['type']} in the incoming data — "
                "changing a column's type is not supported (add a "
                "new column instead)"
            )
    new = []
    for f in incoming:
        if f["name"] in by_name:
            continue
        nf = dict(f)
        if nf["name"] in used:
            nf["physical"] = f"{nf['name']}-{uuid.uuid4().hex[:8]}"
        new.append(nf)
    if not new:
        return None  # no evolution: keep the current schema action
    return existing + new


def _write_checkpoint(table: str, version: int) -> None:
    """Fold the log at ``version`` and write its checkpoint — THE one
    place that knows the checkpoint body shape, so a new _Snapshot
    field cannot be persisted by one writer and lost by another."""
    snap = _fold_log(table, version)
    log = _log_path(table)
    cp = os.path.join(log, f"{version:08d}.checkpoint.json")
    cp_tmp = cp + f".tmp-{uuid.uuid4().hex}"
    body = {"version": version, "live": snap.files, "stats": snap.stats}
    if snap.schema is not None:
        body["schema"] = snap.schema
    if snap.retired:
        body["schema_retired"] = snap.retired
    if snap.partition_cols:
        body["partition_cols"] = snap.partition_cols
    if snap.constraints:
        body["constraints"] = snap.constraints
    with open(cp_tmp, "w", encoding="utf-8") as f:
        json.dump(body, f)
    os.replace(cp_tmp, cp)


def _try_commit(
    table: str,
    actions: list[dict],
    operation: str,
    expected_version: int,
    checkpoint_every: int = 10,
    data_change: bool = True,
    cdf: list[dict] | None = None,
    schema: list[dict] | None = None,
    schema_retired: list[str] | None = None,
    partition_cols: list[str] | None = None,
    constraints: dict[str, str] | None = None,
) -> int:
    """Claim version ``expected_version + 1`` atomically. Raises
    :class:`CommitConflict` if another writer got there first."""
    log = _log_path(table)
    os.makedirs(log, exist_ok=True)
    version = expected_version + 1
    body = {
        "version": version,
        "operation": operation,
        "actions": actions,
    }
    if not data_change:
        body["dataChange"] = False
    if cdf is not None:
        body["cdf"] = cdf
    if schema is not None:
        body["schema"] = schema
    if schema_retired is not None:
        body["schema_retired"] = schema_retired
    if partition_cols is not None:
        body["partition_cols"] = partition_cols
    if constraints is not None:
        body["constraints"] = constraints
    tmp = os.path.join(log, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(body, f)
    target = os.path.join(log, f"{version:08d}.json")
    try:
        # O_EXCL: the filesystem arbitrates exactly one winner
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        os.unlink(tmp)
        raise CommitConflict(
            f"version {version} was claimed concurrently"
        ) from None
    try:
        with open(tmp, "rb") as src:
            os.write(fd, src.read())
    finally:
        os.close(fd)
    os.unlink(tmp)
    if checkpoint_every and version % checkpoint_every == 0:
        _write_checkpoint(table, version)
    return version


def _check_constraints(
    df: DataFrame,
    constraints: dict[str, str],
    context: str,
    fields: list[dict] | None = None,
) -> None:
    """Reject the commit if any incoming row makes a constraint
    expression FALSE (ANSI CHECK semantics: NULL passes — spell NOT
    NULL as ``col IS NOT NULL``). With ``fields`` the incoming rows
    are first aligned to the table schema (absent columns evaluate as
    the typed NULL the lake will serve for them — a legal
    subset-append must pass exactly when its STORED rows do). One
    combined pass on the happy path; the per-constraint pass runs
    only to name the violated constraint in the error."""
    if not constraints:
        return
    if fields is not None:
        schema = T.StructType.fromDDL(
            ", ".join(f"`{f['name']}` {f['type']}" for f in fields)
        )
        df = _align(df, schema)
    viol = None
    for expr in constraints.values():
        v = F.expr(f"NOT coalesce(({expr}), true)")
        viol = v if viol is None else (viol | v)
    if df.filter(viol).limit(1).count():
        for name, expr in constraints.items():
            if (
                df.filter(F.expr(f"NOT coalesce(({expr}), true)"))
                .limit(1)
                .count()
            ):
                raise ConstraintViolation(
                    f"{context}: incoming rows violate constraint "
                    f"{name!r} ({expr}); nothing was committed"
                )
        raise ConstraintViolation(
            f"{context}: incoming rows violate a table constraint"
        )


def _logical_names(fields: list[dict] | None, phys: list[str]) -> list[str]:
    if fields is None:
        return list(phys)
    m = {_phys(f): f["name"] for f in fields}
    return [m.get(c, c) for c in phys]


def _resolve_partition_cols(
    snap: _Snapshot,
    effective: list[dict] | None,
    partition_by: list[str] | None,
    context: str,
) -> tuple[list[str], bool]:
    """The PHYSICAL partition columns this commit must stage under,
    plus whether the commit introduces them (first commit only —
    re-partitioning a live table would strand the existing files
    outside the layout, so it is rejected like Delta does)."""
    if snap.partition_cols:
        if partition_by is not None:
            m = (
                {f["name"]: _phys(f) for f in effective}
                if effective is not None
                else {}
            )
            want = [m.get(c, c) for c in partition_by]
            if want != snap.partition_cols:
                raise ValueError(
                    f"{context}: table is partitioned by "
                    f"{_logical_names(effective, snap.partition_cols)}, "
                    f"not {partition_by}"
                )
        return snap.partition_cols, False
    if not partition_by:
        return [], False
    if snap.files or snap.schema is not None:
        raise ValueError(
            f"{context}: cannot introduce partitioning on an existing "
            "table — partition_by is only honored on the FIRST commit"
        )
    names = {f["name"] for f in (effective or [])}
    missing = [c for c in partition_by if c not in names]
    if missing:
        raise ValueError(
            f"{context}: partition column(s) {missing} not in the data"
        )
    m = {f["name"]: _phys(f) for f in (effective or [])}
    return [m[c] for c in partition_by], True


def commit_append(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    n_files: int | None = None,
    max_retries: int = 20,
    partition_by: list[str] | None = None,
) -> int:
    """Append ``df`` as a new version. Appends never conflict
    logically, so a racing writer just re-claims the next number.
    New columns evolve the table schema (recorded in the commit);
    a same-name/different-type column raises.

    ``partition_by`` on the FIRST commit declares hive-style partition
    columns, recorded as a log action: every write is split per
    partition value (the columns stay in the data files, so reads are
    one ordinary parquet relation), each add action carries its exact
    partition values, and range reads prune non-matching partitions
    from log metadata alone. Later commits inherit the layout
    (passing a conflicting ``partition_by`` raises). Incoming rows
    are checked against the table's CHECK constraints first."""
    incoming = _schema_fields_of(df)
    base = latest_version(table)
    snap = _fold_log(table, base) if base >= 0 else _fold_log(table, None)
    existing, retired = snap.schema, snap.retired
    merged = _merged_schema(existing, incoming, "commit_append", retired)
    effective = merged if merged is not None else existing
    _check_constraints(df, snap.constraints, "commit_append", effective)
    pcols, introduces = _resolve_partition_cols(
        snap, effective, partition_by, "commit_append"
    )
    adds = [
        _add_action(p, r, st, part)
        for p, r, st, part in _stage_data_files(
            df, table, n_files, effective, pcols
        )
    ]

    def mapping(fields):
        if fields is None:
            return {c: c for c in df.columns}
        return {
            f["name"]: _phys(f) for f in fields if f["name"] in df.columns
        }

    staged_map = mapping(effective)
    checked = snap.constraints
    for _ in range(max_retries):
        try:
            return _try_commit(
                table, adds, "append", base, schema=merged,
                partition_cols=pcols if introduces else None,
            )
        except CommitConflict:
            base = latest_version(table)
            snap = _fold_log(table, base)
            existing, retired = snap.schema, snap.retired
            merged = _merged_schema(
                existing, incoming, "commit_append", retired
            )
            effective = merged if merged is not None else existing
            if mapping(effective) != staged_map:
                raise CommitConflict(
                    "commit_append: a concurrent commit changed the "
                    "column mapping under this append — re-run it"
                ) from None
            if snap.constraints != checked:
                # a constraint landed while this append raced: the
                # staged rows were never checked against it
                _check_constraints(
                    df, snap.constraints, "commit_append", effective
                )
                checked = snap.constraints
            if introduces:
                # partitioning may only be introduced by the FIRST
                # commit; losing the race means the table exists now
                raise CommitConflict(
                    "commit_append: lost the first-commit race while "
                    "introducing partitioning — re-run this append "
                    "against the now-existing table"
                ) from None
            if snap.partition_cols != pcols:
                raise CommitConflict(
                    "commit_append: a concurrent commit changed the "
                    "table's partition layout — re-run this append"
                ) from None
            continue
    raise CommitConflict(f"append lost {max_retries} version races")


_CMP_LIT = r"-?\d+(?:\.\d+)?|'(?:[^']|'')*'"
_CMP_RE = re.compile(
    r"^\s*(?:`(?P<qcol>[^`]+)`|(?P<col>[A-Za-z_][A-Za-z0-9_]*))\s*"
    r"(?P<op><=|>=|==|=|<|>)\s*(?P<lit>" + _CMP_LIT + r")\s*$"
)
_CMP_REV_RE = re.compile(
    r"^\s*(?P<lit>" + _CMP_LIT + r")\s*(?P<op><=|>=|==|=|<|>)\s*"
    r"(?:`(?P<qcol>[^`]+)`|(?P<col>[A-Za-z_][A-Za-z0-9_]*))\s*$"
)
_IN_RE = re.compile(
    r"^\s*(?:`(?P<qcol>[^`]+)`|(?P<col>[A-Za-z_][A-Za-z0-9_]*))\s+"
    r"(?i:in)\s*\((?P<body>[^()]*)\)\s*$"
)
# SQL keywords that the bare-identifier comparison pattern must never
# treat as a column name (``NOT x = 5`` splits off ``NOT`` cleanly, but
# defense in depth costs nothing)
_CMP_KEYWORDS = frozenset({"not", "and", "or", "in", "is", "null",
                           "true", "false", "between", "like", "exists"})

_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "==": "=="}


def _parse_sql_literal(tok: str):
    tok = tok.strip()
    if tok.startswith("'"):
        return tok[1:-1].replace("''", "'")
    return float(tok) if "." in tok else int(tok)


def _split_top_and(expr: str) -> list[str] | None:
    """Split ``expr`` on top-level AND (paren-depth 0, outside quoted
    strings). Returns ``None`` when a top-level OR is present: AND
    binds tighter than OR, so any depth-0 OR token means the root of
    the expression tree is a disjunction and NO conjunct is
    individually a necessary condition — deriving ranges from one
    would be unsound."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    i, n = 0, len(expr)
    saw_or = False
    while i < n:
        c = expr[i]
        if c == "'":
            # consume the quoted literal ('' is an escaped quote)
            j = i + 1
            while j < n:
                if expr[j] == "'":
                    if j + 1 < n and expr[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(expr[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and c.isalpha():
            j = i
            while j < n and (expr[j].isalnum() or expr[j] == "_"):
                j += 1
            word = expr[i:j].lower()
            boundary_l = i == 0 or not (
                expr[i - 1].isalnum() or expr[i - 1] in "_`"
            )
            if boundary_l and word == "or":
                saw_or = True
            if boundary_l and word == "and":
                parts.append("".join(buf))
                buf = []
                i = j
                continue
            buf.append(expr[i:j])
            i = j
            continue
        buf.append(c)
        i += 1
    if saw_or:
        return None
    parts.append("".join(buf))
    return parts


def _predicate_ranges(predicate: str) -> dict[str, tuple]:
    """Conservative, provably-sound range extraction from a SQL
    predicate string: only top-level AND conjuncts of the shape
    ``col <cmp> literal`` (either orientation) or ``col IN
    (literals)`` contribute; everything else — OR anywhere at the top
    level, NOT, BETWEEN (its AND token splits it into unparseable
    halves), function calls, column-to-column compares — contributes
    NOTHING, never a wrong range. Soundness argument: under a
    top-level AND every conjunct is a necessary condition, so a file
    whose stats are disjoint from one recognized conjunct's range
    cannot contain a matching row. Strict compares use their literal
    as an inclusive bound (loses a sliver of pruning, never a row).
    Returns ``{column: (lo | None, hi | None)}`` (None = unbounded).

    Two hard bail-outs keep the soundness contract airtight (review
    r13): a predicate containing a double quote or a backslash
    derives NOTHING — Spark lexes ``"..."`` as a string literal and
    ``\\'`` as an escaped quote, neither of which this lexer models,
    and text inside such a literal must never be mistaken for an AND
    conjunct; and a column whose conjuncts carry MIXED-TYPE bounds
    (``k >= '100' AND k >= 50`` — legal in Spark via implicit casts)
    is dropped from derivation entirely, since Python comparisons on
    the mixed values are ill-defined. SQL comments (``--``, ``/*``)
    bail out the same way — Spark strips them, this lexer would read
    the commented-out text as live conjuncts (review r13 #2)."""
    if any(t in predicate for t in ('"', "\\", "--", "/*")):
        return {}
    conjuncts = _split_top_and(predicate)
    if conjuncts is None:
        return {}
    los: dict[str, object] = {}
    his: dict[str, object] = {}
    dropped: set[str] = set()

    def _narrow(col: str, lo, hi) -> None:
        if col in dropped:
            return
        try:
            cur_lo, cur_hi = los.get(col), his.get(col)
            if lo is not None and (cur_lo is None or lo > cur_lo):
                cur_lo = lo
            if hi is not None and (cur_hi is None or hi < cur_hi):
                cur_hi = hi
        except TypeError:
            # mixed-type bounds for this column: comparisons are
            # ill-defined — stop deriving ranges for it (sound:
            # fewer bounds only)
            dropped.add(col)
            los.pop(col, None)
            his.pop(col, None)
            return
        if cur_lo is not None:
            los[col] = cur_lo
        if cur_hi is not None:
            his[col] = cur_hi

    for cj in conjuncts:
        m = _CMP_RE.match(cj)
        op = None
        if m:
            op = m.group("op")
        else:
            m = _CMP_REV_RE.match(cj)
            if m:
                op = _FLIP[m.group("op")]  # normalize to col-on-left
        if m and op:
            col = m.group("qcol") or m.group("col")
            if col.lower() in _CMP_KEYWORDS:
                continue
            v = _parse_sql_literal(m.group("lit"))
            if op in ("=", "=="):
                _narrow(col, v, v)
            elif op in ("<", "<="):
                _narrow(col, None, v)
            else:
                _narrow(col, v, None)
            continue
        m = _IN_RE.match(cj)
        if m:
            col = m.group("qcol") or m.group("col")
            if col.lower() in _CMP_KEYWORDS:
                continue
            toks = [t.strip() for t in m.group("body").split(",")]
            if not toks or any(
                not re.fullmatch(_CMP_LIT, t) for t in toks
            ):
                continue
            vals = [_parse_sql_literal(t) for t in toks]
            try:
                _narrow(col, min(vals), max(vals))
            except TypeError:
                continue  # mixed-type IN list: derive nothing
    cols = set(los) | set(his)
    return {c: (los.get(c), his.get(c)) for c in cols}


def _prune_candidates(
    files: dict[str, int],
    stats: dict[str, dict],
    ranges: dict[str, tuple],
) -> list[str]:
    """Open-interval flavor of :func:`_keep_after_prune` for the
    write-side locate: ``ranges`` values are ``(lo | None, hi | None)``
    necessary-condition bounds. Missing stats, unknown columns, and
    incomparable types all conservatively keep the file."""
    kept: list[str] = []
    for p in files:
        st = stats.get(p, {})
        keep = True
        for col, (lo, hi) in ranges.items():
            rng = st.get(col)
            if rng is None:
                continue
            try:
                if (hi is not None and rng[0] > hi) or (
                    lo is not None and rng[1] < lo
                ):
                    keep = False
                    break
            except TypeError:
                continue
        if keep:
            kept.append(p)
    return kept


_ATOMIC_KEY_TYPES = (
    T.NumericType, T.StringType, T.BooleanType, T.DateType,
    T.TimestampType, T.TimestampNTZType,
)


def _locate_touched(
    spark: SparkSession,
    table: str,
    snap: _Snapshot,
    keys: DataFrame | None = None,
    key_cols: list[str] | None = None,
    predicate: str | None = None,
) -> list[str]:
    """The live files holding at least one row matched by ``keys``
    (equi-join on ``key_cols``) or ``predicate`` — the write-side
    locate every copy-on-write commit needs.

    Scale shape (the read side's file-skipping discipline applied to
    writes — VERDICT r12 #1):

    1. **Stats-prune candidates from the log alone.** Key locates pay
       one small aggregate over the key frame for per-column min/max
       (zero TABLE I/O); predicate locates derive sound necessary
       ranges from the SQL's top-level AND conjuncts
       (:func:`_predicate_ranges`). Files whose committed min/max
       disprove intersection are never read — on a table clustered by
       ``commit_optimize(sort_cols=...)`` a point merge probes a
       handful of files, not the table.
    2. **ONE distributed probe job over the survivors.** All candidate
       files are read as one relation tagged with
       ``input_file_name()``; the semi-join / filter + distinct-file
       collect is bounded by the candidate count. Never one
       driver-dispatched Spark job per live file — at 10^4–10^5 files
       that serial loop is hours of job-submission latency before a
       single row is rewritten (the ``sinks/lake.py purge_keys``
       locate pattern, applied to the versioned log).

    Returns relative paths in live-set (commit) order.
    """
    files, stats, fields = snap.files, snap.stats, snap.schema
    if not files:
        return []
    ranges: dict[str, tuple] = {}
    if predicate is not None:
        ranges = _predicate_ranges(predicate)
    if keys is not None and key_cols:
        by_name = {f.name: f.dataType for f in keys.schema.fields}
        rangeable = [
            c for c in key_cols
            if isinstance(by_name.get(c), _ATOMIC_KEY_TYPES)
        ]
        aggs: list = [F.count(F.lit(1)).alias("__n")]
        for i, c in enumerate(rangeable):
            aggs.append(F.min(F.col(f"`{c}`")).alias(f"__lo_{i}"))
            aggs.append(F.max(F.col(f"`{c}`")).alias(f"__hi_{i}"))
        row = keys.agg(*aggs).collect()[0]
        if row["__n"] == 0:
            return []  # empty key set touches nothing
        for i, c in enumerate(rangeable):
            lo, hi = row[f"__lo_{i}"], row[f"__hi_{i}"]
            if lo is not None and hi is not None:
                # min/max skip NULL keys — sound, because an equi-join
                # on NULL never matches, so NULL keys touch no file
                ranges[c] = (lo, hi)
    cand = (
        _prune_candidates(files, stats, _phys_preds(fields, ranges))
        if ranges
        else list(files)
    )
    if not cand:
        return []
    probe = _read_data(spark, table, cand, fields).withColumn(
        "__vl_file", F.input_file_name()
    )
    if keys is not None and key_cols:
        probe = probe.join(keys, key_cols, "left_semi")
    if predicate is not None:
        probe = probe.filter(predicate)
    uris = [r[0] for r in probe.select("__vl_file").distinct().collect()]
    base = os.path.abspath(table)
    hit: set[str] = set()
    for u in uris:
        parsed = urlparse(u)
        if parsed.scheme in ("", "file"):
            p = unquote(parsed.path) if parsed.scheme else unquote(u)
        else:
            raise ValueError(
                f"_locate_touched: unsupported filesystem scheme "
                f"{parsed.scheme!r} in {u!r} (local lake paths only)"
            )
        rel = os.path.relpath(p, base)
        if rel not in files:
            raise RuntimeError(
                f"_locate_touched: probe reported {rel!r} (from {u!r}), "
                "which is not in the snapshot's live set — "
                "input_file_name mapping mismatch; aborting before any "
                "rewrite (originals untouched)"
            )
        hit.add(rel)
    return [p for p in files if p in hit]


def commit_delete_where(
    spark: SparkSession,
    table: str,
    predicate: str,
    write_cdf: bool = True,
) -> int:
    """Copy-on-write delete: rewrite ONLY the live files that contain
    matching rows (survivors re-staged, fully-matched files dropped),
    commit remove+add atomically. Files with no matching rows are
    untouched — the file-targeted asymmetry that makes deletes
    affordable on a 100 TB table.

    With ``write_cdf`` (default) the deleted rows — the commit's
    exact net delta, already materialized by the rewrite — are
    persisted once under ``_changes/`` so change-feed consumers read
    them as a plain scan instead of re-diffing the touched files.

    Locate shape: sound ranges derived from the predicate's top-level
    AND conjuncts stats-prune candidates from the log alone, then ONE
    distributed probe job finds the touched files — never a Spark job
    per live file (see :func:`_locate_touched`)."""
    base = latest_version(table)
    snap = _fold_log(table, base if base >= 0 else None)
    fields = snap.schema
    touched = _locate_touched(spark, table, snap, predicate=predicate)
    actions: list[dict] = [{"remove": {"path": p}} for p in touched]
    cdf_entries: list[dict] | None = None
    if touched:
        touched_df = _read_data(spark, table, touched, fields)
        # SQL DELETE semantics: only rows where the predicate is TRUE
        # are deleted — a NULL predicate keeps the row. A bare
        # NOT(pred) filter would evaluate NULL for those rows and
        # silently drop them from the rewrite while the delete leg
        # (filter(pred)) also excludes them: the row would vanish
        # without ever entering the change feed (review r13).
        survivors = touched_df.filter(
            f"NOT coalesce(({predicate}), false)"
        )
        actions += [
            _add_action(p, r, st, part)
            for p, r, st, part in _stage_data_files(
                survivors, table, None, fields, snap.partition_cols
            )
        ]
        if write_cdf:
            # net delta of a delete == the matching rows, verbatim
            deleted = touched_df.filter(predicate).withColumn(
                "_change_type", F.lit("delete")
            )
            cdf_entries = _stage_cdf_files(deleted, table, fields)
    elif write_cdf:
        cdf_entries = []  # empty delta, recorded as such
    # a delete computed against a stale snapshot must NOT blind-retry:
    # the conflict surfaces to the caller, who re-runs on the new head
    return _try_commit(table, actions, "delete", base, cdf=cdf_entries)


def commit_upsert_keys(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key_cols: list[str],
    write_cdf: bool = True,
    update_semantics: bool = False,
) -> int:
    """MERGE by key: rewrite the live files holding any incoming key
    (old versions of those keys dropped), append the incoming rows.
    One version: readers see the upsert atomically or not at all.
    New columns in ``df`` evolve the table schema (same contract as
    :func:`commit_append`).

    With ``write_cdf`` (default) the NET row delta (incoming rows
    ``exceptAll`` dropped rows as inserts, the reverse as deletes —
    an incoming row identical to the row it replaces cancels, the
    same multiset semantics the file-diff reconstruction yields) is
    persisted under ``_changes/`` at write time: one diff shuffle
    paid by the writer over O(rows touched), zero paid by any number
    of feed consumers.

    ``update_semantics`` switches the persisted delta to Delta-CDF
    update classification: a key present on both sides feeds its old
    row as ``update_preimage`` and its new row as
    ``update_postimage`` (even when byte-identical — MERGE touched
    it), a new key feeds ``insert``. Cheaper than the net diff (two
    key-semi-joins, no exceptAll) and the classification downstream
    MERGE consumers want; the default stays the net insert/delete
    feed so the batch reconstruction and the write-time delta agree
    bit-for-bit.

    Locate shape: the incoming keys' per-column min/max stats-prune
    candidate files from the log alone (a key-range-clustered table —
    ``commit_optimize(sort_cols=...)`` — narrows a point merge to a
    handful of files), then ONE distributed probe job finds the
    touched files — never a Spark job per live file (see
    :func:`_locate_touched`)."""
    base = latest_version(table)
    snap = _fold_log(table, base if base >= 0 else None)
    existing_fields, retired = snap.schema, snap.retired
    merged = _merged_schema(
        existing_fields, _schema_fields_of(df), "commit_upsert_keys",
        retired,
    )
    eff = merged if merged is not None else existing_fields
    _check_constraints(df, snap.constraints, "commit_upsert_keys", eff)
    keys = df.select(*key_cols).distinct()
    touched = _locate_touched(
        spark, table, snap, keys=keys, key_cols=key_cols
    )
    actions: list[dict] = [{"remove": {"path": p}} for p in touched]
    dropped = None
    if touched:
        touched_df = _read_data(spark, table, touched, existing_fields)
        survivors = touched_df.join(keys, key_cols, "left_anti")
        actions += [
            _add_action(p, r, st, part)
            for p, r, st, part in _stage_data_files(
                survivors, table, None, eff, snap.partition_cols
            )
        ]
        if write_cdf:
            dropped = touched_df.join(keys, key_cols, "left_semi")
    actions += [
        _add_action(p, r, st, part)
        for p, r, st, part in _stage_data_files(
            df, table, None, eff, snap.partition_cols
        )
    ]
    cdf_entries: list[dict] | None = None
    if write_cdf:
        out_fields = (
            merged
            if merged is not None
            else (
                existing_fields
                if existing_fields is not None
                else _schema_fields_of(df)
            )
        )
        out_schema = T.StructType.fromDDL(
            ", ".join(f"`{f['name']}` {f['type']}" for f in out_fields)
        )
        incoming = _align(df, out_schema)
        if dropped is None:
            feed = incoming.withColumn("_change_type", F.lit("insert"))
        elif update_semantics:
            dropped = _align(dropped, out_schema)
            old_keys = dropped.select(*key_cols).distinct()
            pre = dropped.withColumn(
                "_change_type", F.lit("update_preimage")
            )
            post = incoming.join(old_keys, key_cols, "left_semi").withColumn(
                "_change_type", F.lit("update_postimage")
            )
            ins = incoming.join(old_keys, key_cols, "left_anti").withColumn(
                "_change_type", F.lit("insert")
            )
            feed = pre.unionByName(post).unionByName(ins)
        else:
            dropped = _align(dropped, out_schema)
            inserts = incoming.exceptAll(dropped).withColumn(
                "_change_type", F.lit("insert")
            )
            deletes = dropped.exceptAll(incoming).withColumn(
                "_change_type", F.lit("delete")
            )
            feed = inserts.unionByName(deletes)
        cdf_entries = _stage_cdf_files(feed, table, eff)
    return _try_commit(
        table, actions, "upsert", base, cdf=cdf_entries, schema=merged
    )


def commit_merge(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key_cols: list[str],
    delete_when: str | None = None,
    insert_new: bool = True,
    write_cdf: bool = True,
    evolve_schema: bool = False,
) -> int:
    """MERGE with clauses (Delta ``MERGE INTO`` analog) — the atomic
    CDC-apply commit:

    - a source row matching ``delete_when`` DELETES its target key if
      present (and is a no-op if not — a delete for an unseen key
      never inserts);
    - every other source row UPDATEs its matched key (replace) or,
      with ``insert_new`` (default), INSERTs as a new key; with
      ``insert_new=False`` unmatched non-delete rows are dropped
      (update-only merge).

    One version: readers see the whole apply or none of it — the
    operation ``commit_upsert_keys`` + ``commit_delete_where`` would
    otherwise need two commits (and an inconsistent state between
    them). ``delete_when`` is SQL over the SOURCE row's columns (the
    CDC op-code pattern: ``"op = 'd'"``).

    Source-only columns (like the ``op`` code the clauses read) do
    NOT enter the table by default — the written rows are projected
    to the target's columns, Delta's ``UPDATE SET * / INSERT *``
    name-mapping; ``evolve_schema=True`` opts into the additive
    evolution ``commit_append``/``commit_upsert_keys`` apply. A
    target column absent from the source raises (a replace-merge
    cannot synthesize values).

    Scale shape: identical to the upsert — key min/max stats-prune
    candidate files from the log, ONE distributed probe job locates
    the touched files (never a job per file — see
    :func:`_locate_touched`), survivors rewrite once, and the
    persisted change delta costs one diff shuffle over O(rows
    touched) paid by the writer."""
    base = latest_version(table)
    snap = _fold_log(table, base if base >= 0 else None)
    existing_fields, retired = snap.schema, snap.retired
    if existing_fields is not None and not evolve_schema:
        want = [f["name"] for f in existing_fields]
        missing = [c for c in want if c not in df.columns]
        if missing:
            raise ValueError(
                f"commit_merge: source is missing target column(s) "
                f"{missing} (a replace-merge writes whole rows)"
            )
        # same type contract as append/upsert: a type-mismatched
        # source would stage files every later read chokes on
        want_types = {f["name"]: f["type"] for f in existing_fields}
        src_types = {f["name"]: f["type"] for f in _schema_fields_of(df)}
        for c in want:
            if src_types[c] != want_types[c]:
                raise ValueError(
                    f"commit_merge: column {c!r} is {want_types[c]} in "
                    f"the table but {src_types[c]} in the source — "
                    "changing a column's type is not supported"
                )
        df = df.select(*want, *[c for c in df.columns if c not in want])
        data_df = df.select(*want)
        merged = None
    else:
        data_df = df
        merged = _merged_schema(
            existing_fields, _schema_fields_of(df), "commit_merge", retired
        )
    eff = merged if merged is not None else (
        existing_fields
        if existing_fields is not None
        else _schema_fields_of(data_df)
    )
    data_cols = [f["name"] for f in eff]
    if delete_when:
        upd_src = df.filter(f"NOT coalesce(({delete_when}), false)").select(
            *data_cols
        )
    else:
        upd_src = df.select(*data_cols)
    keys = df.select(*key_cols).distinct()
    touched = _locate_touched(
        spark, table, snap, keys=keys, key_cols=key_cols
    )
    actions: list[dict] = [{"remove": {"path": p}} for p in touched]
    dropped = None
    matched_keys = None
    if touched:
        touched_df = _read_data(spark, table, touched, existing_fields)
        survivors = touched_df.join(keys, key_cols, "left_anti")
        actions += [
            _add_action(p, r, st, part)
            for p, r, st, part in _stage_data_files(
                survivors, table, None, eff, snap.partition_cols
            )
        ]
        dropped = touched_df.join(keys, key_cols, "left_semi")
        matched_keys = dropped.select(*key_cols).distinct()
    if insert_new or matched_keys is None:
        incoming_rows = upd_src
        if matched_keys is None and not insert_new:
            incoming_rows = upd_src.limit(0)
    else:
        # update-only: keep source rows whose key exists in the target
        incoming_rows = upd_src.join(matched_keys, key_cols, "left_semi")
    # constraints are checked on exactly the rows this merge WRITES
    # (survivors already passed; rows an update-only merge drops or a
    # delete clause removes never enter the table, so they cannot
    # reject the commit)
    _check_constraints(incoming_rows, snap.constraints, "commit_merge", eff)
    actions += [
        _add_action(p, r, st, part)
        for p, r, st, part in _stage_data_files(
            incoming_rows, table, None, eff, snap.partition_cols
        )
    ]
    cdf_entries: list[dict] | None = None
    if write_cdf:
        out_fields = eff
        out_schema = T.StructType.fromDDL(
            ", ".join(f"`{f['name']}` {f['type']}" for f in out_fields)
        )
        incoming = _align(incoming_rows, out_schema)
        if dropped is None:
            feed = incoming.withColumn("_change_type", F.lit("insert"))
        else:
            dropped_a = _align(dropped, out_schema)
            inserts = incoming.exceptAll(dropped_a).withColumn(
                "_change_type", F.lit("insert")
            )
            deletes = dropped_a.exceptAll(incoming).withColumn(
                "_change_type", F.lit("delete")
            )
            feed = inserts.unionByName(deletes)
        cdf_entries = _stage_cdf_files(feed, table, eff)
    return _try_commit(
        table, actions, "merge", base, cdf=cdf_entries, schema=merged
    )


def commit_optimize(
    spark: SparkSession,
    table: str,
    n_files: int = 1,
    sort_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
    curve: str = "morton",
    small_file_rows: int | None = None,
) -> int:
    """Bin-pack the table's live files into ``n_files`` (optionally
    range-sorted by ``sort_cols`` for scan locality) as ONE
    data-identical commit: every live file is removed, the rewritten
    files added, rows unchanged — the Delta OPTIMIZE (+ optional
    Z-ORDER-style clustering) analog, and the standard answer to the
    small-file problem a long-lived CDC-fed table accumulates. Readers
    at older versions still see the old files (vacuum reclaims them
    once the retention horizon passes); a concurrent writer wins or
    loses the version race atomically as usual. The commit is marked
    ``dataChange: false`` (Delta semantics), so change-feed consumers
    skip it without reading a byte — a 100 TB compaction costs the
    CDC fan-out NOTHING.

    ``zorder_cols`` (two or more numeric columns, exclusive with
    ``sort_cols``) clusters by the interleaved-bit Morton key instead
    of a linear sort — per-file min/max stats then stay tight on ALL
    the interleaved columns (bit share 1/N each), so
    ``read_table(prune=...)`` skips files for range predicates on ANY
    of them (Delta Z-ORDER analog; a linear sort gives one column
    tight stats and leaves every other column's ranges spanning the
    domain). Per-dimension bit width shrinks as N grows
    (``default_zbits`` keeps the key a non-negative BIGINT), so
    pruning selectivity per column degrades gracefully with N — the
    standard Z-ORDER trade. ``curve="hilbert"`` (exactly two columns)
    clusters by the Hilbert index instead: consecutive cells are
    always unit-step neighbors (no Morton quadrant jumps), so
    equal-size files cover tighter rectangles and prune harder at the
    same file count.

    ``small_file_rows`` makes the compaction INCREMENTAL (Delta's
    minFileSize behavior, the only form that works at 100 TB where a
    full rewrite is off the table): only live files holding fewer
    than that many rows — the small-file tail a CDC feed accumulates
    — are read and rewritten; every larger file keeps its exact path
    (zero I/O). The selection costs nothing: per-file row counts are
    already in the log, so no file is opened to decide. Fewer than
    two small files means there is nothing to bin-pack — the call
    returns the current version WITHOUT writing a commit (idempotent:
    run it on a cron, it only pays when there is tail to fold).
    Clustering options apply to the REWRITTEN subset only — the
    incremental form trades global clustering for O(tail) work,
    exactly the Delta OPTIMIZE trade.

    Scale shape: one read of the live set (or of the small tail),
    one write of ``n_files``
    range/round-robin partitions — no driver-side data movement; at
    cluster scale ``n_files`` is sized to ~128 MB/file like any
    compaction job."""
    if sort_cols and zorder_cols:
        raise ValueError(
            "commit_optimize: sort_cols and zorder_cols are exclusive"
        )
    if zorder_cols is not None and len(zorder_cols) < 2:
        raise ValueError(
            "commit_optimize: zorder_cols takes two or more columns "
            f"(got {zorder_cols})"
        )
    if curve not in ("morton", "hilbert"):
        raise ValueError(
            f"commit_optimize: curve must be 'morton' or 'hilbert', "
            f"got {curve!r}"
        )
    if curve == "hilbert" and (
        zorder_cols is None or len(zorder_cols) != 2
    ):
        raise ValueError(
            "commit_optimize: curve='hilbert' takes exactly two "
            f"zorder_cols (got {zorder_cols}) — the N-dim form is "
            "curve='morton'"
        )
    base = latest_version(table)
    snap = _fold_log(table, base if base >= 0 else None)
    files, fields = snap.files, snap.schema
    if not files:
        raise ValueError(f"versioned table {table!r} is empty")
    if small_file_rows is not None:
        # incremental: select the small-file tail from the LOG's
        # per-file row counts — zero I/O to decide, zero I/O for
        # every file left in place. The no-op bound is n_files, not
        # 2: a tail already at <= n_files files cannot shrink, and
        # re-folding it forever would write an unbounded stream of
        # dataChange:false commits from a cron (review r13 #3 — the
        # n_files=1 case happened to converge, n_files>1 did not)
        files = {
            p: r for p, r in files.items() if r < small_file_rows
        }
        if len(files) <= max(1, n_files):
            return base  # tail cannot shrink; no commit written
    df = _read_data(spark, table, list(files), fields)
    if zorder_cols:
        from graal_cdc_spark.operators.layout import (
            cluster_by_zorder_n,
            default_zbits,
            normalize_expr,
        )

        # the interleave needs non-negative ints in [0, 2^bits): one
        # bounded min/max pass supplies the literal normalization
        # bounds (the cluster contract) — negatives or wide domains
        # would otherwise interleave meaningless low bits and the
        # layout would prune nothing
        aggs = []
        for i, c in enumerate(zorder_cols):
            aggs.append(F.min(F.col(c).cast("bigint")).alias(f"lo{i}"))
            aggs.append(F.max(F.col(c).cast("bigint")).alias(f"hi{i}"))
        b = df.agg(*aggs).collect()[0]
        if any(b[f"lo{i}"] is None for i in range(len(zorder_cols))):
            raise ValueError(
                "commit_optimize: zorder_cols must be numeric columns "
                f"with at least one non-null value (got {zorder_cols})"
            )
        # hilbert: 8 bits/dim — the chain unrolls one projection per
        # bit and file-level min/max stats need no finer grid
        zbits = 8 if curve == "hilbert" else default_zbits(
            len(zorder_cols)
        )
        zc = []
        for i, c in enumerate(zorder_cols):
            zc.append(f"__z{i}")
            df = df.withColumn(
                f"__z{i}",
                normalize_expr(
                    f"`{c}`", b[f"lo{i}"], b[f"hi{i}"], bits=zbits
                ),
            )
        if curve == "hilbert":
            from graal_cdc_spark.operators.layout import (
                hilbert_key2_frame,
            )

            df = (
                hilbert_key2_frame(df, zc[0], zc[1], zbits, out="__hk")
                .repartitionByRange(n_files, "__hk")
                .sortWithinPartitions("__hk")
                .drop("__hk", *zc)
            )
        else:
            df = cluster_by_zorder_n(df, zc, n_files, bits=zbits).drop(
                *zc
            )
        staged = _stage_data_files(
            df, table, None, fields, snap.partition_cols or None,
            pre_shaped=True,
        )
        actions = [{"remove": {"path": p}} for p in files]
        actions += [
            _add_action(p, r, st, part) for p, r, st, part in staged
        ]
        return _try_commit(
            table, actions, "optimize", base, data_change=False
        )
    pcols = snap.partition_cols
    if pcols:
        # partition-preserving compaction: hash each partition value
        # to ONE task (one output file per value), sorted within when
        # clustering is requested — the layout survives OPTIMIZE
        lp = [F.col(f"`{c}`") for c in _logical_names(fields, pcols)]
        df = df.repartition(n_files, *lp)
        if sort_cols:
            df = df.sortWithinPartitions(*sort_cols)
        staged = _stage_data_files(
            df, table, None, fields, pcols, pre_shaped=True
        )
    elif sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
        staged = _stage_data_files(df, table, None, fields)
    else:
        staged = _stage_data_files(df, table, n_files, fields)
    actions = [{"remove": {"path": p}} for p in files]
    actions += [
        _add_action(p, r, st, part) for p, r, st, part in staged
    ]
    # like delete: a stale-snapshot optimize must not blind-retry
    return _try_commit(
        table, actions, "optimize", base, data_change=False
    )


def commit_repartition(
    spark: SparkSession,
    table: str,
    partition_by: list[str],
) -> int:
    """Change a LIVE table's hive partition layout — the partition
    evolution `_resolve_partition_cols` deliberately refuses to do
    implicitly on a write (VERDICT r12 missing #2). Every live file is
    rewritten under the new layout in one staged distributed write and
    committed atomically as remove(all old) + add(new) with
    ``dataChange: false``: the rows are IDENTICAL (exactly like
    OPTIMIZE), so change-feed consumers and the streaming source skip
    the commit with zero I/O, while older versions keep time-traveling
    under the layout the log recorded for them (``partition_cols`` is
    folded per commit). ``partition_by=[]`` removes partitioning.
    Subsequent writes inherit the new layout; pruning via each file's
    exact partition-value stats starts working for the new columns at
    this version. Like OPTIMIZE/delete, a stale-snapshot race
    surfaces :class:`CommitConflict` rather than blind-retrying
    (the rewrite decisions are stale).

    Scale shape: one distributed read of the live set, one
    hive-split staged write (the standard dynamic-partition-insert
    shuffle on the new keys) — no driver-side data movement, no
    per-file job dispatch."""
    base = latest_version(table)
    snap = _fold_log(table, base if base >= 0 else None)
    files, fields = snap.files, snap.schema
    if not files:
        raise ValueError(
            f"commit_repartition: versioned table {table!r} is empty"
        )
    names = {f["name"] for f in (fields or [])}
    missing = [c for c in partition_by if c not in names]
    if missing:
        raise ValueError(
            f"commit_repartition: partition column(s) {missing} not "
            "in the table schema"
        )
    m = {f["name"]: _phys(f) for f in (fields or [])}
    pcols = [m[c] for c in partition_by]
    if pcols == snap.partition_cols:
        raise ValueError(
            f"commit_repartition: table already partitioned by "
            f"{partition_by} — nothing to do"
        )
    df = _read_data(spark, table, list(files), fields)
    staged = _stage_data_files(df, table, None, fields, pcols or None)
    actions = [{"remove": {"path": p}} for p in files]
    actions += [
        _add_action(p, r, st, part) for p, r, st, part in staged
    ]
    return _try_commit(
        table, actions, "repartition", base, data_change=False,
        partition_cols=pcols,
    )


def _require_schema_action(table: str, base: int, op: str) -> _Snapshot:
    if base < 0:
        raise ValueError(f"{op}: versioned table {table!r} is empty")
    snap = _fold_log(table, base)
    if snap.schema is None:
        raise ValueError(
            f"{op}: table {table!r} predates schema actions — run one "
            "append with the current schema first to upgrade the log"
        )
    return snap


def _constraint_references(constraints: dict[str, str], col: str) -> str | None:
    """The name of a constraint whose expression mentions ``col`` as
    an identifier token, or None. Conservative by design (a string
    literal containing the word also matches): renaming or dropping a
    possibly-referenced column must drop the constraint first."""
    pat = re.compile(rf"(?<![A-Za-z0-9_`]){re.escape(col)}(?![A-Za-z0-9_`])")
    for name, expr in constraints.items():
        if pat.search(expr):
            return name
    return None


def rename_column(table: str, old: str, new: str) -> int:
    """Rename a column as a METADATA-ONLY commit (Delta
    column-mapping analog): the field keeps its pinned PHYSICAL name,
    so every data/change file ever written stays readable and ZERO
    bytes move; readers at older versions still see the old name.
    The commit carries ``dataChange: false`` — feeds skip it."""
    base = latest_version(table)
    snap = _require_schema_action(table, base, "rename_column")
    fields, retired = snap.schema, snap.retired
    names = {f["name"] for f in fields}
    if old not in names:
        raise ValueError(f"rename_column: no column {old!r} (have {sorted(names)})")
    if new in names:
        raise ValueError(f"rename_column: column {new!r} already exists")
    ref = _constraint_references(snap.constraints, old)
    if ref:
        raise ValueError(
            f"rename_column: constraint {ref!r} references {old!r} — "
            "drop the constraint first, rename, then re-add it under "
            "the new name"
        )
    out = []
    for f in fields:
        if f["name"] == old:
            nf = dict(f)
            nf["physical"] = _phys(f)  # pin the on-disk name forever
            nf["name"] = new
            out.append(nf)
        else:
            out.append(f)
    return _try_commit(
        table, [], "rename_column", base, data_change=False,
        schema=out, schema_retired=retired or None,
    )


def drop_column(table: str, name: str) -> int:
    """Drop a column as a METADATA-ONLY commit: data files keep the
    bytes (invisible — reads project the column away), time travel
    still serves it at older versions, and the column's PHYSICAL name
    is RETIRED so a later re-add of the same logical name gets a
    fresh physical name and can never resurrect the old values."""
    base = latest_version(table)
    snap = _require_schema_action(table, base, "drop_column")
    fields, retired = snap.schema, snap.retired
    hit = [f for f in fields if f["name"] == name]
    if not hit:
        raise ValueError(
            f"drop_column: no column {name!r} "
            f"(have {sorted(f['name'] for f in fields)})"
        )
    if len(fields) == 1:
        raise ValueError("drop_column: cannot drop the last column")
    if _phys(hit[0]) in snap.partition_cols:
        raise ValueError(
            f"drop_column: {name!r} is a partition column — the "
            "table's layout depends on it"
        )
    ref = _constraint_references(snap.constraints, name)
    if ref:
        raise ValueError(
            f"drop_column: constraint {ref!r} references {name!r} — "
            "drop the constraint first"
        )
    out = [f for f in fields if f["name"] != name]
    return _try_commit(
        table, [], "drop_column", base, data_change=False,
        schema=out,
        schema_retired=sorted(set(retired) | {_phys(hit[0])}),
    )


def table_partition_cols(
    table: str, version: int | None = None
) -> list[str]:
    """The table's declared partition columns (LOGICAL names) as of
    ``version``, or [] for an unpartitioned table."""
    snap = _fold_log(table, version)
    return _logical_names(snap.schema, snap.partition_cols)


def table_constraints(
    table: str, version: int | None = None
) -> dict[str, str]:
    """The table's CHECK constraints ``{name: SQL expr}`` as of
    ``version`` (Delta constraint-metadata analog)."""
    return dict(_fold_log(table, version).constraints)


def add_constraint(
    table: str,
    name: str,
    expr: str,
    spark: SparkSession | None = None,
) -> int:
    """Add a CHECK constraint as a metadata-only commit (Delta
    ``ALTER TABLE ADD CONSTRAINT`` analog). Every later append/upsert
    rejects rows for which ``expr`` evaluates to FALSE (ANSI
    semantics: NULL passes — spell NOT NULL as ``col IS NOT NULL``),
    BEFORE any file enters the log, so readers never see a row that
    broke the contract. With ``spark`` the EXISTING live data is
    validated first (one distributed scan, the same price Delta
    pays); without it the constraint only governs future writes.

    Scale shape: enforcement is one combined JVM-side filter over the
    incoming batch (no shuffle, no Python); the constraint itself is
    O(1) commit JSON."""
    base = latest_version(table)
    if base < 0:
        raise ValueError(f"add_constraint: table {table!r} is empty")
    snap = _fold_log(table, base)
    if name in snap.constraints:
        raise ValueError(
            f"add_constraint: constraint {name!r} already exists "
            f"({snap.constraints[name]})"
        )
    if spark is not None and snap.files:  # zero live rows: trivially valid
        bad = (
            read_table(spark, table, version=base)
            .filter(F.expr(f"NOT coalesce(({expr}), true)"))
            .limit(1)
            .count()
        )
        if bad:
            raise ConstraintViolation(
                f"add_constraint: existing rows violate {name!r} "
                f"({expr}) — clean the table first"
            )
    cons = dict(snap.constraints)
    cons[name] = expr
    return _try_commit(
        table, [], "add_constraint", base, data_change=False,
        constraints=cons,
    )


def drop_constraint(table: str, name: str) -> int:
    """Remove a CHECK constraint (metadata-only commit)."""
    base = latest_version(table)
    if base < 0:
        raise ValueError(f"drop_constraint: table {table!r} is empty")
    snap = _fold_log(table, base)
    if name not in snap.constraints:
        raise ValueError(
            f"drop_constraint: no constraint {name!r} "
            f"(have {sorted(snap.constraints)})"
        )
    cons = {k: v for k, v in snap.constraints.items() if k != name}
    return _try_commit(
        table, [], "drop_constraint", base, data_change=False,
        constraints=cons,
    )


def _rewrite_commit_body(table: str, version: int, body: dict) -> None:
    """Atomically replace a commit's JSON (derived-metadata
    enrichment only — actions are never edited)."""
    log = _log_path(table)
    target = os.path.join(log, f"{version:08d}.json")
    tmp = target + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(body, f)
    os.replace(tmp, target)


def _materialize_cdf(
    spark: SparkSession, table: str, version: int, body: dict
) -> None:
    """Back-fill a commit's persisted change files from its (still
    present) data files — called by vacuum before it deletes a file
    the feed would need, so ``read_changes``/the streaming source
    keep serving past the retention horizon (VERDICT r11 #6)."""
    added = [a["add"]["path"] for a in body["actions"] if "add" in a]
    removed = [
        a["remove"]["path"] for a in body["actions"] if "remove" in a
    ]
    if not removed:
        feed = _read_files(spark, table, added).withColumn(
            "_change_type", F.lit("insert")
        )
    else:
        add_df = (
            _read_files(spark, table, added) if added else None
        )
        rem_df = (
            _read_files(spark, table, removed) if removed else None
        )
        if add_df is None:
            add_df = rem_df.limit(0)
        if rem_df is None:
            rem_df = add_df.limit(0)
        rem_df = rem_df.select(*add_df.columns)
        inserts = add_df.exceptAll(rem_df).withColumn(
            "_change_type", F.lit("insert")
        )
        deletes = rem_df.exceptAll(add_df).withColumn(
            "_change_type", F.lit("delete")
        )
        feed = inserts.unionByName(deletes)
    body["cdf"] = _stage_cdf_files(feed, table)
    _rewrite_commit_body(table, version, body)


def _referenced_cdf(table: str) -> set[str]:
    out: set[str] = set()
    for v in _versions(table):
        try:
            body = commit_body(table, v)
        except (OSError, json.JSONDecodeError):
            continue
        for c in body.get("cdf") or []:
            out.add(c["path"])
    return out


def vacuum(
    table: str,
    keep_versions: int = 1,
    spark: SparkSession | None = None,
) -> list[str]:
    """Delete data files unreferenced by every RETAINED version (the
    newest ``keep_versions``), plus orphans from crashed writers.
    Returns the deleted relative paths. Time travel within the
    retained horizon keeps working; older versions' SNAPSHOTS become
    unreadable (their exclusive files are gone) — the standard
    retention trade.

    When ``spark`` is given, the CHANGE FEED survives the horizon:
    any logged commit that lacks persisted change files and is about
    to lose a data file it would need gets its delta materialized
    into ``_changes/`` first (retention-aware CDF — Delta persists
    change files at write time; this back-fills commits written
    before that or with ``write_cdf=False``). Without ``spark``, the
    legacy contract holds: reading a vacuumed range raises."""
    vs = _versions(table)
    if not vs:
        return []
    retained = vs[-keep_versions:] if keep_versions > 0 else vs[-1:]
    referenced: set[str] = set()
    for v in retained:
        referenced.update(live_files(table, v))
    doomed: set[str] = set()
    for n in sorted(os.listdir(table)):
        full = os.path.join(table, n)
        if not os.path.isfile(full) or not n.endswith(".parquet"):
            continue
        if n not in referenced:
            doomed.add(n)
    if spark is not None and doomed:
        for v in vs:
            try:
                body = commit_body(table, v)
            except (OSError, json.JSONDecodeError):
                continue  # corrupted pre-checkpoint entry: skip
            if body.get("dataChange", True) is False:
                continue  # optimize: never fed, nothing to persist
            if body.get("cdf") is not None:
                continue  # already persisted at write time
            needed = [a["add"]["path"] for a in body["actions"] if "add" in a]
            needed += [
                a["remove"]["path"]
                for a in body["actions"]
                if "remove" in a
            ]
            if needed and any(p in doomed for p in needed):
                _materialize_cdf(spark, table, v, body)
    deleted = []
    for n in sorted(doomed):
        os.unlink(os.path.join(table, n))
        deleted.append(n)
    # crashed writers leave .staging-* dirs — orphan cleanup
    for n in os.listdir(table):
        if n.startswith(".staging-"):
            shutil.rmtree(os.path.join(table, n), ignore_errors=True)
    # change files staged by conflicted/crashed writers that no
    # commit references are orphans too
    cdf_dir = os.path.join(table, CDF_DIR)
    if os.path.isdir(cdf_dir):
        keep = _referenced_cdf(table)
        for n in sorted(os.listdir(cdf_dir)):
            rel = os.path.join(CDF_DIR, n)
            if n.endswith(".parquet") and rel not in keep:
                os.unlink(os.path.join(cdf_dir, n))
                deleted.append(rel)
    return deleted


def expire_log(table: str, keep_versions: int = 10) -> list[str]:
    """Bound the LOG directory (Delta log-retention analog): fold the
    expiry boundary into a checkpoint, then delete the commit JSONs
    (and superseded checkpoints) strictly BELOW it. Returns the
    deleted log file names.

    The boundary is ``head - keep_versions + 1`` — the newest
    ``keep_versions`` commits stay fully readable (time travel,
    ``read_changes``, ``table_history``); asking for an expired
    version raises the usual "does not exist". Without expiry a
    CDC-fed table's log (and the O(versions) scans in vacuum's
    back-fill pass and orphan accounting) grows forever; checkpoints
    bound READ replay but not the directory itself. Run AFTER
    ``vacuum`` with a horizon at least as deep — expiring a commit
    whose delta was never persisted forfeits its change feed, exactly
    like Delta's log retention.

    Scale shape: one checkpoint write + O(expired) unlinks of small
    JSON files; no data file is touched."""
    vs = _versions(table)
    if not vs or keep_versions < 1:
        return []
    boundary = vs[-1] - keep_versions + 1
    expired = [v for v in vs if v < boundary]
    if not expired:
        return []
    # the boundary must be a real version the checkpoint can anchor on
    anchor = min(v for v in vs if v >= boundary)
    log = _log_path(table)
    cp = os.path.join(log, f"{anchor:08d}.checkpoint.json")
    if not os.path.isfile(cp):
        _write_checkpoint(table, anchor)
    deleted = []
    for v in expired:
        n = f"{v:08d}.json"
        os.unlink(os.path.join(log, n))
        deleted.append(n)
    for c in _checkpoints(table):
        if c < anchor:
            n = f"{c:08d}.checkpoint.json"
            os.unlink(os.path.join(log, n))
            deleted.append(n)
    return deleted


def commit_merge_quarantine(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key_cols: list[str],
    quarantine: str,
    delete_when: str | None = None,
    insert_new: bool = True,
) -> tuple[int, int]:
    """The streaming-ingest form of :func:`commit_merge`: rows that
    would violate a table constraint are routed to the ``quarantine``
    versioned table (with a ``_violated`` column naming the failed
    constraint) instead of failing the whole batch — the dead-letter
    pattern (c30) applied to lake ingest, so one poison record cannot
    wedge a production CDC-apply stream. Delete-marked rows are never
    quarantined (they write nothing). Returns
    ``(merge version, quarantined row count)``; the merge commits
    even when everything was quarantined (an empty merge is a real
    version — consumers see consistent progress).

    Scale shape: one extra combined filter over the batch (the same
    predicate enforcement evaluates anyway) and one append of the
    violator slice; the happy path costs nothing extra."""
    base = latest_version(table)
    snap = _fold_log(table, base if base >= 0 else None)
    quarantined = 0
    clean = df
    if snap.constraints:
        # a replace-merge source carries every target column (the
        # commit_merge contract), so constraint expressions resolve
        # directly against the source frame
        viol = None
        cases = []
        for name, expr in snap.constraints.items():
            v = F.expr(f"NOT coalesce(({expr}), true)")
            viol = v if viol is None else (viol | v)
            cases.append(F.when(v, F.lit(name)))
        if delete_when:
            # delete-marked rows write nothing: never quarantine them
            viol = viol & F.expr(f"NOT coalesce(({delete_when}), false)")
        tagged = df.withColumn(
            "_violated", F.coalesce(*cases) if len(cases) > 1 else cases[0]
        ).withColumn("_viol", viol)
        # evaluate constraints over the ALIGNED row but keep the raw
        # source columns for the quarantine record
        bad = tagged.filter("_viol").drop("_viol")
        good = tagged.filter(F.expr("NOT _viol")).drop("_viol", "_violated")
        n_bad = bad.count()
        if n_bad:
            commit_append(spark, bad, quarantine)
            quarantined = n_bad
            clean = good
    version = commit_merge(
        spark, clean, table, key_cols,
        delete_when=delete_when, insert_new=insert_new,
    )
    return version, quarantined
