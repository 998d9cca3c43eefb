"""Partitioned parquet lake sink.

The reference's only sink is Elasticsearch upserts
(``ElasticsearchUtils.java:131-177``); a Spark-native deployment lands
curated output as partitioned parquet (the lake/warehouse shape every
downstream training-data job reads). Two 100 TB concerns live here:

1. **Dynamic partition overwrite** — re-running a day's pipeline must
   replace only the partitions it produced, never truncate the whole
   table (static overwrite mode deletes everything first). The writer
   passes ``partitionOverwriteMode`` as a PER-WRITE DataFrameWriter
   option (takes precedence over the session conf, SPARK-25828), so
   two threads writing through one SparkSession can never race each
   other onto the wrong overwrite mode.

2. **Small-file compaction** — streaming/incremental writers emit one
   file per task per trigger; a month of 5-minute triggers is ~10⁴
   files per partition, and file listing starts to dominate scans.
   ``compact_partitions`` rewrites each partition to
   ``ceil(bytes / target)`` files via a staged write + directory
   rename swap, touching only partitions over the file-count
   threshold.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dynamic_overwrite: bool = True,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``.

    With ``dynamic_overwrite`` (default), only partitions present in
    ``df`` are replaced — the idempotent-rerun contract. The mode is a
    per-write option, never a session-conf mutation, so concurrent
    writers on the same session keep their own semantics.
    """
    (
        df.write.mode("overwrite")
        .option(
            "partitionOverwriteMode",
            "dynamic" if dynamic_overwrite else "static",
        )
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def _partition_dirs(path: str) -> list[str]:
    """Leaf partition directories (one level, hive-style ``k=v``)."""
    out = []
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if os.path.isdir(full) and "=" in entry:
            out.append(full)
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict[str, tuple[int, int]]:
    """Rewrite fragmented partitions to ~``target_file_bytes`` files.

    Only partitions with more than ``min_files`` data files are
    rewritten: read → repartition(ceil(bytes/target)) → write to a
    sibling ``.compact-tmp`` staging directory → rename-swap into
    place. Returns ``{partition_dir: (files_before, files_after)}``
    for the rewritten partitions.

    Crash safety: the original partition is never deleted until the
    staged rewrite is fully written; a crash before the swap leaves
    the partition untouched (plus a stale ``.compact-tmp`` that the
    next run clears), and a crash between the two renames leaves the
    complete original under ``.compact-old`` for recovery — data is
    never lost, though readers can see the partition briefly missing
    during the swap window. On a real cluster, route this through a
    table format with atomic commits (Delta/Iceberg ``OPTIMIZE``)
    instead of raw directories.
    """
    results: dict[str, tuple[int, int]] = {}
    for part_dir in _partition_dirs(path):
        files = [
            f
            for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        if len(files) <= min_files:
            continue
        total = sum(os.path.getsize(os.path.join(part_dir, f)) for f in files)
        n_out = max(1, math.ceil(total / target_file_bytes))
        if n_out >= len(files):
            continue
        tmp_dir = part_dir + ".compact-tmp"
        old_dir = part_dir + ".compact-old"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(old_dir, ignore_errors=True)
        part = spark.read.parquet(part_dir)
        part.repartition(n_out).write.mode("overwrite").parquet(tmp_dir)
        os.rename(part_dir, old_dir)
        os.rename(tmp_dir, part_dir)
        shutil.rmtree(old_dir)
        after = [
            f
            for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        results[part_dir] = (len(files), len(after))
    return results


def _purge_marker(path: str) -> str:
    return os.path.join(path, ".purge-intent.json")


def _apply_purge_manifest(path: str) -> None:
    """Idempotently complete a recorded purge plan: move staged files
    that have not landed, delete originals that still exist, then
    clear the marker. Safe to call at any crash point — once the
    marker exists, the plan's target names are fixed."""
    import json

    marker = _purge_marker(path)
    if not os.path.exists(marker):
        # no plan recorded: any .purge-staging-* tree is an orphan
        # from a crash BEFORE the marker was written — nothing from it
        # was ever applied, so sweep it (otherwise repeated crashed
        # purges accumulate full survivor copies on disk)
        for entry in os.listdir(path) if os.path.isdir(path) else []:
            if entry.startswith(".purge-staging-"):
                shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
        return
    with open(marker, encoding="utf-8") as f:
        plan = json.load(f)
    for staged, final in plan["add"]:
        if not os.path.exists(final) and os.path.exists(staged):
            os.rename(staged, final)
    for old in plan["delete"]:
        if os.path.exists(old):
            os.remove(old)
    staging = plan.get("staging")
    if staging and os.path.isdir(staging):
        shutil.rmtree(staging, ignore_errors=True)
    os.remove(marker)


def purge_keys(
    spark: SparkSession, path: str, key_col: str, keys
) -> dict[str, int]:
    """GDPR erasure (right-to-be-forgotten): delete every row whose
    ``key_col`` is in ``keys`` by rewriting ONLY the parquet files
    that contain at least one such row — at 100 TB an erasure request
    touches a handful of files, and rewriting whole partitions (let
    alone the table) for each request is the difference between a
    minutes-long job and an outage.

    Protocol (two-phase, crash-repairable — the file-lake analog of
    the stream writer's intent marker):

    1. LOCATE: one scan finds affected files via ``input_file_name``
       + the key predicate (parquet row-group stats prune most files
       before they are read);
    2. REWRITE: each affected file's survivors are staged as a new
       uniquely-named file in the same partition directory's staging
       area (originals untouched);
    3. COMMIT: an fsync'd-rename intent marker records the full
       (staged → final, delete-original) plan, then the plan executes
       — move staged files in, delete originals. A crash anywhere
       re-runs to completion from the marker on the next call
       (``_apply_purge_manifest``); before the marker exists nothing
       has been deleted.

    Returns ``{"files_rewritten", "rows_purged", "partitions"}``.
    Keys are an erasure REQUEST list — driver-side by nature, bounded.

    The rewrite is ONE Spark job regardless of how many files a hot
    key touches: all affected files are read together, each row is
    tagged with its source file id (``input_file_name`` looked up in
    a literal map of the URIs the locate scan itself emitted — same
    function, same encoding, so no round-trip through decoded paths),
    and survivors are written ``partitionBy`` that id into the
    staging area. A key present in thousands of files costs one
    scan + one write, not thousands of sequential job submissions.
    Affected files are read by explicit leaf path, so their physical
    schemas must be union-compatible (the normal lake layout —
    partition values live in directory names, not file schemas).
    """
    import json
    import uuid
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    def _local_path(uri: str) -> str:
        """file-URI (as emitted by ``input_file_name``) -> local
        filesystem path. Percent-decodes (space, '%', non-ASCII in
        partition values arrive URI-escaped) and rejects non-local
        schemes rather than mangling them into bogus paths."""
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            raise ValueError(
                f"purge_keys: unsupported filesystem scheme "
                f"{parsed.scheme!r} in {uri!r} (local lake paths only)"
            )
        return unquote(parsed.path) if parsed.scheme else unquote(uri)

    _apply_purge_manifest(path)  # finish any crashed predecessor
    keys = list(keys)
    if not keys:
        return {"files_rewritten": 0, "rows_purged": 0, "partitions": 0}

    df = spark.read.parquet(path)
    hits = (
        df.filter(F.col(key_col).isin(keys))
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not hits:
        return {"files_rewritten": 0, "rows_purged": 0, "partitions": 0}
    # uri (exactly as input_file_name spells it) -> decoded local path
    uris = sorted(r.f for r in hits)
    affected = {u: _local_path(u) for u in uris}
    rows_purged = sum(int(r.n) for r in hits)

    staging = os.path.join(path, f".purge-staging-{uuid.uuid4().hex}")
    os.makedirs(staging)
    plan = {"staging": staging, "add": [], "delete": []}
    dirs = set()

    # ONE job: read every affected file, tag rows with the source
    # file id, write survivors partitioned by that id
    fid_of_uri = {u: i for i, u in enumerate(uris)}
    fid_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for u in uris for x in (u, fid_of_uri[u])]
        ),
        F.input_file_name(),
    )
    (
        spark.read.parquet(*[affected[u] for u in uris])
        # NULL-safe survivor predicate: `~isin` alone evaluates to
        # NULL (filtered out!) for NULL keys — erasure must never
        # silently drop rows it was not asked to erase
        .filter(~F.col(key_col).isin(keys) | F.col(key_col).isNull())
        .withColumn("__purge_fid", fid_expr)
        .write.mode("overwrite")
        .partitionBy("__purge_fid")
        .parquet(staging)
    )

    # Invariant check BEFORE any delete is planned: every survivor row
    # must have mapped to a located file. If input_file_name() in the
    # rewrite scan ever spells a URI differently from the locate scan,
    # element_at returns NULL and those rows land in the Hive default
    # partition — which the restage loop below would silently skip
    # while the plan still deletes the original file (survivor-row
    # loss). Fail fast instead; originals are untouched at this point.
    null_fid_dir = os.path.join(
        staging, "__purge_fid=__HIVE_DEFAULT_PARTITION__"
    )
    if os.path.isdir(null_fid_dir):
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            "purge_keys: rewrite scan produced rows with no source-file "
            "mapping (input_file_name URI mismatch between locate and "
            "rewrite scans) — aborting before any delete; originals are "
            "intact"
        )

    for u in uris:
        old = affected[u]
        part_dir = os.path.dirname(old)
        dirs.add(part_dir)
        out_dir = os.path.join(staging, f"__purge_fid={fid_of_uri[u]}")
        parts = sorted(
            f for f in (
                os.listdir(out_dir) if os.path.isdir(out_dir) else []
            )
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        # an all-purged file stages nothing: the plan just deletes it
        for staged_name in parts:
            staged = os.path.join(out_dir, staged_name)
            final = os.path.join(
                part_dir, f"part-purged-{uuid.uuid4().hex}.parquet"
            )
            plan["add"].append((staged, final))
        plan["delete"].append(old)

    marker = _purge_marker(path)
    tmp = marker + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(plan, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, marker)
    _apply_purge_manifest(path)
    return {
        "files_rewritten": len(affected),
        "rows_purged": rows_purged,
        "partitions": len(dirs),
    }
