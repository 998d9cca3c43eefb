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
