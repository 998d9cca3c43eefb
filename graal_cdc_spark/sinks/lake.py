"""Partitioned parquet lake sink.

The reference's only sink is Elasticsearch upserts
(``ElasticsearchUtils.java:131-177``); a Spark-native deployment lands
curated output as partitioned parquet (the lake/warehouse shape every
downstream training-data job reads). Two 100 TB concerns live here:

1. **Dynamic partition overwrite** — re-running a day's pipeline must
   replace only the partitions it produced, never truncate the whole
   table (static overwrite mode deletes everything first). Spark's
   ``partitionOverwriteMode=dynamic`` does exactly this; the writer
   scopes the conf to the write instead of mutating the session.

2. **Small-file compaction** — streaming/incremental writers emit one
   file per task per trigger; a month of 5-minute triggers is ~10⁴
   files per partition, and file listing starts to dominate scans.
   ``compact_partitions`` rewrites each partition to
   ``ceil(bytes / target)`` files with a per-partition repartition,
   touching only partitions over the file-count threshold.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dynamic_overwrite: bool = True,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``.

    With ``dynamic_overwrite`` (default), only partitions present in
    ``df`` are replaced — the idempotent-rerun contract. The session
    conf is restored afterwards, so concurrent writers keep their own
    semantics.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    try:
        spark.conf.set(key, "dynamic" if dynamic_overwrite else "static")
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, prev)


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
    rewritten (read → repartition(ceil(bytes/target)) → dynamic
    overwrite of just that partition). Returns
    ``{partition_dir: (files_before, files_after)}`` for the rewritten
    partitions.

    At cluster scale each partition rewrite is one small independent
    job over that partition's bytes only — safe to run rolling,
    concurrently with readers (parquet overwrite is
    directory-atomic per partition via the output committer).
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
        part = spark.read.parquet(part_dir)
        part.repartition(n_out).write.mode("overwrite").parquet(part_dir)
        after = [
            f
            for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        results[part_dir] = (len(files), len(after))
    return results
