"""Silver layer with streaming schema evolution — the registry wired
into the runner's foreachBatch path (VERDICT r6 #6).

The batch-side pieces exist separately: ``cdc/schema_registry.py``
builds/merges the schema-version control table, and the silver
mergeSchema evolution is proven in ``tests/test_schema_registry.py``.
This module is the PRODUCTION composition a CDC pipeline actually
runs: one ``foreachBatch`` consumer that, per micro-batch,

1. folds the batch's schema evidence into a PERSISTED registry
   (``merge_registry`` against the last published generation — known
   shapes keep their version numbers, new field-sets get the next
   version);
2. tags the batch's row images with their schema version (one
   broadcast join against the tiny registry);
3. writes each (db, tbl, version) slice to the silver area with that
   VERSION'S columns — so a new field arriving mid-stream starts a
   new version directory, and a mergeSchema read serves the union
   with NULLs for pre-evolution rows;
4. atomically publishes the new registry generation as the batch's
   commit marker.

Crash/replay contract (the runner replays a batch whose epoch didn't
commit): silver slices are written to per-(batch, version) directories
in overwrite mode — a replay overwrites byte-identically — and the
registry generation is renamed into place LAST, so a batch is either
fully absent or fully applied; re-delivery of a committed batch is a
no-op (the generation directory is the marker). This mirrors the
per-epoch idempotence of ``sources/cdc_log_ds.py``'s staged-rename
writer.

Scale: the registry is bounded by the number of DISTINCT schemas ever
seen (tiny — the only thing collected); the per-batch driver loop is
over the versions PRESENT IN THE BATCH, not the log; row-image parsing
and silver writes are executor-parallel with no data-sized driver
state. Reference mapping: SURVEY.md §1.4 schema history — Debezium's
``schema.history.internal.*`` topic becomes this control table
(``DebeziumEngineManager.java:91-120`` wires the topic; the reference
otherwise runs schemaless so the row-image key-set is the only schema
signal in the data plane).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graal_cdc_spark.cdc.schema_registry import (
    _fields,
    merge_registry,
    schema_versions,
)

_REG_SCHEMA = (
    "db STRING, tbl STRING, version INT, fields STRING, "
    "first_seq BIGINT, n_events BIGINT"
)

# path-safe db/table names: no separators, no '..', no leading dot
_SAFE_NAME = re.compile(r"[A-Za-z0-9_-][A-Za-z0-9_.-]*")


class _Fs:
    """Hadoop-FileSystem wrapper (HDFS/S3A/local) — the atomic-rename
    publish pattern shared with ``streaming/dedup._StateDir`` and
    ``operators/ann_index._IndexFs``."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._root = self._Path(root)
        self._fs = self._root.getFileSystem(spark._jsc.hadoopConfiguration())
        self._fs.mkdirs(self._root)

    def exists(self, p: str) -> bool:
        return self._fs.exists(self._Path(p))

    def delete(self, p: str) -> None:
        self._fs.delete(self._Path(p), True)

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise OSError(f"silver publish rename failed: {src} -> {dst}")

    def list_names(self, p: str) -> list[str]:
        path = self._Path(p)
        if not self._fs.exists(path):
            return []
        return sorted(
            s.getPath().getName() for s in self._fs.listStatus(path)
        )


class SilverSchemaEvolution:
    """foreachBatch consumer: persisted schema registry + versioned
    silver writes under ``<root>/``:

        <root>/_registry/gen-<batch id>/   control-table generations
        <root>/silver/<db>/<tbl>/batch-<id>-v<version>/   row images

    Use ``sink()`` as the :class:`PipelineRunner` sink (the runner's
    checkpoint makes batch ids monotone across restarts, which the
    generation chain relies on), ``registry()`` / ``read_silver()``
    to consume.
    """

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self._fs = _Fs(spark, self.root)
        self._reg_dir = f"{self.root}/_registry"

    # -- registry state -------------------------------------------------

    def _gens(self) -> list[int]:
        return sorted(
            int(n.split("-", 1)[1])
            for n in self._fs.list_names(self._reg_dir)
            if n.startswith("gen-")
        )

    def _gen_path(self, gen: int) -> str:
        return f"{self._reg_dir}/gen-{gen:012d}"

    def registry(self) -> DataFrame:
        """The latest published control table (empty frame before the
        first batch commits)."""
        gens = self._gens()
        if not gens:
            return self.spark.createDataFrame([], _REG_SCHEMA)
        return self.spark.read.schema(_REG_SCHEMA).parquet(
            self._gen_path(gens[-1])
        )

    # -- per-batch work -------------------------------------------------

    def process_batch(self, parsed: DataFrame, batch_id: int) -> None:
        """Apply one micro-batch of the PARSED envelope frame
        (``parse_envelope`` output — what the runner's foreachBatch
        hands a sink)."""
        gen_dir = self._gen_path(batch_id)
        if self._fs.exists(gen_dir):
            return  # committed batch re-delivered: full no-op

        fresh = schema_versions(parsed)
        prior = [g for g in self._gens() if g < batch_id]
        if prior:
            existing = self.spark.read.schema(_REG_SCHEMA).parquet(
                self._gen_path(prior[-1])
            )
            merged = merge_registry(existing, fresh)
        else:
            merged = fresh
        # the registry is bounded by distinct-schema count — the one
        # permitted driver materialization (same class as centroids)
        reg_rows = [r.asDict() for r in merged.collect()]
        reg_df = self.spark.createDataFrame(reg_rows, _REG_SCHEMA) if (
            reg_rows
        ) else self.spark.createDataFrame([], _REG_SCHEMA)

        # tag the batch's row images with their schema version
        evid = (
            parsed.filter(
                (F.col("op") != "d")
                & F.col("after_json").isNotNull()
                & (F.col("after_json") != "null")
            )
            .withColumn("fields", _fields())
        )
        tagged = evid.join(
            F.broadcast(reg_df.select("db", "tbl", "fields", "version")),
            ["db", "tbl", "fields"],
        )
        # versions PRESENT in this batch (bounded by registry size)
        present = {
            (r["db"], r["tbl"], r["version"])
            for r in tagged.select("db", "tbl", "version")
            .distinct()
            .collect()
        }
        fields_of = {
            (d["db"], d["tbl"], d["version"]): d["fields"]
            for d in reg_rows
        }
        for db, tbl, version in sorted(present):
            # db/table names come from UNTRUSTED envelope payloads and
            # become path segments — refuse anything that could escape
            # the silver root rather than writing somewhere surprising
            for part in (db, tbl):
                if not _SAFE_NAME.fullmatch(part or ""):
                    raise ValueError(
                        f"silver: unsafe db/table name {part!r} "
                        "(allowed: letters, digits, _ . -; no path "
                        "separators, no leading dot)"
                    )
            fields = fields_of[(db, tbl, version)]
            slice_df = tagged.filter(
                (F.col("db") == db)
                & (F.col("tbl") == tbl)
                & (F.col("version") == version)
            )
            cols = [F.col("seq"), F.col("key"), F.col("op"),
                    F.col("version")]
            if fields:
                schema = ", ".join(
                    # row-image keys are arbitrary JSON strings; escape
                    # backticks so a hostile key can't break out of the
                    # quoted identifier
                    "`" + f.replace("`", "``") + "` STRING"
                    for f in fields.split(",")
                )
                cols.append(F.from_json("after_json", schema).alias("__r"))
                out = slice_df.select(*cols).select(
                    "seq", "key", "op", "version", "__r.*"
                )
            else:  # the {} shape: audit columns only
                out = slice_df.select(*cols)
            out.write.mode("overwrite").parquet(
                f"{self.root}/silver/{db}/{tbl}/"
                f"batch-{batch_id:012d}-v{version}"
            )

        # commit marker LAST: registry generation, atomic rename
        tmp = f"{self._reg_dir}/.tmp-{batch_id:012d}"
        if self._fs.exists(tmp):
            self._fs.delete(tmp)
        reg_df.coalesce(1).write.mode("overwrite").parquet(tmp)
        self._fs.rename(tmp, gen_dir)
        # retention: the chain only ever needs the latest generation
        # (plus the one being superseded during a replay window)
        for g in self._gens()[:-2]:
            self._fs.delete(self._gen_path(g))

    def sink(self):
        """foreachBatch adapter for :class:`PipelineRunner`."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)

        return _sink

    # -- reads ----------------------------------------------------------

    def read_silver(self, db: str, tbl: str) -> DataFrame:
        """The evolved table: union of every version's columns
        (mergeSchema), NULL where a row predates a column."""
        return (
            self.spark.read.option("mergeSchema", "true")
            .option("recursiveFileLookup", "true")
            .parquet(f"{self.root}/silver/{db}/{tbl}")
        )
