"""Source-format breadth: the engine's queries are format-agnostic —
the same frame contract (SURVEY.md §2.2 "add file scans") must hold
whether the rows arrive as Parquet, JSON-lines, or CSV.

The CDC streaming path already proves JSON-lines via the file-replay
source; these tests prove the BATCH read path round-trips events
through each format with schema fidelity (timestamps, doubles, nested
JSON strings) and that a registered query computes identically over a
non-parquet source.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graal_cdc_spark.sources.tables import events_schema, load_table

EVENTS_SCHEMA = events_schema()

SF = "/root/testdata/sf0.001"


def _canon(df):
    # ts to epoch micros so string-serialized formats compare exactly
    return sorted(
        tuple(r)
        for r in df.select(
            "event_id", F.unix_micros("ts").alias("us"), "user_id",
            "event_type", "value", "props",
        ).collect()
    )


# default JSON/CSV timestamp serialization is millisecond-precision;
# the events fixture carries microseconds — pin the format explicitly
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def test_events_round_trip_json_lines(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "ev_json")
    ev.write.mode("overwrite").option("timestampFormat", TS_FMT).json(path)
    back = (
        spark.read.schema(EVENTS_SCHEMA)
        .option("timestampFormat", TS_FMT)
        .json(path)
    )
    assert _canon(back) == _canon(ev)


def test_events_round_trip_csv(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "ev_csv")
    # props contains JSON with commas/quotes — exercises quoting
    ev.write.mode("overwrite").option("header", True).option(
        "timestampFormat", TS_FMT
    ).csv(path)
    back = (
        spark.read.schema(EVENTS_SCHEMA)
        .option("header", True)
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )
    assert _canon(back) == _canon(ev)


def test_query_identical_over_json_source(spark, tmp_path):
    """A registered transform is source-agnostic: tumbling counts over
    a JSON copy equal the parquet answer."""
    from graal_cdc_spark.streaming.windows import tumbling_counts

    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "ev_json2")
    ev.write.mode("overwrite").json(path)
    back = spark.read.schema(EVENTS_SCHEMA).json(path)
    want = sorted(tuple(r) for r in tumbling_counts(ev).collect())
    got = sorted(tuple(r) for r in tumbling_counts(back).collect())
    assert got == want


def test_events_round_trip_orc(spark, tmp_path):
    """ORC: the other columnar lake format Spark ships natively —
    typed round-trip (timestamps survive as timestamps, no string
    re-parse needed)."""
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "ev_orc")
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == ev.schema
    assert _canon(back) == _canon(ev)


def test_orc_predicate_pushdown(spark, tmp_path):
    """Format breadth must not cost plan quality: a filtered ORC scan
    pushes the predicate into the reader like the parquet path does."""
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "ev_orc2")
    ev.write.mode("overwrite").orc(path)
    plan = (
        spark.read.orc(path)
        .filter(F.col("event_type") == "purchase")
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "event_type" in plan, plan


def test_events_round_trip_avro_if_available(spark, tmp_path):
    """Avro (row-oriented interchange): exercised only if the
    spark-avro datasource module is on the classpath — the core avro
    jars ship with Spark but the DataSource may not."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import AnalysisException

    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "ev_avro")
    try:
        ev.write.mode("overwrite").format("avro").save(path)
    except (AnalysisException, Py4JJavaError) as ex:
        _pytest.skip(f"spark-avro datasource not on classpath: {ex}")
    back = spark.read.format("avro").load(path)
    assert _canon(back) == _canon(ev)


def test_reblock_sf_dir_same_rows_more_partitions(spark, tmp_path):
    """reblock_sf_dir (the bench's scan-layout priming): the copy
    holds EXACTLY the original rows for every table, big tables gain
    scan partitions, tiny dimension tables stay single-partition, and
    a second call is an idempotent cache hit (marker file)."""
    import os
    import time

    from graal_cdc_spark.sources.tables import TABLES, reblock_sf_dir

    src = "/root/testdata/sf0.001"
    dest = reblock_sf_dir(spark, src, dest_root=str(tmp_path))
    assert os.path.exists(os.path.join(dest, "_REBLOCKED_OK"))
    for name in TABLES:
        a = spark.read.parquet(f"{src}/{name}.parquet")
        b = spark.read.parquet(f"{dest}/{name}.parquet")
        assert a.schema == b.schema, name
        assert a.count() == b.count(), name
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), name
    # region is a handful of rows — re-blocking must not shred it
    region = spark.read.parquet(f"{dest}/region.parquet")
    assert region.rdd.getNumPartitions() == 1
    # idempotence: second call returns instantly via the marker
    t0 = time.time()
    assert reblock_sf_dir(spark, src, dest_root=str(tmp_path)) == dest
    assert time.time() - t0 < 1.0
    # the DuckDB comparator must read the directory-shaped copy (both
    # engines scan identical files — VERDICT r10 #1): same row counts
    # through the glob views as through the original single files
    from graal_cdc_spark.testing import duckdb_connect

    co, cr = duckdb_connect(src), duckdb_connect(dest)
    try:
        for name in TABLES:
            a = co.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
            b = cr.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
            assert a == b, name
    finally:
        co.close()
        cr.close()
    # no partial-build exposure: a *.tmp-<pid> build dir never
    # survives a successful call
    leftovers = [
        d for d in os.listdir(tmp_path) if ".tmp-" in d
    ]
    assert leftovers == []


def test_reblock_fingerprint_invalidates_on_source_change(spark, tmp_path):
    """Regenerated testdata (same path, new bytes/mtime) must land in
    a DIFFERENT cache dir — the stale-copy hazard of basename-only
    keying (ADVICE r10 #2)."""
    import os
    import shutil

    from graal_cdc_spark.sources.tables import TABLES, reblock_sf_dir

    src = tmp_path / "sfX"
    src.mkdir()
    for name in TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{name}.parquet",
            src / f"{name}.parquet",
        )
    dest_root = tmp_path / "cache"
    dest_root.mkdir()
    d1 = reblock_sf_dir(spark, str(src), dest_root=str(dest_root))
    # "regenerate" one table: same name, different mtime
    os.utime(src / "region.parquet")
    d2 = reblock_sf_dir(spark, str(src), dest_root=str(dest_root))
    assert d1 != d2
    assert os.path.exists(os.path.join(d2, "_REBLOCKED_OK"))
