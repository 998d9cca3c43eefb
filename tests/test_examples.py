"""The committed examples/ stay runnable — they are the migration
recipes a reference user follows, so they rot only if CI runs them."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

REPO = Path(__file__).parents[1]
sys.path.insert(0, str(REPO / "examples"))

from graal_cdc_spark.sources.tables import load_table  # noqa: E402


def test_corpus_curation_pipeline(spark, sf_dir, tmp_path):
    """The end-to-end curation example: every stage only removes
    documents (monotone funnel), the lake table is partitioned by
    split, and a rerun is idempotent (dynamic-partition overwrite)."""
    from corpus_curation import curate

    out = str(tmp_path / "lake")
    stats = curate(spark, sf_dir, out)

    assert (
        stats["input"]
        >= stats["after_exact"]
        >= stats["after_neardup"]
        >= stats["after_quality"]
        >= stats["after_decontam"]
        > 0
    )
    split_total = sum(n for n, _ in stats["splits"].values())
    assert split_total == stats["after_decontam"]
    assert {p.name for p in Path(out).iterdir() if p.is_dir()} <= {
        "split=train", "split=val", "split=test"
    }

    rerun = curate(spark, sf_dir, out)
    assert rerun == stats


def test_streaming_slo_pipeline(spark, sf_dir, tmp_path):
    """The streaming-percentile split example: the bin-resolution
    percentiles located over the STREAMED histogram must bracket the
    exact batch percentiles computed from raw values (error bound =
    one bin width), for every (window, type) cell."""
    from pyspark.sql import Window

    from streaming_slo import BIN_CENTS, run

    out = run(spark, sf_dir, str(tmp_path / "slo"))
    rows = {
        (r["window_start"], r["event_type"]): (
            r["p50_bin"], r["p95_bin"], r["n"]
        )
        for r in out.collect()
    }
    assert rows

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("window_start", "event_type").orderBy("cents")
    exact = (
        events.select(
            F.date_format(
                F.window("ts", "10 minutes").getField("start"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_start"),
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("c", F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("t", F.count(F.lit(1)).over(
            Window.partitionBy("window_start", "event_type")))
    )
    p50 = (
        exact.filter(F.col("c") >= F.ceil(0.5 * F.col("t")))
        .groupBy("window_start", "event_type")
        .agg(F.min("cents").alias("v"))
        .collect()
    )
    for r in p50:
        key = (r["window_start"], r["event_type"])
        p50_bin = rows[key][0]
        assert p50_bin * BIN_CENTS <= r["v"] < (p50_bin + 1) * BIN_CENTS, (
            key, r["v"], p50_bin,
        )


def test_silver_evolution_example(spark, tmp_path):
    """The silver-evolution example: registry shows the two versions
    in first-appearance order, the evolved read serves the union
    schema with NULL email for pre-evolution rows."""
    from silver_evolution import run

    lake = run(spark, str(tmp_path))
    reg = {
        (r["tbl"], r["version"]): r["fields"]
        for r in lake.registry().collect()
    }
    assert reg == {
        ("users", 1): "id,name",
        ("users", 2): "email,id,name",
    }
    rows = {r["seq"]: r for r in lake.read_silver("appdb", "users").collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["email"] is None and rows[1]["version"] == 1
    assert rows[3]["email"] == "ada@example.com" and rows[3]["version"] == 2
    assert rows[4]["email"] is None and rows[4]["version"] == 1


def test_cdc_end_to_end_example(spark, tmp_path):
    """The composed CDC pipeline (log → parse → silver evolution → ES
    sink): the wire-level census converges to the log's final op per
    key, each batch sends exactly one action per live key, and the
    silver registry carries both schema versions."""
    from cdc_end_to_end import final_wire_state, run

    lake, wire = run(spark, str(tmp_path))

    assert final_wire_state(wire) == {
        "u1": "index", "u2": "delete", "u3": "index",
    }
    per_batch = {(b, k): a for b, k, a in wire}
    assert len(wire) == len(per_batch) == 5  # no duplicate (batch, key)
    assert {
        (r["tbl"], r["version"]): r["fields"]
        for r in lake.registry().collect()
    } == {("users", 1): "id,name", ("users", 2): "email,id,name"}
    rows = {r["seq"]: r for r in lake.read_silver("appdb", "users").collect()}
    assert rows[10]["email"] is None and rows[10]["version"] == 1
    assert rows[40]["email"] == "ada@example.com" and rows[40]["version"] == 2


def test_lake_operations_example(spark, tmp_path):
    """The lake-ops runbook: retention collapses the log head, erasure
    removes exactly the requested subjects, small-file compaction
    reduces file count without changing content."""
    from lake_operations import run

    out = run(spark, str(tmp_path))
    before, after = out["log_rows"]
    assert after < before
    assert out["purge"]["rows_purged"] == 2
    assert out["compaction"]
