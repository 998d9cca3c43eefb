"""Tests for the scalar-function surface and the pipeline runner."""

from __future__ import annotations

import json
import os
import textwrap

from pyspark.sql import functions as F

from graal_cdc_spark.cdc.envelope import build_cdc_events, parse_envelope
from graal_cdc_spark.functions import register_sql_functions
from graal_cdc_spark.pipelines import PipelineRegistry
from graal_cdc_spark.pipelines.runner import PipelineRunner, es_batch_sink
from graal_cdc_spark.sinks import EsSinkConfig
from graal_cdc_spark.sinks.elasticsearch import FileRecordingTransport
from graal_cdc_spark.sources.tables import load_table
from graal_cdc_spark.streaming import append_chunk


# ---------------------------------------------------------------------------
# functions: SQL scalar UDFs match the DataFrame expressions, JVM-side
# ---------------------------------------------------------------------------


def test_sql_functions_match_dataframe_expressions(spark, sf_dir):
    names = register_sql_functions(spark)
    assert "gc_cosine" in names and "gc_fingerprint" in names

    docs = load_table(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("fdocs")
    got = spark.sql(
        """SELECT doc_id, gc_fingerprint(text) AS fp,
                  gc_token_count(text) AS n,
                  gc_langid(text) AS lang,
                  gc_json_get('{"k": 7}', 'k') AS j
           FROM fdocs ORDER BY doc_id"""
    ).collect()
    from graal_cdc_spark.operators import text as TX

    want = (
        docs.select(
            "doc_id",
            TX.fingerprint(F.col("text")).alias("fp"),
            TX.token_count(F.col("text")).alias("n"),
            TX.langid_heuristic(F.col("text")).alias("lang"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.fp, r.n, r.lang) for r in got] == [(r.fp, r.n, r.lang) for r in want]
    assert all(r.j == "7" for r in got)


def test_sql_cosine_stays_jvm_side(spark):
    register_sql_functions(spark)
    df = spark.sql(
        "SELECT gc_cosine(array(1D,2D,3D), array(1D,2D,3D)) AS c, "
        "gc_dot(array(1D,2D), array(3D,4D)) AS d, "
        "gc_l2_norm(array(3D,4D)) AS n"
    )
    [row] = df.collect()
    assert abs(row.c - 1.0) < 1e-12 and row.d == 11.0 and row.n == 5.0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# runner: registry pipeline → stream → ES sink, end to end
# ---------------------------------------------------------------------------

RUNNER_PIPE = textwrap.dedent(
    """
    def config():
        return {"name": "users_latest", "db": "appdb", "tables": ("users",)}

    def transform(df):
        # latest event per key among routed rows (the CDC upsert feed)
        from graal_cdc_spark.cdc.compaction import latest_by_key
        return latest_by_key(df, ["key"], "seq").select("key", "op", "seq")
    """
)


def test_runner_end_to_end(spark, sf_dir, tmp_path):
    # pipeline from disk
    pipe_file = tmp_path / "users_latest.py"
    pipe_file.write_text(RUNNER_PIPE)
    reg = PipelineRegistry()
    pipe = reg.register(pipe_file)

    # replay source: the synthetic envelope log
    replay = str(tmp_path / "replay")
    append_chunk(build_cdc_events(spark, sf_dir).coalesce(2), replay)

    outdir = str(tmp_path / "reqs")
    os.makedirs(outdir)
    cfg = EsSinkConfig(url="http://es:9200/u", username="u", password="p", id_key="key")
    runner = PipelineRunner(spark, replay, str(tmp_path / "ckpt"))
    run = runner.start(
        pipe,
        es_batch_sink(cfg, transport_factory=lambda: FileRecordingTransport(outdir)),
    )
    # C1 identity dedup: second start while active returns the same run
    assert runner.start(pipe, es_batch_sink(cfg)) is run
    runner.await_all()

    upserted, deleted = set(), set()
    for name in os.listdir(outdir):
        req = json.load(open(os.path.join(outdir, name)))
        body, method = req["body"], req["method"]
        if method == "PUT":
            upserted.add(json.loads(body)["key"])
        elif method == "DELETE":
            deleted.add(req["url"].rsplit("/", 1)[1])
        else:
            for line in body.splitlines():
                obj = json.loads(line)
                if "index" in obj:
                    upserted.add(obj["index"]["_id"])
                elif "delete" in obj:
                    deleted.add(obj["delete"]["_id"])

    want = {
        (r["key"], r["op"])
        for r in pipe.apply(parse_envelope(build_cdc_events(spark, sf_dir))).collect()
    }
    assert upserted == {k for k, op in want if op != "d"}
    assert deleted == {k for k, op in want if op == "d"}

    runner.stop_all()
    assert runner._running == {}


def test_runner_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Tailer-cursor semantics: a restarted pipeline processes only
    data that arrived after its last completed run."""
    from pyspark.sql import functions as F

    pipe_file = tmp_path / "users_latest.py"
    pipe_file.write_text(RUNNER_PIPE)
    pipe = PipelineRegistry().register(pipe_file)

    cdc = build_cdc_events(spark, sf_dir)
    mid = cdc.approxQuantile("seq", [0.5], 0.0)[0]
    replay = str(tmp_path / "replay")
    append_chunk(cdc.filter(F.col("seq") <= mid).coalesce(1), replay)

    seen_batches: list[int] = []
    rows_per_run: list[int] = []

    class CountingSink:
        def __call__(self, batch_df, batch_id):
            seen_batches.append(batch_id)
            rows_per_run.append(batch_df.count())

    runner = PipelineRunner(spark, replay, str(tmp_path / "ckpt"))
    runner.start(pipe, CountingSink())
    runner.await_all()
    first_batches = list(seen_batches)
    assert rows_per_run and sum(rows_per_run) > 0

    # nothing new → restart runs no data batches with new rows
    runner2 = PipelineRunner(spark, replay, str(tmp_path / "ckpt"))
    runner2.start(pipe, CountingSink())
    runner2.await_all()
    assert sum(rows_per_run[len(first_batches):]) == 0

    # new chunk → only its rows are processed on the next start
    before = sum(rows_per_run)
    append_chunk(cdc.filter(F.col("seq") > mid).coalesce(1), replay)
    runner3 = PipelineRunner(spark, replay, str(tmp_path / "ckpt"))
    runner3.start(pipe, CountingSink())
    runner3.await_all()
    new_rows = sum(rows_per_run) - before
    routed_total = pipe.route(
        parse_envelope(build_cdc_events(spark, sf_dir))
    ).count()
    routed_first = pipe.route(
        parse_envelope(cdc.filter(F.col("seq") <= mid))
    ).count()
    # transform output is latest-per-key of the routed NEW batch only
    assert 0 < new_rows <= routed_total - routed_first
