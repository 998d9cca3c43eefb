"""Sink unit tests (SURVEY.md §5.2.3) — request construction mirrors
``ElasticsearchUtils.java:104-177``: single vs bulk dispatch, NDJSON
body bytes, auth header, empty no-op, delete propagation; JDBC merge
statement generation per dialect."""

from __future__ import annotations

import base64
import json
import os

import pytest

from graal_cdc_spark.cdc.compaction import compact_cdc
from graal_cdc_spark.cdc.envelope import build_cdc_events, parse_envelope
from graal_cdc_spark.sinks import (
    EsSinkConfig,
    JdbcSinkConfig,
    merge_statement,
    requests_for,
    write_cdc_dataframe,
)
from graal_cdc_spark.sinks.elasticsearch import FileRecordingTransport
from graal_cdc_spark.sinks.jdbc import delete_statement

CFG = EsSinkConfig(url="http://es:9200/idx", username="u", password="p", id_key="id")


# ---------------------------------------------------------------------------
# K6 — validation + auth
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("field", ["url", "username", "password", "id_key"])
def test_blank_params_rejected(field):
    kwargs = dict(url="http://x", username="u", password="p", id_key="id")
    kwargs[field] = "  "
    with pytest.raises(ValueError, match=field):
        EsSinkConfig(**kwargs)


def test_auth_header_url_encodes_credentials():
    cfg = EsSinkConfig(url="http://x", username="u@ser", password="p:ss/w", id_key="id")
    creds = base64.b64decode(cfg.auth_header.split(" ", 1)[1]).decode()
    # URL-encoded before base64, as the reference does (:122-123)
    assert creds == "u%40ser:p%3Ass%2Fw"


def test_empty_records_noop():
    assert requests_for(CFG, [], "index") == []
    assert requests_for(CFG, [], "delete") == []


def test_missing_id_key_rejected():
    with pytest.raises(ValueError, match="missing id key"):
        requests_for(CFG, [{"x": 1}], "index")


# ---------------------------------------------------------------------------
# K1/K3 — single-record dispatch
# ---------------------------------------------------------------------------


def test_single_upsert_is_put_doc():
    [(method, url, headers, body)] = requests_for(CFG, [{"id": 7, "v": "a"}], "index")
    assert (method, url) == ("PUT", "http://es:9200/idx/_doc/7")
    assert headers["Authorization"].startswith("Basic ")
    assert headers["Content-Type"] == "application/json"
    assert json.loads(body) == {"id": 7, "v": "a"}


def test_single_delete_is_delete_doc():
    [(method, url, _, body)] = requests_for(CFG, [{"id": "k 1"}], "delete")
    assert (method, url) == ("DELETE", "http://es:9200/idx/_doc/k%201")
    assert body is None


# ---------------------------------------------------------------------------
# K2/K4 — bulk NDJSON (correct /_bulk endpoint, not the /_bluk typo)
# ---------------------------------------------------------------------------


def test_bulk_upsert_ndjson_bytes():
    recs = [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
    [(method, url, headers, body)] = requests_for(CFG, recs, "index")
    assert (method, url) == ("POST", "http://es:9200/idx/_bulk")
    assert headers["Content-Type"] == "application/x-ndjson"
    assert body == (
        '{"index":{"_id":"1"}}\n{"id":1,"v":"a"}\n'
        '{"index":{"_id":"2"}}\n{"id":2,"v":"b"}\n'
    )


def test_bulk_delete_ndjson_bytes():
    recs = [{"id": 1}, {"id": 2}]
    [(_, url, _, body)] = requests_for(CFG, recs, "delete")
    assert url.endswith("/_bulk")
    assert body == '{"delete":{"_id":"1"}}\n{"delete":{"_id":"2"}}\n'


def test_bulk_chunking():
    cfg = EsSinkConfig(
        url="http://x", username="u", password="p", id_key="id", bulk_chunk_size=2
    )
    reqs = requests_for(cfg, [{"id": i} for i in range(5)], "index")
    assert [r[0] for r in reqs] == ["POST"] * 3
    sizes = [r[3].count('{"index"') for r in reqs]
    assert sizes == [2, 2, 1]


# ---------------------------------------------------------------------------
# end-to-end: CDC compaction → ES sink via foreachPartition
# ---------------------------------------------------------------------------


def test_cdc_write_upserts_and_deletes(spark, sf_dir, tmp_path):
    outdir = str(tmp_path / "reqs")
    os.makedirs(outdir)
    cfg = EsSinkConfig(
        url="http://es:9200/idx", username="u", password="p", id_key="key"
    )

    latest = compact_cdc(
        parse_envelope(build_cdc_events(spark, sf_dir)), drop_deletes=False
    ).select("key", "op", "seq")
    write_cdc_dataframe(
        latest, cfg, transport_factory=lambda: FileRecordingTransport(outdir)
    )

    upserted, deleted = set(), set()
    for name in os.listdir(outdir):
        req = json.load(open(os.path.join(outdir, name)))
        assert req["method"] in ("PUT", "DELETE", "POST")
        if req["method"] == "PUT":
            upserted.add(json.loads(req["body"])["key"])
        elif req["method"] == "DELETE":
            deleted.add(req["url"].rsplit("/", 1)[1])
        else:
            for line in req["body"].splitlines():
                obj = json.loads(line)
                if "index" in obj:
                    upserted.add(obj["index"]["_id"])
                elif "delete" in obj:
                    deleted.add(obj["delete"]["_id"])

    want = {(r["key"], r["op"]) for r in latest.collect()}
    assert upserted == {k for k, op in want if op != "d"}
    assert deleted == {k for k, op in want if op == "d"}
    assert upserted.isdisjoint(deleted)


def _drain(outdir):
    """Parse recorded requests → (upserted ids, deleted ids, all ids seen)."""
    upserted, deleted, seen = set(), set(), []
    for name in os.listdir(outdir):
        req = json.load(open(os.path.join(outdir, name)))
        if req["method"] == "PUT":
            _id = str(json.loads(req["body"])["key"])
            upserted.add(_id)
            seen.append(_id)
        elif req["method"] == "DELETE":
            _id = req["url"].rsplit("/", 1)[1]
            deleted.add(_id)
            seen.append(_id)
        else:
            for line in req["body"].splitlines():
                obj = json.loads(line)
                if "index" in obj:
                    upserted.add(obj["index"]["_id"])
                    seen.append(obj["index"]["_id"])
                elif "delete" in obj:
                    deleted.add(obj["delete"]["_id"])
                    seen.append(obj["delete"]["_id"])
    return upserted, deleted, seen


def test_cdc_write_precompacts_delete_then_reinsert(spark, tmp_path):
    """Log-order replay (Q3): a key deleted then re-inserted within one
    batch must end upserted. The sink pre-compacts on seq, so the final
    event per key wins and no bulk body repeats an _id."""
    outdir = str(tmp_path / "reqs")
    os.makedirs(outdir)
    cfg = EsSinkConfig(
        url="http://es:9200/idx", username="u", password="p", id_key="key"
    )
    rows = [
        ("k1", "u", 1), ("k1", "d", 2), ("k1", "c", 3),  # d then re-insert
        ("k2", "u", 1), ("k2", "d", 2),                  # ends deleted
        ("k3", "c", 1),
    ]
    df = spark.createDataFrame(rows, "key STRING, op STRING, seq BIGINT")
    write_cdc_dataframe(
        df, cfg, transport_factory=lambda: FileRecordingTransport(outdir)
    )
    upserted, deleted, seen = _drain(outdir)
    assert upserted == {"k1", "k3"}
    assert deleted == {"k2"}
    assert len(seen) == len(set(seen)), "an _id was dispatched twice"


def test_cdc_write_refuses_ambiguous_batch(spark, tmp_path):
    """Duplicate keys with no sequence column cannot be ordered — the
    sink refuses rather than guessing (Postgres ON CONFLICT would also
    reject such a batch: 'cannot affect row a second time')."""
    cfg = EsSinkConfig(
        url="http://es:9200/idx", username="u", password="p", id_key="key"
    )
    df = spark.createDataFrame([("k1", "u"), ("k1", "d")], "key STRING, op STRING")
    with pytest.raises(ValueError, match="multiple rows"):
        write_cdc_dataframe(
            df, cfg, transport_factory=lambda: FileRecordingTransport(str(tmp_path))
        )


def test_jdbc_prepare_cdc_batch_compacts_and_splits(spark):
    """write_jdbc_batch's batch prep: latest-by-seq per key, then split —
    upsert and delete key sets are disjoint, so MERGE-then-DELETE order
    is immaterial and ON CONFLICT never sees a duplicate key."""
    from graal_cdc_spark.sinks.jdbc import prepare_cdc_batch

    df = spark.createDataFrame(
        [
            ("k1", "u", 1, "a"),
            ("k1", "d", 2, None),
            ("k1", "c", 3, "b"),  # delete superseded by re-insert
            ("k2", "u", 1, "x"),
            ("k2", "d", 2, None),  # ends deleted
        ],
        "k STRING, op STRING, seq BIGINT, v STRING",
    )
    ups, dels = prepare_cdc_batch(df, ("k",), "op", "seq")
    assert {(r.k, r.v) for r in ups.collect()} == {("k1", "b")}
    assert {r.k for r in dels.collect()} == {"k2"}


# ---------------------------------------------------------------------------
# JDBC sink — dialect merge statements
# ---------------------------------------------------------------------------


def test_jdbc_config_validation():
    with pytest.raises(ValueError, match="jdbc:"):
        JdbcSinkConfig(url="http://x", table="t", key_cols=("k",))
    with pytest.raises(ValueError, match="key_cols"):
        JdbcSinkConfig(url="jdbc:postgresql://x/db", table="t", key_cols=())
    assert JdbcSinkConfig(url="jdbc:mysql://x/db", table="t", key_cols=("k",)).dialect == "mysql"


def test_merge_statement_postgresql():
    sql = merge_statement("postgresql", "tgt", "stg", ["k"], ["a", "b"])
    assert sql == (
        "INSERT INTO tgt (k, a, b) SELECT k, a, b FROM stg "
        "ON CONFLICT (k) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b"
    )


def test_merge_statement_mysql():
    sql = merge_statement("mysql", "tgt", "stg", ["k"], ["a"])
    assert sql == (
        "INSERT INTO tgt (k, a) SELECT k, a FROM stg "
        "ON DUPLICATE KEY UPDATE a = VALUES(a)"
    )


def test_merge_statement_ansi():
    sql = merge_statement("oracle", "tgt", "stg", ["k1", "k2"], ["v"])
    assert sql.startswith("MERGE INTO tgt t USING stg s ON (t.k1 = s.k1 AND t.k2 = s.k2)")
    assert "WHEN MATCHED THEN UPDATE SET t.v = s.v" in sql
    assert "WHEN NOT MATCHED THEN INSERT (k1, k2, v) VALUES (s.k1, s.k2, s.v)" in sql


def test_delete_statement():
    sql = delete_statement("tgt", "stg", ["k"])
    assert sql == (
        "DELETE FROM tgt WHERE EXISTS "
        "(SELECT 1 FROM stg s WHERE tgt.k = s.k)"
    )


# ---------------------------------------------------------------------------
# Retry policy + _bulk response parsing (ROADMAP gap 1) — pure Python,
# no Spark: send_records operates on plain dicts
# ---------------------------------------------------------------------------

from graal_cdc_spark.sinks import EsSinkError, RetryPolicy, send_records  # noqa: E402


class ScriptedTransport:
    """Returns the scripted responses in order; records every request."""

    def __init__(self, script):
        self.script = list(script)
        self.requests = []

    def __call__(self, req):
        self.requests.append(req)
        resp = self.script.pop(0)
        if isinstance(resp, Exception):
            raise resp
        return resp


def _recs(*ids):
    return [{"id": i, "v": f"v{i}"} for i in ids]


def _sleeps():
    out = []
    return out, out.append


def test_retry_on_backpressure_then_success():
    """429 → backoff → retry the same chunk → success."""
    t = ScriptedTransport([(429, None), (200, None)])
    slept, sleep = _sleeps()
    send_records(CFG, _recs("a", "b"), "index", t, RetryPolicy(), sleep)
    assert len(t.requests) == 2
    assert t.requests[0] == t.requests[1]  # identical re-drive
    assert slept == [0.5]


def test_retry_on_connection_error():
    t = ScriptedTransport([OSError("refused"), (200, None)])
    slept, sleep = _sleeps()
    send_records(CFG, _recs("a", "b"), "index", t, RetryPolicy(), sleep)
    assert len(t.requests) == 2 and slept == [0.5]


def test_retries_exhausted_raises_with_failures():
    policy = RetryPolicy(max_attempts=3)
    t = ScriptedTransport([(503, None)] * 3)
    slept, sleep = _sleeps()
    with pytest.raises(EsSinkError) as ei:
        send_records(CFG, _recs("a", "b"), "index", t, policy, sleep)
    assert [f[0] for f in ei.value.failures] == ["a", "b"]
    assert slept == [0.5, 1.0]  # capped exponential, no sleep after last


def test_permanent_http_error_raises_immediately():
    t = ScriptedTransport([(400, None)])
    slept, sleep = _sleeps()
    with pytest.raises(EsSinkError):
        send_records(CFG, _recs("a", "b"), "index", t, RetryPolicy(), sleep)
    assert slept == []


def test_bulk_item_partial_failure_retries_only_failed_items():
    """A 200 bulk response with one 429 item re-drives just that doc."""
    body = json.dumps(
        {
            "errors": True,
            "items": [
                {"index": {"_id": "a", "status": 201}},
                {"index": {"_id": "b", "status": 429}},
                {"index": {"_id": "c", "status": 200}},
            ],
        }
    )
    t = ScriptedTransport([(200, body), (200, None)])
    slept, sleep = _sleeps()
    send_records(CFG, _recs("a", "b", "c"), "index", t, RetryPolicy(), sleep)
    assert len(t.requests) == 2
    # the retry is a single-record PUT for doc b only
    method, url, _, rbody = t.requests[1]
    assert method == "PUT" and url.endswith("/_doc/b")
    assert json.loads(rbody)["id"] == "b"


def test_bulk_item_mapping_error_is_permanent():
    body = json.dumps(
        {
            "errors": True,
            "items": [
                {"index": {"_id": "a", "status": 201}},
                {
                    "index": {
                        "_id": "b",
                        "status": 400,
                        "error": {"type": "mapper_parsing_exception"},
                    }
                },
            ],
        }
    )
    t = ScriptedTransport([(200, body)])
    with pytest.raises(EsSinkError) as ei:
        send_records(CFG, _recs("a", "b"), "index", t, RetryPolicy(), lambda s: None)
    assert ei.value.failures[0][0] == "b"
    assert "mapper_parsing_exception" in ei.value.failures[0][2]


def test_bulk_item_count_mismatch_replays_whole_chunk():
    """Unattributable bulk errors replay the chunk (idempotent ids)."""
    body = json.dumps({"errors": True, "items": [{"index": {"status": 201}}]})
    t = ScriptedTransport([(200, body), (200, None)])
    send_records(CFG, _recs("a", "b"), "index", t, RetryPolicy(), lambda s: None)
    assert len(t.requests) == 2
    assert t.requests[0][3] == t.requests[1][3]


def test_int_only_transport_still_supported():
    t = ScriptedTransport([200])
    send_records(CFG, _recs("a", "b"), "index", t, RetryPolicy(), lambda s: None)
    assert len(t.requests) == 1


def test_errors_false_body_is_full_success():
    body = json.dumps({"errors": False, "items": [{"index": {"status": 503}}]})
    t = ScriptedTransport([(200, body)])
    send_records(CFG, _recs("a", "b"), "index", t, RetryPolicy(), lambda s: None)
    assert len(t.requests) == 1


def test_retry_after_header_stretches_backoff():
    """A 429 with Retry-After longer than the computed backoff waits
    the hinted time (capped at max_backoff_s)."""
    t = ScriptedTransport([(429, None, {"Retry-After": "3"}), (200, None)])
    slept, sleep = _sleeps()
    send_records(CFG, _recs("a", "b"), "index", t, RetryPolicy(), sleep)
    assert slept == [3.0]  # hint (3s) > base backoff (0.5s)


def test_retry_after_header_never_shrinks_backoff_and_caps():
    policy = RetryPolicy(max_attempts=3, base_backoff_s=2.0, max_backoff_s=5.0)
    t = ScriptedTransport(
        [
            (429, None, {"retry-after": "1"}),     # hint < backoff → backoff
            (503, None, {"Retry-After": "600"}),   # hint > cap → cap
            (200, None),
        ]
    )
    slept, sleep = _sleeps()
    send_records(CFG, _recs("a"), "index", t, policy, sleep)
    assert slept == [2.0, 5.0]


def test_malformed_retry_after_ignored():
    t = ScriptedTransport([(429, None, {"Retry-After": "soon"}), (200, None)])
    slept, sleep = _sleeps()
    send_records(CFG, _recs("a"), "index", t, RetryPolicy(), sleep)
    assert slept == [0.5]


def test_single_delete_404_is_success():
    """DELETE of an absent doc returns 404 — the desired end state
    already holds (first-batch insert+delete compaction, or replay of
    an applied delete), so the sink must treat it as delivered."""
    t = ScriptedTransport([(404, None)])
    slept, sleep = _sleeps()
    send_records(CFG, _recs("a"), "delete", t, RetryPolicy(), sleep)
    assert len(t.requests) == 1 and t.requests[0][0] == "DELETE"
    assert slept == []


def test_single_upsert_404_stays_fatal():
    """404 on an index PUT is NOT convergence — it stays permanent."""
    t = ScriptedTransport([(404, None)])
    with pytest.raises(EsSinkError):
        send_records(CFG, _recs("a"), "index", t, RetryPolicy(), lambda s: None)


def test_bulk_delete_item_404_is_success():
    """A _bulk delete item with status 404 / result not_found (ES sets
    errors:true for these) is convergence, not failure; other items'
    outcomes are still honored."""
    body = json.dumps(
        {
            "errors": True,
            "items": [
                {"delete": {"_id": "a", "status": 404, "result": "not_found"}},
                {"delete": {"_id": "b", "status": 200, "result": "deleted"}},
            ],
        }
    )
    t = ScriptedTransport([(200, body)])
    slept, sleep = _sleeps()
    send_records(CFG, _recs("a", "b"), "delete", t, RetryPolicy(), sleep)
    assert len(t.requests) == 1 and slept == []


def test_bulk_delete_item_mix_404_and_retryable():
    """404 deletes pass; a 429 delete item still retries (alone)."""
    body1 = json.dumps(
        {
            "errors": True,
            "items": [
                {"delete": {"_id": "a", "status": 404}},
                {"delete": {"_id": "b", "status": 429}},
            ],
        }
    )
    t = ScriptedTransport([(200, body1), (200, None)])
    slept, sleep = _sleeps()
    send_records(CFG, _recs("a", "b"), "delete", t, RetryPolicy(), sleep)
    # retry carried only 'b' — it went out as a single-doc DELETE
    assert t.requests[1][0] == "DELETE" and "/_doc/b" in t.requests[1][1]


def test_bulk_index_item_404_stays_fatal():
    """404 on an index item is a real failure (e.g. missing index with
    auto-create disabled) — only delete actions get the pass."""
    body = json.dumps(
        {
            "errors": True,
            "items": [
                {"index": {"_id": "a", "status": 404, "error": {"type": "x"}}},
                {"index": {"_id": "b", "status": 200}},
            ],
        }
    )
    t = ScriptedTransport([(200, body)])
    with pytest.raises(EsSinkError):
        send_records(CFG, _recs("a", "b"), "index", t, RetryPolicy(), lambda s: None)


# ---------------------------------------------------------------------------
# Partitioned parquet lake sink
# ---------------------------------------------------------------------------


def test_dynamic_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from graal_cdc_spark.sinks.lake import write_partitioned

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "part string, v int"
    )
    write_partitioned(base, path, ["part"])
    # rerun produces ONLY partition 'a' with different rows
    rerun = spark.createDataFrame([("a", 9)], "part string, v int")
    write_partitioned(rerun, path, ["part"])
    got = sorted(
        (r["part"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    # 'a' replaced, 'b' untouched
    assert got == [("a", 9), ("b", 3)]


def test_static_overwrite_truncates(spark, tmp_path):
    from graal_cdc_spark.sinks.lake import write_partitioned

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [("a", 1), ("b", 3)], "part string, v int"
    )
    write_partitioned(base, path, ["part"])
    rerun = spark.createDataFrame([("a", 9)], "part string, v int")
    write_partitioned(rerun, path, ["part"], dynamic_overwrite=False)
    got = sorted(
        (r["part"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    assert got == [("a", 9)]  # 'b' gone — the mode the rerun must avoid


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    from graal_cdc_spark.sinks.lake import compact_partitions, write_partitioned

    path = str(tmp_path / "lake")
    df = spark.range(0, 1000).selectExpr(
        "CAST(id % 2 AS STRING) AS part", "id AS v"
    )
    # fragment: 10 files per partition
    write_partitioned(df.repartition(20), path, ["part"])
    before = sorted(r["v"] for r in spark.read.parquet(path).collect())

    res = compact_partitions(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert res, "expected fragmented partitions to be rewritten"
    for part_dir, (n_before, n_after) in res.items():
        assert n_after < n_before
        assert n_after == 1  # tiny data, one target file

    after = sorted(r["v"] for r in spark.read.parquet(path).collect())
    assert after == before


# --- purge_keys: GDPR erasure over the parquet lake ---


def _lake_rows(spark, path):
    return sorted(
        (r.tbl, r.k, r.v)
        for r in spark.read.parquet(path).collect()
    )


def _build_lake(spark, path):
    from graal_cdc_spark.sinks.lake import write_partitioned

    df = spark.createDataFrame(
        [("users", i, f"v{i}") for i in range(20)]
        + [("orders", i, f"o{i}") for i in range(10)],
        "tbl string, k long, v string",
    )
    write_partitioned(df.repartition(4, "k"), path, ["tbl"])


def test_purge_keys_removes_only_requested_rows(spark, tmp_path):
    import os

    from graal_cdc_spark.sinks.lake import purge_keys

    lake = str(tmp_path / "lake")
    _build_lake(spark, lake)
    stats = purge_keys(spark, lake, "k", [3, 7, 999])
    assert stats["rows_purged"] == 4  # k=3,7 in users AND orders (k<10)
    got = _lake_rows(spark, lake)
    assert not any(k in (3, 7) for _, k, _ in got)
    assert ("users", 4, "v4") in got and ("orders", 9, "o9") in got
    assert len(got) == 30 - 4
    assert not os.path.exists(os.path.join(lake, ".purge-intent.json"))
    # idempotent: purging again is a no-op
    assert purge_keys(spark, lake, "k", [3, 7]) == {
        "files_rewritten": 0, "rows_purged": 0, "partitions": 0,
    }


def test_purge_keys_untouched_files_not_rewritten(spark, tmp_path):
    """File-targeting: files without a purged key keep their identity
    (same path, same bytes) — the 100 TB property."""
    import glob
    import os

    from graal_cdc_spark.sinks.lake import purge_keys

    lake = str(tmp_path / "lake")
    _build_lake(spark, lake)
    before = {
        p: os.path.getsize(p)
        for p in glob.glob(f"{lake}/*/*.parquet")
    }
    purge_keys(spark, lake, "k", [5])
    after = {
        p: os.path.getsize(p)
        for p in glob.glob(f"{lake}/*/*.parquet")
    }
    survived = set(before) & set(after)
    assert survived, "some files must be untouched"
    for p in survived:
        assert before[p] == after[p]
    # at least one original was replaced in each table containing k=5
    assert set(before) - set(after), "affected files must be rewritten"


def test_purge_keys_crash_recovery_completes_plan(spark, tmp_path):
    """A marker left by a crashed purge (staged files written, nothing
    applied) is completed by the next call — no duplicates, no
    survivors lost, no purged rows back."""
    import json
    import os

    from graal_cdc_spark.sinks.lake import _purge_marker, purge_keys

    lake = str(tmp_path / "lake")
    _build_lake(spark, lake)

    # run a real purge but intercept: recreate its pre-apply state by
    # doing the staging manually through the same code path, then
    # simulate the crash by re-writing the marker and leaving one
    # "add" unapplied and one "delete" undone.
    purge_keys(spark, lake, "k", [2])
    clean = _lake_rows(spark, lake)

    # handcrafted partial plan: stage a replacement for one users file
    import glob

    target = sorted(glob.glob(f"{lake}/tbl=users/*.parquet"))[0]
    staged_dir = os.path.join(lake, ".purge-staging-test")
    os.makedirs(staged_dir)
    spark.read.parquet(target).filter("k <> 11").coalesce(1).write.mode(
        "overwrite"
    ).parquet(staged_dir + "/file-00000")
    part = [
        f for f in os.listdir(staged_dir + "/file-00000")
        if f.endswith(".parquet")
    ][0]
    final = os.path.join(lake, "tbl=users", "part-purged-test.parquet")
    plan = {
        "staging": staged_dir,
        "add": [[staged_dir + "/file-00000/" + part, final]],
        "delete": [target],
    }
    with open(_purge_marker(lake), "w") as f:
        json.dump(plan, f)

    # next purge call first completes the crashed plan
    purge_keys(spark, lake, "k", [])
    assert not os.path.exists(_purge_marker(lake))
    assert not os.path.exists(target)
    assert os.path.exists(final)
    got = _lake_rows(spark, lake)
    expected = [r for r in clean if not (r[0], r[1]) == ("users", 11)]
    assert got == sorted(expected)


def test_purge_keys_preserves_null_key_rows(spark, tmp_path):
    """NULL-safe survivor predicate: rows with a NULL key in a
    rewritten file must survive — erasure never drops rows it was not
    asked to erase (`~isin` alone evaluates NULL -> filtered)."""
    from graal_cdc_spark.sinks.lake import purge_keys, write_partitioned

    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [("users", 1, "a"), ("users", None, "n1"),
         ("users", 2, "b"), ("users", None, "n2")],
        "tbl string, k long, v string",
    )
    write_partitioned(df.coalesce(1), lake, ["tbl"])
    stats = purge_keys(spark, lake, "k", [1])
    assert stats["rows_purged"] == 1
    got = sorted(
        ((r.k if r.k is not None else -1), r.v)
        for r in spark.read.parquet(lake).collect()
    )
    assert got == [(-1, "n1"), (-1, "n2"), (2, "b")]


def test_purge_keys_sweeps_orphan_staging(spark, tmp_path):
    """A staging tree from a crash BEFORE the marker was written is
    swept on the next call (nothing from it was ever applied)."""
    import os

    from graal_cdc_spark.sinks.lake import purge_keys

    lake = str(tmp_path / "lake")
    _build_lake(spark, lake)
    orphan = os.path.join(lake, ".purge-staging-dead")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("x")
    purge_keys(spark, lake, "k", [1])
    assert not os.path.exists(orphan)


def _job_count(spark, fn):
    """Number of Spark jobs submitted while fn() runs (statusTracker
    group-scoped ids — the submitting thread's job group)."""
    import uuid

    sc = spark.sparkContext
    # uuid, not id(fn): CPython reuses ids of collected objects, which
    # would alias two calls' job groups and double-count
    group = f"purge-jobcount-{uuid.uuid4().hex}"
    sc.setJobGroup(group, "count jobs")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_purge_keys_hot_key_one_rewrite_job(spark, tmp_path):
    """Scale shape: a key spanning many files costs a CONSTANT number
    of Spark jobs — the rewrite is one job over all affected files
    (tag with input_file_name, write partitioned by file id), not one
    job per file. Asserted by comparing the job count of a 2-file
    purge with a >=20-file purge: equal, not linear in files."""
    import glob

    from graal_cdc_spark.sinks.lake import purge_keys, write_partitioned

    def build(path, n_files):
        # one file per tbl partition; the hot key k=0 is in ALL of them
        df = spark.createDataFrame(
            [(f"t{i:02d}", j, f"v{i}-{j}") for i in range(n_files)
             for j in range(5)],
            "tbl string, k long, v string",
        )
        write_partitioned(df.repartition("tbl").coalesce(n_files), path,
                          ["tbl"])

    small = str(tmp_path / "small")
    big = str(tmp_path / "big")
    build(small, 2)
    build(big, 24)
    assert len(glob.glob(f"{big}/*/*.parquet")) >= 20

    jobs_small = _job_count(
        spark, lambda: purge_keys(spark, small, "k", [0])
    )
    stats = {}
    jobs_big = _job_count(
        spark, lambda: stats.update(purge_keys(spark, big, "k", [0]))
    )
    assert stats["files_rewritten"] >= 20
    assert stats["rows_purged"] >= 20
    # constant job count regardless of affected-file fan-out
    assert jobs_big == jobs_small, (jobs_small, jobs_big)
    # correctness: k=0 gone everywhere, everything else intact
    got = sorted((r.tbl, r.k) for r in spark.read.parquet(big).collect())
    assert not any(k == 0 for _, k in got)
    assert len(got) == 24 * 4


def test_purge_keys_percent_encoded_partition_values(spark, tmp_path):
    """Partition values that URI-escape in input_file_name (spaces,
    '%', '=') resolve back to real local paths — the erasure request
    must not fail on a lake whose partition values need decoding."""
    from graal_cdc_spark.sinks.lake import purge_keys, write_partitioned

    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [("north america", 1, "a"), ("north america", 2, "b"),
         ("50% off", 3, "c"), ("a=b c", 4, "d")],
        "tbl string, k long, v string",
    )
    write_partitioned(df.coalesce(1), lake, ["tbl"])
    stats = purge_keys(spark, lake, "k", [1, 3, 4])
    assert stats["rows_purged"] == 3
    got = sorted((r.tbl, r.k, r.v)
                 for r in spark.read.parquet(lake).collect())
    assert got == [("north america", 2, "b")]
