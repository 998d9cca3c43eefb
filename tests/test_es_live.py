"""LIVE Elasticsearch-sink integration over real HTTP sockets.

The other ES tests inject fake transports; here an in-process
``http.server`` emulates the ES surface the sink speaks
(``PUT /{index}/_doc/{id}``, ``DELETE /{index}/_doc/{id}``,
``POST /{index}/_bulk`` with per-item results) and the sink runs its
REAL executor path: ``foreachPartition`` → ``urllib_transport`` →
sockets → retry policy — closing the "no live ES in sandbox" gap at
the protocol level (only the store behind the API is fake).

Reference parity: ElasticsearchUtils.java:131-177 (upsert/delete,
single + bulk), with the repo's per-item 429 retry semantics.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from graal_cdc_spark.sinks.elasticsearch import (
    EsSinkConfig,
    RetryPolicy,
    urllib_transport,
    write_cdc_dataframe,
    write_dataframe,
)


class _FakeEs(BaseHTTPRequestHandler):
    """Minimal ES lookalike: a dict store + per-item 429 fault
    injection (fail each doc id once when `flaky` is set)."""

    store: dict[str, dict] = {}
    flaky: bool = False
    _failed_once: set[str] = set()
    requests: list[tuple[str, str]] = []

    def log_message(self, *a):  # silence
        pass

    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> str:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n).decode()

    def _item(self, action: str, doc_id: str, doc: dict | None) -> dict:
        cls = type(self)
        if cls.flaky and doc_id not in cls._failed_once:
            cls._failed_once.add(doc_id)
            return {action: {"_id": doc_id, "status": 429}}
        if action == "index":
            cls.store[doc_id] = doc or {}
            return {action: {"_id": doc_id, "status": 200}}
        existed = cls.store.pop(doc_id, None) is not None
        return {action: {"_id": doc_id, "status": 200 if existed else 404}}

    def do_PUT(self):
        type(self).requests.append(("PUT", self.path))
        m = re.fullmatch(r"/[^/]+/_doc/([^/?]+)", self.path)
        if not m:
            return self._json(400, {"error": "bad path"})
        item = self._item("index", m.group(1), json.loads(self._body()))
        status = item["index"]["status"]
        self._json(status, {"result": "updated"} if status == 200 else {})

    def do_DELETE(self):
        type(self).requests.append(("DELETE", self.path))
        m = re.fullmatch(r"/[^/]+/_doc/([^/?]+)", self.path)
        if not m:
            return self._json(400, {"error": "bad path"})
        item = self._item("delete", m.group(1), None)
        self._json(item["delete"]["status"], {"result": "deleted"})

    def do_POST(self):
        type(self).requests.append(("POST", self.path))
        if not self.path.endswith("/_bulk"):
            return self._json(400, {"error": "bad path"})
        lines = [ln for ln in self._body().splitlines() if ln.strip()]
        items, i = [], 0
        while i < len(lines):
            meta = json.loads(lines[i])
            action = next(iter(meta))
            doc_id = meta[action]["_id"]
            if action == "index":
                items.append(self._item("index", doc_id, json.loads(lines[i + 1])))
                i += 2
            else:
                items.append(self._item("delete", doc_id, None))
                i += 1
        errors = any(
            v["status"] >= 300 for it in items for v in it.values()
        )
        self._json(200, {"errors": errors, "items": items})


@pytest.fixture()
def es_server():
    _FakeEs.store = {}
    _FakeEs._failed_once = set()
    _FakeEs.flaky = False
    _FakeEs.requests = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeEs)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/docs"
    srv.shutdown()
    t.join(timeout=10)


def _cfg(url, **kw):
    return EsSinkConfig(
        url=url, username="u", password="p", id_key="k", **kw
    )


def test_live_bulk_upsert_and_cdc_delete(spark, es_server):
    df = spark.createDataFrame(
        [(1, "a", 1, "c"), (2, "b", 2, "c"), (3, "c", 3, "c")],
        "k INT, v STRING, seq LONG, op STRING",
    )
    write_cdc_dataframe(df.coalesce(1), _cfg(es_server), op_col="op")
    assert sorted(_FakeEs.store) == ["1", "2", "3"]

    # update k=1 (latest seq wins in-batch), delete k=2
    df2 = spark.createDataFrame(
        [(1, "a2", 4, "u"), (1, "a3", 5, "u"), (2, "b", 6, "d")],
        "k INT, v STRING, seq LONG, op STRING",
    )
    write_cdc_dataframe(df2.coalesce(1), _cfg(es_server), op_col="op")
    assert sorted(_FakeEs.store) == ["1", "3"]
    assert _FakeEs.store["1"]["v"] == "a3"
    # every request travelled over real sockets against the ES surface
    assert _FakeEs.requests and all(
        m in ("POST", "PUT", "DELETE") for m, _ in _FakeEs.requests
    )


def test_live_per_item_429_retry_converges(spark, es_server):
    """A 200 _bulk response carrying per-item 429s must retry ONLY the
    failed items and converge — against the real HTTP stack."""
    _FakeEs.flaky = True
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], "k INT, v STRING"
    )
    write_dataframe(
        df.coalesce(1),
        _cfg(es_server),
        retry_policy=RetryPolicy(max_attempts=4, base_backoff_s=0.01),
    )
    assert sorted(_FakeEs.store) == [str(i) for i in range(5)]
    # at least two bulk requests: initial + retry of the 429'd items
    assert len(_FakeEs.requests) >= 2


def test_live_single_doc_requests_small_chunk(spark, es_server):
    """bulk_chunk_size=1 routes through the single-doc PUT/DELETE
    endpoints; delete of an absent id (404) converges silently."""
    df = spark.createDataFrame([(7, "x", 1, "c")], "k INT, v STRING, seq LONG, op STRING")
    write_cdc_dataframe(
        df.coalesce(1), _cfg(es_server, bulk_chunk_size=1), op_col="op"
    )
    assert sorted(_FakeEs.store) == ["7"]
    gone = spark.createDataFrame(
        [(7, None, 2, "d"), (8, None, 3, "d")],
        "k INT, v STRING, seq LONG, op STRING",
    )
    write_cdc_dataframe(
        gone.coalesce(1), _cfg(es_server, bulk_chunk_size=1), op_col="op"
    )
    assert _FakeEs.store == {}
