"""Elasticsearch sink — id-keyed upsert/delete, single/bulk dispatch.

Reproduces the reference's sink contract
(``ElasticsearchUtils.java:37-189``, SURVEY.md §2.1 K1–K6):

- K6 param validation: ``url``/``username``/``password``/``idKey``
  required and non-blank (``:104-121``); Basic auth from URL-encoded
  credentials (``:122-123``); empty record set → completed no-op
  (``:125-130``).
- K1/K3 single-record dispatch: ``PUT/DELETE {url}/_doc/{id}``
  (``:145-152,168-176``) when exactly one record.
- K2/K4 bulk dispatch: NDJSON action+source lines POSTed to the bulk
  endpoint (``:134-144,156-167``). The reference spells it ``/_bluk``
  — a typo that would 404 against real ES; we implement the intent
  (``/_bulk``) as SURVEY.md §2.1 notes.
- K5 record coercion: rows become JSON objects; the id is extracted
  from each record by ``id_key``.

Spark-first shape: the sink is a ``foreachPartition`` (batch) /
``foreachBatch`` (streaming) consumer. The batching unit is the
partition — orders of magnitude larger than the reference's per-event
HTTP call — chunked to ``bulk_chunk_size`` docs per request so request
bodies stay bounded regardless of partition size. The transport is
injectable so tests (and air-gapped runs) never open sockets; the
default transport uses stdlib urllib on the executor.

Scale notes: no driver involvement after planning; each executor
speaks to ES directly (N-way parallel ingest). Idempotence: upserts
are id-keyed, so Spark task retries / streaming batch replays
converge — the property the compaction pipeline relies on
(SURVEY.md §2.3.3).
"""

from __future__ import annotations

import base64
import json
import urllib.parse
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame

#: (method, url, headers, body) — body is None for single DELETE.
EsRequest = tuple[str, str, dict[str, str], str | None]

Transport = Callable[[EsRequest], int]


@dataclass(frozen=True)
class EsSinkConfig:
    """Validated sink parameters (K6)."""

    url: str
    username: str
    password: str
    id_key: str
    bulk_chunk_size: int = 1000

    def __post_init__(self) -> None:
        for name in ("url", "username", "password", "id_key"):
            v = getattr(self, name)
            if not isinstance(v, str) or not v.strip():
                raise ValueError(f"es sink: param {name!r} is required and non-blank")
        if self.bulk_chunk_size < 1:
            raise ValueError("es sink: bulk_chunk_size must be >= 1")

    @property
    def auth_header(self) -> str:
        """Basic auth from URL-encoded credentials
        (``ElasticsearchUtils.java:122-123``)."""
        creds = (
            urllib.parse.quote(self.username, safe="")
            + ":"
            + urllib.parse.quote(self.password, safe="")
        )
        return "Basic " + base64.b64encode(creds.encode()).decode()

    def _headers(self, content_type: str) -> dict[str, str]:
        return {"Authorization": self.auth_header, "Content-Type": content_type}


def _doc_id(cfg: EsSinkConfig, record: dict) -> str:
    if cfg.id_key not in record or record[cfg.id_key] is None:
        raise ValueError(f"es sink: record missing id key {cfg.id_key!r}: {record}")
    return str(record[cfg.id_key])


def _json(record: dict) -> str:
    return json.dumps(record, separators=(",", ":"), sort_keys=True, default=str)


def bulk_body(cfg: EsSinkConfig, records: list[dict], action: str) -> str:
    """NDJSON bulk body (K2/K4): ``{"index":{"_id":..}}\\n{doc}`` lines
    for upserts, ``{"delete":{"_id":..}}`` lines for deletes."""
    lines: list[str] = []
    for rec in records:
        meta = json.dumps({action: {"_id": _doc_id(cfg, rec)}}, separators=(",", ":"))
        lines.append(meta)
        if action == "index":
            lines.append(_json(rec))
    return "\n".join(lines) + "\n"


def requests_for(
    cfg: EsSinkConfig, records: list[dict], action: str = "index"
) -> list[EsRequest]:
    """Build the HTTP requests for a record batch.

    Dispatch mirrors the reference: empty → no-op (``:125-130``),
    exactly one → single-document call (``records.size() > 1`` is the
    bulk condition, ``:131``), else chunked ``_bulk`` POSTs.
    """
    if action not in ("index", "delete"):
        raise ValueError(f"es sink: unknown action {action!r}")
    if not records:
        return []
    base = cfg.url.rstrip("/")
    if len(records) == 1:
        rec = records[0]
        doc_url = f"{base}/_doc/{urllib.parse.quote(_doc_id(cfg, rec), safe='')}"
        if action == "index":
            return [("PUT", doc_url, cfg._headers("application/json"), _json(rec))]
        return [("DELETE", doc_url, cfg._headers("application/json"), None)]
    out: list[EsRequest] = []
    for i in range(0, len(records), cfg.bulk_chunk_size):
        chunk = records[i : i + cfg.bulk_chunk_size]
        out.append(
            (
                "POST",
                f"{base}/_bulk",
                cfg._headers("application/x-ndjson"),
                bulk_body(cfg, chunk, action),
            )
        )
    return out


def urllib_transport(request: EsRequest) -> int:
    """Default executor-side transport (stdlib only)."""
    import urllib.request

    method, url, headers, body = request
    req = urllib.request.Request(
        url, data=body.encode() if body is not None else None, method=method
    )
    for k, v in headers.items():
        req.add_header(k, v)
    with urllib.request.urlopen(req) as resp:  # noqa: S310 — cfg-provided URL
        return resp.status


class FileRecordingTransport:
    """Dry-run transport: records each request as a JSON file in a
    shared directory instead of opening sockets. Useful for audits and
    tests (local-mode executors share the filesystem). Defined at
    module level so it pickles to executors."""

    def __init__(self, outdir: str):
        self.outdir = outdir

    def __call__(self, request: EsRequest) -> int:
        import os
        import uuid as _uuid

        method, url, headers, body = request
        path = os.path.join(self.outdir, _uuid.uuid4().hex + ".json")
        with open(path, "w") as f:
            json.dump({"method": method, "url": url, "body": body}, f)
        return 200


def _send_partition(
    rows: Iterator,
    cfg: EsSinkConfig,
    action_col: str | None,
    transport_factory: Callable[[], Transport],
) -> None:
    transport = transport_factory()
    upserts: list[dict] = []
    deletes: list[dict] = []
    for row in rows:
        rec = row.asDict(recursive=True)
        if action_col is not None and rec.pop(action_col, None) == "d":
            deletes.append(rec)
        else:
            upserts.append(rec)
    for req in requests_for(cfg, upserts, "index"):
        transport(req)
    for req in requests_for(cfg, deletes, "delete"):
        transport(req)


def write_dataframe(
    df: DataFrame,
    cfg: EsSinkConfig,
    transport_factory: Callable[[], Transport] = lambda: urllib_transport,
) -> None:
    """Upsert every row of ``df`` (id taken from ``cfg.id_key`` column).

    Executor-parallel: one connection + chunked bulk requests per
    partition.
    """
    df.foreachPartition(
        lambda rows: _send_partition(rows, cfg, None, transport_factory)
    )


def write_cdc_dataframe(
    df: DataFrame,
    cfg: EsSinkConfig,
    op_col: str = "op",
    seq_col: str | None = "seq",
    transport_factory: Callable[[], Transport] = lambda: urllib_transport,
) -> None:
    """CDC-aware write: rows with ``op='d'`` become deletes (K3/K4 —
    tombstone→delete mapping), everything else upserts. Plug this into
    ``foreachBatch`` for the streaming path.

    The batch is pre-compacted to one row per ``cfg.id_key`` (highest
    ``seq_col`` wins) before dispatch. The reference replays the log in
    order (Q3), so a delete followed by a re-insert of the same key in
    one batch must land as the re-insert; applying raw batches as
    "all upserts, then all deletes" would leave the key deleted. After
    compaction every key carries exactly its final action, so apply
    order across keys is immaterial and no ``_bulk`` body repeats an
    ``_id``. When the batch has no ``seq_col`` (or ``seq_col=None``),
    key uniqueness is asserted instead — an ambiguous batch is refused
    rather than mis-ordered.
    """
    from graal_cdc_spark.cdc.compaction import assert_one_row_per_key, latest_by_key

    if seq_col is not None and seq_col in df.columns:
        df = latest_by_key(df, [cfg.id_key], seq_col)
    else:
        assert_one_row_per_key(df, [cfg.id_key], "es sink")
    df.foreachPartition(
        lambda rows: _send_partition(rows, cfg, op_col, transport_factory)
    )
