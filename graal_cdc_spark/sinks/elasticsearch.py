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
import time
import urllib.parse
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame

#: (method, url, headers, body) — body is None for single DELETE.
EsRequest = tuple[str, str, dict[str, str], str | None]

#: A transport returns either a bare status code or ``(status, body)``.
#: The response body (when provided) lets the sink parse ``_bulk``
#: per-item results; int-only transports remain fully supported.
EsResponse = "int | tuple[int, str | None]"
Transport = Callable[[EsRequest], "int | tuple[int, str | None]"]


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
    return [req for req, _ in _request_chunks(cfg, records, action)]


def _request_chunks(
    cfg: EsSinkConfig, records: list[dict], action: str
) -> list[tuple[EsRequest, list[dict]]]:
    """Requests paired with the records each carries — the unit the
    retry loop re-drives (a failed chunk retries only its records)."""
    if action not in ("index", "delete"):
        raise ValueError(f"es sink: unknown action {action!r}")
    if not records:
        return []
    base = cfg.url.rstrip("/")
    if len(records) == 1:
        rec = records[0]
        doc_url = f"{base}/_doc/{urllib.parse.quote(_doc_id(cfg, rec), safe='')}"
        if action == "index":
            req = ("PUT", doc_url, cfg._headers("application/json"), _json(rec))
        else:
            req = ("DELETE", doc_url, cfg._headers("application/json"), None)
        return [(req, [rec])]
    out: list[tuple[EsRequest, list[dict]]] = []
    for i in range(0, len(records), cfg.bulk_chunk_size):
        chunk = records[i : i + cfg.bulk_chunk_size]
        req = (
            "POST",
            f"{base}/_bulk",
            cfg._headers("application/x-ndjson"),
            bulk_body(cfg, chunk, action),
        )
        out.append((req, chunk))
    return out


@dataclass(frozen=True)
class RetryPolicy:
    """Bounded exponential backoff for transient sink failures.

    Retryable: connection-level errors (``OSError``), HTTP 429/5xx
    backpressure statuses, and ``_bulk`` *items* that individually
    report a retryable status (a 200 bulk response can still carry
    per-item 429s — ES applies backpressure per shard). Anything else
    (mapping conflicts, 4xx) is permanent and raises immediately:
    retrying a permanent error holds the Spark task slot for the full
    backoff schedule and then fails anyway.
    """

    max_attempts: int = 4
    base_backoff_s: float = 0.5
    max_backoff_s: float = 10.0
    retryable_statuses: frozenset = frozenset({429, 500, 502, 503, 504})

    def __post_init__(self) -> None:
        if self.max_attempts < 1:
            raise ValueError("es sink: max_attempts must be >= 1")

    def backoff(self, attempt: int) -> float:
        """Deterministic capped exponential (attempt is 0-based)."""
        return min(self.base_backoff_s * (2**attempt), self.max_backoff_s)


class EsSinkError(Exception):
    """Raised when records cannot be delivered. ``failures`` is a list
    of ``(doc_id, status, reason)`` triples."""

    def __init__(self, message: str, failures: list[tuple[str, int | None, str]]):
        super().__init__(f"{message}: {failures[:5]}" + ("..." if len(failures) > 5 else ""))
        self.failures = failures


def _as_response(raw) -> tuple[int, str | None, float | None]:
    """Normalize a transport result to (status, body, retry_after_s).
    Transports may return int, (status, body), or (status, body,
    headers-dict); a Retry-After header (seconds form) overrides the
    computed backoff when larger — ES tells clients when the write
    queue will have room, and ignoring it just burns the retry budget.
    """
    if isinstance(raw, tuple):
        status, body = raw[0], raw[1]
        retry_after = None
        if len(raw) > 2 and isinstance(raw[2], dict):
            header = {k.lower(): v for k, v in raw[2].items()}.get("retry-after")
            try:
                retry_after = float(header) if header is not None else None
            except (TypeError, ValueError):
                retry_after = None
        return status, body, retry_after
    return int(raw), None, None


def _bulk_item_failures(
    cfg: EsSinkConfig,
    chunk: list[dict],
    body: str | None,
    policy: RetryPolicy,
    action: str = "index",
) -> tuple[list[dict], list[tuple[str, int | None, str]]]:
    """Split a 2xx ``_bulk`` response into (records to retry, permanent
    failures). ES returns ``items`` in request order, so items map to
    records positionally. A body that is missing, unparsable, or
    reports ``errors: false`` means full success.

    Deleting an absent document is success, not failure: ES reports a
    delete item for a missing ``_id`` as ``status: 404`` / ``result:
    "not_found"`` (and sets top-level ``errors: true``), but the sink's
    contract is convergence — "this key does not exist" is exactly the
    desired end state. This case arises in the mainline flow (an
    insert+delete of the same key compacts to a delete of a doc that
    never reached ES) and on every at-least-once replay of an
    already-applied delete."""
    if body is None:
        return [], []
    try:
        parsed = json.loads(body)
    except (ValueError, TypeError):
        return [], []
    if not isinstance(parsed, dict) or not parsed.get("errors"):
        return [], []
    items = parsed.get("items")
    if not isinstance(items, list) or len(items) != len(chunk):
        # Can't attribute failures to records — replay the whole chunk
        # (id-keyed upserts are idempotent, so replays converge).
        return list(chunk), []
    retry: list[dict] = []
    fatal: list[tuple[str, int | None, str]] = []
    for rec, item in zip(chunk, items):
        result = next(iter(item.values())) if isinstance(item, dict) else {}
        status = result.get("status", 200)
        if 200 <= status < 300:
            continue
        if action == "delete" and (status == 404 or result.get("result") == "not_found"):
            continue  # absent doc: the desired end state already holds
        if status in policy.retryable_statuses:
            retry.append(rec)
        else:
            reason = json.dumps(result.get("error", {}), sort_keys=True)
            fatal.append((_doc_id(cfg, rec), status, reason))
    return retry, fatal


def send_records(
    cfg: EsSinkConfig,
    records: list[dict],
    action: str,
    transport: Transport,
    policy: RetryPolicy | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """Deliver ``records`` with at-least-once semantics: retryable
    failures (connection errors, 429/5xx, retryable bulk items) back
    off and re-drive only the failed records; permanent failures raise
    ``EsSinkError``. Delivery is idempotent (id-keyed), so replays
    after a partial failure converge."""
    policy = policy or RetryPolicy()
    pending = records
    last_reason = ""
    for attempt in range(policy.max_attempts):
        retry: list[dict] = []
        fatal: list[tuple[str, int | None, str]] = []
        retry_after: float | None = None
        for req, chunk in _request_chunks(cfg, pending, action):
            try:
                status, body, hinted = _as_response(transport(req))
            except OSError as exc:
                retry.extend(chunk)
                last_reason = f"transport error: {exc}"
                continue
            if 200 <= status < 300:
                item_retry, item_fatal = _bulk_item_failures(
                    cfg, chunk, body, policy, action
                )
                retry.extend(item_retry)
                fatal.extend(item_fatal)
                if item_retry:
                    last_reason = f"bulk items retryable ({len(item_retry)})"
            elif status == 404 and action == "delete" and req[0] == "DELETE":
                # Single-doc DELETE of an absent id: already converged
                # (first-batch delete of a never-indexed key, or replay
                # of an applied delete). Only the single-record path —
                # a 404 on the ``_bulk`` endpoint itself stays fatal.
                continue
            elif status in policy.retryable_statuses:
                retry.extend(chunk)
                last_reason = f"http {status}"
                if hinted is not None:
                    retry_after = max(retry_after or 0.0, hinted)
            else:
                fatal.extend((_doc_id(cfg, rec), status, "http error") for rec in chunk)
        if fatal:
            raise EsSinkError("es sink: permanent failures", fatal)
        if not retry:
            return
        pending = retry
        if attempt + 1 < policy.max_attempts:
            backoff = policy.backoff(attempt)
            if retry_after is not None:
                backoff = min(max(backoff, retry_after), policy.max_backoff_s)
            sleep(backoff)
    raise EsSinkError(
        f"es sink: retries exhausted after {policy.max_attempts} attempts "
        f"({last_reason})",
        [(_doc_id(cfg, rec), None, last_reason) for rec in pending],
    )


def urllib_transport(request: EsRequest) -> tuple[int, str | None, dict]:
    """Default executor-side transport (stdlib only). HTTP error
    statuses are returned, not raised, so the retry policy can
    classify them; connection-level failures propagate as OSError
    (urllib's URLError subclasses it), which the policy retries."""
    import urllib.error
    import urllib.request

    method, url, headers, body = request
    req = urllib.request.Request(
        url, data=body.encode() if body is not None else None, method=method
    )
    for k, v in headers.items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req) as resp:  # noqa: S310 — cfg-provided URL
            return (
                resp.status,
                resp.read().decode("utf-8", "replace"),
                dict(resp.headers),
            )
    except urllib.error.HTTPError as exc:
        return exc.code, exc.read().decode("utf-8", "replace"), dict(exc.headers)


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
    policy: RetryPolicy | None = None,
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
    send_records(cfg, upserts, "index", transport, policy)
    send_records(cfg, deletes, "delete", transport, policy)


def write_dataframe(
    df: DataFrame,
    cfg: EsSinkConfig,
    transport_factory: Callable[[], Transport] = lambda: urllib_transport,
    retry_policy: RetryPolicy | None = None,
) -> None:
    """Upsert every row of ``df`` (id taken from ``cfg.id_key`` column).

    Executor-parallel: one connection + chunked bulk requests per
    partition, with per-chunk retry (see ``RetryPolicy``).
    """
    df.foreachPartition(
        lambda rows: _send_partition(rows, cfg, None, transport_factory, retry_policy)
    )


def write_cdc_dataframe(
    df: DataFrame,
    cfg: EsSinkConfig,
    op_col: str = "op",
    seq_col: str | None = "seq",
    transport_factory: Callable[[], Transport] = lambda: urllib_transport,
    retry_policy: RetryPolicy | None = None,
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
        lambda rows: _send_partition(rows, cfg, op_col, transport_factory, retry_policy)
    )
