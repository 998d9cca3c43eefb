"""Sink connectors.

The reference ships one sink — Elasticsearch upsert/delete over async
HTTP (``ElasticsearchUtils.java``) — and *claims* a JDBC sink in its
README (``README.md:10``) without implementing it. Here both exist:

- ``elasticsearch``: K1–K6 semantics on ``foreachPartition`` — the
  batch unit is a partition (far larger than the reference's
  per-record calls), requests are chunked ``_bulk`` NDJSON.
- ``jdbc``: keyed upsert via per-dialect MERGE statements in
  ``foreachBatch`` — the honored README claim.

Both are driver-light: all I/O happens on executors; the driver never
sees row data.
"""

from graal_cdc_spark.sinks.elasticsearch import (
    EsRequest,
    EsSinkConfig,
    EsSinkError,
    RetryPolicy,
    bulk_body,
    requests_for,
    send_records,
    write_cdc_dataframe,
    write_dataframe,
)
from graal_cdc_spark.sinks.jdbc import JdbcSinkConfig, merge_statement, write_jdbc_batch

__all__ = [
    "EsRequest",
    "EsSinkConfig",
    "EsSinkError",
    "RetryPolicy",
    "bulk_body",
    "requests_for",
    "send_records",
    "write_dataframe",
    "write_cdc_dataframe",
    "JdbcSinkConfig",
    "merge_statement",
    "write_jdbc_batch",
]
