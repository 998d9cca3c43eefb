"""The reference's event filter chain, as composable DataFrame filters.

Re-expresses filters F3–F7 of
``DebeziumEngineRecordHandler.java:154-176`` (see SURVEY.md §2.1):

- F3 tombstone filter       (``:156-159``): drop NULL values
- F4 malformed filter       (``:160-163``): drop events without a payload
- F5 DDL filter             (``:164-167``): drop schema-change events
- F6 op-code predicate      (``:168-172``): keep op ∈ {c,u,d,r}
- F7 after-key presence     (``:173-176``): key *presence*, so delete
  events (``op='d'`` with ``"after": null``) pass — semantics preserved
  exactly (SURVEY.md §2.3.1).

All filters are plain Catalyst predicates over a string ``value``
column — they stay JVM-side inside whole-stage codegen and are pushed
down by Catalyst wherever the source supports it. No Python in the hot
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROW_OPS: tuple[str, ...] = ("c", "u", "d", "r")


def _payload(value: Column) -> Column:
    return F.get_json_object(value, "$.payload")


def drop_tombstones(df: DataFrame, value_col: str = "value") -> DataFrame:
    """F3 — ``record.value() == null → drop``."""
    return df.filter(F.col(value_col).isNotNull())


def drop_malformed(df: DataFrame, value_col: str = "value") -> DataFrame:
    """F4 — events without a ``payload`` object are dropped."""
    return df.filter(_payload(F.col(value_col)).isNotNull())


def drop_ddl(df: DataFrame, value_col: str = "value") -> DataFrame:
    """F5 — events carrying a ``ddl`` key are schema changes; drop."""
    return df.filter(F.get_json_object(F.col(value_col), "$.payload.ddl").isNull())


def drop_non_row_ops(df: DataFrame, value_col: str = "value") -> DataFrame:
    """F6 — keep only row-level ops c/u/d/r."""
    return df.filter(
        F.get_json_object(F.col(value_col), "$.payload.op").isin(*ROW_OPS)
    )


def require_after_key(df: DataFrame, value_col: str = "value") -> DataFrame:
    """F7 — require the ``after`` JSON *key* to be present.

    ``get_json_object`` cannot distinguish a JSON ``null`` value from a
    missing key, so the faithful formulation is a substring test on the
    raw envelope — cheap, codegen'd, and exact for conforming envelopes.
    """
    return df.filter(F.col(value_col).like('%"after"%'))


def row_event_filter_chain(df: DataFrame, value_col: str = "value") -> DataFrame:
    """F3→F4→F5→F6→F7 in the reference's order (SURVEY.md §2.3.1)."""
    df = drop_tombstones(df, value_col)
    df = drop_malformed(df, value_col)
    df = drop_ddl(df, value_col)
    df = drop_non_row_ops(df, value_col)
    df = require_after_key(df, value_col)
    return df


def reject_reason(value_col: str = "value") -> Column:
    """Dead-letter classification: the FIRST filter of the F3→F7 chain
    a record fails, or NULL if it passes. Same predicates in the same
    order as ``row_event_filter_chain`` — a record is rejected for
    exactly the reason the chain would drop it, so
    ``df.filter(reject_reason().isNotNull())`` is the precise
    complement of the accepted stream."""
    v = F.col(value_col)
    return (
        F.when(v.isNull(), F.lit("tombstone"))                    # F3
        .when(_payload(v).isNull(), F.lit("malformed"))           # F4
        .when(
            F.get_json_object(v, "$.payload.ddl").isNotNull(),
            F.lit("ddl"),                                         # F5
        )
        .when(
            ~F.get_json_object(v, "$.payload.op").isin(*ROW_OPS)
            | F.get_json_object(v, "$.payload.op").isNull(),
            F.lit("non_row_op"),                                  # F6
        )
        .when(~v.like('%"after"%'), F.lit("missing_after"))       # F7
        .otherwise(F.lit(None).cast("string"))
    )


def split_dead_letters(
    df: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """(accepted, rejected-with-reason): the production form of the
    filter chain — rejects are ROUTED, not silently dropped, so a
    malformed burst is inspectable and replayable after a producer
    fix. The reference hard-drops at each filter
    (``DebeziumEngineRecordHandler.java:154-176``); a DLQ is what an
    operator actually needs at 100 TB ingest."""
    reason = reject_reason(value_col)
    accepted = df.filter(reason.isNull())
    rejected = df.withColumn("reject_reason", reason).filter(
        F.col("reject_reason").isNotNull()
    )
    return accepted, rejected
