"""C01–C07 — CDC envelope queries (SURVEY.md §2.4).

These exercise the reference's entire data plane in batch form: the
F3–F7 filter chain, envelope projection (P1), db/table routing
(Q4/F1/F2), and latest-by-key compaction (Q3 order + K1–K4 upsert
semantics). Reference: ``DebeziumEngineRecordHandler.java:154-184``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graal_cdc_spark.cdc.compaction import latest_by_key
from graal_cdc_spark.cdc.envelope import (
    build_cdc_events,
    cdc_events_cte,
    cdc_parsed_cte,
    parsed_envelope,
)
from graal_cdc_spark.cdc.filters import drop_ddl, drop_malformed, drop_tombstones
from graal_cdc_spark.queries import QuerySpec, register
from graal_cdc_spark.session import configure
from graal_cdc_spark.sources.tables import ordered_result


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    return parsed_envelope(spark, sf_dir)


def _c01(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    df = build_cdc_events(spark, sf_dir)
    df = drop_malformed(drop_tombstones(df))
    return df.agg(F.count(F.lit(1)).alias("cnt"))


register(
    QuerySpec(
        name="c01_tombstone_malformed_filter",
        category="cdc",
        description="F3 tombstone + F4 malformed-envelope filters",
        spark=_c01,
        oracle=cdc_events_cte()
        + """
SELECT CAST(count(*) AS BIGINT) AS cnt
FROM cdc_events
WHERE value IS NOT NULL
  AND json_extract(value, '$.payload') IS NOT NULL
""",
        reference="DebeziumEngineRecordHandler.java:156-163",
    )
)


def _c02(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    df = drop_ddl(build_cdc_events(spark, sf_dir))
    return df.agg(F.count(F.lit(1)).alias("cnt"))


register(
    QuerySpec(
        name="c02_ddl_filter",
        category="cdc",
        description="F5 DDL/schema-change filter",
        spark=_c02,
        oracle=cdc_events_cte()
        + """
SELECT CAST(count(*) AS BIGINT) AS cnt
FROM cdc_events
WHERE json_extract(value, '$.payload.ddl') IS NULL
""",
        reference="DebeziumEngineRecordHandler.java:164-167",
    )
)


def _c03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        ordered_result(_parsed(spark, sf_dir)
        .groupBy("op")
        .agg(F.count(F.lit(1)).alias("c")), "op")
    )


register(
    QuerySpec(
        name="c03_opcode_predicate",
        category="cdc",
        description="F6 op-code predicate + count by op",
        spark=_c03,
        oracle=cdc_parsed_cte()
        + """
SELECT op, CAST(count(*) AS BIGINT) AS c
FROM cdc_parsed
WHERE op IN ('c','u','d','r')
GROUP BY op ORDER BY op
""",
        reference="DebeziumEngineRecordHandler.java:168-172",
    )
)


def _c04(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _parsed(spark, sf_dir)
        .select("db", "tbl", "op", "event_id")
        .orderBy("event_id")
        .limit(100)
    )


register(
    QuerySpec(
        name="c04_envelope_projection",
        category="cdc",
        description="P1 envelope field projection",
        spark=_c04,
        oracle=cdc_parsed_cte()
        + """
SELECT db, tbl, op, event_id
FROM cdc_parsed
ORDER BY event_id
LIMIT 100
""",
        reference="DebeziumEngineRecordHandler.java:160,168,177-179",
    )
)


def _c05(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _parsed(spark, sf_dir)
        .filter((F.col("db") == "appdb") & F.col("tbl").isin("users", "orders"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


register(
    QuerySpec(
        name="c05_db_table_routing",
        category="cdc",
        description="Q4/F1/F2 per-pipeline db/table routing",
        spark=_c05,
        oracle=cdc_parsed_cte()
        + """
SELECT CAST(count(*) AS BIGINT) AS cnt
FROM cdc_parsed
WHERE db = 'appdb' AND tbl IN ('users','orders')
""",
        reference="DebeziumEngineManager.java:71-90; DebeziumEngineRecordHandler.java:61-69",
    )
)


def _c06(spark: SparkSession, sf_dir: str) -> DataFrame:
    latest = latest_by_key(_parsed(spark, sf_dir), ["key"], "seq")
    return (
        ordered_result(latest.filter(F.col("op") != "d").select("key", "op", "seq"), "key")
    )


register(
    QuerySpec(
        name="c06_latest_by_key_compaction",
        category="cdc",
        description="Q3 ordered replay + K1/K2 upsert → latest-by-key materialization",
        spark=_c06,
        oracle=cdc_parsed_cte()
        + """
SELECT key, op, seq
FROM (
  SELECT key, op, seq,
         row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM cdc_parsed
) t
WHERE rn = 1 AND op <> 'd'
ORDER BY key
""",
        reference="DebeziumEngineRecordHandler.java:97-148; ElasticsearchUtils.java:145-152",
    )
)


def _c07(spark: SparkSession, sf_dir: str) -> DataFrame:
    latest = latest_by_key(_parsed(spark, sf_dir), ["key"], "seq")
    return latest.filter(F.col("op") == "d").agg(F.count(F.lit(1)).alias("cnt"))


register(
    QuerySpec(
        name="c07_delete_propagation",
        category="cdc",
        description="K3/K4 delete propagation — keys whose final op is a delete",
        spark=_c07,
        oracle=cdc_parsed_cte()
        + """
SELECT CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT key, op,
         row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM cdc_parsed
) t
WHERE rn = 1 AND op = 'd'
""",
        reference="ElasticsearchUtils.java:156-176",
    )
)


def _c08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history: every non-delete event becomes a version row
    whose validity interval is [its seq, the key's next event seq); the
    open-ended version is current. A trailing delete closes the last
    version, so such keys have no current row — the history twin of
    C06/C07's latest-state materialization.

    Scale: one shuffle on ``key`` shared by the window; no join — the
    closing boundary comes from ``lead`` over the same pass.
    """
    w = Window.partitionBy("key").orderBy("seq")
    return (
        ordered_result(_parsed(spark, sf_dir)
        .withColumn("valid_to_seq", F.lead("seq").over(w))
        .filter(F.col("op") != "d")
        .select(
            "key",
            F.col("seq").alias("valid_from_seq"),
            "valid_to_seq",
            "op",
            F.when(F.col("valid_to_seq").isNull(), 1).otherwise(0).alias("is_current"),
        ), "key", "valid_from_seq")
    )


register(
    QuerySpec(
        name="c08_scd2_history",
        category="cdc",
        description="SCD Type-2 version history from the CDC log (Q3 replay as intervals)",
        spark=_c08,
        oracle=cdc_parsed_cte()
        + """
SELECT key, seq AS valid_from_seq, valid_to_seq, op,
       CAST(CASE WHEN valid_to_seq IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM (
  SELECT key, seq, op,
         lead(seq) OVER (PARTITION BY key ORDER BY seq) AS valid_to_seq
  FROM cdc_parsed
) t
WHERE op <> 'd'
ORDER BY key, valid_from_seq
""",
        reference="DebeziumEngineRecordHandler.java:130-146",
    )
)


def _c09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed value extraction from the CDC payload: pull ``after.value``
    out of the envelope JSON, cast to decimal, aggregate per routed
    table — the "consume the change payload" half of the reference's
    script pipeline (the JS handler reads record fields the same way).

    Scale: get_json_object is a codegen'd JSON path over the already-
    filtered stream; the aggregate is partial map-side, one shuffle of
    O(tables) rows.
    """
    return (
        ordered_result(_parsed(spark, sf_dir)
        .filter(F.col("op").isin("c", "u"))
        .withColumn(
            "val",
            F.get_json_object("after_json", "$.value").cast("decimal(18,2)"),
        )
        .groupBy("tbl")
        .agg(
            F.sum("val").cast("string").alias("total_value"),
            F.count(F.lit(1)).alias("n_rows"),
        ), "tbl")
    )


register(
    QuerySpec(
        name="c09_payload_value_extraction",
        category="cdc",
        description="typed after.value extraction + per-table decimal totals",
        spark=_c09,
        oracle=cdc_events_cte()
        + """,
vals AS (
  SELECT json_extract_string(value, '$.payload.source.table') AS tbl,
         CAST(json_extract_string(value, '$.payload.after.value')
              AS DECIMAL(18,2)) AS val
  FROM cdc_events
  WHERE value IS NOT NULL
    AND json_extract(value, '$.payload') IS NOT NULL
    AND json_extract(value, '$.payload.ddl') IS NULL
    AND json_extract_string(value, '$.payload.op') IN ('c','u')
    AND value LIKE '%"after"%'
)
SELECT tbl, CAST(SUM(val) AS VARCHAR) AS total_value,
       CAST(count(*) AS BIGINT) AS n_rows
FROM vals
GROUP BY tbl
ORDER BY tbl
""",
        reference="ScriptExecutor.java (script reads payload fields); DebeziumEngineRecordHandler.java:154-179",
    )
)


def _c10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time state reconstruction (time travel): replay the
    log only up to a sequence horizon (here max(seq)/2) and compact —
    the "state as of S" read that a CDC-materialized table supports
    for free because the log is totally ordered by seq (Q3).

    Scale: the horizon is an uncorrelated scalar subquery — Catalyst
    runs it once as a separate tiny stage and injects the value into
    the filter (no join of any kind on the big side; an earlier
    formulation cross-joined a broadcast 1-row horizon, which planned
    as a BroadcastNestedLoopJoin and tripped the plan audit). The
    compaction is the same single key-window shuffle as C06, over the
    seq-pruned scan.
    """
    _parsed(spark, sf_dir).createOrReplaceTempView("cdc_parsed_c10")
    return spark.sql(
        """
        SELECT key, op, seq FROM (
          SELECT key, op, seq,
                 row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
          FROM cdc_parsed_c10
          WHERE seq <= (SELECT CAST(floor(max(seq) / 2) AS BIGINT)
                        FROM cdc_parsed_c10)
        ) t
        WHERE rn = 1 AND op <> 'd'
        ORDER BY key
        """
    )


register(
    QuerySpec(
        name="c10_point_in_time_state",
        category="cdc",
        description="state as of a seq horizon: bounded replay + compaction (time travel)",
        spark=_c10,
        oracle=cdc_parsed_cte()
        + """
SELECT key, op, seq FROM (
  SELECT key, op, seq,
         row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM cdc_parsed
  WHERE seq <= (SELECT CAST(floor(max(seq) / 2) AS BIGINT) FROM cdc_parsed)
) t
WHERE rn = 1 AND op <> 'd'
ORDER BY key
""",
        reference="DebeziumEngineRecordHandler.java:97-148 (ordered replay cursor)",
    )
)


def _c11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate view over the CDC state: per routed
    table, SUM(after.value) and row count of the LIVE rows (latest per
    key, deletes applied) — the batch twin of the incrementally
    maintained aggregate (``streaming.incremental.IncrementalAggSink``,
    delta-maintained per micro-batch without rescanning state; the
    equivalence is asserted in tests/test_streaming.py).

    Scale: compaction is the single key shuffle of C06; the aggregate
    on top is partial map-side, one O(tables) shuffle.
    """
    from graal_cdc_spark.cdc.compaction import compact_cdc

    live = compact_cdc(_parsed(spark, sf_dir))
    return (
        ordered_result(live.withColumn(
            "val",
            F.get_json_object("after_json", "$.value").cast("decimal(18,2)"),
        )
        .groupBy("tbl")
        .agg(
            F.sum("val").cast("string").alias("live_total"),
            F.count(F.lit(1)).alias("n_live"),
        ), "tbl")
    )


register(
    QuerySpec(
        name="c11_incremental_aggregate",
        category="cdc",
        description="materialized per-table aggregate over live CDC state "
        "(batch twin of the delta-maintained streaming aggregate)",
        spark=_c11,
        oracle=cdc_events_cte()
        + """,
rows_ AS (
  SELECT seq, key,
         json_extract_string(value, '$.payload.op') AS op,
         json_extract_string(value, '$.payload.source.table') AS tbl,
         CAST(json_extract_string(value, '$.payload.after.value')
              AS DECIMAL(18,2)) AS val
  FROM cdc_events
  WHERE value IS NOT NULL
    AND json_extract(value, '$.payload') IS NOT NULL
    AND json_extract(value, '$.payload.ddl') IS NULL
    AND json_extract_string(value, '$.payload.op') IN ('c','u','d','r')
    AND value LIKE '%"after"%'
),
live AS (
  SELECT tbl, val FROM (
    SELECT tbl, val, op,
           row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM rows_
  ) t
  WHERE rn = 1 AND op <> 'd'
)
SELECT tbl, CAST(SUM(val) AS VARCHAR) AS live_total,
       CAST(count(*) AS BIGINT) AS n_live
FROM live GROUP BY tbl ORDER BY tbl
""",
        reference="ElasticsearchUtils.java:131-177 (record-at-a-time upserts "
        "this generalizes); DebeziumEngineRecordHandler.java:120-121",
    )
)


def _c12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot ↔ log reconciliation: the control-plane check a CDC
    deployment runs to prove the replicated state converged. The
    "stale snapshot" is the latest-by-key state as of a log cutoff
    (event_id < 500); reconciling it against the full log's state
    classifies every key as unchanged / updated / added / deleted.

    The reference trusts at-least-once replay and never validates
    sink state (SURVEY.md §2.3); this operator is the missing audit.

    Scale: both states reduce to one row per key BEFORE the full
    outer join, which shuffles on ``key`` — the same partitioning the
    compaction already produced, so Catalyst reuses the exchange.
    The output is O(distinct keys), aggregated to class counts.
    """
    parsed = _parsed(spark, sf_dir)
    full = latest_by_key(parsed, ["key"], "seq").select(
        F.col("key"), F.col("op").alias("f_op"), F.col("seq").alias("f_seq")
    )
    stale = latest_by_key(parsed.filter(F.col("event_id") < 500), ["key"], "seq").select(
        F.col("key"), F.col("op").alias("s_op"), F.col("seq").alias("s_seq")
    )
    f_alive = (F.col("f_op").isNotNull()) & (F.col("f_op") != "d")
    s_alive = (F.col("s_op").isNotNull()) & (F.col("s_op") != "d")
    cls = (
        F.when(f_alive & ~s_alive, F.lit("added"))
        .when(~f_alive & s_alive, F.lit("deleted"))
        .when(f_alive & s_alive & (F.col("f_seq") != F.col("s_seq")), F.lit("updated"))
        .when(f_alive & s_alive, F.lit("unchanged"))
        .otherwise(F.lit("both_absent"))
    )
    return (
        ordered_result(full.join(stale, "key", "full_outer")
        .select(cls.alias("change_class"))
        .groupBy("change_class")
        .agg(F.count(F.lit(1)).alias("n")), "change_class")
    )


register(
    QuerySpec(
        name="c12_snapshot_reconciliation",
        category="cdc",
        description="full-log vs stale-snapshot state diff → change-class counts",
        spark=_c12,
        oracle=cdc_parsed_cte()
        + """
, full_state AS (
  SELECT key, op AS f_op, seq AS f_seq FROM (
    SELECT key, op, seq,
           row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM cdc_parsed
  ) WHERE rn = 1
), stale_state AS (
  SELECT key, op AS s_op, seq AS s_seq FROM (
    SELECT key, op, seq,
           row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM cdc_parsed WHERE event_id < 500
  ) WHERE rn = 1
)
SELECT change_class, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT CASE
    WHEN (f_op IS NOT NULL AND f_op <> 'd')
     AND NOT (s_op IS NOT NULL AND s_op <> 'd') THEN 'added'
    WHEN NOT (f_op IS NOT NULL AND f_op <> 'd')
     AND (s_op IS NOT NULL AND s_op <> 'd') THEN 'deleted'
    WHEN (f_op IS NOT NULL AND f_op <> 'd')
     AND (s_op IS NOT NULL AND s_op <> 'd')
     AND f_seq <> s_seq THEN 'updated'
    WHEN (f_op IS NOT NULL AND f_op <> 'd')
     AND (s_op IS NOT NULL AND s_op <> 'd') THEN 'unchanged'
    ELSE 'both_absent' END AS change_class
  FROM full_state FULL OUTER JOIN stale_state USING (key)
)
GROUP BY change_class ORDER BY change_class
""",
        reference="SURVEY.md §2.3 (audit extension); ElasticsearchUtils.java:145-176",
    )
)


def _c13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift audit: per (table, field) presence counts over the
    live row images. Debezium envelopes are schemaless JSON
    (``schemas.enable=false``, DebeziumEngineManager.java:68-69), so
    a column added/dropped upstream shows up only as keys appearing/
    vanishing in ``after`` — this query is the monitoring view that
    catches it. The row image parses once into a map; keys explode
    and pre-aggregate map-side before the one (tbl, field) shuffle.
    """
    parsed = _parsed(spark, sf_dir)
    fields = parsed.filter(F.col("op") != "d").select(
        "tbl",
        F.explode(
            F.map_keys(F.from_json("after_json", "map<string,string>"))
        ).alias("field"),
    )
    return (
        ordered_result(fields.groupBy("tbl", "field")
        .agg(F.count(F.lit(1)).alias("n_present")), "tbl", "field")
    )


register(
    QuerySpec(
        name="c13_schema_drift_field_stats",
        category="cdc",
        description="schema-drift audit: per-(table, field) presence "
        "counts over live row images",
        spark=_c13,
        oracle=cdc_parsed_cte()
        + """
, after_rows AS (
  SELECT c.tbl, json_extract(e.value, '$.payload.after') AS after_j
  FROM cdc_parsed c JOIN cdc_events e USING (seq)
  WHERE c.op <> 'd'
)
SELECT tbl, field, CAST(count(*) AS BIGINT) AS n_present
FROM (
  SELECT tbl, unnest(json_keys(after_j)) AS field FROM after_rows
)
GROUP BY tbl, field ORDER BY tbl, field
""",
        reference="DebeziumEngineManager.java:68-69 (schemaless envelopes); SURVEY.md §1.2",
    )
)


def _c14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changed-columns audit: for each consecutive pair of row images
    of the same key (``lag(after) OVER (PARTITION BY key ORDER BY
    seq)``), which fields changed — the per-(table, field) update-heat
    view a CDC consumer uses to pick indexed/merge columns. The
    envelope's ``before`` is always null (FIXTURES.md), so the diff is
    computed from the log itself. Values compare as raw JSON literals
    WITHIN each engine (prev vs cur extracted the same way), so the
    changed/unchanged verdict is engine-portable even where the two
    engines render literals differently.

    Scale: the lag window partitions by the high-cardinality CDC key
    (many small partitions — scale-safe); the field explode
    pre-aggregates map-side before the one (tbl, field) shuffle.
    Reference: DebeziumEngineRecordHandler.java:160-179 (row-image
    envelopes); SURVEY.md §2.3 audit extension.
    """
    parsed = _parsed(spark, sf_dir).filter(F.col("op") != "d")
    w = Window.partitionBy("key").orderBy("seq")
    imgs = (
        parsed.select("tbl", "key", "seq", "after_json")
        .withColumn("prev_json", F.lag("after_json").over(w))
        .filter(F.col("prev_json").isNotNull())
    )
    cm = F.from_json("after_json", "map<string,string>")
    pm = F.from_json("prev_json", "map<string,string>")
    pairs = imgs.select("tbl", cm.alias("cm"), pm.alias("pm"))
    fields = pairs.select(
        "tbl",
        "cm",
        "pm",
        F.explode(
            F.array_union(F.map_keys("cm"), F.map_keys("pm"))
        ).alias("field"),
    )
    changed = fields.filter(
        ~(
            F.element_at("cm", F.col("field")).eqNullSafe(
                F.element_at("pm", F.col("field"))
            )
        )
    )
    return (
        ordered_result(changed.groupBy("tbl", "field")
        .agg(F.count(F.lit(1)).alias("n_changed")), "tbl", "field")
    )


register(
    QuerySpec(
        name="c14_changed_columns_audit",
        category="cdc",
        description="per-(table, field) changed-value counts between "
        "consecutive row images of the same key",
        spark=_c14,
        oracle=cdc_parsed_cte()
        + """
, imgs AS (
  SELECT c.tbl, c.key, c.seq,
         json_extract(e.value, '$.payload.after') AS aj,
         lag(json_extract(e.value, '$.payload.after')) OVER (
           PARTITION BY c.key ORDER BY c.seq) AS pj
  FROM cdc_parsed c JOIN cdc_events e USING (seq)
  WHERE c.op <> 'd'
)
SELECT tbl, field, CAST(count(*) AS BIGINT) AS n_changed
FROM (
  SELECT tbl, aj, pj,
         unnest(list_distinct(json_keys(aj) || json_keys(pj))) AS field
  FROM imgs WHERE pj IS NOT NULL
)
WHERE json_extract_string(aj, '$.' || field)
      IS DISTINCT FROM json_extract_string(pj, '$.' || field)
GROUP BY tbl, field ORDER BY tbl, field
""",
        reference="DebeziumEngineRecordHandler.java:160-179 (row images); SURVEY.md §2.3",
    )
)


def _c15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-rate spike detection: hours where a table's event count
    exceeds 2x its trailing-3-hour average — the ops-side monitor that
    catches runaway writers / replication storms in a CDC feed. The
    2x-average comparison is INTEGER-EXACT (3*count > 2*trailing_sum
    avoids fractional averages entirely). The hourly pre-aggregate
    reduces the log before the per-table lag window (O(tables x
    hours) rows — window input is the aggregate, never the log).
    Reference: DebeziumEngineRecordHandler.java:130-146 (per-event
    handling with no rate monitoring); SURVEY.md §2.3 ops extension.
    """
    parsed = _parsed(spark, sf_dir)
    hourly = (
        parsed.withColumn("hour", F.expr("seq DIV 600"))
        .groupBy("tbl", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("tbl").orderBy("hour").rowsBetween(-3, -1)
    trailing = hourly.withColumn("t_sum", F.sum("n").over(w)).withColumn(
        "t_cnt", F.count("n").over(w)
    )
    return (
        ordered_result(trailing.filter(
            (F.col("t_cnt") == 3) & (F.col("n") * 3 > F.col("t_sum") * 2)
        )
        .select("tbl", "hour", "n", F.col("t_sum").alias("trailing_sum")), "tbl", "hour")
    )


register(
    QuerySpec(
        name="c15_change_rate_spikes",
        category="cdc",
        description="hours where a table's CDC event rate exceeds 2x "
        "its trailing-3-hour average (integer-exact comparison)",
        spark=_c15,
        oracle=cdc_parsed_cte()
        + """
, trail_src AS (
  SELECT tbl, seq // 600 AS hour, CAST(count(*) AS BIGINT) AS n
  FROM cdc_parsed GROUP BY 1, 2
),
trail AS (
  SELECT tbl, hour, n,
         SUM(n) OVER (PARTITION BY tbl ORDER BY hour
                      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS t_sum,
         COUNT(n) OVER (PARTITION BY tbl ORDER BY hour
                        ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS t_cnt
  FROM trail_src
)
SELECT tbl, hour, n, CAST(t_sum AS BIGINT) AS trailing_sum
FROM trail WHERE t_cnt = 3 AND n * 3 > t_sum * 2
ORDER BY tbl, hour
""",
        reference="DebeziumEngineRecordHandler.java:130-146; SURVEY.md §2.3",
    )
)


def _c16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-churn profile: per routed table, how volatile its keys are —
    version counts, lifespan in log-sequence units, and a churn class
    (hot >= 5 versions, warm >= 2, cold = 1). One hash aggregate per
    key (high-cardinality, even shuffle) then a tiny per-(table,
    class) rollup — the capacity-planning view for state sizing in a
    compaction/materialization consumer.
    Reference: SURVEY.md §2.3 (Q3 per-key replay semantics).
    """
    parsed = _parsed(spark, sf_dir)
    per_key = parsed.groupBy("tbl", "key").agg(
        F.count(F.lit(1)).alias("n_versions"),
        (F.max("seq") - F.min("seq")).alias("lifespan"),
    )
    churn = F.when(F.col("n_versions") >= 5, "hot").otherwise(
        F.when(F.col("n_versions") >= 2, "warm").otherwise("cold")
    )
    return (
        ordered_result(per_key.withColumn("churn", churn)
        .groupBy("tbl", "churn")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_versions").alias("n_events"),
            F.max("lifespan").alias("max_lifespan"),
        ), "tbl", "churn")
    )


register(
    QuerySpec(
        name="c16_key_churn_profile",
        category="cdc",
        description="per-(table, churn-class) key volatility rollup "
        "(hot/warm/cold by version count, lifespan in seq units)",
        spark=_c16,
        oracle=cdc_parsed_cte()
        + """
, per_key AS (
  SELECT tbl, key,
         CAST(count(*) AS BIGINT) AS n_versions,
         CAST(max(seq) - min(seq) AS BIGINT) AS lifespan
  FROM cdc_parsed GROUP BY tbl, key
)
SELECT tbl,
       CASE WHEN n_versions >= 5 THEN 'hot'
            WHEN n_versions >= 2 THEN 'warm'
            ELSE 'cold' END AS churn,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(SUM(n_versions) AS BIGINT) AS n_events,
       CAST(max(lifespan) AS BIGINT) AS max_lifespan
FROM per_key
GROUP BY 1, 2 ORDER BY tbl, churn
""",
        reference="SURVEY.md §2.3 (Q3 per-key replay; state sizing)",
    )
)


def _c17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-continuity audit: per routed table, adjacent-seq deltas over
    the filtered CDC log — the monitor that catches dropped/lost events
    (a delta far above the injected-noise spacing means a hole in the
    feed). SCALE SHAPE: a naive lag() window PARTITION BY tbl sorts the
    whole log inside 2 tasks; instead deltas decompose into
    fixed-width seq bands — within-band lag windows (bounded band
    population) plus one tiny window over per-band min/max rows for the
    band-boundary deltas (O(bands) rows). Same two-level decomposition
    as l40/r64; the oracle states the naive single-window semantics.
    Reference: DebeziumEngineRecordHandler.java:130-146 (per-event
    dispatch has no continuity checking); SURVEY.md §2.3 ops extension.
    """
    band = 4096
    parsed = _parsed(spark, sf_dir).select("tbl", "seq")
    banded = parsed.withColumn("band", F.expr(f"seq DIV {band}"))

    w_in = Window.partitionBy("tbl", "band").orderBy("seq")
    inner = banded.withColumn(
        "delta", F.col("seq") - F.lag("seq").over(w_in)
    ).filter(F.col("delta").isNotNull())

    bands = banded.groupBy("tbl", "band").agg(
        F.min("seq").alias("bmin"), F.max("seq").alias("bmax")
    )
    w_b = Window.partitionBy("tbl").orderBy("band")
    cross = bands.withColumn(
        "delta", F.col("bmin") - F.lag("bmax").over(w_b)
    ).filter(F.col("delta").isNotNull())

    deltas = inner.select("tbl", "delta").unionByName(
        cross.select("tbl", "delta")
    )
    return (
        ordered_result(deltas.groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_deltas"),
            F.sum(F.when(F.col("delta") > 10, 1).otherwise(0)).alias(
                "n_gaps"
            ),
            F.max("delta").alias("max_gap"),
            F.sum("delta").alias("span"),
        ), "tbl")
    )


register(
    QuerySpec(
        name="c17_seq_gap_audit",
        category="cdc",
        description="per-table adjacent-seq delta audit (lost-event "
        "detection): gap counts over threshold, max gap, covered span",
        spark=_c17,
        oracle=cdc_parsed_cte()
        + """
, d AS (
  SELECT tbl,
         seq - lag(seq) OVER (PARTITION BY tbl ORDER BY seq) AS delta
  FROM cdc_parsed
)
SELECT tbl,
       CAST(count(delta) AS BIGINT) AS n_deltas,
       CAST(count(*) FILTER (WHERE delta > 10) AS BIGINT) AS n_gaps,
       CAST(max(delta) AS BIGINT) AS max_gap,
       CAST(SUM(delta) AS BIGINT) AS span
FROM d WHERE delta IS NOT NULL
GROUP BY tbl ORDER BY tbl
""",
        reference="DebeziumEngineRecordHandler.java:130-146; SURVEY.md §2.3",
    )
)


def _c18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op-sequence validity audit: per routed table, counts of ILLEGAL
    per-key op transitions in the log — an update or delete of a key
    that is currently deleted ('d'→'u', 'd'→'d'), or a create of a
    key that is currently live ('c'→'c') — the log-integrity monitor
    that catches producer bugs and reordering faults before a
    consumer materializes garbage. The lag window partitions on the
    high-cardinality key (bounded rows per key — the safe window
    shape); output is O(tables × transition kinds).
    Reference: SURVEY.md §2.3 (Q3 per-key order is what makes these
    transitions well-defined).
    """
    parsed = _parsed(spark, sf_dir)
    w = Window.partitionBy("key").orderBy("seq")
    trans = parsed.select(
        "tbl",
        "op",
        F.lag("op").over(w).alias("prev_op"),
    ).filter(F.col("prev_op").isNotNull())
    illegal = (
        ((F.col("prev_op") == "d") & F.col("op").isin("u", "d"))
        | ((F.col("prev_op") == "c") & (F.col("op") == "c"))
    )
    return (
        ordered_result(trans.filter(illegal)
        .groupBy("tbl", "prev_op", "op")
        .agg(F.count(F.lit(1)).alias("n")), "tbl", "prev_op", "op")
    )


register(
    QuerySpec(
        name="c18_op_transition_audit",
        category="cdc",
        description="illegal per-key op transitions per table "
        "(update/delete of a deleted key, create of a live key)",
        spark=_c18,
        oracle=cdc_parsed_cte()
        + """
, trans AS (
  SELECT tbl, op,
         lag(op) OVER (PARTITION BY key ORDER BY seq) AS prev_op
  FROM cdc_parsed
)
SELECT tbl, prev_op, op, CAST(count(*) AS BIGINT) AS n
FROM trans
WHERE prev_op IS NOT NULL
  AND ((prev_op = 'd' AND op IN ('u', 'd'))
       OR (prev_op = 'c' AND op = 'c'))
GROUP BY tbl, prev_op, op
ORDER BY tbl, prev_op, op
""",
        reference="SURVEY.md §2.3 (per-key replay order); "
        "DebeziumEngineRecordHandler.java:168-172 (op codes)",
    )
)


def _c19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before-image reconstruction + net value drift: the synthetic
    envelope (like many Debezium setups with ``REPLICA IDENTITY
    DEFAULT``) carries ``before: null``, so the previous row image must
    be RECONSTRUCTED from the per-key log — lag(after.value) over the
    Q3 replay order. For every update whose predecessor carries a
    value, the per-table net drift sum(after - prev_after) is the
    consistency signal a reconciliation monitor alarms on.

    Scale: one lag window partitioned on the high-cardinality key,
    one typed JSON path, then a map-side partial aggregate to
    O(tables) rows.
    Reference: SURVEY.md §2.3 (per-key replay order);
    DebeziumEngineRecordHandler.java:168-179 (after-image handling).
    """
    parsed = _parsed(spark, sf_dir)
    w = Window.partitionBy("key").orderBy("seq")
    vals = parsed.withColumn(
        "val",
        F.get_json_object("after_json", "$.value").cast("decimal(18,2)"),
    ).select(
        "tbl", "op", "val", F.lag("val").over(w).alias("prev_val")
    )
    upd = vals.filter(
        (F.col("op") == "u")
        & F.col("val").isNotNull()
        & F.col("prev_val").isNotNull()
    )
    return (
        ordered_result(upd.groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_updates"),
            F.sum(F.col("val") - F.col("prev_val"))
            .cast("string")
            .alias("net_drift"),
        ), "tbl")
    )


register(
    QuerySpec(
        name="c19_before_image_drift",
        category="cdc",
        description="reconstructed before-image value drift per table "
        "(lag over per-key replay order; REPLICA IDENTITY DEFAULT "
        "compensation)",
        spark=_c19,
        oracle=cdc_events_cte()
        + """,
parsed_vals AS (
  SELECT CAST(floor(seq / 10) AS BIGINT) AS event_id, seq, key,
         json_extract_string(value, '$.payload.op') AS op,
         json_extract_string(value, '$.payload.source.table') AS tbl,
         CAST(json_extract_string(value, '$.payload.after.value')
              AS DECIMAL(18,2)) AS val
  FROM cdc_events
  WHERE value IS NOT NULL
    AND json_extract(value, '$.payload') IS NOT NULL
    AND json_extract(value, '$.payload.ddl') IS NULL
    AND json_extract_string(value, '$.payload.op') IN ('c','u','d','r')
    AND value LIKE '%"after"%'
), lagged AS (
  SELECT tbl, op, val,
         lag(val) OVER (PARTITION BY key ORDER BY seq) AS prev_val
  FROM parsed_vals
)
SELECT tbl, CAST(count(*) AS BIGINT) AS n_updates,
       CAST(SUM(val - prev_val) AS VARCHAR) AS net_drift
FROM lagged
WHERE op = 'u' AND val IS NOT NULL AND prev_val IS NOT NULL
GROUP BY tbl ORDER BY tbl
""",
        reference="SURVEY.md §2.3 (Q3 replay order); "
        "DebeziumEngineRecordHandler.java:168-179",
    )
)


def _c20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan first-op audit: keys whose FIRST op in the log is an
    update or delete — rows with no creating event ('c') or snapshot
    read ('r') in the captured window. These are the keys a
    materializing consumer cannot fully reconstruct (the complement
    of c18's illegal TRANSITIONS: here the defect is a missing
    history head, not a bad step). Per (table, first-op) counts.

    Scale: first-row-per-key is a row_number over the per-key order
    (bounded rows per key), then O(tables x ops) output.
    Reference: SURVEY.md §2.3 (snapshot 'r' + log completeness).
    """
    parsed = _parsed(spark, sf_dir)
    w = Window.partitionBy("key").orderBy("seq")
    first = (
        parsed.select("tbl", "op", "key", "seq")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        ordered_result(first.filter(F.col("op").isin("u", "d"))
        .groupBy("tbl", "op")
        .agg(F.count(F.lit(1)).alias("n_orphan_keys")), "tbl", "op")
    )


register(
    QuerySpec(
        name="c20_orphan_first_op_audit",
        category="cdc",
        description="keys whose first logged op is 'u'/'d' (no create "
        "or snapshot head) per table — unreconstructable-state audit",
        spark=_c20,
        oracle=cdc_parsed_cte()
        + """
, firsts AS (
  SELECT tbl, op,
         row_number() OVER (PARTITION BY key ORDER BY seq) AS rn
  FROM cdc_parsed
)
SELECT tbl, op, CAST(count(*) AS BIGINT) AS n_orphan_keys
FROM firsts
WHERE rn = 1 AND op IN ('u', 'd')
GROUP BY tbl, op
ORDER BY tbl, op
""",
        reference="SURVEY.md §2.3 (snapshot/log completeness); "
        "DebeziumEngineManager.java:76-121 (snapshot bootstrap)",
    )
)


def _c21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-order inversion audit: within each key's replay order
    (by seq), count adjacent row-image pairs whose embedded event time
    (``after.ts``) goes BACKWARDS — the signal that the capture
    pipeline reordered commits (or the source clock jumped). ISO-8601
    strings compare lexicographically, so the check needs no timestamp
    parsing and is bit-portable across engines.

    Scale: one lag window on the high-cardinality key, O(tables)
    output. Reference: SURVEY.md §2.3 (Q3 replay order is the invariant
    being audited).
    """
    parsed = _parsed(spark, sf_dir)
    w = Window.partitionBy("key").orderBy("seq")
    lagged = parsed.select(
        "tbl",
        "key",
        "seq",
        F.get_json_object("after_json", "$.ts").alias("ts_iso"),
    ).withColumn("prev_iso", F.lag("ts_iso").over(w))
    pairs = lagged.filter(
        F.col("ts_iso").isNotNull() & F.col("prev_iso").isNotNull()
    )
    return (
        ordered_result(pairs.groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(F.col("prev_iso") > F.col("ts_iso"), 1).otherwise(0)
            ).alias("n_inversions"),
        )
        .withColumn("inv_bp", F.expr("10000 * n_inversions div n_pairs")), "tbl")
    )


register(
    QuerySpec(
        name="c21_capture_order_inversions",
        category="cdc",
        description="per-table event-time inversions within per-key "
        "replay order (capture reordering / clock-skew audit)",
        spark=_c21,
        oracle=cdc_events_cte()
        + """,
pv AS (
  SELECT seq, key,
         json_extract_string(value, '$.payload.source.table') AS tbl,
         json_extract_string(value, '$.payload.after.ts') AS ts_iso
  FROM cdc_events
  WHERE value IS NOT NULL
    AND json_extract(value, '$.payload') IS NOT NULL
    AND json_extract(value, '$.payload.ddl') IS NULL
    AND json_extract_string(value, '$.payload.op') IN ('c','u','d','r')
    AND value LIKE '%"after"%'
), lagged AS (
  SELECT tbl, ts_iso,
         lag(ts_iso) OVER (PARTITION BY key ORDER BY seq) AS prev_iso
  FROM pv
)
SELECT tbl, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN prev_iso > ts_iso THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inversions,
       CAST((10000 * SUM(CASE WHEN prev_iso > ts_iso THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS inv_bp
FROM lagged
WHERE ts_iso IS NOT NULL AND prev_iso IS NOT NULL
GROUP BY tbl ORDER BY tbl
""",
        reference="SURVEY.md §2.3 (Q3 replay-order invariant); "
        "DebeziumEngineRecordHandler.java:130-146",
    )
)


def _c22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope size census per (table, op): count, total bytes, and
    exact p50/p95 of the raw envelope byte size — the payload-bloat
    monitor an ops team watches (an unexpectedly fat table/op cell
    means schema drift, embedded blobs, or a runaway before-image).

    The percentiles run through the binned two-pass quantile operator
    (no full-group sort on the ~20-value (tbl, op) key — the r64/r88
    rule); the raw sizes come from ONE join of the parsed frame back
    to the envelope fixture on seq (parsing again would violate the
    one-parse hot-path rule).

    Scale: size extraction is map-side; the join is key-partitioned;
    the histogram is O(groups x bins). Reference: SURVEY.md §2.3
    (monitoring surface over the Q1 durable log).
    """
    from graal_cdc_spark.operators.robust import binned_group_quantiles

    configure(spark)
    ev = build_cdc_events(spark, sf_dir).select(
        "seq", F.length("value").alias("nbytes")
    )
    parsed = _parsed(spark, sf_dir).select("seq", "tbl", "op")
    sized = parsed.join(ev, "seq").withColumn(
        "grp", F.concat_ws("/", "tbl", "op")
    )
    q = binned_group_quantiles(
        sized, "grp", "nbytes", probabilities=(0.5, 0.95), bin_width=16.0
    )
    pcts = q.groupBy("grp").agg(
        F.min(F.when(F.col("p") == 0.5, F.col("value")))
        .cast("long")
        .alias("p50_bytes"),
        F.min(F.when(F.col("p") == 0.95, F.col("value")))
        .cast("long")
        .alias("p95_bytes"),
    )
    base = sized.groupBy("grp", "tbl", "op").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nbytes").alias("total_bytes"),
    )
    return (
        ordered_result(base.join(F.broadcast(pcts), "grp")
        .select("tbl", "op", "n", "total_bytes", "p50_bytes", "p95_bytes"), "tbl", "op")
    )


register(
    QuerySpec(
        name="c22_envelope_size_census",
        category="cdc",
        description="per-(table, op) envelope byte-size census: count, "
        "total, exact p50/p95 via binned two-pass quantiles "
        "(payload-bloat monitor)",
        spark=_c22,
        oracle=cdc_parsed_cte()
        + """
, sized AS (
  SELECT p.tbl, p.op, CAST(length(e.value) AS BIGINT) AS nbytes
  FROM cdc_parsed p JOIN cdc_events e USING (seq)
), ranked AS (
  SELECT tbl, op, nbytes,
         COUNT(*) OVER (PARTITION BY tbl, op ORDER BY nbytes
                        ROWS UNBOUNDED PRECEDING) AS c,
         COUNT(*) OVER (PARTITION BY tbl, op) AS t
  FROM sized
), pcts AS (
  SELECT tbl, op,
         CAST(min(nbytes) FILTER (WHERE c * 2 >= t) AS BIGINT)
           AS p50_bytes,
         CAST(min(nbytes) FILTER (WHERE c * 20 >= 19 * t) AS BIGINT)
           AS p95_bytes
  FROM ranked GROUP BY tbl, op
)
SELECT s.tbl, s.op, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(s.nbytes) AS BIGINT) AS total_bytes,
       min(p.p50_bytes) AS p50_bytes,
       min(p.p95_bytes) AS p95_bytes
FROM sized s JOIN pcts p ON s.tbl = p.tbl AND s.op = p.op
GROUP BY s.tbl, s.op
ORDER BY s.tbl, s.op
""",
        reference="SURVEY.md §2.3 (Q1 durable-log monitoring); "
        "DebeziumEngineRecordHandler.java:154-184 envelope surface",
    )
)


def _c23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-version control table over the envelope fixture — the
    registry view of §1.4 "schema history / DDL tracking": one row per
    (db, tbl, distinct row-image field-set), versioned 1..n per table
    by first appearance in the log. The reference delegates this to
    Debezium's internal schema topic (``DebeziumEngineManager.java:
    91-120`` wires ``schema.history.internal.*``); here the same
    signal is materialized from the data plane itself.

    Scale: field-set extraction is map-side (sorted JSON keys, one
    string per event); the registry reduces through ONE
    (db, tbl, fields) aggregation bounded by the number of DISTINCT
    schemas; version numbering windows only that tiny frame.
    """
    from graal_cdc_spark.cdc.schema_registry import schema_versions

    parsed = _parsed(spark, sf_dir)
    return ordered_result(schema_versions(parsed), "db", "tbl", "version")


# The oracle twin rehearsed since round 6 in tests/test_schema_registry.py
# (registration was frozen by VERDICT r5 #2; unfrozen round 7).
C23_ORACLE = (
    cdc_parsed_cte()
    + """
, evid AS (
  SELECT c.db, c.tbl, c.seq,
         list_aggr(list_sort(json_keys(e.value, '$.payload.after')),
                   'string_agg', ',') AS fields
  FROM cdc_parsed c JOIN cdc_events e USING (seq)
  WHERE c.op <> 'd'
    AND json_extract(e.value, '$.payload.after') IS NOT NULL
    AND json_extract(e.value, '$.payload.after') != 'null'
), per_schema AS (
  SELECT db, tbl, coalesce(fields, '') AS fields,
         min(seq) AS first_seq,
         count(*) AS n_events
  FROM evid GROUP BY 1, 2, 3
)
SELECT db, tbl,
       CAST(row_number() OVER (PARTITION BY db, tbl
                               ORDER BY first_seq, fields)
            AS INT) AS version,
       fields,
       CAST(first_seq AS BIGINT) AS first_seq,
       CAST(n_events AS BIGINT) AS n_events
FROM per_schema
ORDER BY db, tbl, version
"""
)

register(
    QuerySpec(
        name="c23_schema_version_history",
        category="cdc",
        description="schema-version control table: one row per "
        "(db, tbl, distinct after-image field-set), versioned by "
        "first appearance (schema history / DDL tracking)",
        spark=_c23,
        oracle=C23_ORACLE,
        reference="DebeziumEngineManager.java:91-120 "
        "(schema.history.internal.* delegation); SURVEY.md §1.4",
    )
)


def _c24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END delivery census for the Elasticsearch sink (K1–K6):
    run the real CDC write path — latest-by-key compaction inside
    ``write_cdc_dataframe`` → record coercion → ``_bulk`` body
    assembly → transport dispatch — against a scripted 200-transport
    that COUNTS the actions it receives off the wire, and gate those
    counts against the oracle's statement of the compaction contract
    (final op per key: 'd' → delete, else index). The sink tests
    prove request shapes; this gate proves the Spark-side dataflow
    delivers exactly one action per live key at fixture scale.

    Scale: the sink is foreachPartition (executor-parallel, zero
    driver data path); the census channel is a pair of Spark
    accumulators — merged per SUCCESSFUL task exactly once for an
    action, so the counts are deterministic absent task retries (a
    retried task re-sends — that is the sink's documented
    at-least-once contract surfacing in the census, not a bug).
    Reference: ``ElasticsearchUtils.java`` bulk endpoint (K1–K4),
    ``DebeziumEngineRecordHandler.java:129`` ordered replay (Q3).
    """
    import json as _json

    from graal_cdc_spark.sinks import EsSinkConfig, write_cdc_dataframe

    parsed = _parsed(spark, sf_dir)
    sc = spark.sparkContext
    acc_index = sc.accumulator(0)
    acc_delete = sc.accumulator(0)

    def transport_factory():
        def transport(req):
            method, url, _headers, body = req
            if url.endswith("/_bulk"):
                for line in body.strip().split("\n"):
                    obj = _json.loads(line)
                    if set(obj) == {"index"}:
                        acc_index.add(1)
                    elif set(obj) == {"delete"}:
                        acc_delete.add(1)
            elif method == "PUT":
                acc_index.add(1)
            elif method == "DELETE":
                acc_delete.add(1)
            return 200

        return transport

    cfg = EsSinkConfig(
        url="http://es.invalid:9200/cdc_state",
        username="census",
        password="census",
        id_key="key",
    )
    write_cdc_dataframe(
        parsed.select("key", "op", "seq", "tbl"),
        cfg,
        transport_factory=transport_factory,
    )
    rows = [
        ("delete", int(acc_delete.value)),
        ("index", int(acc_index.value)),
    ]
    return ordered_result(spark.createDataFrame(rows, "action STRING, n BIGINT"), 
        "action"
    )


register(
    QuerySpec(
        name="c24_es_delivery_census",
        category="cdc",
        description="end-to-end ES sink delivery census: compaction + "
        "coercion + bulk assembly against a counting transport, gated "
        "on the final-op-per-key contract",
        spark=_c24,
        oracle=cdc_parsed_cte()
        + """
, latest AS (
  SELECT key, op,
         row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM cdc_parsed
)
SELECT CASE WHEN op = 'd' THEN 'delete' ELSE 'index' END AS action,
       CAST(count(*) AS BIGINT) AS n
FROM latest WHERE rn = 1
GROUP BY 1
ORDER BY action
""",
        reference="ElasticsearchUtils.java:125-167 (K1-K4 dispatch); "
        "DebeziumEngineRecordHandler.java:129 (Q3 ordered replay)",
    )
)


def _c25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census of the schema-version TAGGING join (the silver router's
    lookup, ``cdc/schema_registry.events_with_schema_version``): per
    (db, tbl, version) — event count, distinct keys, seq span. This
    gates the half of the registry c23 does not: that every non-delete
    row image joins to exactly one version and the per-version event
    mass matches the control table's bookkeeping.

    Scale: the registry side is broadcast (bounded by distinct
    schemas); the census is one aggregation on (db, tbl, version);
    the log-sized frame is touched by exactly one map + one shuffle.
    Reference: SURVEY.md §1.4 (schema history consumers);
    ``DebeziumEngineManager.java:91-120``.
    """
    from graal_cdc_spark.cdc.schema_registry import (
        events_with_schema_version,
    )

    parsed = _parsed(spark, sf_dir)
    return (
        ordered_result(events_with_schema_version(parsed)
        .groupBy("db", "tbl", "version")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("key").alias("n_keys"),
            F.min("seq").alias("first_seq"),
            F.max("seq").alias("last_seq"),
        ), "db", "tbl", "version")
    )


register(
    QuerySpec(
        name="c25_schema_version_event_census",
        category="cdc",
        description="per-(db, tbl, schema version) event census via "
        "the silver router's version-tagging broadcast join: counts, "
        "distinct keys, seq span",
        spark=_c25,
        oracle=cdc_parsed_cte()
        + """
, evid AS (
  SELECT c.db, c.tbl, c.seq, c.key,
         coalesce(list_aggr(list_sort(json_keys(e.value,
                    '$.payload.after')), 'string_agg', ','), '') AS fields
  FROM cdc_parsed c JOIN cdc_events e USING (seq)
  WHERE c.op <> 'd'
    AND json_extract(e.value, '$.payload.after') IS NOT NULL
    AND json_extract(e.value, '$.payload.after') != 'null'
), per_schema AS (
  SELECT db, tbl, fields, min(seq) AS first_seen
  FROM evid GROUP BY 1, 2, 3
), versioned AS (
  SELECT db, tbl, fields,
         CAST(row_number() OVER (PARTITION BY db, tbl
                                 ORDER BY first_seen, fields)
              AS INT) AS version
  FROM per_schema
)
SELECT e.db, e.tbl, v.version,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.key) AS BIGINT) AS n_keys,
       CAST(min(e.seq) AS BIGINT) AS first_seq,
       CAST(max(e.seq) AS BIGINT) AS last_seq
FROM evid e JOIN versioned v USING (db, tbl, fields)
GROUP BY e.db, e.tbl, v.version
ORDER BY e.db, e.tbl, v.version
""",
        reference="DebeziumEngineManager.java:91-120; SURVEY.md §1.4 "
        "(schema-history consumer side)",
    )
)


def _c26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END delivery census for the JDBC sink (the README-
    claimed relational sink, c24's philosophy on the other sink):
    drive the REAL path — latest-by-key compaction, executor-parallel
    staging write, dialect MERGE, EXISTS-correlated DELETE — against
    the embedded Derby that ships with Spark, read the final table
    state back over JDBC, and gate the per-table census against the
    oracle's statement of the compaction contract (live keys = latest
    op per key that is not a delete).

    Scale: staging is ``df.write.jdbc`` (executor-parallel); the only
    driver materialization is the census aggregate, pushed down to
    the database as a JDBC query (GROUP BY runs in Derby — bounded
    rows back). The per-call table is dropped after the census.
    Reference: ``README.md:10`` (JDBC sink claim);
    ``ElasticsearchUtils.java:131-177`` upsert/delete semantics.
    """
    import uuid as _uuid

    from graal_cdc_spark.sinks.jdbc import JdbcSinkConfig, write_jdbc_batch

    url = "jdbc:derby:memory:graalgate;create=true"
    table = f"CDC_STATE_{_uuid.uuid4().hex[:8].upper()}"
    jvm = spark._jvm

    def run_sql(sql: str) -> None:
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            stmt = conn.createStatement()
            stmt.execute(sql)
            stmt.close()
        finally:
            conn.close()

    run_sql(
        f"CREATE TABLE {table} "
        "(K VARCHAR(64) PRIMARY KEY, TBL VARCHAR(64), SEQ BIGINT)"
    )
    try:
        parsed = _parsed(spark, sf_dir).select(
            F.col("key").alias("k"), "tbl", "op", "seq"
        )
        # empty user keeps Derby on the default APP schema — a named
        # user would resolve unqualified tables in its own schema
        cfg = JdbcSinkConfig(url=url, table=table, key_cols=("k",))
        write_jdbc_batch(
            parsed, cfg, op_col="op", seq_col="seq",
            staging_column_types={"k": "VARCHAR(64)", "tbl": "VARCHAR(64)"},
        )
        census = (
            spark.read.format("jdbc")
            .option("url", url)
            .option(
                "query",
                f"SELECT TBL, COUNT(*) AS N_KEYS, MIN(SEQ) AS MIN_SEQ, "
                f"MAX(SEQ) AS MAX_SEQ FROM {table} GROUP BY TBL",
            )
            .load()
            .collect()
        )
    finally:
        run_sql(f"DROP TABLE {table}")
    rows = sorted(
        (r["TBL"], int(r["N_KEYS"]), int(r["MIN_SEQ"]), int(r["MAX_SEQ"]))
        for r in census
    )
    return ordered_result(spark.createDataFrame(
        rows, "tbl STRING, n_keys BIGINT, min_seq BIGINT, max_seq BIGINT"
    ), "tbl")


register(
    QuerySpec(
        name="c26_jdbc_delivery_census",
        category="cdc",
        description="end-to-end JDBC sink delivery census: compaction "
        "+ staging + MERGE + DELETE against embedded Derby, gated on "
        "the live-keys-per-table contract",
        spark=_c26,
        oracle=cdc_parsed_cte()
        + """
, latest AS (
  SELECT key, tbl, op, seq,
         row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM cdc_parsed
)
SELECT tbl, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(min(seq) AS BIGINT) AS min_seq,
       CAST(max(seq) AS BIGINT) AS max_seq
FROM latest WHERE rn = 1 AND op <> 'd'
GROUP BY tbl
ORDER BY tbl
""",
        reference="README.md:10 (JDBC sink); "
        "ElasticsearchUtils.java:131-177 (upsert/delete semantics)",
    )
)


# ---------------------------------------------------------------------------
# C27 — log compaction / retention census: the END-TO-END file
# lifecycle of `compact_log` (distributed log read → latest-by-key
# head collapse with tombstone retention → staged-commit rewrite →
# atomic directory swap → re-read through the same connector), gated
# on the post-compaction log CONTENT. The oracle restates the
# retention contract declaratively over the same envelope slice:
# head (seq <= boundary) keeps exactly its latest record per key —
# whatever kind that record is, tombstone and DDL included — and the
# tail survives verbatim. Any error in the rewrite (lost segment,
# double-published partition, boundary off-by-one, head row that
# escaped compaction) changes a census cell.
#
# Scale: this is the operation that BOUNDS replay storage at 100 TB —
# the head converges to O(live keys) while the tail stays a faithful
# recent history. The reference's Chronicle Queue rolls hourly but
# never compacts (DebeziumEngineRecordHandler.java:89-93); its disk
# grows without bound.
# ---------------------------------------------------------------------------


def _c27(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.sources import cdc_log_ds as DS

    configure(spark)
    DS.register(spark)
    raw = build_cdc_events(spark, sf_dir).filter(
        (F.col("seq") % 10 <= 2) & F.expr("(seq div 10) % 4 = 0")
    )
    log = tempfile.mkdtemp(prefix="c27-log-") + "/log"
    raw.write.format("graal_cdc_log").mode("append").save(log)

    # deterministic retention boundary: 60% of the max seq (1-row
    # bounded collect — the same class as scalar min/max metadata)
    # integer division on BOTH sides: DuckDB's float->int CAST rounds
    # while Spark's truncates, so a fractional boundary would compact
    # different head slices (the c28 `div`/`//` rule)
    upto = raw.agg(
        F.expr("max(seq) * 6 div 10").alias("u")
    ).collect()[0].u
    DS.compact_log(spark, log, upto)

    relog = spark.read.format("graal_cdc_log").load(log)
    op = F.get_json_object("value", "$.payload.op")
    kind = (
        F.when(F.col("value").isNull(), F.lit("tombstone"))
        .when(
            F.get_json_object("value", "$.payload.ddl").isNotNull(),
            F.lit("ddl"),
        )
        .when(op.isin("c", "u", "d", "r"), op)
        .otherwise(F.lit("other"))
    )
    return (
        ordered_result(relog.withColumn("kind", kind)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("key").alias("n_keys"),
            F.sum((F.col("seq") <= upto).cast("long")).alias("n_head"),
            F.sum((F.col("seq") > upto).cast("long")).alias("n_tail"),
        ), "kind")
    )


register(
    QuerySpec(
        name="c27_log_compaction_census",
        category="cdc",
        description="log compaction/retention lifecycle: distributed "
        "rewrite with latest-per-key head + verbatim tail, gated on "
        "the re-read post-compaction log content per record kind",
        spark=_c27,
        oracle=cdc_events_cte()
        + """
, sliced AS (
  SELECT seq, key, value FROM cdc_events
  WHERE seq % 10 <= 2 AND (seq // 10) % 4 = 0
),
bound AS (
  SELECT CAST(max(seq) * 6 // 10 AS BIGINT) AS u FROM sliced
),
head AS (
  -- key IS NOT NULL mirrors compact_log's drop_keyless_head=True:
  -- keyless head rows are dropped, not collapsed into one NULL group
  SELECT s.seq, s.key, s.value
  FROM (
    SELECT seq, key, value,
           row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM sliced, bound WHERE seq <= bound.u AND key IS NOT NULL
  ) s WHERE s.rn = 1
),
tail AS (
  SELECT seq, key, value FROM sliced, bound WHERE seq > bound.u
),
log AS (SELECT * FROM head UNION ALL SELECT * FROM tail),
kinds AS (
  SELECT seq, key,
         CASE
           WHEN value IS NULL THEN 'tombstone'
           WHEN json_extract(value, '$.payload.ddl') IS NOT NULL THEN 'ddl'
           WHEN json_extract_string(value, '$.payload.op')
                IN ('c','u','d','r')
             THEN json_extract_string(value, '$.payload.op')
           ELSE 'other'
         END AS kind
  FROM log
)
SELECT kind,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN seq <= (SELECT u FROM bound) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_head,
       CAST(SUM(CASE WHEN seq > (SELECT u FROM bound) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tail
FROM kinds
GROUP BY kind
ORDER BY kind
""",
        reference="DebeziumEngineRecordHandler.java:89-93 (queue "
        "roll, no compaction); Kafka log-compaction semantics "
        "(latest-per-key + tombstone retention)",
    )
)


# ---------------------------------------------------------------------------
# C28 — schema AS-OF lookup: the point-in-time read of the c23
# control table (which layout was table T written under at seq S?) —
# what a consumer interpreting an OLD log slice, a backfill job, or a
# point-in-time restore (c10) asks before touching the rows. Probe
# seqs are the even deciles of the log's seq range (deterministic on
# both engines); for each probe, the active version per (db, tbl) is
# the latest registry entry whose first appearance is at or before
# the probe — the backward as-of of r09, applied to the control
# plane.
#
# Scale: probes and the registry are both control-plane-bounded; the
# only corpus-sized work is c23's one (db, tbl, fields) aggregation.
# ---------------------------------------------------------------------------


def _c28(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graal_cdc_spark.cdc.schema_registry import schema_as_of

    parsed = _parsed(spark, sf_dir)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0].m
    # the fixture's after-image carries ONE field-set, which would make
    # any as-of trivially v1 — synthesize the DDL moment by appending a
    # field to every late event (seq past 60% of the range), exactly
    # like a column added mid-stream; the oracle restates the same
    # string surgery, so the 2-version registry is derived identically
    boundary = mx * 6 // 10
    evolved = parsed.withColumn(
        "after_json",
        F.when(
            (F.col("seq") > boundary)
            & F.col("after_json").isNotNull()
            & (F.col("after_json") != "null"),
            F.regexp_replace(
                "after_json", r"\}$", ',"zz_added":"1"}'
            ),
        ).otherwise(F.col("after_json")),
    )
    probes = [(i, mx * i // 10) for i in (2, 4, 6, 8, 10)]
    return ordered_result(schema_as_of(evolved, probes), 
        "probe_id", "db", "tbl"
    )


register(
    QuerySpec(
        name="c28_schema_as_of",
        category="cdc",
        description="point-in-time schema lookup: active version per "
        "(db, tbl) at each probe seq (backward as-of over the c23 "
        "registry)",
        spark=_c28,
        oracle=cdc_parsed_cte()
        + """
, bnd AS (
  SELECT CAST(max(seq) * 6 // 10 AS BIGINT) AS b FROM cdc_parsed
),
evid AS (
  SELECT c.db, c.tbl, c.seq,
         list_aggr(list_sort(json_keys(e.value, '$.payload.after')),
                   'string_agg', ',')
         || CASE WHEN c.seq > (SELECT b FROM bnd)
                 THEN ',zz_added' ELSE '' END AS fields
  FROM cdc_parsed c JOIN cdc_events e USING (seq)
  WHERE c.op <> 'd'
    AND json_extract(e.value, '$.payload.after') IS NOT NULL
    AND json_extract(e.value, '$.payload.after') != 'null'
),
per_schema AS (
  SELECT db, tbl, coalesce(fields, '') AS fields,
         min(seq) AS first_seq
  FROM evid GROUP BY 1, 2, 3
),
reg AS (
  SELECT db, tbl,
         CAST(row_number() OVER (PARTITION BY db, tbl
                                 ORDER BY first_seq, fields)
              AS INT) AS version,
         fields, first_seq
  FROM per_schema
),
probes AS (
  SELECT CAST(i AS INT) AS probe_id,
         CAST(max(seq) * i // 10 AS BIGINT) AS as_of_seq
  FROM cdc_parsed, (SELECT unnest([2, 4, 6, 8, 10]) AS i) g
  GROUP BY i
)
SELECT probe_id, as_of_seq, db, tbl, version, fields
FROM (
  SELECT p.probe_id, p.as_of_seq, r.db, r.tbl, r.version, r.fields,
         row_number() OVER (PARTITION BY p.probe_id, r.db, r.tbl
                            ORDER BY r.first_seq DESC, r.version DESC)
           AS rn
  FROM probes p JOIN reg r ON r.first_seq <= p.as_of_seq
) t WHERE rn = 1
ORDER BY probe_id, db, tbl
""",
        reference="DebeziumEngineManager.java:91-120 (schema history); "
        "SURVEY.md §1.4 + R09 as-of pattern on the control plane",
    )
)


# ---------------------------------------------------------------------------
# C29 — GDPR erasure census: the right-to-be-forgotten file lifecycle
# (`sinks/lake.purge_keys`) gated end to end. Build the compacted
# live-state lake from the envelope fixture (the c06 contract),
# partition it by table, erase a deterministic key set through the
# REAL purge path — locate affected files by scan, stage survivor
# rewrites, commit via the fsync'd intent marker, delete originals —
# then census the RE-READ lake. The oracle restates the erasure
# declaratively (compacted state minus the purged keys); the
# n_purged_remaining column pins the contract's zero on both sides,
# so a purge that misses a file, double-applies, or loses survivor
# rows changes a census cell.
#
# Scale: an erasure request touches a handful of files — the rewrite
# is file-targeted (row-group stats prune the locate scan), never
# partition- or table-sized. The reference has no erasure story at
# all (its ES sink deletes by id; its queue keeps every envelope).
# ---------------------------------------------------------------------------


def _c29(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.sinks.lake import purge_keys, write_partitioned

    configure(spark)
    parsed = _parsed(spark, sf_dir)
    state = latest_by_key(parsed, ["tbl", "key"], "seq").filter(
        F.col("op") != "d"
    ).select("tbl", "key", "op", "seq")
    lake = tempfile.mkdtemp(prefix="c29-lake-") + "/state"
    # several files per partition so the purge is genuinely
    # file-targeted (most files contain no purged key and survive)
    write_partitioned(state.repartition(8, "key"), lake, ["tbl"])

    erase = [
        r.key
        for r in state.select("key")
        .distinct()
        .filter(F.col("key").cast("bigint") % 11 == 3)
        .collect()
    ]
    purge_keys(spark, lake, "key", erase)

    relake = spark.read.parquet(lake)
    return (
        ordered_result(relake.groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("key").alias("n_keys"),
            F.sum(
                (F.col("key").cast("bigint") % 11 == 3).cast("long")
            ).alias("n_purged_remaining"),
        ), "tbl")
    )


register(
    QuerySpec(
        name="c29_gdpr_purge_census",
        category="cdc",
        description="right-to-be-forgotten erasure lifecycle: "
        "file-targeted survivor rewrite with intent-marker commit, "
        "gated on the re-read lake census (compacted state minus the "
        "erased keys, zero purged rows remaining)",
        spark=_c29,
        oracle=cdc_parsed_cte()
        + """
, state AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed
  ) t WHERE rn = 1 AND op <> 'd'
),
kept AS (
  SELECT * FROM state WHERE CAST(key AS BIGINT) % 11 <> 3
)
SELECT tbl,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN CAST(key AS BIGINT) % 11 = 3
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purged_remaining
FROM kept
GROUP BY tbl
ORDER BY tbl
""",
        reference="ElasticsearchUtils.java:131-177 (id-keyed deletes "
        "— the sink-side half); GDPR art. 17 erasure over the lake",
    )
)


# ---------------------------------------------------------------------------
# C30 — dead-letter queue census: the PRODUCTION form of the F3–F7
# filter chain. The reference hard-drops at each filter
# (DebeziumEngineRecordHandler.java:154-176); real ingest ROUTES
# rejects to a DLQ so a malformed burst is inspectable and replayable
# after a producer fix. The query splits the envelope stream with
# `split_dead_letters`, writes the rejects through the graal_cdc_log
# connector (the DLQ IS a log — same replay machinery), re-reads the
# DLQ, re-classifies, and gates the census: per reject reason —
# first-failed-filter precedence exactly as the chain orders them —
# row count, distinct keys, seq range. The oracle restates the
# classification declaratively; a chain/classifier disagreement, a
# lost DLQ record, or a precedence swap changes a cell.
# ---------------------------------------------------------------------------


def _c30(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.cdc.filters import reject_reason, split_dead_letters
    from graal_cdc_spark.sources import cdc_log_ds as DS

    configure(spark)
    DS.register(spark)
    raw = build_cdc_events(spark, sf_dir)
    accepted, rejected = split_dead_letters(raw)
    dlq = tempfile.mkdtemp(prefix="c30-dlq-") + "/dlq"
    rejected.select("seq", "key", "value").write.format(
        "graal_cdc_log"
    ).mode("append").save(dlq)

    replayed = spark.read.format("graal_cdc_log").load(dlq)
    return (
        ordered_result(replayed.withColumn("reason", reject_reason())
        .groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("key").alias("n_keys"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        ), "reason")
    )


register(
    QuerySpec(
        name="c30_dead_letter_census",
        category="cdc",
        description="dead-letter routing: F3-F7 rejects written to a "
        "DLQ log, replayed, and re-classified — census per "
        "first-failed-filter reason (counts, keys, seq range)",
        spark=_c30,
        oracle=cdc_events_cte()
        + """
, classified AS (
  SELECT seq, key,
         CASE
           WHEN value IS NULL THEN 'tombstone'
           WHEN json_extract(value, '$.payload') IS NULL
             THEN 'malformed'
           WHEN json_extract(value, '$.payload.ddl') IS NOT NULL
             THEN 'ddl'
           WHEN json_extract_string(value, '$.payload.op') IS NULL
             OR json_extract_string(value, '$.payload.op')
                NOT IN ('c', 'u', 'd', 'r')
             THEN 'non_row_op'
           WHEN value NOT LIKE '%"after"%' THEN 'missing_after'
           ELSE NULL
         END AS reason
  FROM cdc_events
)
SELECT reason,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
       CAST(min(seq) AS BIGINT) AS min_seq,
       CAST(max(seq) AS BIGINT) AS max_seq
FROM classified
WHERE reason IS NOT NULL
GROUP BY reason
ORDER BY reason
""",
        reference="DebeziumEngineRecordHandler.java:154-176 (the "
        "hard-drop chain this routes instead); Kafka Connect DLQ "
        "semantics",
    )
)


# ---------------------------------------------------------------------------
# C31 — versioned-lake time-travel census: the Delta/Iceberg-shaped
# transaction log (sinks/versioned_lake.py) driven through a full
# lifecycle — append the compacted early state (v0), MERGE the
# mid-window changes by key (v1, one atomic commit: old key versions
# dropped, incoming rows added), copy-on-write DELETE a key slice
# (v2), vacuum with all three versions retained — then census every
# version via time travel. The oracle restates the three snapshots
# declaratively from the envelope stream; a snapshot-fold bug, a lost
# or double-counted file, a non-atomic merge, or a vacuum that
# deleted a retained file changes a cell.
#
# Scale shape: data files are immutable parquet (full scan pushdown);
# commits are O(files touched) JSON; the reader folds checkpoint +
# tail, never the whole history; delete/upsert rewrite ONLY the files
# containing matching keys — the file-targeted asymmetry that makes
# mutation affordable on a 100 TB table.
# ---------------------------------------------------------------------------


def _c31(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    parsed = _parsed(spark, sf_dir)
    # split points from the stream's own extent (1-row collect —
    # bounded metadata; the oracle derives the same values in SQL)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    s0, s1 = mx // 3, (2 * mx) // 3

    base = (
        latest_by_key(parsed.filter(F.col("seq") <= s0), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    table = tempfile.mkdtemp(prefix="c31-vlake-") + "/state"
    # several files so the merge/delete are genuinely file-targeted
    VL.commit_append(spark, base.repartition(4, "key"), table)       # v0
    upd = (
        latest_by_key(
            parsed.filter((F.col("seq") > s0) & (F.col("seq") <= s1)),
            ["tbl", "key"],
            "seq",
        )
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    VL.commit_upsert_keys(
        spark, upd.repartition(4, "key"), table, ["tbl", "key"]
    )                                                                # v1
    VL.commit_delete_where(spark, table, "CAST(key AS BIGINT) % 7 = 2")  # v2
    VL.vacuum(table, keep_versions=3)  # all three retained — censuses below
    parts = []
    for v in (0, 1, 2):
        parts.append(
            VL.read_table(spark, table, version=v)
            .groupBy("tbl")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("key").alias("n_keys"),
                F.max("seq").alias("max_seq"),
            )
            .withColumn("version", F.lit(v).cast("int"))
        )
    out = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return ordered_result(
        out.select("version", "tbl", "n_rows", "n_keys", "max_seq"),
        "version",
        "tbl",
    )


register(
    QuerySpec(
        name="c31_lake_time_travel_census",
        category="cdc",
        description="versioned-lake lifecycle: append / atomic "
        "key-merge / copy-on-write delete through the transaction "
        "log, vacuum with retention, then a per-version time-travel "
        "census (rows, keys, max seq per table)",
        spark=_c31,
        oracle=cdc_parsed_cte()
        + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
v1 AS (
  SELECT * FROM upd
  UNION ALL
  SELECT b.* FROM base b WHERE NOT EXISTS (
    SELECT 1 FROM upd u WHERE u.tbl = b.tbl AND u.key = b.key)
),
v2 AS (SELECT * FROM v1 WHERE CAST(key AS BIGINT) % 7 <> 2),
census AS (
  SELECT 0 AS version, tbl, count(*) AS n_rows,
         count(DISTINCT key) AS n_keys, max(seq) AS max_seq
  FROM base GROUP BY tbl
  UNION ALL
  SELECT 1, tbl, count(*), count(DISTINCT key), max(seq)
  FROM v1 GROUP BY tbl
  UNION ALL
  SELECT 2, tbl, count(*), count(DISTINCT key), max(seq)
  FROM v2 GROUP BY tbl
)
SELECT CAST(version AS INT) AS version, tbl,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(max_seq AS BIGINT) AS max_seq
FROM census
ORDER BY version, tbl
""",
        reference="no reference analog (its only sink is ES upserts, "
        "ElasticsearchUtils.java:131-177); Delta Lake transaction-log "
        "/ Iceberg snapshot protocols, re-expressed minimally "
        "(VERDICT r10 #7)",
    )
)


# ---------------------------------------------------------------------------
# C32 — versioned-lake change feed: the Delta-CDF-shaped incremental
# read over C31's transaction log, with NO extra change files — each
# commit's row-level delta is reconstructed from its copy-on-write
# file diff (rows in ADDED files exceptAll rows in REMOVED files =
# inserts; the reverse = deletes; survivors rewritten unchanged
# cancel). Drives the same lifecycle as c31 (append v0, atomic
# key-merge v1, copy-on-write delete v2), reads changes 0..2, and
# censuses per (version, change type, table). The oracle restates the
# three snapshots declaratively and takes the same multiset
# differences with EXCEPT ALL — equal by construction because
# added ∪ untouched = new snapshot and removed ∪ untouched = old
# snapshot, so the file diff IS the snapshot diff.
#
# Scale shape: a commit's diff reads only the files that commit
# touched (never the table); each exceptAll is one hash shuffle over
# those rows — the incremental-consumer pattern that lets a 100 TB
# downstream job process per-commit deltas instead of full snapshots.
# ---------------------------------------------------------------------------


def build_vlake_lifecycle(
    spark: SparkSession, sf_dir: str, prefix: str
) -> str:
    """The shared append/key-merge/delete versioned-lake lifecycle
    (c31/c32/st19): v0 = compacted early state, v1 = atomic key-merge
    of the mid-window changes, v2 = copy-on-write delete of a key
    slice. Returns the table path."""
    import tempfile

    from graal_cdc_spark.sinks import versioned_lake as VL

    parsed = _parsed(spark, sf_dir)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    s0, s1 = mx // 3, (2 * mx) // 3

    base = (
        latest_by_key(parsed.filter(F.col("seq") <= s0), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    table = tempfile.mkdtemp(prefix=f"{prefix}-vlake-") + "/state"
    VL.commit_append(spark, base.repartition(4, "key"), table)       # v0
    upd = (
        latest_by_key(
            parsed.filter((F.col("seq") > s0) & (F.col("seq") <= s1)),
            ["tbl", "key"],
            "seq",
        )
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    VL.commit_upsert_keys(
        spark, upd.repartition(4, "key"), table, ["tbl", "key"]
    )                                                                # v1
    VL.commit_delete_where(spark, table, "CAST(key AS BIGINT) % 7 = 2")  # v2
    return table


def change_feed_census(feed: DataFrame) -> DataFrame:
    """Per-(version, change type, table) census of a change feed —
    the shared gate shape of c32 (batch read_changes) and st19 (the
    graal_vlake streaming source)."""
    return ordered_result(
        feed.groupBy(
            F.col("_commit_version").alias("version"),
            F.col("_change_type").alias("change_type"),
            "tbl",
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("key").alias("n_keys"),
            F.max("seq").alias("max_seq"),
        ),
        "version",
        "change_type",
        "tbl",
    )


def _c32(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    table = build_vlake_lifecycle(spark, sf_dir, "c32")
    return change_feed_census(VL.read_changes(spark, table, 0, 2))


# shared by c32 (batch read_changes) and st19 (graal_vlake streaming
# source): both paths must reproduce the same declarative snapshot
# diffs
C32_ORACLE = (
    cdc_parsed_cte()
    + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
v1 AS (
  SELECT * FROM upd
  UNION ALL
  SELECT b.* FROM base b WHERE NOT EXISTS (
    SELECT 1 FROM upd u WHERE u.tbl = b.tbl AND u.key = b.key)
),
v2 AS (SELECT * FROM v1 WHERE CAST(key AS BIGINT) % 7 <> 2),
feed AS (
  SELECT 0 AS version, 'insert' AS change_type, *
  FROM base
  UNION ALL
  SELECT 1, 'insert', * FROM (
    SELECT * FROM v1 EXCEPT ALL SELECT * FROM base)
  UNION ALL
  SELECT 1, 'delete', * FROM (
    SELECT * FROM base EXCEPT ALL SELECT * FROM v1)
  UNION ALL
  SELECT 2, 'insert', * FROM (
    SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1)
  UNION ALL
  SELECT 2, 'delete', * FROM (
    SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2)
)
SELECT CAST(version AS INT) AS version, change_type, tbl,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
       CAST(max(seq) AS BIGINT) AS max_seq
FROM feed
GROUP BY version, change_type, tbl
ORDER BY version, change_type, tbl
"""
)


register(
    QuerySpec(
        name="c32_lake_change_feed",
        category="cdc",
        description="versioned-lake change data feed: per-commit "
        "row-level deltas reconstructed from the copy-on-write file "
        "diffs (no change files) across append / key-merge / delete "
        "commits — census per (version, change type, table)",
        spark=_c32,
        oracle=C32_ORACLE,
        reference="no reference analog; Delta Lake Change Data Feed "
        "semantics re-derived from copy-on-write file diffs "
        "(VERDICT r10 #7 follow-through)",
    )
)


# ---------------------------------------------------------------------------
# C33 — versioned-lake clustered pruned lookup: OPTIMIZE the c31/c32
# lifecycle table (bin-pack + sort-cluster by key, one data-identical
# commit) and serve a key-range lookup through log-metadata file
# skipping (`read_table(prune=...)` — files whose committed min/max
# disprove the range are never listed to Spark). The oracle restates
# the post-delete snapshot filtered to the same range, so a wrong
# stats bound, an over-eager prune, a non-data-identical optimize, or
# a broken sort-clustering changes a cell. Pruning is advisory by
# construction (the row filter still applies), so the gate holds on
# any file layout; the pruning EFFECTIVENESS (one file scanned, not
# all) is pinned by tests/test_versioned_lake.py.
#
# Scale shape: the lookup plans O(files intersecting the range) scan
# tasks from commit metadata alone — no parquet footer is opened for
# skipped files; this is the read-side payoff of OPTIMIZE's
# clustering at 100 TB.
# ---------------------------------------------------------------------------


def _c33(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    table = build_vlake_lifecycle(spark, sf_dir, "c33")
    VL.commit_optimize(spark, table, n_files=4, sort_cols=["key"])  # v3
    lo, hi = "2", "5"  # lexicographic key range (string keys)
    looked_up = VL.read_table(spark, table, prune={"key": (lo, hi)}).filter(
        (F.col("key") >= lo) & (F.col("key") <= hi)
    )
    return ordered_result(
        looked_up.groupBy("tbl").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("key").alias("n_keys"),
            F.max("seq").alias("max_seq"),
        ),
        "tbl",
    )


register(
    QuerySpec(
        name="c33_lake_pruned_lookup",
        category="cdc",
        description="versioned-lake clustered lookup: OPTIMIZE "
        "(bin-pack + sort-cluster by key) then a key-range read "
        "through log-metadata file skipping — census per table over "
        "the pruned range",
        spark=_c33,
        oracle=cdc_parsed_cte()
        + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
v1 AS (
  SELECT * FROM upd
  UNION ALL
  SELECT b.* FROM base b WHERE NOT EXISTS (
    SELECT 1 FROM upd u WHERE u.tbl = b.tbl AND u.key = b.key)
),
v2 AS (SELECT * FROM v1 WHERE CAST(key AS BIGINT) % 7 <> 2)
SELECT tbl,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
       CAST(max(seq) AS BIGINT) AS max_seq
FROM v2
WHERE key >= '2' AND key <= '5'
GROUP BY tbl
ORDER BY tbl
""",
        reference="no reference analog; Delta OPTIMIZE + data-skipping "
        "stats / Iceberg manifest metrics, re-expressed minimally",
    )
)


# ---------------------------------------------------------------------------
# C34 — versioned-lake schema evolution: a column ADDED mid-log
# (Delta metaData-action analog — the commit records the merged
# column list; `sinks/versioned_lake.py` docstring "Schema evolution
# is a log action"). v0 appends the compacted early state WITHOUT
# the column; v1 key-merges the mid-window changes WITH a derived
# `mod5` column, evolving the table additively. The census reads
# BOTH versions through the log's per-version schema: v0 rows (and
# v1 rows served from pre-evolution survivor files) carry NULL for
# the later column, so the per-table non-null count and sum pin (a)
# the additive merge, (b) the NULL fill for old files, (c) that time
# travel sees the old column set (the v0 leg would fail to resolve
# `mod5` at all if the as-of schema leaked forward — the query adds
# it as a typed NULL, which only matches the oracle if the v0 read
# genuinely lacks the column's values).
#
# Scale shape: evolution costs ZERO data rewrites — old files are
# never touched; the commit carries O(columns) JSON and readers
# apply the schema at plan time (explicit read schema over plain
# parquet). That is the only affordable evolution at 100 TB.
# ---------------------------------------------------------------------------


def _c34(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    parsed = _parsed(spark, sf_dir)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    s0, s1 = mx // 3, (2 * mx) // 3

    base = (
        latest_by_key(parsed.filter(F.col("seq") <= s0), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    table = tempfile.mkdtemp(prefix="c34-vlake-") + "/state"
    VL.commit_append(spark, base.repartition(4, "key"), table)       # v0
    upd = (
        latest_by_key(
            parsed.filter((F.col("seq") > s0) & (F.col("seq") <= s1)),
            ["tbl", "key"],
            "seq",
        )
        .filter(F.col("op") != "d")
        .select(
            "tbl", "key", "op", "seq",
            (F.col("seq") % 5).cast("long").alias("mod5"),  # the NEW column
        )
    )
    VL.commit_upsert_keys(
        spark, upd.repartition(4, "key"), table, ["tbl", "key"]
    )                                                                # v1
    parts = []
    for v in (0, 1):
        snap = VL.read_table(spark, table, version=v)
        if "mod5" not in snap.columns:  # pre-evolution snapshot
            snap = snap.withColumn("mod5", F.lit(None).cast("long"))
        parts.append(
            snap.groupBy("tbl")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("mod5").alias("n_evolved"),
                F.coalesce(F.sum("mod5"), F.lit(0)).alias("sum_mod5"),
            )
            .withColumn("version", F.lit(v).cast("int"))
        )
    return ordered_result(
        parts[0].unionByName(parts[1]).select(
            "version", "tbl", "n_rows", "n_evolved", "sum_mod5"
        ),
        "version",
        "tbl",
    )


register(
    QuerySpec(
        name="c34_lake_schema_evolution",
        category="cdc",
        description="versioned-lake schema evolution: a column added "
        "by a mid-log key-merge commit (schema recorded as a log "
        "action, zero data rewrites); per-version census counts the "
        "rows that carry the new column vs the NULL-served old files",
        spark=_c34,
        oracle=cdc_parsed_cte()
        + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq, seq % 5 AS mod5 FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
v0 AS (SELECT tbl, key, CAST(NULL AS BIGINT) AS mod5 FROM base),
v1 AS (
  SELECT tbl, key, mod5 FROM upd
  UNION ALL
  SELECT b.tbl, b.key, CAST(NULL AS BIGINT) FROM base b
  WHERE NOT EXISTS (
    SELECT 1 FROM upd u WHERE u.tbl = b.tbl AND u.key = b.key)
),
census AS (
  SELECT 0 AS version, tbl, count(*) AS n_rows,
         count(mod5) AS n_evolved,
         coalesce(sum(mod5), 0) AS sum_mod5
  FROM v0 GROUP BY tbl
  UNION ALL
  SELECT 1, tbl, count(*), count(mod5), coalesce(sum(mod5), 0)
  FROM v1 GROUP BY tbl
)
SELECT CAST(version AS INT) AS version, tbl,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_evolved AS BIGINT) AS n_evolved,
       CAST(sum_mod5 AS BIGINT) AS sum_mod5
FROM census
ORDER BY version, tbl
""",
        reference="no reference analog; Delta Lake metaData schema "
        "action / mergeSchema semantics, re-expressed as a log "
        "action over plain parquet (VERDICT r11 #5)",
    )
)


# ---------------------------------------------------------------------------
# C35 — retention-aware change feed: the SAME lifecycle and census as
# c32, but after OPTIMIZE has rewritten every live file and
# vacuum(keep_versions=1, spark=...) has RECLAIMED every pre-image
# data file the commits 0..2 referenced. The feed is then served
# entirely from persisted change files: the delete/upsert deltas
# written at commit time plus the append delta back-filled by vacuum
# before it deleted the files (Delta's persisted CDF). The oracle is
# c32's VERBATIM — vacuuming the horizon must not change a single
# feed row, which is the whole retention contract (VERDICT r11 #6).
#
# Scale shape: post-vacuum consumers read O(delta) parquet per
# commit — no pre-image reads, no diff shuffles; vacuum pays the
# back-fill once for commits written before persisted CDF existed.
# ---------------------------------------------------------------------------


def _c35(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    table = build_vlake_lifecycle(spark, sf_dir, "c35")
    VL.commit_optimize(spark, table, n_files=2)          # v3, dataChange:false
    # reclaim EVERY file versions 0..2 referenced; spark= back-fills
    # the append delta first so the feed below never touches them
    VL.vacuum(table, keep_versions=1, spark=spark)
    return change_feed_census(VL.read_changes(spark, table, 0, 2))


register(
    QuerySpec(
        name="c35_lake_cdf_past_vacuum",
        category="cdc",
        description="versioned-lake change feed served PAST the "
        "vacuum horizon: optimize + vacuum reclaim every pre-image "
        "file, then read_changes(0..2) answers from persisted change "
        "files (write-time deltas + vacuum back-fill) — c32's oracle "
        "verbatim, because retention must not change the feed",
        spark=_c35,
        oracle=C32_ORACLE,
        reference="no reference analog; Delta Lake persisted "
        "change-data files + dataChange:false semantics "
        "(VERDICT r11 #6)",
    )
)


# ---------------------------------------------------------------------------
# C36 — versioned-lake change feed with UPDATE semantics: the same
# lifecycle as c32, but the key-merge commit persists its delta with
# Delta-CDF update classification (update_preimage / update_postimage
# per key present on both sides — even when byte-identical, MERGE
# touched it — plus insert for new keys) instead of the net
# insert/delete diff. The oracle restates the classification as
# keyed EXISTS joins between the two snapshots, so a wrong class, a
# lost pre-image, or a key leaking between classes changes a cell.
#
# Scale shape: the update-classified delta is CHEAPER to write than
# the net diff (two key-semi-joins over O(rows touched), no
# exceptAll shuffle), and consumers needing MERGE provenance read it
# as a plain scan — the trade is delta size (identical rewrites no
# longer cancel), which is why it is an opt-in per commit.
# ---------------------------------------------------------------------------


def build_vlake_update_lifecycle(
    spark: SparkSession, sf_dir: str, prefix: str
) -> str:
    """The c32 lifecycle with UPDATE-CLASSIFIED deltas on the merge
    commit (shared by c36 and st20): v0 append, v1 key-merge with
    update_semantics=True, v2 copy-on-write delete."""
    import tempfile

    from graal_cdc_spark.sinks import versioned_lake as VL

    parsed = _parsed(spark, sf_dir)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    s0, s1 = mx // 3, (2 * mx) // 3
    base = (
        latest_by_key(parsed.filter(F.col("seq") <= s0), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    table = tempfile.mkdtemp(prefix=f"{prefix}-vlake-") + "/state"
    VL.commit_append(spark, base.repartition(4, "key"), table)       # v0
    upd = (
        latest_by_key(
            parsed.filter((F.col("seq") > s0) & (F.col("seq") <= s1)),
            ["tbl", "key"],
            "seq",
        )
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    VL.commit_upsert_keys(
        spark,
        upd.repartition(4, "key"),
        table,
        ["tbl", "key"],
        update_semantics=True,                                       # v1
    )
    VL.commit_delete_where(spark, table, "CAST(key AS BIGINT) % 7 = 2")  # v2
    return table


C36_ORACLE = (
    cdc_parsed_cte()
    + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
v1 AS (
  SELECT * FROM upd
  UNION ALL
  SELECT b.* FROM base b WHERE NOT EXISTS (
    SELECT 1 FROM upd u WHERE u.tbl = b.tbl AND u.key = b.key)
),
feed AS (
  SELECT 0 AS version, 'insert' AS change_type, * FROM base
  UNION ALL
  SELECT 1, 'update_preimage', b.* FROM base b WHERE EXISTS (
    SELECT 1 FROM upd u WHERE u.tbl = b.tbl AND u.key = b.key)
  UNION ALL
  SELECT 1, 'update_postimage', u.* FROM upd u WHERE EXISTS (
    SELECT 1 FROM base b WHERE b.tbl = u.tbl AND b.key = u.key)
  UNION ALL
  SELECT 1, 'insert', u.* FROM upd u WHERE NOT EXISTS (
    SELECT 1 FROM base b WHERE b.tbl = u.tbl AND b.key = u.key)
  UNION ALL
  SELECT 2, 'delete', * FROM v1 WHERE CAST(key AS BIGINT) % 7 = 2
)
SELECT CAST(version AS INT) AS version, change_type, tbl,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
       CAST(max(seq) AS BIGINT) AS max_seq
FROM feed
GROUP BY version, change_type, tbl
ORDER BY version, change_type, tbl
"""
)


def _c36(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    table = build_vlake_update_lifecycle(spark, sf_dir, "c36")
    return change_feed_census(VL.read_changes(spark, table, 0, 2))


register(
    QuerySpec(
        name="c36_lake_update_feed",
        category="cdc",
        description="versioned-lake change feed with Delta-CDF "
        "update classification: the key-merge commit feeds "
        "update_preimage/update_postimage per overlapping key and "
        "insert for new keys — census per (version, change type, "
        "table)",
        spark=_c36,
        oracle=C36_ORACLE,
        reference="no reference analog; Delta Lake Change Data Feed "
        "update_preimage/update_postimage classification (r12)",
    )
)


# ---------------------------------------------------------------------------
# C37 — versioned-lake column RENAME + DROP + RE-ADD (Delta
# column-mapping analog, r12): v0 appends the compacted early state;
# v1 renames op -> op_code (metadata-only, physical name pinned, zero
# rewrites); v2 drops op_code (metadata-only, physical name RETIRED);
# v3 appends the mid-window changes with a RE-ADDED op_code column
# (same logical name, fresh physical identity). The census reads v0
# (old name, all rows populated) and the head (new name: ONLY v3's
# rows may be non-null — if the drop failed to retire the physical
# name, v0's old op bytes would resurrect under the re-added column
# and inflate n_named). The oracle restates both snapshots with plain
# aliasing, so a leaked value, a lost rename, or a broken NULL fill
# changes a cell.
#
# Scale shape: rename and drop cost O(columns) JSON — no data file is
# touched; the head read is one plan-time projection over physical
# names. That is the only affordable column evolution at 100 TB.
# ---------------------------------------------------------------------------


def _c37(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    parsed = _parsed(spark, sf_dir)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    s0, s1 = mx // 3, (2 * mx) // 3
    base = (
        latest_by_key(parsed.filter(F.col("seq") <= s0), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    table = tempfile.mkdtemp(prefix="c37-vlake-") + "/state"
    VL.commit_append(spark, base.repartition(4, "key"), table)   # v0
    VL.rename_column(table, "op", "op_code")                     # v1
    VL.drop_column(table, "op_code")                             # v2
    upd = (
        latest_by_key(
            parsed.filter((F.col("seq") > s0) & (F.col("seq") <= s1)),
            ["tbl", "key"],
            "seq",
        )
        .filter(F.col("op") != "d")
        .select("tbl", "key", F.col("op").alias("op_code"), "seq")
    )
    VL.commit_append(spark, upd.repartition(4, "key"), table)    # v3
    v0 = VL.read_table(spark, table, version=0).select(
        "tbl", "key", F.col("op").alias("named"), "seq"
    )
    head = VL.read_table(spark, table).select(
        "tbl", "key", F.col("op_code").alias("named"), "seq"
    )
    parts = []
    for ver, snap in ((0, v0), (3, head)):
        parts.append(
            snap.groupBy("tbl")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("key").alias("n_keys"),
                F.count("named").alias("n_named"),
                F.max("seq").alias("max_seq"),
            )
            .withColumn("version", F.lit(ver).cast("int"))
        )
    return ordered_result(
        parts[0].unionByName(parts[1]).select(
            "version", "tbl", "n_rows", "n_keys", "n_named", "max_seq"
        ),
        "version",
        "tbl",
    )


register(
    QuerySpec(
        name="c37_lake_column_mapping",
        category="cdc",
        description="versioned-lake column rename + drop + re-add "
        "over pinned physical names: metadata-only commits, zero "
        "rewrites, retired physicals keep dropped bytes from "
        "resurrecting under a re-added column — per-version census "
        "of rows carrying the mapped column",
        spark=_c37,
        oracle=cdc_parsed_cte()
        + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
head AS (
  SELECT tbl, key, CAST(NULL AS VARCHAR) AS named, seq FROM base
  UNION ALL
  SELECT tbl, key, op, seq FROM upd
),
census AS (
  SELECT 0 AS version, tbl, count(*) AS n_rows,
         count(DISTINCT key) AS n_keys, count(op) AS n_named,
         max(seq) AS max_seq
  FROM base GROUP BY tbl
  UNION ALL
  SELECT 3, tbl, count(*), count(DISTINCT key), count(named), max(seq)
  FROM head GROUP BY tbl
)
SELECT CAST(version AS INT) AS version, tbl,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(n_named AS BIGINT) AS n_named,
       CAST(max_seq AS BIGINT) AS max_seq
FROM census
ORDER BY version, tbl
""",
        reference="no reference analog; Delta Lake column mapping "
        "(rename/drop over stable physical names), re-expressed "
        "minimally (r12)",
    )
)


# ---------------------------------------------------------------------------
# C38 — versioned-lake PARTITION columns (r12; Delta partitionBy /
# hive-layout analog): the c32 lifecycle rebuilt on a table declared
# `partition_by=["tbl"]` at its first commit. Every write in the
# lifecycle — the v0 append, the v1 key-merge's survivor rewrite AND
# incoming rows, the v2 copy-on-write delete's survivors — stages one
# file per partition value, records the exact value in its add action,
# and the recorded values double as [v, v] pruning stats. The census
# reads leg 'all' (the full head) and leg 'pruned' (prune={"tbl":
# ("orders", "orders")}, which skips every non-orders file from log
# metadata alone before Spark lists a path). Both legs must agree with
# the declarative restatement — a file landed in the wrong partition,
# a survivor rewrite that lost the layout, or pruning that dropped a
# row changes a cell.
#
# Scale shape: partition pruning is THE layout lever at 100 TB — a
# per-tenant or per-day consumer plans O(its partition), not O(table);
# the partition columns stay in the data files so the read is still
# one ordinary multi-file parquet relation with full pushdown.
# ---------------------------------------------------------------------------


def _c38(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    parsed = _parsed(spark, sf_dir)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    s0, s1 = mx // 3, (2 * mx) // 3
    base = (
        latest_by_key(parsed.filter(F.col("seq") <= s0), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    table = tempfile.mkdtemp(prefix="c38-vlake-") + "/state"
    VL.commit_append(
        spark, base.repartition(4, "key"), table, partition_by=["tbl"]
    )                                                                # v0
    upd = (
        latest_by_key(
            parsed.filter((F.col("seq") > s0) & (F.col("seq") <= s1)),
            ["tbl", "key"],
            "seq",
        )
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    VL.commit_upsert_keys(
        spark, upd.repartition(4, "key"), table, ["tbl", "key"]
    )                                                                # v1
    VL.commit_delete_where(spark, table, "CAST(key AS BIGINT) % 7 = 2")  # v2
    legs = []
    for leg, df in (
        ("all", VL.read_table(spark, table)),
        (
            "pruned",
            VL.read_table(
                spark, table, prune={"tbl": ("orders", "orders")}
            ).filter(F.col("tbl") == "orders"),
        ),
    ):
        legs.append(
            df.groupBy("tbl")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("key").alias("n_keys"),
                F.max("seq").alias("max_seq"),
            )
            .withColumn("leg", F.lit(leg))
        )
    return ordered_result(
        legs[0].unionByName(legs[1]).select(
            "leg", "tbl", "n_rows", "n_keys", "max_seq"
        ),
        "leg",
        "tbl",
    )


register(
    QuerySpec(
        name="c38_lake_partitioned_prune",
        category="cdc",
        description="versioned-lake partition columns: the append/"
        "merge/delete lifecycle on a table partitioned by tbl "
        "(layout preserved by every rewrite), censused from the full "
        "head and from a partition-pruned read that skips every "
        "non-matching file from log metadata alone",
        spark=_c38,
        oracle=cdc_parsed_cte()
        + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
v1 AS (
  SELECT * FROM upd
  UNION ALL
  SELECT b.* FROM base b WHERE NOT EXISTS (
    SELECT 1 FROM upd u WHERE u.tbl = b.tbl AND u.key = b.key)
),
v2 AS (SELECT * FROM v1 WHERE CAST(key AS BIGINT) % 7 <> 2),
census AS (
  SELECT 'all' AS leg, tbl, count(*) AS n_rows,
         count(DISTINCT key) AS n_keys, max(seq) AS max_seq
  FROM v2 GROUP BY tbl
  UNION ALL
  SELECT 'pruned', tbl, count(*), count(DISTINCT key), max(seq)
  FROM v2 WHERE tbl = 'orders' GROUP BY tbl
)
SELECT leg, tbl,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(max_seq AS BIGINT) AS max_seq
FROM census
ORDER BY leg, tbl
""",
        reference="no reference analog; Delta Lake partition columns "
        "/ hive layout + partition pruning, re-expressed as log "
        "actions over plain parquet (r12)",
    )
)


# ---------------------------------------------------------------------------
# C39 — versioned-lake CHECK constraints (r12; Delta ADD CONSTRAINT
# analog): v0 appends the compacted early state; v1 adds `seq >= 0`
# as a metadata-only commit (validated against the existing data with
# a distributed scan); a VIOLATING append (the mid-window rows with
# negated seqs) is then attempted and MUST be rejected atomically —
# the query itself raises if enforcement admitted it; v2 appends the
# clean mid-window rows. The census pins per-table row/key counts,
# min_seq (a negative value means a violator leaked into the table)
# and n_versions == 3 (a 4 means the rejected append still claimed a
# version — rejection wasn't atomic).
#
# Scale shape: enforcement is ONE combined JVM-side filter over the
# incoming batch (no shuffle, no Python, short-circuits at the first
# violation via limit(1)); the constraint itself is O(1) commit JSON,
# and readers never pay anything — bad rows never enter the log.
# ---------------------------------------------------------------------------


def _c39(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    parsed = _parsed(spark, sf_dir)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    s0, s1 = mx // 3, (2 * mx) // 3
    base = (
        latest_by_key(parsed.filter(F.col("seq") <= s0), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    table = tempfile.mkdtemp(prefix="c39-vlake-") + "/state"
    VL.commit_append(spark, base.repartition(4, "key"), table)       # v0
    VL.add_constraint(table, "seq_nonneg", "seq >= 0", spark=spark)  # v1
    upd = (
        latest_by_key(
            parsed.filter((F.col("seq") > s0) & (F.col("seq") <= s1)),
            ["tbl", "key"],
            "seq",
        )
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    bad = upd.withColumn("seq", (-F.col("seq") - F.lit(1)).cast("long"))
    try:
        VL.commit_append(spark, bad.repartition(4, "key"), table)
        raise RuntimeError("c39: constraint admitted violating rows")
    except VL.ConstraintViolation:
        pass  # the contract: rejected atomically, nothing committed
    VL.commit_append(spark, upd.repartition(4, "key"), table)        # v2
    n_versions = VL.latest_version(table) + 1
    return ordered_result(
        VL.read_table(spark, table)
        .groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("key").alias("n_keys"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )
        .withColumn("n_versions", F.lit(n_versions).cast("int")),
        "tbl",
    )


register(
    QuerySpec(
        name="c39_lake_constraint_gate",
        category="cdc",
        description="versioned-lake CHECK constraints: a violating "
        "append is rejected atomically (no version claimed, no row "
        "visible) while clean appends pass — per-table census with "
        "min_seq (violator leak detector) and the version count",
        spark=_c39,
        oracle=cdc_parsed_cte()
        + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
head AS (
  SELECT * FROM base
  UNION ALL
  SELECT * FROM upd
)
SELECT tbl,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
       CAST(min(seq) AS BIGINT) AS min_seq,
       CAST(max(seq) AS BIGINT) AS max_seq,
       CAST(3 AS INT) AS n_versions
FROM head
GROUP BY tbl
ORDER BY tbl
""",
        reference="no reference analog; Delta Lake CHECK constraints "
        "(ALTER TABLE ADD CONSTRAINT), re-expressed as log metadata "
        "with commit-time enforcement (r12)",
    )
)


# ---------------------------------------------------------------------------
# C40 — versioned-lake MERGE with clauses (r12; Delta MERGE INTO
# analog): the ATOMIC CDC-apply. v0 appends the compacted early
# state; v1 applies the mid-window change stream — INCLUDING its
# op='d' rows — as ONE commit_merge(delete_when="op = 'd'"): matched
# deletes drop the key, other matched rows replace, new keys insert,
# and a delete for an unseen key is a no-op that must not insert.
# Before commit_merge this apply needed commit_upsert_keys +
# commit_delete_where — TWO versions with an inconsistent state
# visible between them. The census pins the end state per table plus
# n_versions == 2 (the atomicity detector: a two-commit apply or a
# no-op delete that claimed a version reads 3).
#
# Scale shape: identical to the upsert — incoming keys probe each
# live file with a semi-join, survivors rewrite once, the net delta
# persists at write time; the delete clause adds NO extra pass (one
# filter splits the source stream).
# ---------------------------------------------------------------------------


def _c40(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    parsed = _parsed(spark, sf_dir)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    s0, s1 = mx // 3, (2 * mx) // 3
    base = (
        latest_by_key(parsed.filter(F.col("seq") <= s0), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    table = tempfile.mkdtemp(prefix="c40-vlake-") + "/state"
    VL.commit_append(spark, base.repartition(4, "key"), table)       # v0
    changes = latest_by_key(
        parsed.filter((F.col("seq") > s0) & (F.col("seq") <= s1)),
        ["tbl", "key"],
        "seq",
    ).select("tbl", "key", "op", "seq")  # op='d' rows KEPT: the clause input
    VL.commit_merge(
        spark,
        changes.repartition(4, "key"),
        table,
        ["tbl", "key"],
        delete_when="op = 'd'",
    )                                                                # v1
    n_versions = VL.latest_version(table) + 1
    return ordered_result(
        VL.read_table(spark, table)
        .groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("key").alias("n_keys"),
            F.max("seq").alias("max_seq"),
        )
        .withColumn("n_versions", F.lit(n_versions).cast("int")),
        "tbl",
    )


# shared by c40 (one-commit batch apply) and st21 (per-micro-batch
# streaming apply): the END STATE is identical by construction —
# latest_by_key gives one row per key, so any disjoint batching of the
# change stream merges to the same table; only n_versions differs.
def C40_ORACLE(n_versions: int) -> str:
    return (
        cdc_parsed_cte()
        + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1
),
merged AS (
  SELECT tbl, key, op, seq FROM upd WHERE op <> 'd'
  UNION ALL
  SELECT b.* FROM base b WHERE NOT EXISTS (
    SELECT 1 FROM upd u WHERE u.tbl = b.tbl AND u.key = b.key)
)
SELECT tbl,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
       CAST(max(seq) AS BIGINT) AS max_seq,
       CAST(""" + str(int(n_versions)) + """ AS INT) AS n_versions
FROM merged
GROUP BY tbl
ORDER BY tbl
"""
    )


register(
    QuerySpec(
        name="c40_lake_merge_apply",
        category="cdc",
        description="versioned-lake MERGE with clauses: the change "
        "stream (deletes included) applied as ONE atomic commit — "
        "matched deletes drop, matched rows replace, new keys "
        "insert, unseen-key deletes no-op; census pins the end state "
        "and the version count",
        spark=_c40,
        oracle=C40_ORACLE(2),
        reference="no reference analog; Delta Lake MERGE INTO "
        "whenMatchedDelete/whenMatchedUpdate/whenNotMatchedInsert "
        "clauses, re-expressed as one atomic log commit (r12)",
    )
)


# ---------------------------------------------------------------------------
# C41 — versioned-lake PARTITION EVOLUTION (r13; Delta rewriting-
# commit analog, VERDICT r12 missing #2): v0 appends the compacted
# early state UNPARTITIONED; v1 upserts the mid window; v2 is
# `commit_repartition(["tbl"])` — every live file rewritten under the
# new hive layout as ONE data-identical commit (dataChange: false,
# exactly like OPTIMIZE: the change feed MUST serve zero rows for it,
# asserted in-query with zero I/O); v3 upserts the late window, which
# INHERITS the evolved layout. The census reads three legs: the head,
# a partition-PRUNED head read (new-layout pruning from log metadata
# alone), and a TIME TRAVEL to v1 — the pre-evolution state under the
# OLD (un)layout, pinned equal to the v1 derivation. n_versions == 4
# is the atomicity detector; the in-query layout asserts
# (table_partition_cols at v1 == [], head == ["tbl"]) make a silent
# layout regression a hard failure rather than a census drift.
#
# Scale shape: the repartition is one distributed read of the live
# set + one dynamic-partition-insert staged write (never a per-file
# job — the _locate_touched discipline applies to every write path);
# old versions keep their own layout because partition_cols folds
# per commit.
# ---------------------------------------------------------------------------


def _c41(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    parsed = _parsed(spark, sf_dir)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    s0, s1 = mx // 3, (2 * mx) // 3
    base = (
        latest_by_key(parsed.filter(F.col("seq") <= s0), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    table = tempfile.mkdtemp(prefix="c41-vlake-") + "/state"
    VL.commit_append(spark, base.repartition(4, "key"), table)       # v0
    upd = (
        latest_by_key(
            parsed.filter((F.col("seq") > s0) & (F.col("seq") <= s1)),
            ["tbl", "key"],
            "seq",
        )
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    VL.commit_upsert_keys(
        spark, upd.repartition(4, "key"), table, ["tbl", "key"]
    )                                                                # v1
    VL.commit_repartition(spark, table, ["tbl"])                     # v2
    if VL.table_partition_cols(table, version=1) != []:
        raise RuntimeError("c41: v1 must predate the layout")
    if VL.table_partition_cols(table) != ["tbl"]:
        raise RuntimeError("c41: head must carry the evolved layout")
    if VL.commit_body(table, 2).get("dataChange", True) is not False:
        raise RuntimeError("c41: repartition must be data-identical")
    if VL.read_changes(spark, table, 2, 2).count() != 0:
        raise RuntimeError("c41: change feed must skip the rewrite")
    late = (
        latest_by_key(parsed.filter(F.col("seq") > s1), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    VL.commit_upsert_keys(
        spark, late.repartition(4, "key"), table, ["tbl", "key"]
    )                                                                # v3
    n_versions = VL.latest_version(table) + 1
    legs = []
    for leg, df in (
        ("head", VL.read_table(spark, table)),
        (
            "pruned",
            VL.read_table(
                spark, table, prune={"tbl": ("orders", "orders")}
            ).filter(F.col("tbl") == "orders"),
        ),
        ("travel", VL.read_table(spark, table, version=1)),
    ):
        legs.append(
            df.groupBy("tbl")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("key").alias("n_keys"),
                F.max("seq").alias("max_seq"),
            )
            .withColumn("leg", F.lit(leg))
        )
    out = legs[0].unionByName(legs[1]).unionByName(legs[2])
    return ordered_result(
        out.select("leg", "tbl", "n_rows", "n_keys", "max_seq")
        .withColumn("n_versions", F.lit(n_versions).cast("int")),
        "leg",
        "tbl",
    )


register(
    QuerySpec(
        name="c41_lake_repartition_census",
        category="cdc",
        description="versioned-lake partition evolution: a live "
        "unpartitioned table repartitioned by tbl mid-log as one "
        "data-identical rewriting commit (change feed serves zero "
        "rows for it); later upserts inherit the layout; census "
        "over the head, a new-layout partition-pruned read, and a "
        "time travel to the pre-evolution version",
        spark=_c41,
        oracle=cdc_parsed_cte()
        + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
v1 AS (
  SELECT * FROM upd
  UNION ALL
  SELECT b.* FROM base b WHERE NOT EXISTS (
    SELECT 1 FROM upd u WHERE u.tbl = b.tbl AND u.key = b.key)
),
late AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq > CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
v3 AS (
  SELECT * FROM late
  UNION ALL
  SELECT s.* FROM v1 s WHERE NOT EXISTS (
    SELECT 1 FROM late l WHERE l.tbl = s.tbl AND l.key = s.key)
),
census AS (
  SELECT 'head' AS leg, tbl, count(*) AS n_rows,
         count(DISTINCT key) AS n_keys, max(seq) AS max_seq
  FROM v3 GROUP BY tbl
  UNION ALL
  SELECT 'pruned', tbl, count(*), count(DISTINCT key), max(seq)
  FROM v3 WHERE tbl = 'orders' GROUP BY tbl
  UNION ALL
  SELECT 'travel', tbl, count(*), count(DISTINCT key), max(seq)
  FROM v1 GROUP BY tbl
)
SELECT leg, tbl,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(max_seq AS BIGINT) AS max_seq,
       CAST(4 AS INT) AS n_versions
FROM census
ORDER BY leg, tbl
""",
        reference="no reference analog; Delta Lake partition "
        "evolution as an explicit rewriting commit (dataChange: "
        "false), re-expressed as log actions over plain parquet "
        "(r13)",
    )
)


# ---------------------------------------------------------------------------
# C42 — versioned-lake INCREMENTAL OPTIMIZE (r13; Delta minFileSize
# analog, the only compaction form that works at 100 TB): v0 appends
# the compacted early state as ONE well-sized file; the mid window's
# changes then land as FOUR small appends (the tail a CDC feed
# accumulates); `commit_optimize(small_file_rows=...)` folds ONLY
# the tail — the in-query asserts pin that the big v0 file keeps its
# exact path (zero I/O for it), the live set shrinks to 2 files, the
# commit is dataChange: false, and a second run is a commit-free
# no-op (idempotence). The census is the end state per table +
# n_versions == 6 (v0..v4 + one optimize; a 7 means the no-op wrote
# a commit).
#
# Scale shape: tail selection comes from the LOG's per-file row
# counts (zero I/O to decide); the rewrite reads O(tail), never the
# table.
# ---------------------------------------------------------------------------


def _c42(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from graal_cdc_spark.sinks import versioned_lake as VL

    configure(spark)
    parsed = _parsed(spark, sf_dir)
    mx = parsed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    s0, s1 = mx // 3, (2 * mx) // 3
    base = (
        latest_by_key(parsed.filter(F.col("seq") <= s0), ["tbl", "key"], "seq")
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    table = tempfile.mkdtemp(prefix="c42-vlake-") + "/state"
    VL.commit_append(spark, base, table, n_files=1)                  # v0
    upd = (
        latest_by_key(
            parsed.filter((F.col("seq") > s0) & (F.col("seq") <= s1)),
            ["tbl", "key"],
            "seq",
        )
        .filter(F.col("op") != "d")
        .select("tbl", "key", "op", "seq")
    )
    # four small appends: the mid-window rows quartered by a
    # DETERMINISTIC row_number over the total (tbl, key) order (a
    # hash split can leave a quarter empty at small SF — the st21
    # lesson); appends keep duplicate keys, so the oracle is simply
    # base UNION ALL upd
    from pyspark.sql import Window as _W

    sliced = upd.withColumn(
        "__rn",
        F.row_number().over(_W.orderBy("tbl", "key")) - 1,
    )
    for i in range(4):                                               # v1..v4
        VL.commit_append(
            spark,
            sliced.filter(F.col("__rn") % 4 == i).drop("__rn"),
            table,
            n_files=1,
        )
    before = VL.live_files(table)
    # the data-derived threshold: the v0 base file is the one big
    # file at every SF; everything under its row count is tail
    thr = max(before.values())
    big = {p for p, r in before.items() if r >= thr}
    if len(before) != 5 or len(big) != 1:
        raise RuntimeError(f"c42: unexpected layout {sorted(before.values())}")
    v = VL.commit_optimize(spark, table, n_files=1, small_file_rows=thr)  # v5
    after = VL.live_files(table)
    if not big <= set(after):
        raise RuntimeError("c42: incremental optimize rewrote the big file")
    if len(after) != 2:
        raise RuntimeError(f"c42: tail not folded ({len(after)} files)")
    if VL.commit_body(table, v).get("dataChange", True) is not False:
        raise RuntimeError("c42: optimize must be data-identical")
    if VL.commit_optimize(spark, table, n_files=1, small_file_rows=thr) != v:
        raise RuntimeError("c42: no-op rerun wrote a commit")
    n_versions = VL.latest_version(table) + 1
    return ordered_result(
        VL.read_table(spark, table)
        .groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("key").alias("n_keys"),
            F.max("seq").alias("max_seq"),
        )
        .withColumn("n_versions", F.lit(n_versions).cast("int")),
        "tbl",
    )


register(
    QuerySpec(
        name="c42_lake_incremental_optimize_census",
        category="cdc",
        description="versioned-lake incremental OPTIMIZE (Delta "
        "minFileSize analog): only the small-file tail is rewritten "
        "(selected from log row counts, zero I/O to decide), the big "
        "file keeps its exact path, the rerun is a commit-free no-op "
        "— end-state census with n_versions==6 as the idempotence pin",
        spark=_c42,
        oracle=cdc_parsed_cte()
        + """
, mx AS (SELECT max(seq) AS m FROM cdc_parsed),
base AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx WHERE seq <= CAST(m // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
upd AS (
  SELECT tbl, key, op, seq FROM (
    SELECT tbl, key, op, seq,
           row_number() OVER (PARTITION BY tbl, key
                              ORDER BY seq DESC) AS rn
    FROM cdc_parsed, mx
    WHERE seq > CAST(m // 3 AS BIGINT)
      AND seq <= CAST((2 * m) // 3 AS BIGINT)
  ) t WHERE rn = 1 AND op <> 'd'
),
merged AS (
  SELECT * FROM base
  UNION ALL
  SELECT * FROM upd
)
SELECT tbl,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
       CAST(max(seq) AS BIGINT) AS max_seq,
       CAST(6 AS INT) AS n_versions
FROM merged
GROUP BY tbl
ORDER BY tbl
""",
        reference="no reference analog; Delta Lake OPTIMIZE "
        "minFileSize incremental compaction, re-expressed over the "
        "log's per-file row counts (r13)",
    )
)
