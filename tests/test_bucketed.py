"""Bucketed-layout tests: a join between compatibly-bucketed tables
runs with ZERO shuffle exchanges — the write-once/join-many layout the
silver CDC layer uses at scale."""

from __future__ import annotations

import uuid

from graal_cdc_spark.plans import audit
from graal_cdc_spark.sources.bucketed import bucketed_join_ready, write_bucketed
from graal_cdc_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        t_orders,
        ["o_orderkey"],
        n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        t_lineitem,
        ["l_orderkey"],
        n_buckets=8,
        sort_cols=["l_orderkey"],
    )
    try:
        assert bucketed_join_ready(spark, t_orders, t_lineitem) is False  # diff key names
        o, li = spark.table(t_orders), spark.table(t_lineitem)

        # force the shuffle-join path so the assertion is about
        # bucketing, not broadcast
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = li.join(o, li.l_orderkey == o.o_orderkey)
            a = audit(joined)
            assert a.sortmerge_joins >= 1
            assert a.shuffles == 0, f"bucketed join shuffled:\n{a.plan}"

            # and it computes the same thing as the unbucketed join
            li_p = load_table(spark, sf_dir, "lineitem")
            o_p = load_table(spark, sf_dir, "orders")
            want = li_p.join(o_p, li_p.l_orderkey == o_p.o_orderkey).count()
            assert joined.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")


def test_bucketed_aggregation_has_no_exchange(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    t = f"b_li_{suffix}"
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        t,
        ["l_orderkey"],
        n_buckets=8,
    )
    try:
        from pyspark.sql import functions as F

        agg = spark.table(t).groupBy("l_orderkey").agg(F.sum("l_quantity"))
        a = audit(agg)
        assert a.shuffles == 0, f"bucketed agg shuffled:\n{a.plan}"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
