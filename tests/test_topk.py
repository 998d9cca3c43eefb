"""tree_topk (operators/topk.py) — the bounded-memory large-k top-k.

Correctness against the naive ORDER BY ... LIMIT on adversarial
shapes (duplicate order values across buckets, k >= n, skew), and
the argument contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graal_cdc_spark.operators.topk import tree_topk


def _df(spark, rows):
    return spark.createDataFrame(rows, "id BIGINT, v BIGINT")


def _naive(rows, k):
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    return [(*r, i + 1) for i, r in enumerate(ordered[:k])]


@pytest.mark.parametrize("k,fanout,buckets", [(5, 2, 8), (17, 4, 16), (100, 8, 64)])
def test_matches_naive_with_heavy_ties(spark, k, fanout, buckets):
    # v = id % 7 — every order value repeats ~across all buckets, so
    # tie-break correctness at the k boundary is exercised hard
    rows = [(i, i % 7) for i in range(500)]
    got = tree_topk(
        _df(spark, rows),
        [F.col("v").desc(), F.col("id")],
        k=k, fanout=fanout, initial_buckets=buckets,
    ).collect()
    assert [(r["id"], r["v"], r["rank"]) for r in got] == _naive(rows, k)


def test_k_exceeds_row_count(spark):
    rows = [(i, 10 - i) for i in range(6)]
    got = tree_topk(
        _df(spark, rows), [F.col("v").desc(), F.col("id")], k=50, fanout=2,
    ).collect()
    assert [(r["id"], r["v"], r["rank"]) for r in got] == _naive(rows, 50)


def test_single_initial_bucket_degenerates_to_take_ordered(spark):
    rows = [(i, i) for i in range(20)]
    got = tree_topk(
        _df(spark, rows), [F.col("v").desc(), F.col("id")],
        k=3, initial_buckets=1,
    ).collect()
    assert [(r["id"], r["v"], r["rank"]) for r in got] == _naive(rows, 3)


def test_bucket_assignment_never_drops_a_winner(spark):
    """Adversarial bucketing: hash only on a CONSTANT column — every
    row lands in one bucket, the worst imbalance possible — the
    result must still be exact (per-bucket truncation is safe for ANY
    assignment)."""
    rows = [(i, 1000 - i) for i in range(300)]
    df = _df(spark, rows).withColumn("c", F.lit("same"))
    got = tree_topk(
        df, [F.col("v").desc(), F.col("id")],
        k=10, bucket_cols=["c"], fanout=4, initial_buckets=16,
    ).select("id", "v", "rank").collect()
    assert [(r["id"], r["v"], r["rank"]) for r in got] == _naive(rows, 10)


def test_argument_contract(spark):
    df = _df(spark, [(1, 1)])
    with pytest.raises(ValueError, match="k must be"):
        tree_topk(df, [F.col("v")], k=0)
    with pytest.raises(ValueError, match="fanout"):
        tree_topk(df, [F.col("v")], k=1, fanout=1)


# ---------------------------------------------------------------------------
# per_stratum_topk_salted (operators/sampling.py) — the skew-safe
# two-level cap promised by l79's scale note
# ---------------------------------------------------------------------------


def test_salted_stratum_topk_equals_single_level(spark):
    from graal_cdc_spark.operators.sampling import (
        per_stratum_topk,
        per_stratum_topk_salted,
    )
    from graal_cdc_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    a = per_stratum_topk(docs, "text", "source", k=7, id_col="doc_id")
    b = per_stratum_topk_salted(
        docs, "text", "source", k=7, id_col="doc_id", n_salts=5
    )
    key = lambda df: sorted(  # noqa: E731
        (r["source"], r["doc_id"]) for r in df.collect()
    )
    assert key(a) == key(b)
    assert set(a.columns) == set(b.columns)


def test_salted_stratum_topk_skewed_stratum(spark):
    """One stratum holds 90% of rows — the exact case the salting
    exists for; the cut must still match the single-level answer."""
    from graal_cdc_spark.operators.sampling import (
        per_stratum_topk,
        per_stratum_topk_salted,
    )

    rows = [(i, f"doc-{i}", "hot" if i % 10 else "cold") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, src STRING")
    a = per_stratum_topk(df, "text", "src", k=25, id_col="doc_id")
    b = per_stratum_topk_salted(df, "text", "src", k=25, id_col="doc_id")
    key = lambda d: sorted(  # noqa: E731
        (r["src"], r["doc_id"]) for r in d.collect()
    )
    assert key(a) == key(b)


def test_salted_stratum_topk_plan_uses_group_limit(spark):
    """Both rank stages must run as WindowGroupLimit (per-task k-heap,
    no full shard sort), and the second window's input is the
    pre-truncated frame — visible as two Window operators with the
    group-limit optimization applied."""
    from graal_cdc_spark.operators.sampling import per_stratum_topk_salted
    from graal_cdc_spark.plans import audit
    from graal_cdc_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    a = audit(
        per_stratum_topk_salted(docs, "text", "source", k=7, id_col="doc_id")
    )
    assert a.plan.count("WindowGroupLimit") >= 2, a.plan
    assert a.python_evals == 0


def test_property_tree_topk_equals_naive(spark):
    """Arbitrary value multisets, k, fanout, and bucket counts: the
    tree merge equals the naive sorted-prefix answer exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-5, max_value=5), min_size=1, max_size=60
        ),
        k=st.integers(min_value=1, max_value=12),
        fanout=st.integers(min_value=2, max_value=5),
        buckets=st.integers(min_value=1, max_value=30),
    )
    def prop(vals, k, fanout, buckets):
        rows = [(i, v) for i, v in enumerate(vals)]
        got = tree_topk(
            _df(spark, rows),
            [F.col("v").desc(), F.col("id")],
            k=k, fanout=fanout, initial_buckets=buckets,
        ).collect()
        assert [(r["id"], r["v"], r["rank"]) for r in got] == _naive(rows, k)

    prop()
