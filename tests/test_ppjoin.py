"""Prefix-filtered exact Jaccard (r13 optimization round).

``jaccard_pairs_from_shingles`` was rewritten from the full shingle
self-join (output = Σ_s df(s)² collision rows) to the All-Pairs/PPJoin
candidate shape: global (df, shingle) rarity order, per-doc prefix
index, length + positional candidate pruning, exact set-intersection
verify. These tests pin the REWRITE'S contract: the output — pairs AND
jaccard values — is identical to the straightforward quadratic form on
real data and on adversarial corners (the pruning filters are only
ever allowed to drop pairs the exact verify would drop anyway).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graal_cdc_spark.operators.dedup import jaccard_pairs_from_shingles
from graal_cdc_spark.operators.text import char_shingles


def _reference_pairs(sh, id_col, threshold):
    """The pre-r13 full self-join form — kept here as the oracle for
    the rewrite (same arithmetic: bigint counts, double division,
    round 4)."""
    sh = sh.dropDuplicates([id_col, "shingle"])
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def _assert_same(new_df, ref_df):
    new_rows = sorted(map(tuple, new_df.collect()))
    ref_rows = sorted(map(tuple, ref_df.collect()))
    assert new_rows == ref_rows


@pytest.mark.parametrize("threshold", [0.5, 0.8, 1.0])
def test_ppjoin_equals_full_self_join_on_real_docs(spark, threshold):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = char_shingles(docs, "doc_id", "text", 5, distinct=False)
    _assert_same(
        jaccard_pairs_from_shingles(sh, "doc_id", threshold),
        _reference_pairs(sh, "doc_id", threshold),
    )


def test_ppjoin_adversarial_corners(spark):
    # exact dups, a proper subset (high containment, sub-threshold
    # jaccard), disjoint sets, a single-shingle doc, and two docs
    # whose only shared shingle is their globally rarest vs most
    # common — exercises prefix boundaries on both sides
    rows = [
        (1, "aaaaabbbbb"),          # dup of 2
        (2, "aaaaabbbbb"),
        (3, "aaaaabbbbbccccc"),     # superset of 1/2
        (4, "zzzzz"),               # single shingle
        (5, "zzzzz"),               # dup of 4
        (6, "qqqqqrrrrr"),          # disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = char_shingles(docs, "doc_id", "text", 5, distinct=False)
    for t in (0.3, 0.8, 1.0):
        _assert_same(
            jaccard_pairs_from_shingles(sh, "doc_id", t),
            _reference_pairs(sh, "doc_id", t),
        )


def test_ppjoin_prefix_length_never_degenerate(spark):
    # t = 1.0 (t_bp = 10000) must still index >= 1 shingle per doc:
    # plen = n - ceil(n) + 1 = 1 — exact dups must still collide
    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "abcdefgh")], "doc_id long, text string"
    )
    sh = char_shingles(docs, "doc_id", "text", 5, distinct=False)
    out = jaccard_pairs_from_shingles(sh, "doc_id", 1.0).collect()
    assert [(r.doc_a, r.doc_b, float(r.jaccard)) for r in out] == [(1, 2, 1.0)]
