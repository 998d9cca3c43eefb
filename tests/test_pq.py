"""Product quantization (operators/pq.py) — the ANN family's
memory-bounded member. Covers codebook determinism, encode/ADC
correctness against a brute-force integer twin, recall vs exact L2,
and the plan contract (map-side encode, no shuffle before top-k)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graal_cdc_spark.operators.clustering import quantize_points
from graal_cdc_spark.operators.pq import (
    _adc_tables,
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)
from graal_cdc_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
M, K = 8, 16


def _emb(spark):
    return load_table(spark, SF, "embeddings")


def test_codebooks_deterministic_and_shaped(spark):
    emb = _emb(spark)
    b1 = train_pq_codebooks(emb, m=M, k=K)
    b2 = train_pq_codebooks(emb, m=M, k=K)
    assert b1 == b2  # integer training + seeded init → byte-identical
    assert len(b1) == M and all(len(s) == K for s in b1)
    dims = emb.select(F.size("embedding").alias("d")).first()["d"]
    assert all(len(c) == dims // M for s in b1 for c in s)


def test_dims_not_divisible_raises(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(emb, m=7, k=4)


def test_encode_matches_bruteforce_argmin(spark):
    """Each code must be the argmin codeword by integer L2 over the
    slice, ties to the lowest code — checked in plain Python."""
    emb = _emb(spark).limit(50)
    books = train_pq_codebooks(_emb(spark), m=M, k=K)
    sub = len(books[0][0])
    got = {
        r["pid"]: list(r["codes"])
        for r in pq_encode(emb, books).collect()
    }
    pts = {r["pid"]: list(r["x"]) for r in quantize_points(emb).collect()}
    for pid, x in pts.items():
        for s in range(M):
            xs = x[s * sub : (s + 1) * sub]
            dists = [
                sum((a - b) ** 2 for a, b in zip(xs, c)) for c in books[s]
            ]
            want = dists.index(min(dists))  # first minimum = lowest code
            assert got[pid][s] == want, (pid, s)


def test_adc_equals_table_sum(spark):
    """pq_adc_topk's distance is exactly sum_s table[s][code_s] —
    recomputed in Python for every (query, neighbor) in the result."""
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") >= 10)
    queries = emb.filter(F.col("vec_id") < 3)
    books = train_pq_codebooks(emb, m=M, k=K)
    out = pq_adc_topk(
        corpus, queries, m=M, k_codewords=K, topk=5, books=books
    ).collect()
    assert len(out) == 3 * 5
    codes = {
        r["pid"]: list(r["codes"])
        for r in pq_encode(corpus, books).collect()
    }
    qx = {
        r["pid"]: list(r["x"]) for r in quantize_points(queries).collect()
    }
    for r in out:
        table = _adc_tables(books, qx[r["qid"]])
        want = sum(table[s][codes[r["neighbor_id"]][s]] for s in range(M))
        assert r["adc_dist"] == want


def test_recall_on_planted_neighbors(spark):
    """On the near-uniform test embeddings, exact top-k is an
    arbitrary pick among near-equidistant points — recall there
    measures nothing (distance concentration). The meaningful gate is
    PLANTED structure: 5 small-perturbation copies of each query
    hidden among the real corpus as distractors; PQ's top-5 must be
    dominated by the planted family."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    # plant: copy c of query q gets id 100000 + q*10 + c, vector =
    # query + deterministic tiny offset (±0.01 per dim, hash-signed)
    planted = (
        queries.select(
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("c"),
            F.col("vec_id").alias("qid"),
            "embedding",
        )
        .select(
            (F.lit(100000) + F.col("qid") * 10 + F.col("c")).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda v, i: v
                + F.when(
                    F.pmod(F.xxhash64(F.col("qid"), F.col("c"), i), 2) == 0,
                    0.01,
                ).otherwise(-0.01),
            ).alias("embedding"),
        )
    )
    distractors = emb.filter(F.col("vec_id") >= 20).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = distractors.unionByName(planted)
    got = pq_adc_topk(
        corpus,
        queries.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ),
        m=M, k_codewords=K, topk=5, iters=2,
    ).collect()
    hits = {}
    for r in got:
        fam = 100000 + r["qid"] * 10
        hits.setdefault(r["qid"], 0)
        if fam <= r["neighbor_id"] < fam + 5:
            hits[r["qid"]] += 1
    recalls = [h / 5 for h in hits.values()]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_pq_composition(spark):
    """The standard IVF-PQ layout from the two orthogonal operators:
    IVF cells PRUNE (each query keeps only its n_probe nearest cells'
    vectors), PQ codes RANK (ADC over the pruned candidates). The
    planted copies must still surface, and the candidate set must be
    a strict subset of the corpus (the pruning actually pruned)."""
    from graal_cdc_spark.operators.clustering import (
        dist_struct_array,
        kmeans_quantized,
        train_centroids,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 4).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = queries.select(
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("c"),
        F.col("vec_id").alias("qid"),
        "embedding",
    ).select(
        (F.lit(100000) + F.col("qid") * 10 + F.col("c")).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda v, i: v
            + F.when(
                F.pmod(F.xxhash64(F.col("qid"), F.col("c"), i), 2) == 0,
                0.01,
            ).otherwise(-0.01),
        ).alias("embedding"),
    )
    corpus = (
        emb.filter(F.col("vec_id") >= 20)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .unionByName(planted)
    )

    n_cells, n_probe = 8, 2
    cells = kmeans_quantized(corpus, k=n_cells, iters=2).select(
        F.col("pid").alias("vec_id"), "cid"
    )
    cents = train_centroids(corpus, k=n_cells, iters=2)
    probed = (
        quantize_points(queries)
        .select(
            F.col("pid").alias("qid"),
            F.explode(
                F.slice(F.array_sort(dist_struct_array(cents)), 1, n_probe)
            ).alias("p"),
        )
        .select("qid", F.col("p")["j"].alias("cid"))
    )
    probe_cells = {r["cid"] for r in probed.collect()}
    candidates = corpus.join(
        cells.filter(F.col("cid").isin(sorted(probe_cells))), "vec_id"
    ).drop("cid")
    n_corpus, n_cand = corpus.count(), candidates.count()
    assert 0 < n_cand < n_corpus  # pruning really pruned

    got = pq_adc_topk(
        candidates, queries, m=M, k_codewords=K, topk=5, iters=2
    ).collect()
    hits = {}
    for r in got:
        fam = 100000 + r["qid"] * 10
        hits.setdefault(r["qid"], 0)
        if fam <= r["neighbor_id"] < fam + 5:
            hits[r["qid"]] += 1
    recalls = [h / 5 for h in hits.values()]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_encode_plan_is_map_side(spark):
    plan = (
        pq_encode(_emb(spark), train_pq_codebooks(_emb(spark), m=M, k=K))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_adc_single_shuffle_before_topk(spark):
    emb = _emb(spark)
    df = pq_adc_topk(
        emb.filter(F.col("vec_id") >= 10),
        emb.filter(F.col("vec_id") < 2),
        m=M, k_codewords=K, topk=3,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one Exchange total: the per-query top-k window; scoring is map-side
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# PQ code census — registered round 7 as l78_pq_code_census
# (graal_cdc_spark/queries/llm.py); rehearsed here in every local run.
# ---------------------------------------------------------------------------

from graal_cdc_spark.queries.llm import (  # noqa: E402
    pq_census as _pq_census_spark,
    pq_census_oracle as _pq_census_oracle,
)


def test_pq_census_matches_duckdb_oracle(spark):
    """The l78 gate pair: Spark PQ census hash-equals the
    per-subspace unrolled-k-means DuckDB twin (m=4, k=8, 1 round at
    smoke SF; the registered form can scale the params)."""
    from graal_cdc_spark.testing import canon_rows, run_oracle

    got = _pq_census_spark(spark, SF)
    s_rows = [tuple(r) for r in got.collect()]
    o_cols, o_rows = run_oracle(_pq_census_oracle(), SF)
    assert len(s_rows) == len(o_rows) > 0
    assert canon_rows(got.columns, s_rows) == canon_rows(o_cols, o_rows)
