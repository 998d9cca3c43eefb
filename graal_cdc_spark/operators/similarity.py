"""Similarity search over embedding columns (``array<float>``).

Exact brute-force cosine top-k as the oracle-checkable baseline, and
an LSH-bucketed approximate variant as the scale path.

Scale notes: the exact path broadcasts the (small) query set and
scans the corpus once — a map-only stage plus a per-query top-k
aggregate; it is O(|corpus|·|queries|·d) but never shuffles the
corpus. The dot products run as Catalyst ``aggregate``/``zip_with``
higher-order functions (JVM codegen, no Python). The LSH path buckets
by random-projection signs so each query only scans its bucket —
the classic recall/cost tradeoff, with ``n_probes`` to widen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic summation order
    (matches DuckDB's list_dot_product order for oracle parity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scan corpus once.

    Output: (qid, neighbor_id, sim, rank), rank 1..k per query,
    deterministic tiebreak on neighbor id.
    """
    # norms are per-VECTOR: computed once per side before the pair
    # join, the per-pair expression is ONE dot product instead of
    # three array passes (same sqrt(dot(v,v)) values — bitwise equal
    # to the per-pair cosine)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
        ).withColumn("qn", l2_norm(F.col("qv")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    pairs = q.crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col("neighbor_id"))
    w = Window.partitionBy("qid").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn(
            "sim_raw",
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "neighbor_id",
            (F.round(F.col("sim_raw"), 4) + F.lit(0.0)).alias("sim"),
            "rank",
        )
    )


def cosine_max_sim(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Max cosine of each query vector against the corpus — the
    semantic-decontamination probe (l97). Returns (qid, sim_raw).

    Scale shape: the query side is SMALL by definition (an eval
    suite — a few MB of vectors), so it collects into one broadcast
    float64 matrix; the corpus scans ONCE through Arrow-batched
    ``mapInPandas``, each batch computing a whole queries x batch
    similarity block with a numpy/BLAS matmul and emitting per-query
    PARTIAL maxima; the final aggregate touches
    O(n_queries x partitions) rows. Per-pair work is vectorized
    float64 BLAS, not an interpreted higher-order expression — the
    same lesson as :func:`cosine_neardup_pairs` (measured ~4x on the
    l97 probe). Past ~1e6 corpus vectors the same probe rides the
    IVF-PQ index (operators/ann_index.py); this is its exact audit.
    """
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        spark = corpus.sparkSession
        return spark.createDataFrame([], "qid long, sim_raw double")
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array(
        [np.asarray(r[1], dtype=np.float64) for r in q_rows]
    )
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    bq = corpus.sparkSession.sparkContext.broadcast((qids, qm, qn))

    def run(batches):
        import numpy as np
        import pandas as pd

        ids, qmat, qnorm = bq.value
        best = np.full(len(ids), -np.inf)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            cm = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            cn = np.linalg.norm(cm, axis=1)
            cn[cn == 0] = 1.0
            # dot / (|q| * |c|): the same arrangement as the SQL twin
            sims = (qmat @ cm.T) / np.outer(qnorm, cn)
            best = np.maximum(best, sims.max(axis=1))
        if seen:
            yield pd.DataFrame({"qid": ids, "sim_raw": best})

    partial = corpus.select(vec_col).mapInPandas(
        run, "qid long, sim_raw double"
    )
    return partial.groupBy("qid").agg(
        F.max("sim_raw").alias("sim_raw")
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int | None = None,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup dedup).

    Blocked all-pairs: vectors are hashed into ``n_blocks`` blocks,
    the (tiny) block table is cross-joined with itself
    (``bid_a <= bid_b`` — each unordered block pair once), and one
    Arrow-batched ``mapInPandas`` task computes a whole
    block×block similarity matrix with a numpy/BLAS matmul. Join
    cardinality drops from O(n²) rows to O(n_blocks²); per-pair work
    moves from an interpreted higher-order expression to vectorized
    float64 BLAS.

    Scale path: this exact form is O(n²) FLOPs no matter how it's
    batched — past ~1e6 vectors, pre-bucket with LSH
    (:func:`rp_bucketed_topk`) and run this within buckets only.

    Rounding parity: the UDF emits the raw float64 similarity; the
    threshold filter and ROUND happen Spark-side with the same
    expressions the oracle uses.

    ``n_blocks=None`` sizes blocks from the corpus count (parquet
    footer metadata — cheap): ~4096 vectors per block, floor 4.
    Block-PAIR count is quadratic in n_blocks, and each pair is a
    separate Arrow round-trip — a fixed n_blocks=16 put 2,000
    vectors through 136 python tasks (~50 ms scheduling+Arrow each)
    for a matmul numpy finishes in one; while at 1e6 vectors the
    same 16 would build 62 GB similarity matrices per task. The
    block edge does NOT move the result: blocking only partitions
    the pair space (oracle-verified either way).
    """
    if n_blocks is None:
        n_blocks = max(4, -(-emb.count() // 4096))
    base = emb.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).alias("bid"),
    )
    blocks = base.groupBy("bid").agg(
        F.collect_list(F.struct("id", "v")).alias("items")
    )
    pairs = (
        blocks.select(F.col("bid").alias("bid_a"), F.col("items").alias("items_a"))
        .join(
            F.broadcast(
                blocks.select(
                    F.col("bid").alias("bid_b"), F.col("items").alias("items_b")
                )
            ),
            F.col("bid_a") <= F.col("bid_b"),
        )
        # one small row per block pair; spread them across tasks
        .repartition(n_blocks * (n_blocks + 1) // 2)
    )

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_s = [], [], []
            for row in pdf.itertuples(index=False):
                ia = np.asarray([it["id"] for it in row.items_a], dtype=np.int64)
                ib = np.asarray([it["id"] for it in row.items_b], dtype=np.int64)
                va = np.asarray([it["v"] for it in row.items_a], dtype=np.float64)
                vb = np.asarray([it["v"] for it in row.items_b], dtype=np.float64)
                sims = (va @ vb.T) / np.outer(
                    np.sqrt((va * va).sum(axis=1)), np.sqrt((vb * vb).sum(axis=1))
                )
                if row.bid_a == row.bid_b:
                    # same block: emit the strict upper triangle by id
                    ii, jj = np.nonzero((ia[:, None] < ib[None, :]) & (sims >= threshold))
                    out_a.append(ia[ii])
                    out_b.append(ib[jj])
                else:
                    # distinct blocks: ids never collide; order each pair
                    ii, jj = np.nonzero(sims >= threshold)
                    lo = np.minimum(ia[ii], ib[jj])
                    hi = np.maximum(ia[ii], ib[jj])
                    out_a.append(lo)
                    out_b.append(hi)
                out_s.append(sims[ii, jj])
            if out_a:
                yield pd.DataFrame(
                    {
                        "doc_a": np.concatenate(out_a),
                        "doc_b": np.concatenate(out_b),
                        "sim_raw": np.concatenate(out_s),
                    }
                )

    return (
        pairs.mapInPandas(compute, schema="doc_a BIGINT, doc_b BIGINT, sim_raw DOUBLE")
        .filter(F.col("sim_raw") >= threshold)
        .select("doc_a", "doc_b", (F.round("sim_raw", 4) + F.lit(0.0)).alias("sim"))
    )


def _projection_vectors(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded LCG, no numpy
    dependency at plan-build time)."""
    vecs: list[list[float]] = []
    state = 0x9E3779B97F4A7C15
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            # xorshift64* PRNG, mapped to [-1, 1)
            state ^= (state >> 12) & 0xFFFFFFFFFFFFFFFF
            state = (state ^ (state << 25)) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 27
            r = ((state * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF) >> 11
            v.append(r / float(1 << 53) * 2.0 - 1.0)
        vecs.append(v)
    return vecs


def rp_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k via random-projection sign buckets
    (IVF/LSH-style scale path; not oracle-gated).

    Bucket id = sign bits of ``n_planes`` fixed hyperplane projections.
    Queries join only their own bucket — corpus scan work drops by
    ~2^n_planes at some recall cost. Deterministic (fixed seeded
    hyperplanes), so results are stable run-to-run.
    """
    planes = _projection_vectors(dim, n_planes)

    def bucket_of(vec: Column) -> Column:
        bits = []
        for i, p in enumerate(planes):
            # one parsed SQL literal per plane, not dim py4j lit calls
            # (clustering.int_array_lit rationale); repr(float) is the
            # shortest round-tripping decimal and Spark's double parse
            # recovers the exact bit pattern, so bucket ids are
            # unchanged
            proj = dot(
                vec,
                F.expr(
                    "array(" + ",".join(repr(x) + "D" for x in p) + ")"
                ),
            )
            bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
        return sum(bits[1:], bits[0])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", bucket_of(F.col("cv")))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
        ).withColumn("bucket", bucket_of(F.col("qv")))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.join(c, "bucket")
        .filter(F.col("qid") != F.col("neighbor_id"))
        .withColumn("sim_raw", cosine(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", F.round("sim_raw", 4).alias("sim"), "rank")
    )


def centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-label centroid of each dimension: posexplode + grouped avg —
    one shuffle on (label, dim), partial aggregation map-side."""
    exploded = emb.select(
        F.col(label_col), F.posexplode(_as_double(F.col(vec_col)))
    ).toDF(label_col, "dim", "val")
    return (
        exploded.groupBy(label_col, "dim")
        # +0.0 normalizes IEEE -0.0 (round can produce it) to +0.0 so
        # output hashing is engine-independent.
        .agg((F.round(F.avg("val"), 4) + F.lit(0.0)).alias("centroid"))
    )


def int8_quantize(
    df: DataFrame, id_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``q = round(x * 127 /
    max_abs)`` — the storage-shrinking step before ANN index build
    (4x smaller than float32, dot products stay rank-correlated).

    Pure array expressions (transform / aggregate) — codegen'd, no
    explode, no shuffle, no UDF: the cheapest possible per-row map at
    corpus scale. Zero vectors quantize to all-zero (scale guard).

    Returns ``(id_col, q ARRAY<INT>, scale DOUBLE)``.
    """
    # Project the scale into a REAL column before the quantize
    # transform: an expression captured inside a higher-order lambda
    # is re-evaluated PER OUTPUT ELEMENT (the word_gram_array rule),
    # so the old inline `safe` — which embeds
    # array_max(transform(v, abs)) — made the quantize O(d²)
    # interpreted work per row instead of O(d). `scale` stays in the
    # output, so CollapseProject cannot re-inline it (it never
    # duplicates a non-trivial alias referenced more than once).
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    staged = df.select(F.col(id_col), v.alias("__v"), scale.alias("scale"))
    safe = F.when(F.col("scale") == 0.0, F.lit(1.0)).otherwise(F.col("scale"))
    q = F.transform(
        F.col("__v"), lambda x: F.round(x.cast("double") * 127.0 / safe).cast("int")
    )
    return staged.select(F.col(id_col), q.alias("q"), F.col("scale"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    train_iters: int = 2,
    scale: int = 10_000,
) -> DataFrame:
    """IVF-style approximate cosine top-k: a *trained* inverted-file
    index (quantized k-means cells, ``operators/clustering.py``)
    instead of random-projection buckets — cells follow the data
    distribution, so recall at equal probe cost beats RP-LSH.

    Build: assign every corpus vector to its nearest cell (one map
    stage against the broadcast integer centroid table). Search: each
    query probes its ``n_probe`` nearest cells, scans only those
    inverted lists, and cosine re-ranks. Corpus scan work drops to
    ~``n_probe/n_cells`` of brute force. Deterministic end to end
    (integer centroid training + fixed tiebreaks), so results are
    stable run-to-run — rare for an ANN index, and what makes the
    recall test reproducible.

    Scale: the cell table is k x dims ints (driver literals); the only
    shuffle is the probe-cell equi-join; at 100 TB you'd persist the
    cell assignment as a bucketed table and re-use it across query
    batches.
    """
    from graal_cdc_spark.operators.clustering import (
        _assign_expr,
        dist_struct_array,
        quantize_points,
        train_centroids,
    )

    cents = train_centroids(
        corpus, k=n_cells, iters=train_iters, scale=scale,
        id_col=id_col, vec_col=vec_col,
    )

    cid, _ = _assign_expr(cents)
    c = (
        quantize_points(corpus, id_col, vec_col, scale)
        .select("pid", cid)
        .join(
            corpus.select(
                F.col(id_col).alias("pid"), _as_double(F.col(vec_col)).alias("cv")
            ),
            "pid",
        )
        .select(F.col("pid").alias("neighbor_id"), F.col("cid").alias("cell"), "cv")
    )

    # query probes: n_probe nearest cells via array_sort over (d, j)
    qx = quantize_points(queries, id_col, vec_col, scale)
    probed = F.slice(F.array_sort(dist_struct_array(cents)), 1, n_probe)
    q = F.broadcast(
        qx.select(F.col("pid").alias("qid"), F.explode(probed).alias("p"))
        .select("qid", F.col("p")["j"].alias("cell"))
        .join(
            queries.select(
                F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
            ),
            "qid",
        )
    )

    w = Window.partitionBy("qid").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.join(c, "cell")
        .filter(F.col("qid") != F.col("neighbor_id"))
        .withColumn("sim_raw", cosine(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", F.round("sim_raw", 4).alias("sim"), "rank")
    )


def within_cluster_pair_census(
    assigned: DataFrame,
    tau_num: int = 9,
    tau_den: int = 100,
) -> DataFrame:
    """Pair phase of SemDeDup: count same-cluster near-duplicate pairs
    on the integer grid. ``assigned`` must carry ``(pid, cid, x)``
    where ``x`` is the quantized vector (see ``quantize_points``).

    A pair is "similar" iff cos >= sqrt(tau_num/tau_den), compared
    entirely in integers: ``dot > 0 AND den*dot^2 >= num*|a|^2*|b|^2``
    (dot^2 needs 128-bit — decimal(38,0) here, HUGEINT in a SQL twin).

    Scale shape: ONE equality join on cid, so pair work is quadratic
    only within a cluster — the operator is scale-safe exactly when
    cluster sizes stay bounded, i.e. the caller grows k with the
    corpus (SemDeDup's contract: k ~ n / target_cluster_size). A
    10x corpus probed at FIXED k measures 100x pair work; probed at
    10x k it measures ~10x (see scripts/scale_probe.py).

    Returns per-cluster ``(cid, n_points, n_pairs, n_dropped)`` where
    n_dropped counts members with a lower-id similar neighbor (the
    docs SemDeDup removes, keeping each relation's lowest id).

    ``assigned`` may instead be the PRE-REDUCED index frame
    ``(pid, cid, x, n2)`` from ``kmeans_assigned_index`` (detected by
    the ``n2`` column) — used as-is, no recompute, no extra
    checkpoint; the memoized index makes repeat sweeps over one
    clustering scan a materialized table.
    """
    if "n2" in assigned.columns:
        m = assigned
    else:
        n2 = F.aggregate(
            F.transform(F.col("x"), lambda v: v * v),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        # Pin the join partitioning: the pair rows are tiny in BYTES
        # but each evaluates a dims-term dot-product lambda, so AQE's
        # byte-based coalescing folds the join to one partition and
        # serializes the whole quadratic phase (the r67 rule: per-row
        # compute is invisible to byte-based planners).
        #
        # m feeds THREE consumers (pair-join side a, side b, and the
        # cluster-size census) and its subtree carries the k x dims
        # centroid-assignment expression — the static plan builds and
        # codegens that subtree once per consumer (no ReusedExchange
        # across the aliased sides). Truncate lineage so assignment
        # runs ONCE (the minhash-audit rule; cold l75 5.2 s -> ~3.5 s
        # at sf0.1).
        n_par = assigned.sparkSession.sparkContext.defaultParallelism
        m = (
            assigned.select("pid", "cid", "x", n2.alias("n2"))
            .repartition(n_par, "cid")
            .localCheckpoint(eager=False)
        )
    a, b = m.alias("a"), m.alias("b")
    dot_i = F.aggregate(
        F.zip_with(F.col("a.x"), F.col("b.x"), lambda p, q: p * q),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dd = dot_i.cast("decimal(38,0)")
    sim = (dot_i > 0) & (
        dd * dd * F.lit(tau_den)
        >= F.lit(tau_num)
        * F.col("a.n2").cast("decimal(38,0)")
        * F.col("b.n2").cast("decimal(38,0)")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.pid") < F.col("b.pid")),
        )
        .filter(sim)
        .select(F.col("a.cid").alias("cid"), F.col("b.pid").alias("pb"))
    )
    stats = pairs.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("pb").alias("n_dropped"),
    )
    # sizes reads the checkpointed m, not `assigned` — the third
    # consumer of the assignment subtree otherwise re-derives it
    sizes = m.groupBy("cid").agg(F.count(F.lit(1)).alias("n_points"))
    return (
        sizes.join(stats, "cid", "left")
        .select(
            "cid",
            "n_points",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        )
    )


def semdedup_census(
    emb: DataFrame,
    k: int = 16,
    iters: int = 2,
    scale: int = 10_000,
    tau_num: int = 9,
    tau_den: int = 100,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) census: integer-exact k-means
    clustering (operators/clustering.py) + within-cluster near-dup
    pair counting. ``k`` MUST grow with the corpus (the pair join is
    quadratic in cluster size); the gated query pins k=16 for its
    fixed dataset so the DuckDB oracle's unrolled-CTE replay stays
    tractable."""
    from graal_cdc_spark.operators.clustering import (
        kmeans_assigned_index,
    )

    # The memoized assigned-points index carries (pid, cid, x, n2) —
    # the per-session build-once clustering artifact shared with the
    # threshold sweep (l77); repeat censuses scan a materialized
    # table instead of re-evaluating the k x dims assignment.
    m = kmeans_assigned_index(emb, k=k, iters=iters, scale=scale)
    return within_cluster_pair_census(m, tau_num, tau_den)


def rp_bucketed_mips_portable(
    emb,
    queries_max_id: int = 4,
    n_planes: int = 8,
    topk: int = 5,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
):
    """ORACLE-PORTABLE twin of the RP-bucketed ANN path (l12): random
    hyperplanes whose ±1 signs come from md5 parity (``md5(plane|dim)``
    first hex digit odd → +1), sign-buckets over the QUANTIZED integer
    embedding (integer dot products — exact), and in-bucket ranking by
    integer inner product (the MIPS form — no float norms anywhere).
    Every step is stated identically in ANSI SQL (l83), so the plane
    family, bucketing, candidate generation, and ranking are gated
    bit-for-bit; the production l12 path is the same shape with
    xxhash64 planes and cosine scoring.

    Queries are the vectors with ``id < queries_max_id`` (the l04
    bounded-query-batch contract); self-matches excluded; ties break
    on neighbor id.
    """
    import hashlib

    from pyspark.sql import Window

    from graal_cdc_spark.operators.clustering import (
        nested_int_array_lit,
        quantize_points,
    )

    planes = [
        [
            1 if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) % 2
            else -1
            for d in range(dims)
        ]
        for p in range(n_planes)
    ]
    plit = nested_int_array_lit(planes)
    pts = quantize_points(emb, id_col, vec_col, scale)
    dot_plane = F.transform(
        plit,
        lambda pl: F.aggregate(
            F.zip_with(F.col("x"), pl, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ),
    )
    bucket = F.aggregate(
        F.zip_with(
            dot_plane,
            F.expr(
                "array(" + ",".join(str(1 << p) for p in range(n_planes)) + ")"
            ),
            lambda d, w: F.when(d > 0, w).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    bucketed = pts.select("pid", "x", bucket.alias("bucket"))
    q = bucketed.filter(F.col("pid") < queries_max_id).select(
        F.col("pid").alias("qid"),
        F.col("x").alias("qx"),
        "bucket",
    )
    dot_qn = F.aggregate(
        F.zip_with(F.col("qx"), F.col("x"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("dot").desc(), F.col("neighbor_id")
    )
    return (
        q.join(
            bucketed.select(
                F.col("pid").alias("neighbor_id"),
                F.col("x"),
                "bucket",
            ),
            "bucket",
        )
        .filter(F.col("qid") != F.col("neighbor_id"))
        .withColumn("dot", dot_qn)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "qid", "neighbor_id", "dot",
            F.col("rank").cast("int").alias("rank"),
        )
    )
