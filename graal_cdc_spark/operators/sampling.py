"""Deterministic content-hash sampling for training-data pipelines.

Random sampling (``df.sample``) is irreproducible across runs and
partitionings — unacceptable when a 100 TB corpus snapshot must be
re-derivable bit-for-bit. Hash-gating on the content itself gives a
stable pseudo-random sample: a document is in or out regardless of
partitioning, executor count, or re-runs, and the same document text
always lands the same way (so exact duplicates sample together —
usually desirable before dedup, and documented either way).

Pure codegen filter on the scan (md5 + substring + comparison), no
shuffle, no UDF — at 100 TB this is bandwidth-bound, the cheapest op
in the pipeline. The selectivity is prefix/256 per stratum (two hex
chars), adjustable per stratum with a CASE threshold.

The reference has no sampling surface (SURVEY.md §2.2); this is part
of the LLM-pipeline extension set.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_gate(content: Column, threshold_hex2: Column | str) -> Column:
    """True iff the first two hex chars of md5(content) sort below the
    threshold — a deterministic ~(threshold/256) gate. Lexicographic
    comparison of fixed-width lowercase hex equals numeric comparison,
    and md5 renders identically in Spark and DuckDB, so oracle twins
    are exact."""
    t = F.lit(threshold_hex2) if isinstance(threshold_hex2, str) else threshold_hex2
    return F.substring(F.md5(content), 1, 2) < t


def deterministic_sample(
    df: DataFrame, content_col: str, threshold_hex2: str
) -> DataFrame:
    """Uniform deterministic sample: keep rows whose content hash-gates
    below ``threshold_hex2`` (e.g. ``"1a"`` ≈ 26/256 ≈ 10%)."""
    return df.filter(hash_gate(F.col(content_col), threshold_hex2))


def _hex2_or_raise(value: str, what: str) -> str:
    """Driver-side threshold lint: the hash gate compares hex strings
    LEXICOGRAPHICALLY, which equals numeric comparison only for
    lowercase fixed-width 2-char hex — an uppercase ('0D') or short
    ('d') threshold would silently change the sampling rate instead of
    failing (ADVICE r6). Uppercase normalizes; anything else raises."""
    low = value.lower() if isinstance(value, str) else value
    if not isinstance(low, str) or len(low) != 2 or any(
        c not in "0123456789abcdef" for c in low
    ):
        raise ValueError(
            f"{what} must be exactly 2 hex chars, got {value!r}"
        )
    return low


def stratified_sample(
    df: DataFrame,
    content_col: str,
    stratum_col: str,
    thresholds: Mapping[str, str],
    default_hex2: str = "00",
) -> DataFrame:
    """Per-stratum rates: e.g. keep ~5% of English but ~20% of
    low-resource languages. ``thresholds`` maps stratum value → 2-char
    hex threshold; unlisted strata use ``default_hex2`` (``"00"`` =
    drop). Still a single codegen'd scan filter — the CASE folds into
    the same stage."""
    expr: Column = F.lit(_hex2_or_raise(default_hex2, "default_hex2"))
    for value, hex2 in sorted(thresholds.items()):
        expr = F.when(
            F.col(stratum_col) == value,
            F.lit(_hex2_or_raise(hex2, f"threshold for {value!r}")),
        ).otherwise(expr)
    return df.filter(hash_gate(F.col(content_col), expr))


def stratified_sample_expr(
    df: DataFrame, content_col: str, threshold_expr: Column
) -> DataFrame:
    """Rate-by-rule form: ``threshold_expr`` is any Column producing
    the 2-char hex threshold per row (e.g. a CASE on the stratum
    column). Fully distributed — no stratum enumeration anywhere; the
    rule folds into the same codegen'd scan filter."""
    return df.filter(hash_gate(F.col(content_col), threshold_expr))


def stratified_sample_by_map(
    df: DataFrame,
    content_col: str,
    stratum_col: str,
    threshold_map: DataFrame,
    default_hex2: str = "00",
) -> DataFrame:
    """Rate-by-table form: per-stratum thresholds live in a DataFrame
    ``(stratum, hex2)`` — the DISTRIBUTED replacement for collecting
    strata to the driver when the map is data-derived (computed by an
    upstream aggregation, maintained as a control table). One
    broadcast left join; unlisted strata fall back to
    ``default_hex2``. The map stays broadcastable because strata are
    group-by keys of a bounded-cardinality dimension — if it ever
    isn't, drop the broadcast hint and let the join shuffle.

    Duplicate stratum rows in the map (a non-deduped control-table
    merge) would fan the join out and silently DUPLICATE sampled rows
    — collapsed here to min(hex2) per stratum (deterministic, and
    conservative: the lowest threshold keeps the fewest rows).

    The map is DATA-derived, so thresholds are validated in-plan:
    uppercase normalizes via lower(); a malformed entry (wrong length
    or charset — where lexicographic ≠ numeric comparison) raises at
    execution instead of silently changing the rate (ADVICE r6)."""
    _hex2_or_raise(default_hex2, "default_hex2")
    thr = F.lower(F.col("hex2"))
    guarded = F.when(thr.rlike("^[0-9a-f]{2}$"), thr).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "stratified_sample_by_map: malformed hex2 threshold "
                ),
                F.coalesce(F.col("hex2"), F.lit("NULL")),
            )
        )
    )
    m = F.broadcast(
        threshold_map.groupBy(F.col("stratum").alias(stratum_col)).agg(
            F.min(guarded).alias("__thr")
        )
    )
    return (
        df.join(m, stratum_col, "left")
        .filter(
            hash_gate(
                F.col(content_col),
                F.coalesce(F.col("__thr"), F.lit(default_hex2)),
            )
        )
        .select(*df.columns)  # USING-join reorders; restore the frame
    )


def per_stratum_topk(
    df: DataFrame,
    content_col: str,
    stratum_col: str,
    k: int,
    id_col: str | None = None,
) -> DataFrame:
    """Deterministic k-per-stratum sample (balanced subsets): rank rows
    within each stratum by content hash and keep the first ``k``.
    The hash order is pseudo-random but reproducible — the same corpus
    always yields the same balanced subset, unlike reservoir sampling.

    One shuffle on the stratum (the ranking window); ``id_col`` breaks
    exact-content ties so the cut at rank k is total."""
    order = [F.md5(F.col(content_col))]
    if id_col is not None:
        order.append(F.col(id_col))
    w = Window.partitionBy(stratum_col).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def per_stratum_topk_salted(
    df: DataFrame,
    content_col: str,
    stratum_col: str,
    k: int,
    id_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-level form of :func:`per_stratum_topk` for SKEWED strata
    (the mega-domain case of the l79 per-source cap): rank within
    (stratum, salt) and keep each salt's top ``k`` first — so no task
    ever sorts more than one salt shard of the hot stratum, and the
    per-bucket rank runs as a WindowGroupLimit k-heap — then re-rank
    the ≤ ``n_salts × k`` survivors per stratum for the exact cut.

    Exactness: a row in the stratum's true top-k is also in its salt
    bucket's top-k (removing other rows only improves its rank), so
    pre-truncation never drops a winner — the tree_topk argument, one
    level deep. With ``id_col`` the order is total and the result
    EQUALS the single-level operator row-for-row; without it, equal
    up to ties in md5(content) (exact-duplicate contents), same as
    the single-level form's own tie behavior.
    """
    if n_salts < 1:
        raise ValueError("per_stratum_topk_salted: n_salts must be >= 1")
    order = [F.md5(F.col(content_col))]
    hash_cols = [F.col(content_col)]
    if id_col is not None:
        order.append(F.col(id_col))
        hash_cols.append(F.col(id_col))
    salt = F.pmod(F.xxhash64(*hash_cols), F.lit(n_salts))
    w1 = Window.partitionBy(stratum_col, "__salt").orderBy(*order)
    pre = (
        df.withColumn("__salt", salt)
        .withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
    w2 = Window.partitionBy(stratum_col).orderBy(*order)
    return (
        pre.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k)
        .drop("__rk", "__salt")
    )
