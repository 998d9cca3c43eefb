"""Property-based invariants for the structurally-subtle queries.

These go beyond the DuckDB oracle (which pins ONE dataset): for ANY
random input, the scale-shaped formulation must equal the naive
reference computation done in plain Python.

- r64's two-pass binned weighted median == the textbook cumulative
  definition (smallest value whose cumulative weight reaches half the
  total), for any weights/values including duplicates and single-row
  groups.
- c14's lag-window changed-columns diff == a per-key sequential scan
  comparing consecutive row images field by field, including
  appearing/disappearing fields (schema drift mid-stream).
"""

from __future__ import annotations

import json
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

# max_examples 12 → 6 (r14, VERDICT r13 #2): each example is a full
# Spark round-trip and several operators here run eager two-pass
# driver-literal scans during CONSTRUCTION (~2.6 s/example measured
# for mad_outlier_profile), so this file alone cost 333 s of the
# 34-minute suite — past the driver's verify window. 6 random
# examples per property still exercise the strategy bounds each run
# (and hypothesis replays any previously-found failure from its DB).
_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# ---------------------------------------------------------------------------
# r64: binned weighted median == naive cumulative definition
# ---------------------------------------------------------------------------

_wrows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),            # group
        st.integers(min_value=0, max_value=5000),    # value (price*100)
        st.integers(min_value=1, max_value=50),      # weight
    ),
    min_size=1,
    max_size=60,
)


def _binned_weighted_median(df, bin_width: int):
    """The r64 plan shape, parameterized for arbitrary input."""
    df = df.withColumn("bin", F.floor(F.col("v") / F.lit(bin_width)).cast("long"))
    hist = df.groupBy("g", "bin").agg(F.sum("wt").alias("bw"))
    wbin = (
        Window.partitionBy("g").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = hist.withColumn("cum", F.sum("bw").over(wbin)).withColumn(
        "tot", F.sum("bw").over(Window.partitionBy("g"))
    )
    med = (
        hist.filter(F.col("cum") * 2 >= F.col("tot"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy("bin"))
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("g").alias("mg"),
            F.col("bin").alias("mbin"),
            (F.col("cum") - F.col("bw")).alias("prev_cum"),
            "tot",
        )
    )
    inbin = df.join(
        F.broadcast(med),
        (F.col("g") == F.col("mg")) & (F.col("bin") == F.col("mbin")),
    ).select("g", "v", "wt", "prev_cum", "tot")
    vals = inbin.groupBy("g", "v", "prev_cum", "tot").agg(
        F.sum("wt").alias("vw")
    )
    wval = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        vals.withColumn("cum", F.col("prev_cum") + F.sum("vw").over(wval))
        .filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("g")
        .agg(F.min("v").alias("wmed"))
    )


def _naive_weighted_median(rows):
    by_group: dict[str, list[tuple[int, int]]] = {}
    for g, v, w in rows:
        by_group.setdefault(g, []).append((v, w))
    out = {}
    for g, vw in by_group.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if cum * 2 >= tot:
                out[g] = v
                break
    return out


@_SETTINGS
@given(rows=_wrows, bin_width=st.sampled_from([1, 7, 256, 10_000]))
def test_r64_binned_median_equals_naive(spark, rows, bin_width):
    df = spark.createDataFrame(rows, "g string, v long, wt long")
    got = {
        r["g"]: r["wmed"]
        for r in _binned_weighted_median(df, bin_width).collect()
    }
    assert got == _naive_weighted_median(rows)


# ---------------------------------------------------------------------------
# c14: lag-window changed-columns == naive per-key sequential diff
# ---------------------------------------------------------------------------

_imgs = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),                         # key
        st.dictionaries(                                       # row image
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=3),
            min_size=0,
            max_size=3,
        ),
    ),
    min_size=1,
    max_size=25,
)


def _naive_changed_counts(rows):
    prev: dict[str, dict] = {}
    counts: dict[str, int] = {}
    for key, img in rows:
        if key in prev:
            p = prev[key]
            for f in set(p) | set(img):
                pv = None if f not in p else str(p[f])
                cv = None if f not in img else str(img[f])
                if pv != cv:
                    counts[f] = counts.get(f, 0) + 1
        prev[key] = img
    return counts


@_SETTINGS
@given(rows=_imgs)
def test_c14_diff_equals_naive(spark, rows):
    data = [
        (i, key, json.dumps(img)) for i, (key, img) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "seq long, key string, after_json string")
    w = Window.partitionBy("key").orderBy("seq")
    imgs = (
        df.withColumn("prev_json", F.lag("after_json").over(w))
        .filter(F.col("prev_json").isNotNull())
    )
    cm = F.from_json("after_json", "map<string,string>")
    pm = F.from_json("prev_json", "map<string,string>")
    pairs = imgs.select(cm.alias("cm"), pm.alias("pm"))
    fields = pairs.select(
        "cm", "pm",
        F.explode(F.array_union(F.map_keys("cm"), F.map_keys("pm"))).alias(
            "field"
        ),
    )
    changed = fields.filter(
        ~(
            F.element_at("cm", F.col("field")).eqNullSafe(
                F.element_at("pm", F.col("field"))
            )
        )
    )
    got = {
        r["field"]: r["n"]
        for r in changed.groupBy("field").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == _naive_changed_counts(rows)


# ---------------------------------------------------------------------------
# c17: banded two-level seq-delta decomposition == naive sorted-scan
# ---------------------------------------------------------------------------

_seqs = st.lists(
    st.tuples(
        st.sampled_from(["t1", "t2"]),                 # table
        st.integers(min_value=0, max_value=100_000),   # seq
    ),
    min_size=1,
    max_size=80,
    unique=True,
)


def _banded_gap_stats(df, band: int):
    """The c17 plan shape, parameterized for arbitrary input."""
    banded = df.withColumn("band", F.expr(f"seq DIV {band}"))
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
    return deltas.groupBy("tbl").agg(
        F.count(F.lit(1)).alias("n_deltas"),
        F.max("delta").alias("max_gap"),
        F.sum("delta").alias("span"),
    )


def _naive_gap_stats(rows):
    per = {}
    for t, s in rows:
        per.setdefault(t, []).append(s)
    out = {}
    for t, seqs in per.items():
        seqs.sort()
        deltas = [b - a for a, b in zip(seqs, seqs[1:])]
        if deltas:
            out[t] = (len(deltas), max(deltas), sum(deltas))
    return out


@_SETTINGS
@given(rows=_seqs, band=st.sampled_from([1, 3, 64, 1_000_000]))
def test_c17_banded_gaps_equal_naive(spark, rows, band):
    df = spark.createDataFrame(rows, "tbl string, seq long")
    got = {
        r["tbl"]: (r["n_deltas"], r["max_gap"], r["span"])
        for r in _banded_gap_stats(df, band).collect()
    }
    assert got == _naive_gap_stats(rows)


# ---------------------------------------------------------------------------
# r76: rank-at-ceil(p*n) discrete percentile == naive sorted pick
# ---------------------------------------------------------------------------

_orders = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),          # custkey
        st.integers(min_value=0, max_value=10_000),     # price cents
        st.integers(min_value=1, max_value=1_000_000),  # orderkey tiebreak
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[2],
)


def _disc_percentiles(df):
    """The r76 plan shape over (g, v, id)."""
    w = Window.partitionBy("g").orderBy("v", "id")
    ranked = df.select(
        "g",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
    )

    def pick(num, den, name):
        return F.min(
            F.when(F.col("rn") * den >= F.col("n") * num, F.col("v"))
        ).alias(name)

    return ranked.groupBy("g").agg(
        pick(1, 4, "p25"), pick(2, 4, "p50"), pick(3, 4, "p75")
    )


def _naive_disc(rows):
    import math

    per = {}
    for g, v, i in rows:
        per.setdefault(g, []).append((v, i))
    out = {}
    for g, vs in per.items():
        vs.sort()
        n = len(vs)
        pk = lambda p: vs[math.ceil(p * n) - 1][0]
        out[g] = (pk(0.25), pk(0.5), pk(0.75))
    return out


@_SETTINGS
@given(rows=_orders)
def test_r76_discrete_percentiles_equal_naive(spark, rows):
    df = spark.createDataFrame(rows, "g long, v long, id long")
    got = {
        r["g"]: (r["p25"], r["p50"], r["p75"])
        for r in _disc_percentiles(df).collect()
    }
    assert got == _naive_disc(rows)


# ---------------------------------------------------------------------------
# operators/robust.py: binned quantiles == naive rank-at-ceil(p*n)
# ---------------------------------------------------------------------------

_qrows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),
        st.integers(min_value=-2000, max_value=5000),
    ),
    min_size=1,
    max_size=80,
)


@given(rows=_qrows, bin_width=st.sampled_from([1, 7, 64, 10_000]))
@_SETTINGS
def test_binned_quantiles_equal_naive(spark, rows, bin_width):
    """binned_group_quantiles == sorted-list indexing at ceil(p*n)-1,
    for any values (negatives, duplicates, single-row groups) and any
    bin width — correctness must be bin-width independent. 0.2 is the
    non-dyadic regression case: double arithmetic gives
    0.2*10 = 2.0000000000000004 whose ceil is the WRONG rank; the
    operator must compute the target from p's exact decimal rational."""
    from fractions import Fraction

    from graal_cdc_spark.operators.robust import binned_group_quantiles

    df = spark.createDataFrame(rows, "g string, v long")
    ps = (0.2, 0.25, 0.5, 0.75)
    got = {
        (r["g"], r["p"]): r["value"]
        for r in binned_group_quantiles(
            df, "g", "v", probabilities=ps, bin_width=float(bin_width)
        ).collect()
    }
    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        for p in ps:
            fr = Fraction(str(p))
            rank = -((-fr.numerator * len(vals)) // fr.denominator)
            want = vals[max(rank, 1) - 1]
            assert got[(g, p)] == want, (g, p, vals)


@given(rows=_qrows)
@_SETTINGS
def test_mad_profile_equals_naive(spark, rows):
    """mad_outlier_profile == naive two-step median/MAD with lower
    medians and strict k*MAD outlier threshold."""
    from graal_cdc_spark.operators.robust import mad_outlier_profile

    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: (r["median"], r["mad"], r["n"], r["n_outliers"])
        for r in mad_outlier_profile(
            df, "g", "v", k=3.0, bin_width=16.0
        ).collect()
    }

    def lower_median(vals):
        vals = sorted(vals)
        tot = len(vals)
        cum = 0
        for v in vals:
            cum += 1
            if cum * 2 >= tot:
                return v

    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        med = lower_median(vals)
        devs = [abs(v - med) for v in vals]
        mad = lower_median(devs)
        outl = sum(1 for d in devs if d > 3.0 * mad)
        assert got[g] == (med, mad, len(vals), outl), (g, vals, got[g])


# ---------------------------------------------------------------------------
# r84 largest-remainder allocation: exact reconciliation on ANY input
# ---------------------------------------------------------------------------

_arows = st.lists(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1,
             max_size=8),
    min_size=1,
    max_size=10,
)


@given(groups=_arows)
@_SETTINGS
def test_largest_remainder_allocation_properties(spark, groups):
    """For any weights: per-group allocations sum EXACTLY to the
    budget, every allocation is >= floor share (never negative), and
    allocations differ from the exact proportional share by < 1 unit
    in floor terms (the Hamilton-method guarantee)."""
    rows = [
        (gi, li, w)
        for gi, ws in enumerate(groups)
        for li, w in enumerate(ws)
    ]
    df = spark.createDataFrame(rows, "k long, line long, w long")
    B = 10_000
    wtot = Window.partitionBy("k")
    t = (
        df.withColumn("tot", F.sum("w").over(wtot))
        .withColumn("base", F.expr(f"({B} * w) div tot"))
        .withColumn("rem", F.expr(f"({B} * w) % tot"))
        .withColumn("deficit", F.lit(B) - F.sum("base").over(wtot))
    )
    wrank = Window.partitionBy("k").orderBy(
        F.col("rem").desc(), F.col("line").asc()
    )
    alloc = t.withColumn("rn", F.row_number().over(wrank)).withColumn(
        "alloc",
        F.col("base")
        + F.when(F.col("rn") <= F.col("deficit"), 1).otherwise(0),
    )
    out = alloc.collect()
    per_k: dict[int, int] = {}
    for r in out:
        per_k[r["k"]] = per_k.get(r["k"], 0) + r["alloc"]
        tot = sum(groups[r["k"]])
        exact_floor = (B * r["w"]) // tot
        assert r["alloc"] in (exact_floor, exact_floor + 1)
    for k, ws in enumerate(groups):
        assert per_k[k] == B, (k, ws, per_k[k])


# ---------------------------------------------------------------------------
# l68 winnowing: density + coverage guarantees on ANY token stream
# ---------------------------------------------------------------------------

_docs = st.lists(
    st.lists(st.sampled_from(list("abcdef")), min_size=8, max_size=60),
    min_size=1,
    max_size=6,
)


@given(docs=_docs)
@_SETTINGS
def test_winnowing_fingerprint_guarantees(spark, docs):
    """Window-min selection (w=4, k=5): (1) the selected set equals the
    naive per-window minimum computed in Python; (2) every window of w
    consecutive grams contributes at least one selected fingerprint
    (the winnowing coverage guarantee)."""
    import hashlib

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 5, 4
    toks = F.split(F.col("text"), " ")
    grams = df.filter(F.size(toks) >= k + w - 1).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - k + 1),
                lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
            )
        ).alias("pos", "g"),
    )
    win = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    )
    got = {
        (r["doc_id"], r["fp"])
        for r in grams.withColumn("winmin", F.min("g").over(win))
        .filter(F.col("pos") >= w - 1)
        .select("doc_id", F.col("winmin").alias("fp"))
        .distinct()
        .collect()
    }
    for i, tk in enumerate(docs):
        n = len(tk) - k + 1
        if n < w:
            assert not {f for (d, f) in got if d == i}
            continue
        hashes = [
            hashlib.md5(" ".join(tk[p : p + k]).encode()).hexdigest()
            for p in range(n)
        ]
        want = {min(hashes[p - w + 1 : p + 1]) for p in range(w - 1, n)}
        have = {f for (d, f) in got if d == i}
        assert have == want, (i, tk)
        # coverage: every w-window of grams intersects the selection
        for p in range(w - 1, n):
            assert any(
                h in want for h in hashes[p - w + 1 : p + 1]
            )


# ---------------------------------------------------------------------------
# r93: clamped ledger scan operator == naive per-key sequential loop
# ---------------------------------------------------------------------------

_ledger_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # user key
        st.integers(min_value=0, max_value=30),       # order position
        st.integers(min_value=-500, max_value=500),   # signed amount
    ),
    min_size=1,
    max_size=50,
)


def _naive_capped_scan(rows, cap):
    by_key: dict[int, list[tuple[int, int, int]]] = {}
    for i, (k, pos, amt) in enumerate(rows):
        # tie-break equal positions by arrival index, mirroring the
        # (s, event_id) total order the query uses
        by_key.setdefault(k, []).append((pos, i, amt))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        bal = capped = floored = 0
        for _, _, amt in evs:
            bal += amt
            if bal > cap:
                bal, capped = cap, capped + 1
            elif bal < 0:
                bal, floored = 0, floored + 1
        out[k] = (bal, capped, floored)
    return out


@_SETTINGS
@given(rows=_ledger_rows, cap=st.sampled_from([0, 1, 100, 100_000]))
def test_r93_capped_scan_equals_naive(spark, rows, cap):
    from graal_cdc_spark.operators.ledger import capped_running_balance

    data = [(k, pos, i, amt) for i, (k, pos, amt) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "k long, pos long, seq long, amt long"
    )
    got = {
        r["k"]: (r["final_balance"], r["n_capped"], r["n_floored"])
        for r in capped_running_balance(
            df, "k", ["pos", "seq"], "amt", cap=cap
        ).collect()
    }
    assert got == _naive_capped_scan(rows, cap)


def test_r93_capped_scan_carry_across_arrow_batches(spark):
    """The r14 mapInPandas rewrite walks each partition with a per-key
    carry; a key's rows can span Arrow batch boundaries. Force tiny
    batches so every multi-row key straddles at least one boundary and
    pin the result against the naive per-key loop."""
    from graal_cdc_spark.operators.ledger import capped_running_balance

    # 6 keys x 25 rows, amounts alternating so clamps fire at both ends
    rows = [
        (k, pos, (1 if (pos + k) % 3 else -2) * (40 + 7 * k + pos))
        for k in range(6)
        for pos in range(25)
    ]
    data = [(k, pos, i, amt) for i, (k, pos, amt) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, pos long, seq long, amt long")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = {
            r["k"]: (r["final_balance"], r["n_capped"], r["n_floored"])
            for r in capped_running_balance(
                df, "k", ["pos", "seq"], "amt", cap=60
            ).collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
    assert got == _naive_capped_scan(rows, 60)


# ---------------------------------------------------------------------------
# r92: ordered-edge triangle join == brute-force combinations count
# ---------------------------------------------------------------------------

_edge_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=0,
    max_size=40,
)


@_SETTINGS
@given(raw=_edge_sets)
def test_r92_triangle_join_equals_bruteforce(spark, raw):
    from itertools import combinations

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    adj: set[tuple[int, int]] = set(edges)
    nodes = sorted({n for e in edges for n in e})
    expected = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    if not edges:
        return
    e = spark.createDataFrame(edges, "pa long, pb long")
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    got = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .count()
    )
    assert got == expected


# ---------------------------------------------------------------------------
# r94: winsorized mean == naive clamp-at-discrete-percentiles
# ---------------------------------------------------------------------------

_vrows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),                  # group
        st.integers(min_value=-5000, max_value=5000), # value (cents)
    ),
    min_size=1,
    max_size=80,
)


def _naive_winsorize(rows):
    import math

    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    out = {}
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        lo = vals[max(0, math.ceil(0.05 * n) - 1)]
        hi = vals[max(0, math.ceil(0.95 * n) - 1)]
        w = [min(max(v, lo), hi) for v in vals]
        out[g] = (n, lo, hi, sum(w), math.floor(sum(w) / n))
    return out


@_SETTINGS
@given(rows=_vrows)
def test_r94_winsorized_mean_equals_naive(spark, rows):
    from graal_cdc_spark.operators.robust import binned_group_quantiles

    df = spark.createDataFrame(rows, "g string, amt long")
    q = binned_group_quantiles(
        df, "g", "amt", probabilities=(0.05, 0.95), bin_width=64.0
    )
    bounds = q.groupBy("g").agg(
        F.min(F.when(F.col("p") == 0.05, F.col("value"))).alias("lo"),
        F.min(F.when(F.col("p") == 0.95, F.col("value"))).alias("hi"),
    )
    got = {
        r["g"]: (
            r["n"], r["lo"], r["hi"], r["s"], r["m"],
        )
        for r in df.join(F.broadcast(bounds), "g")
        .select(
            "g",
            "lo",
            "hi",
            F.least(F.greatest(F.col("amt"), F.col("lo")), F.col("hi")).alias("w"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lo").cast("long").alias("lo"),
            F.min("hi").cast("long").alias("hi"),
            F.sum("w").alias("s"),
            F.floor(F.sum("w") / F.count(F.lit(1))).cast("long").alias("m"),
        )
        .collect()
    }
    assert got == _naive_winsorize(rows)


# ---------------------------------------------------------------------------
# l76: linear quality band == pure-python feature + clamp reference
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.text(
        alphabet="ab the of xyz",  # words + stopwords + spaces
        min_size=1,
        max_size=40,
    ).filter(lambda t: t.strip(" ") != ""),
    min_size=1,
    max_size=12,
)


def _naive_band(text: str) -> int:
    words = text.split(" ")
    n = len(words)
    uniq_milli = 1000 * len(set(words)) // n
    stop = sum(
        1
        for w in words
        if w in ("the", "a", "of", "and", "to", "in", "is", "on")
    )
    import math

    stop_milli = math.floor(stop * 1000 / n)
    awl_milli = math.floor(len(text.replace(" ", "")) * 1000 / n)
    score = 300 + uniq_milli - 2 * stop_milli + (awl_milli // 10)
    # Spark `div` truncates toward zero; negative bands clamp to 0
    # either way, so reproduce truncation then clamp
    band = score // 200 if score >= 0 else -(abs(score) // 200)
    return max(0, min(5, band))


@_SETTINGS
@given(texts=_texts)
def test_l76_band_formula_equals_naive(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["band"]
        for r in df.select(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(5),
                    F.expr(
                        "(300 + (1000 * size(array_distinct(split(text, ' '))) "
                        "div size(split(text, ' '))) "
                        "- 2 * floor(size(filter(split(text, ' '), "
                        "x -> x IN ('the','a','of','and','to','in','is','on')))"
                        " * 1000 / size(split(text, ' '))) "
                        "+ (floor(length(replace(text, ' ', '')) * 1000 "
                        "/ size(split(text, ' '))) div 10)) div 200"
                    ),
                ),
            ).alias("band")
        ).collect()
    ]
    assert sorted(got) == sorted(_naive_band(t) for t in texts)


# ---------------------------------------------------------------------------
# l84 BM25: the Spark pipeline (explode -> postings -> broadcast stats
# -> floored-key ranking) must equal the textbook per-doc BM25 for any
# corpus, including the tie protocol (equal floored keys -> id order).
# ---------------------------------------------------------------------------

_bm25_docs = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=1,
        max_size=20,
    ),
    min_size=2,
    max_size=8,
)


@_SETTINGS
@given(docs=_bm25_docs)
def test_l84_bm25_equals_naive(spark, docs):
    import math

    from graal_cdc_spark.operators.text import bm25_topk

    terms = ["aa", "bb"]
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = bm25_topk(df, "doc_id", "text", terms, k=3).collect()

    n = float(len(docs))
    avgdl = sum(len(ws) for ws in docs) / n

    def naive(term):
        tfs = {i: ws.count(term) for i, ws in enumerate(docs) if term in ws}
        if not tfs:
            return []
        dfx = float(len(tfs))
        idf = math.log(1.0 + (n - dfx + 0.5) / (dfx + 0.5))
        scored = []
        for i, tf in sorted(tfs.items()):
            dl = len(docs[i])
            sc = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
            scored.append((math.floor(sc * 10000), i, tf, dl, sc))
        scored.sort(key=lambda t: (-t[0], t[1]))
        return scored[:3]

    for term in terms:
        exp = naive(term)
        rows = sorted(
            (r for r in got if r["term"] == term), key=lambda r: r["rank"]
        )
        assert [(r["doc_id"], r["tf"], r["dl"]) for r in rows] == [
            (i, tf, dl) for _, i, tf, dl, _ in exp
        ]
        for r, (_, _, _, _, sc) in zip(rows, exp):
            assert abs(r["score"] - sc) <= 1e-4


# ---------------------------------------------------------------------------
# l85 DSIR: hashed-bucket LMs + per-doc mean log ratio must equal the
# naive python recomputation (same md5 bucket family) for any corpus
# and any target split, including docs too short to produce a bigram
# (absent from output) and empty target slices (smoothing only).
# ---------------------------------------------------------------------------

_dsir_docs = st.lists(
    st.lists(
        st.sampled_from(["x", "yy", "zzz", "w"]), min_size=0, max_size=12
    ),
    min_size=1,
    max_size=8,
)


@_SETTINGS
@given(docs=_dsir_docs)
def test_l85_dsir_equals_naive(spark, docs):
    import hashlib
    import math

    from graal_cdc_spark.operators.text import dsir_importance_weights

    df = spark.createDataFrame(
        [(i, " ".join(ws), i % 2 == 0) for i, ws in enumerate(docs)],
        "doc_id long, text string, is_t boolean",
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["weight"])
        for r in dsir_importance_weights(
            df, "doc_id", "text", F.col("is_t")
        ).collect()
    }

    def buckets(ws):
        # NOTE the operator bigrams the raw space-join: an empty word
        # list still yields one empty-string token, so docs with < 2
        # tokens (not < 2 words) produce no features
        toks = " ".join(ws).split(" ")
        return [
            hashlib.md5(f"{a} {b}".encode()).hexdigest()[:2]
            for a, b in zip(toks, toks[1:])
        ]

    feats = {i: buckets(ws) for i, ws in enumerate(docs)}
    raw: dict[str, int] = {}
    tgt: dict[str, int] = {}
    for i, bks in feats.items():
        for b in bks:
            raw[b] = raw.get(b, 0) + 1
            if i % 2 == 0:
                tgt[b] = tgt.get(b, 0) + 1
    rt, tt = float(sum(raw.values())), float(sum(tgt.values()))
    for i, bks in feats.items():
        if not bks:
            assert i not in got
            continue
        lws = [
            math.log(
                ((tgt.get(b, 0) + 1.0) / (tt + 256.0))
                / ((raw[b] + 1.0) / (rt + 256.0))
            )
            for b in bks
        ]
        w = math.floor(sum(lws) / len(lws) * 10000) / 10000
        assert got[i][0] == len(bks)
        assert abs(got[i][1] - w) <= 1e-4


# ---------------------------------------------------------------------------
# l87 Bloom probe: the defining guarantee — NO false negatives for ANY
# corpus split (every exact dup is flagged maybe_dup) — plus agreement
# of the maybe verdict with a naive python Bloom recomputation.
# ---------------------------------------------------------------------------

_bloom_texts = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=12),
    min_size=2,
    max_size=14,
)


@_SETTINGS
@given(texts=_bloom_texts)
def test_l87_bloom_probe_no_false_negatives(spark, texts):
    import hashlib

    from graal_cdc_spark.operators.dedup import bloom_dedup_probe

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    build = df.filter(F.col("doc_id") % 2 == 0)
    probe = df.filter(F.col("doc_id") % 2 == 1)
    got = {
        r["doc_id"]: (r["maybe_dup"], r["exact_dup"])
        for r in bloom_dedup_probe(build, probe, "doc_id", "text").collect()
    }

    def positions(t):
        return {
            int(hashlib.md5(f"{j}|{t}".encode()).hexdigest()[:3], 16)
            for j in range(3)
        }

    bits = set()
    build_texts = set()
    for i, t in rows:
        if i % 2 == 0:
            bits |= positions(t)
            build_texts.add(t)
    for i, t in rows:
        if i % 2 == 1:
            exact = t in build_texts
            maybe = positions(t) <= bits
            assert got[i] == (maybe, exact)
            if exact:  # the Bloom guarantee, stated on its own
                assert got[i][0]


# ---------------------------------------------------------------------------
# l88 BPE: the Spark training loop (pair aggregate -> 1-row best
# collect -> higher-order greedy fold) must equal a sequential
# reference BPE trainer for any corpus — including the adversarial
# fold cases: same-symbol runs ("aaaa" merges at offsets 0 and 2,
# never overlapping) and merged tokens re-appearing as pair members.
# ---------------------------------------------------------------------------

_bpe_words = st.lists(
    st.sampled_from(
        ["aaaa", "aaa", "abab", "aab", "banana", "bananas", "ana", "na",
         "aa", "ab", "b", "low", "lower", "lowest", "newer", "wider"]
    ),
    min_size=1,
    max_size=25,
)


def _ref_bpe(words, rounds, top_syms):
    """Sequential reference BPE: dict word->count, greedy left-to-right
    re-segmentation with explicit skip-ahead."""
    from collections import Counter

    wc = Counter(words)
    segs = {w: list(w) for w in wc}
    merges = []
    for rnd in range(1, rounds + 1):
        pc = Counter()
        for w, syms in segs.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += wc[w]
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, a, b, c))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    sc = Counter()
    for w, syms in segs.items():
        for s in syms:
            sc[s] += wc[w]
    top = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))[:top_syms]
    return merges, [(0, s, "", c) for s, c in top]


@_SETTINGS
@given(words=_bpe_words)
def test_l88_bpe_equals_reference(spark, words):
    from graal_cdc_spark.operators.text import bpe_merge_training

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = sorted(
        (r.rnd, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merge_training(
            df, "text", rounds=3, vocab_cap=300, top_syms=10
        ).collect()
    )
    merges, top = _ref_bpe(words, rounds=3, top_syms=10)
    assert got == sorted(merges + top)


@_SETTINGS
@given(words=_bpe_words)
def test_apply_merges_reproduces_training_segmentation(spark, words):
    """Training↔application equivalence (VERDICT r8 #6): re-applying
    the TRAINED rules through apply_merges to the raw character
    segmentation reproduces the reference's final per-word
    segmentation — the shared _fuse_pair fold really is one
    definition, and an ordered rule list round-trips through the
    reusable operator."""
    import pyspark.sql.functions as F

    from graal_cdc_spark.operators.text import apply_merges

    merges, _ = _ref_bpe(words, rounds=3, top_syms=10)
    rules = [(a, b) for _, a, b, _ in merges]
    uniq = sorted(set(words))
    df = spark.createDataFrame([(w,) for w in uniq], "word string")
    seg = df.withColumn(
        "syms",
        F.expr(
            "transform(sequence(1, length(word)), j -> substring(word, j, 1))"
        ),
    )
    got = {
        r.word: list(r.syms)
        for r in apply_merges(seg, "syms", rules, checkpoint_every=2).collect()
    }
    # recompute the reference segmentation for the same rules
    segs = {w: list(w) for w in uniq}
    for a, b in rules:
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    assert got == segs


# ---------------------------------------------------------------------------
# l90 Misra-Gries: heavy_hitters_exact must equal the naive exact
# answer for ANY stream (the sketch is only a candidate generator —
# dropping a true heavy hitter would change the result), and each
# per-partition summary must respect the capacity bound.
# ---------------------------------------------------------------------------

_mg_streams = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
    min_size=1,
    max_size=120,
)


@_SETTINGS
@given(toks=_mg_streams, k=st.integers(min_value=1, max_value=5))
def test_l90_heavy_hitters_equals_exact(spark, toks, k):
    from collections import Counter

    from graal_cdc_spark.operators.sketch import heavy_hitters_exact

    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = sorted(
        (r.token, r.cnt)
        for r in heavy_hitters_exact(df, "token", k).collect()
    )
    n = len(toks)
    exp = sorted(
        (t, c) for t, c in Counter(toks).items() if c * (k + 1) > n
    )
    assert got == exp


def test_l90_mg_summary_capacity_and_superset(spark):
    """A deliberately skewed single-partition stream: the summary
    stays within capacity AND keeps every above-threshold token."""
    from graal_cdc_spark.operators.sketch import misra_gries_summaries

    # 1000 x 'hot', 400 x 'warm', 120 distinct cold tokens x 3
    toks = (
        ["hot"] * 1000 + ["warm"] * 400
        + [f"cold{i}" for i in range(120) for _ in range(3)]
    )
    df = spark.createDataFrame([(t,) for t in toks], "t string").coalesce(1)
    rows = misra_gries_summaries(df, "t", k=10).collect()
    assert len(rows) <= 10
    survivors = {r.token for r in rows}
    n = len(toks)
    for tok, cnt in (("hot", 1000), ("warm", 400)):
        assert cnt * 11 > n and tok in survivors


@_SETTINGS
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("abcdé☃xyz "), min_size=3, max_size=24
        ),
        min_size=1,
        max_size=20,
    ),
    k=st.integers(min_value=1, max_value=5),
)
def test_l90_chargram_heavy_hitters_equals_exact(spark, texts, k):
    """The batch-internal char-trigram counter (no exploded frame)
    must equal naive exact counting for ANY corpus — including
    non-ASCII codepoints through the 21-bit packing."""
    from collections import Counter

    from graal_cdc_spark.operators.sketch import (
        heavy_hitters_exact_chargrams,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    total = docs.agg(
        F.sum(F.length("text") - 2).cast("long").alias("n_total")
    )
    got = sorted(
        (r.token, r.cnt)
        for r in heavy_hitters_exact_chargrams(
            docs, "text", 3, k, total
        ).collect()
    )
    exact = Counter(
        t[i : i + 3] for t in texts for i in range(len(t) - 2)
    )
    n = sum(exact.values())
    exp = sorted((g, c) for g, c in exact.items() if c * (k + 1) > n)
    assert got == exp
