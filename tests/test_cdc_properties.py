"""Property-based CDC tests (SURVEY.md §5.2.5).

Invariant: for ANY event log — random ops c/u/d/r, random keys,
interleaved tombstones / DDL / malformed / non-row noise — the
engine's filter chain + latest-by-key compaction equals a naive
sequential replay of the log (the reference's semantics: per-key
ordered apply with id-keyed upsert/delete,
``DebeziumEngineRecordHandler.java:130-146`` +
``ElasticsearchUtils.java:131-177``).
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graal_cdc_spark.cdc.compaction import compact_cdc
from graal_cdc_spark.cdc.envelope import parse_envelope

_KEYS = [str(k) for k in range(6)]


def _envelope(op: str, key: str, seq: int) -> str:
    after = "null" if op == "d" else json.dumps({"k": key, "v": seq})
    return (
        '{"payload":{"op":"%s","before":null,"after":%s,'
        '"source":{"db":"appdb","table":"t"}}}' % (op, after)
    )


_event = st.one_of(
    # row-level events (the signal)
    st.tuples(st.sampled_from("cudr"), st.sampled_from(_KEYS)),
    # noise the filter chain must drop
    st.just(("tombstone", None)),
    st.just(("ddl", None)),
    st.just(("malformed", None)),
    st.just(("nonrow", None)),
)


def _value(kind: str, key: str | None, seq: int) -> tuple[int, str | None, str | None]:
    if kind == "tombstone":
        return (seq, "0", None)
    if kind == "ddl":
        return (seq, "0", '{"payload":{"ddl":"ALTER TABLE t ADD c INT","source":{"db":"appdb","table":"t"}}}')
    if kind == "malformed":
        return (seq, "0", '{"noPayload":true}')
    if kind == "nonrow":
        return (seq, "0", '{"payload":{"op":"m","after":{},"source":{"db":"appdb","table":"t"}}}')
    return (seq, key, _envelope(kind, key, seq))


def _naive_replay(log: list[tuple[int, str | None, str | None]]) -> dict[str, tuple]:
    """Reference semantics, row at a time: upsert on c/u/r, delete on d;
    drop all noise. Returns key -> (op, seq) of the live rows."""
    state: dict[str, tuple] = {}
    for seq, key, value in sorted(log):
        if value is None:
            continue
        payload = json.loads(value).get("payload")
        if payload is None or "ddl" in payload or "after" not in payload:
            continue
        op = payload.get("op")
        if op not in ("c", "u", "r", "d"):
            continue
        if op == "d":
            state.pop(key, None)
        else:
            state[key] = (op, seq)
    return state


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(_event, min_size=0, max_size=60))
def test_compaction_equals_sequential_replay(spark, events):
    log = [_value(kind, key, seq * 10) for seq, (kind, key) in enumerate(events)]
    expected = _naive_replay(log)

    df = spark.createDataFrame(
        log or [(0, "0", None)], "seq BIGINT, key STRING, value STRING"
    )
    compacted = compact_cdc(parse_envelope(df))
    got = {r["key"]: (r["op"], r["seq"]) for r in compacted.collect()}
    assert got == expected


def _scd2(spark, log):
    """The c08 transform over an arbitrary envelope log."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        log or [(0, "0", None)], "seq BIGINT, key STRING, value STRING"
    )
    w = Window.partitionBy("key").orderBy("seq")
    return (
        parse_envelope(df)
        .withColumn("valid_to_seq", F.lead("seq").over(w))
        .filter(F.col("op") != "d")
        .select("key", F.col("seq").alias("valid_from_seq"), "valid_to_seq", "op")
        .collect()
    )


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(_event, min_size=0, max_size=60))
def test_scd2_intervals_tile_each_keys_history(spark, events):
    """SCD2 invariants for ANY log: per key, version intervals are
    disjoint, ordered, and chain exactly through the key's row events
    (each interval closes at the key's next event); exactly one open
    interval iff the key's final event is not a delete; the open
    interval is the compacted live row."""
    log = [_value(kind, key, seq * 10) for seq, (kind, key) in enumerate(events)]
    live = _naive_replay(log)

    rows = _scd2(spark, log)
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)

    # which (key, seq) are row events surviving the filter chain?
    events_per_key: dict[str, list[int]] = {}
    ops_at: dict[tuple[str, int], str] = {}
    for seq, key, value in sorted(log):
        if value is None:
            continue
        payload = json.loads(value).get("payload")
        if payload is None or "ddl" in payload or "after" not in payload:
            continue
        if payload.get("op") not in ("c", "u", "r", "d"):
            continue
        events_per_key.setdefault(key, []).append(seq)
        ops_at[(key, seq)] = payload["op"]

    for key, seqs in events_per_key.items():
        versions = sorted(by_key.get(key, []), key=lambda r: r["valid_from_seq"])
        want = [s for s in seqs if ops_at[(key, s)] != "d"]
        assert [v["valid_from_seq"] for v in versions] == want
        for v in versions:
            i = seqs.index(v["valid_from_seq"])
            expected_close = seqs[i + 1] if i + 1 < len(seqs) else None
            assert v["valid_to_seq"] == expected_close
        open_intervals = [v for v in versions if v["valid_to_seq"] is None]
        if key in live:
            assert len(open_intervals) == 1
            assert open_intervals[0]["valid_from_seq"] == live[key][1]
        else:
            assert open_intervals == []


# ---------------------------------------------------------------------------
# Round-4 operator properties
# ---------------------------------------------------------------------------


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),          # group
            st.integers(0, 50),                    # value (price proxy)
            st.integers(1, 9),                     # weight
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_is_tie_order_independent(spark, rows):
    """r64's cumsum-threshold weighted median must not depend on the
    arbitrary intra-tie accumulation order: smallest v with
    W(<=v)*2 >= W_total, computed naively per group, equals the
    windowed form for ANY input — including heavy duplicate values."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "g string, v int, w int")
    wcum = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("g")
    got = {
        r["g"]: r["m"]
        for r in (
            df.withColumn("cum", F.sum("w").over(wcum))
            .withColumn("tot", F.sum("w").over(wtot))
            .filter(F.col("cum") * 2 >= F.col("tot"))
            .groupBy("g")
            .agg(F.min("v").alias("m"))
            .collect()
        )
    }
    want = {}
    for g in {g for g, _, _ in rows}:
        grp = sorted((v, w) for gg, v, w in rows if gg == g)
        tot = sum(w for _, w in grp)
        cum = 0
        for v, w in grp:
            cum += w
            if cum * 2 >= tot:
                want[g] = v
                break
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    starts=st.lists(st.integers(0, 120), min_size=1, max_size=40),
    dur=st.integers(1, 30),
)
def test_sweep_line_peak_matches_naive_overlap_count(spark, starts, dur):
    """r56's pre-aggregated sweep line (half-open [s, s+dur)) equals
    the brute-force 'max over minutes of intervals covering t'."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in starts], "s int")
    deltas = (
        df.select(F.col("s").alias("t"), F.lit(1).alias("d"))
        .unionAll(df.select((F.col("s") + dur).alias("t"), F.lit(-1).alias("d")))
        .groupBy("t")
        .agg(F.sum("d").alias("net"))
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = (
        deltas.withColumn("cum", F.sum("net").over(w))
        .agg(F.max("cum").alias("m"))
        .collect()[0]["m"]
    )
    want = max(
        sum(1 for s in starts if s <= t < s + dur)
        for t in range(0, max(starts) + dur + 1)
    )
    assert got == want


# ---------------------------------------------------------------------------
# c30 DLQ: split_dead_letters must be the EXACT complement of the
# F3->F7 filter chain — accepted == chain output, accepted ∪ rejected
# == input, disjoint — for adversarial envelopes (null values, no
# payload, ddl, weird ops, missing after, op='d' with "after": null).
# ---------------------------------------------------------------------------

_envelope_values = st.lists(
    st.sampled_from([
        None,                                               # tombstone
        '{"noPayload": true}',                              # malformed
        '{"payload": {"ddl": "ALTER TABLE x"}}',            # ddl
        '{"payload": {"op": "m", "after": {}}}',            # non-row op
        '{"payload": {"op": "c"}}',                         # missing after
        '{"payload": {"op": "c", "after": {"a": 1}}}',      # accepted
        '{"payload": {"op": "d", "after": null}}',          # delete: F7 passes
        '{"payload": {"op": "u", "after": {"a": 2}, "ddl": "X"}}',  # ddl wins
    ]),
    min_size=1,
    max_size=16,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=_envelope_values)
def test_dlq_split_is_exact_complement_of_filter_chain(spark, values):
    from graal_cdc_spark.cdc.filters import (
        row_event_filter_chain,
        split_dead_letters,
    )

    df = spark.createDataFrame(
        [(i, f"k{i}", v) for i, v in enumerate(values)],
        "seq long, key string, value string",
    )
    accepted, rejected = split_dead_letters(df)
    acc = {r.seq for r in accepted.collect()}
    rej = {r.seq: r.reject_reason for r in rejected.collect()}
    chain = {r.seq for r in row_event_filter_chain(df).collect()}
    assert acc == chain
    assert acc.isdisjoint(rej)
    assert acc | set(rej) == set(range(len(values)))
    # precedence: reason == the FIRST failing filter
    expect = {
        None: "tombstone",
        '{"noPayload": true}': "malformed",
        '{"payload": {"ddl": "ALTER TABLE x"}}': "ddl",
        '{"payload": {"op": "m", "after": {}}}': "non_row_op",
        '{"payload": {"op": "c"}}': "missing_after",
        '{"payload": {"op": "u", "after": {"a": 2}, "ddl": "X"}}': "ddl",
    }
    for i, v in enumerate(values):
        if v in expect:
            assert rej[i] == expect[v], (i, v)
        else:
            assert i in acc, (i, v)


# ---------------------------------------------------------------- locate ranges


def _rand_predicate_and_row(draw):
    """A random predicate over columns a/b/c plus a random row; built
    from comparisons, IN lists, AND/OR/NOT nesting, parens, function
    calls and BETWEEN — the full grammar _predicate_ranges must stay
    SOUND under (it may extract nothing, never a wrong bound)."""
    from hypothesis import strategies as st

    cols = ("a", "b", "c")
    lit = st.integers(min_value=-20, max_value=20)
    # string values whose CONTENT tries to confuse the lexer: AND/OR
    # words, parens, an escaped quote — the quoted-literal handling
    # must keep them inert
    svals = ("a AND b", "x OR y", "it's", "NOT (z)", "plain", "5")

    def leaf():
        col = draw(st.sampled_from(cols))
        kind = draw(st.sampled_from(
            ["cmp", "cmp_rev", "in", "between", "func", "isnull",
             "scmp"]
        ))
        if kind == "scmp":
            v = draw(st.sampled_from(svals)).replace("'", "''")
            op = draw(st.sampled_from(["=", "<", ">="]))
            return f"s {op} '{v}'" 
        if kind == "cmp":
            op = draw(st.sampled_from(["<", "<=", "=", ">=", ">"]))
            return f"{col} {op} {draw(lit)}"
        if kind == "cmp_rev":
            op = draw(st.sampled_from(["<", "<=", "=", ">=", ">"]))
            return f"{draw(lit)} {op} {col}"
        if kind == "in":
            vals = draw(st.lists(lit, min_size=1, max_size=4))
            return f"{col} IN ({', '.join(map(str, vals))})"
        if kind == "between":
            lo, hi = sorted((draw(lit), draw(lit)))
            return f"{col} BETWEEN {lo} AND {hi}"
        if kind == "func":
            return f"abs({col}) <= {abs(draw(lit))}"
        return f"{col} IS NOT NULL"

    def expr(depth):
        if depth == 0 or draw(st.booleans()):
            e = leaf()
        else:
            op = draw(st.sampled_from(["AND", "OR"]))
            left, right = expr(depth - 1), expr(depth - 1)
            e = f"{left} {op} {right}"
            if draw(st.booleans()):
                e = f"({e})"
        if draw(st.integers(0, 9)) == 0:
            e = f"NOT ({e})"
        return e

    pred = expr(draw(st.integers(0, 3)))
    row = {c: draw(lit) for c in cols}
    row["s"] = draw(st.sampled_from(svals))
    return pred, row


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_predicate_ranges_never_exclude_a_matching_row(data):
    """SOUNDNESS fuzz for the write-side locate (VERDICT r12 #1): for
    ANY predicate the grammar can produce, every row that SATISFIES
    the predicate must fall inside every extracted range — a file
    whose stats exclude the range can then never hold a matching row.
    Evaluated against DuckDB as the SQL-semantics referee."""
    import duckdb

    from graal_cdc_spark.sinks.versioned_lake import _predicate_ranges

    pred, row = _rand_predicate_and_row(data.draw)
    con = duckdb.connect()
    sval = row["s"].replace("'", "''")
    matches = con.execute(
        f"SELECT count(*) FROM (SELECT {row['a']} AS a, {row['b']} AS b, "
        f"{row['c']} AS c, '{sval}' AS s) t WHERE {pred}"
    ).fetchone()[0]
    con.close()
    if not matches:
        return  # only satisfying rows constrain soundness
    for col, (lo, hi) in _predicate_ranges(pred).items():
        v = row[col]
        try:
            assert lo is None or v >= lo, (pred, col, row)
            assert hi is None or v <= hi, (pred, col, row)
        except TypeError:
            # a string bound on s compared via SQL collation vs
            # Python ordering: both ascii-ordered here, compare as str
            assert lo is None or str(v) >= str(lo), (pred, col, row)
            assert hi is None or str(v) <= str(hi), (pred, col, row)
