"""Gate-window rotation policy tests (graal_cdc_spark/queries/gate.py).

The ordering must be blind to expected outcomes: latest-round failures
first (so fixes get re-examined by the gate), then never-gated, then
passing queries least-recently-first.
"""

from graal_cdc_spark.queries import all_specs
from graal_cdc_spark.queries.gate import (
    GATE_WINDOW,
    _row_passed,
    load_history,
    verification_order,
)


def test_row_passed_semantics():
    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "err": None}
    assert _row_passed(ok)
    assert not _row_passed({**ok, "hash_match": False})
    assert not _row_passed({**ok, "err": "boom"})
    # rows-only: pass iff the driver recorded a row count
    assert _row_passed({"err": "no_oracle", "spark_rows": 0})
    assert not _row_passed({"err": "no_oracle", "spark_rows": None})


def test_ordering_policy():
    registry = {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}
    history = {
        "a": (3, True),   # passed recently
        "b": (1, True),   # passed long ago
        "c": (3, False),  # failed latest round
        # d, e never gated
    }
    order = verification_order(registry, history)
    assert order == ["c", "d", "e", "b", "a"]


def test_ordering_is_deterministic_and_total():
    specs = all_specs()
    again = all_specs()
    assert list(specs) == list(again)
    assert len(specs) == len(set(specs))


def test_unproven_queries_lead_the_window():
    """Failures and never-gated queries (the unproven set) must fill the
    gate window before any query with a passing history appears."""
    history = load_history()
    specs = all_specs()
    order = list(specs)
    failed = [n for n in specs if n in history and not history[n][1]]
    never = [n for n in specs if n not in history]
    unproven = failed + never
    window = order[:GATE_WINDOW]
    if len(unproven) <= GATE_WINDOW:
        assert set(unproven) <= set(window)
    else:
        # window must consist ENTIRELY of unproven queries
        assert set(window) <= set(unproven)
    # failures come before everything else
    for n in failed:
        assert order.index(n) < min(
            (order.index(m) for m in never), default=len(order)
        )
    # nothing passing may precede anything unproven
    first_pass = next(
        (i for i, n in enumerate(order)
         if n in history and history[n][1]),
        len(order),
    )
    assert all(order.index(n) < first_pass for n in unproven)
