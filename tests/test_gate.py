"""Gate-window rotation policy tests (graal_cdc_spark/queries/gate.py).

The ordering must be blind to expected outcomes: never-gated first,
then latest-round failures, then passing queries least-recently-first.
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
    assert order == ["d", "e", "c", "b", "a"]


def test_ordering_is_deterministic_and_total():
    specs = all_specs()
    again = all_specs()
    assert list(specs) == list(again)
    assert len(specs) == len(set(specs))


def test_never_gated_queries_lead_the_window():
    """Every registered query the artifacts have never covered must sit
    inside the gate window (as long as there is room for all of them)."""
    history = load_history()
    specs = all_specs()
    never = [n for n in specs if n not in history]
    if len(never) <= GATE_WINDOW:
        window = list(specs)[:GATE_WINDOW]
        assert set(never) <= set(window)
        # and they come before anything with a passing history
        first_pass = next(
            (i for i, n in enumerate(window)
             if n in history and history[n][1]),
            len(window),
        )
        assert all(window.index(n) < first_pass for n in never)
