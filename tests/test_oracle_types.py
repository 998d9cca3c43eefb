"""Registry-wide portable-result-type lint.

Round-5 postmortem: every external-gate hash FAIL (c21/r76/r77/r78/
r80/r89) had a DuckDB HUGEINT (`//` on BIGINT) or raw DECIMAL result
column; every pass had neither. The gate's value hash canonicalizes
int/float/str/date/bool portably across engines, but not engine-
specific wide types. This lint makes the class unrepresentable:

- every oracle's inferred DuckDB result types contain no
  HUGEINT / UHUGEINT / DECIMAL;
- every Spark query's result schema contains no DecimalType.

Decimals must render through CAST(... AS VARCHAR) / .cast("string")
(the r02 pattern); integer quotients through CAST(... AS BIGINT).
"""

from __future__ import annotations

import pytest

from graal_cdc_spark.queries import all_specs
from graal_cdc_spark.testing import (
    _oracle_nonportable,
    oracle_result_types,
)

SF_SMOKE = "/root/testdata/sf0.001"

_SPECS = all_specs()


@pytest.mark.parametrize(
    "name", [n for n, s in _SPECS.items() if s.oracle is not None]
)
def test_oracle_surface_portable(name):
    # substring match (via _oracle_nonportable) so DECIMAL nested in
    # STRUCT(...)/LIST(...) is caught too
    bad = _oracle_nonportable(
        oracle_result_types(_SPECS[name].oracle, SF_SMOKE)
    )
    assert not bad, (
        f"{name}: oracle result columns {bad} are not portable through "
        f"the gate hash — CAST // quotients to BIGINT and decimals to "
        f"VARCHAR"
    )


# The Spark-side decimal lint lives in
# tests/test_plans.py::test_no_slow_paths (r14): "building the
# DataFrame is lazy" was wrong for the eager builders (lake
# lifecycles, CC probe counts, build-once tables) — the standalone
# all-specs loop here cost 160 s of pure duplicated construction,
# while test_no_slow_paths already builds every query's DataFrame
# for the plan audit. Same assertion, same surface, one construction.
