"""Oracle-parity tests — the local twin of the driver's correctness gate.

Every registered query with an oracle runs in Spark and DuckDB at
sf0.001 and must match on columns, row count, and canonicalized values.
"""

from __future__ import annotations

import pytest

from graal_cdc_spark.queries import all_specs
from graal_cdc_spark.testing import compare_query

SPECS = {n: s for n, s in all_specs().items() if s.oracle is not None}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_parity(spark, sf_dir, name):
    compare_query(spark, SPECS[name], sf_dir)
