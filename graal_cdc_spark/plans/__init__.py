"""Physical-plan auditing.

The reference has no optimizer (SURVEY.md §4.1) — Catalyst is the
optimizer here, and this module is how we *verify* it did its job:
every scale-sensitive query asserts plan properties (filter pushdown,
column pruning, broadcast joins, partial aggregation, whole-stage
codegen) in tests, so a regression that would melt down at 100 TB
fails CI at 60k rows.
"""

from graal_cdc_spark.plans.audit import PlanAudit, audit

__all__ = ["PlanAudit", "audit"]
