"""Inspect a DataFrame's optimized/physical plan for scale properties."""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def _formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@dataclass(frozen=True)
class PlanAudit:
    """Parsed view of a physical plan (from ``explain formatted``)."""

    plan: str

    # -- scan-level ---------------------------------------------------------

    def pushed_filters(self) -> list[str]:
        """Filters the parquet reader will evaluate (predicate pushdown)."""
        out: list[str] = []
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", self.plan):
            body = m.group(1).strip()
            if body:
                out.extend(p.strip() for p in body.split(","))
        return out

    def read_schemas(self) -> list[str]:
        """Struct schemas actually read from parquet (column pruning)."""
        return re.findall(r"ReadSchema: (struct<[^\n]*)", self.plan)

    def scan_columns(self) -> set[str]:
        cols: set[str] = set()
        for schema in self.read_schemas():
            cols.update(re.findall(r"(\w+):", schema))
        return cols

    # -- join / agg strategies ---------------------------------------------

    def has(self, operator: str) -> bool:
        return operator in self.plan

    def count(self, operator: str) -> int:
        return self.plan.count(operator)

    @property
    def broadcast_joins(self) -> int:
        return self.count("BroadcastHashJoin")

    @property
    def sortmerge_joins(self) -> int:
        return self.count("SortMergeJoin")

    @property
    def shuffles(self) -> int:
        """Shuffle exchanges (broadcast exchanges excluded)."""
        return len(re.findall(r"\(\d+\) Exchange\b", self.plan))

    @property
    def partial_aggregates(self) -> bool:
        """Map-side combine before the shuffle (HashAggregate partial)."""
        # formatted plans render "Functions [4]: [partial_corr(...), ...]",
        # simple-string plans render "...partial_sum..." / "Partial"
        return "partial_" in self.plan or "Partial" in self.plan

    @property
    def codegen_stages(self) -> int:
        """Number of whole-stage-codegen spans (wider is better)."""
        return len(set(re.findall(r"codegen id : (\d+)", self.plan)))

    @property
    def python_evals(self) -> int:
        """Row-at-a-time Python UDF operators in the plan (slow path —
        should be 0 everywhere except declared UDF-parity queries).
        Arrow-batched ``ArrowEvalPython``/``MapInPandas`` not counted."""
        return self.count("BatchEvalPython")


def audit(df: DataFrame) -> PlanAudit:
    return PlanAudit(_formatted_plan(df))
