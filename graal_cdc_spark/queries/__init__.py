"""Query registry — the correctness contract surface (SURVEY.md §2.4).

Every entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB oracle SQL string (or ``None`` for
non-SQL-expressible ops). ``__spark_entry__.py`` exposes this registry
to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str  # cdc | relational | llm | streaming | pipeline
    description: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL over the registered table views
    reference: str = ""  # reference file:line this capability derives from


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name {spec.name!r}")
    _REGISTRY[spec.name] = spec
    return spec


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in all_specs().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import all query modules (they register on import)."""
    global _LOADED
    if _LOADED:
        return
    from graal_cdc_spark.queries import cdc, relational, llm, streaming  # noqa: F401

    _LOADED = True
