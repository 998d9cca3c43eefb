"""The engine's scalar-function surface.

The reference's only "function library" is whatever user JavaScript
does per record inside the GraalJS runtime (U1,
``ScriptExecutor.java:167-199``) plus fastjson2 member access (P1).
Here the surface is explicit and JVM-side: column expressions built on
``pyspark.sql.functions`` (codegen, no Python in the hot path),
re-exported from the operator modules, plus:

- :func:`register_sql_functions` — expose them to ``spark.sql`` users
  as named SQL functions (the analog of binding host functions into
  the script scope, U4 ``ScriptExecutor.java:63-75``).
- :func:`register_python_udf` — the declared row-level Python UDF
  escape hatch (R22 parity); everything else stays vectorized.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from graal_cdc_spark.operators.similarity import cosine, dot, l2_norm
from graal_cdc_spark.operators.text import (
    BPE_TOKEN_RE,
    STOPWORDS,
    bpe_token_count,
    fingerprint,
    langid_heuristic,
    stopword_count,
    token_count,
    tokens,
    vowel_ratio,
)

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "tokens",
    "token_count",
    "bpe_token_count",
    "stopword_count",
    "vowel_ratio",
    "langid_heuristic",
    "fingerprint",
    "STOPWORDS",
    "BPE_TOKEN_RE",
    "json_get",
    "register_sql_functions",
    "register_python_udf",
]


def json_get(col: Column, path: str) -> Column:
    """P1 — JSONPath member access over a JSON string column
    (``DebeziumEngineRecordHandler.java:160,168,177-179``)."""
    return F.get_json_object(col, f"$.{path}")


# SQL scalar UDFs (Spark 4 `CREATE TEMPORARY FUNCTION ... RETURN
# <expr>`): pure Catalyst expression bodies — they inline into the
# caller's plan and stay inside whole-stage codegen (verified: no
# BatchEvalPython in the physical plan).
_DOT = "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
_NORM = "sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0D, (acc, x) -> acc + x))"
_NORM_B = _NORM.replace("(a, a,", "(b, b,")

_SQL_FUNCTIONS: dict[str, str] = {
    "gc_dot": f"(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN {_DOT}",
    "gc_l2_norm": f"(a ARRAY<DOUBLE>) RETURNS DOUBLE RETURN {_NORM}",
    "gc_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE "
        f"RETURN {_DOT} / ({_NORM} * {_NORM_B})"
    ),
    "gc_token_count": "(x STRING) RETURNS INT RETURN size(split(x, ' '))",
    "gc_bpe_token_count": (
        "(x STRING) RETURNS INT RETURN "
        f"size(regexp_extract_all(x, '{BPE_TOKEN_RE}', 0))"
    ),
    "gc_stopword_count": (
        "(x STRING) RETURNS INT RETURN size(filter(split(x, ' '), t -> t IN ("
        + ", ".join(f"'{s}'" for s in STOPWORDS)
        + ")))"
    ),
    "gc_vowel_ratio": (
        "(x STRING) RETURNS DOUBLE RETURN "
        "length(regexp_replace(x, '[^aeiou]', '')) / length(x)"
    ),
    "gc_langid": (
        "(x STRING) RETURNS STRING RETURN CASE "
        "WHEN length(regexp_replace(x, '[^aeiou]', '')) / length(x) > 0.40 THEN 'es' "
        "WHEN length(regexp_replace(x, '[^aeiou]', '')) / length(x) > 0.35 THEN 'de' "
        "ELSE 'zh' END"
    ),
    "gc_fingerprint": "(x STRING) RETURNS STRING RETURN md5(x)",
    "gc_json_get": (
        "(x STRING, p STRING) RETURNS STRING "
        "RETURN get_json_object(x, concat('$.', p))"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Expose the engine functions to ``spark.sql`` users as SQL
    scalar UDFs — the analog of binding host functions into the user
    script scope (U4). Bodies are single Catalyst expressions, so
    calls inline into the plan with no Python and no UDF boundary.
    Returns the registered names."""
    for name, signature in _SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{signature}")
    return list(_SQL_FUNCTIONS)


def register_python_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """R22/U1 — register a row-level Python UDF (the declared escape
    hatch, mirroring per-record scripts). Use for logic that genuinely
    cannot be a Catalyst expression or a pandas UDF; it is the slow
    path by design (SURVEY.md §7.3.5)."""
    return spark.udf.register(name, fn, return_type)
