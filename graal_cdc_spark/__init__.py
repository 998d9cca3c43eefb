"""graal_cdc_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference CDC engine ``iQiFengLe/graal-cdc`` (see SURVEY.md): CDC
envelope parsing + filter chain + latest-by-key compaction, a full
relational operator surface (joins, aggregates, windows, set ops,
scalar functions), LLM-training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing), streaming
(Structured Streaming) equivalents with stateful operators and skew
handling, Elasticsearch/JDBC sinks, a pipeline registry/runner control
plane, and physical-plan auditing.

Design stance (SURVEY.md §7.1): DataFrame/SQL only — Catalyst + AQE do
the optimization; batch and streaming share logical operators; Python
end-to-end with Arrow-vectorized UDFs only where built-ins cannot
express the semantics.
"""

__version__ = "0.1.0"
