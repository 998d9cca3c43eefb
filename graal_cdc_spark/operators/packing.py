"""Token-budget sequence packing — shard assignment for training runs.

Pre-training dataloaders consume fixed-token shards; assigning each
document to a shard by running token count makes the shard layout a
pure function of the corpus — re-runs and backfills produce identical
shards. Two schemes:

- :func:`pack_by_token_budget` — continuous cumulative-sum assignment
  (one window function, zero Python). Shards average exactly
  ``budget`` tokens but an individual shard can exceed it by up to one
  document (the doc crossing the boundary stays in the prior shard).
- :func:`pack_by_token_budget_greedy` — exact first-fit semantics
  (a shard never exceeds the budget unless a single document is itself
  over-budget, in which case that document sits alone). Sequential
  scan per group via ``applyInPandas``.

Shape: one window (cumulative sum) partitioned by a pack group — NOT a
single global window, which would funnel the whole corpus through one
task. Groups pack independently (e.g. by source, date, or a hash
bucket of the doc id); at 100 TB choose groups sized so one group's
documents fit a task comfortably. Within a group the order is the
explicit ``order_col`` — deterministic, not arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graal_cdc_spark.operators.text import token_count


def pack_by_token_budget(
    df: DataFrame,
    group_col: str,
    order_col: str,
    text_col: str = "text",
    budget: int = 2048,
) -> DataFrame:
    """Assign each document a shard number within its pack group:
    ``shard = floor(tokens_before / budget)`` where ``tokens_before``
    is the running token total of all earlier documents in the group.

    Continuous-packing semantics, stated honestly: the token stream is
    cut at exact multiples of ``budget``, and a document whose tokens
    straddle a cut stays in the EARLIER shard — so a shard may exceed
    the budget by up to one document, and a document larger than the
    budget shares its shard with the docs before the cut. Shards
    average exactly ``budget`` tokens and the whole assignment is one
    window cumsum (no Python, no sequential scan). When fixed-capacity
    shards are the contract, use :func:`pack_by_token_budget_greedy`.
    Documents are never split — chunk upstream first.

    Returns the input plus ``n_tok`` and ``shard`` columns.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = token_count(F.col(text_col))
    before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return (
        df.withColumn("n_tok", n_tok)
        .withColumn("shard", F.floor(before / budget).cast("int"))
    )


def pack_by_token_budget_greedy(
    df: DataFrame,
    group_col: str,
    order_col: str,
    text_col: str = "text",
    budget: int = 2048,
) -> DataFrame:
    """First-fit shard assignment with a hard capacity: walk the group
    in ``order_col`` order keeping a running total; when adding the
    next document would exceed ``budget``, close the shard and start a
    new one. Guarantees every shard's total ``<= budget`` EXCEPT a
    document that is itself over-budget — that document always gets a
    shard of its own (the doc before it closed the shard, and the doc
    after it sees an over-budget accumulator and opens a new one).

    The scan is inherently sequential per group (each cut depends on
    all earlier cuts — not a prefix-sum), so it runs as an
    Arrow-batched ``applyInPandas`` per group: one shuffle on
    ``group_col``, then an O(group) loop executor-side. Same
    parallelism contract as the window variant — size groups so one
    group fits a task.

    Returns the input plus ``n_tok`` and ``shard`` columns.
    """
    import numpy as np

    from pyspark.sql.types import IntegerType, StructField, StructType

    with_tok = df.withColumn("n_tok", token_count(F.col(text_col)))
    # copy, don't .add(): StructType.add mutates in place, and df.schema
    # is a cached handle — mutating it desyncs df.columns from the plan
    out_schema = StructType(
        list(with_tok.schema.fields) + [StructField("shard", IntegerType())]
    )

    def _pack(pdf):
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        toks = pdf["n_tok"].to_numpy()
        shards = np.empty(len(toks), dtype=np.int32)
        shard, acc = 0, 0
        for i, n in enumerate(toks):
            if i > 0 and acc + n > budget:
                shard, acc = shard + 1, 0
            acc += n
            shards[i] = shard
        return pdf.assign(shard=shards)

    return with_tok.groupBy(group_col).applyInPandas(_pack, schema=out_schema)


def chunk_by_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    pretraining prep step between cleaning and packing (long documents
    become sequence-length-sized pieces; the overlap preserves context
    at the seams).

    Map-side only: sequence + transform + explode inside one codegen
    stage, no shuffle, no UDF. Chunk starts step by
    ``chunk_tokens - overlap``; the last chunk may be short; documents
    shorter than one chunk yield exactly one chunk.

    Returns ``(id_col, chunk_idx INT, chunk_text STRING, chunk_tokens
    INT)``.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # chunk start positions (1-based): 1, 1+step, ... while start <= n
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(step))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, s, chunk_tokens)).alias("chunk_text"),
            F.least(n - s + 1, F.lit(chunk_tokens)).cast("int").alias("chunk_tokens"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        # a tail chunk of <= overlap tokens is fully contained in its
        # predecessor — pure duplication, drop it (first chunk exempt)
        .filter(
            (F.col("c.chunk_idx") == 0) | (F.col("c.chunk_tokens") > overlap)
        )
        .select(id_col, "c.chunk_idx", "c.chunk_text", "c.chunk_tokens")
    )
