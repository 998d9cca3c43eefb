"""Token-budget sequence packing — shard assignment for training runs.

Pre-training dataloaders consume fixed-token shards; assigning each
document to a shard by running token count (documents are packed in a
stable order until the budget fills, then the next shard starts) makes
the shard layout a pure function of the corpus — re-runs and
backfills produce identical shards.

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

    A document larger than the budget still gets its own slot (the
    cumulative scheme never splits documents — chunk upstream first).

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
