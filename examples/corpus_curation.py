"""End-to-end LLM training-data curation: the full pre-training data
pipeline composed from the engine's operator families, run over the
synthetic `documents` table and written as a partitioned lake table.

Stages (each is an oracle-gated operator family in the registry):

1. exact dedup — keep the lowest doc_id per identical normalized text
   (l01/l39 family);
2. near-dup removal — MinHash-LSH candidate pairs -> connected
   components -> keep each component's minimum id (the l06/l22 scale
   path: no all-pairs join anywhere);
3. quality gate — the fixed-weight linear scorer (l76): drop the
   bottom bands;
4. decontamination — anti-join against the held-out eval set on the
   normalized-text fingerprint (l25 family);
5. packing — first-fit token-budget shards per source (l27);
6. split — deterministic content-hash train/val/test (l49);
7. lake write — dynamic-partition overwrite by (split), idempotent
   rerun (sinks/lake.py).

Run: python examples/corpus_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graal_cdc_spark.operators import text as TX
from graal_cdc_spark.operators.dedup import (
    connected_components,
    minhash_lsh_candidates,
)
from graal_cdc_spark.operators.packing import pack_by_token_budget_greedy
from graal_cdc_spark.session import get_spark
from graal_cdc_spark.sinks.lake import write_partitioned
from graal_cdc_spark.sources.tables import load_table

BASE = "/tmp/graal_example_curation"


def curate(spark, sf_dir: str, out_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    norm = TX.normalize_text(F.col("text"))
    docs = docs.withColumn("fp", F.xxhash64(norm))

    # 1. exact dedup: lowest id per normalized fingerprint (one hash
    # shuffle on fp — the only correct exact-dedup shape at scale)
    keep_exact = docs.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    stage1 = docs.join(keep_exact, ["fp", "doc_id"])

    # 2. near-dup: LSH candidates -> components -> keep component min.
    # Candidates come from banded equality joins (never all-pairs);
    # components collapse transitive duplicate chains.
    cand = minhash_lsh_candidates(stage1, "doc_id", "text", n=5)
    comp = connected_components(cand)
    drop_near = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    stage2 = stage1.join(drop_near, "doc_id", "left_anti")

    # 3. quality gate: linear scorer bands (l76); keep band >= 1
    words = TX.token_count(F.col("text"))
    uniq_milli = F.expr(
        "1000 * size(array_distinct(split(text, ' '))) div "
        "size(split(text, ' '))"
    )
    stop_milli = F.floor(TX.stopword_count(F.col("text")) * 1000 / words)
    awl_milli = F.floor(
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) * 1000 / words
    )
    stage3 = (
        stage2.withColumn("uniq_milli", uniq_milli)
        .withColumn("stop_milli", stop_milli)
        .withColumn("awl_milli", awl_milli)
        .withColumn(
            "band",
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(5),
                    F.expr(
                        "(300 + uniq_milli - 2 * stop_milli "
                        "+ (awl_milli div 10)) div 200"
                    ),
                ),
            ),
        )
        .filter(F.col("band") >= 1)
        .drop("uniq_milli", "stop_milli", "awl_milli")
    )

    # 4. decontamination: the "eval set" here is the 10 lowest doc_ids
    # of the RAW corpus; anything sharing their normalized fingerprint
    # is removed from training data (broadcast anti-join — the eval
    # set is tiny by definition)
    eval_fps = docs.orderBy("doc_id").limit(10).select("fp").distinct()
    stage4 = stage3.join(F.broadcast(eval_fps), "fp", "left_anti")

    # 5. packing: first-fit shards per source under a token budget
    packed = pack_by_token_budget_greedy(
        stage4, "source", "doc_id", budget=2048
    )

    # 6. deterministic split on the content fingerprint (stable under
    # reruns and cluster layout, like l49)
    bucket = F.pmod(F.xxhash64(F.col("fp").cast("string")), F.lit(100))
    final = packed.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise(
            "test"
        ),
    )

    # 7. idempotent lake write, partitioned by split
    write_partitioned(
        final.select(
            "doc_id", "source", "lang", "n_tok", "shard", "band", "split"
        ),
        out_dir,
        ["split"],
    )

    census = {
        r["split"]: (r["n_docs"], r["n_tok"])
        for r in spark.read.parquet(out_dir)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tok"),
        )
        .collect()
    }
    return {
        "input": docs.count(),
        "after_exact": stage1.count(),
        "after_neardup": stage2.count(),
        "after_quality": stage3.count(),
        "after_decontam": stage4.count(),
        "splits": census,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark(app_name="corpus-curation-example")
    spark.sparkContext.setLogLevel("ERROR")
    stats = curate(spark, sf_dir, os.path.join(BASE, "lake"))
    print("curation census:", stats)
    spark.stop()


if __name__ == "__main__":
    main()
