#!/usr/bin/env python
"""Empirical scale probe: do the heavy operators scale linearly?

Builds a deterministic 10x replica of sf0.1 under /tmp/graal_scale10
(keys shifted per replica so group/join cardinality scales; document
texts vowel-rotated and embedding dimensions rolled per replica so
similarity structure scales instead of exploding quadratically across
identical clones), then times the scale-sensitive operators at 1x and
10x and prints the observed scaling factor per operator.

A factor near 10 (or below, where fixed overhead dominates at 1x)
means the plan scales linearly; a factor far above 10 flags a
quadratic term that 100 TB would amplify. Results are recorded in
BASELINE.md.

Usage: python scripts/scale_probe.py [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graal_cdc_spark.queries import all_specs
from graal_cdc_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/graal_scale10"

PROBES = [
    "c06_latest_by_key_compaction",
    "c08_scd2_history",
    "r02_hash_aggregate_q1",
    "r03_join_agg_topk",
    "r12_ranking_window",
    "l06_minhash_lsh_candidates",
    "l08_embedding_neardup_pairs",
    "l19_int8_quantization",
    "l20_text_normalize",
    "l21_token_budget_packing",
    "st1_tumbling_window",
    "st4_stream_stream_join",
    # round 9 (new members: real JPEG census, BPE rule application)
    "mm13_jpeg_roundtrip_census",
    "l91_bpe_apply_fertility",
    # round 10 (color JPEG census; star-capped LSH component edges)
    "mm14_jpeg_color_roundtrip_census",
    "l23_lsh_components",
    # round 12 second session (quantile sketch; bucketed join reuses
    # its build via the session memo, so the probe times the JOIN)
    "l93_quantile_sketch_audit",
    "r99_bucketed_colocated_join",
    # round 3
    "r35_stat_aggregates",
    "r46_binned_interval_join",
    "l27_greedy_packing",
    "l28_repetition_quality",
    "l31_kmeans_quantized",
    "l33_ann_ivf_trained",
    # round 3, second batch (join-heavy text ops)
    "l35_rare_word_ratio",
    "l37_levenshtein_neardup",
    "c11_incremental_aggregate",
    # round 4 (heaviest of the new set: gram explodes, big-big joins,
    # sweep-line windows, reconciliation outer join)
    "r55_gaps_and_islands",
    "r56_max_concurrent_intervals",
    "r61_salted_skew_aggregate",
    "c12_snapshot_reconciliation",
    "l42_char_bigram_entropy",
    "l43_boilerplate_shingles",
    "l45_unigram_surprisal",
    "l47_ngram_novelty",
    "st8_chained_window_rollup",
    "st9_stateful_topk",
    # round 5 (gram joins, bigram LM, first-appearance reduction,
    # CDC row-image diff, chained windowed distinct)
    "c14_changed_columns_audit",
    "l52_eval_overlap_rate",
    "l53_bigram_surprisal",
    "l56_heaps_vocab_growth",
    "l58_dedup_survivorship",
    "st11_windowed_distinct_users",
    "r64_weighted_median",
    # round 5, second batch (banded gap windows, per-user lead window,
    # big-big anti join, token drift/burstiness aggregates, funnel
    # distincts, two-pass embedding audit, stateful-twin windows)
    "c17_seq_gap_audit",
    "r74_time_weighted_average",
    "r75_fk_orphan_audit",
    "r76_percentile_disc",
    "l59_token_distribution_drift",
    "l60_token_burstiness",
    "l61_dedup_funnel",
    "l62_embedding_norm_outliers",
    "st12_stream_anti_join_admission",
    "st13_quota_admission",
    # round 5, batch 3-5 (provenance join, pipeline census, PMI
    # collocations, dup-gram coverage, iterative pagerank, sessions,
    # op-transition lag, full-outer interval join, inline arrays)
    "l63_cross_source_dup_matrix",
    "l64_pipeline_census",
    "l65_pmi_collocations",
    "l66_dup_ngram_coverage",
    "r77_percent_of_total",
    "r78_inline_struct_array",
    "r79_pagerank_quantized",
    "r80_session_conversion",
    "c18_op_transition_audit",
    "st14_stream_stream_full_outer",
    # round 5, batch 3 (two-pass binned medians, interval islands,
    # remainder allocation windows, winnowing gram window, vocab
    # self-join, before-image lag)
    "c19_before_image_drift",
    "r81_mad_outliers",
    "r83_interval_union_length",
    "r84_largest_remainder_allocation",
    "l68_winnowing_fingerprints",
    "l69_source_vocab_jaccard",
    # round 5, batch 4 (distinct rollup, range-frame attribution,
    # generalized binned quantiles, vocab char pairs, map-side
    # covariance products, session coverage)
    "r86_distinct_rollup",
    "r87_first_touch_attribution",
    "r88_equi_depth_quantiles",
    "l70_bpe_pair_frequencies",
    "l71_dim_covariance_pairs",
    "st15_session_coverage",
    # round 5, batch 6 (self-join pair graph + triangle joins, pandas
    # ledger scan, two-pass winsorize, per-doc feature scoring)
    "r92_triangle_census",
    "r93_capped_running_balance",
    "r94_winsorized_mean",
    "l76_quality_model_bands",
    # round 5, batch 7 (path windows, envelope-size quantiles,
    # composite-key quantiles, modality shard window, streaming
    # histogram twin)
    "r95_top_event_paths",
    "c22_envelope_size_census",
    "r96_daily_percentile_bands",
    "mm06_shard_packing",
    "st16_windowed_value_histogram",
    # round 7 (ES delivery census via counting transport, version-tag
    # broadcast join, tree top-k, two-level prefix-sum layout audit,
    # per-source cap window)
    "c24_es_delivery_census",
    "c25_schema_version_event_census",
    "r97_tree_topk",
    "r98_sorted_layout_audit",
    "l79_source_quota_cap",
    "c26_jdbc_delivery_census",
    # round 7b (pruned-postings retrieval, hashed-feature LMs,
    # recall-join audit, broadcast Bloom probe, decoded-image
    # histograms)
    "l84_bm25_topk",
    "l85_dsir_importance",
    "l86_ann_recall_audit",
    "l87_bloom_dedup_probe",
    "mm10_bmp_channel_histogram",
    # round 8 (iterative BPE over the capped vocab table, compressed
    # codec round-trip + resize, persisted-index recall join)
    "l88_bpe_merge_training",
    "mm11_png_roundtrip_census",
    "mm12_png_resize_census",
    "l89_ivfpq_recall_audit",
    "c27_log_compaction_census",
    "l90_heavy_hitters_sketch",
    "st18_streaming_heavy_hitters",
    "c30_dead_letter_census",
    # round 13 (reworked containment probe; KMV sketch windows;
    # N-way Morton + Hilbert chain censuses)
    "l94_containment_census",
    "l95_containment_probe",
    "l96_kmv_distinct_audit",
    "r100_zorder_nd_layout",
    "r101_hilbert_layout",
    "l97_semantic_decontamination",
    "mm17_wav_feature_census",
    "mm18_gif_roundtrip_census",
    "st23_streaming_kmv_distinct",
]
# NOT probed via the registry: l75_semdedup_census pins k for its
# oracle, and SemDeDup's pair join is quadratic in CLUSTER SIZE by
# construction — at fixed k a 10x corpus measures 100x pair work
# (observed: 9.8 s -> 194 s at k=8). The operator's scale contract is
# k ~ n / target_cluster_size, so probe_semdedup_pairs() times the
# pair phase at PROPORTIONAL k instead (constant expected cluster
# size — the deployment shape).
# NOT probed: l17_tfidf_top_terms (its doc_id<100 corpus filter prunes
# every replica but the first, so a replica probe measures nothing)

VOWELS = "aeiou"


def build(spark, replicas: int) -> None:
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)

    def replicate(name, id_shifts, text_col=None, vec_col=None):
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for k in range(replicas):
            df = base
            for col, span in id_shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(k * span))
            if text_col is not None and k:
                # rotate vowels per replica: texts stay word-shaped but
                # become textually distinct across replicas
                rot = VOWELS[k % 5 :] + VOWELS[: k % 5]
                df = df.withColumn(text_col, F.translate(F.col(text_col), VOWELS, rot))
            if vec_col is not None and k:
                # roll dimensions: preserves norms and within-replica
                # similarity exactly, decorrelates across replicas
                r = k % 64
                df = df.withColumn(
                    vec_col,
                    F.concat(
                        F.slice(F.col(vec_col), r + 1, 64 - r),
                        F.slice(F.col(vec_col), 1, r),
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")

    replicate("events", {"event_id": 100_000_000, "user_id": 1_000_000})
    replicate("lineitem", {"l_orderkey": 100_000_000})
    replicate("orders", {"o_orderkey": 100_000_000, "o_custkey": 10_000_000})
    replicate("customer", {"c_custkey": 10_000_000})
    replicate("documents", {"doc_id": 10_000_000}, text_col="text")
    replicate("embeddings", {"vec_id": 10_000_000}, vec_col="embedding")
    for name in ("region", "nation", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )


def time_spec(spark, name, sf_dir) -> float:
    t0 = time.time()
    all_specs()[name].spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.time() - t0


def probe_semdedup_pairs(spark, replicas: int) -> None:
    """Time the SemDeDup pair phase with k grown in proportion to the
    corpus (constant expected cluster size): hash-assign cids so the
    measurement isolates the quadratic-within-cluster join from the
    k-means training cost. Linear factor here = the operator scales
    whenever the caller honors the k ~ n contract."""
    from pyspark.sql import functions as F

    from graal_cdc_spark.operators.clustering import quantize_points
    from graal_cdc_spark.operators.similarity import (
        within_cluster_pair_census,
    )

    def run(sf_dir: str, k: int) -> float:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pts = quantize_points(emb)
        assigned = pts.withColumn("cid", F.pmod(F.col("pid"), F.lit(k)))
        t0 = time.time()
        within_cluster_pair_census(assigned).write.mode(
            "overwrite"
        ).format("noop").save()
        return time.time() - t0

    t1 = run(SRC, 8)
    t10 = run(DST, 8 * replicas)
    print(
        f"{'l75 pair phase (k ~ n)':40s} {t1:8.2f} {t10:8.2f} "
        f"{t10 / t1:7.1f}"
    )


def main() -> None:
    # usage: scale_probe.py [replicas] [--only n1,n2,...]
    argv = sys.argv[1:]
    only = None
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        elif a == "--only":
            i += 1
            only = set(argv[i].split(",")) if i < len(argv) else set()
        else:
            args.append(a)
        i += 1
    replicas = int(args[0]) if args else 10
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"building {replicas}x replica at {DST} ...", file=sys.stderr)
    build(spark, replicas)

    # warmup both paths
    time_spec(spark, "r14_global_topk", SRC)
    time_spec(spark, "l08_embedding_neardup_pairs", SRC)
    # Materialize the envelope fixture for BOTH dirs before timing:
    # it is a session-persisted fixture (cdc/envelope.py), and whichever
    # C-suite probe runs first would otherwise absorb its one-time
    # synthesis (observed: c06@10x read 68.7 s, of which ~62 s was
    # fixture build — c11 right after measured 0.5 s on the warm cache).
    from graal_cdc_spark.cdc.envelope import parsed_envelope

    for d in (SRC, DST):
        parsed_envelope(spark, d).write.mode("overwrite").format("noop").save()

    print(f"{'operator':40s} {'1x':>8s} {'10x':>8s} {'factor':>7s}")
    for name in PROBES:
        if only is not None and name not in only:
            continue
        t1 = time_spec(spark, name, SRC)
        t10 = time_spec(spark, name, DST)
        print(f"{name:40s} {t1:8.2f} {t10:8.2f} {t10 / t1:7.1f}")
    if only is None or "l75_pair_phase" in only:
        probe_semdedup_pairs(spark, replicas)
    spark.stop()


if __name__ == "__main__":
    main()
