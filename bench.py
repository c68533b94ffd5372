"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.

Stdout contract (the driver captures a ~2 KB tail and parses the LAST
line): the FINAL stdout line is the compact contract object
``{"metric","value","unit","queries","canary_total","sf"}`` and nothing
else — round 5
appended per-table fixture fingerprints to it, the line outgrew the tail
capture, and the driver recorded ``parsed: null`` (VERDICT r5 #1). The
fingerprints now ride (a) stderr in full per-table detail and (b) one
short COMBINED-digest stdout line printed just before the final line, so
the tail still proves the fixture identity without bloating the contract
line. A streaming micro-bench line (st4/st7/st12, VERDICT r5 ask #6)
precedes those. ``tests/test_bench_contract.py`` pins the final line
under the tail budget.

Each query is timed end-to-end (plan + execute + collect-to-count). A
warm-up pass on sf0.001 triggers JVM/codegen warm-up so the numbers reflect
steady-state execution, not first-query JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume_customers",
    "q21_waiting_supplier",
    "o3_topk",
    "j1_inner_join",
    "w1_rank_orders",
    "ts1_tumbling_agg",
    "ts3_asof_join",
    "ts4_gapfill_resample",
    "m2_salted_join_skew",
    "dd1_exact_dedup",
    "dd2_minhash_lsh",
    "dd3_simhash",
    "dd6_dup_clusters",
    "tx2_quality_score",
    "tx8_term_novelty",
    "dd7_url_dedup",
    "ann1_cosine_topk",
    "ann2_lsh_bucketed",
    "ann3_ivf",
    # round-4 operators: the flagship funnel successors and the new
    # dedup/privacy surface stay perf-accountable alongside the originals
    "dc1_decontamination",
    "pp3_curation_decontaminated",
    "pp4_cascade_fuzzy",
    "pp2b_packed_doc_spans",
    "mm6_image_neardup_clusters",
    "tx11_pii_redaction",
    "dd9_embedding_dup_clusters",
    "dd10_line_dedup",
    "pp5_domain_mixture",
    "pp6_production_funnel",
    "tx12_gopher_rules",
    "ts6_time_weighted_avg",
    "j7_interval_overlap_join",
    "ann6_pq_adc",
    "ann7_kmeans_train",
    "pp8_corpus_shuffle",
    "g1_pagerank",
    "g2_triangle_count",
    "a20_cohort_retention",
    "m18_bitmap_distinct",
    "dd12_containment_dedup",
    "dd13_soft_dedup_weights",
    "tx14_tfidf_keywords",
    "ann9_ivf_pq",
    # round-5 operators
    "dd14_fuzzy_dup_clusters",
    # round-6 operators
    # round-7 operators (the scale-path EWMA and the new graph join;
    # tx16/pp13/ann15 are timed on stderr and tracked in README — the
    # contract line is at its tail-budget ceiling)
]

# Streaming operators timed on their own stdout line (not in the contract
# line's `queries` dict — the final line must stay under the driver's ~2 KB
# tail capture; see module docstring).
STREAMING = [
    "st4_stream_static_join",
    "st7_stream_upsert",
    "st12_stream_incremental_dedup",
    "st13_stream_index_update",
    "st14_stream_ewma",
    "st16_stream_quality_gate",
    "st17_stream_seasonal_scoring",
    "st18_stream_m4_downsample",
    "st19_stream_branch_ingest",
    "st20_stream_atomic_publish",
    "st21_stream_seasonal_profile",
    "st22_stream_changepoint",
    "st23_stream_benford",
    "st24_stream_rank_correlation",
    "st25_stream_periodogram",
    "st26_stream_bootstrap_ci",
    "st27_stream_median_ci",
    "st28_stream_neardup_gate",
    "st29_stream_page_hinkley",
    "st30_stream_cdc_upsert",
    "st31_stream_mutual_information",
    "st32_stream_jsd_drift",
    "st33_stream_countmin",
    "st34_stream_bloom_build",
    "st35_stream_hyperloglog",
    "st36_stream_hash_sample",
    "st37_stream_guarded_cdc",
    "st38_stream_schema_evolution",
]

# Round-7 batch operators that did NOT fit the contract line's tail
# budget: timed like HEADLINE but reported on stderr only (and tracked
# round-over-round in README's bench table).
AUX = [
    # round 15: moved from HEADLINE to make contract-line room for
    # stream_top5 (VERDICT r14 ask #3) — still benched here with
    # aux-total accountability; README notes the composition change so
    # round-over-round totals are compared per-query.
    "dd15_incremental_dedup",
    "ann10_ivf_pq_rerank",
    "ann11_trained_ivf",
    "pp10_pretraining_job",
    "pp11_curriculum_order",
    "ts11_ewma_segmented",
    "g4_link_prediction",
    # round 14: moved from HEADLINE to make contract-line room for
    # aux_top5 (VERDICT r13 ask #4) — each family keeps headline
    # representatives; README's r14 re-baseline notes the composition
    # change so round-over-round totals are compared per-query.
    "ts7_max_concurrent_intervals",
    "ann13_clustered_recall_curve",
    "mm8_video_neardup_pairs",
    "pp7_contamination_report",
    "dd11_duplication_profile",
    "dd16_simhash_neardup",
    "tx16_rarity_filter",
    "pp13_temperature_mixture",
    "ann15_index_lifecycle",
    "mm9_audio_frame_features",
    "ann16_residual_pq",
    "m23_metadata_only_aggregates",
    "m24_positional_delete_scan",
    "ts12_holt_trend",
    "ts13_cusum_changepoint",
    "tx17_bpe_encode",
    "g5_khop_distance",
    "a21_correlation",
    "a22_countmin_heavy_hitters",
    "a23_countmin_width_curve",
    "pp14_corpus_drift_report",
    "w10_gap_islands",
    "m25_partition_delete_scan",
    # round 8
    "tx19_quality_classifier",
    "dd19_dup_span_fraction",
    "ann18_mmr_diverse_topk",
    "g6_katz_centrality",
    "ts14_seasonal_anomalies",
    "w11_rolling_median",
    "m26_clustering_depth_report",
    "pp15_curation_ablation_grid",
    "tx20_bigram_surprisal",
    "a24_gini_diversity",
    "f14_bitmask_rollup",
    "a25_ks_drift",
    "ts15_interval_coverage",
    "m27_changelog_scan",
    "dd20_canonical_by_quality",
    "pp16_mixture_rebalance_plan",
    # round 8, second session
    "ts16_m4_downsample",
    "w12_weighted_median",
    "dc2_fuzzy_decontamination",
    "ann19_radius_search",
    "m28_compaction_plan",
    "tx21_domain_blocklist",
    "g7_lpa_communities",
    "tx22_langid_confusion",
    "a26_benford_profile",
    # round 9
    "m29_branch_tag_scan",
    "m30_branch_wap",
    "ts17_lttb_downsample",
    "g8_harmonic_centrality",
    "a27_range_partition_bounds",
    "mm10_vlm_sequence_packing",
    "ann21_pq_index_persist",
    "f15_lambda_funcs",
    "s18_dynamic_partition_overwrite",
    "dd21_cdc_chunk_dedup",
    "pp17_importance_resampling",
    "w13_running_distinct",
    "ts18_sax_symbols",
    "m31_ref_diff",
    "m32_transplant_scan",
    "a28_higher_moments",
    # round 10
    "m33_ref_aware_expiry",
    "m34_multi_table_commit",
    "m35_divergent_merge",
    "m36_workspace_branch_wap",
    "ts19_autocorrelation",
    "ts20_cross_correlation",
    "a29_chi_square_independence",
    "a30_cramers_v",
    "g9_neighborhood_jaccard",
    "a31_tv_distance",
    "ts21_pacf",
    "ts22_theil_sen_trend",
    "g10_degree_assortativity",
    "m37_workspace_expiry",
    "w14_rolling_regression",
    "a33_anova_f",
    "j8_nearest_asof_join",
    "tx23_readability",
    "ann22_binary_quantization",
    "w15_median_abs_deviation",
    "pp18_packing_efficiency",
    # round 11
    "m38_workspace_diff",
    "m39_workspace_transplant",
    "m40_commit_retry_reuse",
    "m41_truncating_retention",
    "m42_workspace_rollback",
    "m43_evolved_append_scan",
    "a34_kruskal_wallis",
    "a35_brown_forsythe",
    "a36_mann_whitney",
    "w16_winsorized_mean",
    "ts23_seasonal_strength",
    "ts24_stl_decompose",
    "j9_tolerance_asof_join",
    "tx24_zipf_fit",
    "pp19_mixture_weights",
    "pp20_shard_planner",
    "mm11_aspect_bucket_report",
    "g11_local_clustering",
    "f16_try_functions",
    # round 12
    "m44_at_ref_sugar",
    "m45_autocompaction_scan",
    "m46_workspace_at_ref",
    "m47_snapshots_history_table",
    "w17_trimmed_mean",
    "w19_mode",
    "ts25_cusum_changepoint",
    "a39_gini_concentration",
    "dd22_dup_cluster_histogram",
    "tx25_charset_profile",
    "j10_linear_interp_join",
    "mm12_letterbox_pad_report",
    "g12_adamic_adar",
    "s21_jsonl_export_single",
    "ts27_forecast_backtest",
    # round 12, second session
    "a40_spearman_rho",
    "a41_kendall_tau_b",
    "tx26_token_entropy",
    "ts26_ljung_box",
    "a42_welch_t",
    "ts28_periodogram",
    "ts29_kaplan_meier",
    "ts30_logrank",
    "a43_poisson_bootstrap_ci",
    "g13_hits",
    "pp21_weighted_sample",
    "a44_median_ci",
    "ann23_matryoshka_truncation",
    "f17_sql_udf",
    "f18_sql_table_udf",
    # round 13
    "m48_sql_at_ref",
    "m49_merge_upsert",
    "a45_mutual_information",
    "a46_cohens_kappa",
    "a47_js_divergence",
    "ts31_page_hinkley",
    "ts32_mann_kendall",
    "w18_rolling_extrema_channel",
    "g14_kcore_peeling",
    "tx27_heaps_law_fit",
    "pp22_budget_waterfill",
    "dd23_minhash_estimate_calibration",
    "m50_stats_pruned_scan",
    "a48_odds_ratio",
    "a49_bootstrap_diff_ci",
    "mm13_vision_token_budget",
    "dd24_dup_inflation_factor",
    "f19_variant_shred",
    "m51_time_travel_asof",
    # round 14
    "m52_merge_on_read_upsert",
    "m53_rename_and_views",
    "m54_mor_changelog",
    "a50_cliffs_delta",
    "a51_g_test",
    "ts33_windowed_entropy",
    "pp24_epoch_schedule",
    "dd25_bloom_filter_gate",
    "g15_rich_club",
    "a52_hyperloglog_distinct",
    "m55_mor_stats_pruned_scan",
    "ann24_recall_budget_curve",
    "tx28_heldout_perplexity",
    "mm14_frame_sampling_schedule",
    "g16_weighted_pagerank",
    "j11_band_join",
    # round 15
    "m56_mor_delete_pruned_scan",
    "m57_merge_update_set",
    "m58_view_at_ref",
    "m59_mor_compaction_policy",
    "a53_kendall_tau",
    "ts34_mann_kendall",
    "g17_kcore",
    "tx29_zipf_hapax",
    "m60_partitioned_mor_scan",
    "m61_conditional_merge",
    "dd26_normalization_cascade",
    "a55_two_proportion_z",
    "s22_codec_roundtrip",
    "m62_mor_dels_inventory",
    "m63_merge_schema_evolution",
]

# Canary subset (VERDICT r8 ask #3): 20 queries whose TIMING PROTOCOL is
# FROZEN so round-over-round deltas are attributable to code, not to the
# ever-growing warm-up set (g1/pp4 wobbled ±60% in r8 on byte-identical
# code because 16 new AUX operators' warm-ups preceded them). Protocol,
# pinned forever: runs LAST, after `spark.catalog.clearCache()` +
# `release_plan_caches()` + an explicit JVM GC — so the preceding
# block-manager state is "empty" no matter how much the bench grew —
# then each canary query warms once at sf0.001 and times min-of-3 at
# sf_dir. The SET and the PROTOCOL both never change; add new queries to
# HEADLINE/AUX instead. Per-query values ride a dedicated stdout line and
# stderr; the contract line carries `canary_total`.
CANARY = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q6_forecast_revenue",
    "q9_product_profit",
    "o3_topk",
    "j1_inner_join",
    "w1_rank_orders",
    "ts1_tumbling_agg",
    "ts3_asof_join",
    "m2_salted_join_skew",
    "dd1_exact_dedup",
    "dd2_minhash_lsh",
    "dd6_dup_clusters",
    "tx2_quality_score",
    "ann1_cosine_topk",
    "ann3_ivf",
    "dc1_decontamination",
    "pp4_cascade_fuzzy",
    "pp6_production_funnel",
    "g1_pagerank",
]

# Max chars for the final stdout contract line: driver tail capture (2000)
# minus a small headroom for the tail of the line printed just before it.
# The 2000-char cap is the HARD requirement (the driver parses the LAST
# line; outgrow it and `parsed` is null, the round-5 regression); the
# preceding digest/streaming lines are best-effort — BENCH_r11's capture
# already cut into the streaming line, which also lives on stderr — so
# round 12 traded 80 chars of that headroom for the host self-label ON
# the contract line (VERDICT r11 ask #2) and round 13 trades ~50 more
# for aux_total/stream_total (VERDICT r12 ask #2).
CONTRACT_LINE_BUDGET = 1900


def cached_storage_bytes(spark) -> int:
    """Total bytes of RDD blocks resident in the block manager — the
    cache-occupancy evidence (VERDICT r8 ask #3) recorded before each
    timed phase so a wobbling number can be checked against what was
    actually resident when it ran."""
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return int(sum(i.memSize() + i.diskSize() for i in infos))
    except Exception:
        return -1


def fixture_fingerprints(sf_dir: str) -> dict[str, dict]:
    """Per-table row count + content hash of the bench fixture, emitted
    with every run so round-over-round deltas are attributable to CODE,
    not silently regenerated testdata (the round-4 regeneration made r3
    per-query numbers an imperfect yardstick — VERDICT r4 ask #7). Row
    counts come from parquet footers (no data read); the hash is md5 of
    the file bytes."""
    import glob
    import hashlib

    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        h = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        out[name] = {
            "rows": pq.ParquetFile(path).metadata.num_rows,
            "md5": h.hexdigest(),
        }
    return out


def host_conditions() -> dict:
    """Host-state fields emitted with every run (VERDICT r10 ask #6):
    the committed BENCH_r10.json looked like an 11% regression but was
    host contention — a run must carry enough context to tell a noisy
    host from a code regression without a judge rerun. ``load1`` is the
    1-minute load average BEFORE Spark starts (anything near/over the
    CPU count means a polluted run); ``fixture_page_cached`` estimates
    whether the sf parquet bytes are OS-page-cache-resident by timing a
    full re-read of the largest fixture file (cold NVMe reads are an
    order of magnitude slower than cache hits)."""
    import glob
    import time as _t

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict = {"cpus_visible": os.cpu_count()}
    try:
        out["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        out["load1"] = None
    files = sorted(
        glob.glob(os.path.join(sf_dir, "*.parquet")),
        key=os.path.getsize,
    )
    if files:
        big = files[-1]
        size = os.path.getsize(big)
        t0 = _t.time()
        with open(big, "rb") as f:
            while f.read(1 << 22):
                pass
        dt = max(_t.time() - t0, 1e-9)
        gbps = size / dt / (1 << 30)
        out["fixture_read_gbps"] = round(gbps, 2)
        # page-cache reads run at memory bandwidth (>2 GB/s); cold
        # device reads land well under it on this class of host
        out["fixture_page_cached"] = gbps > 2.0
    return out


def pretouch_fixtures(sf_dir: str) -> None:
    """Read every fixture file's bytes once BEFORE the timed phases
    (VERDICT r12 ask #5): cold-page-cache runs were the bench's ±6 s
    noise band (committed r12 vs the judge's rerun differed ~8 s purely
    on `fixture_page_cached_start`). Warming the OS page cache up front
    makes every committed artifact warm-band comparable — the same
    principle as the existing sf0.001 JVM/codegen warm-up, applied to
    the I/O side."""
    import glob

    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        with open(path, "rb") as f:
            while f.read(1 << 22):
                pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pretouch_fixtures(sf_dir)
    host_before = host_conditions()

    from apache_iceberg_spark.registry import all_queries
    from apache_iceberg_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    queries = all_queries()

    # Warm-up: run each headline query once at the smallest SF.
    for name in HEADLINE + AUX:
        try:
            queries[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
    # NOTE deliberately NOT releasing warm-up caches here: every prior
    # round's baseline was measured with the warm-up's sf0.001 caches
    # resident, so clearing them would change the protocol under the
    # round-over-round comparison (a clearCache A/B in round 7 measured
    # +8% across the board — block-manager state affects codegen/GC
    # timing more than the tiny caches themselves). The persist-lifecycle
    # convention still holds for operators' own invocations.

    print(
        f"# cached bytes before HEADLINE: {cached_storage_bytes(spark)}",
        file=sys.stderr,
    )
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):  # min-of-3: damp scheduler/GC noise
            t0 = time.time()
            n = queries[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        # 2 decimals on the contract line (round 7 grew HEADLINE to 62
        # queries; 3-decimal widths would overflow the tail budget);
        # full 3-decimal precision stays on the stderr line below.
        timings[name] = round(best, 2)
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    # AUX operators: same timing protocol, stderr-only reporting. Plan
    # caches are released BETWEEN AUX operators (ADVICE r7: without this,
    # each of the 79 timed operators' plan-cache frames accumulates and
    # later AUX timings run under growing block-manager/eviction pressure).
    # HEADLINE keeps the original never-release protocol for round-over-
    # round comparability; AUX r8+ numbers are under the release protocol
    # (named in README — any r7→r8 AUX delta has this as a candidate
    # cause).
    from apache_iceberg_spark.session import release_plan_caches

    aux_timings: dict[str, float] = {}
    for name in AUX:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            n = queries[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        release_plan_caches(spark)
        aux_timings[name] = round(best, 3)
        print(f"# aux {name}: {best:.3f}s ({n} rows)", file=sys.stderr)
    # AUX accountability on the contract line (VERDICT r12 ask #2): the
    # per-query AUX detail lives on stderr, which the driver's ~2 KB tail
    # never carries — the TOTAL rides the final line so a regression in
    # the AUX family is driver-visible the way canary_total made headline
    # drift visible.
    aux_total = round(sum(aux_timings.values()), 3)
    # aux_top5 (round 14, VERDICT r13 ask #4): the five largest AUX
    # entries ride the contract line so the driver can ATTRIBUTE an
    # aux_total regression without the stderr detail the ~2 KB tail
    # truncates — which aux entry moved, not just that the family did.
    aux_top5 = {
        k: round(v, 1)
        for k, v in sorted(aux_timings.items(), key=lambda kv: -kv[1])[:5]
    }

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # Fixture identity: full per-table detail on stderr; one short combined
    # digest on stdout (any regenerated table changes it) so the parseable
    # tail still pins the data side without breaking the contract line.
    fixtures = fixture_fingerprints(sf_dir)
    print("# fixtures " + json.dumps(fixtures, sort_keys=True), file=sys.stderr)
    import hashlib

    combined = hashlib.md5(
        json.dumps(fixtures, sort_keys=True).encode()
    ).hexdigest()

    # Streaming micro-bench (VERDICT r5 ask #6): st4/st7/st12 end-to-end
    # over their fixed micro-batches, min-of-2, on a separate stdout line.
    stream_timings: dict[str, float] = {}
    for name in STREAMING:
        try:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                queries[name](spark, sf_dir).count()
                best = min(best, time.time() - t0)
            stream_timings[name] = round(best, 3)
        except Exception as exc:  # never let streaming kill the contract line
            print(f"# streaming bench {name} failed: {exc}", file=sys.stderr)
    stream_total = round(sum(stream_timings.values()), 3)
    # stream_top5 (round 15, VERDICT r14 ask #3): stream_total had grown
    # dominated by one entry (st28 ≈ 22% of the family) — a regression
    # there was invisible until it moved the whole total. The five
    # largest streaming entries ride the contract line so the driver can
    # ATTRIBUTE a stream_total move from the artifact alone, exactly as
    # aux_top5 did for AUX.
    stream_top5 = {
        k: round(v, 1)
        for k, v in sorted(
            stream_timings.items(), key=lambda kv: -kv[1]
        )[:5]
    }

    # Canary phase, LAST to run (protocol frozen — see the CANARY comment
    # above): clearing everything first makes "what was resident" a
    # constant across rounds no matter how HEADLINE/AUX/STREAMING grow;
    # the recorded cached-bytes value proves it on every run.
    spark.catalog.clearCache()
    release_plan_caches(spark)
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    canary_cached = cached_storage_bytes(spark)
    print(f"# cached bytes before CANARY: {canary_cached}", file=sys.stderr)
    for name in CANARY:
        try:
            queries[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
    canary: dict[str, float] = {}
    for name in CANARY:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            n = queries[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        canary[name] = round(best, 2)
        print(f"# canary {name}: {best:.3f}s ({n} rows)", file=sys.stderr)
    canary_total = round(sum(canary.values()), 3)

    # Stdout emission order = tail priority, lowest first: if the driver's
    # ~2 KB capture truncates from the front, the host-condition line goes
    # first (also on stderr + README), then the canary detail, then the
    # fixture digest, the streaming line, and the contract line last.
    host_after = host_conditions()
    host_line = {
        "host": {
            "load1_start": host_before.get("load1"),
            "load1_end": host_after.get("load1"),
            "cpus_visible": host_before.get("cpus_visible"),
            "fixture_read_gbps_start": host_before.get("fixture_read_gbps"),
            "fixture_page_cached_start": host_before.get(
                "fixture_page_cached"
            ),
        }
    }
    print(json.dumps(host_line, separators=(",", ":")), flush=True)
    print(f"# host {json.dumps(host_line['host'])}", file=sys.stderr)
    print(
        json.dumps(
            {"canary": canary, "canary_cached_bytes": canary_cached},
            separators=(",", ":"),
        ),
        flush=True,
    )
    print(
        json.dumps(
            {
                "fixtures_combined_md5": combined,
                "tables": len(fixtures),
                "rows": sum(v["rows"] for v in fixtures.values()),
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    print(
        json.dumps({"streaming": stream_timings}, separators=(",", ":")),
        flush=True,
    )

    def contract_line(q: dict[str, float]) -> str:
        # Host condition ON the contract line (VERDICT r11 ask #2): the
        # driver's ~2 KB tail capture front-truncates, and the separate
        # host line above it was the first casualty — BENCH_r11.json
        # recorded a loaded-host 39.83 s with no self-label. The three
        # load fields cost ~70 chars and make every committed BENCH_rN
        # self-labeling; the full host dict stays on its own line +
        # stderr for untruncated readers.
        return json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": q,
                "canary_total": canary_total,
                "aux_total": aux_total,
                "aux_top5": aux_top5,
                "stream_total": stream_total,
                "stream_top5": stream_top5,
                "sf": sf_val,
                "host": {
                    "load1_start": host_before.get("load1"),
                    "load1_end": host_after.get("load1"),
                    "cpus_visible": host_before.get("cpus_visible"),
                },
            },
            separators=(",", ":"),
        )

    # Hard guard on the tail budget: if the contract line would outgrow the
    # driver's capture (minus the two short digest lines above), spill the
    # tail of HEADLINE onto a preceding "queries_overflow" stdout line. The
    # spilled entries stay visible in the tail and on stderr; the contract
    # line always parses.
    kept = dict(timings)
    overflow: dict[str, float] = {}
    while len(contract_line(kept)) > CONTRACT_LINE_BUDGET and kept:
        name, val = kept.popitem()  # pops in reverse HEADLINE order
        overflow[name] = val
    if overflow:
        print(
            json.dumps({"queries_overflow": overflow}, separators=(",", ":")),
            flush=True,
        )
    print(contract_line(kept), flush=True)


if __name__ == "__main__":
    main()
