"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

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
    "pp7_contamination_report",
    "j7_interval_overlap_join",
    "ts7_max_concurrent_intervals",
    "ann6_pq_adc",
    "ann7_kmeans_train",
    "pp8_corpus_shuffle",
    "g1_pagerank",
    "g2_triangle_count",
    "dd11_duplication_profile",
    "a20_cohort_retention",
    "m18_bitmap_distinct",
    "dd12_containment_dedup",
    "dd13_soft_dedup_weights",
    "tx14_tfidf_keywords",
    "ann9_ivf_pq",
    # round-5 operators
    "dd14_fuzzy_dup_clusters",
    "dd15_incremental_dedup",
    "ann10_ivf_pq_rerank",
    "ann11_trained_ivf",
    "pp10_pretraining_job",
    "pp11_curriculum_order",
    "mm8_video_neardup_pairs",
    "dd16_simhash_neardup",
]


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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from apache_iceberg_spark.registry import all_queries
    from apache_iceberg_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    queries = all_queries()

    # Warm-up: run each headline query once at the smallest SF.
    for name in HEADLINE:
        try:
            queries[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):  # min-of-3: damp scheduler/GC noise
            t0 = time.time()
            n = queries[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "fixtures": fixture_fingerprints(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
