"""Curation-cascade demo — the full published data-curation recipe
(CCNet / Gopher / RefinedWeb shape) end-to-end on the documents fixture,
printing what each gate would remove and the final planning artifact:

1. RULES     — Gopher heuristic gates (tx12)
2. UNIGRAM   — rarity keep-the-middle LM gate (tx16)
3. BIGRAM    — pruned bigram LM with Stupid Backoff (tx20)
4. CLASSIFIER— trained LR margin, map-only scoring (tx19; st16 is the
               same gate at streaming ingest, proven batch-equal)
5. SPAN DEDUP— exact duplicate-span coverage (dd19; Lee et al. 2022)
6. PLAN      — the lang × quality × dup ablation CUBE (pp15) — the
               what-if matrix a 100 TB run is budgeted from

Run:  python examples/curation_cascade.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    import pyspark.sql.functions as F

    from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
    from apache_iceberg_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("curation-cascade", cpus=8)
    q = lambda name: REGISTRY[name].spark(spark, sf_dir)  # noqa: E731
    out: dict = {}

    print("== 1. heuristic rules (tx12 Gopher gates) ==")
    rules = q("tx12_gopher_rules")
    n_docs = rules.count()
    n_rule_keep = rules.filter("keep").count()
    print(f"  {n_rule_keep}/{n_docs} pass the rule cascade")
    out["rule_keep"] = n_rule_keep

    print("== 2. unigram LM gate (tx16 rarity bands) ==")
    bands = {
        r["band"]: r["n"]
        for r in q("tx16_rarity_filter")
        .groupBy("band")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    print(f"  bands: {bands} (keep-the-middle -> {bands.get('mid', 0)})")
    out["unigram_mid"] = bands.get("mid", 0)

    print("== 3. bigram LM gate (tx20, pruned + Stupid Backoff) ==")
    tx20 = q("tx20_bigram_surprisal")
    bo = tx20.agg(
        F.sum("n_backoff").alias("b"), F.sum("n_bigrams").alias("n")
    ).collect()[0]
    b2 = {
        r["band"]: r["n"]
        for r in tx20.groupBy("band").agg(F.count("*").alias("n")).collect()
    }
    print(
        f"  bands: {b2}; {bo['b']}/{bo['n']} bigrams scored via backoff "
        "(pruned-table misses)"
    )
    out["bigram_mid"] = b2.get("mid", 0)

    print("== 4. model-based filter (tx19 LR margin, pinned coefficients) ==")
    clf = q("tx19_quality_classifier")
    n_clf_keep = clf.filter("pred_keep").count()
    print(f"  {n_clf_keep}/{n_docs} pass the classifier (margin > 0)")
    out["clf_keep"] = n_clf_keep

    print("== 5. duplicate-span coverage (dd19, 8-token spans) ==")
    dd = q("dd19_dup_span_fraction")
    dup_heavy = dd.filter(~F.col("keep")).count()
    worst = dd.orderBy(F.desc("dup_frac"), "doc_id").first()
    print(
        f"  {dup_heavy} docs over the 50% duplicated-span ceiling; worst: "
        f"doc {worst['doc_id']} at {worst['dup_frac']:.0%}"
    )
    out["dup_heavy"] = dup_heavy

    print("== 6. the plan (pp15 ablation CUBE) ==")
    grid = q("pp15_curation_ablation_grid").collect()
    cells = {(r["lang"], r["keep_quality"], r["is_dup"]): r for r in grid}
    total = cells[("ALL", "ALL", "ALL")]
    kept = cells.get(("ALL", "true", "false"))
    print(f"  corpus: {total['n_docs']} docs / {total['n_tokens']} tokens")
    if kept:
        print(
            f"  quality-pass non-dup slice: {kept['n_docs']} docs, "
            f"{kept['pct_tokens_micro'] / 10000:.1f}% of tokens"
        )
        out["kept_pct_micro"] = kept["pct_tokens_micro"]
    out["total_tokens"] = total["n_tokens"]
    return out


if __name__ == "__main__":
    main(*sys.argv[1:2])
