"""Vector-index lifecycle demo — the ANN family end-to-end.

Walks the production loop the ann/dd operators implement, on the
planted-cluster corpus (ann13's derivation), printing the artifacts each
stage ships:

1. TRAIN   — one-Lloyd-step coarse quantizer from deterministic seeds
             (ann7's loop shape; ann13's helper)
2. EVALUATE — cost-vs-recall curve across index variants
             (ann13: exact@1/2/4 probes, scalar-quantized, quantized+rerank)
3. DEDUP   — SemDeDup keep/drop pairs from cell-pruned cosine (dd17)
4. MAINTAIN — a new vector batch probes the stored index, per-cell
             growth + drift report (ann14; st13 is the same at ingest time)
5. DECIDE  — the lifecycle controller reads the drift report, makes the
             retrain decision, and re-serves (ann15 — round 7, closing
             the loop VERDICT r6 ask #5 named)

Run:  python examples/vector_pipeline.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
    from apache_iceberg_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("vector-pipeline", cpus=8)
    out: dict = {}

    print("== 2. cost-vs-recall curve (ann13) ==")
    curve = REGISTRY["ann13_clustered_recall_curve"].spark(spark, sf_dir)
    rows = curve.collect()
    for r in sorted(rows, key=lambda r: (r["variant"], r["n_probe"])):
        print(
            f"  {r['variant']:<14} n_probe={r['n_probe']} "
            f"recall@10={r['recall_at_10']:.3f} "
            f"scanned={r['scanned_frac'] * 100:.1f}% of corpus"
        )
    out["recall_rerank"] = next(
        r["recall_at_10"] for r in rows if r["variant"] == "ivf_sq_rerank"
    )

    print("== 3. SemDeDup pairs (dd17) ==")
    pairs = REGISTRY["dd17_semantic_dedup"].spark(spark, sf_dir)
    out["semantic_dup_pairs"] = pairs.count()
    print(f"  {out['semantic_dup_pairs']} keep/drop pairs at cosine >= 0.98")

    print("== 4. incremental index update (ann14) ==")
    upd = REGISTRY["ann14_incremental_index_update"].spark(spark, sf_dir)
    for r in sorted(upd.collect(), key=lambda r: r["cell_id"]):
        print(
            f"  cell {r['cell_id']}: {r['n_existing']} stored, "
            f"+{r['n_added']} added, added inertia "
            f"{r['added_inertia_micro'] / 1_000_000:.1f}"
        )
    out["cells"] = upd.count()

    print("== 5. lifecycle decision (ann15) ==")
    dec = REGISTRY["ann15_index_lifecycle"].spark(spark, sf_dir).collect()
    retrain = dec[0]["retrain"] if dec else False
    drifted = sum(1 for r in dec if r["cell_drift"])
    print(
        f"  retrain={retrain} ({drifted}/{len(dec)} cells drifted; "
        f"serving index covers {sum(r['post_n'] for r in dec)} vectors, "
        f"total inertia "
        f"{sum(r['post_inertia_micro'] for r in dec) / 1_000_000:.1f})"
    )
    out["retrain"] = bool(retrain)
    return out


if __name__ == "__main__":
    result = main(*sys.argv[1:2])
    print("RESULT", result)
