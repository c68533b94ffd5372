"""Monitoring-pipeline demo — the events observability stack end-to-end.

Walks the temporal operators a production metrics pipeline chains, on the
events fixture, printing the artifact each stage ships:

1. SMOOTH   — per-user EWMA (ts10; ts11 is the hot-key-safe segmented
              form, st14 the O(1)-state streaming form)
2. TREND    — Holt level+trend with the 3-step forecast (ts12)
3. FLAG     — rolling z-score pointwise anomalies (ts8)
4. ALARM    — CUSUM sustained-shift change-points (ts13; st15 is the
              streaming form, proven bitwise-equal)
5. INGEST   — the same monitors as the stream actually arrives
              (st10 integrates / st14 smooths / st15 alarms)

Run:  python examples/monitoring_pipeline.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
    from apache_iceberg_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("monitoring-pipeline", cpus=8)
    out: dict = {}

    print("== 1. smooth (ts10 EWMA, alpha=1/8) ==")
    ewma = {
        r["user_id"]: r["ewma_cents"]
        for r in REGISTRY["ts10_ewma"].spark(spark, sf_dir).collect()
    }
    print(f"  {len(ewma)} users smoothed")
    out["n_users"] = len(ewma)

    print("== 2. trend + forecast (ts12 Holt) ==")
    holt = REGISTRY["ts12_holt_trend"].spark(spark, sf_dir).collect()
    rising = sum(1 for r in holt if r["trend_cents"] > 0)
    print(f"  {rising}/{len(holt)} users trending up; sample forecast: "
          f"user {holt[0]['user_id']} -> "
          f"{holt[0]['forecast3_cents'] / 100:.2f} in 3 steps")
    out["rising"] = rising

    print("== 3. flag (ts8 rolling z-score) ==")
    # ts8 emits only the flagged rows (|z| > 3 pre-filtered)
    n_anom = REGISTRY["ts8_rolling_zscore_anomalies"].spark(
        spark, sf_dir
    ).count()
    print(f"  {n_anom} pointwise anomalies flagged")
    out["anomalies"] = n_anom

    print("== 4. alarm (ts13 CUSUM change-points) ==")
    cusum = REGISTRY["ts13_cusum_changepoint"].spark(spark, sf_dir).collect()
    peak = max(cusum, key=lambda r: r["max_cusum_scaled"])
    print(f"  strongest sustained shift: user {peak['user_id']} "
          f"peaking at event {peak['peak_event_id']}")
    out["peak_user"] = peak["user_id"]

    print("== 5. ingest-time parity (st14/st15 == ts10/ts13) ==")
    st14 = {
        r["user_id"]: r["ewma_cents"]
        for r in REGISTRY["st14_stream_ewma"].spark(spark, sf_dir).collect()
    }
    st15 = {
        r["user_id"]: r["max_cusum_scaled"]
        for r in REGISTRY["st15_stream_cusum"].spark(spark, sf_dir).collect()
    }
    batch_cusum = {r["user_id"]: r["max_cusum_scaled"] for r in cusum}
    assert st14 == ewma, "streaming EWMA diverged from batch"
    assert st15 == batch_cusum, "streaming CUSUM diverged from batch"
    print("  streaming monitors reproduce the batch answers bitwise")
    out["stream_parity"] = True
    return out


if __name__ == "__main__":
    result = main(*sys.argv[1:2])
    print("RESULT", result)
