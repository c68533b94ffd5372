"""Per-query profiling harness for the optimization rounds (guide §1).

For each named query: build the DataFrame, dump ``explain("formatted")``
to ``plans/<tag>/<name>.txt`` (the judge-facing plan evidence), then time
it min-of-N with the noop sink (guide §1.4 — computes every column of
every row, no collect/count column-pruning distortion) AND with the
bench's own ``.count()`` action so numbers stay comparable to BENCH_rNN.

Usage:
    python tools/profile_query.py [--sf DIR] [--reps N] [--tag plans-dir]
                                  [--no-plan] name [name ...]

Prints one line per query: ``name  noop=SECs  count=SECs  rows=N``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None, help="plans/<tag>/ output dir")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from apache_iceberg_spark.registry import all_queries
    from apache_iceberg_spark.session import get_spark, release_plan_caches

    spark = get_spark("profile", cpus=args.cpus)
    queries = all_queries()

    plan_dir = None
    if args.tag and not args.no_plan:
        plan_dir = os.path.join(REPO, "plans", args.tag)
        os.makedirs(plan_dir, exist_ok=True)

    for name in args.names:
        if name not in queries:
            print(f"{name}  UNKNOWN", flush=True)
            continue
        # Warm-up at sf0.001 (bench protocol: JVM/codegen warm-up).
        try:
            queries[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
        release_plan_caches(spark)

        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = queries[name](spark, args.sf)
        if plan_dir is not None:
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                ))
        best_noop = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best_noop = min(best_noop, time.time() - t0)
        release_plan_caches(spark)
        best_count = float("inf")
        rows = -1
        for _ in range(args.reps):
            t0 = time.time()
            rows = queries[name](spark, args.sf).count()
            best_count = min(best_count, time.time() - t0)
        release_plan_caches(spark)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}  noop={best_noop:.3f}s  count={best_count:.3f}s  rows={rows}",
            flush=True,
        )


if __name__ == "__main__":
    main()
