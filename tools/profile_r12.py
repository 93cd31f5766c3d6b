"""Round-12 optimization profiler: per-query wall time + execution-shape
metrics (jobs, stages, tasks, scanned rows/bytes, shuffle volume, spill,
executor CPU) from the AppStatusStore, plus .explain('formatted') dumps.

Usage:
    python tools/profile_r12.py [--sf SF_DIR] [--runs N] [--plans TAG]
                                [--out OUT.json] [query ...]

With --plans TAG, each query's formatted plan is written to
plans/r12/<query>_<TAG>.txt (the judge-facing before/after evidence).
Metrics come from one extra profiled run per query (run AFTER the timing
runs so the listener work never contaminates the timings).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from funnel_rocket_spark import benchqueries
from funnel_rocket_spark.engine.metrics import JobGroupMetrics
from funnel_rocket_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="dump plans/r12/<q>_<TAG>.txt per query")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="frs-profile-r12")
    spark.sparkContext.setLogLevel("ERROR")

    all_q = benchqueries.queries()
    all_q.update(getattr(benchqueries, "BENCH_VARIANTS", {}))
    names = args.queries or list(all_q)
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")

    # warmup
    try:
        all_q["fr_empty_query"](spark, args.sf).collect()
    except Exception:
        pass

    report: dict[str, dict] = {}
    for name in names:
        if name not in all_q:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = all_q[name]
        samples = []
        try:
            for _ in range(args.runs):
                t0 = time.perf_counter()
                rows = fn(spark, args.sf).collect()
                _ = len(rows)
                samples.append(round(time.perf_counter() - t0, 4))
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            # one profiled run (excluded from timing)
            spark.sparkContext.setJobDescription(f"profile:{name}")
            with JobGroupMetrics(spark, f"profile:{name}") as jm:
                df = fn(spark, args.sf)
                df.collect()
                snap = jm.snapshot()
            if args.plans:
                os.makedirs(plans_dir, exist_ok=True)
                with open(os.path.join(
                        plans_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        except Exception as e:
            report[name] = {"error": str(e)[:300]}
            print(f"{name}: ERROR {e}", file=sys.stderr)
            continue
        w = snap.get("worker", {})
        inv = snap.get("invoker", {})
        report[name] = {
            "min_s": min(samples), "runs": samples,
            "jobs": inv.get("jobs"), "stages": inv.get("stages"),
            "tasks": inv.get("totalTasks"),
            "scanned_rows": w.get("scannedRows"),
            "scanned_mb": round(w.get("scannedBytes", 0) / 1e6, 1),
            "shuffle_write_mb": round(w.get("shuffleWriteBytes", 0) / 1e6, 2),
            "spill_disk_mb": round(w.get("diskSpilledBytes", 0) / 1e6, 1),
            "exec_run_s": round(w.get("executorRunSeconds", 0), 2),
            "exec_cpu_s": round(w.get("executorCpuSeconds", 0), 2),
        }
        print(f"{name}: min={min(samples):.3f}s jobs={inv.get('jobs')} "
              f"stages={inv.get('stages')} tasks={inv.get('totalTasks')} "
              f"scan={w.get('scannedRows')}r/"
              f"{report[name]['scanned_mb']}MB "
              f"shufW={report[name]['shuffle_write_mb']}MB "
              f"cpu={report[name]['exec_cpu_s']}s")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
