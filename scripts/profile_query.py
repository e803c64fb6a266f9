"""Per-query profiling harness for the optimization rounds.

Runs named registry queries against $SPARK_GRAFT_SF_DIR with the noop
sink (guide §1.4), labelled via setJobDescription (guide §1.5), and
reports per-run wall seconds plus the job/stage/task counts the run
scheduled (from the status tracker) so shuffle-heavy shapes are visible
without the UI. Optionally dumps .explain("formatted") to a file.

Usage:
  python scripts/profile_query.py q1_pricing_summary dedup_minhash_lsh \
      [--runs 3] [--explain-dir plans/r13] [--suffix before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcp_datalake_pipeline_spark.plans import QUERIES
from gcp_datalake_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="profile")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    tracker = sc.statusTracker()

    out: dict[str, dict] = {}
    for name in args.names:
        if name not in QUERIES:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = QUERIES[name].fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(
                args.explain_dir, f"{name}_{args.suffix}.txt"
            )
            with open(path, "w") as f:
                f.write(plan)
        times = []
        jobs0 = tracker.getJobIdsForGroup(None)
        for i in range(args.runs):
            sc.setJobDescription(f"profile:{name}#{i}")
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, args.sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        # job/stage/task counts for the measured runs (all runs pooled)
        jobs1 = tracker.getJobIdsForGroup(None)
        new_jobs = [j for j in jobs1 if j not in set(jobs0)]
        n_stages = n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        runs = args.runs
        out[name] = {
            "times": times,
            "best": min(times),
            "jobs/run": round(len(new_jobs) / runs, 1),
            "stages/run": round(n_stages / runs, 1),
            "tasks/run": round(n_tasks / runs, 1),
        }
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
