"""Per-query profile of the headline bench set: wall (best-of-2,
bench methodology), deterministic driver-job count per rep, and an
optional .explain("formatted") capture.

The job count is the DAGScheduler next-job-id delta (noise-free, the
r14 census instrument) — at bench batch sizes each job costs tens of
ms of driver latency, so job count x planning cost is the fixed floor
a small-SF timing mostly measures (guide §1).

Usage: python tools/prof_headline.py [sf_dir] [query ...]
  PROF_EXPLAIN=1  also write plans to /tmp/prof_plans/<name>.txt
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]

    from bench import HEADLINE, _next_job_id
    from pymongo_change_stream_reader_spark.queries import (
        release_caches,
        spark_queries,
    )
    from pymongo_change_stream_reader_spark.session import get_spark

    spark = get_spark(app_name="prof_headline")
    qs = spark_queries()
    qs["q1_pricing_summary"](spark, sf_dir).count()  # warm-up

    names = only or list(HEADLINE)
    do_explain = os.environ.get("PROF_EXPLAIN") == "1"
    if do_explain:
        os.makedirs("/tmp/prof_plans", exist_ok=True)

    total = 0.0
    rows = []
    for name in names:
        best, jobs = float("inf"), []
        for rep in range(2):
            j0 = _next_job_id(spark)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.count()
            dt = time.time() - t0
            jobs.append(_next_job_id(spark) - j0)
            if do_explain and rep == 1:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(f"/tmp/prof_plans/{name}.txt", "w") as f:
                    f.write(plan)
            release_caches(spark)
            best = min(best, dt)
        total += best
        rows.append((name, best, jobs))
        print(f"{name:35s} {best:7.3f}s  jobs={jobs}", flush=True)
    print(f"\nTOTAL (best-of-2 sum) {total:.3f}s over {len(names)} queries")


if __name__ == "__main__":
    main()
