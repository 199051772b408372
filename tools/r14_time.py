#!/usr/bin/env python
"""Time individual registry keys exactly like bench.py (noop sink,
1 warm-up + N timed runs, median), without the full suite. For the
measure→change→re-measure loop of OPTIMIZATION_r14.

Usage: SPARK_GRAFT_CPUS=32 python tools/r14_time.py <key> [<key> ...]
Env:   SPARK_GRAFT_BENCH_RUNS (default 3), SPARK_GRAFT_SF_DIR,
       SPARK_GRAFT_STAGES=1 to dump per-job wall breakdown via
       setJobDescription-visible job boundaries (coarse).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    os.environ.setdefault("SIM_SPARK_LOCAL_CHECKPOINT", "1")

    from sim_spark.session import get_spark
    import sim_spark.queries  # noqa: F401
    from sim_spark.registry import QUERIES
    from sim_spark.scratch import release_tracked_caches

    spark = get_spark("r14-time", cpus=cpus)

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    # same suite warm-up as bench.py so first-key numbers are comparable
    prev = None
    for _ in range(8):
        t0 = time.perf_counter()
        mat(QUERIES["agg_q1_pricing"](spark, sf_dir))
        dt = time.perf_counter() - t0
        if prev is not None and max(prev, dt) <= 1.15 * min(prev, dt):
            break
        prev = dt
    release_tracked_caches()

    out = {}
    for k in keys:
        fn = QUERIES[k]
        spark.sparkContext.setJobDescription(f"r14-time:{k}")
        mat(fn(spark, sf_dir))
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            mat(fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 4))
        out[k] = {"median": round(statistics.median(samples), 3), "samples": samples}
        release_tracked_caches()
        print(k, out[k], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
