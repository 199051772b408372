#!/usr/bin/env python
"""Time individual registry keys with the HONEST r15 protocol: noop
sink, 1 warm-up + N timed runs, median — and tracked caches released
after the warm-up AND after EVERY timed run, so no timed run reads a
cache populated by a previous run (VERDICT r14 item 1: the per-QUERY
release let the warm-up populate caches the timed runs then read).

Usage: SPARK_GRAFT_CPUS=32 python tools/r15_time.py <key> [<key> ...]
Env:   SPARK_GRAFT_BENCH_RUNS (default 3), SPARK_GRAFT_SF_DIR,
       SPARK_GRAFT_WARM=1 to fall back to the old per-QUERY release
       (for old-protocol comparison numbers only).
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
    warm = os.environ.get("SPARK_GRAFT_WARM") == "1"
    os.environ.setdefault("SIM_SPARK_LOCAL_CHECKPOINT", "1")

    from sim_spark.session import get_spark
    import sim_spark.queries  # noqa: F401
    from sim_spark.registry import QUERIES
    from sim_spark.scratch import release_tracked_caches

    spark = get_spark("r15-time", cpus=cpus)

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
        spark.sparkContext.setJobDescription(f"r15-time:{k}")
        mat(fn(spark, sf_dir))
        if not warm:
            release_tracked_caches()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            mat(fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 4))
            if not warm:
                release_tracked_caches()
        out[k] = {"median": round(statistics.median(samples), 3), "samples": samples}
        release_tracked_caches()
        print(k, out[k], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
