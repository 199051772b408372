#!/usr/bin/env python
"""Round-8 scale rehearsal harness: run the headline suite plus the
scale-sensitive keys at an arbitrary SF dir, writing one JSON line per
query AS IT COMPLETES (the full-suite bench.py only reports at the end;
at sf1 a single slow query would discard everything measured before it).

Usage: python tools/bench_sf1.py <sf_dir> <out.jsonl> [runs] [keys...]
Each line: {"key": ..., "runs": [...], "median": ..., "rows": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    only = sys.argv[4:]

    os.environ.setdefault("SIM_SPARK_LOCAL_CHECKPOINT", "1")
    from bench import HEADLINE, SPECIAL, _materialize

    from sim_spark.session import get_spark
    import sim_spark.queries  # noqa: F401
    from sim_spark.registry import QUERIES
    from sim_spark.scratch import release_tracked_caches

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("sim_spark-bench-sf1", cpus=cpus)

    done = set()
    if os.path.exists(out_path):  # resume: skip already-measured keys
        with open(out_path) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["key"])
                except Exception:
                    pass

    keys = only or HEADLINE
    for _ in range(2):  # suite-level JIT warm-up (bench.py protocol)
        _materialize(QUERIES["agg_q1_pricing"](spark, sf_dir))
    release_tracked_caches()

    with open(out_path, "a") as out:
        for name in keys:
            if name in done:
                print(f"skip {name} (already measured)", file=sys.stderr)
                continue
            fn = SPECIAL.get(name) or QUERIES[name]
            t_warm0 = time.perf_counter()
            _materialize(fn(spark, sf_dir))  # warm-up run
            warm = round(time.perf_counter() - t_warm0, 3)
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                _materialize(fn(spark, sf_dir))
                samples.append(round(time.perf_counter() - t0, 3))
            release_tracked_caches()
            rec = {
                "key": name,
                "warm": warm,
                "runs": samples,
                "median": round(statistics.median(samples), 3),
            }
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(json.dumps(rec), file=sys.stderr)
    spark.stop()
    print("done")


if __name__ == "__main__":
    main()
