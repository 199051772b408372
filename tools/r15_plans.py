#!/usr/bin/env python
"""Capture .explain("formatted") for named registry keys into
plans/r15/<key>_<tag>.txt (OPTIMIZATION_r15 evidence: the judge checks
plan claims against these files without running Spark).

Usage: python tools/r15_plans.py <tag> <key> [<key> ...]
       python tools/r15_plans.py <tag> --file keylist.txt

Notes: iterative keys (materialize() loops) execute their rounds at
DataFrame-build time, so their file holds the plan of the FINAL frame —
the per-round shape is asserted separately in tests/test_plans.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    if sys.argv[2] == "--file":
        keys = [
            ln.strip()
            for ln in open(sys.argv[3])
            if ln.strip() and not ln.startswith("#")
        ]
    else:
        keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SIM_SPARK_LOCAL_CHECKPOINT", "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from sim_spark.session import get_spark
    import sim_spark.queries  # noqa: F401
    from sim_spark.registry import QUERIES
    from sim_spark.scratch import release_tracked_caches

    spark = get_spark("r15-plans", cpus=cpus)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    for k in keys:
        df = QUERIES[k](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{k}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        release_tracked_caches()
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
