#!/usr/bin/env python
"""Stage-level profile of one registry key (OPTIMIZATION_r14 §1
"measure first"): runs the key once warm + once timed with the Spark
event log on, then prints per-job / per-stage wall, task counts and
shuffle bytes parsed from the event log. No UI needed.

Usage: SPARK_GRAFT_CPUS=32 python tools/r14_stageprof.py <key>
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    key = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    os.environ.setdefault("SIM_SPARK_LOCAL_CHECKPOINT", "1")
    evdir = tempfile.mkdtemp(prefix="r14_eventlog_")
    os.environ["SPARK_GRAFT_EXTRA_CONFS"] = (
        f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{evdir}"
        ";spark.eventLog.compress=false"
    )

    from sim_spark.session import get_spark
    import sim_spark.queries  # noqa: F401
    from sim_spark.registry import QUERIES
    from sim_spark.scratch import release_tracked_caches

    spark = get_spark("r14-prof", cpus=cpus)

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    fn = QUERIES[key]
    mat(fn(spark, sf_dir))  # warm-up
    release_tracked_caches()
    spark.sparkContext.setJobDescription(f"TIMED:{key}")
    t0 = time.perf_counter()
    mat(fn(spark, sf_dir))
    wall = time.perf_counter() - t0
    release_tracked_caches()
    spark.stop()

    print(f"\n=== {key}: timed run wall {wall:.3f}s (cpus={cpus}) ===")
    # Spark 4 rolling layout: <dir>/eventlog_v2_<app>/events_1_<app>
    cands = [
        p
        for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    path = sorted(cands, key=os.path.getmtime)[-1]
    jobs = {}       # jobId -> dict
    stages = {}     # stageId -> dict
    timed_jobs = set()
    with open(path) as f:
        for line in f:
            e = json.loads(line)
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                desc = e.get("Properties", {}).get("spark.job.description", "")
                jobs[jid] = {
                    "desc": desc,
                    "t0": e["Submission Time"],
                    "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                }
                if desc.startswith("TIMED:"):
                    timed_jobs.add(jid)
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                acc = {
                    a["Name"]: a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0) or 0)
                    - (si.get("Submission Time", 0) or 0),
                    "sh_r": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                    or 0,
                    "sh_w": acc.get(
                        "internal.metrics.shuffle.write.bytesWritten", 0
                    )
                    or 0,
                    "py": acc.get("data sent to Python workers", ""),
                }
    tot = 0
    for jid in sorted(timed_jobs):
        j = jobs[jid]
        jw = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
        tot += jw
        print(f"\njob {jid}  {jw*1000:7.0f} ms")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s:
                continue
            print(
                f"  stage {sid:4d} {s['ms']:7.0f} ms  {s['tasks']:3d} tasks"
                f"  shW {s['sh_w']:>10}  shR {s['sh_r']:>9}  {s['name'][:70]}"
            )
    print(f"\nsum of timed job walls: {tot:.3f}s (vs wall {wall:.3f}s — gap is"
          " driver/planning/Python-local time)")
    print(f"event log: {path}")


if __name__ == "__main__":
    main()
