#!/usr/bin/env python
"""Full job/SQL-execution timeline of ONE cold run of a registry key
(r15 measure-first): runs the key once warm, releases tracked caches,
then runs it once timed with event logging on, and prints EVERY job and
SQLExecution event in the timed window in time order — so driver-side
gaps (planning, py4j, Python) between jobs are visible, not inferred.

Usage: SPARK_GRAFT_CPUS=32 python tools/r15_timeline.py <key>
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
    evdir = tempfile.mkdtemp(prefix="r15_eventlog_")
    os.environ["SPARK_GRAFT_EXTRA_CONFS"] = (
        f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{evdir}"
        ";spark.eventLog.compress=false"
    )

    from sim_spark.session import get_spark
    import sim_spark.queries  # noqa: F401
    from sim_spark.registry import QUERIES
    from sim_spark.scratch import release_tracked_caches

    spark = get_spark("r15-timeline", cpus=cpus)

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    fn = QUERIES[key]
    mat(fn(spark, sf_dir))  # warm-up
    release_tracked_caches()
    t_start = time.time() * 1000
    t0 = time.perf_counter()
    mat(fn(spark, sf_dir))
    wall = time.perf_counter() - t0
    t_end = time.time() * 1000
    release_tracked_caches()
    spark.stop()

    print(f"\n=== {key}: timed cold run wall {wall:.3f}s (cpus={cpus}) ===")
    cands = [
        p
        for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    # Spark 4 rolling layout: parse EVERY events_* segment (the run's
    # jobs span rolls; reading only the newest hides earlier jobs).
    paths = sorted(cands, key=os.path.getmtime)
    events = []  # (t, kind, text)
    for path in paths:
        with open(path) as f:
            events.extend(_parse(f))
    events = [x for x in events if t_start - 50 <= x[0] <= t_end + 50]
    events.sort()
    prev = t_start
    for t, kind, text in events:
        gap = t - prev
        mark = f"  (+{gap:6.0f} ms gap)" if kind in ("job_start", "sql_start") and gap > 80 else ""
        print(f"{t - t_start:9.0f} ms  {text}{mark}")
        prev = t
    print(f"window end at {t_end - t_start:.0f} ms")
    print(f"event logs: {len(paths)} segments in {os.path.dirname(paths[0])}")


def _parse(f):
    events = []
    if True:
        for line in f:
            e = json.loads(line)
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                names = " | ".join(
                    s["Stage Name"].split(" at ")[0]
                    for s in e["Stage Infos"]
                )[:110]
                events.append((e["Submission Time"], "job_start",
                               f"job {e['Job ID']} start "
                               f"({len(e['Stage Infos'])} stages: {names})"))
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                t0s = si.get("Submission Time")
                t1s = si.get("Completion Time")
                if t0s and t1s:
                    events.append((t1s, "stage_end",
                                   f"  stage {si['Stage ID']} done "
                                   f"{t1s - t0s} ms {si['Number of Tasks']}t "
                                   f"{si['Stage Name'].split(' at ')[0]}"))
            elif ev == "SparkListenerJobEnd":
                events.append((e["Completion Time"], "job_end",
                               f"job {e['Job ID']} end"))
            elif "SQLExecutionStart" in str(ev):
                events.append((e.get("time", 0), "sql_start",
                               f"sql {e.get('executionId')} start: "
                               f"{(e.get('description') or '')[:60]}"))
            elif "SQLExecutionEnd" in str(ev):
                events.append((e.get("time", 0), "sql_end",
                               f"sql {e.get('executionId')} end"))
    return events


if __name__ == "__main__":
    main()
