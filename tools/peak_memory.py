#!/usr/bin/env python
"""Peak executor memory probe (r10 verdict task 6).

The checksum-verified quadratic-output keys (dedup_simhash_pairs at
418M rows, join_theta_band at 151M rows, both sf1) execute fully
in-engine, so nothing in the drive artifacts records how much executor
memory they actually peak at — yet they are the first OOM candidates at
the next scale-up. This probe runs each named registry key in a FRESH
SparkSession (so peaks never smear across keys), executes the full plan
through the `noop` datasource sink (every output row is produced, no
driver-side collect), and reads the executor `peakMemoryMetrics` from
the REST status API. In local mode the driver row IS the executor, so
its JVMHeapMemory / OnHeapExecutionMemory peaks are the numbers a
cluster deployer would size per-executor containers from (divided by
the task-slot count, since local[32] co-hosts 32 task slots in one
heap).

Usage:
    python tools/peak_memory.py <sf_dir> key1 [key2 ...]

Prints one JSON line per key and a summary block suitable for pasting
into SCALE.md. Requires the UI (SPARK_GRAFT_UI is set internally).
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

os.environ["SPARK_GRAFT_UI"] = "1"
# poll executor metrics every 250ms — the 10s heartbeat default misses
# sub-10s queries entirely (peaks read back 0)
os.environ["SPARK_GRAFT_EXTRA_CONFS"] = (
    "spark.executor.metrics.pollingInterval=250ms"
)
sys.path.insert(0, "/root/repo")


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def probe(sf_dir: str, keys: list[str], cpus: int) -> dict[str, dict]:
    import __spark_entry__ as ep
    from sim_spark.session import get_spark

    qs = ep.queries()
    out: dict[str, dict] = {}
    for k in keys:
        spark = get_spark(f"peakmem_{k}", cpus=cpus)
        ui = spark.sparkContext.uiWebUrl
        t0 = time.time()
        df = qs[k](spark, sf_dir)
        # full plan execution, all columns produced, nothing collected
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        time.sleep(1)  # let the final heartbeat land the metrics
        apps = _rest(f"{ui}/api/v1/applications")
        execs = _rest(f"{ui}/api/v1/applications/{apps[0]['id']}/executors")
        peaks = {}
        for e in execs:
            for m, v in (e.get("peakMemoryMetrics") or {}).items():
                peaks[m] = max(peaks.get(m, 0), v)
        rec = {
            "wall_sec": round(wall, 2),
            "peak_jvm_heap_mb": round(peaks.get("JVMHeapMemory", 0) / 2**20),
            "peak_execution_mb": round(
                peaks.get("OnHeapExecutionMemory", 0) / 2**20
            ),
            "peak_storage_mb": round(
                peaks.get("OnHeapStorageMemory", 0) / 2**20
            ),
            "peak_unified_mb": round(
                peaks.get("OnHeapUnifiedMemory", 0) / 2**20
            ),
            "task_slots": cpus,
            "driver_mem": spark.conf.get("spark.driver.memory"),
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        }
        out[k] = rec
        print(json.dumps({k: rec}), flush=True)
        spark.stop()
        time.sleep(1)  # free the UI port before the next session
    return out


def main() -> int:
    sf_dir = sys.argv[1]
    keys = sys.argv[2:]
    assert keys, "usage: peak_memory.py <sf_dir> key1 [key2 ...]"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    res = probe(sf_dir, keys, cpus)
    print(json.dumps({"sf_dir": sf_dir, "results": res}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
