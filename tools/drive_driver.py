"""Simulate the driver: import __spark_entry__, smoke entry(), run every
queries()[k] at sf0.01 vs oracle_sql()[k] in DuckDB, order-insensitive compare.

Emits DRIVE_r{N}.json (same per-key fields as the driver's CORRECTNESS_r*.json)
so every registered key has committed sf0.01 evidence each round, regardless of
which 50 keys the external driver happens to sample.

Usage: python tools/drive_driver.py [round_number] [sf_dir]
(default sf_dir: /root/testdata/sf0.01 — the driver's grading scale; pass
/root/testdata/sf0.1 for the 10x stress sweep, which tags the JSON name)
Exit code is nonzero if any oracled key mismatches.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as ep
from sim_spark.session import get_spark
from sim_spark.scratch import release_tracked_caches
from sim_spark.testing import canonicalize, duckdb_connect

ROUND = int(sys.argv[1]) if len(sys.argv) > 1 else None
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

spark = get_spark("drive", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
t0 = time.time()
df = ep.entry(spark)
rows = df.collect()
assert len(rows) > 0, "entry returned 0 rows"
print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s schema={df.schema.simpleString()[:80]}")

qs, os_ = ep.queries(), ep.oracle_sql()
sf = SF_DIR
con = duckdb_connect(sf)
results: dict[str, dict] = {}
failed: list[str] = []
for k in sorted(qs):
    rec = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        scols, srows = canonicalize(qs[k](spark, sf).toPandas())
        rec["spark_rows"] = len(srows)
        if k in os_:
            ocols, orows = canonicalize(con.execute(os_[k]).fetchdf())
            rec["oracle_rows"] = len(orows)
            rec["rows_match"] = len(srows) == len(orows)
            rec["schema_match"] = scols == ocols
            rec["hash_match"] = srows == orows
            ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            if not ok:
                failed.append(k)
                detail = ""
                if not rec["schema_match"]:
                    detail = f"spark={scols} oracle={ocols}"
                elif rec["hash_match"] is False:
                    detail = next(
                        (f"spark={a} oracle={b}" for a, b in zip(srows, orows) if a != b),
                        "",
                    )[:200]
                print(f"  {k}: MISMATCH {detail} ({len(srows)} rows)")
            else:
                print(f"  {k}: MATCH ({len(srows)} rows)")
        else:
            rec["err"] = "no_oracle"
            print(f"  {k}: rows-only, {len(srows)} rows")
    except Exception as e:  # noqa: BLE001 - record per-key instead of aborting the sweep
        rec["err"] = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
        failed.append(k)
        print(f"  {k}: ERROR {rec['err']}")
    results[k] = rec
    release_tracked_caches()  # per-key: no cross-sf cache accumulation

if ROUND is not None:
    tag = "" if sf.rstrip("/").endswith("sf0.01") else "_" + os.path.basename(sf.rstrip("/"))
    out = f"/root/repo/DRIVE_r{ROUND:02d}{tag}.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")

# probe 1: same query twice -> identical canonical rows (hash stability)
a = canonicalize(qs["agg_q1_pricing"](spark, sf).toPandas())
b = canonicalize(qs["agg_q1_pricing"](spark, sf).toPandas())
print("repeat-run stable:", a == b)
assert a == b

# probe 2: different scale factor (sf0.1) still matches oracle
scols, srows = canonicalize(qs["agg_q1_pricing"](spark, "/root/testdata/sf0.1").toPandas())
con2 = duckdb_connect("/root/testdata/sf0.1")
ocols, orows = canonicalize(con2.execute(os_["agg_q1_pricing"]).fetchdf())
print("sf0.1 parity:", (scols, srows) == (ocols, orows))
assert (scols, srows) == (ocols, orows)

# probe 3: nonexistent sf_dir -> clean Spark error, not silent empty
try:
    qs["agg_q1_pricing"](spark, "/root/testdata/sf9").toPandas()
    print("missing-dir probe: NO ERROR (unexpected)")
except Exception as e:
    print("missing-dir probe: raised", type(e).__name__, str(e).splitlines()[0][:90])
spark.stop()

n_oracled = sum(1 for k in qs if k in os_)
n_rows_only = len(qs) - n_oracled
print(f"DRIVE: {len(qs)} keys, {n_oracled} oracled, {n_rows_only} rows-only, {len(failed)} failed")
if failed:
    print("FAILED:", ", ".join(failed))
    sys.exit(1)
print("DRIVE OK")
