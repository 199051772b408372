"""Simulate the driver: import __spark_entry__, smoke entry(), run every
queries()[k] at sf0.01 vs oracle_sql()[k] in DuckDB, order-insensitive compare."""
import sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as ep
from sim_spark.session import get_spark
from sim_spark.testing import duckdb_connect, compare_frames

spark = get_spark("drive", cpus=8)
t0 = time.time()
df = ep.entry(spark)
rows = df.collect()
assert len(rows) > 0, "entry returned 0 rows"
print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s schema={df.schema.simpleString()[:80]}")

qs, os_ = ep.queries(), ep.oracle_sql()
sf = "/root/testdata/sf0.01"
con = duckdb_connect(sf)
for k in sorted(qs):
    sdf = qs[k](spark, sf).toPandas()
    if k in os_:
        odf = con.execute(os_[k]).fetchdf()
        r = compare_frames(sdf, odf)
        print(f"  {k}: {'MATCH' if r.ok else 'MISMATCH ' + r.detail} ({len(sdf)} rows)")
        assert r.ok
    else:
        print(f"  {k}: rows-only, {len(sdf)} rows")
        assert len(sdf) >= 0

# probe 1: same query twice -> identical canonical rows (hash stability)
from sim_spark.testing import canonicalize
a = canonicalize(qs["agg_q1_pricing"](spark, sf).toPandas())
b = canonicalize(qs["agg_q1_pricing"](spark, sf).toPandas())
print("repeat-run stable:", a == b)
assert a == b

# probe 2: different scale factor (sf0.1) still matches oracle
sdf = qs["agg_q1_pricing"](spark, "/root/testdata/sf0.1").toPandas()
con2 = duckdb_connect("/root/testdata/sf0.1")
odf = con2.execute(os_["agg_q1_pricing"]).fetchdf()
r = compare_frames(sdf, odf)
print("sf0.1 parity:", r.ok, r.detail)
assert r.ok

# probe 3: nonexistent sf_dir -> clean Spark error, not silent empty
try:
    qs["agg_q1_pricing"](spark, "/root/testdata/sf9").toPandas()
    print("missing-dir probe: NO ERROR (unexpected)")
except Exception as e:
    print("missing-dir probe: raised", type(e).__name__, str(e).splitlines()[0][:90])
spark.stop()
print("DRIVE OK:", sum(1 for k in os_))
