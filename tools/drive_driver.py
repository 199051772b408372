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


def _head_commit() -> str:
    """Short HEAD hash stamped onto every per-key record (r11 advice):
    a scoped DRIVE_KEYS merge keeps older keys' results, so without a
    per-key commit a regressed key could keep looking green under
    evidence recorded at an older tree."""
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd="/root/repo",
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


HEAD = _head_commit()


def _out_path() -> str:
    # DRIVE_OUT overrides the artifact path entirely — the r14
    # full-surface sf10 sweep runs as concurrent key-sharded processes
    # that would otherwise all claim the same *_subset.json.
    if os.environ.get("DRIVE_OUT"):
        return os.environ["DRIVE_OUT"]
    base = os.path.basename(SF_DIR.rstrip("/"))
    if base.startswith("testdata_"):  # repo-local fixtures: testdata_sf10 -> sf10
        base = base[len("testdata_"):]
    tag = "" if base == "sf0.01" else "_" + base
    if os.environ.get("DRIVE_KEYS"):
        tag += "_subset"
    return f"/root/repo/DRIVE_r{ROUND:02d}{tag}.json"


def _write_partial(results: dict) -> None:
    """Crash insurance for long (sf1) sweeps: persist after every key so a
    kill/OOM preserves the evidence gathered so far."""
    if ROUND is None:
        return
    with open(_out_path() + ".partial", "w") as f:
        json.dump(results, f, indent=2)

spark = get_spark("drive", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
t0 = time.time()
df = ep.entry(spark)
rows = df.collect()
assert len(rows) > 0, "entry returned 0 rows"
print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s schema={df.schema.simpleString()[:80]}")

qs, os_ = ep.queries(), ep.oracle_sql()
# DRIVE_KEYS=k1,k2,... scopes the sweep to a named key subset (the sf10
# rehearsal drives the scale-sensitive families, not all 358 keys —
# quadratic-OUTPUT keys are excluded there by scope, see SCALE.md §24);
# the output file gains a _subset tag so a scoped artifact can never be
# mistaken for a full drive.
qs_all = qs  # probes below use the flagship regardless of DRIVE_KEYS scope
if os.environ.get("DRIVE_KEYS"):
    keep = {k.strip() for k in os.environ["DRIVE_KEYS"].split(",") if k.strip()}
    missing = keep - set(qs)
    assert not missing, f"DRIVE_KEYS not in registry: {sorted(missing)}"
    qs = {k: v for k, v in qs.items() if k in keep}
sf = SF_DIR
con = duckdb_connect(sf)

# Keys whose OUTPUT is too large to materialize through pandas at a given
# scale (dedup_simhash_pairs defines a 418M-row pair list at sf1 —
# SCALE.md §20; join_theta_band's pair list is likewise quadratic in the
# fixed-band-density fixture: 15k → 1.5M → ~151M rows, 4.2 GiB
# serialized, over any driver result cap). For these, compare COUNT(*)
# plus an order-independent md5 checksum of the canonical row string,
# aggregated INSIDE each engine — value-level evidence without
# materialization. Only sound for all-integer outputs (string-casting
# floats is engine-formatting-dependent); asserted below.
CHECKSUM_KEYS = (
    set(
        os.environ.get(
            "DRIVE_CHECKSUM_KEYS", "dedup_simhash_pairs,join_theta_band"
        ).split(",")
    )
    if "sf1" in os.path.basename(SF_DIR.rstrip("/")) or os.environ.get("DRIVE_CHECKSUM_KEYS")
    else set()
)


# Engine-identical canonicalizing projections for checksum keys whose
# raw output has a float column: the SAME expression text runs through
# Spark selectExpr and around the DuckDB oracle, mapping exact-grid
# doubles to integers (join_theta_band's price_gap is an exact multiple
# of 0.1 — one-decimal retail prices — so deci-units are engine-exact).
CHECKSUM_PROJ: dict[str, list[str]] = {
    "join_theta_band": [
        "k1",
        "k2",
        "brand",
        "CAST(floor(price_gap * 10 + 0.5) AS BIGINT) AS gap_deci",
    ],
}


def _auto_quant_proj(sdf) -> tuple[list[str], list[str]]:
    """Generic float canonicalization for checksum keys WITHOUT a
    hand-written CHECKSUM_PROJ (r12 verdict task 5): float/double
    columns quantize to micro-units (CAST(FLOOR(c*1e6 + 0.5) AS
    BIGINT)), booleans cast to string ('true'/'false' in both
    engines), int/string pass through. Sound ONLY for keys whose
    float columns sit on a <= 1e-6 grid with engine-identical doubles
    — certified by the same key hash-matching the full repr-equality
    pandas compare at a smaller SF (fn_math/fn_try_safe: sf1). The
    expression text is valid Spark SQL AND DuckDB SQL (STRING is a
    VARCHAR alias in DuckDB), so both engines run the identical
    canonicalization. Returns (projection exprs, quantized cols)."""
    from pyspark.sql import types as T

    proj, quantized = [], []
    for c in sdf.columns:
        dt = sdf.schema[c].dataType
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            proj.append(f"CAST(FLOOR({c} * 1000000 + 0.5) AS BIGINT) AS {c}")
            quantized.append(c)
        elif isinstance(dt, T.BooleanType):
            proj.append(f"CAST({c} AS STRING) AS {c}")
        else:
            proj.append(c)
    return proj, quantized


def _checksum_compare(k: str, osql: str | None = None) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    sdf = qs[k](spark, sf)
    if osql is None:
        osql = os_[k]
    # real schema compare (review r10: hardcoding True would hide
    # column drift exactly where only the checksum path runs) — DESCRIBE
    # binds the oracle without executing its CTE chain
    ocols_raw = sorted(
        r[0] for r in con.execute(f"DESCRIBE SELECT * FROM ({osql}) __t").fetchall()
    )
    schema_ok = sorted(sdf.columns) == ocols_raw
    proj = CHECKSUM_PROJ.get(k)
    quantized: list[str] = []
    if proj is None:
        from pyspark.sql import types as T

        if any(
            isinstance(sdf.schema[c].dataType,
                       (T.FloatType, T.DoubleType, T.BooleanType))
            for c in sdf.columns
        ):
            proj, quantized = _auto_quant_proj(sdf)
    if proj:
        sdf = sdf.selectExpr(*proj)
    cols = sorted(sdf.columns)
    assert all(
        isinstance(
            sdf.schema[c].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType),
        )
        for c in cols
    ), f"{k}: checksum compare needs integer/string columns"
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])), 1, 12
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    srow = sdf.agg(
        F.count(F.lit(1)).alias("n"), F.sum(h).alias("checksum")
    ).collect()[0]
    concat = ", ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    if proj:
        osql = f"SELECT {', '.join(proj)} FROM ({osql}) __t0"
    orow = con.execute(
        f"SELECT COUNT(*) AS n, SUM(CAST(CONCAT('0x', substring(md5("
        f"concat_ws('|', {concat})), 1, 12)) AS BIGINT)) AS checksum "
        f"FROM ({osql}) __t"
    ).fetchone()
    s_n, s_h = int(srow["n"]), int(srow["checksum"] or 0)
    o_n, o_h = int(orow[0]), int(orow[1] or 0)
    rec = {
        "rows_match": s_n == o_n,
        "schema_match": schema_ok,
        "hash_match": s_h == o_h,
        "spark_rows": s_n,
        "oracle_rows": o_n,
        "err": None,
        "compare": "md5-checksum (output too large to materialize)",
    }
    if quantized:
        rec["compare"] += f"; floats quantized to 1e-6: {quantized}"
    return rec


results: dict[str, dict] = {}
failed: list[str] = []

# Resume support for long sf1 sweeps: DRIVE_RESUME=<path to a .partial
# JSON> preloads prior results and skips keys that already passed (or
# were rows-only); failed/errored/missing keys re-run. The final JSON is
# still written complete.
_resume = os.environ.get("DRIVE_RESUME")
_skip: dict[str, dict] = {}
if _resume and os.path.exists(_resume):
    with open(_resume) as f:
        for rk, rv in json.load(f).items():
            ok = (
                # a prior no_oracle verdict only carries if the key is
                # STILL oracle-less — if it has since gained an oracle
                # (the common direction of travel) it must re-run
                # (r10 ADVICE)
                (rv.get("err") == "no_oracle" and rk not in os_)
                or (
                    rv.get("rows_match")
                    and rv.get("hash_match")
                    # a schema-only failure must re-run too (review r10)
                    and rv.get("schema_match") is not False
                )
            )
            if ok:
                _skip[rk] = rv
    print(f"resuming: {len(_skip)} keys carried from {_resume}")

# DRIVE_STAGED_KEYS=k1,k2 evaluates those keys' oracles STAGED: each
# CTE becomes a temp table (per-round lineage cut — the DuckDB mirror
# of ops/materialize.py), and the audio fingerprint keys build their
# signature table in doc_id-modulo chunks (tools/staged_oracle.py).
# Result-identical to the inline oracle (tests/test_staged_oracle.py);
# exists so the graph/audio families fit the sandbox at sf10.
STAGED_KEYS = {
    k.strip()
    for k in os.environ.get("DRIVE_STAGED_KEYS", "").split(",")
    if k.strip()
}

# DRIVE_KEYS order is honored when given (r14: concurrent sweep
# shards run forward + REVERSED lists so they meet in the middle —
# a sorted() here silently made the reversed twin duplicate its
# forward sibling key for key); default stays sorted.
if os.environ.get("DRIVE_KEYS"):
    _order = [
        k.strip()
        for k in os.environ["DRIVE_KEYS"].split(",")
        if k.strip() and k.strip() in qs
    ]
else:
    _order = sorted(qs)
for k in _order:
    if k in _skip:
        results[k] = _skip[k]
        continue
    rec = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
        "commit": HEAD,
    }
    osql = None
    if k in STAGED_KEYS:
        from tools.staged_oracle import prepare_staged

        try:
            t_st = time.time()
            osql = prepare_staged(con, k, os_.get(k))
            print(f"  {k}: oracle staged in {time.time()-t_st:.0f}s")
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"staging {type(e).__name__}: " + (
                (str(e).splitlines() or [""])[0][:160]
            )
            failed.append(k)
            print(f"  {k}: STAGING ERROR {rec['err']}")
            results[k] = rec
            con.close()
            con = duckdb_connect(sf)
            _write_partial(results)
            continue
    if k in CHECKSUM_KEYS and k in os_:
        try:
            rec = _checksum_compare(k, osql)
            rec["commit"] = HEAD
            ok = rec["rows_match"] and rec["hash_match"] and rec["schema_match"]
            if not ok:
                failed.append(k)
            print(
                f"  {k}: {'MATCH' if ok else 'MISMATCH'} (checksum, "
                f"{rec['spark_rows']} rows)"
            )
        except Exception as e:  # noqa: BLE001
            # (str(e) can be EMPTY — a bare Py4JJavaError killed a whole sf10
            # shard through splitlines()[0] before r12 guarded this)
            rec["err"] = f"{type(e).__name__}: " + (
                (str(e).splitlines() or [""])[0][:160]
            )
            failed.append(k)
            print(f"  {k}: ERROR {rec['err']}")
        results[k] = rec
        release_tracked_caches()
        if k in STAGED_KEYS:  # drop staged temp tables, release arena
            con.close()
            con = duckdb_connect(sf)
        _write_partial(results)
        continue
    try:
        scols, srows = canonicalize(qs[k](spark, sf).toPandas())
        rec["spark_rows"] = len(srows)
        if k in os_:
            ocols, orows = canonicalize(con.execute(osql or os_[k]).fetchdf())
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
        # (str(e) can be EMPTY — a bare Py4JJavaError killed a whole sf10
        # shard through splitlines()[0] before r12 guarded this)
        rec["err"] = f"{type(e).__name__}: " + (
            (str(e).splitlines() or [""])[0][:160]
        )
        failed.append(k)
        print(f"  {k}: ERROR {rec['err']}")
    results[k] = rec
    release_tracked_caches()  # per-key: no cross-sf cache accumulation
    if k in STAGED_KEYS:  # drop staged temp tables, release arena
        con.close()
        con = duckdb_connect(sf)
    _write_partial(results)

if ROUND is not None:
    out = _out_path()
    if os.environ.get("DRIVE_KEYS") and os.path.exists(out):
        # scoped runs MERGE into the round's subset artifact: two
        # successive single-key drives previously overwrote each other.
        # Every record carries the HEAD commit it ran under (r11 advice);
        # carried-over keys recorded at an OLDER tree are flagged loudly
        # so stale green can't masquerade as current evidence.
        with open(out) as f:
            merged = json.load(f)
        stale = sorted(
            k
            for k, v in merged.items()
            if k not in results and isinstance(v, dict) and v.get("commit") != HEAD
        )
        if stale:
            print(
                f"WARNING: {len(stale)} carried keys were recorded under an "
                f"older commit (current {HEAD}): {', '.join(stale[:12])}"
                + ("..." if len(stale) > 12 else "")
            )
        merged.update(results)
        results = merged
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")

# probe 1: same query twice -> identical canonical rows (hash stability)
a = canonicalize(qs_all["agg_q1_pricing"](spark, sf).toPandas())
b = canonicalize(qs_all["agg_q1_pricing"](spark, sf).toPandas())
print("repeat-run stable:", a == b)
assert a == b

# probe 2: different scale factor (sf0.1) still matches oracle
scols, srows = canonicalize(qs_all["agg_q1_pricing"](spark, "/root/testdata/sf0.1").toPandas())
con2 = duckdb_connect("/root/testdata/sf0.1")
ocols, orows = canonicalize(con2.execute(os_["agg_q1_pricing"]).fetchdf())
print("sf0.1 parity:", (scols, srows) == (ocols, orows))
assert (scols, srows) == (ocols, orows)

# probe 3: nonexistent sf_dir -> clean Spark error, not silent empty
try:
    qs_all["agg_q1_pricing"](spark, "/root/testdata/sf9").toPandas()
    print("missing-dir probe: NO ERROR (unexpected)")
except Exception as e:
    print("missing-dir probe: raised", type(e).__name__,
          (str(e).splitlines() or [""])[0][:90])
spark.stop()

n_oracled = sum(1 for k in qs if k in os_)
n_rows_only = len(qs) - n_oracled
print(f"DRIVE: {len(qs)} keys, {n_oracled} oracled, {n_rows_only} rows-only, {len(failed)} failed")
if failed:
    print("FAILED:", ", ".join(failed))
    sys.exit(1)
print("DRIVE OK")
