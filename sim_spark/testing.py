"""Local replica of the driver's DuckDB-oracle comparison (SURVEY.md §5.2).

Catches dialect drift and float-hash mismatches before the driver does.
Comparison is deliberately strict: columns sorted by name, every cell
canonicalized to a string, rows compared as a sorted multiset — an
order-insensitive exact match, which is what an order-insensitive
value-hash implies.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from sim_spark.io import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # DuckDB defaults to 80% of machine RAM; an unbounded in-process
    # oracle alongside a Spark JVM got a big-fixture sweep shard
    # kernel-OOM-killed at 54 GB anon RSS (r12). SIM_SPARK_DUCKDB_MEM
    # (e.g. '24GB') caps the buffer pool; SIM_SPARK_DUCKDB_TEMPCAP
    # (e.g. '40GB') bounds spill so a runaway oracle errors instead of
    # filling the shared disk.
    mem = os.environ.get("SIM_SPARK_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    tmpcap = os.environ.get("SIM_SPARK_DUCKDB_TEMPCAP")
    if tmpcap:
        # Per-PID temp dir: concurrent sweep shards sharing one
        # temp_directory DELETE EACH OTHER'S spill files — DuckDB
        # aborts with an IO "Could not remove file" terminate (r14
        # sweep post-mortem; three shards died this way).
        con.execute(
            f"SET temp_directory='/root/repo/.tmp/pid{os.getpid()}'"
        )
        con.execute(f"SET max_temp_directory_size='{tmpcap}'")
    safe_dir = sf_dir.replace("'", "''")  # quote-escape: paths are data
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{safe_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # Type-sensitive on purpose: the external driver hashes pandas cells
        # as-is, so float 3.0 and int 3 hash differently there. Folding them
        # here once masked a DuckDB HUGEINT->float oracle-typing bug
        # (quality_ensemble_filter, round 4). Floats must stay floats.
        return repr(float(v))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        # Full microsecond precision: the external driver hashes the raw
        # pandas cell, so a sub-second drift it would catch must fail
        # locally too (second-truncation masked a <1s window before).
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    s = str(v)
    return "NULL" if s in ("nan", "NaT", "None", "<NA>") else s


def canonicalize(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    out = df[cols]
    rows = sorted(
        tuple(_canon_cell(v) for v in row)
        for row in out.itertuples(index=False, name=None)
    )
    return cols, rows


@dataclass
class CompareResult:
    ok: bool
    detail: str = ""
    diffs: list[str] = field(default_factory=list)


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> CompareResult:
    scols, srows = canonicalize(spark_df)
    ocols, orows = canonicalize(oracle_df)
    if scols != ocols:
        return CompareResult(False, f"column mismatch: spark={scols} oracle={ocols}")
    if len(srows) != len(orows):
        return CompareResult(False, f"row count: spark={len(srows)} oracle={len(orows)}")
    if srows == orows:
        return CompareResult(True)
    diffs = []
    for a, b in zip(srows, orows):
        if a != b:
            diffs.append(f"  spark={a}\n  oracle={b}")
            if len(diffs) >= 5:
                break
    return CompareResult(False, f"{len(diffs)}+ differing rows (of {len(srows)})", diffs)


def run_parity(spark, key: str, sf_dir: str) -> CompareResult:
    """Run one registered query against its oracle, driver-style."""
    from sim_spark.registry import ORACLES, QUERIES

    sdf = QUERIES[key](spark, sf_dir).toPandas()
    con = duckdb_connect(sf_dir)
    try:
        odf = con.execute(ORACLES[key]).fetchdf()
    finally:
        con.close()
    return compare_frames(sdf, odf)
