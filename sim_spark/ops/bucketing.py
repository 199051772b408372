"""Bucketed co-located join (SCALE.md §2): pre-shuffle both sides ONCE
at write time so every subsequent join on the bucket key runs with zero
exchanges.

At 100 TB this is the difference between re-shuffling the fact table on
every query and paying the shuffle once at ingest: a table written with
``bucketBy(n, key).sortBy(key)`` stores Spark's hash-partitioning in the
catalog, and a join of two tables bucketed on the same key with the same
bucket count satisfies both children's distribution requirements
outright — `.explain` shows SortMergeJoin with NO Exchange (and no Sort,
because of ``sortBy``).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession

_DB = "sim_spark_buckets"
# Per-process private location + table-name token: concurrent sessions
# on the same host never share a path (no DROP/rmtree races, no
# predictable-/tmp-path squatting; mkdtemp is 0700).
_LOCATION: str | None = None
_LOCATION_LOCK = threading.Lock()


def _location() -> str:
    # Locked lazy init (ADVICE r14): scale_ops submits the two bucketed
    # writes from a thread pool, and an unlocked check-then-mkdtemp let
    # both threads create distinct dirs — the database LOCATION (first
    # CREATE wins) could then diverge from the module global, so the
    # pre-write rmtree cleaned the wrong directory.
    global _LOCATION
    with _LOCATION_LOCK:
        if _LOCATION is None:
            _LOCATION = tempfile.mkdtemp(prefix="sim_spark_buckets_")
            atexit.register(shutil.rmtree, _LOCATION, ignore_errors=True)
        return _LOCATION


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Persist ``df`` as a bucketed+sorted catalog table; return a reader.

    Uses a dedicated database with an explicit LOCATION so this works
    under any warehouse conf and any catalog implementation (in-memory
    or Hive) — bucketing metadata lives in the session catalog either
    way. Overwrites on re-run. The location is always the per-process
    mkdtemp (no caller override: CREATE DATABASE IF NOT EXISTS keeps
    the FIRST location, so a divergent caller-supplied path would make
    the pre-write rmtree clean the wrong directory); the table name
    carries a per-process token so two runs can't collide in the
    catalog either."""
    location = _location()
    name = f"{name}_{os.getpid()}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_DB} LOCATION '{location}'")
    # The catalog is session-scoped but the location persists: a fresh
    # session won't know the table exists, and saveAsTable refuses to
    # claim a non-empty managed location. Drop both before writing.
    spark.sql(f"DROP TABLE IF EXISTS {_DB}.{name}")
    shutil.rmtree(os.path.join(location, name), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(f"{_DB}.{name}")
    )
    return spark.table(f"{_DB}.{name}")


def bucketed_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    name_prefix: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Write both sides bucketed on their join keys, then join them.

    The ``merge`` hint pins SortMergeJoin so the no-Exchange property is
    visible regardless of size-based broadcast decisions."""
    lt = write_bucketed(spark, left, f"{name_prefix}_l", left_key, n_buckets)
    rt = write_bucketed(spark, right, f"{name_prefix}_r", right_key, n_buckets)
    return lt.hint("merge").join(rt, lt[left_key] == rt[right_key])
