"""Cost-based-optimizer wiring: cataloged fixture tables + ANALYZE stats.

Spark's ``CostBasedJoinReorder`` (SURVEY §4.2) only fires when every join
input carries catalog statistics — plain ``spark.read.parquet`` paths
have a file-size estimate but no row counts or column NDVs, so CBO
silently skips them. :func:`analyzed_tables` registers the fixture
parquets as EXTERNAL catalog tables (no data copy — ``LOCATION`` points
at the fixture file) and runs ``ANALYZE TABLE … COMPUTE STATISTICS FOR
ALL COLUMNS`` once per (session, sf_dir), which is exactly the "run
ANALYZE in the bench harness" action SURVEY §4.2 defers.

At 100 TB the ANALYZE pass is a scan-once aggregate per table — paid at
ingest alongside compaction, amortized over every subsequent join
reorder decision; NDV sketches (HLL) keep it single-pass.

``spark.sql.cbo.enabled`` / ``joinReorder.enabled`` are session confs
read at optimization time; they live in a dedicated child session
(:func:`cbo_session` — shared SparkContext + external catalog, own
SQLConf) because stats propagation costs ~15% of multi-join planning
even when no stats exist, a tax the parent session's other 300 keys
should not pay.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_DB = "sim_spark_cbo"
_ANALYZED: set[tuple[str, str]] = set()

# TPC-H dims+fact used by the reorder demonstration. events is excluded:
# its nanos-timestamp variant needs io._events' normalization, which an
# external catalog table bypasses.
TABLES = ("region", "nation", "supplier", "customer", "orders", "lineitem")


_CBO_SESSIONS: dict[str, SparkSession] = {}


def cbo_session(spark: SparkSession) -> SparkSession:
    """A dedicated child session with CBO on, shared SparkContext and
    shared external catalog (so ANALYZE'd tables are visible), but its
    OWN SQLConf — the parent session's queries never pay the ~15%
    multi-join planning overhead CBO's stats propagation adds even when
    no stats exist, and no mid-sweep optimizer-setting flip can occur
    in a long-lived session running many keys."""
    key = spark.sparkContext.applicationId
    s = _CBO_SESSIONS.get(key)
    if s is None:
        s = spark.newSession()
        s.conf.set("spark.sql.session.timeZone", "UTC")
        s.conf.set("spark.sql.ansi.enabled", "true")
        s.conf.set("spark.sql.cbo.enabled", "true")
        s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        _CBO_SESSIONS[key] = s
    return s


def analyzed_tables(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Ensure external tables + full column stats exist for ``sf_dir``;
    returns {logical name -> catalog name}. Idempotent per session.

    The external tables bypass io.table's loud pinned-schema guard
    (CREATE TABLE infers its own schema from the parquet footer), so the
    guard is re-applied here: each catalog table's schema must match the
    pinned fixture schema, with the same timestamp_ntz canonicalization
    io.table uses — a silently retyped fixture column must fail this
    query the same way it fails every other one. A stale catalog entry
    whose schema no longer matches (persistent metastore, regenerated
    fixture) is dropped and re-created rather than trusted."""
    import re

    from sim_spark.io import SCHEMAS
    from sim_spark.scratch import sf_tag

    # Full sanitization to a SQL identifier: the readable basename part
    # of sf_tag may hold any filesystem char (spaces, parens, '+').
    tag = re.sub(r"[^A-Za-z0-9_]", "_", sf_tag(sf_dir))
    names = {t: f"{_DB}.{t}_{tag}" for t in TABLES}
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key in _ANALYZED:
        return names

    def _canon(schema) -> str:
        return schema.simpleString().replace("timestamp_ntz", "timestamp")

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_DB}")
    for t, cat in names.items():
        pinned = SCHEMAS.get(t)
        for attempt in ("trust", "recreate"):
            # The path is interpolated into SQL: double any single quotes
            # so a quote in sf_dir can't break the statement or inject SQL
            # (identifiers are sanitized separately via the re.sub above).
            # Absolutize first: CREATE TABLE resolves a relative LOCATION
            # against the warehouse dir, not the process cwd, so a
            # relative sf_dir (e.g. testdata_sf1) points at nothing.
            loc = os.path.abspath(f"{sf_dir}/{t}.parquet").replace("'", "''")
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS {cat} USING parquet "
                f"LOCATION '{loc}'"
            )
            if pinned is None or _canon(spark.table(cat).schema) == _canon(pinned):
                break
            if attempt == "trust":
                spark.sql(f"DROP TABLE IF EXISTS {cat}")  # stale catalog entry
            else:
                raise TypeError(
                    f"fixture schema drift for catalog table {cat}: expected "
                    f"{pinned.simpleString()}, got "
                    f"{spark.table(cat).schema.simpleString()}"
                )
        spark.sql(f"ANALYZE TABLE {cat} COMPUTE STATISTICS FOR ALL COLUMNS")
    _ANALYZED.add(key)
    return names


def stats_of(spark: SparkSession, catalog_name: str) -> str:
    """The Statistics line from DESCRIBE EXTENDED (rowCount evidence)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {catalog_name}").collect()
    for r in rows:
        if r["col_name"] == "Statistics":
            return r["data_type"]
    return ""


def cbo_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way chain join (lineitem→orders→customer→nation→region)
    written fact-first with the most selective filter (region) last —
    with stats present, CostBasedJoinReorder re-sequences by cost and
    the tiny dims broadcast. Plan evidence (rowCount= in EXPLAIN COST,
    catalog Statistics) is asserted in tests/test_plans.py."""
    s = cbo_session(spark)
    n = analyzed_tables(s, sf_dir)
    return s.sql(f"""
        SELECT r.r_name AS region_name,
               n.n_name AS nation_name,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(30,6)) * 1000000
                     AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS revenue
        FROM {n['lineitem']} l
        JOIN {n['orders']} o ON o.o_orderkey = l.l_orderkey
        JOIN {n['customer']} c ON c.c_custkey = o.o_custkey
        JOIN {n['nation']} n ON n.n_nationkey = c.c_nationkey
        JOIN {n['region']} r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name IN ('ASIA', 'EUROPE')
        GROUP BY r.r_name, n.n_name
        ORDER BY region_name, nation_name
    """)
