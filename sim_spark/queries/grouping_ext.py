"""Grouping extensions: ROLLUP / CUBE / GROUPING SETS (SURVEY.md §2.4).

agg_grouping_sets deliberately goes through spark.sql() over temp views —
the engine's third entry point (SURVEY.md §3.2 EP3) — so the SQL parser
path is exercised alongside the DataFrame builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sim_spark.exprs import dsum, sql_dsum
from sim_spark.io import register_views, table
from sim_spark.registry import query


@query(
    "sql_multiway_star",
    oracle=f"""
SELECT r.r_name AS region,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus = 'F'
GROUP BY r.r_name
""",
)
def sql_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multiway star join written as SQL text (EP3, SURVEY §3.2):
    same Catalyst plan as the DataFrame build in join_multiway_star —
    parser entry point exercised on a join-heavy query.

    Revenue goes through the µ-unit integer route (exprs.dsum's
    convention) IN THE SQL TEXT too (r12): the raw decimal→double cast
    is engine-asymmetric once the unscaled total exceeds 2^53 — Spark
    rounds via BigDecimal.doubleValue, DuckDB computes
    double(unscaled)/10^scale — and the sf10 sweep measured the one-ulp
    split at this key's ~1.45e11 revenue while the oracle already used
    the µ-unit formula."""
    register_views(
        spark, sf_dir, ["lineitem", "orders", "customer", "nation", "region"]
    )
    return spark.sql(
        """
        SELECT r.r_name AS region,
               CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(30,6)) * 1000000
                             AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0
                 AS revenue,
               COUNT(DISTINCT o.o_orderkey) AS n_orders
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY r.r_name
        """
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT r.r_name AS region, n.n_name AS nation,
       GROUPING(r.r_name, n.n_name) AS gid,
       COUNT(*) AS n_orders,
       {sql_dsum('o.o_totalprice')} AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation): per-nation, per-region subtotal, grand
    total — grouping_id disambiguates the NULL-filled rollup rows."""
    o, c, n, r = (
        table(spark, sf_dir, t) for t in ("orders", "customer", "nation", "region")
    )
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "agg_cube",
    oracle="""
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions: all 2² grouping sets."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT lang, source,
       GROUPING(lang, source) AS gid,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY GROUPING SETS ((lang), (source), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS, written as SQL text → exercises the ANTLR
    parser entry point; same Catalyst plan as the DataFrame build."""
    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT lang, source,
               grouping_id(lang, source) AS gid,
               COUNT(*) AS n_docs,
               SUM(n_chars) AS total_chars
        FROM documents
        GROUP BY lang, source GROUPING SETS ((lang), (source), ())
        """
    )


@query(
    "agg_incremental_merge",
    oracle="""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS day, l_returnflag,
         COUNT(*) AS n, SUM(CAST(l_quantity AS DECIMAL(30,6))) AS s_qty,
         SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS s_price
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag,
       CAST(SUM(n) AS BIGINT) AS n_items,
       CAST(SUM(s_qty) AS DOUBLE) AS sum_qty,
       ROUND(CAST(SUM(s_price) AS DOUBLE) / SUM(n), 6) AS avg_price
FROM daily GROUP BY l_returnflag
""",
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup from stored partials: stage 1 materializes
    per-(day, flag) partial states (count + decimal sums — the
    algebraic decomposition that makes avg mergeable), stage 2 merges
    partials into the final per-flag answer WITHOUT re-scanning raw
    rows. This is the nightly-rollup contract at 100 TB: day partials
    are computed once per ingest window and every wider rollup is a
    merge over ~10^3 tiny states. The oracle proves merge-of-partials
    equals a direct aggregate."""
    li = table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_shipdate").cast("date").alias("day"), "l_returnflag"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("s_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).alias("s_price"),
    )
    return daily.groupBy("l_returnflag").agg(
        F.sum("n").cast("bigint").alias("n_items"),
        F.sum("s_qty").cast("double").alias("sum_qty"),
        F.round(F.sum("s_price").cast("double") / F.sum("n"), 6).alias("avg_price"),
    )


@query(
    "agg_mode_per_group",
    oracle="""
WITH counts AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority,
         count(*) AS n,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
SELECT status, priority AS mode_priority, n FROM counts WHERE rn = 1
""",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value, ties broken by
    smallest value) — count + windowed top-1 rather than the engine's
    native mode(), whose tie behavior is engine-defined. Two shuffles:
    the count aggregation, then a window over the (tiny) per-group count
    table — the count table has |groups|x|values| rows, so the window
    stage is negligible at any scale."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("status").orderBy(F.desc("n"), F.asc("priority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("status", F.col("priority").alias("mode_priority"), "n")
    )
