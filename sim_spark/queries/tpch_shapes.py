"""Additional TPC-H-shaped analytics queries (reshaped onto the fixture
schema — FIXTURES.md notes the missing columns) plus an ORC roundtrip.

These widen the multi-join + agg + top-k surface: Q3 (shipping
priority), Q7 (nation-pair volume via supplier/customer nations), Q10
(returned-item revenue ranking).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.exprs import dsum, sql_dsum, ts_str
from sim_spark.io import table
from sim_spark.registry import query
from sim_spark.scratch import scratch_dir, sf_tag as scratch_sf_tag


@query(
    "tpch_q3_shipping",
    oracle=f"""
SELECT l.l_orderkey,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
       o.o_orderpriority AS priority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
""",
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: unshipped BUILDING-segment revenue, top 10 orders.
    customer broadcasts; the one shuffle is lineitem⋈orders + the final
    group; top-10 via TakeOrderedAndProject."""
    c, o, li = (table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    cut = F.lit("1998-03-15").cast("timestamp")
    j = (
        li.filter(F.col("l_shipdate") > cut)
        .join(o.filter(F.col("o_orderdate") < cut), li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            o.o_custkey == c.c_custkey,
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            ts_str("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q7_volume",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS volume
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name < cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
""",
)
def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipped volume between distinct (supplier-nation,
    customer-nation) pairs per year. Both nation lookups broadcast with
    distinct aliases."""
    li, s, o, c, n = (
        table(spark, sf_dir, t)
        for t in ("lineitem", "supplier", "orders", "customer", "nation")
    )
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(dsum(volume).alias("volume"))
    )


@query(
    "tpch_q10_returns",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
""",
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returned items per customer, top 20."""
    c, o, li, n = (
        table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem", "nation")
    )
    j = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query("scan_orc_roundtrip", oracle="SELECT * FROM supplier")
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → ORC → read back (Spark's second first-class columnar
    format; DuckDB can't read ORC, so the oracle is the source table).
    Lazy read-back from a per-process scratch dir — no driver-side
    materialization."""
    sf_tag = scratch_sf_tag(sf_dir)
    out = scratch_dir(f"orc_supplier_{sf_tag}")
    table(spark, sf_dir, "supplier").write.mode("overwrite").orc(out)
    return spark.read.orc(out)
