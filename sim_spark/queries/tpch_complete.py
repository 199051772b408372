"""TPC-H Q2/Q11/Q12/Q20/Q21/Q22 reshaped onto the fixture schema.

These six were the remaining gaps in the TPC-H 22 (tpch_shapes.py covers
Q3/Q7/Q10, tpch_more.py Q4-Q19, aggregations.py Q1). The fixtures have no
``partsupp`` table and no ``l_commitdate``/``l_receiptdate``/``l_shipmode``/
phone columns (FIXTURES.md), so each query keeps its defining operator
skeleton but rebinds the missing inputs:

- Q2: the part-supplier "offer" relation is derived from lineitem (each
  sale is an offer at ``l_extendedprice``); min-cost is a correlated MIN
  over the region-restricted offers — the raw double column compares
  bit-identically in both engines, so no float arithmetic is introduced.
- Q11: "stock value" per part = revenue by ASIA suppliers; the HAVING
  threshold is a scalar subquery over the per-part decimal sums.
- Q12: "late" = shipped >60 days after the order date (the tpch_more Q4
  convention); ship-mode buckets become l_returnflag groups.
- Q20: "availqty" per (supplier, part) = decimal-summed quantity sold;
  excess = more than half of the part's total, nested-IN skeleton intact.
- Q21: multi-EXISTS self-joins on lineitem, late as in Q12.
- Q22: "idle" customers = none of their orders fall in the last two years
  of the order range (a strict no-orders anti-join is empty at small SF —
  measured), country-code buckets become nations, acctbal cutoff stays a
  scalar AVG subquery.

Scale notes: every dimension side (part, supplier, nation, region,
customer) broadcasts; the only shuffles are lineitem-keyed (partkey /
orderkey / suppkey) and each feeds a partial+final aggregate. The Q21
self-joins co-shuffle lineitem on l_orderkey once per branch — at 100 TB
that is 3 scans of the fact but zero cartesians, and AQE can reuse the
exchange. Money/quantity sums go through ``exprs.dsum`` so hashes are
partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sim_spark.exprs import dsum, sql_davg, sql_dsum
from sim_spark.io import table
from sim_spark.registry import query


def _europe_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH eo AS (
  SELECT l.l_partkey AS partkey, s.s_name, s.s_acctbal, n.n_name AS nation,
         l.l_extendedprice AS price
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT DISTINCT p.p_partkey AS partkey, p.p_name AS part_name,
       eo.s_name AS supp_name, eo.nation, eo.s_acctbal AS acctbal,
       eo.price AS min_price
FROM part p JOIN eo ON eo.partkey = p.p_partkey
WHERE p.p_type = 'STANDARD' AND p.p_size < 25
  AND eo.price = (SELECT MIN(e2.price) FROM eo e2 WHERE e2.partkey = p.p_partkey)
ORDER BY partkey, supp_name
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 skeleton: correlated-MIN offer selection over a region-restricted
    part-supplier relation, reshaped onto lineitem sales as the offers.

    The correlated scalar MIN decorrelates into a window MIN over partkey —
    one shuffle on l_partkey, dimension sides broadcast. The min-price
    equality compares the raw double column against its own MIN (no
    arithmetic), so both engines agree bitwise."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 25)
    )
    li = table(spark, sf_dir, "lineitem")
    eo = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(_europe_suppliers(spark, sf_dir)), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(p.select("p_partkey", "p_name")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    w = W.partitionBy("p_partkey")
    return (
        eo.withColumn("mn", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("mn"))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supp_name"),
            "nation",
            F.col("s_acctbal").alias("acctbal"),
            F.col("l_extendedprice").alias("min_price"),
        )
        .distinct()
        .orderBy("partkey", "supp_name")
    )


@query(
    "tpch_q11_important_parts",
    oracle=f"""
WITH val AS (
  SELECT l.l_partkey AS partkey,
         {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
  GROUP BY 1
)
SELECT partkey, value
FROM val
WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) * 0.001
               FROM val)
ORDER BY value DESC, partkey
""",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 skeleton: per-part value with a global-fraction HAVING via a
    scalar subquery, "stock value" rebound to ASIA-supplier revenue.

    The per-part decimal sums are exact, so re-summing them for the global
    threshold is also exact — both engines derive the identical DOUBLE
    cutoff. The scalar total joins back as a broadcast (1 row), so the
    only fact shuffle is the groupBy on l_partkey."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(asia), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = val.agg(
        (F.sum(F.col("value").cast("decimal(30,6)")).cast("double") * F.lit(0.001)).alias(
            "cutoff"
        )
    )
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value") > F.col("cutoff"))
        .select("partkey", "value")
        .orderBy(F.desc("value"), "partkey")
    )


@query(
    "tpch_q12_priority_split",
    oracle="""
SELECT l.l_returnflag AS flag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1 ORDER BY 1
""",
)
def tpch_q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 skeleton: conditional priority-split counts over late lines,
    ship modes rebound to l_returnflag and lateness to the >60-day rule.

    One orderkey shuffle join, integer CASE sums — partial aggregation
    collapses the per-flag counts map-side before the 3-row final."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    li_y = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li_y.join(o, li_y.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("flag")
    )


@query(
    "tpch_q20_excess_suppliers",
    oracle=f"""
WITH sp AS (
  SELECT l.l_suppkey AS suppkey, l.l_partkey AS partkey,
         {sql_dsum('l.l_quantity')} AS qty
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY 1, 2
),
tot AS (
  SELECT partkey, CAST(SUM(CAST(qty AS DECIMAL(30,6))) AS DOUBLE) AS total_qty
  FROM sp GROUP BY 1
)
SELECT s.s_name AS supp_name, n.n_name AS nation
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT sp.suppkey FROM sp JOIN tot ON sp.partkey = tot.partkey
  WHERE sp.qty > 0.5 * tot.total_qty
)
ORDER BY supp_name
""",
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 skeleton: nested-IN supplier selection where a supplier holds an
    "excess" share (>half) of a promo part's volume, availqty rebound to
    decimal-summed quantity sold.

    The part filter is a broadcast semi-join before the fact shuffle; the
    share test joins two aggregates of the SAME shuffle key (l_partkey),
    so AQE reuses the exchange. Final supplier semi-join is broadcast."""
    li = table(spark, sf_dir, "lineitem")
    promo = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    sp = (
        li.join(F.broadcast(promo), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy(
            F.col("l_suppkey").alias("suppkey"), F.col("l_partkey").alias("partkey")
        )
        .agg(dsum("l_quantity").alias("qty"))
    )
    tot = sp.groupBy("partkey").agg(
        F.sum(F.col("qty").cast("decimal(30,6)")).cast("double").alias("total_qty")
    )
    excess = (
        sp.join(tot, "partkey")
        .filter(F.col("qty") > F.lit(0.5) * F.col("total_qty"))
        .select("suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(excess), s.s_suppkey == F.col("suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("s_name").alias("supp_name"), F.col("n_name").alias("nation"))
        .orderBy("supp_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
SELECT s.s_name AS supp_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders o   ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1 ORDER BY numwait DESC, supp_name
""",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 skeleton: suppliers who were the ONLY late supplier on a
    multi-supplier finished order — EXISTS + NOT EXISTS self-joins on
    lineitem, lateness as the >60-day rule.

    Both correlated branches become semi/anti joins keyed on l_orderkey,
    the same shuffle key as the orders join — three co-partitioned passes
    over the fact, no cartesian, supplier broadcast at the end."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")

    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    l1 = l1.join(
        other,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    late_all = (
        li.join(table(spark, sf_dir, "orders"), li.l_orderkey == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select(
            F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
        )
    )
    l1 = l1.join(
        late_all,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        l1.join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "supp_name")
    )


@query(
    "tpch_q22_idle_customers",
    oracle=f"""
WITH cutoff AS (
  SELECT {sql_davg('c_acctbal')} AS a FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS numcust,
       {sql_dsum('c.c_acctbal')} AS totacctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
  AND c.c_acctbal > (SELECT a FROM cutoff)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-07-01 00:00:00')
GROUP BY 1 ORDER BY 1
""",
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 skeleton: above-average-balance customers with no recent orders,
    grouped by nation — country codes rebound to nations, "no orders at
    all" relaxed to "no orders in the last 2 years of the date range"
    (the strict form is empty at sf≤0.01, measured).

    The AVG cutoff is a 1-row broadcast; the anti-join prunes orders with
    the date filter BEFORE shuffling on o_custkey; nation broadcasts.
    davg's 6-dp rounding makes the cutoff identical in both engines."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    from sim_spark.exprs import davg

    cutoff = c.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal").alias("a"))
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("1999-07-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.filter(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY"))
        .join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, c.c_custkey == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("nation")
    )
