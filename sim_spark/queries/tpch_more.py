"""TPC-H query shapes Q4-Q19 reshaped onto the fixture schema.

The fixtures lack ``partsupp``, comment/phone columns, and
``l_commitdate``/``l_receiptdate`` (FIXTURES.md), so Q4/Q9/Q16 are
reshaped onto available columns with the same operator skeleton
(EXISTS-semi, profit-by-nation-year, distinct-count-with-exclusions);
Q2/Q11/Q12/Q20/Q21/Q22 are reshaped the same way in tpch_complete.py,
completing all 22 TPC-H operator skeletons.

Scale notes per query are in each docstring; the common rules:
dimension sides broadcast, the single fact shuffle is on the join or
group key Catalyst already needs, and money sums go through
``exprs.dsum`` so the hash is partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.exprs import dsum, sql_dsum
from sim_spark.io import table
from sim_spark.registry import query


@query(
    "tpch_q4_priority",
    oracle="""
SELECT o.o_orderpriority AS priority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
ORDER BY priority
""",
)
def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (reshaped: no l_commitdate → 'late' means a lineitem
    shipped >60 days after the order date). Semi join keeps the agg input
    narrow: lineitem never widens the orders rows, it only filters them.
    At scale the orders date filter prunes before the shuffle."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    o_q = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = o_q.join(
        li,
        (li.l_orderkey == o_q.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("priority")
    )


@query(
    "tpch_q5_local_volume",
    oracle=f"""
SELECT n.n_name AS nation, {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""",
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue from 'local' supply chains (customer and supplier in
    the same ASIA nation). supplier/customer/nation/region all broadcast;
    lineitem⋈orders is the only shuffled join, and the same-nation
    predicate rides the supplier join as a residual."""
    c, o, li, s, n, r = (
        table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    asia_nations = (
        n.join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    o_y = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = (
        li.join(o_y, li.l_orderkey == o_y.o_orderkey)
        .join(F.broadcast(c), o_y.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(asia_nations), s.s_nationkey == F.col("n_nationkey"))
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


@query(
    "tpch_q6_forecast",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan-filter-aggregate; the whole query is one codegen
    stage with every predicate pushed to parquet (range + between) and a
    4-column ReadSchema. The canonical 'is pushdown working' probe."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1997-12-31 00:00:00'
)
SELECT o_year,
       ROUND({sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {sql_dsum('volume')}, 6) AS mkt_share
FROM vol GROUP BY o_year ORDER BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's share of ECONOMY-part volume sold into AMERICA.
    Every dimension broadcasts; the conditional share is two decimal sums
    over one grouped exchange on year (2 groups — AQE coalesces)."""
    li, p, o, c, s, n, r = (
        table(spark, sf_dir, t)
        for t in ("lineitem", "part", "orders", "customer", "supplier", "nation", "region")
    )
    am_nations = (
        n.join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")), n.n_regionkey == r.r_regionkey)
        .select(F.col("n_nationkey").alias("cust_nkey"))
    )
    supp_n = n.select(F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation"))
    j = (
        li.join(F.broadcast(p.filter(F.col("p_type") == "ECONOMY")), li.l_partkey == p.p_partkey)
        .join(
            o.filter(
                F.col("o_orderdate").between(
                    F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
                )
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(am_nations), c.c_nationkey == F.col("cust_nkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_n), s.s_nationkey == F.col("supp_nkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share_num = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(dsum(share_num) / dsum(vol), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "tpch_q9_profit",
    oracle=f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, o_year DESC
""",
)
def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (reshaped: no ps_supplycost → profit is discounted
    revenue) over red-named parts, by supplier nation and order year.
    The p_name LIKE filter broadcasts a pre-shrunk part side."""
    li, p, s, o, n = (
        table(spark, sf_dir, t) for t in ("lineitem", "part", "supplier", "orders", "nation")
    )
    j = (
        li.join(F.broadcast(p.filter(F.col("p_name").like("%red%"))), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q13_custdist",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of order counts per customer, including
    zero-order customers via the left outer join (COUNT of the right key
    ignores nulls). Two aggregations; the second input is tiny."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q14_promo",
    oracle=f"""
SELECT ROUND(100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}, 6) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
)
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: PROMO share of one month's revenue. part broadcasts; the
    month filter is pushed to the lineitem scan; global agg needs no
    grouped shuffle at all (partial-agg then single-row final)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    ).join(F.broadcast(p), li.l_partkey == p.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return j.agg(F.round(100.0 * dsum(promo) / dsum(rev), 6).alias("promo_revenue"))


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with max quarterly revenue. The CTE is computed
    once and reused for the scalar max via a rank-over-empty-partition
    rewrite — cheaper than a self-join against a recomputed aggregate,
    and the single-partition window sees only |suppliers| grouped rows."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    # r12: RANK()=1 over all suppliers is just "equal to the max" —
    # a 1-row broadcast aggregate + equality filter (exact decimal, so
    # tie semantics match the oracle's rank), no single-partition sort
    # of the supplier frame.
    mx = revenue.agg(F.max("total_revenue").alias("__maxrev"))
    top = revenue.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("__maxrev")
    )
    return (
        F.broadcast(top)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (reshaped: no partsupp → supplier variety per part
    config measured from lineitem). Distinct-count forces the expand;
    excluding predicates land on the broadcast part side pre-join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    p_f = p.filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        li.join(F.broadcast(p_f), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17_small_qty",
    oracle=f"""
SELECT ROUND({sql_dsum('l.l_extendedprice')} / 7.0, 6) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = p.p_partkey)
""",
)
def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from unusually-small-quantity orders of Brand#1
    parts. The correlated AVG is decorrelated by hand into a grouped
    aggregate joined back on partkey — one scan of lineitem for the
    thresholds, one for the probe, no per-row subquery."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    brand_parts = p.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    # Thresholds only for the brand's parts (semi-join pushdown): the
    # aggregate shrinks from all partkeys to the filtered dim's, and no
    # forced broadcast — at 100 TB the per-partkey aggregate is
    # part-table-sized, so AQE picks the strategy from observed sizes.
    thresholds = (
        li.join(F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"), "semi")
        .groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((0.5 * F.avg("l_quantity")).alias("half_avg_qty"))
    )
    j = (
        li.join(F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"))
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
    )
    return j.agg(F.round(dsum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))


@query(
    "tpch_q18_large_orders",
    oracle=f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
       o.o_totalprice, {sql_dsum('l.l_quantity')} AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers with orders totalling >300 units. The HAVING
    pre-aggregation is a semi join (big-orderkey set), so the wide
    customer⋈orders⋈lineitem join only materializes qualifying orders."""
    c, o, li = (table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o_big = o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
    j = li.join(F.broadcast(o_big), li.l_orderkey == o_big.o_orderkey).join(
        F.broadcast(c), F.col("o_custkey") == c.c_custkey
    )
    from sim_spark.exprs import ts_str

    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            ts_str("o_orderdate").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19_disjunctive",
    oracle=f"""
SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 40)
""",
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: disjunctive brand/size/quantity predicates. Expressed as one
    equi-join on partkey with the OR-of-ANDs as a residual condition —
    Catalyst keeps the hash join and evaluates the disjunction post-probe
    (the naive reading, three unioned joins, would scan lineitem 3×)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    j = li.join(F.broadcast(p), (li.l_partkey == p.p_partkey) & cond)
    return j.agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
