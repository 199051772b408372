"""Join operators (SURVEY.md §2.3).

Scale rules baked in here:
- dimension tables (region/nation/part/supplier/customer-at-sf) are
  broadcast — no shuffle of the fact side;
- fact-fact joins (lineitem ⋈ orders) shuffle on the join key and AQE
  handles skew;
- the theta/band join keeps an equality component (p_brand) so Catalyst
  plans a hash join with a residual predicate, never a nested-loop.

As-of and interval joins live in sim_spark/ops/ (M3) — they need custom
composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.exprs import dsum, sql_dsum
from sim_spark.io import table
from sim_spark.registry import query


@query(
    "join_inner_broadcast",
    oracle="""
SELECT p.p_brand AS brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim with an explicit broadcast hint: the lineitem side
    never shuffles; part is replicated to every executor."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


@query(
    "join_inner_shuffle",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 100000
""",
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact: both sides shuffle on the order key (sort-merge or
    shuffled-hash, Catalyst/AQE's call). The o_totalprice filter is pushed
    below the join so the shuffled volume is already reduced."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus"
    )


@query(
    "join_multiway_star",
    oracle=f"""
SELECT n.n_name AS nation,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join. Dimensions broadcast (customer is
    the largest at 1.5k/15k rows — still tiny next to the fact table), so
    the only shuffle in the whole plan is the final groupBy(n_name)."""
    li, o, c, n, r = (
        table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer", "nation", "region")
    )
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    r = r.filter(F.col("r_name").isin("ASIA", "EUROPE"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "join_left_outer",
    oracle="""
SELECT o.o_orderkey, COUNT(l.l_orderkey) AS n_items,
       CAST(SUM(CAST(COALESCE(l.l_quantity, 0) AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⟕ lineitem: 257 orders at sf0.01 have no lineitems; COUNT of
    the null-extended key must report 0 for them."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            dsum(F.coalesce(F.col("l_quantity"), F.lit(0.0))).alias("sum_qty"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
FROM lineitem l RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⟖ orders, grouped per priority with the unmatched count."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "right")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).alias(
                "n_unmatched"
            ),
        )
    )


@query(
    "join_full_outer",
    oracle="""
WITH ev AS (
  SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY user_id
)
SELECT COALESCE(c.c_custkey, ev.user_id) AS key,
       CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS is_customer,
       COALESCE(ev.n_events, 0) AS n_events,
       COALESCE(ev.sum_value, 0.0) AS sum_value
FROM customer c FULL OUTER JOIN ev ON c.c_custkey = ev.user_id
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⟗ per-user event aggregate: customers without events AND
    (if any) event users that aren't customers both survive."""
    c = table(spark, sf_dir, "customer")
    ev = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )
    j = c.join(ev, c.c_custkey == ev.user_id, "full")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.col("user_id")).alias("key"),
        F.when(F.col("c_custkey").isNull(), 0).otherwise(1).alias("is_customer"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: output columns come only from the left,
    each customer emitted at most once regardless of match count."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (complement of join_semi — together
    they partition customer)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross_limited",
    oracle="""
SELECT r.r_name, n.n_name,
       CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_home
FROM region r CROSS JOIN nation n
""",
)
def join_cross_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cartesian product (5 × 25): the one place a cross join is
    legitimate — both sides are constant-size dimension tables."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1)
        .otherwise(0)
        .alias("is_home"),
    )


@query(
    "join_theta_band",
    oracle="""
SELECT a.p_partkey AS k1, b.p_partkey AS k2, a.p_brand AS brand,
       ROUND(ABS(a.p_retailprice - b.p_retailprice), 6) AS price_gap
FROM part a JOIN part b
  ON a.p_brand = b.p_brand
 AND a.p_partkey < b.p_partkey
 AND ABS(a.p_retailprice - b.p_retailprice) < 10.0
""",
)
def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (theta) self-join: same brand, retail prices within 10.

    Through round 7 this joined on p_brand alone with the band as a
    residual — a hash join, but with FIXED brand cardinality (25) the
    within-brand candidate count grows n²/25. The r8 sf1 scale rehearsal
    measured it: 138× wall at 10× rows (BENCH_r08_sf1.jsonl), the only
    super-linear key in the suite. Fix: bucket the price axis (exact
    deci-unit integers, width = the band) into the JOIN KEY — the b-side
    keys on its bucket, the a-side explodes to the three covering
    buckets, and the original predicate refines the superset. Candidates
    drop from all-within-brand to within-(brand, ±1 bucket) — the
    candidate:output ratio falls ~50:1 → ~3:1. The OUTPUT is still
    intrinsically quadratic on this fixture (fixed 1000-value price
    domain ⇒ a constant fraction of within-brand pairs qualifies); at
    real scale the price domain grows with the catalog and the bucket
    join is exactly the right plan."""
    p = table(spark, sf_dir, "part")
    # prices have one decimal (900.0..999.9): deci-units are exact ints
    deci = F.floor(F.col("p_retailprice") * 10 + F.lit(0.5))
    width = F.lit(100)  # 10.0 price units in deci-units
    a = p.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_brand").alias("a_brand"),
        F.col("p_retailprice").alias("a_price"),
        F.explode(
            F.sequence(
                F.floor((deci - 100) / width).cast("long"),
                F.floor((deci + 100) / width).cast("long"),
            )
        ).alias("bucket"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_brand").alias("b_brand"),
        F.col("p_retailprice").alias("b_price"),
        F.floor(deci / width).cast("long").alias("bucket"),
    )
    # The probe side is a SMALL file (few input splits) but the join
    # EXPANDS ~250x — without this, a broadcast join inherits the scan's
    # 2-split parallelism and 2 tasks produce the entire output (measured
    # at sf1: 151M rows through 2 tasks). Explicit numPartitions makes it
    # a REPARTITION_BY_NUM shuffle AQE won't coalesce away.
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    a = a.repartition(n_shuffle, "a_brand", "bucket")
    gap = F.abs(F.col("a_price") - F.col("b_price"))
    return (
        a.join(
            b,
            (F.col("a_brand") == F.col("b_brand"))
            & (a["bucket"] == b["bucket"])
            & (F.col("a_key") < F.col("b_key"))
            & (gap < 10.0),
        )
        .select(
            F.col("a_key").alias("k1"),
            F.col("b_key").alias("k2"),
            F.col("a_brand").alias("brand"),
            F.round(gap, 6).alias("price_gap"),
        )
    )
