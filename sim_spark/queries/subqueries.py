"""Subquery operators (SURVEY.md §4.2: Catalyst decorrelation surface).

All four go through spark.sql() (EP3): scalar subqueries, IN subqueries,
correlated EXISTS, and LATERAL — the rewrites
(RewriteCorrelatedScalarSubquery, exists→semi-join, lateral→join) are
Catalyst's job; we write the declarative form and the plan audits keep
them honest (no per-row re-execution of subqueries anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import register_views, table
from sim_spark.registry import query


@query(
    "subq_scalar_agg",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders i
                          WHERE i.o_orderstatus = o.o_orderstatus)
""",
)
def subq_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders above 2× their status's mean.
    Catalyst decorrelates to an aggregate + join — one pass, not one
    subquery per row. (A float threshold comparison, not a projected
    float — reduction-order noise of ~1e-10 cannot flip a strict 2×
    comparison on these magnitudes.)"""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT AVG(i.o_totalprice) FROM orders i
                                  WHERE i.o_orderstatus = o.o_orderstatus)
        """
    )


@query(
    "subq_in_list",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                            WHERE r_name = 'ASIA'))
""",
)
def subq_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested uncorrelated IN subqueries → chained semi-joins."""
    register_views(spark, sf_dir, ["customer", "nation", "region"])
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                                    WHERE r_name = 'ASIA'))
        """
    )


@query(
    "subq_exists_not_exists",
    oracle="""
SELECT p.p_partkey, p.p_brand
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_discount > 0.08)
""",
)
def subq_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS ∧ NOT EXISTS on the same table with different predicates →
    a semi-join and an anti-join stacked on part."""
    register_views(spark, sf_dir, ["part", "lineitem"])
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_brand
        FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
          AND NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey AND l.l_discount > 0.08)
        """
    )


@query(
    "subq_lateral_topn",
    oracle="""
SELECT n.n_name AS nation, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
) t
""",
)
def subq_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 customers by balance per nation
    (deterministic tie-break). The classic per-group-limit written as the
    SQL standard's lateral join."""
    register_views(spark, sf_dir, ["nation", "customer"])
    return spark.sql(
        """
        SELECT n.n_name AS nation, t.c_custkey, t.c_acctbal
        FROM nation n JOIN LATERAL (
          SELECT c_custkey, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
        ) t
        """
    )


@query(
    "subq_correlated_scalar",
    oracle="""
SELECT o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS totalprice,
       (SELECT strftime(MAX(l_shipdate), '%Y-%m-%d') FROM lineitem
        WHERE l_orderkey = o_orderkey) AS last_ship,
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 40) AS n_bulk_lines
FROM orders WHERE o_orderkey % 100 = 0
""",
)
def subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row correlated scalar subqueries (two of them, one nullable):
    each order's latest lineitem ship date and its count of bulk lines.
    Catalyst decorrelates both into left-outer aggregate joins — the
    plan a hand-written rewrite would build — so the subquery form
    costs nothing at scale; COUNT(*) on an empty group must surface as
    0, not NULL (the classic decorrelation bug, pinned here)."""
    from sim_spark.io import register_views

    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS totalprice,
               (SELECT date_format(MAX(l_shipdate), 'yyyy-MM-dd') FROM lineitem
                WHERE l_orderkey = o_orderkey) AS last_ship,
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_quantity > 40) AS n_bulk_lines
        FROM orders WHERE o_orderkey % 100 = 0
        """
    )


@query(
    "dq_referential_orphans",
    oracle="""
SELECT 'lineitem->orders' AS fk, count(*) AS n_orphans
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem->part', count(*)
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'orders->customer', count(*)
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer->nation', count(*)
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
UNION ALL
SELECT 'supplier->nation', count(*)
FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
UNION ALL
SELECT 'nation->region', count(*)
FROM nation n WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)
""",
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every declared FK
    edge, as one unioned report — the data-quality gate run before any
    pipeline promotes a snapshot. Each leg is a LEFT ANTI join; the dim
    sides broadcast (or AQE decides at real scale), the fact side
    streams — never a full shuffle of both sides just to count misses."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")

    def leg(name, fact, dim, fk, pk):
        return (
            fact.join(dim, fact[fk] == dim[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )

    return (
        leg("lineitem->orders", li, o, "l_orderkey", "o_orderkey")
        .unionAll(leg("lineitem->part", li, table(spark, sf_dir, "part"), "l_partkey", "p_partkey"))
        .unionAll(leg("orders->customer", o, c, "o_custkey", "c_custkey"))
        .unionAll(leg("customer->nation", c, n, "c_nationkey", "n_nationkey"))
        .unionAll(leg("supplier->nation", s, n, "s_nationkey", "n_nationkey"))
        .unionAll(leg("nation->region", n, r, "n_regionkey", "r_regionkey"))
    )


@query(
    "subq_not_in_null_aware",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NULLIF(c_custkey % 9973, 5) NOT IN
      (SELECT o_custkey % 9973 FROM orders
       WHERE o_orderstatus = 'F' AND o_totalprice > 480000)
""",
)
def subq_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULLABLE probe column — SQL's three-valued-logic
    trap. A NULL probe (here customers with c_custkey % 9973 = 5, via
    NULLIF) compares UNKNOWN against any list and must be dropped, and
    the planner cannot prove the subquery side non-null either, so
    Catalyst plans its null-aware anti join instead of a plain anti —
    the semantics a naive LEFT ANTI join gets wrong. The subquery is
    restricted (high-value F orders) so the mod-9973 residue list is a
    strict subset at every fixture scale and the result is non-degenerate."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE NULLIF(c_custkey % 9973, 5) NOT IN
              (SELECT o_custkey % 9973 FROM orders
               WHERE o_orderstatus = 'F' AND o_totalprice > 480000)
        """
    )


@query(
    "dq_constraint_suite",
    oracle="""
WITH checks AS (
  SELECT 'orders_pk_unique' AS check_name, 'orders' AS tbl,
         CAST((SELECT count(*) FROM
                (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
              AS BIGINT) AS n_violations
  UNION ALL
  SELECT 'lineitem_flag_domain', 'lineitem',
         CAST((SELECT count(*) FROM lineitem
               WHERE l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT)
  UNION ALL
  SELECT 'orders_cust_fk', 'orders',
         CAST((SELECT count(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
  UNION ALL
  SELECT 'lineitem_qty_range', 'lineitem',
         CAST((SELECT count(*) FROM lineitem
               WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
  UNION ALL
  SELECT 'events_ts_not_null', 'events',
         CAST((SELECT count(*) FROM events WHERE ts IS NULL) AS BIGINT)
  UNION ALL
  SELECT 'documents_lang_domain', 'documents',
         CAST((SELECT count(*) FROM documents
               WHERE lang NOT IN (SELECT DISTINCT lang FROM documents)) AS BIGINT)
)
SELECT check_name, tbl, n_violations, n_violations = 0 AS passed
FROM checks ORDER BY check_name
""",
)
def dq_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A dbt-tests-style constraint suite in ONE query: primary-key
    uniqueness, enum domain membership, foreign-key integrity (null-
    aware NOT EXISTS → anti join), numeric range, and not-null — each
    check one aggregate leg, unioned into a (check, table, violations,
    passed) report. Every leg is a count the optimizer can push
    predicates into; at 100 TB the legs share nothing and parallelize
    as independent stages — the nightly data-contract gate."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")
    docs = table(spark, sf_dir, "documents")
    cust = table(spark, sf_dir, "customer")

    def check(name: str, tbl: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"),
            F.lit(tbl).alias("tbl"),
            F.col("n").cast("long").alias("n_violations"),
            (F.col("n") == 0).alias("passed"),
        )

    dup_pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    flag_dom = li.filter(~F.col("l_returnflag").isin("A", "N", "R")).agg(
        F.count(F.lit(1)).alias("n")
    )
    fk = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("n"))
    qty = li.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).agg(
        F.count(F.lit(1)).alias("n")
    )
    ts_null = ev.filter(F.col("ts").isNull()).agg(F.count(F.lit(1)).alias("n"))
    lang_dom = docs.join(
        docs.select("lang").distinct(), "lang", "left_anti"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        check("orders_pk_unique", "orders", dup_pk)
        .unionAll(check("lineitem_flag_domain", "lineitem", flag_dom))
        .unionAll(check("orders_cust_fk", "orders", fk))
        .unionAll(check("lineitem_qty_range", "lineitem", qty))
        .unionAll(check("events_ts_not_null", "events", ts_null))
        .unionAll(check("documents_lang_domain", "documents", lang_dom))
        .orderBy("check_name")
    )
