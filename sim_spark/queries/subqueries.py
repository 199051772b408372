"""Subquery operators (SURVEY.md §4.2: Catalyst decorrelation surface).

All four go through spark.sql() (EP3): scalar subqueries, IN subqueries,
correlated EXISTS, and LATERAL — the rewrites
(RewriteCorrelatedScalarSubquery, exists→semi-join, lateral→join) are
Catalyst's job; we write the declarative form and the plan audits keep
them honest (no per-row re-execution of subqueries anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sim_spark.io import register_views
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
