"""Sort / limit / top-k (§2.6) and set operations (§2.7).

Top-k uses orderBy().limit(k) which Catalyst plans as
TakeOrderedAndProject: each partition keeps a k-row heap, the driver
merges k·p rows — no global sort, scale-safe. Global sorts only appear
where the sorted keys themselves are the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query


@query(
    "sort_multi_nulls",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       o_totalprice
FROM orders
ORDER BY o_orderpriority ASC,
         NULLIF(o_orderstatus, 'P') ASC NULLS FIRST,
         o_totalprice DESC
""",
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS FIRST over an injected nullable
    key. The value-hash is order-insensitive, so the sort keys are
    projected — correctness shows up in the row *values*; the ordering
    itself is asserted in tests/test_plans.py."""
    o = table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            status_or_null.alias("status_or_null"),
            "o_totalprice",
        )
        .orderBy(
            F.asc("o_orderpriority"),
            F.asc_nulls_first("status_or_null"),
            F.desc("o_totalprice"),
        )
    )


@query(
    "limit_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 10
""",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 with a total-order tie-break (§2.12.4) →
    TakeOrderedAndProject, never a full sort."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(10)
    )


def _segment_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("custkey"))
    )


def _urgent_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )


_SET_A = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"
_SET_B = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


@query("set_union_all", oracle=f"{_SET_A} UNION ALL {_SET_B}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — duplicates preserved; a zero-shuffle concatenation."""
    return _segment_custs(spark, sf_dir).unionAll(_urgent_custs(spark, sf_dir))


@query("set_union_distinct", oracle=f"{_SET_A} UNION {_SET_B}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — one hash-distinct shuffle on top of the concat."""
    return _segment_custs(spark, sf_dir).union(_urgent_custs(spark, sf_dir)).distinct()


@query("set_intersect", oracle=f"{_SET_A} INTERSECT {_SET_B}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics, plans as a left-semi)."""
    return _segment_custs(spark, sf_dir).intersect(_urgent_custs(spark, sf_dir))


@query("set_except", oracle=f"{_SET_A} EXCEPT {_SET_B}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (distinct semantics, plans as a left-anti).

    Note ``subtract`` (≡ EXCEPT DISTINCT), not ``exceptAll().distinct()``
    — the latter keeps a value present on both sides if the left has more
    copies, which is bag semantics, not EXCEPT.
    """
    return _segment_custs(spark, sf_dir).subtract(_urgent_custs(spark, sf_dir))


@query(
    "set_union_by_name",
    oracle="""
SELECT o_orderkey AS k, o_totalprice AS amount, 'order' AS src FROM orders
WHERE o_totalprice > 400000
UNION ALL
SELECT l_orderkey AS k, l_extendedprice AS amount, 'line' AS src FROM lineitem
WHERE l_extendedprice > 90000
""",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema alignment by column NAME, not position — the
    two inputs deliberately project their columns in different orders,
    which positional unionAll would silently scramble (k would land in
    amount). The guard every multi-source ingest union needs."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    a = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("amount"),
        F.lit("order").alias("src"),
    )
    b = li.filter(F.col("l_extendedprice") > 90000).select(
        F.lit("line").alias("src"),
        F.col("l_extendedprice").alias("amount"),
        F.col("l_orderkey").alias("k"),
    )
    return a.unionByName(b)


@query(
    "set_except_intersect_all",
    oracle="""
WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'),
b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'),
ex AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
SELECT 'except_all' AS op, k, COUNT(*) AS n FROM ex GROUP BY k
UNION ALL
SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM ia GROUP BY k
""",
)
def set_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — EXCEPT ALL keeps max(n_a - n_b, 0)
    copies per value, INTERSECT ALL min(n_a, n_b) — the semantics that
    preserve multiplicity for reconciliation workloads (row-count
    deltas between two loads). Spark plans both as a single aggregate
    computing per-value counts on each side, no join; output is grouped
    (value, copies) so the multiset is hash-comparable."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    ex = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    return ex.unionAll(ia)
