"""Pivot / unpivot (SURVEY.md §2.4 adjacents).

Pivot = groupBy().pivot().agg() with an EXPLICIT value list — never the
value-discovering variant, which runs an extra distinct job and breaks
at high cardinality. Unpivot = the built-in melt (wide→long), a pure
map-side expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query


@query(
    "agg_pivot_status",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(30,6)) END) AS DOUBLE) AS qty_F,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(30,6)) END) AS DOUBLE) AS qty_O,
       CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_F,
       CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_O
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns (explicit value list ['F','O']);
    oracle is the equivalent conditional aggregation."""
    li = table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return p.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_F"),
        F.col("O_qty").alias("qty_O"),
        F.coalesce("F_n", F.lit(0)).alias("n_F"),
        F.coalesce("O_n", F.lit(0)).alias("n_O"),
    )


@query(
    "unpivot_metrics",
    oracle="""
SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
UNION ALL
SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS val FROM orders
""",
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) two order measures into (key, metric, val) long
    form — map-side only, no shuffle."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot("o_orderkey", ["totalprice", "custkey"], "metric", "val")
