"""Statistical aggregates: correlation, covariance, linear regression
(§2.4 adjacents) and array set operations (§2.8 adjacent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query


@query(
    "agg_correlation",
    oracle="""
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       ROUND(covar_pop(l_discount, l_tax), 6) AS disc_tax_covar
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample/population covariance per group —
    single-pass co-moment aggregation (partial+final like any agg)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.covar_pop("l_discount", "l_tax"), 6).alias("disc_tax_covar"),
    )


@query(
    "fn_regression",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(regr_count(o_totalprice, o_custkey) AS BIGINT) AS n,
       ROUND(regr_slope(o_totalprice, o_custkey), 6) AS slope,
       ROUND(regr_intercept(o_totalprice, o_custkey), 4) AS intercept,
       ROUND(regr_r2(o_totalprice, o_custkey), 6) AS r2,
       ROUND(regr_avgx(o_totalprice, o_custkey), 6) AS avg_x,
       ROUND(regr_avgy(o_totalprice, o_custkey), 4) AS avg_y
FROM orders GROUP BY o_orderstatus
""",
)
def fn_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression aggregates (y = o_totalprice on x = o_custkey —
    slope ≈ 0, the point is the operator family, computed identically in
    both engines)."""
    o = table(spark, sf_dir, "orders")
    y, x = F.col("o_totalprice"), F.col("o_custkey")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )


@query(
    "fn_array_setops",
    oracle="""
WITH w AS (
  SELECT doc_id,
         list_distinct(str_split(text, ' ')) AS vocab,
         list_distinct([x FOR x IN str_split(text, ' ') IF length(x) > 4]) AS long_words
  FROM documents
)
SELECT doc_id,
       array_to_string(list_sort(list_filter(vocab, x -> list_contains(long_words, x))), ',')
         AS inter_sorted,
       array_to_string(list_sort(list_filter(vocab, x -> NOT list_contains(long_words, x))), ',')
         AS except_sorted,
       len(vocab) AS n_vocab,
       len(long_words) AS n_long
FROM w
""",
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect / array_except / size over per-document vocab sets
    (sorted + joined so the hash is representation-independent)."""
    d = table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("vocab")
    ).withColumn("long_words", F.filter("vocab", lambda x: F.length(x) > 4))
    return w.select(
        "doc_id",
        F.array_join(F.sort_array(F.array_intersect("vocab", "long_words")), ",").alias(
            "inter_sorted"
        ),
        F.array_join(F.sort_array(F.array_except("vocab", "long_words")), ",").alias(
            "except_sorted"
        ),
        F.size("vocab").cast("bigint").alias("n_vocab"),
        F.size("long_words").cast("bigint").alias("n_long"),
    )
