"""Data-profiling operators: exact/approximate percentiles and a
per-column profile summary — the first queries anyone runs against an
unknown 100 TB table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query


@query(
    "agg_percentiles_exact",
    oracle="""
SELECT o_orderstatus AS status,
       ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 6) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.90), 6) AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99
FROM orders GROUP BY o_orderstatus
""",
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark
    `percentile` ≡ DuckDB `quantile_cont`). Exact percentiles need a full
    sort per group — fine for bounded groups; the unbounded-cardinality
    path is the approx variant below."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        *[
            F.round(F.percentile("o_totalprice", F.lit(q)), 6).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.50, 0.90, 0.99)
        ]
    )


@query("agg_approx_quantiles")  # rows-only: sketch values are engine-specific
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via percentile_approx (Greenwald-Khanna
    style sketch, mergeable across partitions — the 100 TB percentile
    path: fixed-size state, no global sort). Error bound vs the exact
    variant is pinned in tests/test_invariants.py."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        *[
            F.percentile_approx("o_totalprice", F.lit(q), F.lit(10000)).alias(
                f"ap{int(q * 100)}"
            )
            for q in (0.25, 0.50, 0.90, 0.99)
        ]
    )


_PROFILE_COLS = [
    ("l_quantity", "l_quantity"),
    ("l_extendedprice", "l_extendedprice"),
    ("l_discount", "l_discount"),
    ("l_tax", "l_tax"),
]


@query(
    "profile_summary",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col, COUNT({c}) AS n_nonnull,
       COUNT(DISTINCT {c}) AS n_distinct,
       ROUND(MIN({c}), 6) AS min_v, ROUND(MAX({c}), 6) AS max_v,
       ROUND(CAST(SUM(CAST({c} AS DECIMAL(30,6))) AS DOUBLE) / COUNT({c}), 6) AS mean_v
FROM lineitem"""
        for c, _ in _PROFILE_COLS
    ),
)
def profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile summary (count/distinct/min/max/mean per numeric
    lineitem column) — one scan per column here for oracle clarity; at
    scale the same aggregates fuse into a single scan (Spark computes
    all N columns' aggs in one pass if asked in one agg())."""
    li = table(spark, sf_dir, "lineitem")
    parts = [
        li.agg(
            F.lit(c).alias("col"),
            F.count(c).alias("n_nonnull"),
            F.countDistinct(c).alias("n_distinct"),
            F.round(F.min(c), 6).alias("min_v"),
            F.round(F.max(c), 6).alias("max_v"),
            F.round(
                F.sum(F.col(c).cast("decimal(30,6)")).cast("double") / F.count(c), 6
            ).alias("mean_v"),
        )
        for c, _ in _PROFILE_COLS
    ]
    return reduce(DataFrame.unionAll, parts)
