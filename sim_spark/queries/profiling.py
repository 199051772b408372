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


@query(
    "profile_observe_metrics",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey
FROM lineitem
""",
)
def profile_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``Observation`` (`df.observe`): data-
    quality counters collected as ACCUMULATOR side-output of a pass the
    job runs anyway — at 100 TB this is the difference between free
    metrics and a second full scan. The observed pass here is a count()
    over the instrumented frame; the metrics row the observation yields
    is the query result (driver-side by design — it is one row of
    counters, the same place a StreamingQueryProgress would surface it).
    The oracle recomputes the counters as plain aggregates, so a metric
    wired to the wrong expression breaks the hash.
    """
    from pyspark.sql import Observation

    li = table(spark, sf_dir, "lineitem")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("n_returned"),
        F.sum(F.col("l_quantity").cast("decimal(30,6)"))
        .cast("double")
        .alias("sum_qty"),
        F.max("l_orderkey").cast("bigint").alias("max_orderkey"),
    )
    observed.count()  # the pass the metrics ride on
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_returned"], m["sum_qty"], m["max_orderkey"])],
        "n_rows bigint, n_returned bigint, sum_qty double, max_orderkey bigint",
    )


@query(
    "pandas_api_groupby",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,6))), 0) AS BIGINT)
         AS sum_price
FROM orders
GROUP BY o_orderpriority
""",
)
def pandas_api_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through the pandas-on-Spark API: a groupby-agg
    written as idiomatic pandas (`ps.read_parquet(...).groupby(...)
    .agg(...)`) that still compiles to the identical distributed
    partial+final aggregate plan — `to_spark()` hands the lazy frame
    back, nothing collects. Exact decimal sum before the double cast,
    same convention as the native-API twin.
    """
    import pyspark.pandas as ps

    pdf = ps.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_orderpriority", "o_totalprice"]
    ]
    out = pdf.groupby("o_orderpriority").agg(
        n_orders=("o_totalprice", "count")
    )
    sdf = out.reset_index().to_spark()
    # the exact-decimal sum joins in via the native API (ps sums are
    # float; the engine convention is decimal-exact monetary sums)
    # whole-unit BIGINT via DECIMAL rounding (r12): the exact decimal
    # sums agree, but each engine's DECIMAL->DOUBLE cast rounds its own
    # way and at sf10's ~7.5e11 magnitude they land one ulp apart —
    # integer units keep the contract exact at every scale
    dec = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(30,6)")), 0)
            .cast("bigint")
            .alias("sum_price")
        )
    )
    return (
        sdf.select("o_orderpriority", F.col("n_orders").cast("bigint").alias("n_orders"))
        .join(dec, "o_orderpriority")
    )
