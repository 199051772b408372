"""Aggregation operators (SURVEY.md §2.4).

All are single groupBy().agg() plans: Catalyst always plans these as
partial (map-side) HashAggregate → shuffle on the group keys → final
HashAggregate, so at 100 TB the shuffle carries one row per (partition ×
group), not per input row. Group-key cardinalities here are tiny (≤ a few
thousand), so the final stage is never the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.exprs import davg, dsum, r6, sql_davg, sql_dsum
from sim_spark.io import table
from sim_spark.registry import query

# --------------------------------------------------------------------------
# Flagship: TPC-H Q1 shape (also mounted as entry()).
# --------------------------------------------------------------------------

Q1_CUTOFF = "1998-09-02"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_q1_pricing", oracle=_Q1_ORACLE)
def agg_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: filter → groupBy → 8 aggregates.

    Plan shape: parquet scan with l_shipdate predicate pushed to row
    groups, then the two-stage exact sum of ops/exact_sum.py — long-typed
    µ-unit partials per (group, scan partition), decimal merge per group.
    Bit-identical to the direct decimal formulation (the per-row
    DECIMAL(30,6) cast is shared) but ~1.6x faster at sf0.1 because the
    per-row aggregation buffer stays a long; overflow-safe at 100 TB
    because no long ever accumulates more than one scan partition.
    Averages divide by the per-measure NON-NULL counts the helper emits
    (SUM/COUNT(expr) exactly as the oracle's sql_davg writes it), so a
    NULL-bearing measure column would still match the oracle rather
    than silently diverging via a COUNT(*) denominator."""
    from sim_spark.ops.exact_sum import grouped_exact_sums

    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    sums = grouped_exact_sums(
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": F.col("l_quantity"),
            "sum_base_price": F.col("l_extendedprice"),
            "sum_disc_price": disc_price,
            "sum_charge": charge,
            "sum_disc": F.col("l_discount"),
        },
        count_alias="count_order",
    )
    return sums.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        F.round(F.col("sum_qty") / F.col("n_sum_qty"), 6).alias("avg_qty"),
        F.round(F.col("sum_base_price") / F.col("n_sum_base_price"), 6).alias(
            "avg_price"
        ),
        F.round(F.col("sum_disc") / F.col("n_sum_disc"), 6).alias("avg_disc"),
        "count_order",
    )


@query(
    "agg_global_noGroup",
    oracle=f"""
SELECT
  MIN(l_quantity) AS min_qty,
  MAX(l_quantity) AS max_qty,
  {sql_dsum('l_extendedprice')} AS sum_price,
  {sql_davg('l_extendedprice')} AS avg_price,
  MIN(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')) AS min_shipdate,
  MAX(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')) AS max_shipdate,
  COUNT(*) AS n_rows
FROM lineitem
""",
)
def agg_global_noGroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global reduction, no GROUP BY — the sim min/max-voxel analogue.

    Plans as partial agg per partition → single-row final agg; at 100 TB
    the shuffle moves one row per partition.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        davg("l_extendedprice").alias("avg_price"),
        F.min(F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss")).alias("min_shipdate"),
        F.max(F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss")).alias("max_shipdate"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_count_distinct",
    oracle="""
SELECT c_mktsegment AS segment,
       COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (expand + two-phase agg in Spark)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
        )
    )


@query("agg_approx_distinct")  # rows-only: HLL++ value differs from DuckDB's sketch
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx distinct l_orderkey via HyperLogLog++ (rsd=0.02).

    No oracle: sketch values are engine-specific. tests/test_invariants.py
    proves ≤2% relative error against the exact count. At 100 TB this is
    THE distinct-count path — fixed-size sketch per partition, no expand.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.agg(F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"))


@query(
    "agg_having",
    oracle="""
SELECT n.n_name AS nation, COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
HAVING COUNT(*) > 40
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING). nation is broadcast (25 rows)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("n_customers") > 40)
    )


@query(
    "agg_stats_moments",
    oracle="""
SELECT o_orderstatus AS status,
       ROUND(AVG(o_totalprice), 6) AS avg_price,
       ROUND(STDDEV_SAMP(o_totalprice), 6) AS std_price,
       ROUND(VAR_SAMP(o_totalprice), 0) AS var_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group, rounded to absorb FP noise.

    The variance rounds to WHOLE units (still ~11 significant digits of
    checking at this fixture's ~2e10 magnitude): a 4-decimal contract
    demanded 15 significant digits of cross-engine agreement, which the
    r12 sf10 sweep measured as a real boundary — at 15M rows the two
    engines' accumulation orders diverge in the last decimal. A rounding
    contract must leave headroom for accumulation-order error growth or
    it fails precisely when the data scales."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            r6(F.avg("o_totalprice")).alias("avg_price"),
            r6(F.stddev_samp("o_totalprice")).alias("std_price"),
            F.round(F.var_samp("o_totalprice"), 0).alias("var_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "agg_collect_sorted",
    oracle="""
SELECT n.n_name AS nation,
       string_agg(c.c_custkey, ',' ORDER BY c.c_custkey) AS custkeys
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted collection, emitted as a CSV string.

    sort_array(collect_list(...)) makes the value deterministic; the string
    form sidesteps array-representation differences between engines.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_custkey")), ",").alias("custkeys")
        )
    )


@query(
    "agg_partial_final",
    oracle="""
SELECT l_suppkey AS suppkey, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY l_suppkey
""",
)
def agg_partial_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage (partial+final) reduction semantics — sim's histogram-merge
    analogue. Spark always plans map-side partial aggregation here;
    tests/test_plans.py asserts both HashAggregate modes appear.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "agg_filtered_argminmax",
    oracle="""
SELECT o_orderpriority AS priority,
       COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
       BOOL_OR(o_orderstatus = 'F') AS any_f,
       BOOL_AND(o_totalprice > 0) AS all_pos,
       ARG_MAX(o_orderstatus, o_orderkey) AS last_status,
       ARG_MIN(o_orderstatus, o_orderkey) AS first_status
FROM orders GROUP BY o_orderpriority ORDER BY priority
""",
)
def agg_filtered_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/argument aggregates: count_if, bool_or/bool_and,
    max_by/min_by. The max_by/min_by ordering key is the UNIQUE
    o_orderkey — arg-extrema over a non-unique key are tie-
    nondeterministic and can never be oracle-hashed (§2.12)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_f"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
            F.max_by("o_orderstatus", "o_orderkey").alias("last_status"),
            F.min_by("o_orderstatus", "o_orderkey").alias("first_status"),
        )
        .orderBy("priority")
    )


@query(
    "agg_listagg_ordered",
    oracle="""
SELECT n_name AS nation,
       string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
       COUNT(*) AS n_suppliers
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n_name ORDER BY nation
""",
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI LISTAGG ... WITHIN GROUP (Spark 4): ordered string
    concatenation per group ≡ DuckDB's string_agg(ORDER BY). The
    explicit ORDER BY is what makes a concatenation aggregate hashable
    at all — unordered listagg is partition-order nondeterministic."""
    from sim_spark.io import register_views

    register_views(spark, sf_dir, ["supplier", "nation"])
    return spark.sql(
        """
        SELECT n_name AS nation,
               listagg(s_name, '|') WITHIN GROUP (ORDER BY s_name) AS suppliers,
               COUNT(*) AS n_suppliers
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n_name ORDER BY nation
        """
    )


@query(
    "agg_weighted_mean",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0)))
            AS DOUBLE) / 100.0
         / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS wmean_price,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_weight
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price per flag: the weighted numerator is
    an exact integer-cents sum (price is 2-dp money, weights integral;
    cents reconstructed with the engine-identical floor(x*100+0.5)),
    summed in DECIMAL(38,0) so no long ever overflows, and cast to
    DOUBLE only as an integer — the correctly-rounded int→double path
    both engines share (a fractional decimal→double cast drifts one ulp
    past 2^53 unscaled; this key tripped it at sf1 in the r10 drive).
    The ratio is then one division of identical doubles — no
    reduction-order float hazard. One partial+final aggregate."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    num = F.sum((cents * F.col("l_quantity").cast("long")).cast("decimal(38,0)"))
    den = F.sum(F.col("l_quantity").cast("long"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            (num.cast("double") / F.lit(100.0) / den.cast("double")).alias(
                "wmean_price"
            ),
            den.cast("long").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )
