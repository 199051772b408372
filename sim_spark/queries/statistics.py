"""Statistical aggregates: correlation, covariance, linear regression
(§2.4 adjacents) and array set operations (§2.8 adjacent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sim_spark.exprs import h48
from sim_spark.io import table
from sim_spark.registry import query


@query(
    "agg_correlation",
    oracle="""
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0 AS qty_price_corr,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_covar,
       ROUND(covar_pop(l_discount, l_tax), 6) + 0.0 AS disc_tax_covar
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample/population covariance per group —
    single-pass co-moment aggregation (partial+final like any agg).

    ``+ 0.0`` on every rounded column (both engines): DuckDB's ROUND
    preserves the sign of a tiny negative (→ -0.0) while Spark's
    BigDecimal HALF_UP round never emits negative zero, and the driver's
    value hash renders "-0.0" != "0.0". IEEE -0.0 + 0.0 = +0.0 makes the
    signed-zero choice identical on both sides (found by the strict
    r5 canonicalization at sf0.01 — covar_pop of the N group)."""
    li = table(spark, sf_dir, "lineitem")
    zero = F.lit(0.0)
    return li.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + zero).alias(
            "qty_price_corr"
        ),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4) + zero).alias(
            "qty_price_covar"
        ),
        (F.round(F.covar_pop("l_discount", "l_tax"), 6) + zero).alias(
            "disc_tax_covar"
        ),
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
       -- COALESCE: DuckDB array_to_string([]) is NULL while Spark
       -- array_join([]) is '' — a doc whose vocab is all-long (or
       -- all-short) words hits the empty set (first seen at sf1)
       COALESCE(array_to_string(list_sort(list_filter(vocab, x -> list_contains(long_words, x))), ','), '')
         AS inter_sorted,
       COALESCE(array_to_string(list_sort(list_filter(vocab, x -> NOT list_contains(long_words, x))), ','), '')
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


@query(
    "stats_chi_square",
    oracle="""
WITH c AS (SELECT lang, source, COUNT(*) AS n_obs FROM documents GROUP BY 1, 2),
t AS (SELECT SUM(n_obs) AS total FROM c),
m AS (SELECT lang, SUM(n_obs) AS row_n FROM c GROUP BY 1),
s AS (SELECT source, SUM(n_obs) AS col_n FROM c GROUP BY 1)
SELECT c.lang, c.source, n_obs,
       ROUND(CAST(row_n * col_n AS DOUBLE) / total, 6) AS expected,
       ROUND(POWER(n_obs - CAST(row_n * col_n AS DOUBLE) / total, 2)
             / (CAST(row_n * col_n AS DOUBLE) / total), 6) AS contrib
FROM c JOIN m USING (lang) JOIN s USING (source) JOIN t ON true
""",
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency cells for lang x source independence: per
    cell the observed count, expected count under independence, and the
    (obs-exp)^2/exp contribution. Emitted per cell (not globally
    summed) so every float is derived from exact integer counts in a
    fixed per-row order — deterministic across engines and partition
    schedules; the caller sums contribs for the statistic. The
    marginals are tiny aggregates AQE broadcasts back onto the cells."""
    d = table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_obs"))
    t = c.agg(F.sum("n_obs").alias("total"))
    m = c.groupBy("lang").agg(F.sum("n_obs").alias("row_n"))
    s = c.groupBy("source").agg(F.sum("n_obs").alias("col_n"))
    exp = (F.col("row_n") * F.col("col_n")).cast("double") / F.col("total")
    return (
        c.join(m, "lang")
        .join(s, "source")
        .crossJoin(t)
        .select(
            "lang",
            "source",
            "n_obs",
            F.round(exp, 6).alias("expected"),
            F.round(F.pow(F.col("n_obs") - exp, 2) / exp, 6).alias("contrib"),
        )
    )


@query(
    "stats_ks_binned",
    oracle="""
WITH v AS (
  SELECT event_type, value FROM events WHERE event_type IN ('view', 'purchase')
),
rng AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM v),
b AS (
  SELECT LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 512.0)) AS BIGINT), 511)
           AS bucket,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2
  FROM v CROSS JOIN rng GROUP BY 1
),
c AS (
  SELECT bucket,
         SUM(n1) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS c1,
         SUM(n2) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS c2,
         SUM(n1) OVER () AS t1, SUM(n2) OVER () AS t2
  FROM b
)
SELECT CAST(MAX(t1) AS BIGINT) AS n_view,
       CAST(MAX(t2) AS BIGINT) AS n_purchase,
       ROUND(MAX(ABS(CAST(c1 AS DOUBLE) / t1 - CAST(c2 AS DOUBLE) / t2)), 6)
         AS ks_binned
FROM c
""",
)
def stats_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the view and
    purchase value distributions, binned to 512 equal-width buckets:
    D = max |ECDF1 - ECDF2| evaluated at bucket boundaries (a lower
    bound of exact KS that converges as bins shrink — the drift-
    detection statistic data-quality monitors run). Everything is
    integer counts and exact ratios — no transcendentals, so engines
    agree bit-for-bit. Scale shape: one bounded 512-row aggregate after
    a map-side bucket assignment; the cumulative pass runs over 512
    rows, never the corpus — unlike exact KS, which needs a global
    sort."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    rng = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(512.0)
    b = (
        e.crossJoin(rng)
        .select(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width).cast("bigint"),
                F.lit(511).cast("bigint"),
            ).alias("bucket"),
            "event_type",
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n2"
            ),
        )
    )
    from sim_spark.ops.distrank import bounded_seq_window, bounded_total_window

    wc = bounded_seq_window("bucket", "bucket").rowsBetween(W.unboundedPreceding, 0)
    wt = bounded_total_window("bucket")
    c = b.select(
        F.sum("n1").over(wc).alias("c1"),
        F.sum("n2").over(wc).alias("c2"),
        F.sum("n1").over(wt).alias("t1"),
        F.sum("n2").over(wt).alias("t2"),
    )
    return c.agg(
        F.max("t1").cast("bigint").alias("n_view"),
        F.max("t2").cast("bigint").alias("n_purchase"),
        F.round(
            F.max(
                F.abs(
                    F.col("c1").cast("double") / F.col("t1")
                    - F.col("c2").cast("double") / F.col("t2")
                )
            ),
            6,
        ).alias("ks_binned"),
    )


@query(
    "agg_weighted_median",
    oracle="""
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(l_quantity AS DECIMAL(30,6)) AS wt
  FROM lineitem
),
c AS (
  SELECT l_returnflag, v,
         SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
  FROM w
)
SELECT l_returnflag,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS DOUBLE) AS wmedian,
       CAST(MAX(tw) AS DOUBLE) AS total_weight
FROM c GROUP BY l_returnflag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: sort within the
    group, exact DECIMAL cumulative weights, and the median is the
    first value whose doubled cumulative weight crosses the total
    (2*cw >= tw avoids a lossy division). All arithmetic is exact
    decimals, so the crossing row — and therefore the answer — is
    identical on any engine and partitioning, even with duplicate
    values straddling the boundary. One keyed window shuffle; the
    approx twin at 100 TB is a per-group weighted t-digest, this key
    pins the exact semantics."""
    li = table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("decimal(30,6)").alias("wt"),
    )
    wc = W.partitionBy("l_returnflag").orderBy("v").rowsBetween(
        W.unboundedPreceding, 0
    )
    wt_ = W.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wt_).alias("tw"),
    )
    return c.groupBy("l_returnflag").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v")))
        .cast("double")
        .alias("wmedian"),
        F.max("tw").cast("double").alias("total_weight"),
    )


@query(
    "stats_spearman_corr",
    oracle="""
WITH r AS (
  SELECT l_returnflag AS grp,
         2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx,
         2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
           + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS ry
  FROM lineitem
),
s AS (
  -- rank-square sums exceed int64 at sf1 (2M-row groups, 2n-scaled
  -- ranks: sum(rx*rx) ~ 3e19) — accumulate in DECIMAL(38,0); the
  -- per-row product still fits int64 (r10 sf1 drive)
  SELECT grp, count(*) AS n,
         CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         sum(CAST(rx * rx AS DECIMAL(38,0))) AS sxx,
         sum(CAST(ry * ry AS DECIMAL(38,0))) AS syy,
         sum(CAST(rx * ry AS DECIMAL(38,0))) AS sxy
  FROM r GROUP BY grp
)
SELECT grp,
       CAST(n AS BIGINT) AS n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * sy)), 6)
         + 0.0 AS spearman
FROM s ORDER BY grp
""",
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per group with exact tie handling:
    2·avg_rank = 2·min_rank + tie_count − 1 keeps every rank an INTEGER
    (the ×2 scaling cancels in the correlation), the five moment sums
    are exact int64, and the final Pearson-on-ranks formula runs the
    identical double expression in both engines — rank transforms are
    two in-group window sorts, the moments one partial+final aggregate.
    `+ 0.0` normalizes signed zero (see agg_correlation)."""
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")

    def r2(val: str) -> F.Column:
        return (
            2 * F.rank().over(W.partitionBy("l_returnflag").orderBy(val))
            + F.count(F.lit(1)).over(W.partitionBy("l_returnflag", val))
            - 1
        )

    r = li.select(
        F.col("l_returnflag").alias("grp"),
        r2("l_quantity").alias("rx"),
        r2("l_extendedprice").alias("ry"),
    )
    # rank-square sums exceed int64 at sf1 (2M-row groups, 2n-scaled
    # ranks) — accumulate in DECIMAL(38,0); per-row products fit long
    s = r.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum((F.col("rx") * F.col("rx")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("ry") * F.col("ry")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("rx") * F.col("ry")).cast("decimal(38,0)")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    d1 = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    d2 = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")
    return s.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        (F.round(num / F.sqrt(d1 * d2), 6) + F.lit(0.0)).alias("spearman"),
    ).orderBy("grp")


@query(
    "agg_gini_coefficient",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DECIMAL(30,6))
              * 1000000 AS BIGINT) AS x_micro
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT x_micro,
         row_number() OVER (ORDER BY x_micro, o_custkey) AS rnk,
         count(*) OVER () AS n
  FROM spend
),
s AS (
  -- (10,0) x (28,0): rank fits 10 digits at any plausible SF and the
  -- 38-digit product stays exact in BOTH engines (DuckDB keeps an
  -- 18x18 multiply in 18-wide arithmetic and overflows at sf1 --
  -- 149986 * 6.7e12 > 1e18; found by the r10 sf1 drive)
  SELECT max(n) AS n,
         CAST(sum(CAST(rnk AS DECIMAL(10,0)) * CAST(x_micro AS DECIMAL(28,0)))
              AS DECIMAL(38,0)) AS s1,
         CAST(sum(CAST(x_micro AS DECIMAL(28,0))) AS DECIMAL(38,0)) AS sx
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers,
       ROUND((2.0 * CAST(s1 AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini
FROM s
""",
)
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of customer spend via the rank identity
    G = (2·Σ r·x − (n+1)·Σx)/(n·Σx): per-customer decimal totals are
    quantized to exact integer micro-units, the rank-weighted sum runs
    in DECIMAL(38,0) (exact, order-free), and the single division runs
    on identical doubles. One customer-keyed aggregate carries the
    volume — the inequality-measure companion to `win_pareto_share`.

    Scale shape (r12): ranks collapse onto DISTINCT spend values —
    ties share the same x, so Σ r·x over a tie group of size c starting
    after cb rows is x·(c·cb + c(c+1)/2), all exact integers.
    ops/distrank.cum_below supplies cb with bucket-partitioned windows
    only; no single-partition rank over the customer frame. The oracle
    keeps the per-row row_number formulation — identical integers."""
    from sim_spark.ops.distrank import cum_below

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).cast("decimal(30,6)")
            * 1000000
        )
        .cast("long")
        .alias("x_micro")
    )
    dist = cum_below(
        spend.groupBy("x_micro").agg(F.count(F.lit(1)).alias("cnt")),
        "x_micro",
        "cnt",
    )
    # Σ ranks of a tie group, exact in long (n ≤ ~2e7 even at sf100);
    # the (20,0) x (28,0) product stays far under 38 digits in value,
    # mirroring the oracle's exact integer path.
    ranksum = F.expr("cnt * cum_below + (cnt * (cnt + 1)) div 2")
    s = dist.agg(
        F.sum("cnt").alias("n"),
        F.sum(
            ranksum.cast("decimal(20,0)") * F.col("x_micro").cast("decimal(28,0)")
        )
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(
            F.col("cnt").cast("decimal(10,0)") * F.col("x_micro").cast("decimal(28,0)")
        )
        .cast("decimal(38,0)")
        .alias("sx"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round(
            (2.0 * F.col("s1").cast("double") - (nd + 1.0) * F.col("sx").cast("double"))
            / (nd * F.col("sx").cast("double")),
            6,
        ).alias("gini"),
    )


@query(
    "stats_anova_oneway",
    oracle="""
WITH x AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS v FROM lineitem
),
g AS (
  SELECT grp, count(*) AS n, CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS ss
  FROM x GROUP BY grp
),
tot AS (
  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS s, CAST(sum(ss) AS BIGINT) AS ss,
         sum(CAST(s AS DOUBLE) * s / n) AS grp_term
  FROM g
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(n AS BIGINT) AS n_rows,
       ROUND((grp_term - CAST(s AS DOUBLE) * s / n) / (k - 1), 6) AS ms_between,
       ROUND((CAST(ss AS DOUBLE) - grp_term) / (n - k), 6) AS ms_within,
       ROUND(((grp_term - CAST(s AS DOUBLE) * s / n) / (k - 1))
             / ((CAST(ss AS DOUBLE) - grp_term) / (n - k)), 6) AS f_stat
FROM tot
""",
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic (quantity by return flag), completing
    the hypothesis-test family (Welch t, Mann-Whitney, KS, chi-square):
    per-group (n, Σx, Σx²) are exact int64 (quantities are integral),
    and SSB/SSW reduce to the identical double expression in both
    engines. One partial+final aggregate over k=3 groups, then k-row
    arithmetic. The only cross-group float reduction, Σ s²/n, runs over
    the SORTED 3-row group frame — order pinned, like the module's
    other k-row folds."""
    li = table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("grp"), F.col("l_quantity").cast("long").alias("v")
    )
    g = x.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
    )
    # Σ s²/n over a 3-row frame: sort by grp so the fold order is pinned
    # (sum over unordered partitions would be order-dependent in theory).
    g = g.orderBy("grp").coalesce(1)
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("long").alias("n"),
        F.sum("s").cast("long").alias("s"),
        F.sum("ss").cast("long").alias("ss"),
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias("grp_term"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    ssb = F.col("grp_term") - F.col("s").cast("double") * F.col("s") / nd
    ssw = F.col("ss").cast("double") - F.col("grp_term")
    return tot.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n").cast("long").alias("n_rows"),
        F.round(ssb / (kd - 1), 6).alias("ms_between"),
        F.round(ssw / (nd - kd), 6).alias("ms_within"),
        F.round((ssb / (kd - 1)) / (ssw / (nd - kd)), 6).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# ml_ols_multifeature — two-feature OLS via Cramer's rule over exact moments.
# Engine-shared formula text: nine exact integer/decimal moments reduce the
# stream, then BOTH engines evaluate the same closed-form determinant
# expressions in doubles — identical inputs, identical outputs.

_OLS2_MOMENT_EXPRS = [
    "CAST(COUNT(*) AS DOUBLE) AS n",
    "CAST(SUM(h) AS DOUBLE) AS sh",
    "CAST(SUM(d) AS DOUBLE) AS sd",
    "CAST(SUM(h * h) AS DOUBLE) AS shh",
    "CAST(SUM(d * d) AS DOUBLE) AS sdd",
    "CAST(SUM(h * d) AS DOUBLE) AS shd",
    "CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy",
    "CAST(SUM(CAST(h AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS shy",
    "CAST(SUM(CAST(d AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sdy",
]
_OLS2_MOMENTS = "  SELECT " + ",\n         ".join(_OLS2_MOMENT_EXPRS)

# Cramer's rule for [n sh sd; sh shh shd; sd shd sdd] * [b0 b1 b2]' = [sy shy sdy]'
_OLS2_FORMULAS = [
    "ROUND((sy * (shh * sdd - shd * shd) - shy * (sh * sdd - shd * sd)"
    " + sdy * (sh * shd - shh * sd))"
    " / (n * (shh * sdd - shd * shd) - sh * (sh * sdd - shd * sd)"
    " + sd * (sh * shd - shh * sd)) / 1000000000.0, 6) AS b0",
    "ROUND((n * (shy * sdd - sdy * shd) - sy * (sh * sdd - shd * sd)"
    " + sd * (sh * sdy - shy * sd))"
    " / (n * (shh * sdd - shd * shd) - sh * (sh * sdd - shd * sd)"
    " + sd * (sh * shd - shh * sd)) / 1000000000.0, 6) AS b1",
    "ROUND((n * (shh * sdy - shd * shy) - sh * (sh * sdy - shy * sd)"
    " + sy * (sh * shd - shh * sd))"
    " / (n * (shh * sdd - shd * shd) - sh * (sh * sdd - shd * sd)"
    " + sd * (sh * shd - shh * sd)) / 1000000000.0, 6) AS b2",
    "CAST(n AS BIGINT) AS n_rows",
]


@query(
    "ml_ols_multifeature",
    oracle=f"""
WITH feat AS (
  SELECT hour(ts) AS h, dayofweek(ts) AS d,
         CAST(floor(value * 1000000000 + 0.5) AS BIGINT) AS y
  FROM events
),
m AS ({_OLS2_MOMENTS} FROM feat)
SELECT {', '.join(_OLS2_FORMULAS)} FROM m
""",
)
def ml_ols_multifeature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature linear regression (value ~ hour-of-day + day-of-week)
    solved in closed form: ONE pass reduces the stream to nine exact
    moments (integer features, nano-unit target; the y-cross-moments sum
    as DECIMAL so nothing wraps at scale), then Cramer's rule evaluates
    from the SAME formula text in both engines. The whole model train is
    a partial+final aggregate — no iterations, no driver, no shuffle
    beyond the 9-value reduce; the multi-feature step up from
    fn_regression/ml_ols_normal_eq's single-feature fits.

    DuckDB dayofweek(Sunday)=0 vs Spark dayofweek(Sunday)=1 (SURVEY
    §2 oracle notes) — Spark side subtracts 1 to match."""
    e = table(spark, sf_dir, "events")
    feat = e.select(
        F.hour("ts").alias("h"),
        (F.dayofweek("ts") - 1).alias("d"),
        F.floor(F.col("value") * 1e9 + F.lit(0.5)).cast("bigint").alias("y"),
    )
    # Moments AND formulas both evaluate from the identical shared text —
    # a cast edited in one engine's copy cannot drift from the other's.
    m = feat.selectExpr(*_OLS2_MOMENT_EXPRS)
    return m.selectExpr(*_OLS2_FORMULAS)


@query(
    "stats_theil_sen",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yc
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
pairs AS (
  SELECT (b.yc - a.yc) / (100.0 * (b.x - a.x)) AS slope
  FROM daily a JOIN daily b ON a.x < b.x
),
ranked AS (
  SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
         COUNT(*) OVER () AS np
  FROM pairs
),
med AS (
  SELECT AVG(slope) AS slope_med, MAX(np) AS np FROM ranked
  WHERE rn IN ((np + 1) // 2, (np + 2) // 2)
),
resid AS (
  SELECT d.yc / 100.0 - m.slope_med * d.x AS r, m.slope_med, m.np
  FROM daily d CROSS JOIN med m
),
rr AS (
  SELECT r, slope_med, np, ROW_NUMBER() OVER (ORDER BY r) AS rn,
         COUNT(*) OVER () AS nd
  FROM resid
)
SELECT CAST(MAX(nd) AS BIGINT) AS n_points,
       CAST(MAX(np) AS BIGINT) AS n_pairs,
       ROUND(MAX(slope_med), 6) + 0.0 AS slope,
       ROUND(AVG(r), 4) + 0.0 AS intercept
FROM rr WHERE rn IN ((nd + 1) // 2, (nd + 2) // 2)
""",
)
def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend over the daily purchase-revenue series:
    median of all pairwise slopes, then median-residual intercept — the
    breakdown-point-0.29 alternative to `fn_regression`'s OLS line.

    The O(n^2) pair join runs on the AGGREGATED series (one row per
    day), not the corpus: the corpus pass is a single partial+final
    centi-unit integer reduce per day, so 100 TB of events still yields
    the same ~30-row frame and the quadratic stage is constant-cost.
    Slopes are per-pair double divisions of exact integers (identical
    in both engines); both medians are explicit order statistics
    (row_number, avg of the two middles) rather than engine median(),
    whose interpolation rules would be an implementation dependency.
    ``+ 0.0`` canonicalizes signed zero (agg_correlation note)."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("yc")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.x") < F.col("b.x")).select(
        (
            (F.col("b.yc") - F.col("a.yc"))
            / (100.0 * (F.col("b.x") - F.col("a.x")))
        ).alias("slope")
    )
    from sim_spark.ops.distrank import at_rank, cum_below

    dslope = cum_below(
        pairs.groupBy("slope").agg(F.count(F.lit(1)).alias("cnt")),
        "slope",
        "cnt",
    )
    np_tot = pairs.agg(F.count(F.lit(1)).alias("np"))
    k1 = ((F.col("np") + 1) / 2).cast("long")
    k2 = ((F.col("np") + 2) / 2).cast("long")
    # avg of the two middle order statistics == Σ v·(covers k1 + covers k2) / 2
    med = (
        dslope.crossJoin(F.broadcast(np_tot))
        .agg(
            (
                F.sum(
                    F.col("slope")
                    * (at_rank(k1).cast("int") + at_rank(k2).cast("int"))
                )
                / 2.0
            ).alias("slope_med"),
            F.max("np").alias("np"),
        )
    )
    resid = daily.crossJoin(F.broadcast(med)).select(
        (F.col("yc") / 100.0 - F.col("slope_med") * F.col("x")).alias("r"),
        "slope_med",
        "np",
    )
    dres = cum_below(
        resid.groupBy("r", "slope_med", "np").agg(
            F.count(F.lit(1)).alias("cnt")
        ),
        "r",
        "cnt",
    )
    nd_tot = resid.agg(F.count(F.lit(1)).alias("nd"))
    j1 = ((F.col("nd") + 1) / 2).cast("long")
    j2 = ((F.col("nd") + 2) / 2).cast("long")
    return (
        dres.crossJoin(F.broadcast(nd_tot))
        .agg(
            F.max("nd").cast("bigint").alias("n_points"),
            F.max("np").cast("bigint").alias("n_pairs"),
            (F.round(F.max("slope_med"), 6) + F.lit(0.0)).alias("slope"),
            (
                F.round(
                    F.sum(
                        F.col("r")
                        * (at_rank(j1).cast("int") + at_rank(j2).cast("int"))
                    )
                    / 2.0,
                    4,
                )
                + F.lit(0.0)
            ).alias("intercept"),
        )
    )


# Poisson-bootstrap resample multiplicities: inverse CDF of Poisson(1)
# evaluated on an engine-shared uniform. The row hashes ONCE
# (md5-48 of event_id, mod p = 2^31-1); per-resample uniforms come from
# affine permutations u_b = ((a_b*h + c_b) mod p)/p with a_b, c_b
# derived arithmetically from b — the minhash-family trick, so the
# per-row cost is one md5 + B integer ops instead of B md5s (measured
# 4.2 s -> ~1 s at sf0.1; a_b*h <= 2^62 never wraps int64). Literal
# thresholds are the cumulative Poisson(1) mass written to 17
# significant digits — identical text in both engines, so the CASE
# chain can never disagree. Capped at 6 (P(X>6) ~ 8e-5).
_POIS_CUM = [
    "0.36787944117144233",
    "0.73575888234288467",
    "0.91969860292860580",
    "0.98101184312384615",
    "0.99634015317265628",
    "0.99940581518241827",
]
_B_BOOT = 200


def _boot_mult_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CUM)
    )
    return f"(CASE {cases} ELSE 6 END)"


@query(
    "stats_bootstrap_ci",
    oracle=f"""
WITH r AS (
  SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT
           % 2147483647 AS h,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS yc
  FROM events WHERE event_type = 'purchase'
),
ex AS (
  SELECT b.b, r.yc,
         {_boot_mult_sql(
             "((((1 + ((1103515245 * (b.b + 1) + 12345) % 2147483646)) * r.h"
             " + ((69069 * (b.b + 1) + 1234567) % 2147483647)) % 2147483647)"
             " / 2147483647.0)"
         )} AS mult
  FROM r CROSS JOIN (SELECT unnest(generate_series(0, {_B_BOOT - 1})) AS b) b
),
means AS (
  SELECT b, SUM(mult * yc) / (100.0 * SUM(mult)) AS m
  FROM ex GROUP BY b HAVING SUM(mult) > 0
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn FROM means
),
pt AS (SELECT SUM(yc) / (100.0 * COUNT(*)) AS est, COUNT(*) AS n FROM r)
SELECT CAST(pt.n AS BIGINT) AS n_rows,
       {_B_BOOT} AS n_resamples,
       ROUND(pt.est, 6) AS estimate,
       ROUND(MAX(CASE WHEN rn = 5 THEN m END), 6) AS ci_lo,
       ROUND(MAX(CASE WHEN rn = {_B_BOOT - 4} THEN m END), 6) AS ci_hi
FROM ranked CROSS JOIN pt GROUP BY pt.n, pt.est
""",
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for the mean purchase value, B = 200
    resamples, fully deterministic: each (row, resample) multiplicity is
    Poisson(1) by inverse CDF over the engine-shared md5-48 uniform, so
    both engines draw the IDENTICAL resamples and the interval
    hash-matches (module comment above on the threshold literals).

    The Poisson bootstrap is THE distributed formulation (Chamandy et
    al., "Estimating uncertainty for massive data streams", Google
    2012): unlike classic resampling it needs no global row indexing —
    each row independently emits its multiplicity per resample, so the
    whole fan-out is one explode (bounded B×rows) feeding one
    partial+final aggregate keyed by resample id; no shuffle of the
    corpus, no driver loop. Rank-5 / rank-196 order statistics give the
    2.5%/97.5% bounds; value sums stay centi-unit integers until the
    final division."""
    e = table(spark, sf_dir, "events")
    P = 2147483647
    r = e.filter(F.col("event_type") == "purchase").select(
        (h48(F.col("event_id").cast("string")) % P).alias("h"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("yc"),
    )
    ex = r.select(
        "yc", "h", F.explode(F.sequence(F.lit(0), F.lit(_B_BOOT - 1))).alias("b0")
    ).select("yc", "h", F.col("b0").cast("long").alias("b"))
    b1 = F.col("b") + 1
    a_b = 1 + (F.lit(1103515245) * b1 + 12345) % (P - 1)
    c_b = (F.lit(69069) * b1 + 1234567) % P
    u = ((a_b * F.col("h") + c_b) % P) / F.lit(2147483647.0)
    mult = F.when(u < float(_POIS_CUM[0]), 0)
    for k, c in enumerate(_POIS_CUM[1:], start=1):
        mult = mult.when(u < float(c), k)
    mult = mult.otherwise(6)
    means = (
        ex.select("b", "yc", mult.alias("mult"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("mult") * F.col("yc"))
                / (100.0 * F.sum("mult"))
            ).alias("m"),
            F.sum("mult").alias("w"),
        )
        .filter(F.col("w") > 0)
        .select("b", "m")
    )
    from pyspark.sql import Window as W

    from sim_spark.ops.distrank import bounded_seq_window

    ranked = means.select(
        "m", F.row_number().over(bounded_seq_window("b", "m")).alias("rn")
    )
    pt = r.agg(
        (F.sum("yc") / (100.0 * F.count(F.lit(1)))).alias("est"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        ranked.crossJoin(F.broadcast(pt))
        .groupBy("n", "est")
        .agg(
            F.round(F.max(F.when(F.col("rn") == 5, F.col("m"))), 6).alias("ci_lo"),
            F.round(
                F.max(F.when(F.col("rn") == _B_BOOT - 4, F.col("m"))), 6
            ).alias("ci_hi"),
        )
        .select(
            F.col("n").cast("bigint").alias("n_rows"),
            F.lit(_B_BOOT).alias("n_resamples"),
            F.round("est", 6).alias("estimate"),
            "ci_lo",
            "ci_hi",
        )
    )


@query(
    "stats_jackknife_blocks",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(n) AS BIGINT) AS nt,
         CAST(COUNT(*) AS BIGINT) AS g
  FROM daily
),
theta AS (
  SELECT CAST(floor((t.st - d.s) * 10000000.0 / (t.nt - d.n) + 0.5) AS BIGINT)
           AS tq,
         t.st, t.nt, t.g
  FROM daily d CROSS JOIN tot t
)
SELECT MAX(g) AS n_blocks,
       MAX(nt) AS n_rows,
       ROUND(MAX(st) / (100.0 * MAX(nt)), 6) AS estimate,
       ROUND(sqrt((MAX(g) - 1.0) / MAX(g)
                  * (CAST(SUM(CAST(tq AS HUGEINT) * tq) AS DOUBLE)
                     - CAST(SUM(tq) AS DOUBLE) * CAST(SUM(tq) AS DOUBLE) / MAX(g))
                  / 1e18), 6) AS jack_se
FROM theta
""",
)
def stats_jackknife_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-BLOCK jackknife standard error for the mean purchase
    value, blocks = calendar days — the jackknife formulation that
    survives scale: classic delete-one-row needs n leave-outs, but with
    day blocks the corpus pass is a single per-day integer reduce and
    the leave-out frame has one row per block regardless of corpus size.
    Complements `stats_bootstrap_ci` (resampling) with the
    deterministic-by-construction resampling-free uncertainty estimate.

    Exactness: per-block leave-out means are nano-quantized before the
    variance pass, and the variance uses the sum-of-squares identity on
    exact int128 sums, so no double accumulates across rows; the final
    scalar expression (one sqrt) is evaluated from identical exact
    aggregates in both engines."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("bigint")
            .alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    tot = daily.agg(
        F.sum("s").cast("bigint").alias("st"),
        F.sum("n").cast("bigint").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("g"),
    )
    theta = daily.crossJoin(F.broadcast(tot)).select(
        F.floor(
            (F.col("st") - F.col("s")) * 10000000.0 / (F.col("nt") - F.col("n"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tq"),
        "st",
        "nt",
        "g",
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sx = F.sum("tq").cast("double")
    sx2 = F.sum(dec("tq") * F.col("tq")).cast("double")
    return theta.agg(
        F.max("g").alias("n_blocks"),
        F.max("nt").alias("n_rows"),
        F.round(F.max("st") / (100.0 * F.max("nt")), 6).alias("estimate"),
        F.round(
            F.sqrt(
                (F.max("g") - 1.0)
                / F.max("g")
                * (sx2 - sx * sx / F.max("g"))
                / 1e18
            ),
            6,
        ).alias("jack_se"),
    )


@query(
    "stats_kendall_tau",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS con,
         CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS dis,
         CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END AS tx,
         CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END AS ty,
         CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END AS txy
  FROM daily a JOIN daily b ON a.d < b.d
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
       CAST(SUM(con) AS BIGINT) AS concordant,
       CAST(SUM(dis) AS BIGINT) AS discordant,
       CAST(SUM(tx) AS BIGINT) AS ties_x,
       CAST(SUM(ty) AS BIGINT) AS ties_y,
       CAST(SUM(txy) AS BIGINT) AS ties_both,
       ROUND((SUM(con) - SUM(dis))
             / (sqrt(CAST(COUNT(*) - SUM(tx) - SUM(txy) AS DOUBLE))
                * sqrt(CAST(COUNT(*) - SUM(ty) - SUM(txy) AS DOUBLE))), 6)
         AS tau_b
FROM pairs
""",
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between daily purchase revenue and daily view
    count — the rank-correlation companion to `stats_spearman_corr`
    that is robust to monotone transforms AND exact here: concordance /
    discordance / tie counts are pure integer comparisons over the
    day-pair frame, and tau-b is one final expression over those exact
    counts (two sqrts of exact integers).

    Same aggregate-then-quadratic scale shape as stats_theil_sen: the
    corpus pass is a single day-keyed integer reduce; the O(n²) pair
    stage runs on the ~30-row daily frame, constant-cost at any corpus
    size."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    dx = F.col("a.x") - F.col("b.x")
    dy = F.col("a.y") - F.col("b.y")
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).select(
        F.when(dx * dy > 0, 1).otherwise(0).alias("con"),
        F.when(dx * dy < 0, 1).otherwise(0).alias("dis"),
        F.when((dx == 0) & (dy != 0), 1).otherwise(0).alias("tx"),
        F.when((dy == 0) & (dx != 0), 1).otherwise(0).alias("ty"),
        F.when((dx == 0) & (dy == 0), 1).otherwise(0).alias("txy"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    # n_days joins AFTER the pair aggregate (not threaded through the
    # pair rows): with a degenerate single-day corpus the pair frame is
    # empty and a threaded max(n_days) would yield NULL while the
    # oracle's scalar subquery still counts days.
    pair_agg = pairs.agg(
        F.sum("con").cast("bigint").alias("concordant"),
        F.sum("dis").cast("bigint").alias("discordant"),
        F.sum("tx").cast("bigint").alias("ties_x"),
        F.sum("ty").cast("bigint").alias("ties_y"),
        F.sum("txy").cast("bigint").alias("ties_both"),
        F.round(
            (F.sum("con") - F.sum("dis"))
            / (
                F.sqrt(
                    (F.count(F.lit(1)) - F.sum("tx") - F.sum("txy")).cast("double")
                )
                * F.sqrt(
                    (F.count(F.lit(1)) - F.sum("ty") - F.sum("txy")).cast("double")
                )
            ),
            6,
        ).alias("tau_b"),
    )
    return F.broadcast(nd).crossJoin(pair_agg).select(
        "n_days", "concordant", "discordant", "ties_x", "ties_y",
        "ties_both", "tau_b",
    )
