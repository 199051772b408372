"""Window function operators (SURVEY.md §2.5).

Every window partitions by a key (user_id / o_custkey / o_orderstatus), so
at scale each partition's state fits one task; there is exactly one shuffle
per distinct (partitionBy, orderBy) spec. Determinism: every orderBy
carries a unique tie-break column (§2.12.4) and windowed float sums go
through the decimal path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query


@query(
    "win_rank_family",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
       RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
FROM orders
""",
)
def win_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number (total order w/ tie-break) vs rank/dense_rank (value order)."""
    o = table(spark, sf_dir, "orders")
    w_total = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w_value = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w_total).cast("bigint").alias("rn"),
        F.rank().over(w_value).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_value).cast("bigint").alias("drnk"),
    )


@query(
    "win_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 3
""",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Catalyst 4.x pushes the rn<=3 predicate
    into the window sort (WindowGroupLimit) — per-group heap, not a full
    per-group sort, which is what survives a 100× fan-out."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).cast("bigint").alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_running_sum",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(30,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value
FROM events
""",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum in event-time order; decimal accumulation makes
    the prefix sums bit-stable regardless of engine summation strategy."""
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(30,6)")).over(w).cast("double").alias("running_value"),
    )


@query(
    "win_sliding_avg",
    oracle="""
SELECT event_id, user_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6)))
              OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS sliding_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
""",
)
def win_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row centered moving average (decimal-sum / count, rounded)."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-1, 1)
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.col("value").cast("decimal(30,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("sliding_avg"),
    )


@query(
    "win_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
                      RANGE BETWEEN 2592000000 PRECEDING AND 2592000000 FOLLOWING)
         AS n_within_30d
FROM orders
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: how many of the same customer's orders fall within ±30
    days of each order (frame bounds by value, not row position)."""
    o = table(spark, sf_dir, "orders")
    ms30d = 30 * 24 * 3600 * 1000
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_millis(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-ms30d, ms30d)
    )
    return o.select(
        "o_orderkey", "o_custkey", F.count(F.lit(1)).over(w).alias("n_within_30d")
    )


@query(
    "win_lag_lead",
    oracle="""
SELECT event_id, user_id,
       CAST(epoch_us(ts) - LAG(epoch_us(ts))  OVER w AS DOUBLE) AS gap_us_before,
       CAST(LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS DOUBLE) AS gap_us_after,
       LAG(event_type, 1, 'none') OVER w AS prev_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gaps via lag/lead — computed on integer microseconds so
    there is no float at all in the output."""
    e = table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        # double, not int64: a NULLable int column round-trips to pandas
        # as float64 in one engine and int64 in the other — pin it.
        (F.col("us") - F.lag("us").over(w)).cast("double").alias("gap_us_before"),
        (F.lead("us").over(w) - F.col("us")).cast("double").alias("gap_us_after"),
        F.lag("event_type", 1, "none").over(w).alias("prev_type"),
    )


@query(
    "win_analytic_misc",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cdist,
       FIRST_VALUE(o_orderkey) OVER w AS first_key,
       LAST_VALUE(o_orderkey)
         OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def win_analytic_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / first_value / last_value —
    last_value needs the full-partition frame (the default frame stops at
    CURRENT ROW, a classic silent-wrong-answer)."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


@query(
    "win_gap_fill_locf",
    oracle="""
SELECT user_id, event_id,
       last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS filled_value
FROM (SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
      FROM events)
""",
)
def win_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last observation carried forward): clicks' values
    are masked to NULL, then every row takes the most recent non-null
    value in its user's timeline — ``F.last(..., ignorenulls=True)``
    over a running frame. THE standard sensor/time-series gap-fill; at
    scale it is one keyed window (shuffle on user_id, in-partition
    scan), never a self-join."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    masked = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "click", F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return masked.select(
        "user_id",
        "event_id",
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
    )


@query(
    "win_ewma_trailing",
    oracle="""
WITH w AS (
  SELECT event_id, event_type, value,
         list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS hist
  FROM events
)
SELECT event_id, event_type,
       ROUND(CAST(list_sum(list_transform(hist,
               (x, i) -> CAST(floor(x * power(0.5, len(hist) - i)
                                    * 1000000000 + 0.5) AS BIGINT))) AS DOUBLE)
             / CAST(list_sum(list_transform(hist,
               (x, i) -> CAST(floor(power(0.5, len(hist) - i)
                                    * 1000000000 + 0.5) AS BIGINT))) AS DOUBLE),
             6) AS ewma
FROM w
""",
)
def win_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average (decay 0.5, last
    16 events) per event type — the smoothing pass monitoring pipelines
    run. The trailing frame materializes as an in-row list and the
    weighted sum is an indexed HOF; decay 0.5 makes every weight an
    exact binary fraction, so the per-term products are IEEE-identical
    in both engines. Terms are snapped to integer nano-units before
    summing (the stress-sweep hardening: neither engine guarantees a
    strict left-to-right float fold) and the output is the ratio of the
    two nano sums — the 1e9 scale cancels. Weight exponents are aligned
    EXPLICITLY across the engines' different lambda index bases
    (DuckDB 1-based: len-i → L-1..0; Spark 0-based: n-1-i → L-1..0):
    under per-term quantization a constant factor no longer cancels in
    the ratio, so the old off-by-one-that-cancels trick would drift.
    One keyed window shuffle, frame state is O(16) per row; the
    infinite-history EWMA recurrence is inherently sequential —
    truncation is what makes it parallel, with error 2^-16."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, 0)
    )
    hist = F.collect_list("value").over(w)
    n = F.size("hist")
    nano = lambda t: F.floor(t * 1000000000 + 0.5).cast("long")  # noqa: E731
    wsum = F.aggregate(
        F.transform(
            "hist", lambda x, i: nano(x * F.pow(F.lit(0.5), n - 1 - i))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    wtot = F.aggregate(
        F.transform("hist", lambda x, i: nano(F.pow(F.lit(0.5), n - 1 - i))),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return (
        e.select("event_id", "event_type", hist.alias("hist"))
        .select(
            "event_id",
            "event_type",
            F.round(wsum.cast("double") / wtot.cast("double"), 6).alias("ewma"),
        )
    )


@query(
    "win_rolling_median",
    oracle="""
SELECT o_custkey % 10 AS g, o_orderkey,
       ROUND(median(o_totalprice) OVER (PARTITION BY o_custkey % 10
                                        ORDER BY o_orderkey
                                        ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
             6) AS med
FROM orders
""",
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median over a 6-row trailing frame. Spark rejects
    median() with a window frame, so the frame is materialized with
    collect_list (bounded: <= 6 doubles per row), sorted in-row, and the
    midpoint interpolated — the standard exact-order-statistic recipe
    for SMALL frames. The frame array is O(frame) per row, so cost is
    linear in rows x frame, one window shuffle on the partition key;
    for large frames the right tool is the binned-ECDF sketch
    (stats_ks_binned's machinery), not this."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy(F.col("o_custkey") % 10)
        .orderBy("o_orderkey")
        .rowsBetween(-5, 0)
    )
    arr = F.array_sort(F.collect_list("o_totalprice").over(w))
    n = F.size(arr)
    mid_hi = ((n + 1) / 2).cast("int")
    lo = (n / 2).cast("int")
    med = F.when(n % 2 == 1, F.element_at(arr, mid_hi)).otherwise(
        (F.element_at(arr, lo) + F.element_at(arr, lo + 1)) / 2.0
    )
    return o.select(
        (F.col("o_custkey") % 10).alias("g"),
        "o_orderkey",
        F.round(med, 6).alias("med"),
    )


@query(
    "win_pareto_share",
    oracle="""
WITH spend AS (
  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DECIMAL(30,6)) AS total
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, total,
         row_number() OVER (ORDER BY total DESC, o_custkey) AS rn,
         count(*) OVER () AS n
  FROM spend
),
deciled AS (
  SELECT CAST((rn * 10 + n - 1) // n AS BIGINT) AS decile, total FROM ranked
),
agg AS (
  SELECT decile, count(*) AS n_customers,
         CAST(sum(total) AS DECIMAL(30,6)) AS revenue
  FROM deciled GROUP BY decile
)
SELECT decile,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(ROUND(revenue, 0) AS BIGINT) AS revenue,
       ROUND(CAST(sum(revenue) OVER (ORDER BY decile) AS DOUBLE)
             / CAST((SELECT sum(total) FROM spend) AS DOUBLE), 6) AS cum_share
FROM agg ORDER BY decile
""",
)
def win_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) curve: customers ranked by exact
    decimal spend, cut into spend-ordered deciles (ceil(rn·10/n) in
    integer arithmetic), cumulative share per decile. The per-customer
    aggregate carries the 100 TB load and shuffles on custkey; decimal
    sums make both the decile revenue and the share numerator exact —
    the one division is of identical doubles.

    Scale shape (r12): no global row_number over customers. Decile
    membership depends only on the spend MULTISET (equal totals are
    interchangeable across a decile boundary — swapping tied customers
    moves identical revenue), so the customer frame reduces to one row
    per DISTINCT total, ops/distrank.cum_below gives each distinct
    total its descending rank interval [cb+1, cb+cnt], and a ≤10-wide
    sequence explode splits that interval across the deciles it spans
    by pure integer arithmetic — ceil(r·10/n) boundaries, identical to
    the oracle's per-rank formula. Only the 10-row decile report uses
    a bounded_seq_window cumulative."""
    from pyspark.sql import Window as W

    from sim_spark.ops.distrank import bounded_seq_window, cum_below

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .cast("decimal(30,6)")
        .alias("total")
    )
    dist = cum_below(
        spend.groupBy("total").agg(F.count(F.lit(1)).alias("cnt")),
        "total",
        "cnt",
        descending=True,
    )
    ncust = spend.agg(F.count(F.lit(1)).alias("n"))
    # ranks r = cb+1 .. cb+cnt all carry this total; decile(r) =
    # ceil(10r/n); decile d covers ranks (floor((d-1)n/10), floor(dn/10)].
    spanned = (
        dist.crossJoin(F.broadcast(ncust))
        .select(
            "total",
            "cnt",
            "cum_below",
            "n",
            F.explode(
                F.sequence(
                    F.expr("((cum_below + 1) * 10 + n - 1) div n"),
                    F.expr("((cum_below + cnt) * 10 + n - 1) div n"),
                )
            ).alias("decile"),
        )
        .withColumn(
            "overlap",
            F.least(
                F.col("cum_below") + F.col("cnt"), F.expr("decile * n div 10")
            )
            - F.greatest(
                F.col("cum_below") + 1, F.expr("(decile - 1) * n div 10 + 1")
            )
            + 1,
        )
    )
    agg = spanned.groupBy("decile").agg(
        F.sum("overlap").cast("long").alias("n_customers"),
        F.sum(F.col("total") * F.col("overlap"))
        .cast("decimal(30,6)")
        .alias("revenue"),
    )
    grand = spend.agg(
        F.sum("total").cast("decimal(30,6)").cast("double").alias("grand")
    )
    wcum = bounded_seq_window("decile", "decile").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        agg.crossJoin(F.broadcast(grand))
        .select(
            "decile",
            "n_customers",
            # whole-unit BIGINT via decimal rounding (r12): the exact
            # decimal revenues agree, but each engine's DECIMAL->DOUBLE
            # cast rounds its own way — one ulp apart at sf10's ~2.8e11
            F.round("revenue", 0).cast("bigint").alias("revenue"),
            F.round(
                F.sum("revenue").over(wcum).cast("decimal(30,6)").cast("double")
                / F.col("grand"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


@query(
    "win_range_interval_ts",
    oracle="""
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER w
            AS BIGINT) AS n_purchases_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
)
def win_range_interval_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-INTERVAL range frame directly on the timestamp order
    column (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING…) — the frame is
    defined by event-time distance, not row counts, so ties and gaps
    handle themselves; no epoch-seconds casting, no numeric-frame
    emulation (the numeric twin is `win_range_frame`). Per-user trailing
    velocity counters — the real-time feature-engineering shape — in
    one user-keyed window shuffle, integer outputs."""
    from sim_spark.io import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT event_id, user_id,
               CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    OVER w AS BIGINT) AS n_purchases_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id
        """
    )
