"""Product-analytics operators over the events stream: ordered funnels
and cohort retention — the query shapes every event warehouse serves.

Timestamp note (SURVEY §2.12.2): events.ts is nanosecond parquet; Spark
and DuckDB both truncate to microseconds on read, so µs-granular
comparisons agree engine-to-engine (pinned by the session-window op's
oracle match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.ops.distrank import bounded_total_window as _bounded_total_window
from sim_spark.registry import query


@query(
    "events_funnel_steps",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s2.t2 + INTERVAL 6 HOUR GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
       (SELECT COUNT(*) FROM s2) AS n_then_view,
       (SELECT COUNT(*) FROM s3) AS n_then_purchase
""",
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → view(≤24 h) → purchase(≤6 h): each stage
    only counts events STRICTLY AFTER the previous stage completed and
    within its conversion window (the ordering+window is the whole
    point — an unordered distinct-type count overstates conversion;
    windows sized so the fixture shows real drop-off). Three grouped passes, each joined back
    on the shrinking qualified-user set (no forced broadcast: per-user
    aggregates are billions of rows at 100 TB, so AQE picks the
    strategy from observed sizes); the
    events scan happens three times but the per-user state is tiny —
    the alternative single-pass window sort pays an events-wide
    shuffle+sort instead; pick by stage count × scan cost."""
    e = table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 6 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_then_view")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_then_purchase")))
    )


def cohort_first_week(e: DataFrame) -> DataFrame:
    """Per-user cohort week (Monday-start first-activity week) — shared
    scaffolding of the retention and LTV matrices; the matching oracle
    CTE is _COHORT_FIRST_WEEK_SQL."""
    return e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )


def cohort_week_offset():
    """Whole weeks between cohort_week and the row's ts. Correct only
    because the session TZ is pinned UTC (unix_timestamp of Monday
    midnights differ by exact multiples of 604800 s) — harden here, not
    at the call sites, if that pin ever changes."""
    return F.floor(
        (
            F.unix_timestamp(F.date_trunc("week", F.col("ts")))
            - F.unix_timestamp(F.col("cohort_week"))
        )
        / (7 * 86400)
    ).cast("bigint")



# Shared 30-minute-gap sessionization — THE session definition every
# session-keyed operator in this module builds on (batch sessionize,
# median session length, hourly occupancy). One Spark chain + one SQL
# CTE text so the gap rule can never fork between keys.
_SESS_CTE = """ordered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM ordered
)"""


def _session_numbers(e: DataFrame) -> DataFrame:
    """(user_id, ts, session_no) under the 30-minute gap rule — the
    Spark twin of _SESS_CTE (lag + running sum, both windows clustered
    on user_id so Catalyst reuses one sort partitioning)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = (
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES"))
    ).cast("int")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return e.select("user_id", "event_id", "ts", new_sess.alias("new_sess")).select(
        "user_id", "ts", F.sum("new_sess").over(wsum).alias("session_no")
    )


_COHORT_FIRST_WEEK_SQL = """
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
"""


@query(
    "events_cohort_retention",
    oracle=f"""
WITH first_week AS ({_COHORT_FIRST_WEEK_SQL}),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT)
           AS week_offset
  FROM events e JOIN first_week f ON e.user_id = f.user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       week_offset,
       COUNT(*) AS n_active_users
FROM activity GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted in every later week they return. Monday-start date_trunc
    weeks in both engines; the distinct (user, offset) pass is the one
    shuffle, keyed exactly like the final group-by."""
    e = table(spark, sf_dir, "events")
    first_week = cohort_first_week(e)
    activity = (
        e.join(first_week, "user_id")
        .select("user_id", "cohort_week", cohort_week_offset().alias("week_offset"))
        .distinct()
    )
    return (
        activity.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_sessionize_batch",
    oracle="""
WITH """ + _SESS_CTE + """
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sess GROUP BY user_id, session_no
ORDER BY user_id, session_no
""",
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gaps-and-islands shape every event
    warehouse serves: a new session starts where the per-user gap
    exceeds 30 minutes (timestamp comparison against lag+interval, so
    µs-exact and engine-agnostic), session ids via running sum of
    session starts. ONE shuffle: the lag window, the running-sum window,
    and the per-(user, session) aggregate all cluster on user_id, so
    Catalyst reuses the window partitioning for the final group-by.
    The streaming twin is `stream_session_30m` (session_window); at
    100 TB the batch form backfills history while the stream serves
    the live edge — same session semantics both sides."""
    from sim_spark.exprs import ts_str

    e = table(spark, sf_dir, "events")
    sess = _session_numbers(e)
    return (
        sess.groupBy("user_id", F.col("session_no").cast("bigint").alias("session_no"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            ts_str(F.min("ts")).alias("session_start"),
            ts_str(F.max("ts")).alias("session_end"),
        )
        .orderBy("user_id", "session_no")
    )


@query(
    "events_ohlc_bars",
    oracle="""
SELECT event_type,
       date_trunc('hour', ts) AS bucket,
       arg_min(value, concat(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '|',
                             lpad(CAST(event_id AS VARCHAR), 12, '0'))) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, concat(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '|',
                             lpad(CAST(event_id AS VARCHAR), 12, '0'))) AS close,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type, date_trunc('hour', ts)
""",
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to hourly OHLC bars per event type — the
    classic resample shape (metrics rollup / candle charts). One
    hash-partitioned aggregate: open/close are min_by/max_by on a
    sortable (ts, event_id) composite string, so ties and engine float
    quirks cannot change the winner; no window, no second shuffle.
    At 100 TB the group key (type, hour) is naturally bounded and
    uniform, and the partial aggregation does the heavy lifting
    map-side."""
    e = table(spark, sf_dir, "events")
    ord_key = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.min_by("value", ord_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ord_key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "events_anomaly_zscore",
    oracle="""
WITH r AS (
  SELECT event_id, event_type, value,
         AVG(value) OVER w AS mu,
         STDDEV_SAMP(value) OVER w AS sd,
         COUNT(*) OVER w AS n_hist
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, event_type, ROUND((value - mu) / sd, 6) AS zscore
FROM r
WHERE n_hist >= 10 AND sd > 0 AND abs((value - mu) / sd) > 2.5
""",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score outlier detection: each event scored against the
    trailing 20-event mean/stddev of its type (frame excludes the
    current row — no self-contamination), flag |z| > 2.5 with a >= 10
    history warm-up. One window shuffle on the type key; the trailing
    frame keeps state O(frame) per partition, which is the streaming-
    friendly formulation of monitoring-style anomaly detection."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    scored = e.select(
        "event_id",
        "event_type",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        scored.filter(
            (F.col("n_hist") >= 10) & (F.col("sd") > 0) & (F.abs(z) > 2.5)
        )
        .select("event_id", "event_type", F.round(z, 6).alias("zscore"))
    )


@query(
    "events_markov_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev, event_type AS cur, COUNT(*) AS n,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY prev), 6) AS p
FROM s WHERE prev IS NOT NULL
GROUP BY prev, event_type
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    lag() pairs each event with its predecessor (deterministic
    (ts, event_id) order), then one aggregate counts each (prev, cur)
    edge and normalizes rows into transition probabilities. Two
    shuffles total — the lag window on user_id and the k x k count —
    and the matrix itself is event-type-bounded (tiny) no matter the
    corpus size, so the normalization window is effectively free."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    counts = s.groupBy("prev", F.col("event_type").alias("cur")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = W.partitionBy("prev")
    return counts.select(
        "prev",
        "cur",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 6).alias("p"),
    )


@query(
    "events_sliding_distinct",
    oracle="""
SELECT strftime(make_timestamp((epoch_us(ts) // 900000000) * 900000000
                               - k.k * 900000000), '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
GROUP BY 1
""",
)
def events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per 1-hour window sliding every 15 minutes —
    the concurrent-actives metric. Spark's window() explodes each event
    into its 4 covering windows, then one hash aggregate does the exact
    distinct (expand + two-phase count-distinct rewrite); the oracle
    enumerates the same windows by bucket arithmetic. At 100 TB the
    sketch twin (sketch_hll_mergeable) replaces exact distinct; this key
    pins the exact semantics the sketch approximates."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_users",
            "n_events",
        )
    )


@query(
    "events_pattern_funnel_regex",
    oracle="""
WITH j AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS journey
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(journey) AS BIGINT) AS n_events,
       CAST((length(journey) - length(replace(journey, 'vcp', ''))) / 3 AS BIGINT)
         AS n_vcp_runs,
       CASE WHEN journey LIKE '%vcp%' THEN 1 ELSE 0 END AS has_funnel
FROM j
""",
)
def events_pattern_funnel_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style contiguous pattern detection: each user's
    event stream collapses to an ordered initial-letter journey string
    (event types have unique initials), and view→click→purchase runs
    are counted by contiguous 'vcp' matches — the sequence-mining shape
    (funnel with STRICT adjacency, unlike events_funnel_steps' ordered-
    existence form). One ordered listagg shuffle per user; journeys are
    per-user-bounded so string ops stay O(events) total."""
    from sim_spark.io import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        WITH j AS (
          SELECT user_id,
                 listagg(substring(event_type, 1, 1))
                   WITHIN GROUP (ORDER BY ts, event_id) AS journey
          FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(journey) AS BIGINT) AS n_events,
               CAST((length(journey) - length(replace(journey, 'vcp', ''))) / 3
                    AS BIGINT) AS n_vcp_runs,
               CASE WHEN journey LIKE '%vcp%' THEN 1 ELSE 0 END AS has_funnel
        FROM j
        """
    )


@query(
    "events_max_concurrency",
    oracle="""
WITH pts AS (
  SELECT event_type, ts AS t, 1 AS d FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 10 MINUTE AS t, -1 AS d FROM events
),
sweep AS (
  SELECT event_type,
         SUM(d) OVER (PARTITION BY event_type
                      ORDER BY t, d DESC
                      ROWS UNBOUNDED PRECEDING) AS live
  FROM pts
)
SELECT event_type, CAST(MAX(live) AS BIGINT) AS max_concurrent
FROM sweep GROUP BY event_type
""",
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval overlap per event type: each event opens a
    10-minute activity interval; the classic +1/-1 boundary sweep with
    a running sum finds the maximum number of simultaneously-open
    intervals. Tie rule: at an identical instant the +1 sorts first
    (d DESC), so touching intervals count as overlapping — pinned the
    same way in both engines. One partitioned window per type key; no
    global order, so the sweep shards across the cluster."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    pts = e.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("d")).unionAll(
        e.select(
            "event_type",
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy(F.col("t"), F.desc("d"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sweep = pts.select("event_type", F.sum("d").over(w).alias("live"))
    return sweep.groupBy("event_type").agg(
        F.max("live").cast("bigint").alias("max_concurrent")
    )


@query(
    "events_longest_streak",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         CAST(day - INTERVAL (DENSE_RANK() OVER (PARTITION BY user_id ORDER BY day))
                    DAY AS DATE) AS island
  FROM days
),
runs AS (
  SELECT user_id, island, COUNT(*) AS len FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(SUM(len) AS BIGINT) AS n_active_days
FROM runs GROUP BY user_id
""",
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    engagement metric, solved with the day-minus-dense_rank
    gaps-and-islands trick (consecutive days share one island id, so
    streaks become plain group counts). Distinct-day reduction first
    (events per user per day collapse map-side), then every window and
    aggregate clusters on user_id: one shuffle end to end."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id",
        "day",
        F.date_sub("day", F.dense_rank().over(w)).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("n_active_days"),
    )


@query(
    "events_rfm_segments",
    oracle="""
WITH mx AS (SELECT MAX(ts) AS now FROM events),
per_user AS (
  SELECT user_id,
         date_diff('day', MAX(ts), (SELECT now FROM mx)) AS recency_days,
         COUNT(*) AS frequency,
         SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END
                  AS DECIMAL(30,6))) AS monetary
  FROM events GROUP BY user_id
),
scored AS (
  SELECT user_id, recency_days, frequency,
         CAST(monetary AS DOUBLE) AS monetary,
         NTILE(4) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
         NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_score,
         NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_score
  FROM per_user
)
SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
       frequency, ROUND(monetary, 6) AS monetary,
       CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CASE WHEN r_score = 1 AND f_score = 1 THEN 'champion'
            WHEN r_score >= 3 AND f_score >= 3 THEN 'at_risk'
            ELSE 'regular' END AS segment
FROM scored
""",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-user recency (days since last
    event, anchored to the corpus max so the key is reproducible),
    frequency, and purchase monetary value, each quartiled with
    NTILE(4) under a pinned user_id tie-break, then bucketed into
    champion/at-risk/regular. The per-user aggregate is the only
    corpus-scale shuffle; the ntile windows run over one row per user.
    At 100 TB the unpartitioned ntile would become a percentile-bucket
    join (approx quantiles of the metric), same output contract."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("now"))
    per_user = (
        e.crossJoin(mx)
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("now"), F.max("ts")).cast("bigint").alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                ).cast("decimal(30,6)")
            ).alias("monetary"),
        )
    )
    # r12: three NTILE(4)s without single-partition windows and
    # without ever shuffling the user frame — ops/distrank.ntile_by
    # broadcasts each dimension's 3 quartile-boundary (value, user_id)
    # pairs; tile assignment is a projection. Identical quartiles to
    # the oracle's window formulation at any user count.
    from sim_spark.ops.distrank import ntile_bounds, ntile_col
    from sim_spark.scratch import track_cache

    per_user = track_cache(per_user)
    pu = per_user.withColumn("m_dbl", F.col("monetary").cast("double"))
    b_r = ntile_bounds(pu, "recency_days", "user_id", 4, out="__b_r")
    b_f = ntile_bounds(
        pu, "frequency", "user_id", 4, descending=True, out="__b_f"
    )
    b_m = ntile_bounds(pu, "m_dbl", "user_id", 4, descending=True, out="__b_m")
    scored = (
        pu.crossJoin(F.broadcast(b_r))
        .crossJoin(F.broadcast(b_f))
        .crossJoin(F.broadcast(b_m))
        .select(
            "user_id",
            "recency_days",
            "frequency",
            F.col("m_dbl").alias("monetary"),
            ntile_col("recency_days", "user_id", bnds="__b_r")
            .cast("bigint")
            .alias("r_score"),
            ntile_col("frequency", "user_id", descending=True, bnds="__b_f")
            .cast("bigint")
            .alias("f_score"),
            ntile_col("m_dbl", "user_id", descending=True, bnds="__b_m")
            .cast("bigint")
            .alias("m_score"),
        )
    )
    seg = (
        F.when((F.col("r_score") == 1) & (F.col("f_score") == 1), "champion")
        .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), "at_risk")
        .otherwise("regular")
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        F.round("monetary", 6).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        seg.alias("segment"),
    )


@query(
    "events_time_to_conversion",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
),
conv AS (
  SELECT user_id,
         CAST(date_diff('second', first_view, first_purchase) AS BIGINT) AS delta_s
  FROM firsts
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view
),
bucketed AS (
  SELECT CASE WHEN delta_s < 3600 THEN '0_under_1h'
              WHEN delta_s < 86400 THEN '1_under_1d'
              WHEN delta_s < 604800 THEN '2_under_1w'
              ELSE '3_over_1w' END AS bucket
  FROM conv
)
SELECT bucket, count(*) AS n_users FROM bucketed GROUP BY bucket
""",
)
def events_time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: per user, seconds from first 'view' to first
    'purchase' (only when the purchase follows), bucketed into integer
    time bands. One conditional-min aggregation clustered on user_id —
    no join, no window — then a tiny bucket rollup: the minimal-shuffle
    formulation of time-to-conversion at any scale. Bucket edges and the
    delta are integer seconds, so band membership is engine-exact."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
        ).alias("delta_s")
    )
    bucket = (
        F.when(F.col("delta_s") < 3600, "0_under_1h")
        .when(F.col("delta_s") < 86400, "1_under_1d")
        .when(F.col("delta_s") < 604800, "2_under_1w")
        .otherwise("3_over_1w")
    )
    return (
        conv.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_cumulative_new_users",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT first_day AS day, count(*) AS n_new FROM first_seen GROUP BY first_day
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(n_new AS BIGINT) AS n_new_users,
       CAST(sum(n_new) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM daily ORDER BY day
""",
)
def events_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-growth curve: running count of DISTINCT users ever seen,
    by day. A window count-distinct is unsupported (and would be
    quadratic anyway); the scalable identity is first-seen attribution:
    min(ts) per user (one partial+final aggregate over the full stream),
    roll up to new-users-per-day (bounded by the calendar), then one
    running sum over the tiny day spine. 100 TB of events reduce to one
    user-keyed aggregate + a date-sized window."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("first_day")
    )
    daily = first_seen.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    from sim_spark.ops.distrank import bounded_seq_window

    w = bounded_seq_window("n_new", "first_day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return daily.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        F.col("n_new").cast("long").alias("n_new_users"),
        F.sum("n_new").over(w).cast("long").alias("cum_users"),
    ).orderBy("day")


@query(
    "events_dow_hour_profile",
    oracle="""
SELECT CAST(strftime(ts, '%w') AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hod,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2 ORDER BY dow, hod
""",
)
def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly activity heatmap cells: (day-of-week, hour-of-day) event
    and distinct-user counts — one partial+final aggregate on a 7×24
    key space (Sunday=0 matching strftime %w via dayofweek−1). The
    output is calendar-bounded no matter the input volume; the distinct
    count shuffles on (dow, hod, user) then merges — the two-level
    exact-distinct plan."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("dow", "hod")
    )


@query(
    "events_median_session_length",
    oracle="""
WITH """ + _SESS_CTE + """,
dur AS (
  SELECT user_id, session_no,
         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS d_us
  FROM sess GROUP BY user_id, session_no
),
ranked AS (
  SELECT d_us, row_number() OVER (ORDER BY d_us, user_id, session_no) AS rn,
         count(*) OVER () AS n
  FROM dur
)
SELECT CAST(max(n) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN d_us ELSE 0 END)
            + sum(CASE WHEN rn = n // 2 + 1 THEN d_us ELSE 0 END) AS BIGINT)
         AS median_us_x2,
       ROUND((sum(CASE WHEN rn = (n + 1) // 2 THEN d_us ELSE 0 END)
              + sum(CASE WHEN rn = n // 2 + 1 THEN d_us ELSE 0 END))
             / 2000000.0, 6) AS median_sec
FROM ranked
""",
)
def events_median_session_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median session duration: 30-minute-gap sessionization (the
    events_sessionize_batch shape), per-session duration in integer
    microseconds, then the median as the average of the two middle
    order statistics — selected by row_number with a total tie order,
    so no interpolation semantics can differ between engines. The 2×
    median is emitted as an exact integer alongside the seconds view.

    Scale shape (r12): the value at rank k depends only on the d_us
    MULTISET, so no per-session rank is materialized — the duration
    frame reduces to one row per DISTINCT duration (shuffle-parallel
    groupBy), ops/distrank.cum_below adds the exclusive prefix count
    with bucket-partitioned windows only, and the two middle order
    statistics fall out of a filter. No single-partition sort of the
    session frame anywhere in the plan (the oracle keeps the
    row_number formulation — same numbers, DuckDB's scale is not the
    contract)."""
    from sim_spark.ops.distrank import at_rank, cum_below

    e = table(spark, sf_dir, "events")
    sess = _session_numbers(e)
    dur = sess.groupBy("user_id", "session_no").agg(
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("d_us")
    )
    dist = cum_below(
        dur.groupBy("d_us").agg(F.count(F.lit(1)).alias("cnt")), "d_us", "cnt"
    )
    ntot = dur.agg(F.count(F.lit(1)).alias("n"))
    k1 = F.expr("(n + 1) div 2")
    k2 = F.expr("n div 2 + 1")
    picked = dist.crossJoin(F.broadcast(ntot)).select(
        "n",
        (
            F.col("d_us")
            * (at_rank(k1).cast("long") + at_rank(k2).cast("long"))
        ).alias("sel"),
    )
    return picked.agg(
        F.max("n").cast("long").alias("n_sessions"),
        F.sum("sel").cast("long").alias("median_us_x2"),
        F.round(F.sum("sel") / 2000000.0, 6).alias("median_sec"),
    )


@query(
    "events_mau_wau_dau",
    oracle="""
WITH dau AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket,
         count(DISTINCT user_id) AS n
  FROM events GROUP BY 1
),
wau AS (
  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS bucket,
         count(DISTINCT user_id) AS n
  FROM events GROUP BY 1
),
mau AS (
  SELECT strftime(date_trunc('month', ts), '%Y-%m-%d') AS bucket,
         count(DISTINCT user_id) AS n
  FROM events GROUP BY 1
)
SELECT 'day' AS grain, bucket, CAST(n AS BIGINT) AS n_active FROM dau
UNION ALL SELECT 'week', bucket, CAST(n AS BIGINT) FROM wau
UNION ALL SELECT 'month', bucket, CAST(n AS BIGINT) FROM mau
ORDER BY grain, bucket
""",
)
def events_mau_wau_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU in one report: exact distinct actives at three
    calendar grains, unioned long-form. Each grain is the two-level
    exact-distinct plan (pre-aggregate on (bucket, user), then count) —
    at 100 TB the right refactor is one distinct (day, user) base frame
    rolled up to week/month, trading two scans for one; both shapes
    share the oracle."""
    e = table(spark, sf_dir, "events")

    def grain(name: str, trunc: str) -> DataFrame:
        return (
            e.groupBy(
                F.date_format(F.date_trunc(trunc, "ts"), "yyyy-MM-dd").alias(
                    "bucket"
                )
            )
            .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
            .select(F.lit(name).alias("grain"), "bucket", "n_active")
        )

    return (
        grain("day", "day")
        .unionAll(grain("week", "week"))
        .unionAll(grain("month", "month"))
        .orderBy("grain", "bucket")
    )


@query(
    "events_ltv_cohort",
    oracle=f"""
WITH first_week AS ({_COHORT_FIRST_WEEK_SQL}),
rev AS (
  SELECT e.user_id, f.cohort_week,
         CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT)
           AS week_offset,
         CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents
  FROM events e JOIN first_week f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
),
cohort_size AS (
  SELECT cohort_week, COUNT(*) AS n_users FROM first_week GROUP BY cohort_week
),
cell AS (
  SELECT cohort_week, week_offset, CAST(SUM(cents) AS BIGINT) AS rev_cents
  FROM rev GROUP BY cohort_week, week_offset
),
cum AS (
  SELECT cohort_week, week_offset,
         CAST(SUM(rev_cents) OVER (PARTITION BY cohort_week ORDER BY week_offset
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
  FROM cell
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       c.week_offset,
       CAST(s.n_users AS BIGINT) AS n_users,
       ROUND(c.cum_cents / (s.n_users * 100.0), 4) AS cum_ltv
FROM cum c JOIN cohort_size s ON c.cohort_week = s.cohort_week
ORDER BY cohort_week, week_offset
""",
)
def events_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV matrix: cohort (first-activity week) x age
    (week offset) -> cumulative purchase revenue per cohort member —
    the growth-analytics artifact next to the retention matrix (which
    counts users; this sums money). Revenue moves to integer cents
    before ANY aggregate, the running total is a window over the tiny
    per-cell table (cohorts x offsets rows, not events), and the only
    event-scale shuffle is the per-cell group-by — keyed like the final
    output. The division by cohort size happens once per output row
    from exact integers."""
    e = table(spark, sf_dir, "events")
    first_week = cohort_first_week(e)
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_week, "user_id")
        .select(
            "cohort_week",
            cohort_week_offset().alias("week_offset"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        )
    )
    from pyspark.sql import Window as W

    cohort_size = first_week.groupBy("cohort_week").agg(
        F.count("*").alias("n_users")
    )
    cell = rev.groupBy("cohort_week", "week_offset").agg(
        F.sum("cents").alias("rev_cents")
    )
    w = (
        W.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = cell.select(
        "cohort_week", "week_offset", F.sum("rev_cents").over(w).alias("cum_cents")
    )
    return (
        cum.join(F.broadcast(cohort_size), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("n_users").cast("bigint").alias("n_users"),
            F.round(
                F.col("cum_cents") / (F.col("n_users") * 100.0), 4
            ).alias("cum_ltv"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_path_trigrams",
    oracle="""
WITH s AS (
  SELECT event_type,
         LAG(event_type, 1) OVER w AS p1,
         LAG(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
t AS (
  SELECT p2 || '>' || p1 || '>' || event_type AS trigram, COUNT(*) AS n
  FROM s WHERE p2 IS NOT NULL GROUP BY 1
)
SELECT trigram, n, ROUND(n * 1.0 / SUM(n) OVER (), 6) AS share
FROM t ORDER BY n DESC, trigram LIMIT 25
""",
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 per-user behavioural path trigrams (a>b>c event-type
    sequences): two lag() taps over the deterministic (ts, event_id)
    per-user order, then one k^3-bounded aggregate. The n-gram table is
    event-type-bounded (|types|^3 rows) regardless of corpus size, so
    the share-normalization window and the top-25 cut both run on a tiny
    frame; corpus cost is exactly one user-partitioned sort window plus
    one partial+final count — the Markov-transition plan one lag deeper.
    Boundary ties at rank 25 are broken lexicographically."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    t = s.groupBy(
        F.concat_ws(">", "p2", "p1", "event_type").alias("trigram")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        t.select(
            "trigram",
            "n",
            F.round(
                F.col("n") * 1.0 / F.sum("n").over(_bounded_total_window("n")), 6
            ).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n"), "trigram")
        .limit(25)
    )


@query(
    "events_hourly_occupancy",
    oracle="""
WITH """ + _SESS_CTE + """,
iv AS (
  SELECT epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
  FROM sess GROUP BY user_id, session_no
),
ex AS (
  SELECT s_us, e_us,
         unnest(generate_series(s_us // 3600000000,
                                e_us // 3600000000)) AS hb
  FROM iv
)
SELECT strftime(make_timestamp(hb * 3600000000), '%Y-%m-%d %H:%M:%S')
         AS hour_bucket,
       COUNT(*) AS n_sessions,
       CAST(SUM(LEAST(e_us, (hb + 1) * 3600000000)
                - GREATEST(s_us, hb * 3600000000)) AS BIGINT) AS occupancy_us
FROM ex GROUP BY 1
""",
)
def events_hourly_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted hourly occupancy: sessionize (identical 30-minute
    gap rule as `events_sessionize_batch`), then credit each session's
    microsecond-exact overlap to every hour bucket it touches — the
    interval-to-bucket weighted-overlap join, done as bucket EXPLODE +
    keyed aggregate rather than an interval join. `events_max_concurrency`
    counts heads at instants; this integrates seconds over buckets.

    Scale shape: the explode fanout is bounded by session span (gap rule
    caps idle stretch, so a session spans few hours), the bucket key is
    dense and uniform (no skew), and all overlap arithmetic is integer
    epoch-µs (`div`-bucketing, no float boundary). One user-keyed window
    chain + one bucket-keyed aggregate; nothing pairwise."""
    from sim_spark.exprs import ts_str

    e = table(spark, sf_dir, "events")
    sess = _session_numbers(e)
    iv = sess.groupBy("user_id", "session_no").agg(
        F.unix_micros(F.min("ts")).alias("s_us"),
        F.unix_micros(F.max("ts")).alias("e_us"),
    )
    hour_us = F.lit(3600000000)
    ex = iv.select(
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                F.expr("s_us div 3600000000"), F.expr("e_us div 3600000000")
            )
        ).alias("hb"),
    )
    return ex.groupBy(
        ts_str(F.timestamp_micros(F.col("hb") * hour_us)).alias("hour_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.least(F.col("e_us"), (F.col("hb") + 1) * hour_us)
            - F.greatest(F.col("s_us"), F.col("hb") * hour_us)
        )
        .cast("bigint")
        .alias("occupancy_us"),
    )


@query(
    "events_uplift_did",
    oracle="""
WITH treat AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-16 00:00:00'
),
cells AS (
  SELECT CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS treated,
         CASE WHEN e.ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END
           AS post,
         CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS yc
  FROM events e LEFT JOIN treat t ON e.user_id = t.user_id
  WHERE e.event_type = 'purchase'
),
agg AS (
  SELECT treated, post, CAST(SUM(yc) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM cells GROUP BY treated, post
)
SELECT MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_treat_pre,
       MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_treat_post,
       MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_ctrl_pre,
       MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_ctrl_post,
       ROUND(MAX(CASE WHEN treated = 1 AND post = 0 THEN s * 1.0 / (100.0 * n) END), 6) AS mean_treat_pre,
       ROUND(MAX(CASE WHEN treated = 1 AND post = 1 THEN s * 1.0 / (100.0 * n) END), 6) AS mean_treat_post,
       ROUND(MAX(CASE WHEN treated = 0 AND post = 0 THEN s * 1.0 / (100.0 * n) END), 6) AS mean_ctrl_pre,
       ROUND(MAX(CASE WHEN treated = 0 AND post = 1 THEN s * 1.0 / (100.0 * n) END), 6) AS mean_ctrl_post,
       ROUND((MAX(CASE WHEN treated = 1 AND post = 1 THEN s * 1.0 / (100.0 * n) END)
              - MAX(CASE WHEN treated = 1 AND post = 0 THEN s * 1.0 / (100.0 * n) END))
             - (MAX(CASE WHEN treated = 0 AND post = 1 THEN s * 1.0 / (100.0 * n) END)
                - MAX(CASE WHEN treated = 0 AND post = 0 THEN s * 1.0 / (100.0 * n) END)),
             6) AS did_estimate
FROM agg
""",
)
def events_uplift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences uplift: treatment = users who signed up
    in the PRE period (assignment fixed before the cut, as causal
    hygiene requires), outcome = mean purchase value, period cut at
    Jan 16. DiD = (treat post − pre) − (control post − pre) from the
    four exact centi-integer cell sums — every mean is one division of
    exact integers, so the whole 2×2 table and the estimate hash-match.

    Scale shape: the treatment roster is a per-user DISTINCT (one
    shuffle) joined onto purchases (AQE broadcasts it when small); the
    2×2 reduce is a partial+final aggregate; the pivot runs on 4 rows.
    The experiment-analytics companion to events_ab_experiment, which
    randomizes by hash rather than observing a cohort."""
    cut = "2024-01-16 00:00:00"
    e = table(spark, sf_dir, "events")
    treat = (
        e.filter((F.col("event_type") == "signup") & (F.col("ts") < F.lit(cut).cast("timestamp")))
        .select("user_id")
        .distinct()
        .withColumn("t", F.lit(1))
    )
    cells = (
        e.filter(F.col("event_type") == "purchase")
        .join(treat, "user_id", "left")
        .select(
            F.coalesce(F.col("t"), F.lit(0)).alias("treated"),
            (F.col("ts") >= F.lit(cut).cast("timestamp")).cast("int").alias("post"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("yc"),
        )
    )
    agg = cells.groupBy("treated", "post").agg(
        F.sum("yc").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )

    def cell(tr, po, col):
        return F.max(
            F.when((F.col("treated") == tr) & (F.col("post") == po), col)
        )

    mean = lambda tr, po: cell(tr, po, F.col("s") * 1.0 / (100.0 * F.col("n")))  # noqa: E731
    return agg.agg(
        cell(1, 0, F.col("n")).alias("n_treat_pre"),
        cell(1, 1, F.col("n")).alias("n_treat_post"),
        cell(0, 0, F.col("n")).alias("n_ctrl_pre"),
        cell(0, 1, F.col("n")).alias("n_ctrl_post"),
        F.round(mean(1, 0), 6).alias("mean_treat_pre"),
        F.round(mean(1, 1), 6).alias("mean_treat_post"),
        F.round(mean(0, 0), 6).alias("mean_ctrl_pre"),
        F.round(mean(0, 1), 6).alias("mean_ctrl_post"),
        F.round(
            (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0)), 6
        ).alias("did_estimate"),
    )


@query(
    "events_survival_km",
    oracle="""
WITH su AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS entry FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
ev AS (
  SELECT e.user_id,
         MIN(date_diff('day', su.entry, CAST(e.ts AS DATE))) AS t_event
  FROM events e JOIN su USING (user_id)
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= su.entry
  GROUP BY e.user_id
),
la AS (
  SELECT e.user_id,
         MAX(date_diff('day', su.entry, CAST(e.ts AS DATE))) AS t_last
  FROM events e JOIN su USING (user_id)
  GROUP BY e.user_id
),
outc AS (
  SELECT su.user_id, COALESCE(ev.t_event, la.t_last) AS t,
         CASE WHEN ev.t_event IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM su LEFT JOIN ev USING (user_id) JOIN la USING (user_id)
),
daily AS (
  SELECT t, CAST(SUM(e) AS BIGINT) AS d, CAST(SUM(1 - e) AS BIGINT) AS c
  FROM outc GROUP BY t
),
risk AS (
  SELECT t, d, c,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM outc)
           - COALESCE(CAST(SUM(d + c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                      0) AS n
  FROM daily
),
arr AS (SELECT list((n - d) * 1.0 / n ORDER BY t) AS fs FROM risk),
idx AS (
  SELECT t, n, d, c, ROW_NUMBER() OVER (ORDER BY t) AS i FROM risk
)
SELECT i.t AS day, i.n AS n_risk, i.d AS n_events, i.c AS n_censored,
       ROUND(list_reduce((a.fs)[1:CAST(i.i AS INTEGER)], (x, y) -> x * y), 6)
         AS survival
FROM idx i CROSS JOIN arr a
""",
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-purchase survival with REAL right-censoring:
    cohort = signup users, event = first purchase at/after entry day,
    censoring = last observed activity for never-purchasers (lost to
    follow-up — censor times vary per user, so the product does NOT
    telescope away and the estimator is the genuine KM).

    Exactness without libm: risk sets and event counts are exact
    integers; each daily factor (n_t − d_t)/n_t is one division of
    exact integers (bit-identical per element), and the cumulative
    product is an ORDERED LEFT FOLD over the collected factor array —
    Spark `F.aggregate` and DuckDB `list_reduce` multiply the same
    doubles in the same order, so S(t) matches to the bit with no
    exp/ln anywhere. Scale shape: three user-keyed reduces to the
    outcome frame, one day-keyed reduce to the KM table (time-bounded,
    ~30 rows); the O(k²) prefix folds run on that bounded frame."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    day = F.to_date("ts")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(day).alias("entry"))
    )
    ev = (
        e.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(day >= F.col("entry"))
        .groupBy("user_id")
        .agg(F.min(F.datediff(day, F.col("entry"))).alias("t_event"))
    )
    la = (
        e.join(su, "user_id")
        .groupBy("user_id")
        .agg(F.max(F.datediff(day, F.col("entry"))).alias("t_last"))
    )
    outc = (
        su.join(ev, "user_id", "left")
        .join(la, "user_id")
        .select(
            F.coalesce(F.col("t_event"), F.col("t_last")).alias("t"),
            F.when(F.col("t_event").isNotNull(), 1).otherwise(0).alias("e"),
        )
    )
    daily = outc.groupBy("t").agg(
        F.sum("e").cast("bigint").alias("d"),
        F.sum(1 - F.col("e")).cast("bigint").alias("c"),
    )
    total = outc.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    from sim_spark.ops.distrank import bounded_seq_window

    wcum = bounded_seq_window("d", "t").rowsBetween(W.unboundedPreceding, -1)
    risk = daily.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        "c",
        (
            F.col("total")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(wcum).cast("bigint"), F.lit(0)
            )
        ).alias("n"),
    )
    arr = risk.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "t", ((F.col("n") - F.col("d")) * 1.0 / F.col("n")).alias("f")
                    )
                )
            ),
            lambda x: x["f"],
        ).alias("fs")
    )
    idx = risk.select(
        "t", "n", "d", "c",
        F.row_number().over(bounded_seq_window("d", "t")).alias("i"),
    )
    surv = F.aggregate(
        F.slice(F.col("fs"), 1, F.col("i")),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return idx.crossJoin(F.broadcast(arr)).select(
        F.col("t").alias("day"),
        F.col("n").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.round(surv, 6).alias("survival"),
    )


@query(
    "events_poisson_rate_test",
    oracle="""
WITH bounds AS (
  SELECT epoch_us(MIN(ts)) AS t0, epoch_us(MAX(ts)) AS t1 FROM events
),
cells AS (
  SELECT CASE WHEN epoch_us(e.ts) * 2 < b.t0 + b.t1 THEN 0 ELSE 1 END AS half,
         CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END AS is_err
  FROM events e CROSS JOIN bounds b
),
agg AS (
  SELECT CAST(SUM(CASE WHEN half = 0 THEN is_err ELSE 0 END) AS BIGINT) AS k1,
         CAST(SUM(CASE WHEN half = 1 THEN is_err ELSE 0 END) AS BIGINT) AS k2,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM cells
)
SELECT k1, k2, n1, n2,
       ROUND(k1 * 1.0 / n1, 6) AS rate1,
       ROUND(k2 * 1.0 / n2, 6) AS rate2,
       ROUND((k1 * 1.0 / n1 - k2 * 1.0 / n2)
             / sqrt((k1 + k2) * 1.0 / (n1 + n2)
                    * (1.0 - (k1 + k2) * 1.0 / (n1 + n2))
                    * (1.0 / n1 + 1.0 / n2)), 6) AS z_stat
FROM agg
""",
)
def events_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample error-rate comparison between the first and second
    half of the observation window (exposure split at the µs-exact
    midpoint, so both engines cut the same events): pooled two-
    proportion z statistic — the monitoring primitive behind "did the
    error rate move after the deploy?". Every input to the statistic is
    an exact integer count; rates and z are final scalar expressions
    (one sqrt), so the whole test hash-matches. One conditional-sum
    corpus reduce; the 2-row bounds frame broadcasts."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.unix_micros(F.min("ts")).alias("t0"),
        F.unix_micros(F.max("ts")).alias("t1"),
    )
    cells = e.crossJoin(F.broadcast(bounds)).select(
        F.when(
            F.unix_micros(F.col("ts")) * 2 < F.col("t0") + F.col("t1"), 0
        )
        .otherwise(1)
        .alias("half"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
    )
    agg = cells.agg(
        F.sum(F.when(F.col("half") == 0, F.col("is_err")).otherwise(0))
        .cast("bigint")
        .alias("k1"),
        F.sum(F.when(F.col("half") == 1, F.col("is_err")).otherwise(0))
        .cast("bigint")
        .alias("k2"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("bigint").alias("n2"),
    )
    p = (F.col("k1") + F.col("k2")) * 1.0 / (F.col("n1") + F.col("n2"))
    return agg.select(
        "k1",
        "k2",
        "n1",
        "n2",
        F.round(F.col("k1") * 1.0 / F.col("n1"), 6).alias("rate1"),
        F.round(F.col("k2") * 1.0 / F.col("n2"), 6).alias("rate2"),
        F.round(
            (F.col("k1") * 1.0 / F.col("n1") - F.col("k2") * 1.0 / F.col("n2"))
            / F.sqrt(
                p * (1.0 - p) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
            ),
            6,
        ).alias("z_stat"),
    )


@query(
    "events_bot_interevent",
    oracle="""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS g
  FROM events
),
ranked AS (
  SELECT user_id, g,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY g) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS cnt
  FROM gaps WHERE g IS NOT NULL
),
per_user AS (
  SELECT user_id, CAST(MAX(cnt) + 1 AS BIGINT) AS n_events,
         CAST(SUM(g) * (CASE WHEN MAX(cnt) % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT)
           AS m2
  FROM ranked
  WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
  GROUP BY user_id HAVING MAX(cnt) >= 19
),
gran AS (
  SELECT m2, ROW_NUMBER() OVER (ORDER BY m2, user_id) AS rn,
         COUNT(*) OVER () AS cnt
  FROM per_user
),
g2 AS (
  SELECT CAST(SUM(m2) * (CASE WHEN MAX(cnt) % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT)
           AS g2
  FROM gran WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
)
SELECT p.user_id, p.n_events, p.m2 AS median_gap_x2_us,
       (4 * p.m2 < g.g2) AS is_bot
FROM per_user p CROSS JOIN g2 g
ORDER BY p.m2, p.user_id LIMIT 10
""",
)
def events_bot_interevent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-time abuse profile — the bot gate corpus pipelines
    run before counting users: per user (>= 20 events) the exact median
    inter-event gap (emitted as the 2x-median integer, the
    events_median_session_length convention, so odd/even counts stay
    exact), flagged as bot-like when the user's median gap is under
    HALF the median-of-medians — a data-driven threshold that is one
    integer comparison (4*m2 < G2), no float boundary. Returns the 10
    fastest users.

    Scale shape: one user-keyed lag window (gaps), per-user medians by
    explicit order statistics inside the same user partitioning, and
    the global median-of-medians via ops/distrank.cum_below over the
    DISTINCT per-user medians (r12) — bucket-partitioned prefix
    counts, no unpartitioned sort over the user frame. Nothing
    pairwise anywhere."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(wu))
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    wr = W.partitionBy("user_id").orderBy("g")
    wc = W.partitionBy("user_id")
    ranked = gaps.select(
        "user_id",
        "g",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    k1 = ((F.col("cnt") + 1) / 2).cast("long")
    k2 = ((F.col("cnt") + 2) / 2).cast("long")
    per_user = (
        ranked.filter((F.col("rn") == k1) | (F.col("rn") == k2))
        .groupBy("user_id")
        .agg(
            (F.max("cnt") + 1).cast("bigint").alias("n_events"),
            (
                F.sum("g")
                * F.when(F.max("cnt") % 2 == 1, 2).otherwise(1)
            )
            .cast("bigint")
            .alias("m2"),
            F.max("cnt").alias("cnt"),
        )
        .filter(F.col("cnt") >= 19)
        .drop("cnt")
    )
    from sim_spark.ops.distrank import at_rank, cum_below

    distm = cum_below(
        per_user.groupBy("m2").agg(F.count(F.lit(1)).alias("cnt")), "m2", "cnt"
    )
    nu = per_user.agg(F.count(F.lit(1)).alias("ucnt"))
    j1 = ((F.col("ucnt") + 1) / 2).cast("long")
    j2 = ((F.col("ucnt") + 2) / 2).cast("long")
    # A distinct median value covering BOTH middle ranks contributes
    # twice — exactly the odd-count ×2 of the row_number formulation.
    g2 = (
        distm.crossJoin(F.broadcast(nu))
        .agg(
            F.sum(
                F.col("m2")
                * (at_rank(j1).cast("long") + at_rank(j2).cast("long"))
            )
            .cast("bigint")
            .alias("g2")
        )
    )
    return (
        per_user.crossJoin(F.broadcast(g2))
        .select(
            "user_id",
            "n_events",
            F.col("m2").alias("median_gap_x2_us"),
            (4 * F.col("m2") < F.col("g2")).alias("is_bot"),
        )
        .orderBy("median_gap_x2_us", "user_id")
        .limit(10)
    )


@query(
    "events_max_drawdown",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END)
              - SUM(CASE WHEN event_type = 'error' THEN 100 ELSE 0 END)
           AS BIGINT) AS pnl_centi
  FROM events GROUP BY 1
),
curve AS (
  SELECT d, cum,
         CAST(MAX(cum) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS peak
  FROM (SELECT d, CAST(SUM(pnl_centi) OVER (ORDER BY d
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM daily)
),
dd AS (
  SELECT d, cum, peak, peak - cum AS drawdown,
         ROW_NUMBER() OVER (ORDER BY peak - cum DESC, d) AS rn
  FROM curve
)
SELECT strftime(d, '%Y-%m-%d') AS trough_day,
       ROUND(drawdown / 100.0, 2) AS max_drawdown,
       ROUND(peak / 100.0, 2) AS peak_value,
       ROUND(cum / 100.0, 2) AS trough_value,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM dd WHERE drawdown = 0) AS n_peak_days
FROM dd WHERE rn = 1
""",
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily net revenue curve (purchase value
    minus a fixed error penalty): running cumulative sum, running peak,
    and the deepest peak-to-trough gap — the risk metric every
    monitoring dashboard wants next to the revenue line. All integer
    centi-units through both nested running windows (a window OVER a
    window aggregate), so the argmax day and every value hash-match;
    earliest day breaks drawdown ties.

    Scale shape: one corpus-keyed integer reduce to the daily frame,
    then the window chain runs on the time-bounded curve. The nested
    max-over-cumsum is the textbook single-pass drawdown; no self-join
    over days."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        (
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(0)
            )
            - F.sum(F.when(F.col("event_type") == "error", 100).otherwise(0))
        )
        .cast("bigint")
        .alias("pnl_centi")
    )
    from sim_spark.ops.distrank import bounded_seq_window

    wcum = bounded_seq_window("pnl_centi", "d").rowsBetween(
        W.unboundedPreceding, 0
    )
    wpeak = bounded_seq_window("cum", "d").rowsBetween(W.unboundedPreceding, 0)
    curve = daily.select(
        "d", F.sum("pnl_centi").over(wcum).cast("bigint").alias("cum")
    ).select("d", "cum", F.max("cum").over(wpeak).cast("bigint").alias("peak"))
    dd = curve.select(
        "d",
        "cum",
        "peak",
        (F.col("peak") - F.col("cum")).alias("drawdown"),
        F.row_number()
        .over(
            bounded_seq_window("cum", F.desc(F.col("peak") - F.col("cum")), "d")
        )
        .alias("rn"),
    )
    n_peak = dd.filter(F.col("drawdown") == 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_peak_days")
    )
    return (
        dd.filter(F.col("rn") == 1)
        .crossJoin(F.broadcast(n_peak))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("trough_day"),
            F.round(F.col("drawdown") / 100.0, 2).alias("max_drawdown"),
            F.round(F.col("peak") / 100.0, 2).alias("peak_value"),
            F.round(F.col("cum") / 100.0, 2).alias("trough_value"),
            "n_peak_days",
        )
    )
