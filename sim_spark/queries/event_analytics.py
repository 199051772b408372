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


@query(
    "events_cohort_retention",
    oracle="""
WITH first_week AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
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
    first_week = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(first_week, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                        - F.unix_timestamp("cohort_week")
                    )
                    / (7 * 86400)
                ).cast("bigint")
            ).alias("week_offset"),
        )
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
