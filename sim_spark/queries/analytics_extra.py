"""Round-6 analytics additions, all fully DuckDB-oracled (SURVEY.md §2.13).

Three themes:

- **Sketch promotion**: ``sketch_cms_exacthash`` is the oracle-checkable
  twin of the rows-only ``sketch_cms_topk`` (graph_sketch.py) — the
  xxhash64 family is Spark-private, so this twin swaps in md5-derived
  bucket hashes both engines compute bit-identically (the
  dedup_minhash_exactperm trick, minhash_oracle.py).
- **Statistical tests as single-pass aggregates**: Welch's t, the
  Mann-Whitney U, and a closed-form 2-feature OLS — each reduces the fact
  table to a handful of exact decimal moments and then evaluates one
  shared arithmetic formula. The formula TEXT is shared between the Spark
  plan and the oracle (module constants), so both engines execute the
  same IEEE expression over bit-identical inputs: no tolerance needed,
  the 6-dp round is belt-and-braces.
- **Time-series depth**: linear-interpolation gap fill (the companion to
  ``win_gap_fill_locf``'s LOCF) and a CUSUM changepoint scan, both as
  keyed windows with exact decimal accumulation.

Scale notes per key in the docstrings; the common rule: per-group state
is O(1) (moments) or O(grid) (gap fill), every shuffle is on a real key
(user_id, event_type, value-bucket, CMS cell), and nothing collects to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sim_spark.exprs import DEC, dsum, sql_davg, sql_dsum
from sim_spark.io import table, table_count
from sim_spark.ops.ladders import pow2_sqrt_ladder, pow2_sqrt_ladder_sql
from sim_spark.registry import query

# ---------------------------------------------------------------------------
# sketch_cms_exacthash

_CMS_DEPTH, _CMS_WIDTH = 3, 128


def _sql_cms_cell(r: str, word: str) -> str:
    return f"(('0x' || substr(md5({r}::VARCHAR || {word}), 1, 12))::BIGINT % {_CMS_WIDTH})"


def _spark_cms_cell(r: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(str(r)), F.col("word"))), 1, 12), 16, 10)
        .cast("long")
        % _CMS_WIDTH
    )


@query(
    "sketch_cms_exacthash",
    oracle=f"""
WITH words AS (SELECT unnest(str_split(text, ' ')) AS word FROM documents),
rows_ AS (SELECT unnest(range(0, {_CMS_DEPTH})) AS r),
cells AS (SELECT word, r, {_sql_cms_cell('r', 'word')} AS c FROM words, rows_),
cms AS (SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
vocab AS (SELECT DISTINCT word FROM words),
vcells AS (SELECT word, r, {_sql_cms_cell('r', 'word')} AS c FROM vocab, rows_),
est AS (SELECT v.word, MIN(m.cnt) AS est
        FROM vcells v JOIN cms m ON v.r = m.r AND v.c = m.c GROUP BY 1)
SELECT word, CAST(est AS BIGINT) AS est
FROM est ORDER BY est DESC, word LIMIT 20
""",
)
def sketch_cms_exacthash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters with an ENGINE-SHARED hash family:
    bucket = md5(depth_salt || word) → 48-bit int → mod width, so the
    whole sketch (counters, estimates, top-20) is oracle-checkable —
    unlike the xxhash64 twin ``sketch_cms_topk`` which is rows-only.

    Scale shape is unchanged from the twin: the sketch build is ONE
    (row, col)-keyed count of bounded width depth×width regardless of
    corpus size (counters are sums → partial aggregation merges shards
    map-side), and estimates join the distinct vocabulary against the
    tiny sketch."""
    d = table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _spark_cms_cell(r).alias("c"))
            for r in range(_CMS_DEPTH)
        ]
    )
    cms = (
        words.select(F.explode(cells).alias("cell"))
        .groupBy("cell.r", "cell.c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = (
        words.distinct()
        .select("word", F.explode(cells).alias("cell"))
        .select("word", "cell.r", "cell.c")
    )
    est = vocab.join(cms, ["r", "c"]).groupBy("word").agg(F.min("cnt").alias("est"))
    return est.orderBy(F.desc("est"), "word").limit(20)


# ---------------------------------------------------------------------------
# stats_welch_ttest — shared formula text, evaluated by both engines.

_WELCH_FORMULAS = [
    "CAST(n1 AS BIGINT) AS n_a",
    "CAST(n2 AS BIGINT) AS n_b",
    "ROUND(s1 / n1, 6) AS mean_a",
    "ROUND(s2 / n2, 6) AS mean_b",
    "ROUND((s1 / n1 - s2 / n2) / sqrt(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1"
    " + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2), 6) AS t_stat",
    "ROUND(power(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1"
    " + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2, 2)"
    " / (power(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1, 2) / (n1 - 1)"
    " + power(((q2 - s2 * s2 / n2) / (n2 - 1)) / n2, 2) / (n2 - 1)), 6) AS df",
]


@query(
    "stats_welch_ttest",
    oracle=f"""
WITH m AS (
  SELECT CAST(COUNT(*) FILTER (event_type = 'purchase') AS DOUBLE) AS n1,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) FILTER (event_type = 'purchase') AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(30,6))) FILTER (event_type = 'purchase') AS DOUBLE) AS q1,
         CAST(COUNT(*) FILTER (event_type = 'click') AS DOUBLE) AS n2,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) FILTER (event_type = 'click') AS DOUBLE) AS s2,
         CAST(SUM(CAST(value * value AS DECIMAL(30,6))) FILTER (event_type = 'click') AS DOUBLE) AS q2
  FROM events WHERE event_type IN ('purchase', 'click')
)
SELECT {', '.join(_WELCH_FORMULAS)} FROM m
""",
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (purchase vs click event values):
    one conditional-aggregate pass reduces the stream to six exact
    decimal moments (n, Σx, Σx² per group), then the t statistic and
    Welch–Satterthwaite df evaluate from the SAME formula text the
    oracle runs — identical doubles in, identical doubles out.

    Scale: O(1) state, partial+final aggregate, no shuffle beyond the
    6-value reduce. This is how a 100 TB A/B readout should run."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    is_a = F.col("event_type") == "purchase"
    v = F.col("value")
    m = e.agg(
        F.count(F.when(is_a, 1)).cast("double").alias("n1"),
        F.sum(F.when(is_a, v).cast(DEC)).cast("double").alias("s1"),
        F.sum(F.when(is_a, v * v).cast(DEC)).cast("double").alias("q1"),
        F.count(F.when(~is_a, 1)).cast("double").alias("n2"),
        F.sum(F.when(~is_a, v).cast(DEC)).cast("double").alias("s2"),
        F.sum(F.when(~is_a, v * v).cast(DEC)).cast("double").alias("q2"),
    )
    return m.selectExpr(*_WELCH_FORMULAS)


# ---------------------------------------------------------------------------
# stats_mannwhitney_u — midranks via per-distinct-value aggregation.

_MWU_FORMULAS = [
    "CAST(n1 AS BIGINT) AS n_a",
    "CAST(n2 AS BIGINT) AS n_b",
    "ROUND(r1d / 2.0 - n1 * (n1 + 1) / 2.0, 6) AS u_stat",
    "ROUND((r1d / 2.0 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)"
    " / sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0), 6) AS z_score",
]


@query(
    "stats_mannwhitney_u",
    oracle=f"""
WITH pv AS (
  SELECT value,
         COUNT(*) FILTER (event_type = 'view') AS c1,
         COUNT(*) AS ct
  FROM events WHERE event_type IN ('view', 'error')
  GROUP BY value
),
rk AS (
  SELECT c1, ct,
         COALESCE(SUM(ct) OVER (ORDER BY value
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_less
  FROM pv
),
m AS (
  SELECT CAST(SUM(c1) AS DOUBLE) AS n1,
         CAST(SUM(ct - c1) AS DOUBLE) AS n2,
         CAST(SUM(c1 * (2 * cum_less + ct + 1)) AS DOUBLE) AS r1d
  FROM rk
)
SELECT {', '.join(_MWU_FORMULAS)} FROM m
""",
)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (view vs error event values) without a global
    per-row rank: aggregate to DISTINCT values first (c1, ct per value),
    cumulative-count the ordered value groups, and recover the doubled
    midrank sum as Σ c1·(2·cum_less + ct + 1) — all integers, so the
    rank bookkeeping is exact in both engines; only the final U and
    normal-approximation z touch floats, from the shared formula text.

    Scale: the only ordered pass runs over DISTINCT values (already
    reduced), not rows — the classic trick for rank statistics on big
    data. The window is a single global cumsum; at 100 TB you'd
    range-partition it, which Spark's window-on-sorted-exchange does."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "error"))
    pv = e.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("c1"),
        F.count(F.lit(1)).alias("ct"),
    )
    from sim_spark.ops.distrank import cum_below

    rk = cum_below(pv, "value", "ct", out="cum_less").select(
        "c1", "ct", "cum_less"
    )
    m = rk.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum(F.col("ct") - F.col("c1")).cast("double").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cum_less") + F.col("ct") + 1))
        .cast("double")
        .alias("r1d"),
    )
    return m.selectExpr(*_MWU_FORMULAS)


# ---------------------------------------------------------------------------
# ml_ols_normal_eq — closed-form 2-feature OLS via Cramer's rule.


def _det3(
    a: str, b: str, c: str, d: str, e: str, f: str, g: str, h: str, i: str
) -> str:
    return (
        f"({a} * ({e} * {i} - {f} * {h}) - {b} * ({d} * {i} - {f} * {g})"
        f" + {c} * ({d} * {h} - {e} * {g}))"
    )


# Normal-equation matrix A = [[n,sx1,sx2],[sx1,s11,s12],[sx2,s12,s22]],
# rhs b = [sy, s1y, s2y]; Cramer columns replace A's k-th column with b.
_DET_A = _det3("n", "sx1", "sx2", "sx1", "s11", "s12", "sx2", "s12", "s22")
_DET_B0 = _det3("sy", "sx1", "sx2", "s1y", "s11", "s12", "s2y", "s12", "s22")
_DET_B1 = _det3("n", "sy", "sx2", "sx1", "s1y", "s12", "sx2", "s2y", "s22")
_DET_B2 = _det3("n", "sx1", "sy", "sx1", "s11", "s1y", "sx2", "s12", "s2y")

_OLS_FORMULAS = [
    "CAST(n AS BIGINT) AS n",
    f"ROUND({_DET_B0} / {_DET_A}, 6) AS beta0",
    f"ROUND({_DET_B1} / {_DET_A}, 6) AS beta1",
    f"ROUND({_DET_B2} / {_DET_A}, 6) AS beta2",
]


@query(
    "ml_ols_normal_eq",
    oracle=f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {sql_dsum('l_quantity')} AS sx1,
         {sql_dsum('l_discount')} AS sx2,
         {sql_dsum('l_extendedprice')} AS sy,
         {sql_dsum('l_quantity * l_quantity')} AS s11,
         {sql_dsum('l_quantity * l_discount')} AS s12,
         {sql_dsum('l_discount * l_discount')} AS s22,
         {sql_dsum('l_quantity * l_extendedprice')} AS s1y,
         {sql_dsum('l_discount * l_extendedprice')} AS s2y
  FROM lineitem
)
SELECT {', '.join(_OLS_FORMULAS)} FROM m
""",
)
def ml_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multiple linear regression (price ~ quantity +
    discount): ONE aggregate pass collects the nine normal-equation
    moments as exact decimal sums, then Cramer's rule solves the 3×3
    system in the shared formula text. The distributed part is a
    partial+final reduce to nine numbers — the textbook way to fit a
    linear model at 100 TB without MLlib's iterative solver.

    Per-row products (quantity·price etc.) are IEEE double products of
    bit-identical inputs, so each decimal term matches across engines
    before the exact sum."""
    li = table(spark, sf_dir, "lineitem")
    q, d, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(q).alias("sx1"),
        dsum(d).alias("sx2"),
        dsum(y).alias("sy"),
        dsum(q * q).alias("s11"),
        dsum(q * d).alias("s12"),
        dsum(d * d).alias("s22"),
        dsum(q * y).alias("s1y"),
        dsum(d * y).alias("s2y"),
    )
    return m.selectExpr(*_OLS_FORMULAS)


# ---------------------------------------------------------------------------
# text_pmi_bigrams


@query(
    "text_pmi_bigrams",
    oracle="""
WITH toks AS (SELECT str_split(text, ' ') AS w FROM documents),
uni AS (SELECT unnest(w) AS word FROM toks),
ucnt AS (SELECT word, COUNT(*) AS c FROM uni GROUP BY 1),
nu AS (SELECT COUNT(*) AS n_uni FROM uni),
big AS (
  SELECT split_part(pair, ' ', 1) AS w1, split_part(pair, ' ', 2) AS w2
  FROM (SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS pair
        FROM toks)
),
bcnt AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
nb AS (SELECT COUNT(*) AS n_big FROM big)
SELECT b.w1, b.w2, CAST(b.cb AS BIGINT) AS pair_count,
       ROUND(ln((CAST(b.cb AS DOUBLE) * nu.n_uni * nu.n_uni)
                / (CAST(nb.n_big AS DOUBLE) * c1.c * c2.c)), 6) AS pmi
FROM bcnt b
JOIN ucnt c1 ON c1.word = b.w1
JOIN ucnt c2 ON c2.word = b.w2
CROSS JOIN nu CROSS JOIN nb
WHERE b.cb >= 20
ORDER BY pmi DESC, w1, w2 LIMIT 30
""",
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — the
    collocation detector every corpus-analysis pipeline runs. Counts are
    integers (bigram, unigram, totals), PMI = ln(c12·Nu²/(Nb·c1·c2))
    evaluates on identical doubles, 6-dp round.

    Scale: two exploded counts shuffled on token keys, two scalar totals
    broadcast back, unigram-count join is on the (bounded) vocabulary —
    no all-pairs anything. The ≥20 support filter prunes the long tail
    before the sort."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("w"))
    uni = toks.select(F.explode("w").alias("word"))
    ucnt = uni.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    nu = uni.agg(F.count(F.lit(1)).alias("n_uni"))
    big = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2),"
                " i -> struct(w[i] AS w1, w[i + 1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bcnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    nb = big.agg(F.count(F.lit(1)).alias("n_big"))
    c1 = ucnt.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    c2 = ucnt.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    return (
        bcnt.filter(F.col("cb") >= 20)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .join(F.broadcast(nu))
        .join(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("cb").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("cb").cast("double") * F.col("n_uni") * F.col("n_uni"))
                    / (F.col("n_big").cast("double") * F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# win_gap_fill_interp


@query(
    "win_gap_fill_interp",
    oracle=f"""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, {sql_dsum('value')} AS v
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM span
),
g AS (
  SELECT grid.user_id, grid.day, d.v
  FROM grid LEFT JOIN daily d ON d.user_id = grid.user_id AND d.day = grid.day
),
n AS (
  SELECT user_id, day, v,
         last_value(v IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER w_prev AS pd,
         first_value(v IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER w_next AS nd
  FROM g
  WINDOW w_prev AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed,
       ROUND(COALESCE(v,
             pv + (nv - pv) * CAST(date_diff('day', pd, day) AS DOUBLE)
                            / CAST(date_diff('day', pd, nd) AS DOUBLE)), 6) + 0.0
         AS filled
FROM n ORDER BY user_id, day
""",
)
def win_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill over per-user daily purchase totals:
    build each user's calendar grid (sequence + explode between observed
    min/max day — endpoints always observed, so interior gaps always
    have both neighbors), carry the nearest observed value/day from both
    directions with ignore-nulls windows, and interpolate
    pv + (nv-pv)·Δprev/Δspan. The LOCF companion is
    ``win_gap_fill_locf``; this is the other gap-fill every time-series
    store ships.

    Scale: grid size is days×users (bounded by the time span, not the
    event count), both windows are in-partition scans after ONE shuffle
    on user_id. Daily totals are exact decimal sums, so the interpolated
    doubles match the oracle bitwise before the 6-dp round; ``+ 0.0``
    folds any -0.0 (statistics.py convention)."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(
        "user_id", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(dsum("value").alias("v"))
    span = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    g = grid.join(daily, ["user_id", "day"], "left")
    w_prev = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    w_next = W.partitionBy("user_id").orderBy("day").rowsBetween(0, W.unboundedFollowing)
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    n = g.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff(F.col("day"), F.col("pd")).cast("double")
        / F.datediff(F.col("nd"), F.col("pd")).cast("double")
    )
    return n.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("v").isNotNull(), 1).otherwise(0).alias("observed"),
        (F.round(F.coalesce(F.col("v"), interp), 6) + F.lit(0.0)).alias("filled"),
    ).orderBy("user_id", "day")


# ---------------------------------------------------------------------------
# events_changepoint_cusum


@query(
    "events_changepoint_cusum",
    oracle=f"""
WITH mean_ AS (
  SELECT event_type, {sql_davg('value')} AS m FROM events GROUP BY 1
),
c AS (
  SELECT e.event_type, e.ts, e.event_id,
         SUM(CAST(e.value AS DECIMAL(30,6)) - CAST(m.m AS DECIMAL(30,6)))
           OVER (PARTITION BY e.event_type ORDER BY e.ts, e.event_id
                 ROWS UNBOUNDED PRECEDING) AS cusum
  FROM events e JOIN mean_ m ON m.event_type = e.event_type
),
r AS (
  SELECT event_type, ts, cusum,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(cusum) DESC, ts, event_id) AS rn
  FROM c
)
SELECT event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS changepoint_ts,
       CAST(cusum AS DOUBLE) AS peak_cusum
FROM r WHERE rn = 1 ORDER BY event_type
""",
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan per event type: running sum of (value −
    type mean) over the time-ordered stream; the |CUSUM| peak marks the
    most likely level-shift point. The running sum accumulates exact
    DECIMALs of per-row deviations from the 6-dp-rounded mean, so every
    intermediate is identical across engines — no float fold anywhere.

    Scale: one broadcast of the per-type means, one shuffle on
    event_type, one in-partition ordered scan, one top-1-per-group
    window. Monitoring pipelines run exactly this plan on full event
    streams."""
    e = table(spark, sf_dir, "events")
    from sim_spark.exprs import davg

    mean_ = e.groupBy("event_type").agg(davg("value").alias("m"))
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    c = (
        e.join(F.broadcast(mean_), "event_type")
        .select(
            "event_type",
            "ts",
            "event_id",
            F.sum(F.col("value").cast(DEC) - F.col("m").cast(DEC)).over(w).alias("cusum"),
        )
    )
    w_rank = W.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "ts", "event_id"
    )
    return (
        c.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("changepoint_ts"),
            F.col("cusum").cast("double").alias("peak_cusum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ml_kmeans_unrolled — 2 full Lloyd iterations, fully oracle-checkable.

_KM_K, _KM_DIM = 8, 64
# Squared-distance terms snap to integer nano-units before the cross-dim
# sum (neither engine guarantees a left-to-right float fold), so argmin
# compares exact BIGINTs; recomputed centroids are 6-dp-rounded decimal
# means, identical in both engines.
_KM_TERM_SQL = "CAST(floor((vx - cx) * (vx - cx) * 1000000000 + 0.5) AS BIGINT)"


@query(
    "ml_kmeans_unrolled",
    oracle=f"""
WITH vlong AS (
  SELECT vec_id AS vid, i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS vx
  FROM embeddings, LATERAL (SELECT unnest(range(0, {_KM_DIM})) AS i)
),
c1 AS (
  SELECT vid AS cid, dim, vx AS cx FROM vlong WHERE vid < {_KM_K}
),
d1 AS (
  SELECT v.vid, c.cid, SUM({_KM_TERM_SQL}) AS dist_nano
  FROM vlong v JOIN c1 c ON c.dim = v.dim
  GROUP BY v.vid, c.cid
),
a1 AS (
  SELECT vid, cid FROM (
    SELECT vid, cid,
           ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist_nano, cid) AS rn
    FROM d1) WHERE rn = 1
),
c2 AS (
  SELECT a1.cid, v.dim,
         ROUND(CAST(SUM(CAST(v.vx AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS cx
  FROM vlong v JOIN a1 ON a1.vid = v.vid
  GROUP BY a1.cid, v.dim
),
d2 AS (
  SELECT v.vid, c.cid, SUM({_KM_TERM_SQL}) AS dist_nano
  FROM vlong v JOIN c2 c ON c.dim = v.dim
  GROUP BY v.vid, c.cid
),
a2 AS (
  SELECT vid, cid, dist_nano FROM (
    SELECT vid, cid, dist_nano,
           ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist_nano, cid) AS rn
    FROM d2) WHERE rn = 1
)
SELECT cid AS centroid, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(dist_nano) AS BIGINT) AS sse_nano
FROM a2 GROUP BY cid ORDER BY cid
""",
)
def ml_kmeans_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO full Lloyd iterations (assign → recompute centroids → assign)
    with every step exact: distances sum integer nano-unit terms (argmin
    on BIGINTs — no float fold can flip it), recomputed centroids are
    6-dp decimal means. This promotes the iterative half of k-means from
    rows-only (``ml_kmeans_lloyd``) to a hash-matched oracle row — the
    unrolling trick already used for ``graph_pagerank``.

    Scale: the vector table lives in LONG form (vid, dim, value) — the
    layout a 100 TB feature store uses — and each iteration is one
    broadcast join on dim (k×dim rows) + one (vid, cid) partial+final
    sum; centroid recompute is a (cid, dim) aggregate. No driver loop,
    no collect: the whole 2-step refinement is a single Catalyst plan."""
    e = table(spark, sf_dir, "embeddings")
    vlong = e.select(
        F.col("vec_id").alias("vid"),
        F.posexplode(F.col("embedding")).alias("dim", "fx"),
    ).select("vid", "dim", F.col("fx").cast("double").alias("vx"))

    def term(cx_col: F.Column) -> F.Column:
        d = F.col("vx") - cx_col
        return F.floor(d * d * F.lit(1000000000) + F.lit(0.5)).cast("long")

    def assign(cent_long: DataFrame) -> DataFrame:
        d = (
            vlong.join(F.broadcast(cent_long), "dim")
            .groupBy("vid", "cid")
            .agg(F.sum(term(F.col("cx"))).alias("dist_nano"))
        )
        w = W.partitionBy("vid").orderBy("dist_nano", "cid")
        return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    c1 = vlong.filter(F.col("vid") < _KM_K).select(
        F.col("vid").alias("cid"), "dim", F.col("vx").alias("cx")
    )
    a1 = assign(c1).select("vid", "cid")
    c2 = (
        vlong.join(a1, "vid")
        .groupBy("cid", "dim")
        .agg(
            F.round(
                F.sum(F.col("vx").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
            ).alias("cx")
        )
    )
    a2 = assign(c2)
    return (
        a2.groupBy(F.col("cid").alias("centroid"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist_nano").alias("sse_nano"),
        )
        .orderBy("centroid")
    )


# ---------------------------------------------------------------------------
# ml_pca_power_unrolled — 2 power-iteration steps, fully oracle-checkable.

_PCA_DIM = 64
# G·v terms and norm terms snap to nano-units before their cross-dim sums;
# the single division / sqrt that follows is IEEE-exact in both engines.
_NANO = "1000000000"


@query(
    "ml_pca_power_unrolled",
    oracle=f"""
WITH vlong AS (
  SELECT vec_id AS vid, i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS vx
  FROM embeddings, LATERAL (SELECT unnest(range(0, {_PCA_DIM})) AS i)
),
mu AS (
  SELECT dim, ROUND(CAST(SUM(CAST(vx AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS m
  FROM vlong GROUP BY dim
),
cl AS (
  SELECT v.vid, v.dim, v.vx - mu.m AS cx FROM vlong v JOIN mu ON mu.dim = v.dim
),
gram AS (
  SELECT a.dim AS d1, b.dim AS d2,
         ROUND(CAST(SUM(CAST(a.cx * b.cx AS DECIMAL(30,6))) AS DOUBLE)
               / (SELECT COUNT(DISTINCT vid) FROM vlong), 6) AS g
  FROM cl a JOIN cl b ON a.vid = b.vid
  GROUP BY a.dim, b.dim
),
v0 AS (SELECT unnest(range(0, {_PCA_DIM})) AS dim, 0.125 AS v),
u1 AS (
  SELECT g.d1 AS dim,
         CAST(SUM(CAST(floor(g.g * v0.v * {_NANO} + 0.5) AS BIGINT)) AS DOUBLE)
           / {_NANO} AS u
  FROM gram g JOIN v0 ON v0.dim = g.d2 GROUP BY g.d1
),
n1 AS (
  SELECT sqrt(CAST(SUM(CAST(floor(u * u * {_NANO} + 0.5) AS BIGINT)) AS DOUBLE)
              / {_NANO}) AS nrm FROM u1
),
v1 AS (SELECT dim, ROUND(u / (SELECT nrm FROM n1), 6) AS v FROM u1),
u2 AS (
  SELECT g.d1 AS dim,
         CAST(SUM(CAST(floor(g.g * v1.v * {_NANO} + 0.5) AS BIGINT)) AS DOUBLE)
           / {_NANO} AS u
  FROM gram g JOIN v1 ON v1.dim = g.d2 GROUP BY g.d1
),
n2 AS (
  SELECT sqrt(CAST(SUM(CAST(floor(u * u * {_NANO} + 0.5) AS BIGINT)) AS DOUBLE)
              / {_NANO}) AS nrm FROM u2
)
SELECT dim, ROUND(u / (SELECT nrm FROM n2), 6) AS loading,
       ROUND((SELECT nrm FROM n2), 6) AS eigenvalue_est
FROM u2 ORDER BY dim
""",
)
def ml_pca_power_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First principal component by TWO unrolled power-iteration steps
    over the exact 64×64 covariance matrix — the oracle-checkable twin
    of the driver-looped ``ml_pca_power_iter``. Every cross-dim float
    sum (Gram build, matvec, norm) goes through decimal or nano-unit
    integer accumulation; the matvec/norm divisions and sqrt are single
    IEEE-exact ops, so both engines emit identical loadings. ‖G·v‖ of
    the unit iterate doubles as the Rayleigh-quotient eigenvalue
    estimate.

    Scale: the Gram matrix is a (dim², ) aggregate of per-row products —
    one self-join on vid in LONG form, partial+final summed, output
    bounded by dim² regardless of row count; each unrolled step is a
    broadcast join against the 64-row iterate. No driver loop."""
    e = table(spark, sf_dir, "embeddings")
    vlong = e.select(
        F.col("vec_id").alias("vid"),
        F.posexplode(F.col("embedding")).alias("dim", "fx"),
    ).select("vid", "dim", F.col("fx").cast("double").alias("vx"))
    n_vec = e.select(F.count(F.lit(1)).alias("nv"))
    mu = vlong.groupBy("dim").agg(
        F.round(F.sum(F.col("vx").cast(DEC)).cast("double") / F.count(F.lit(1)), 6).alias("m")
    )
    cl = vlong.join(F.broadcast(mu), "dim").select(
        "vid", "dim", (F.col("vx") - F.col("m")).alias("cx")
    )
    a = cl.select("vid", F.col("dim").alias("d1"), F.col("cx").alias("cxa"))
    b = cl.select("vid", F.col("dim").alias("d2"), F.col("cx").alias("cxb"))
    gram = (
        a.join(b, "vid")
        .groupBy("d1", "d2")
        .agg(F.sum((F.col("cxa") * F.col("cxb")).cast(DEC)).alias("s"))
        .join(F.broadcast(n_vec))
        .select(
            "d1", "d2", F.round(F.col("s").cast("double") / F.col("nv"), 6).alias("g")
        )
    )

    nano = F.lit(1000000000)

    def matvec(v: DataFrame) -> DataFrame:
        return (
            gram.join(F.broadcast(v), gram.d2 == v.dim)
            .groupBy(F.col("d1").alias("dim"))
            .agg(
                (
                    F.sum(
                        F.floor(F.col("g") * F.col("v") * nano + F.lit(0.5)).cast("long")
                    ).cast("double")
                    / nano
                ).alias("u")
            )
        )

    def normalize(u: DataFrame) -> DataFrame:
        nrm = u.agg(
            F.sqrt(
                F.sum(
                    F.floor(F.col("u") * F.col("u") * nano + F.lit(0.5)).cast("long")
                ).cast("double")
                / nano
            ).alias("nrm")
        )
        return u.join(F.broadcast(nrm)).select(
            "dim", F.round(F.col("u") / F.col("nrm"), 6).alias("v")
        )

    v0 = spark.range(_PCA_DIM).select(F.col("id").cast("int").alias("dim"), F.lit(0.125).alias("v"))
    u1 = matvec(v0)
    v1 = normalize(u1)
    u2 = matvec(v1)
    nrm2 = u2.agg(
        F.sqrt(
            F.sum(
                F.floor(F.col("u") * F.col("u") * nano + F.lit(0.5)).cast("long")
            ).cast("double")
            / nano
        ).alias("nrm")
    )
    return (
        u2.join(F.broadcast(nrm2))
        .select(
            "dim",
            F.round(F.col("u") / F.col("nrm"), 6).alias("loading"),
            F.round(F.col("nrm"), 6).alias("eigenvalue_est"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# embed_pq_fixed_codebook — PQ encoding against fixed codebooks, oracled.

_PQ_M, _PQ_K, _PQ_SUB = 8, 16, 8  # 8 subspaces × 8 dims, 16 codes each


def _pq_vlong(e: DataFrame) -> DataFrame:
    """Long layout of the embedding matrix: (vid, sub, sdim, vx) — shared
    by the PQ encode, ADC search, and IVF+PQ keys (r8 consolidation)."""
    return e.select(
        F.col("vec_id").alias("vid"),
        F.posexplode(F.col("embedding")).alias("i", "fx"),
    ).select(
        "vid",
        (F.col("i") / _PQ_SUB).cast("int").alias("sub"),
        (F.col("i") % _PQ_SUB).alias("sdim"),
        F.col("fx").cast("double").alias("vx"),
    )


def _pq_nano_dists(vlong: DataFrame) -> DataFrame:
    """(vid, sub, code, dn): nano-unit integer squared distance of every
    vector's sub-block to every fixed-codebook centroid (vid < _PQ_K)."""
    books = vlong.filter(F.col("vid") < _PQ_K).select(
        F.col("vid").alias("code"), "sub", "sdim", F.col("vx").alias("cx")
    )
    diff = F.col("vx") - F.col("cx")
    return (
        vlong.join(F.broadcast(books), ["sub", "sdim"])
        .groupBy("vid", "sub", "code")
        .agg(
            F.sum(
                F.floor(diff * diff * F.lit(1000000000) + F.lit(0.5)).cast("long")
            ).alias("dn")
        )
    )


@query(
    "embed_pq_fixed_codebook",
    oracle=f"""
WITH vlong AS (
  SELECT vec_id AS vid, i // {_PQ_SUB} AS sub, i % {_PQ_SUB} AS sdim,
         CAST(embedding[i + 1] AS DOUBLE) AS vx
  FROM embeddings, LATERAL (SELECT unnest(range(0, {_PQ_M * _PQ_SUB})) AS i)
),
books AS (
  SELECT vid AS code, sub, sdim, vx AS cx FROM vlong WHERE vid < {_PQ_K}
),
d AS (
  SELECT v.vid, v.sub, b.code,
         SUM(CAST(floor((v.vx - b.cx) * (v.vx - b.cx) * {_NANO} + 0.5) AS BIGINT)) AS dn
  FROM vlong v JOIN books b ON b.sub = v.sub AND b.sdim = v.sdim
  GROUP BY v.vid, v.sub, b.code
),
enc AS (
  SELECT vid, sub, code, dn FROM (
    SELECT vid, sub, code, dn,
           ROW_NUMBER() OVER (PARTITION BY vid, sub ORDER BY dn, code) AS rn
    FROM d) WHERE rn = 1
)
SELECT vid AS vec_id,
       string_agg(code::VARCHAR, ',' ORDER BY sub) AS codes,
       CAST(SUM(dn) AS BIGINT) AS err_nano
FROM enc GROUP BY vid ORDER BY vec_id
""",
)
def embed_pq_fixed_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ENCODING against fixed codebooks (sub-blocks
    of the first 16 vectors) — the oracle-checkable half of PQ, promoted
    from the learned-codebook ``embed_pq_codes`` the way
    ``ml_kmeans_assign_fixed`` splits Lloyd's. Each 64-dim vector maps
    to 8 sub-space code ids by argmin over nano-unit integer distances;
    the summed residual is the exact integer reconstruction error.

    Scale: codebooks are m×k×(dim/m) = 1024 values — broadcast; encoding
    is one join + one (vid, sub) partial+final sum over the long layout,
    then a per-(vid, sub) top-1. This is how you compress a 100 TB
    embedding store to 8 bytes/vector without moving the corpus."""
    e = table(spark, sf_dir, "embeddings")
    d = _pq_nano_dists(_pq_vlong(e))
    w = W.partitionBy("vid", "sub").orderBy("dn", "code")
    enc = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        enc.groupBy(F.col("vid").alias("vec_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("sub"), F.col("code")))
                    ),
                    lambda s: s["code"].cast("string"),
                ),
                ",",
            ).alias("codes"),
            F.sum("dn").alias("err_nano"),
        )
        .orderBy("vec_id")
    )


# sim_topk_pq_adc — PQ asymmetric-distance top-k search, fully oracled.

_PQ_PROBES = (17, 23, 41)  # query vectors, outside the codebook block
_PQ_TOPK = 10


@query(
    "sim_topk_pq_adc",
    oracle=f"""
WITH vlong AS (
  SELECT vec_id AS vid, i // {_PQ_SUB} AS sub, i % {_PQ_SUB} AS sdim,
         CAST(embedding[i + 1] AS DOUBLE) AS vx
  FROM embeddings, LATERAL (SELECT unnest(range(0, {_PQ_M * _PQ_SUB})) AS i)
),
books AS (
  SELECT vid AS code, sub, sdim, vx AS cx FROM vlong WHERE vid < {_PQ_K}
),
d AS (
  SELECT v.vid, v.sub, b.code,
         SUM(CAST(floor((v.vx - b.cx) * (v.vx - b.cx) * {_NANO} + 0.5) AS BIGINT)) AS dn
  FROM vlong v JOIN books b ON b.sub = v.sub AND b.sdim = v.sdim
  GROUP BY v.vid, v.sub, b.code
),
enc AS (
  SELECT vid, sub, code FROM (
    SELECT vid, sub, code,
           ROW_NUMBER() OVER (PARTITION BY vid, sub ORDER BY dn, code) AS rn
    FROM d) WHERE rn = 1
),
lut AS (
  SELECT vid AS qid, sub, code, dn FROM d
  WHERE vid IN {_PQ_PROBES}
),
adc AS (
  SELECT l.qid, e.vid,
         CAST(SUM(l.dn) AS BIGINT) AS adc_nano
  FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
  WHERE e.vid <> l.qid
  GROUP BY l.qid, e.vid
)
SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, vid AS vec_id, adc_nano
FROM (
  SELECT qid, vid, adc_nano,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_nano, vid) AS rnk
  FROM adc)
WHERE rnk <= {_PQ_TOPK}
ORDER BY query_id, rank
""",
)
def sim_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — the SEARCH half of
    product quantization (Jégou et al.), completing the pair with
    `embed_pq_fixed_codebook`'s encode half. Per probe query: build the
    m×k lookup table of nano-unit integer query-to-centroid distances
    (384 values — broadcast), score every corpus vector by summing the
    LUT entries its codes select (8 integer adds per vector — NO float
    math against the corpus), rank by (adc, vec_id) and keep top-10.

    100 TB shape: this is how a petabyte embedding store is searched —
    the corpus is touched only through its 8-byte code rows; the only
    aggregate is a map-side-combinable (query, vec) integer sum and a
    per-query top-k. The ADC distances are exact integers, so the whole
    search result (not just recall) hash-matches the oracle."""
    e = table(spark, sf_dir, "embeddings")
    d = _pq_nano_dists(_pq_vlong(e))
    wenc = W.partitionBy("vid", "sub").orderBy("dn", "code")
    enc = (
        d.withColumn("rn", F.row_number().over(wenc))
        .filter(F.col("rn") == 1)
        .select("vid", "sub", "code")
    )
    lut = d.filter(F.col("vid").isin(*_PQ_PROBES)).select(
        F.col("vid").alias("qid"), "sub", "code", "dn"
    )
    adc = (
        enc.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("vid") != F.col("qid"))
        .groupBy("qid", "vid")
        .agg(F.sum("dn").alias("adc_nano"))
    )
    wq = W.partitionBy("qid").orderBy("adc_nano", "vid")
    return (
        adc.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= _PQ_TOPK)
        .select(
            F.col("qid").alias("query_id"),
            F.col("rnk").cast("long").alias("rank"),
            F.col("vid").alias("vec_id"),
            "adc_nano",
        )
        .orderBy("query_id", "rank")
    )


# sim_topk_ivfpq_adc — IVF coarse gate + PQ ADC refine, fully oracled.

_IVF_LO = 100  # coarse centroids: vectors [100, 100 + nlist)
# nlist follows the deterministic corpus-count √n ladder (r9 — the same
# dial that closed the r8 sim_ann weak flags; the oracle recomputes the
# identical nlist from COUNT(*), keeping the key hash-exact at every
# SF). nprobe = max(2, nlist // 8). At sf0.01 (n=500) the ladder gives
# nlist=8, nprobe=2 — exactly the former fixed values.
_IVF_NLIST_SQL = pow2_sqrt_ladder_sql("embeddings", shift=2)
_IVF_NPROBE_SQL = f"GREATEST(2, kk.k // 8)"


@query(
    "sim_topk_ivfpq_adc",
    oracle=f"""
WITH kk AS (SELECT {_IVF_NLIST_SQL} AS k),
vlong AS (
  SELECT vec_id AS vid, i // {_PQ_SUB} AS sub, i % {_PQ_SUB} AS sdim,
         CAST(embedding[i + 1] AS DOUBLE) AS vx
  FROM embeddings, LATERAL (SELECT unnest(range(0, {_PQ_M * _PQ_SUB})) AS i)
),
coarse AS (
  SELECT vid AS cell, sub, sdim, vx AS cx FROM vlong, kk
  WHERE vid >= {_IVF_LO} AND vid < {_IVF_LO} + kk.k
),
cdist AS (
  SELECT v.vid, c.cell,
         SUM(CAST(floor((v.vx - c.cx) * (v.vx - c.cx) * {_NANO} + 0.5) AS BIGINT)) AS dn
  FROM vlong v JOIN coarse c ON c.sub = v.sub AND c.sdim = v.sdim
  GROUP BY v.vid, c.cell
),
assign AS (
  SELECT vid, cell FROM (
    SELECT vid, cell,
           ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dn, cell) AS rn
    FROM cdist) WHERE rn = 1
),
probes AS (
  SELECT vid AS qid, cell FROM (
    SELECT vid, cell,
           ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dn, cell) AS rn
    FROM cdist WHERE vid IN {_PQ_PROBES}), kk WHERE rn <= {_IVF_NPROBE_SQL}
),
books AS (
  SELECT vid AS code, sub, sdim, vx AS cx FROM vlong WHERE vid < {_PQ_K}
),
d AS (
  SELECT v.vid, v.sub, b.code,
         SUM(CAST(floor((v.vx - b.cx) * (v.vx - b.cx) * {_NANO} + 0.5) AS BIGINT)) AS dn
  FROM vlong v JOIN books b ON b.sub = v.sub AND b.sdim = v.sdim
  GROUP BY v.vid, v.sub, b.code
),
enc AS (
  SELECT vid, sub, code FROM (
    SELECT vid, sub, code,
           ROW_NUMBER() OVER (PARTITION BY vid, sub ORDER BY dn, code) AS rn
    FROM d) WHERE rn = 1
),
lut AS (
  SELECT vid AS qid, sub, code, dn FROM d WHERE vid IN {_PQ_PROBES}
),
cand AS (
  SELECT p.qid, a.vid FROM probes p JOIN assign a ON a.cell = p.cell
  WHERE a.vid <> p.qid
),
adc AS (
  SELECT c.qid, c.vid, CAST(SUM(l.dn) AS BIGINT) AS adc_nano
  FROM cand c
  JOIN enc e ON e.vid = c.vid
  JOIN lut l ON l.qid = c.qid AND l.sub = e.sub AND l.code = e.code
  GROUP BY c.qid, c.vid
)
SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, vid AS vec_id, adc_nano
FROM (
  SELECT qid, vid, adc_nano,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_nano, vid) AS rnk
  FROM adc)
WHERE rnk <= {_PQ_TOPK}
ORDER BY query_id, rank
""",
)
def sim_topk_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ top-k search — the full production ANN layout (Jégou et
    al.'s IVFADC), composing the two halves this repo already oracles:
    an inverted-file COARSE GATE (every corpus vector is assigned to its
    nearest of nlist=8 fixed coarse centroids; each query probes its
    nprobe=2 nearest cells, and only vectors in probed cells are scored)
    and the PQ ADC refine of `sim_topk_pq_adc` (8 integer LUT adds per
    candidate, no float math against the corpus). Coarse assignment,
    probing, and ADC all rank by exact nano-unit integers with id
    tie-breaks, so the complete search result hash-matches the oracle —
    not just its recall.

    100 TB shape: the candidate gate is an equi-join on cell id between
    a broadcast probe list and the (vid, cell) assignment frame — the
    corpus is never scanned per query; scored rows shrink by
    ~nprobe/nlist before any distance work. nlist follows the
    deterministic corpus-count √n ladder (ops/ladders.py, r9 — cells
    stay ~√n-sized at any corpus; the oracle recomputes the identical
    nlist from COUNT(*) so the key stays hash-exact), nprobe =
    max(2, nlist/8)."""
    e = table(spark, sf_dir, "embeddings")
    nlist = pow2_sqrt_ladder(table_count(spark, sf_dir, "embeddings"), shift=2)
    nprobe = max(2, nlist // 8)
    vlong = _pq_vlong(e)
    coarse = vlong.filter(
        (F.col("vid") >= _IVF_LO) & (F.col("vid") < _IVF_LO + nlist)
    ).select(F.col("vid").alias("cell"), "sub", "sdim", F.col("vx").alias("cx"))
    cdiff = F.col("vx") - F.col("cx")
    cdist = (
        vlong.join(F.broadcast(coarse), ["sub", "sdim"])
        .groupBy("vid", "cell")
        .agg(
            F.sum(
                F.floor(cdiff * cdiff * F.lit(1000000000) + F.lit(0.5)).cast("long")
            ).alias("dn")
        )
    )
    wv = W.partitionBy("vid").orderBy("dn", "cell")
    ranked = cdist.withColumn("rn", F.row_number().over(wv))
    assign = ranked.filter(F.col("rn") == 1).select("vid", "cell")
    probes = (
        ranked.filter(F.col("vid").isin(*_PQ_PROBES))
        .filter(F.col("rn") <= nprobe)
        .select(F.col("vid").alias("qid"), "cell")
    )
    d = _pq_nano_dists(vlong)
    wenc = W.partitionBy("vid", "sub").orderBy("dn", "code")
    enc = (
        d.withColumn("rn", F.row_number().over(wenc))
        .filter(F.col("rn") == 1)
        .select("vid", "sub", "code")
    )
    lut = d.filter(F.col("vid").isin(*_PQ_PROBES)).select(
        F.col("vid").alias("qid"), "sub", "code", "dn"
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "cell")
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid")
    )
    adc = (
        cand.join(enc, "vid")
        .join(F.broadcast(lut), ["qid", "sub", "code"])
        .groupBy("qid", "vid")
        .agg(F.sum("dn").alias("adc_nano"))
    )
    wq = W.partitionBy("qid").orderBy("adc_nano", "vid")
    return (
        adc.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= _PQ_TOPK)
        .select(
            F.col("qid").alias("query_id"),
            F.col("rnk").cast("long").alias("rank"),
            F.col("vid").alias("vec_id"),
            "adc_nano",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# voxel_smooth_3x3 — stencil convolution over the 8x8 voxel grid.

_VOX_SIDE = 8  # 64-element intensity block viewed as an 8x8 grid
# 3x3 binomial (Gaussian-approximating) kernel, integer weights.
_STENCIL = [
    (-1, -1, 1), (-1, 0, 2), (-1, 1, 1),
    (0, -1, 2), (0, 0, 4), (0, 1, 2),
    (1, -1, 1), (1, 0, 2), (1, 1, 1),
]
_STENCIL_SQL = ", ".join(f"({dr}, {dc}, {w})" for dr, dc, w in _STENCIL)


@query(
    "voxel_smooth_3x3",
    oracle=f"""
WITH px AS (
  SELECT vec_id, (generate_subscripts(embedding, 1) - 1) // {_VOX_SIDE} AS r,
         (generate_subscripts(embedding, 1) - 1) % {_VOX_SIDE} AS c,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS micro
  FROM embeddings
),
sten(dr, dc, w) AS (VALUES {_STENCIL_SQL}),
contrib AS (
  SELECT p.vec_id, p.r + s.dr AS tr, p.c + s.dc AS tc,
         s.w * p.micro AS wm, s.w AS w
  FROM px p CROSS JOIN sten s
  WHERE p.r + s.dr BETWEEN 0 AND {_VOX_SIDE - 1}
    AND p.c + s.dc BETWEEN 0 AND {_VOX_SIDE - 1}
),
sm AS (
  SELECT vec_id, tr, tc,
         CAST(floor((2.0 * SUM(wm) + SUM(w)) / (2.0 * SUM(w))) AS BIGINT) AS smooth_micro
  FROM contrib GROUP BY vec_id, tr, tc
)
SELECT CAST(tr * {_VOX_SIDE} + tc AS BIGINT) AS pos,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(smooth_micro) AS BIGINT) AS sum_smooth_micro
FROM sm GROUP BY tr, tc ORDER BY pos
""",
)
def voxel_smooth_3x3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3×3 binomial smoothing of each subject's 8×8 voxel block — the
    neighborhood-stencil convolution every imaging pipeline runs before
    thresholding, expressed relationally: explode intensities to
    (vec_id, row, col), scatter each voxel to its 9 stencil targets (a
    bounded explode, not a join on coordinates), and re-aggregate with
    integer weights. Edges renormalize by the sum of PRESENT weights.
    Everything is integer micro-units — weighted sums are BIGINTs, the
    smoothed value uses the sign-safe half-up floor((2s+w)/(2w)) from
    ``voxel_mean_image`` — so both engines agree exactly.

    Scale: per-subject work is dim×9 rows, the (vec_id, target) partial+
    final aggregate is map-side combinable, and the final 64-row grid
    reduction is trivially bounded. No Python, no windows, no driver."""
    e = table(spark, sf_dir, "embeddings")
    px = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        (F.col("pos") / _VOX_SIDE).cast("int").alias("r"),
        (F.col("pos") % _VOX_SIDE).alias("c"),
        F.floor(F.col("x").cast("double") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("micro"),
    )
    sten = F.array(
        *[
            F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"), F.lit(w).alias("w"))
            for dr, dc, w in _STENCIL
        ]
    )
    contrib = (
        px.select("vec_id", "r", "c", "micro", F.explode(sten).alias("s"))
        .select(
            "vec_id",
            (F.col("r") + F.col("s.dr")).alias("tr"),
            (F.col("c") + F.col("s.dc")).alias("tc"),
            (F.col("s.w") * F.col("micro")).alias("wm"),
            F.col("s.w").alias("w"),
        )
        .filter(
            F.col("tr").between(0, _VOX_SIDE - 1) & F.col("tc").between(0, _VOX_SIDE - 1)
        )
    )
    sm = contrib.groupBy("vec_id", "tr", "tc").agg(
        F.floor(
            (2.0 * F.sum("wm").cast("double") + F.sum("w")) / (2.0 * F.sum("w"))
        )
        .cast("long")
        .alias("smooth_micro")
    )
    return (
        sm.groupBy((F.col("tr") * _VOX_SIDE + F.col("tc")).cast("long").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("smooth_micro").alias("sum_smooth_micro"),
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# agg_hist_equidepth — 10-bucket equi-depth histogram without a global sort.

_EQD_B = 10


@query(
    "agg_hist_equidepth",
    oracle=f"""
WITH pv AS (
  SELECT l_extendedprice AS v, COUNT(*) AS ct FROM lineitem GROUP BY 1
),
cum AS (
  SELECT v, ct,
         COALESCE(SUM(ct) OVER (ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
         SUM(ct) OVER () AS n
  FROM pv
)
SELECT CAST(cb * {_EQD_B} // n AS BIGINT) AS bucket,
       CAST(SUM(ct) AS BIGINT) AS n_rows,
       MIN(v) AS lo, MAX(v) AS hi
FROM cum GROUP BY 1 ORDER BY bucket
""",
)
def agg_hist_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram — the optimizer-statistics
    primitive — without ranking individual rows: aggregate to DISTINCT
    values, cumulative-count the ordered value groups, and assign each
    whole group to bucket ⌊cum_before·B/N⌋. Integer arithmetic end to
    end, so bucket membership cannot drift between engines.

    Scale: same shape as ``stats_mannwhitney_u`` — the ordered pass runs
    over distinct values (already reduced), the per-row table is only
    ever touched by one partial+final count. This is how ANALYZE
    computes histograms on a warehouse fact table."""
    li = table(spark, sf_dir, "lineitem")
    pv = li.groupBy(F.col("l_extendedprice").alias("v")).agg(
        F.count(F.lit(1)).alias("ct")
    )
    from sim_spark.ops.distrank import cum_below

    tot = pv.agg(F.sum("ct").alias("n"))
    cum = (
        cum_below(pv, "v", "ct", out="cb")
        .crossJoin(F.broadcast(tot))
        .select("v", "ct", "cb", "n")
    )
    return (
        cum.groupBy(
            F.floor(F.col("cb") * _EQD_B / F.col("n")).cast("long").alias("bucket")
        )
        .agg(
            F.sum("ct").alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# stats_benford_digits — first-digit distribution vs Benford's law.

_BENFORD_CHI = (
    "ROUND(SUM(power(obs_frac - exp_frac, 2) / exp_frac) * 1.0, 6) AS chi2_stat"
)


@query(
    "stats_benford_digits",
    oracle=f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (SELECT digit, COUNT(*) AS ct FROM d GROUP BY 1),
t AS (SELECT SUM(ct) AS n FROM c),
f AS (
  SELECT c.digit, c.ct,
         CAST(c.ct AS DOUBLE) / t.n AS obs_frac,
         ln(1.0 + 1.0 / c.digit) / ln(10.0) AS exp_frac
  FROM c CROSS JOIN t
)
SELECT CAST(digit AS BIGINT) AS digit, CAST(ct AS BIGINT) AS n_orders,
       ROUND(obs_frac, 6) AS obs_frac, ROUND(exp_frac, 6) AS benford_frac
FROM f ORDER BY digit
""",
)
def stats_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    Benford's law — the classic forensic data-quality audit. The digit
    comes from the INTEGER part's string (floor → BIGINT → first char),
    never from float formatting or log10 (both of which can disagree
    across engines at power-of-ten boundaries); expected fractions use
    ln ratios on identical doubles.

    Scale: one partial+final 9-group count; the totals attach as a
    1-row broadcast."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("ct"))
    t = c.agg(F.sum("ct").alias("n"))
    return (
        c.join(F.broadcast(t))
        .select(
            "digit",
            F.col("ct").alias("n_orders"),
            F.round(F.col("ct").cast("double") / F.col("n"), 6).alias("obs_frac"),
            F.round(
                F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)), 6
            ).alias("benford_frac"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# win_rolling_mad — rolling median-absolute-deviation outlier flags.


def _arr_median(arr: F.Column) -> F.Column:
    n = F.size(arr)
    mid_hi = ((n + 1) / 2).cast("int")
    lo = (n / 2).cast("int")
    return F.when(n % 2 == 1, F.element_at(arr, mid_hi)).otherwise(
        (F.element_at(arr, lo) + F.element_at(arr, lo + 1)) / 2.0
    )


_SQL_MED = (
    "CASE WHEN len({a}) % 2 = 1 THEN {a}[(len({a}) + 1) // 2] "
    "ELSE ({a}[len({a}) // 2] + {a}[len({a}) // 2 + 1]) / 2.0 END"
)


@query(
    "win_rolling_mad",
    oracle=f"""
WITH fr AS (
  SELECT event_type, event_id, value,
         list_sort(list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                     ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)) AS h
  FROM events
),
med AS (
  SELECT event_type, event_id, value, h,
         {_SQL_MED.format(a='h')} AS m
  FROM fr
),
mad AS (
  SELECT event_type, event_id, value, m,
         {_SQL_MED.format(a='list_sort(list_transform(h, x -> abs(x - m)))')} AS d
  FROM med
)
SELECT event_type, event_id,
       ROUND(m, 6) AS roll_med, ROUND(d, 6) AS roll_mad,
       CASE WHEN d > 0 AND abs(value - m) > 3 * d THEN 1 ELSE 0 END AS is_outlier
FROM mad
""",
)
def win_rolling_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling robust outlier detection: per event type, the trailing
    12-event frame's median and median-absolute-deviation, flagging
    |x − med| > 3·MAD — the monitoring-pipeline alternative to z-scores
    that one spike cannot poison. Both medians are exact in-row order
    statistics over the sorted frame array (the ``win_rolling_median``
    recipe nested twice); no float accumulates across rows, so the only
    doubles are single subtractions/halvings — identical in both
    engines; the 3·MAD comparison happens on those identical doubles.

    Scale: ONE window shuffle on event_type; per-row state is the
    bounded frame array (12 doubles). The alert predicate is integer
    0/1 so the boundary decision itself is hash-checked."""
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-11, 0)
    )
    h = F.array_sort(F.collect_list("value").over(w))
    base = e.select("event_type", "event_id", "value", h.alias("h"))
    med = base.withColumn("m", _arr_median(F.col("h")))
    dev = F.array_sort(
        F.transform(F.col("h"), lambda x: F.abs(x - F.col("m")))
    )
    mad = med.withColumn("d", _arr_median(dev))
    return mad.select(
        "event_type",
        "event_id",
        F.round("m", 6).alias("roll_med"),
        F.round("d", 6).alias("roll_mad"),
        F.when(
            (F.col("d") > 0) & (F.abs(F.col("value") - F.col("m")) > 3 * F.col("d")), 1
        )
        .otherwise(0)
        .alias("is_outlier"),
    )
