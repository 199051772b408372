"""Round-7 pipeline extensions (SURVEY.md §2.13): sliding-window
chunking for context-window assembly and multi-touch attribution.

Scale designs:
- text_chunk_sliding: the RAG/pretraining chunker — every document is
  cut into overlapping W=64-token windows on a S=48 stride. Pure
  narrow map: split once, `sequence` the start offsets, explode, and
  slice the SAME token array per chunk (no per-chunk re-split, no
  shuffle at all — chunking 100 TB is embarrassingly parallel and this
  plan keeps it that way). The chunk content certificate is an md5 of
  the joined slice so the oracle compares content without the result
  set carrying the full text twice.
- events_attribution_credit: last-click + linear multi-touch
  attribution. The touch<->conversion pairing is a per-user band join
  (equi on user_id, `ts` band residual) — the user key keeps it a
  shuffled hash join, never a BNLJ, and per-user fanout is bounded by
  the 7-day lookback, so the pair table grows linearly in events, not
  quadratically. Fractional linear credits are quantized to integer
  micro-units (floor(x*1e6+0.5)) BEFORE the sum so the aggregate is an
  associative BIGINT sum — deterministic under any partitioning /
  merge order at cluster scale (same convention as the engine's other
  monetary sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query

_CHUNK_W = 64  # tokens per chunk
_CHUNK_S = 48  # stride (overlap = W - S = 16)

_LOOKBACK_DAYS = 7


@query(
    "text_chunk_sliding",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {_CHUNK_S})) AS start_tok
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(start_tok // {_CHUNK_S} AS BIGINT) AS chunk_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(LEAST({_CHUNK_W}, len(toks) - start_tok) AS BIGINT) AS n_tok,
       md5(array_to_string(toks[start_tok + 1 : start_tok + {_CHUNK_W}], ' ')) AS chunk_md5
FROM s
""",
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document (W=64, S=48).

    Trailing windows shorter than W are kept (standard sliding-window
    convention); every document yields >= 1 chunk. `sequence(0, n-1, S)`
    is safe because split("") still has size 1, so the stop is >= 0 and
    the sequence never descends.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.split(F.col("text"), " ").alias("toks"),
    )
    exploded = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), (F.size("toks") - 1).cast("bigint"), F.lit(_CHUNK_S).cast("bigint"))
        ).alias("start_tok"),
    )
    chunk = F.slice(F.col("toks"), F.col("start_tok").cast("int") + 1, F.lit(_CHUNK_W))
    return exploded.select(
        "doc_id",
        (F.col("start_tok") / _CHUNK_S).cast("bigint").alias("chunk_id"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.least(F.lit(_CHUNK_W).cast("bigint"), F.size("toks") - F.col("start_tok")).cast("bigint").alias("n_tok"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


@query(
    "events_attribution_credit",
    oracle=f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts, value
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT event_id AS touch_id, user_id, ts AS touch_ts, event_type
  FROM events WHERE event_type IN ('click', 'view')
), pairs AS (
  SELECT c.conv_id, c.value, t.touch_id, t.event_type,
         ROW_NUMBER() OVER (PARTITION BY c.conv_id
                            ORDER BY t.touch_ts DESC, t.touch_id DESC) AS rn_last,
         COUNT(*) OVER (PARTITION BY c.conv_id) AS n_touch
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND t.touch_ts <= c.conv_ts
   AND t.touch_ts > c.conv_ts - INTERVAL {_LOOKBACK_DAYS} DAY
)
SELECT event_type,
       COUNT(*) AS n_credits,
       COUNT(DISTINCT conv_id) AS n_conversions,
       CAST(SUM(CASE WHEN rn_last = 1
                     THEN CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS last_click_micro,
       CAST(SUM(CAST(floor(value / n_touch * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS linear_micro
FROM pairs
GROUP BY event_type
""",
)
def events_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: last-click and linear credit per channel.

    Pairing is equi-keyed on user_id with the 7-day recency band as a
    residual predicate; both window functions share one (conv_id)
    shuffle. `value / n_touch` is one IEEE double division (identical
    across engines) quantized to micro-units before the associative sum.
    """
    e = table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id"),
        F.col("ts").alias("conv_ts"),
        "value",
    )
    touch = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id"),
        F.col("ts").alias("touch_ts"),
        "event_type",
    )
    pairs = conv.join(
        touch,
        (conv.user_id == touch.user_id)
        & (F.col("touch_ts") <= F.col("conv_ts"))
        & (F.col("touch_ts") > F.col("conv_ts") - F.expr(f"INTERVAL {_LOOKBACK_DAYS} DAYS")),
    )
    w_conv = W.partitionBy("conv_id")
    pairs = pairs.select(
        "conv_id",
        "value",
        "touch_id",
        "event_type",
        F.row_number()
        .over(w_conv.orderBy(F.col("touch_ts").desc(), F.col("touch_id").desc()))
        .alias("rn_last"),
        F.count(F.lit(1)).over(w_conv).alias("n_touch"),
    )
    micro = lambda c: F.floor(c * 1_000_000 + F.lit(0.5)).cast("bigint")  # noqa: E731
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.countDistinct("conv_id").alias("n_conversions"),
        F.sum(F.when(F.col("rn_last") == 1, micro(F.col("value"))).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("last_click_micro"),
        F.sum(micro(F.col("value") / F.col("n_touch"))).cast("bigint").alias("linear_micro"),
    )
