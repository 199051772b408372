"""Multimodal queries with a REAL decode step (round 5).

The payloads are genuine media files — playable mono PCM16 WAV and
viewable 24-bpp BMP — synthesized deterministically from ``doc_id`` /
``n_chars`` by ops.multimodal's encoders, then decoded back by its
struct-level parsers inside Arrow-batched ``mapInPandas``. Because the
synthesis formula is integer arithmetic, DuckDB can recompute the
decoded features independently (unnest(range(...))), so the whole
encode → container bytes → parse → feature pipeline is hash-oracled:
if the BMP parser mis-handled stride padding or bottom-up row order,
``top_row_sum`` would mismatch; if the WAV chunk walk mis-read the data
chunk, ``sum_abs``/``first_sample``/``last_sample`` would.

100 TB shape: payload synthesis stands in for a parquet binary column
scan; decode is per-row independent work in mapInPandas — executor
memory bounded by Arrow batch size × payload size, parallelism =
partition count, no shuffle until the (tiny) feature frame.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.ops.multimodal import (
    bmp_features,
    gen_bmp_payload,
    gen_wav_payload,
    wav_features,
)
from sim_spark.registry import query

_PAYLOAD_SCHEMA = "doc_id long, payload binary"


def _gen_wav_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [
                    gen_wav_payload(int(d), int(n))
                    for d, n in zip(pdf["doc_id"], pdf["n_chars"])
                ],
            }
        )


def _gen_bmp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [gen_bmp_payload(int(d)) for d in pdf["doc_id"]],
            }
        )


@query(
    "multimodal_wav_decode",
    oracle="""
WITH p AS (SELECT doc_id, 64 + (n_chars % 128) AS n_samples FROM documents),
s AS (SELECT doc_id, n_samples, unnest(range(0, n_samples)) AS i FROM p),
v AS (SELECT doc_id, n_samples, i,
             ((doc_id * 31 + i * 17) % 65536) - 32768 AS smp
      FROM s)
SELECT doc_id,
       CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(sum(abs(smp)) AS BIGINT) AS sum_abs,
       CAST(max(abs(smp)) AS BIGINT) AS max_abs,
       CAST(min(CASE WHEN i = 0 THEN smp END) AS BIGINT) AS first_sample,
       CAST(min(CASE WHEN i = n_samples - 1 THEN smp END) AS BIGINT) AS last_sample
FROM v GROUP BY doc_id, n_samples
""",
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode end-to-end: synthesize real WAV containers, parse
    them back with the chunk-walking RIFF parser, aggregate per-doc
    amplitude features. The oracle recomputes the features from the
    synthesis formula — it never sees the bytes, so a decode bug cannot
    cancel out."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    payloads = d.mapInPandas(_gen_wav_batches, _PAYLOAD_SCHEMA)
    return wav_features(payloads)


@query(
    "multimodal_bmp_decode",
    oracle="""
WITH dims AS (
  SELECT doc_id, 4 + (doc_id % 13) AS w, 3 + (doc_id % 7) AS h FROM documents
),
cells AS (
  SELECT doc_id, w, h, rr.r, cc.c, hh.ch,
         (doc_id + 7 * rr.r + 13 * cc.c + 29 * hh.ch) % 256 AS val
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS r) rr,
       LATERAL (SELECT unnest(range(0, w)) AS c) cc,
       LATERAL (SELECT unnest(range(0, 3)) AS ch) hh
)
SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(sum(val) AS BIGINT) AS px_sum,
       CAST(sum(CASE WHEN r = 0 THEN val ELSE 0 END) AS BIGINT) AS top_row_sum,
       CAST(max(val) AS BIGINT) AS px_max
FROM cells GROUP BY doc_id, w, h
""",
)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode end-to-end: synthesize real 24-bpp BMPs (widths
    chosen to exercise 4-byte stride padding), parse them back, extract
    pixel statistics. ``top_row_sum`` pins row ORDER: BMP stores rows
    bottom-up, so a parser that skips the reorder matches ``px_sum`` but
    fails this column."""
    d = table(spark, sf_dir, "documents").select("doc_id", F.lit(0).alias("n_chars"))
    payloads = d.mapInPandas(_gen_bmp_batches, _PAYLOAD_SCHEMA)
    return bmp_features(payloads)


def _wav_rms_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from sim_spark.ops.multimodal import decode_wav

    for pdf in batches:
        rows = {"doc_id": [], "win": [], "n_smp": [], "sumsq": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _rate, smp = decode_wav(bytes(payload))
            s = smp.astype(np.int64)
            n = len(s)
            qsize = n // 4
            q = np.minimum(np.arange(n) // qsize, 3)
            for k in range(4):
                seg = s[q == k]
                rows["doc_id"].append(int(doc_id))
                rows["win"].append(k)
                rows["n_smp"].append(int(len(seg)))
                rows["sumsq"].append(int(np.sum(seg * seg)))
        yield pd.DataFrame(rows)


@query(
    "multimodal_wav_rms_windows",
    oracle="""
WITH p AS (SELECT doc_id, 64 + (n_chars % 128) AS n FROM documents),
s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM p),
v AS (SELECT doc_id, n, least(i // (n // 4), 3) AS win,
             ((doc_id * 31 + i * 17) % 65536) - 32768 AS smp
      FROM s)
SELECT doc_id, CAST(win AS BIGINT) AS win,
       CAST(count(*) AS BIGINT) AS n_smp,
       CAST(sum(smp * smp) AS BIGINT) AS sumsq,
       CAST(floor(sqrt(CAST(sum(smp * smp) AS DOUBLE) / count(*)) * 1000000 + 0.5)
            AS BIGINT) AS rms_micro
FROM v GROUP BY doc_id, win ORDER BY doc_id, win
""",
)
def multimodal_wav_rms_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy: decode each WAV (real RIFF parse), split
    samples into 4 index quarters, per-window sum-of-squares (exact
    int64) and micro-unit RMS — the downsampled loudness envelope a
    media-curation pipeline filters on (silence/clipping detection).
    Decode stays per-row mapInPandas work; the per-(doc, win) frame is
    4 rows/doc. The oracle recomputes every window from the synthesis
    formula, so a segmentation bug (window boundaries, remainder
    handling) cannot hide."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    payloads = d.mapInPandas(_gen_wav_batches, _PAYLOAD_SCHEMA)
    feats = payloads.mapInPandas(
        _wav_rms_batches, "doc_id long, win long, n_smp long, sumsq long"
    )
    return feats.select(
        "doc_id",
        "win",
        "n_smp",
        "sumsq",
        F.floor(
            F.sqrt(F.col("sumsq").cast("double") / F.col("n_smp")) * 1000000 + 0.5
        )
        .cast("long")
        .alias("rms_micro"),
    ).orderBy("doc_id", "win")


def _bmp_tile_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from sim_spark.ops.multimodal import decode_bmp

    for pdf in batches:
        rows = {"doc_id": [], "quad": [], "n_px": [], "val_sum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, px = decode_bmp(bytes(payload))
            a = np.frombuffer(px, dtype=np.uint8).astype(np.int64).reshape(h, w, 3)
            r_hi = np.arange(h) >= h // 2
            c_hi = np.arange(w) >= w // 2
            quad = (r_hi[:, None].astype(int) * 2 + c_hi[None, :].astype(int))
            for q in range(4):
                mask = quad == q
                rows["doc_id"].append(int(doc_id))
                rows["quad"].append(q)
                rows["n_px"].append(int(mask.sum()))
                rows["val_sum"].append(int(a[mask].sum()))
        yield pd.DataFrame(rows)


@query(
    "multimodal_bmp_tile_stats",
    oracle="""
WITH dims AS (
  SELECT doc_id, 4 + (doc_id % 13) AS w, 3 + (doc_id % 7) AS h FROM documents
),
cells AS (
  SELECT doc_id, w, h, rr.r, cc.c, hh.ch,
         (CASE WHEN rr.r >= h // 2 THEN 2 ELSE 0 END
          + CASE WHEN cc.c >= w // 2 THEN 1 ELSE 0 END) AS quad,
         (doc_id + 7 * rr.r + 13 * cc.c + 29 * hh.ch) % 256 AS val
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS r) rr,
       LATERAL (SELECT unnest(range(0, w)) AS c) cc,
       LATERAL (SELECT unnest(range(0, 3)) AS ch) hh
)
SELECT doc_id, CAST(quad AS BIGINT) AS quad,
       CAST(count(*) / 3 AS BIGINT) AS n_px,
       CAST(sum(val) AS BIGINT) AS val_sum
FROM cells GROUP BY doc_id, quad ORDER BY doc_id, quad
""",
)
def multimodal_bmp_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-quadrant pixel statistics over the genuinely DECODED image
    (2×2 spatial tiling at h//2, w//2): a wrong stride, row order, or
    tile boundary shifts some quadrant's sum, and the oracle — which
    recomputes every (row, col, channel) byte from the synthesis
    formula — catches it. Tiling is the downsample-for-vision-models
    preprocessing shape; per-row mapInPandas decode, 4 rows/doc out."""
    d = table(spark, sf_dir, "documents").select("doc_id", F.lit(0).alias("n_chars"))
    payloads = d.mapInPandas(_gen_bmp_batches, _PAYLOAD_SCHEMA)
    return (
        payloads.mapInPandas(
            _bmp_tile_batches, "doc_id long, quad long, n_px long, val_sum long"
        )
        .orderBy("doc_id", "quad")
    )
