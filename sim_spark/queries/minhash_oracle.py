"""MinHash + banded LSH near-dup dedup with a FULL DuckDB oracle.

The MLlib variant (`dedup_minhash_lsh`, ml_llm.py) is rows-only because
its hash family is implementation-private. This twin replaces the hash
family with one both engines can compute bit-identically — md5 of the
shingle string → 48-bit integer → fixed affine permutations
``(a_i * h + b_i) mod p`` over the Mersenne prime p = 2^31 - 1 — so the
ENTIRE pipeline (signatures, band buckets, candidate pairs, exact
Jaccard refine) is oracle-checkable, not just recall-tested.

Scale shape is the LSH one: per-doc signature is one partial+final
aggregate (16 MIN aggs over the exploded shingle hashes), banding
explodes 4 rows per doc, candidates come from an EQUI-join on
(band_no, band_value) — shuffle on short keys, never an all-pairs scan —
and the exact refine touches only colliding pairs. Thresholding is
integer arithmetic (9*inter >= 4*(na+nb) ⇔ Jaccard ≥ 0.8), so no float
boundary can flip membership between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query

from sim_spark.ops.minhash import (
    N_BANDS as _N_BANDS,
    P as _P,
    PERMS as _PERMS,
    ROWS_PER_BAND as _ROWS_PER_BAND,
    bands_cte_sql,
)


@query(
    "dedup_minhash_exactperm",
    oracle=f"""
WITH {bands_cte_sql()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.val = b.val AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN ex ea ON ea.doc_id = c.id_a
  JOIN ex eb ON eb.doc_id = c.id_b AND eb.shingle = ea.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       ROUND(i.i * 1.0 / (sa.n_sh + sb.n_sh - i.i), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE 9 * i.i >= 4 * (sa.n_sh + sb.n_sh)
""",
)
def dedup_minhash_exactperm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) → 4×4 banded LSH candidates → exact-Jaccard ≥ 0.8
    refine, every stage reproducible in SQL (see module docstring)."""
    d = table(spark, sf_dir, "documents")
    # Tokenize ONCE into a real column (dedup_onion_ngram note): a
    # split() spliced into the transform lambda re-evaluates per element
    # on the interpreted HOF path.
    t = d.select("doc_id", F.split("text", " ").alias("ws"))
    ws = F.col("ws")
    starts = F.when(
        F.size(ws) >= 3, F.sequence(F.lit(1), F.size(ws) - 2)
    ).otherwise(F.array().cast("array<int>"))
    sh = t.select(
        "doc_id",
        F.array_distinct(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(ws, i, 3)))
        ).alias("shingles"),
    )
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    h = (
        F.conv(F.substring(F.md5("shingle"), 1, 12), 16, 10).cast("long") % _P
    ).alias("h")
    hv = ex.select("doc_id", h)
    sig = hv.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % _P).alias(f"m{i}")
            for i, (a, b) in enumerate(_PERMS)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bno).alias("band_no"),
                F.concat_ws(
                    "-", *[F.col(f"m{bno * _ROWS_PER_BAND + r}") for r in range(_ROWS_PER_BAND)]
                ).alias("val"),
            )
            for bno in range(_N_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", F.col("b.band_no").alias("band_no"), F.col("b.val").alias("val")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    ea = ex.withColumnRenamed("doc_id", "id_a")
    eb = ex.withColumnRenamed("doc_id", "id_b")
    # shuffle_hash hints: Catalyst's sizeInBytes after the shingle
    # explode is a gross under-estimate, so it planned BROADCASTs of
    # the exploded frames — measured at sf10 (r13): "Not enough memory
    # to build and broadcast" on a ~50M-row build side. The exploded
    # refine legs must shuffle on their join keys; the tiny per-doc
    # `sizes` legs below stay broadcastable.
    inter = (
        cand.join(ea.hint("shuffle_hash"), "id_a")
        .join(eb.hint("shuffle_hash"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .filter(9 * F.col("i") >= 4 * (F.col("na") + F.col("nb")))
        .select(
            "id_a",
            "id_b",
            F.round(F.col("i") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("i")), 6).alias(
                "jaccard"
            ),
        )
    )
