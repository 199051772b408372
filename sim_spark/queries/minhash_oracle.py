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

_P = 2147483647  # 2^31 - 1
# Fixed affine permutation constants (odd multipliers, all < p).
_PERMS = [
    (1103515245, 12345),
    (1588635695, 453816693),
    (784588716, 1350291517),
    (1744031559, 2010748689),
    (211326293, 1197211237),
    (1458777923, 691953979),
    (1430561197, 1853717143),
    (1929778421, 511099247),
    (845396247, 1640574481),
    (1022129857, 1723483891),
    (557568705, 1321542799),
    (1871653121, 222465931),
    (618932459, 1100661313),
    (1483759013, 789323771),
    (1365180541, 1914123733),
    (950356117, 62237923),
]
_N_BANDS, _ROWS_PER_BAND = 4, 4


def _sql_hash(col: str) -> str:
    return f"(('0x' || substr(md5({col}), 1, 12))::BIGINT % {_P})"


_BAND_VALS_SQL = ", ".join(
    "m%d::VARCHAR || '-' || m%d::VARCHAR || '-' || m%d::VARCHAR || '-' || m%d::VARCHAR AS b%d"
    % (b * 4, b * 4 + 1, b * 4 + 2, b * 4 + 3, b)
    for b in range(_N_BANDS)
)

_MINS_SQL = ", ".join(
    f"MIN((CAST({a} AS BIGINT) * h + {b}) % {_P}) AS m{i}"
    for i, (a, b) in enumerate(_PERMS)
)

_BAND_UNION_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_no, b{b} AS val FROM banded" for b in range(_N_BANDS)
)


@query(
    "dedup_minhash_exactperm",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+2], ' ')
                        FOR i IN range(1, len(w) - 1)]) AS shingles
  FROM (SELECT doc_id, str_split(text, ' ') AS w FROM documents)
),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
hv AS (SELECT doc_id, {_sql_hash('shingle')} AS h FROM ex),
sig AS (SELECT doc_id, {_MINS_SQL} FROM hv GROUP BY doc_id),
banded AS (SELECT doc_id, {_BAND_VALS_SQL} FROM sig),
bands AS ({_BAND_UNION_SQL}),
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
    ws = F.split("text", " ")
    starts = F.when(
        F.size(ws) >= 3, F.sequence(F.lit(1), F.size(ws) - 2)
    ).otherwise(F.array().cast("array<int>"))
    sh = d.select(
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
    inter = (
        cand.join(ea, "id_a")
        .join(eb, ["id_b", "shingle"])
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
