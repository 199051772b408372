"""Engine-portable MinHash banding: the shared hash family and band
computation used by batch LSH dedup (queries/minhash_oracle.py) and the
streaming ingest-dedup gate (streaming/mounts.py band_first_owner_stream).

Two formulations of the SAME signature:

- ``minhash_bands_narrow``: per-row array HOFs — shingle, hash, and take
  the 16 permutation minima entirely inside the row (``transform`` +
  ``array_min``), then explode only the 4 band rows. ZERO shuffle before
  banding, which is what makes the signature computable inside a
  stateless streaming projection (no watermark, no aggregation state)
  and is also the cheaper batch plan: the explode→groupBy(doc) shuffle
  of the aggregate formulation disappears, and per-doc work is a narrow
  map that scales embarrassingly at 100 TB.
- ``bands_cte_sql``: the identical math as DuckDB CTE text (via the
  aggregate formulation, which SQL expresses naturally) — both oracle
  strings that need band buckets share this one definition.

Hash family: md5(shingle) → 48-bit int → fixed affine permutations
``(a_i * h + b_i) mod (2^31 - 1)`` — bit-identical across engines, no
implementation-private RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 2147483647  # 2^31 - 1 (Mersenne prime modulus)
# Fixed affine permutation constants (odd multipliers, all < p).
PERMS = [
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
N_BANDS, ROWS_PER_BAND = 4, 4


def sql_hash(col: str) -> str:
    """DuckDB text for the shared 48-bit md5 shingle hash."""
    return f"(('0x' || substr(md5({col}), 1, 12))::BIGINT % {P})"


def _shingles(ws: Column) -> Column:
    """Distinct 3-word shingles from a PRE-TOKENIZED word array (in-row).

    Takes the token array, not the raw text: a split() spliced into the
    transform lambda would re-evaluate per element on the interpreted
    HOF path (dedup_onion_ngram note) — callers project the array into
    a real column first."""
    starts = F.when(
        F.size(ws) >= 3, F.sequence(F.lit(1), F.size(ws) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(ws, i, 3)))
    )


def minhash_bands_narrow(d: DataFrame) -> DataFrame:
    """(doc_id, band_no, val) band rows computed without any shuffle.

    Documents with fewer than 3 words have no shingles and are dropped
    (same as the aggregate formulation, where they never reach the
    GROUP BY). `array_min` over the in-row permuted hashes is exactly
    the per-doc MIN aggregate of the exploded formulation.
    """
    hs = F.transform(
        _shingles(F.col("ws")),
        lambda s: F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long") % P,
    )
    sig = (
        d.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.split("text", " ").alias("ws"),
        )
        .select("doc_id", hs.alias("hs"))
        .filter(F.size("hs") > 0)
    )
    def _perm_min(a: int, b: int) -> Column:
        # closure factory: PySpark derives HOF arity from the lambda's
        # signature, so the constants must be captured, not defaulted
        return F.array_min(F.transform(F.col("hs"), lambda h: (F.lit(a) * h + F.lit(b)) % P))

    mins = [_perm_min(a, b).alias(f"m{i}") for i, (a, b) in enumerate(PERMS)]
    sig = sig.select("doc_id", *mins)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bno).alias("band_no"),
                F.concat_ws(
                    "-",
                    *[F.col(f"m{bno * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                ).alias("val"),
            )
            for bno in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", F.col("b.band_no").alias("band_no"), F.col("b.val").alias("val")
    )


_BAND_VALS_SQL = ", ".join(
    "m%d::VARCHAR || '-' || m%d::VARCHAR || '-' || m%d::VARCHAR || '-' || m%d::VARCHAR AS b%d"
    % (b * 4, b * 4 + 1, b * 4 + 2, b * 4 + 3, b)
    for b in range(N_BANDS)
)

_MINS_SQL = ", ".join(
    f"MIN((CAST({a} AS BIGINT) * h + {b}) % {P}) AS m{i}"
    for i, (a, b) in enumerate(PERMS)
)

_BAND_UNION_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_no, b{b} AS val FROM banded" for b in range(N_BANDS)
)


def bands_cte_sql() -> str:
    """The WITH-clause body producing ``bands(doc_id, band_no, val)``
    from ``documents`` — shared by every oracle that needs band buckets."""
    return f"""sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+2], ' ')
                        FOR i IN range(1, len(w) - 1)]) AS shingles
  FROM (SELECT doc_id, str_split(text, ' ') AS w FROM documents)
),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
hv AS (SELECT doc_id, {sql_hash('shingle')} AS h FROM ex),
sig AS (SELECT doc_id, {_MINS_SQL} FROM hv GROUP BY doc_id),
banded AS (SELECT doc_id, {_BAND_VALS_SQL} FROM sig),
bands AS ({_BAND_UNION_SQL})"""
