"""Projection / filter / predicate operators (SURVEY.md §2.2).

All narrow transformations: no shuffle, whole-stage-codegen'd, filters and
column selection pushed into the parquet scan by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query


@query(
    "project_compute",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       CAST(l_quantity AS INTEGER) AS qty_int,
       l_returnflag || '/' || l_linestatus AS flag_status
FROM lineitem
""",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns: arithmetic, cast, string concat — per-row IEEE
    double math is deterministic, so raw doubles hash-match."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


@query(
    "filter_multi_pred",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE (p_size BETWEEN 10 AND 30 AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3'))
   OR (p_type LIKE 'PROMO%' AND p_name LIKE '%ring%')
""",
)
def filter_multi_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR of range, set-membership, and pattern predicates."""
    p = table(spark, sf_dir, "part")
    keep = (
        F.col("p_size").between(10, 30)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ) | (F.col("p_type").like("PROMO%") & F.col("p_name").like("%ring%"))
    return p.filter(keep).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@query(
    "filter_null_semantics",
    oracle="""
SELECT
  COUNT(*) AS n_rows,
  COUNT(NULLIF(l_discount, 0.0)) AS n_nonzero_disc,
  CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_big_disc,
  CAST(SUM(CASE WHEN NOT (NULLIF(l_discount, 0.0) > 0.05) THEN 1 ELSE 0 END) AS BIGINT) AS n_small_disc,
  CAST(SUM(CASE WHEN (NULLIF(l_discount, 0.0) > 0.05) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown
FROM lineitem
""",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic over a derived nullable column: a NULL predicate
    is neither TRUE nor NOT TRUE — n_big + n_small + n_unknown = n_rows."""
    li = table(spark, sf_dir, "lineitem")
    nz = F.nullif(F.col("l_discount"), F.lit(0.0))
    pred = nz > 0.05
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(nz).alias("n_nonzero_disc"),
        F.sum(F.when(pred, 1).otherwise(0)).alias("n_big_disc"),
        F.sum(F.when(~pred, 1).otherwise(0)).alias("n_small_disc"),
        F.sum(F.when(pred.isNull(), 1).otherwise(0)).alias("n_unknown"),
    )


@query(
    "voxel_binarize",
    oracle="""
SELECT vec_id,
       CAST(list_sum(list_transform(embedding,
            x -> CASE WHEN CAST(x AS DOUBLE) > 0.1 THEN 1 ELSE 0 END))
            AS BIGINT) AS n_above
FROM embeddings
""",
)
def voxel_binarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-element threshold over the embedding array (sim's binarization
    pipeline semantics — threshold a block of voxel intensities, count
    survivors). Higher-order functions keep it in Tungsten: no Python, no
    explode-shuffle; at 100 TB this is a pure map stage.

    The oracle casts each float element to DOUBLE before comparing
    (r12): Spark promotes float > double-literal to a double compare,
    while DuckDB's bare ``x > 0.1`` compares on the float side — the
    sf10 sweep caught one element (of 2M) whose float32 value sits
    inside that one-ulp window and flips between the two readings."""
    e = table(spark, sf_dir, "embeddings")
    binarized = F.transform("embedding", lambda x: (x > F.lit(0.1)).cast("int"))
    return e.select(
        "vec_id",
        F.aggregate(binarized, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "n_above"
        ),
    )


@query(
    "voxel_mean_image",
    oracle="""
WITH px AS (
  SELECT unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
)
SELECT CAST(pos - 1 AS BIGINT) AS pos,
       count(*) AS n_vecs,
       CAST(floor((2.0 * CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                      AS BIGINT)) AS DOUBLE) + count(*))
                  / (2.0 * count(*))) AS DOUBLE) / 1000000 AS mean_intensity,
       min(x) AS min_x,
       max(x) AS max_x
FROM px GROUP BY pos
""",
)
def voxel_mean_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-level voxel statistics: the element-wise mean/min/max across
    every subject's intensity block — sim's across-images reduction (the
    step after per-image maps like binarize/increment). posexplode +
    per-position partial+final aggregate: the shuffle is bounded by
    dim × partition count regardless of subject count, the map side
    pre-aggregates, and the mean sums integer micro-units
    (floor(x·1e6 + 0.5) of the exactly-widened float) so neither float
    summation order nor cross-engine float→DECIMAL rounding (which DID
    diverge: DuckDB casts FLOAT via its shortest decimal repr, the JVM
    via the exact double) can drift the result."""
    e = table(spark, sf_dir, "embeddings")
    px = e.select(F.posexplode("embedding").alias("pos", "x"))
    micro = F.floor(F.col("x").cast("double") * 1000000 + 0.5).cast("bigint")
    # Sign-safe integer half-up mean (floor((2s + n) / 2n)): a float
    # ROUND of the micro-sum/count ratio can land exactly on a 6dp half
    # boundary (2s = n*(2k+1)), where the engines' ROUNDs disagree.
    n_ = F.count(F.lit(1))
    mean_micro = F.floor(
        (2.0 * F.sum(micro).cast("double") + n_) / (2.0 * n_)
    ).cast("long")
    return px.groupBy(F.col("pos").cast("long").alias("pos")).agg(
        n_.alias("n_vecs"),
        (mean_micro.cast("double") / 1000000).alias("mean_intensity"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
    )
