"""Graph and sketch operators (SURVEY.md §2.13 extension): PageRank
over the user↔event-type interaction graph and a count-min sketch for
heavy hitters — both rows-only keys (iterative float ranks and hashed
counters aren't SQL-derivable) with certificates in
tests/test_invariants.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query

CMS_DEPTH = 4
CMS_WIDTH = 2048


def _pagerank_oracle(n_iter: int = 10) -> str:
    """Unrolled (not recursive) damped power method as chained CTEs —
    deterministic arithmetic DuckDB can replay, which is what promotes
    `graph_pagerank` from rows-only to hash-oracled (VERDICT r4 task #8).
    Constants are written as the same IEEE expressions Spark evaluates
    ((1.0 - 0.85), 0.85) so both engines use bit-identical coefficients;
    the residual float noise is summation order, ~1e-16, absorbed by the
    micro-unit rounding in the final select."""
    ctes = [
        "pairs AS MATERIALIZED (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,"
        " 't:' || event_type AS t FROM events)",
        "e AS MATERIALIZED (SELECT u AS src, t AS dst FROM pairs"
        " UNION ALL SELECT t AS src, u AS dst FROM pairs)",
        "n AS MATERIALIZED (SELECT DISTINCT src AS id FROM e)",
        "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "nn AS (SELECT count(*) AS n_nodes FROM n)",
        "r0 AS (SELECT id, 1.0 / (SELECT n_nodes FROM nn) AS rank FROM n)",
    ]
    for k in range(1, n_iter + 1):
        ctes.append(
            f"""r{k} AS MATERIALIZED (
  SELECT n.id,
         (1.0 - 0.85) / (SELECT n_nodes FROM nn)
           + 0.85 * COALESCE(c.contrib, 0.0) AS rank
  FROM n LEFT JOIN (
    SELECT e.dst AS id, sum(r{k - 1}.rank / deg.deg) AS contrib
    FROM e JOIN r{k - 1} ON e.src = r{k - 1}.id JOIN deg ON deg.src = e.src
    GROUP BY e.dst
  ) c ON n.id = c.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id, CAST(floor(rank * 1000000 + 0.5) AS BIGINT) AS rank_micro
FROM r{n_iter} ORDER BY rank_micro DESC, id LIMIT 50"""
    )


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (ops/pagerank.py) over the bipartite user↔event-type
    graph (an edge each way per distinct interaction, so no dangling
    mass and rank flows both directions). Per iteration: one equi-join
    shuffle + one sum — the relational power method; 10 damped rounds
    give a ~0.2 % geometric tail regardless of graph size. Returns the
    top 50 nodes by micro-unit rank (floor(rank·1e6 + 0.5) — integer
    output so the value hash is immune to float rendering); both engines
    order by the ROUNDED rank with id tiebreak so the top-50 cut is
    identical. Certificates (Σ rank = 1, positivity, determinism, degree
    monotonicity on the type side) remain in tests/test_invariants.py."""
    from sim_spark.ops.pagerank import pagerank

    e = table(spark, sf_dir, "events")
    pairs = e.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
    ).distinct()
    edges = pairs.select(F.col("u").alias("src"), F.col("t").alias("dst")).unionAll(
        pairs.select(F.col("t").alias("src"), F.col("u").alias("dst"))
    )
    nodes = (
        pairs.select(F.col("u").alias("id"))
        .unionAll(pairs.select(F.col("t").alias("id")))
        .distinct()
    )
    pr = pagerank(nodes, edges, node_col="id", n_iter=10)
    return (
        pr.select(
            "id",
            F.floor(F.col("rank") * 1000000 + 0.5).cast("long").alias("rank_micro"),
        )
        .orderBy(F.desc("rank_micro"), "id")
        .limit(50)
    )


@query("sketch_cms_topk")  # rows-only: hashed-counter estimates aren't SQL-derivable
def sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters over the corpus word stream: each
    word increments DEPTH hashed counters (one explode + ONE
    (row, col)-keyed count — the sketch build is a single shuffle of
    bounded width DEPTH x WIDTH no matter the corpus size, and the
    counters are sums, so partial aggregation merges shards for free).
    A word's estimate is the min of its DEPTH counters (never below the
    true count); the key reports the top 20 estimated words. The
    overcount bound and est >= exact are pinned in
    tests/test_invariants.py."""
    d = table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(F.xxhash64("word", F.lit(r)), F.lit(CMS_WIDTH)).alias("c"),
            )
            for r in range(CMS_DEPTH)
        ]
    )
    cms = (
        words.select(F.explode(cells).alias("cell"))
        .groupBy("cell.r", "cell.c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = words.distinct().select(
        "word", F.explode(cells).alias("cell")
    ).select("word", "cell.r", "cell.c")
    est = (
        vocab.join(cms, ["r", "c"])
        .groupBy("word")
        .agg(F.min("cnt").alias("est"))
    )
    return est.orderBy(F.desc("est"), "word").limit(20)


@query("embed_pq_codes")  # rows-only: learned codebooks aren't SQL-derivable
def embed_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (ops/product_quant.py): 64-dim
    float vectors compressed to 8 sub-space code ids (16-way codebooks
    learned on a deterministic hash sample via relational Lloyd's) plus
    the per-vector squared reconstruction error. Certificates — code
    range, determinism, and reconstruction beating the 1-centroid
    baseline per subspace — are pinned in tests/test_invariants.py."""
    from sim_spark.ops.product_quant import pq_encode, pq_fit_codebooks

    e = table(spark, sf_dir, "embeddings")
    books = pq_fit_codebooks(e, m=8, k=16, dim=64, n_iter=4)
    enc = pq_encode(e, books, dim=64)
    # The driver's canonicalizer hashes column values via pandas, which
    # cannot hash a raw list — emit the code vector as a sortable
    # comma-joined scalar instead of array<int>.
    return enc.select(
        "vec_id",
        F.array_join(F.col("codes").cast("array<string>"), ",").alias("codes"),
        "err",
    ).orderBy("vec_id")
