"""Vectorized all-pairs cosine candidate generation (the fast path for
the embedding dedup/similarity family) — block-partitioned GEMM.

Per-pair `F.aggregate(zip_with(...))` dot products are JVM-interpreted
per element: at 2k vectors that is 4M pairs x 64 multiply-adds through
expression evaluation — tens of seconds. The Arrow path does the same
arithmetic as ONE numpy GEMM per block pair (`A @ B.T`), ~100x faster.

Scale contract: NOTHING is collected to the driver. Vectors are hashed
into ``n_blocks`` row blocks (`pmod(vec_id, n)`); each unordered block
pair (i <= j) becomes one shuffle group carrying the rows of both
blocks, and one numpy GEMM scores that block pair inside
``applyInPandas``. Total data movement is one pass of the corpus
replicated ``n_blocks + 1`` ways — the standard blocked outer-product
schedule, executor-memory-bounded by corpus/n_blocks per task no matter
the corpus size. Scale n_blocks with the corpus (rows/n ~ 10^5 keeps a
block pair's matrices ~100 MB at dim 64); here the fixture default of 8
exercises the full 36-group plan.

Exactness contract: GEMM float64 summation order differs from the
sequential order DuckDB (and Spark's HOF) uses, so a raw GEMM score can
land on the other side of a round(_,6) boundary in rare cases. The GEMM
therefore only PRUNES with a guard band (err bound for 64-term float64
dots is ~1e-15, guard is 1e-4), and the few surviving candidates get the
exact sequential dot + round + threshold — bitwise the same decision as
the naive plan, at the speed of the vectorized one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GUARD = 1e-4
_N_BLOCKS = 8


def _mat(series: pd.Series) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in series])


def cosine_candidate_pairs(
    e: DataFrame, threshold: float, n_blocks: int = _N_BLOCKS
) -> DataFrame:
    """(id_a < id_b) pairs whose GEMM dot exceeds ``threshold - guard``.

    Superset of the exact answer (never drops a true pair); feed through
    :func:`exact_cosine_pairs` for the final decision.

    Block plan: row block = ``pmod(vec_id, n_blocks)``; block pair
    (i, j), i <= j, is one group holding block i tagged side A and block
    j tagged side B (explode replication — a row in block b is side A of
    pairs (b, j>=b) and side B of pairs (i<=b, b)). Every unordered
    vector pair lands in exactly one group, so per-group emission (with
    in-group dedup for the diagonal, where both sides are the same
    block) is globally duplicate-free."""
    cut = threshold - _GUARD
    n = n_blocks
    base = e.select(
        "vec_id", "embedding", F.pmod(F.col("vec_id"), F.lit(n)).alias("blk")
    )
    a_side = base.select(
        "vec_id",
        "embedding",
        "blk",
        F.explode(F.sequence(F.col("blk"), F.lit(n - 1))).alias("other"),
    ).select(
        (F.col("blk") * n + F.col("other")).alias("pair"),
        F.lit(0).alias("side"),
        "vec_id",
        "embedding",
    )
    b_side = base.select(
        "vec_id",
        "embedding",
        "blk",
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("other"),
    ).select(
        (F.col("other") * n + F.col("blk")).alias("pair"),
        F.lit(1).alias("side"),
        "vec_id",
        "embedding",
    )

    def score_block_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        if a.empty or b.empty:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        a_ids = a["vec_id"].to_numpy(dtype=np.int64)
        b_ids = b["vec_id"].to_numpy(dtype=np.int64)
        s = _mat(a["embedding"]) @ _mat(b["embedding"]).T
        keep = (s > cut) & (a_ids[:, None] != b_ids[None, :])
        ai, bi = np.nonzero(keep)
        out = pd.DataFrame(
            {
                "id_a": np.minimum(a_ids[ai], b_ids[bi]),
                "id_b": np.maximum(a_ids[ai], b_ids[bi]),
            }
        )
        # Diagonal groups (side A == side B) see each unordered pair
        # twice; min/max normalization makes the twins identical rows.
        return out.drop_duplicates()

    return (
        a_side.unionAll(b_side)
        .groupBy("pair")
        .applyInPandas(score_block_pair, schema="id_a long, id_b long")
    )


def exact_topk_cosine(
    corpus: DataFrame, queries: DataFrame, k: int, n_blocks: int = _N_BLOCKS
) -> DataFrame:
    """Exact top-k by rounded cosine per query (qid, cid, score, rn),
    qid ≠ cid, ties broken by ascending cid — GEMM scores everything,
    a guard band keeps every row that could still be top-k under the
    exact ordering, and only those are exactly re-scored.

    ``corpus``: (cid, c_emb); ``queries``: (qid, q_emb). The corpus is
    hashed into ``n_blocks`` row blocks and the query set replicated to
    each block (queries are the bounded side by construction); one GEMM
    per block scores block × all-queries inside ``applyInPandas`` over a
    side-tagged UNION (the same single-grouped shape
    :func:`cosine_candidate_pairs` uses) — no driver materialization of
    either side. Deliberately NOT a cogrouped applyInPandas: the r10 sf1
    drive caught the cogroup form silently dropping whole blocks at
    higher shuffle parallelism (24 partitions: corpus blocks 1/4/6
    produced zero rows while the same plan was complete at 8 — the two
    grouped children co-partition inconsistently), and a union feeding
    ONE groupBy cannot misalign with itself."""
    from pyspark.sql.window import Window

    c_tag = corpus.select(
        F.pmod(F.col("cid"), F.lit(n_blocks)).cast("int").alias("blk"),
        F.lit(0).alias("side"),
        F.col("cid").alias("id"),
        F.col("c_emb").alias("emb"),
    )
    q_tag = queries.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("blk"),
        F.lit(1).alias("side"),
        F.col("qid").alias("id"),
        F.col("q_emb").alias("emb"),
    )

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        c_pdf = pdf[pdf["side"] == 0]
        q_pdf = pdf[pdf["side"] == 1]
        if c_pdf.empty or q_pdf.empty:
            return pd.DataFrame({"qid": [], "cid": [], "g": []}).astype(
                {"qid": "int64", "cid": "int64", "g": "float64"}
            )
        c_ids = c_pdf["id"].to_numpy(dtype=np.int64)
        q_ids = q_pdf["id"].to_numpy(dtype=np.int64)
        s = _mat(c_pdf["emb"]) @ _mat(q_pdf["emb"]).T  # (block, queries)
        ci, qi = np.nonzero(c_ids[:, None] != q_ids[None, :])
        return pd.DataFrame({"qid": q_ids[qi], "cid": c_ids[ci], "g": s[ci, qi]})

    gemm = (
        c_tag.unionAll(q_tag)
        .groupBy("blk")
        .applyInPandas(score_block, schema="qid long, cid long, g double")
    )

    w = Window.partitionBy("qid").orderBy(F.desc("g"), F.asc("cid"))
    wq = Window.partitionBy("qid")
    ranked = gemm.withColumn("r", F.row_number().over(w)).withColumn(
        "kth", F.min(F.when(F.col("r") <= k, F.col("g"))).over(wq)
    )
    cand = ranked.filter(F.col("g") >= F.col("kth") - F.lit(_GUARD)).select(
        "qid", "cid"
    )

    dot = F.aggregate(
        F.zip_with("q_emb", "c_emb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # No forced broadcasts: candidates are ~k per query, AQE picks the
    # join strategy from observed sizes (corpus stays shuffle-joinable
    # at any scale).
    exact = (
        cand.join(queries, "qid")
        .join(corpus, "cid")
        .select("qid", "cid", F.round(dot, 6).alias("score"))
    )
    we = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    return (
        exact.withColumn("rn", F.row_number().over(we).cast("bigint"))
        .filter(F.col("rn") <= k)
    )


def exact_cosine_pairs(
    e: DataFrame, threshold: float, with_score: bool = False
) -> DataFrame:
    """Exact (id_a < id_b, round(dot,6) > threshold) pairs: GEMM prune,
    then the sequential-order dot on the surviving candidates only."""
    cand = cosine_candidate_pairs(e, threshold)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("a_emb"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("b_emb"))
    dot = F.aggregate(
        F.zip_with("a_emb", "b_emb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    out = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(dot, 6).alias("score"))
        .filter(F.col("score") > threshold)
    )
    return out if with_score else out.select("id_a", "id_b")
