"""Vectorized all-pairs cosine candidate generation (the fast path for
the embedding dedup/similarity family).

Per-pair `F.aggregate(zip_with(...))` dot products are JVM-interpreted
per element: at 2k vectors that is 4M pairs x 64 multiply-adds through
expression evaluation — tens of seconds. The Arrow path does the same
arithmetic as ONE numpy GEMM per batch (`B @ M.T`), ~100x faster.

Exactness contract: GEMM float64 summation order differs from the
sequential order DuckDB (and Spark's HOF) uses, so a raw GEMM score can
land on the other side of a round(_,6) boundary in rare cases. The GEMM
therefore only PRUNES with a guard band (err bound for 64-term float64
dots is ~1e-15, guard is 1e-4), and the few surviving candidates get the
exact sequential dot + round + threshold — bitwise the same decision as
the naive plan, at the speed of the vectorized one.

Scale note: the corpus matrix is collected and closure-broadcast, so
this variant requires one side to fit in executor memory (2k x 64 f64 =
1 MB here; ~1 GB at 2M vectors — still fine). Beyond that, partition
both sides and take the outer product of blocks (same GEMM kernel per
block pair), or move to the LSH-bucketed `sim_ann_ivf` path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GUARD = 1e-4


def cosine_candidate_pairs(e: DataFrame, threshold: float) -> DataFrame:
    """(id_a < id_b) pairs whose GEMM dot exceeds ``threshold - guard``.

    Superset of the exact answer (never drops a true pair); feed through
    :func:`exact_cosine_pairs` for the final decision."""
    rows = sorted(e.select("vec_id", "embedding").collect(), key=lambda r: r[0])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cut = threshold - _GUARD

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty or mat.size == 0:
                continue
            b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            b = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            scores = b @ mat.T  # (batch, corpus)
            keep = (scores > cut) & (b_ids[:, None] < ids[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame({"id_a": b_ids[ai], "id_b": ids[bi]})

    return e.select("vec_id", "embedding").mapInPandas(
        gen, schema="id_a long, id_b long"
    )


def exact_topk_cosine(
    corpus: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """Exact top-k by rounded cosine per query (qid, cid, score, rn),
    qid ≠ cid, ties broken by ascending cid — GEMM scores everything,
    a guard band keeps every row that could still be top-k under the
    exact ordering, and only those are exactly re-scored.

    ``corpus``: (cid, c_emb); ``queries``: (qid, q_emb), small enough to
    collect (it is already the broadcast side of the naive plan)."""
    from pyspark.sql.window import Window

    qrows = sorted(queries.select("qid", "q_emb").collect(), key=lambda r: r[0])
    q_ids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["q_emb"] for r in qrows], dtype=np.float64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty or q_mat.size == 0:
                continue
            c_ids = pdf["cid"].to_numpy(dtype=np.int64)
            c = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["c_emb"]])
            s = c @ q_mat.T  # (batch, n_queries)
            ci, qi = np.nonzero(c_ids[:, None] != q_ids[None, :])
            yield pd.DataFrame(
                {"qid": q_ids[qi], "cid": c_ids[ci], "g": s[ci, qi]}
            )

    gemm = corpus.select(
        F.col("cid"), F.col("c_emb")
    ).mapInPandas(gen, schema="qid long, cid long, g double")

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
    exact = (
        cand.join(F.broadcast(queries), "qid")
        .join(F.broadcast(corpus), "cid")
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
        cand.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .select("id_a", "id_b", F.round(dot, 6).alias("score"))
        .filter(F.col("score") > threshold)
    )
    return out if with_score else out.select("id_a", "id_b")
