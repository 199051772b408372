"""Product quantization (PQ) — the standard 100 TB embedding-store
compressor (Jégou et al., *Product Quantization for Nearest Neighbor
Search*, public literature): split each dim-D vector into M contiguous
subspaces, learn a tiny k-means codebook per subspace on a sample, and
store each vector as M small code ids (here 8 × 4 bits of structure vs
64 float32s ≈ 64× smaller, plus a per-vector reconstruction error).

Spark-first shape: codebooks are fit with the existing relational
Lloyd's (ops/kmeans_relational.py) on a DETERMINISTIC hash sample per
subspace — M·k·(D/M) doubles on the driver, never the corpus. Encoding
is one narrow projection: per subspace an `array_min` over k literal
(distance, code) structs — all JVM codegen, no Python, no shuffle — so
encode throughput is scan-bound at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sim_spark.ops.kmeans_relational import kmeans_fit


def pq_fit_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    n_iter: int = 4,
    sample_mod: int = 5,
) -> list[list[tuple[int, list[float]]]]:
    """Fit one k-code codebook per subspace on the vec_id % sample_mod
    == 0 sample (deterministic, partitioning-independent). Returns
    codebooks[s] = [(code_id, centroid), ...]."""
    sub_dim = dim // m
    sample = vectors.filter(F.col("vec_id") % sample_mod == 0)
    books = []
    for s in range(m):
        sub = sample.select(
            "vec_id", F.slice("embedding", s * sub_dim + 1, sub_dim).alias("embedding")
        )
        base, centroids, _ = kmeans_fit(sub, k=k, n_iter=n_iter, dim=sub_dim)
        base.unpersist()
        books.append(centroids)
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    dim: int = 64,
) -> DataFrame:
    """(vec_id, codes array<int>, err double): per subspace the nearest
    code (ties to the lowest code id via lexicographic struct min —
    deterministic), err = total squared reconstruction error."""
    m = len(codebooks)
    sub_dim = dim // m
    bests = []
    for s, book in enumerate(codebooks):
        sub = F.slice("embedding", s * sub_dim + 1, sub_dim)
        cands = []
        for cid, emb in book:
            c_arr = F.array(*[F.lit(float(x)) for x in emb])
            d2 = F.aggregate(
                F.zip_with(
                    sub,
                    c_arr,
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            cands.append(
                F.struct(F.round(d2, 6).alias("d2"), F.lit(cid).alias("cid"))
            )
        bests.append(F.array_min(F.array(*cands)))
    codes = F.array(*[b.getField("cid") for b in bests])
    err = sum(b.getField("d2") for b in bests[1:]) + bests[0].getField("d2")
    return vectors.select(
        "vec_id",
        codes.alias("codes"),
        F.round(err, 6).alias("err"),
    )
