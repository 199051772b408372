"""Lloyd's k-means as a driver-side iteration over DataFrame ops — the
sim reference's core pattern (iterative centroid refinement over cached
data) expressed Spark-natively (SURVEY.md §3.1.3, §4.1).

Per iteration: broadcast the k current centroids (tiny), one map stage
computes each vector's nearest centroid, one partial+final aggregation
produces per-centroid component sums → new centroids collect to the
driver (k × dim doubles — bytes, not data). The input DataFrame is
cached once; iterations add NO lineage growth on the big side because
each iteration's plan is rebuilt from the cached base with new literal
centroids.

Deterministic by construction: fixed init (first k vectors), distances
rounded before argmin, fixed iteration count — same result at any
partitioning. At 100 TB this is exactly MLlib KMeans' own shape; the
value of the relational form is that every step is oracle-inspectable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sim_spark.scratch import track_cache


def _assign(vectors: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """vec_id → (cluster, dist2) for the nearest of the literal centroids."""
    dist_cols = []
    for cid, emb in centroids:
        c_arr = F.array(*[F.lit(float(x)) for x in emb])
        d2 = F.aggregate(
            F.zip_with(
                "embedding", c_arr,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dist_cols.append(F.struct(F.round(d2, 6).alias("d2"), F.lit(cid).alias("cid")))
    # array_min over (d2, cid) structs: lexicographic min = nearest, ties
    # to the lowest centroid id — fully deterministic.
    best = F.array_min(F.array(*dist_cols))
    return vectors.select(
        "vec_id",
        "embedding",
        best.getField("cid").alias("cluster"),
        best.getField("d2").alias("dist2"),
    )


def kmeans_fit(
    vectors: DataFrame, k: int = 10, n_iter: int = 5, dim: int = 64
) -> tuple[DataFrame, list[tuple[int, list[float]]], list[float]]:
    """Run ``n_iter`` Lloyd iterations from the deterministic init (the k
    lowest vec_ids). Returns (cached base frame, final centroids,
    per-iteration inertia list). Only k x dim doubles ever reach the
    driver — the centroids ARE the model, and downstream consumers (the
    IVF coarse quantizer) need them as literals anyway."""
    base = track_cache(vectors.select("vec_id", "embedding"))
    centroids = [
        (i, list(map(float, r["embedding"])))
        for i, r in enumerate(
            base.orderBy("vec_id").limit(k).select("embedding").collect()
        )
    ]
    inertia: list[float] = []
    for _ in range(n_iter):
        assigned = _assign(base, centroids)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.sum("dist2").alias("sse"),
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("embedding", i + 1).cast("double")).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        inertia.append(round(sum(r["sse"] for r in stats), 4))
        # A cluster that captured no vectors keeps its previous centroid
        # (k never silently shrinks; the empty cluster may re-acquire
        # points in a later iteration — standard Lloyd's handling).
        refreshed = {
            r["cluster"]: [r[f"s{i}"] / r["n"] for i in range(dim)] for r in stats
        }
        centroids = [(cid, refreshed.get(cid, emb)) for cid, emb in centroids]
    return base, centroids, inertia


def kmeans_lloyd(
    vectors: DataFrame, k: int = 10, n_iter: int = 5, dim: int = 64
) -> tuple[DataFrame, list[float]]:
    """Run ``n_iter`` Lloyd iterations; returns (final assignment
    DataFrame, per-iteration inertia list — must be monotonically
    non-increasing)."""
    base, centroids, inertia = kmeans_fit(vectors, k, n_iter, dim)
    return _assign(base, centroids), inertia
