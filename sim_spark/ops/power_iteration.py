"""Top principal component by power iteration, expressed relationally —
the same driver-iterates/cluster-aggregates shape as
ops/kmeans_relational.py (only k×dim model floats ever reach the driver;
the corpus never moves).

Per iteration, with current unit vector v and precomputed mean m:
  y_r = <x_r, v> - <m, v>          one HOF dot per row (JVM codegen)
  z_j = Σ_r x_rj·y_r - m_j·Σ_r y_r  dim+1 plain SUM aggregates
  v'  = z / ‖z‖                     driver-side dim floats
which is v' ∝ Cov·v without ever materializing the covariance matrix —
the two passes ARE the (X-m)ᵀ(X-m)v product, partial-aggregated
map-side like any groupBy. Deterministic: fixed init (1/√dim), fixed
iteration count, rounded projections.

At 100 TB this is the standard distributed eigensolver shape (MLlib's
RowMatrix.computePrincipalComponents does the same dance); the
relational form keeps every step oracle-inspectable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sim_spark.scratch import track_cache


def _dot_lit(col: str, vec: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(col, arr, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def power_iteration_top_component(
    vectors: DataFrame, dim: int = 64, n_iter: int = 8
) -> tuple[list[float], list[float], DataFrame]:
    """Returns (unit component, per-iteration eigenvalue estimates
    ‖Cov·v‖ — non-decreasing along the iteration, the classic power-
    iteration certificate — and the per-vector projection frame
    (vec_id, pc1_score) on the CENTERED data). Convergence note: the
    rate is λ2/λ1, so on near-isotropic data (this fixture: random unit
    vectors, nearly flat spectrum) the component is a high-variance
    direction certificate rather than THE eigenvector — exactly what
    the monotone-Rayleigh + beats-isotropic-average invariants pin."""
    base = track_cache(vectors.select("vec_id", "embedding"))
    sums = base.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.element_at("embedding", j + 1).cast("double")).alias(f"s{j}")
            for j in range(dim)
        ],
    ).collect()[0]  # dim+1 driver scalars — the model, not the data
    n = sums["n"]
    mean = [sums[f"s{j}"] / n for j in range(dim)]

    v = [1.0 / math.sqrt(dim)] * dim
    eig_history: list[float] = []
    for _ in range(n_iter):
        mv = sum(m * c for m, c in zip(mean, v))
        y = (_dot_lit("embedding", v) - F.lit(mv)).alias("y")
        zrow = base.select("vec_id", "embedding", y).agg(
            F.sum("y").alias("sy"),
            *[
                F.sum(
                    F.element_at("embedding", j + 1).cast("double") * F.col("y")
                ).alias(f"z{j}")
                for j in range(dim)
            ],
        ).collect()[0]
        z = [zrow[f"z{j}"] - mean[j] * zrow["sy"] for j in range(dim)]
        norm = math.sqrt(sum(c * c for c in z))
        if norm == 0.0:
            break
        eig_history.append(norm / n)
        v = [c / norm for c in z]

    mv = sum(m * c for m, c in zip(mean, v))
    scores = base.select(
        "vec_id", F.round(_dot_lit("embedding", v) - F.lit(mv), 6).alias("pc1_score")
    )
    return v, eig_history, scores
