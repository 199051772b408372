"""Full-batch logistic regression by gradient descent, expressed
relationally — the third member of the driver-iterates/cluster-
aggregates family (ops/kmeans_relational.py, ops/power_iteration.py).

Per epoch, with weights w and bias b (driver-held model floats):
  p_r    = sigmoid(<x_r, w> + b)      one HOF dot per row (JVM codegen)
  g_j    = (1/n) Σ_r (p_r - y_r)·x_rj  dim+2 plain SUM aggregates
  loss   = (1/n) Σ_r softplus((1-2y_r)·margin_r)
  (w, b) ← (w, b) - lr·g              driver-side dim+1 floats
so one aggregation pass per epoch IS the gradient — partial-aggregated
map-side, nothing but the model on the driver, corpus never moves.

Guarantee used by the tests: full-batch GD on the (convex) logistic
loss strictly decreases the objective whenever lr < 2/L; with
unit-norm-ish rows L <= 0.25·max‖x‖² + eps, so lr=1 is safely inside
the monotone region — the loss history is a convergence certificate,
not a stochastic trace.
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


def logistic_gd(
    vectors: DataFrame,
    label_col: str = "y",
    dim: int = 64,
    n_epochs: int = 6,
    lr: float = 1.0,
) -> tuple[list[float], float, list[float], DataFrame]:
    """Train sigmoid(<x,w>+b) ~ y on (vec_id, embedding, y in {0,1}).

    Returns (w, b, per-epoch mean-loss history including the final
    model's loss — len n_epochs+1, non-increasing — and the scored
    frame (vec_id, y, margin rounded to 6, predicted class)). Only
    dim+2 floats cross the driver boundary per epoch."""
    base = vectors.select(
        "vec_id", "embedding", F.col(label_col).cast("double").alias("y")
    )
    base = track_cache(base)
    w = [0.0] * dim
    b = 0.0
    history: list[float] = []
    for _ in range(n_epochs + 1):
        margin = (_dot_lit("embedding", w) + F.lit(b)).alias("m")
        scored = base.select("embedding", "y", margin)
        # softplus((1-2y)m) = log(1+exp(-(2y-1)m)): exact logistic loss,
        # computed in its numerically-stable form.
        stable_sp = (
            F.greatest((1 - 2 * F.col("y")) * F.col("m"), F.lit(0.0))
            + F.log1p(F.exp(-F.abs(F.col("m"))))
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))
        row = scored.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(stable_sp).alias("loss"),
            F.sum(p - F.col("y")).alias("gb"),
            *[
                F.sum(
                    (p - F.col("y")) * F.element_at("embedding", j + 1).cast("double")
                ).alias(f"g{j}")
                for j in range(dim)
            ],
        ).collect()[0]  # dim+2 model floats — never the data
        n = row["n"]
        history.append(row["loss"] / n)
        if len(history) == n_epochs + 1:
            break
        w = [w[j] - lr * row[f"g{j}"] / n for j in range(dim)]
        b = b - lr * row["gb"] / n

    final_margin = _dot_lit("embedding", w) + F.lit(b)
    preds = base.select(
        "vec_id",
        F.col("y").cast("int").alias("y"),
        F.round(final_margin, 6).alias("margin"),
        (final_margin > 0).cast("int").alias("pred"),
    )
    assert all(math.isfinite(x) for x in w) and math.isfinite(b)
    return w, b, history, preds
