"""Relational PageRank — driver-iterates/cluster-aggregates, like
ops/kmeans_relational.py and ops/logistic_gd.py, except here NOTHING
numeric crosses the driver boundary: each iteration is a pure
DataFrame-to-DataFrame contribution join + sum, and only the loop
counter lives in Python.

Per iteration (standard power method with damping d):
  contrib(v)  = Σ_{u→v} rank(u) / outdeg(u)         one equi-join + sum
  rank'(v)    = (1-d)/N + d·(contrib(v) + dangling/N)
where `dangling` is the rank mass of nodes with no out-edges,
redistributed uniformly (the textbook stochastic-matrix fix).

Scale shape: the join shuffles on the edge's src key and the sum on
dst — both hash-partitioned and skew-tolerant under AQE; rank state is
one (node, rank) row per node, reliably checkpointed per round
(ops/materialize.py) so lineage stays flat over any iteration count and
an executor loss re-reads checkpoint files instead of killing the job. Convergence is geometric at rate
d, so a fixed ~10 rounds gives ~d^10 ≈ 0.2 % error regardless of graph
size — no data-dependent round count, unlike diameter-bound label
propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sim_spark.ops.materialize import materialize


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(node_col) + (src, dst) → (node_col, rank), Σ rank = 1 exactly up
    to float associativity. Duplicate edges count as parallel edges."""
    n = nodes.select(F.col(node_col).alias("id")).distinct().transform(materialize)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).transform(materialize)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Static per-node outdegree table; dangling nodes carry deg = null.
    base = n.join(deg, n.id == deg.src, "left").select("id", "deg").transform(materialize)
    # Uniform start: 1/N via a 1-row aggregate cross-joined back (AQE
    # broadcasts it) — same no-driver-scalars pattern as the loop body.
    rank = (
        base.select("id")
        .crossJoin(base.agg(F.count(F.lit(1)).alias("n0")))
        .select("id", (F.lit(1.0) / F.col("n0")).alias("rank"))
        .transform(materialize)
    )
    d = damping
    for _ in range(n_iter):
        st = base.join(rank, "id")
        contrib = (
            e.join(
                st.select(F.col("id").alias("src"), "rank", "deg"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        # One tiny 1-row frame: total node count and dangling rank mass,
        # cross-joined back (AQE broadcasts it) — no driver scalar pull.
        totals = st.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.when(F.col("deg").isNull(), F.col("rank")).otherwise(0.0)).alias(
                "dangling"
            ),
        )
        rank = (
            base.select("id")
            .join(contrib, "id", "left")
            .crossJoin(totals)
            .select(
                "id",
                (
                    (1.0 - d) / F.col("n_nodes")
                    + d
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("dangling") / F.col("n_nodes")
                    )
                ).alias("rank"),
            )
            .transform(materialize)
        )
    return rank.select(F.col("id").alias(node_col), "rank")
