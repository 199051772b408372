"""Graph traversal operators over the co-purchase graph (round 5 —
VERDICT r4 "graph depth" gap): BFS hop layers, weighted single-source
shortest paths, and mode-based label propagation.

All three are K-round UNROLLED iterations (K fixed, small), so unlike
open-ended fixpoint algorithms they are SQL-expressible: the DuckDB
oracle replays the identical rounds as chained (non-recursive) CTEs and
every query is hash-checked end-to-end. All arithmetic is integer, so
there is no float-noise surface at all.

Spark shape per round: one equi-join of the state frame onto the edge
list + one keyed aggregate — the relational Bellman-Ford step. The state
is durably materialized per round (ops/materialize.py, same as PageRank):
each round references the previous state twice (relax leg + carry leg),
so un-cut lineage grows 2^K. At 100 TB the state frame is one row per
node and both the join and the aggregate hash-partition on the node key.
The full-relaxation form (re-relax every node each round, not just the
frontier) trades redundant work for a fixed per-round plan — the standard
scale formulation, since a frontier filter saves little once the frontier
is a large fraction of the graph and costs an extra distinct per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from sim_spark.ops.materialize import materialize
from sim_spark.queries.graph_ops import _EDGES_CTE, _copurchase_edges
from sim_spark.registry import query

# Undirected graph: mirror the canonical (u < v) edge list both ways.
_E2_CTE = (
    _EDGES_CTE
    + ", e2 AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v AS src, u AS dst FROM e)"
)

BFS_ROUNDS = 4
SSSP_ROUNDS = 4
LPA_ROUNDS = 3


def _edges_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Materialized once: every round (and both union legs) re-references
    # this frame; un-cut, the pair-generation self-join re-executes per
    # reference and the K-round plan grows exponentially (each round's
    # state references the previous state twice: relax + union).
    e = _copurchase_edges(spark, sf_dir)
    return e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).transform(materialize)


# --------------------------------------------------------------------------
# BFS hop layers
# --------------------------------------------------------------------------


def _bfs_oracle(rounds: int = BFS_ROUNDS) -> str:
    ctes = [
        "src AS (SELECT min(u) AS s FROM e)",
        "d0 AS (SELECT s AS node, 0 AS dist FROM src)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""d{k} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{k - 1}
    UNION ALL
    SELECT e2.dst AS node, d{k - 1}.dist + 1 AS dist
    FROM e2 JOIN d{k - 1} ON e2.src = d{k - 1}.node
  ) GROUP BY node)"""
        )
    return (
        _E2_CTE
        + ",\n"
        + ",\n".join(ctes)
        + f"""
SELECT CAST(dist AS BIGINT) AS dist, count(*) AS n_nodes
FROM d{rounds} GROUP BY dist ORDER BY dist"""
    )


@query("graph_bfs_layers", oracle=_bfs_oracle())
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance histogram of a {BFS_ROUNDS}-round BFS from the
    minimum part id. Each round re-relaxes every labeled node (min over
    self and neighbors+1) — the monotone Bellman-Ford step whose K-round
    result is exactly distance ≤ K, independent of execution order."""
    e2 = _edges_both(spark, sf_dir)
    dist = (
        e2.agg(F.min(F.least("src", "dst")).alias("node"))
        .select("node", F.lit(0).alias("dist"))
    )
    for _ in range(BFS_ROUNDS):
        relaxed = e2.join(dist, e2.src == dist.node).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .transform(materialize)
        )
    return (
        dist.groupBy(F.col("dist").cast("long").alias("dist"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("dist")
    )


# --------------------------------------------------------------------------
# Weighted single-source shortest paths (bounded Bellman-Ford)
# --------------------------------------------------------------------------


def _sssp_oracle(rounds: int = SSSP_ROUNDS) -> str:
    ctes = [
        # symmetric deterministic weight: 1 + (u+v) % 5, same both ways
        "ew AS (SELECT src, dst, 1 + (src + dst) % 5 AS w FROM e2)",
        "src0 AS (SELECT min(u) AS s FROM e)",
        "s0 AS (SELECT s AS node, 0 AS dist FROM src0)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""s{k} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM s{k - 1}
    UNION ALL
    SELECT ew.dst AS node, s{k - 1}.dist + ew.w AS dist
    FROM ew JOIN s{k - 1} ON ew.src = s{k - 1}.node
  ) GROUP BY node)"""
        )
    return (
        _E2_CTE
        + ",\n"
        + ",\n".join(ctes)
        + f"""
SELECT node, CAST(dist AS BIGINT) AS dist
FROM s{rounds} ORDER BY dist, node LIMIT 25"""
    )


@query("graph_sssp_weighted", oracle=_sssp_oracle())
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{SSSP_ROUNDS}-round Bellman-Ford from the minimum part id over
    deterministic symmetric integer weights (1 + (u+v) % 5): the 25
    nearest nodes by (distance, id). K bounded rounds give exact
    shortest paths among ≤K-edge walks — the relational relaxation whose
    per-round plan is one join + one min-aggregate."""
    e2 = _edges_both(spark, sf_dir)
    ew = e2.select(
        "src", "dst", (1 + (F.col("src") + F.col("dst")) % 5).alias("w")
    )
    dist = (
        e2.agg(F.min(F.least("src", "dst")).alias("node"))
        .select("node", F.lit(0).alias("dist"))
    )
    for _ in range(SSSP_ROUNDS):
        relaxed = ew.join(dist, ew.src == dist.node).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .transform(materialize)
        )
    return (
        dist.select("node", F.col("dist").cast("long").alias("dist"))
        .orderBy("dist", "node")
        .limit(25)
    )


# --------------------------------------------------------------------------
# Label propagation (mode of neighbor labels, deterministic tie-break)
# --------------------------------------------------------------------------


def _lpa_oracle(rounds: int = LPA_ROUNDS) -> str:
    ctes = ["l0 AS (SELECT DISTINCT src AS node, src AS label FROM e2)"]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""l{k} AS (
  SELECT node, label FROM (
    SELECT e2.dst AS node, l{k - 1}.label, count(*) AS c,
           row_number() OVER (
             PARTITION BY e2.dst
             ORDER BY count(*) DESC, l{k - 1}.label
           ) AS rn
    FROM e2 JOIN l{k - 1} ON e2.src = l{k - 1}.node
    GROUP BY e2.dst, l{k - 1}.label
  ) WHERE rn = 1)"""
        )
    return (
        _E2_CTE
        + ",\n"
        + ",\n".join(ctes)
        + f"""
SELECT label, count(*) AS n_members
FROM l{rounds} GROUP BY label ORDER BY n_members DESC, label LIMIT 20"""
    )


@query("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation, {LPA_ROUNDS} rounds: every node
    adopts the most frequent label among its neighbors, ties broken by
    smallest label — fully deterministic, unlike classic randomized LPA,
    so both engines replay it exactly. Per round: one join + one
    (node, label) count + one per-node top-1 window. Returns the 20
    largest communities."""
    e2 = _edges_both(spark, sf_dir)
    labels = e2.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(LPA_ROUNDS):
        counted = (
            e2.join(labels, e2.src == labels.node)
            .groupBy(F.col("dst").alias("n2"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = W.partitionBy("n2").orderBy(F.desc("c"), F.asc("label"))
        labels = (
            counted.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("n2").alias("node"), "label")
            .transform(materialize)
        )
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), "label")
        .limit(20)
    )
