"""Data-layout operators for the 100 TB path: bucketed co-located joins,
range-partitioned sorted sinks, and embedding-space near-dup dedup.

These are the ops whose *plans* are the point — the oracle checks the
values, tests/test_scale_ops.py checks the physical properties (no
Exchange on the bucketed join; disjoint per-file ranges on the sorted
sink).
"""

from __future__ import annotations


import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.exprs import dsum, sql_dsum, ts_str
from sim_spark.io import table
from sim_spark.ops.bucketing import write_bucketed
from sim_spark.registry import query
from sim_spark.scratch import scratch_dir, sf_tag as scratch_sf_tag


@query(
    "join_bucketed_colocated",
    oracle=f"""
SELECT o.o_orderstatus AS status,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus ORDER BY status
""",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders with both sides pre-bucketed on the order key:
    the join itself needs no Exchange and no Sort (bucketBy+sortBy at
    write time). At 100 TB this amortizes the fact-table shuffle across
    every downstream query on the same key. bench.py times the two legs
    separately (`..._write` / `..._read`): the write is the pay-once
    ingest cost, the Exchange-free read is what every later query pays."""
    bucketed_layout(spark, sf_dir)
    return bucketed_join_read(spark, sf_dir)


# Keyed by (Spark application id, sf_dir): the catalog tables behind these
# handles are session-scoped, so a cache hit from a stopped/previous
# session must miss rather than hand back dead DataFrames.
_BUCKETED_SIDES: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def bucketed_layout(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The WRITE leg: persist both join sides bucketed+sorted on the
    order key (the pay-shuffle-once ingest step); returns the catalog
    table handles and caches them per sf_dir for the read leg."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    # Tag the catalog table names with the sf_dir so layouts for two
    # scale factors written in one process never overwrite each other.
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    # r14: the two table writes are independent jobs — submit them from
    # a 2-thread pool so the small orders write back-fills executor
    # slots freed by the lineitem write's tail instead of serializing
    # after it (optimization guide §2.6). The writes target distinct
    # tables; the shared CREATE DATABASE is IF NOT EXISTS on a
    # process-private location, so the DDL race is benign.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fl = pool.submit(
            write_bucketed, spark, li, f"lio_l_{tag}", "l_orderkey", n_buckets=8
        )
        fr = pool.submit(
            write_bucketed, spark, o, f"lio_r_{tag}", "o_orderkey", n_buckets=8
        )
        lt, rt = fl.result(), fr.result()
    key = (spark.sparkContext.applicationId, sf_dir)
    _BUCKETED_SIDES[key] = (lt, rt)
    return _BUCKETED_SIDES[key]


def bucketed_join_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ leg: join + aggregate over the already-written bucketed
    tables — zero Exchange (plan-asserted in tests/test_scale_ops.py).
    Writes the layout first if this process hasn't written this sf_dir;
    the cache is keyed by sf_dir so mixed-scale calls never read a
    stale layout."""
    key = (spark.sparkContext.applicationId, sf_dir)
    lt, rt = _BUCKETED_SIDES.get(key) or bucketed_layout(spark, sf_dir)
    j = lt.hint("merge").join(rt, lt["l_orderkey"] == rt["o_orderkey"])
    return (
        j.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("status")
    )


@query(
    "sink_sorted_ranges",
    oracle=f"""
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       COUNT(*) AS n_lines,
       strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S') AS first_ship,
       strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') AS last_ship
FROM lineitem GROUP BY year(l_shipdate) ORDER BY ship_year
""",
)
def sink_sorted_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned, internally-sorted parquet sink, then a read
    back. ``repartitionByRange + sortWithinPartitions`` gives every file
    a disjoint [min,max] l_shipdate span, so a future time-range scan
    prunes whole files from parquet footer stats alone — the layout that
    makes a 100 TB time-series table queryable. Values verified against
    the source; the disjoint-range property against the file footers in
    tests/test_scale_ops.py. Lazy read-back from a per-process scratch
    dir — no driver-side materialization."""
    li = table(spark, sf_dir, "lineitem")
    sf_tag = scratch_sf_tag(sf_dir)
    out = scratch_dir(f"sink_sorted_ranges_{sf_tag}")
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            ts_str(F.min("l_shipdate")).alias("first_ship"),
            ts_str(F.max("l_shipdate")).alias("last_ship"),
        )
        .orderBy("ship_year")
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
WITH pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  -- list_inner_product over DOUBLE[]-cast lists: identical rounded
  -- scores to the unnest-SUM formulation (verified pairwise at sf0.1),
  -- without the 64x unnest blowup that spilled ~38 GB at sf10
  WHERE ROUND(list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])), 6) > 0.4
)
SELECT e.vec_id AS doc_id,
       COALESCE(MIN(p.id_a), e.vec_id) AS canonical_id,
       MIN(p.id_a) IS NOT NULL AS is_near_dup
FROM embeddings e LEFT JOIN pairs p ON p.id_b = e.vec_id
GROUP BY e.vec_id
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup: each vector maps to the smallest
    id among its >0.4-cosine neighbors (one-hop single-linkage; vectors
    are L2-normalized so dot ≡ cosine; 0.4 sits in the top ~0.1% of the
    fixture's pair-score distribution — measured max is 0.51, so a
    'realistic' 0.8 would make the op vacuously pass on zero edges).
    The keep-set is ``canonical_id = doc_id``. At scale the quadratic
    candidate join is replaced by the LSH-bucketed variant
    (``sim_ann_ivf`` path); this is the exact formulation both are
    measured against. Full transitive grouping: ``dedup_connected_components``."""
    e = table(spark, sf_dir, "embeddings")
    pairs = _cosine_pairs(e, 0.4)
    return (
        e.join(pairs, e.vec_id == pairs.id_b, "left")
        .groupBy("vec_id")
        .agg(F.min("id_a").alias("__min_n"))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.coalesce("__min_n", "vec_id").alias("canonical_id"),
            F.col("__min_n").isNotNull().alias("is_near_dup"),
        )
    )


def _cosine_pairs(e: DataFrame, threshold: float) -> DataFrame:
    """(id_a < id_b) vector pairs with rounded dot > threshold —
    GEMM-pruned then exactly re-checked (ops/cosine_blas.py)."""
    from sim_spark.ops.cosine_blas import exact_cosine_pairs

    return exact_cosine_pairs(e, threshold)


def _cc_min_label_cte(rounds: int = 16) -> str:
    """Chained min-label-propagation CTEs computing per-node component
    min-ids over the ``edges`` CTE — the DuckDB twin of the Spark
    fixpoint loop. Each round takes min(own label, neighbors' labels,
    label-of-label) — the third leg is pointer jumping, so label depth
    HALVES per round and 16 rounds converge for any component diameter
    up to 2^16. Replaces the old all-pairs ``reach`` reachability
    closure, whose row count is Σ|component|² — the r10 sf1 drive found
    the 0.4-cosine graph merges into ONE 7,991-node component there
    (64M reach rows × degree-41 joins, an hour-scale oracle; this form
    is 17 joins over ≤|V|+|E| rows, seconds)."""
    # AS MATERIALIZED is load-bearing: every round references the
    # previous one THREE times (self + edge join + pointer jump), so an
    # inlining planner would expand lp16 into 3^16 copies of the scan —
    # materialization makes it 16 cheap hash joins.
    parts = [
        "lp0 AS MATERIALIZED (SELECT vec_id AS node, vec_id AS lbl FROM embeddings)"
    ]
    for k in range(1, rounds + 1):
        p = f"lp{k - 1}"
        parts.append(
            f"lp{k} AS MATERIALIZED (SELECT node, MIN(lbl) AS lbl FROM ("
            f"SELECT node, lbl FROM {p}"
            f" UNION ALL SELECT e.d AS node, l.lbl FROM {p} l"
            f" JOIN edges e ON l.node = e.s"
            f" UNION ALL SELECT a.node, b.lbl FROM {p} a"
            f" JOIN {p} b ON a.lbl = b.node"
            f") __u{k} GROUP BY node)"
        )
    return ",\n".join(parts)


_CC_ROUNDS = 16


@query(
    "dedup_connected_components",
    oracle=f"""
WITH pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  -- list_inner_product over DOUBLE[]-cast lists: identical rounded
  -- scores to the unnest-SUM formulation (verified pairwise at sf0.1),
  -- without the 64x unnest blowup that spilled ~38 GB at sf10
  WHERE ROUND(list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])), 6) > 0.4
),
edges AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
{_cc_min_label_cte(_CC_ROUNDS)},
comp AS (SELECT node AS doc_id, lbl AS component_id FROM lp{_CC_ROUNDS})
SELECT doc_id, component_id,
       COUNT(*) OVER (PARTITION BY component_id) > 1 AS in_dup_group
FROM comp
""",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup grouping: connected components of the
    >0.4-cosine graph (A~B, B~C ⇒ one group even when A,C aren't
    directly similar — the one-hop ``dedup_embedding_cosine`` under-
    merges exactly those chains). Iterative min-label propagation over
    the cached edge list; the oracle recomputes the same fixpoint as a
    DuckDB recursive reachability CTE."""
    from pyspark.sql.window import Window

    from sim_spark.ops.connected_components import connected_components

    e = table(spark, sf_dir, "embeddings")
    pairs = _cosine_pairs(e, 0.4)
    cc = connected_components(
        e.select("vec_id"), pairs, node_col="vec_id", src="id_a", dst="id_b"
    )
    return cc.select(
        F.col("vec_id").alias("doc_id"),
        F.col("component").alias("component_id"),
        (F.count(F.lit(1)).over(Window.partitionBy("component")) > 1).alias(
            "in_dup_group"
        ),
    )


@query(
    "join_partition_pruned_fact",
    oracle=f"""
WITH y AS (SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS ship_year
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
SELECT l.ship_year, COUNT(*) AS n_lines, {sql_dsum('l.l_extendedprice')} AS sum_price
FROM (SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year, l_extendedprice
      FROM lineitem) l
JOIN y ON l.ship_year = y.ship_year
GROUP BY l.ship_year ORDER BY l.ship_year
""",
)
def join_partition_pruned_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out
    `partitionBy(ship_year)`; joining it to a filtered dimension makes
    Spark compute the dim's year set at runtime and skip entire fact
    partitions (`dynamicpruningexpression` in PartitionFilters —
    asserted in tests/test_scale_ops.py). At 100 TB this is the
    difference between scanning one year's directories and the whole
    lake when the pruning values are only known at run time."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    sf_tag = scratch_sf_tag(sf_dir)
    lake = scratch_dir(f"dpp_fact_{sf_tag}")
    (
        li.select(
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
            "l_extendedprice",
        )
        .write.mode("overwrite")
        .partitionBy("ship_year")
        .parquet(lake)
    )
    fact = spark.read.parquet(lake)
    dim = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(F.year("o_orderdate").cast("bigint").alias("ship_year"))
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), "ship_year")
        .groupBy("ship_year")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("ship_year")
    )


@query("sketch_hll_mergeable")  # rows-only: sketch estimates aren't SQL-derivable
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, built into Spark
    3.5+): one sketch per source partition-group, merged with
    hll_union_agg into the global estimate — the 100 TB rollup pattern
    (daily sketches union into monthly/united estimates WITHOUT
    re-scanning raw data; plain approx_count_distinct can't re-merge).
    Invariants (tests/test_scale_ops.py): merged estimate == direct
    global sketch estimate, and relative error vs exact < 5%."""
    e = table(spark, sf_dir, "events")
    per_group = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate")
    )
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_estimate"),
        F.count_distinct("user_id").alias("exact_global"),
    )
    return merged.crossJoin(direct)


@query(
    "sink_dynamic_partition_overwrite",
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n,
       {sql_dsum('l_quantity')} AS sum_qty
FROM (SELECT l_returnflag,
             CASE WHEN l_returnflag = 'R' THEN l_quantity * 2 ELSE l_quantity END AS l_quantity
      FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level upsert on a plain parquet lake:
    ``partitionOverwriteMode=dynamic`` rewrites ONLY the partitions
    present in the incoming batch (here: the 'R' slice with doubled
    quantities) and leaves sibling partitions untouched — the daily
    reprocess/backfill primitive at 100 TB, where STATIC overwrite mode
    would silently delete every other partition. Read-back proves 'A'/'N'
    survived and 'R' was replaced."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_returnflag"
    )
    sf_tag = scratch_sf_tag(sf_dir)
    lake = scratch_dir(f"dpo_lake_{sf_tag}")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        li.write.mode("overwrite").partitionBy("l_returnflag").parquet(lake)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        reprocessed = li.filter(F.col("l_returnflag") == "R").withColumn(
            "l_quantity", F.col("l_quantity") * 2
        )
        reprocessed.write.mode("overwrite").partitionBy("l_returnflag").parquet(lake)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (
        spark.read.parquet(lake)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "join_skew_salted",
    oracle="""
WITH dim AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN e.ts = d.first_ts THEN 1 ELSE 0 END) AS BIGINT)
         AS n_first_events
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY e.event_type ORDER BY e.event_type
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-scattered fact⋈dim join (ops/salting.py): events joined to a
    per-user dimension on the hot ``user_id`` key with an 8-way salt —
    left rows scatter by hash(event_id), the dim side replicates to all
    salts, and the shuffle key becomes (user_id, __salt), so one hot
    user's rows land on 8 reducers instead of one. Row-identical to the
    plain join (the oracle IS the plain join); the salt's presence in
    the exchange keys is plan-asserted in tests/test_plans.py. This is
    the manual fallback for skew past what AQE's skew-join splitting
    handles (AQE only splits sort-merge partitions, not hash-aggregated
    broadcast cases, and never helps a skewed *aggregation* upstream)."""
    from sim_spark.ops.salting import salted_join

    e = table(spark, sf_dir, "events")
    dim = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    j = salted_join(e, dim, "user_id", n_salts=8, left_unique="event_id")
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.sum(
                F.when(F.col("ts") == F.col("first_ts"), 1).otherwise(0)
            ).cast("bigint").alias("n_first_events"),
        )
        .orderBy("event_type")
    )


@query(
    "join_prefilter_bucketset",
    oracle=f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       {sql_dsum('l.l_extendedprice')} AS sum_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
""",
)
def join_prefilter_bucketset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse semi-join reduction — the manual form of the runtime bloom
    filter Spark injects into shuffle joins (separately plan-tested in
    tests/test_scale_ops.py; the `bloom_filter_agg` expression itself is
    optimizer-internal, not SQL-callable): hash the selective dim side's
    keys into a small bucket set (a 1-hash bloom), broadcast it, and
    semi-join the fact scan on the bucket BEFORE the real join — at
    100 TB this drops most fact rows at the scan instead of carrying
    them through the shuffle. Bucket collisions (false positives) are
    removed by the exact join that follows, so the result is
    bit-identical to the plain join (the oracle)."""
    n_buckets = 8192
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    buckets = o.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(n_buckets)).alias("kb")
    ).distinct()
    pruned = (
        li.withColumn("kb", F.pmod(F.xxhash64("l_orderkey"), F.lit(n_buckets)))
        .join(F.broadcast(buckets), "kb", "semi")
        .drop("kb")
    )
    return (
        pruned.join(o, pruned.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "scan_schema_evolution",
    oracle="""
SELECT CASE WHEN doc_id % 2 = 1 THEN lang END AS lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1 ORDER BY lang NULLS FIRST
""",
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a plain parquet lake: an early batch written
    WITHOUT the ``lang`` column, a later batch WITH it, read back as one
    table via ``mergeSchema`` — old rows surface NULL for the added
    column (the additive-evolution contract every long-lived lake
    needs). The oracle reconstructs the same NULL pattern from the
    source table. mergeSchema reconciles footers at planning time; at
    100 TB pin the merged schema in a catalog instead of re-deriving it
    per query — the read semantics are identical."""
    d = table(spark, sf_dir, "documents")
    sf_tag = scratch_sf_tag(sf_dir)
    lake = scratch_dir(f"schema_evo_{sf_tag}")
    (
        d.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "n_chars")
        .write.mode("overwrite")
        .parquet(lake)
    )
    (
        d.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "n_chars", "lang")
        .write.mode("append")
        .parquet(lake)
    )
    merged = spark.read.option("mergeSchema", "true").parquet(lake)
    return (
        merged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy(F.asc_nulls_first("lang"))
    )


@query(
    "sink_compacted_files",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
FROM lineitem GROUP BY l_returnflag
""",
)
def sink_compacted_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every 100 TB
    lake schedules. Stage 1 simulates the problem: lineitem scattered
    across 64 tiny files. Stage 2 is the fix: re-write through a single
    round-robin repartition whose final partition count AQE coalesces to
    the advisory size from OBSERVED bytes — no driver row count, no
    hand-tuned file number, the same rewrite works at any scale.
    Returned frame aggregates the compacted copy, so the oracle proves
    the rewrite lost and duplicated nothing; the file-count drop itself
    is pinned in tests/test_scale_ops.py."""
    sf_tag = scratch_sf_tag(sf_dir)
    scattered = scratch_dir(f"compact_in_{sf_tag}")
    compacted = scratch_dir(f"compact_out_{sf_tag}")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    li.repartition(64).write.mode("overwrite").parquet(scattered)
    small = spark.read.parquet(scattered)
    # REBALANCE = round-robin exchange whose post-shuffle (=file) count
    # AQE sets from advisoryPartitionSizeInBytes — file sizing from
    # observed bytes, usable at any scale.
    small.hint("rebalance").write.mode("overwrite").parquet(compacted)
    return (
        spark.read.parquet(compacted)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "sketch_bitmap_distinct",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY 1
UNION ALL
SELECT '__all__' AS event_type, COUNT(DISTINCT user_id) AS n_users FROM events
""",
)
def sketch_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via Spark's bitmap aggregates:
    user ids hash into (bucket, bit) positions, one 4 KB bitmap per
    (event_type, bucket) built with bitmap_construct_agg, counts are
    sums of bitmap_count per bucket, and the GLOBAL distinct comes from
    bitmap_or_agg over the per-type bitmaps — merge without re-scan,
    like the HLL key but exact (bitmap size scales with the id domain,
    HLL with the error budget: that is the 100 TB trade). The oracle is
    plain COUNT(DISTINCT) per type plus the global roll-up."""
    e = table(spark, sf_dir, "events")
    e.createOrReplaceTempView("ev_bitmap_src")
    return spark.sql(
        """
        WITH buckets AS (
          SELECT event_type,
                 bitmap_bucket_number(user_id) AS bucket,
                 bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          FROM ev_bitmap_src GROUP BY 1, 2
        ),
        per_type AS (
          SELECT event_type, SUM(bitmap_count(bm)) AS n_users FROM buckets GROUP BY 1
        ),
        merged AS (
          SELECT bucket, bitmap_or_agg(bm) AS bm FROM buckets GROUP BY bucket
        ),
        global_row AS (
          SELECT '__all__' AS event_type, SUM(bitmap_count(bm)) AS n_users FROM merged
        )
        SELECT event_type, CAST(n_users AS BIGINT) AS n_users FROM per_type
        UNION ALL
        SELECT event_type, CAST(n_users AS BIGINT) AS n_users FROM global_row
        """
    )


def _morton_sql(xcol: str, ycol: str, bits: int = 8) -> str:
    """DuckDB-dialect bit-interleave expression (x -> even bits, y -> odd)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _morton_col(x, y, bits: int = 8):
    """Spark twin of :func:`_morton_sql` — same interleave, same bits."""
    code = F.lit(0)
    for i in range(bits):
        code = code + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        code = code + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return code


@query(
    "sort_zorder_morton",
    oracle=f"""
WITH coded AS (
  SELECT p_partkey,
         p_size & 255 AS x,
         CAST(floor(p_retailprice) AS INTEGER) & 255 AS y
  FROM part
)
SELECT p_partkey, x, y, {_morton_sql('x', 'y')} AS morton
FROM coded ORDER BY morton, p_partkey LIMIT 200
""",
)
def sort_zorder_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two dimensions (p_size x
    price bucket) — the multi-dimensional data-skipping layout: sorting
    a table by the interleaved code before writing parquet gives every
    file a tight min/max envelope on BOTH columns, so scans filtered on
    either dimension prune files (one-dimensional sort only prunes its
    own column). The code is pure integer bit arithmetic inside codegen;
    at 100 TB this is `repartitionByRange(morton).sortWithinPartitions`
    ahead of the sink — one range shuffle, the same price as any sorted
    write. Output is the coded top-200 by (morton, key): a total order,
    so the LIMIT is deterministic."""
    p = table(spark, sf_dir, "part")
    coded = p.select(
        "p_partkey",
        F.col("p_size").bitwiseAND(F.lit(255)).alias("x"),
        F.floor("p_retailprice").cast("int").bitwiseAND(F.lit(255)).alias("y"),
    )
    return (
        coded.select(
            "p_partkey", "x", "y", _morton_col(F.col("x"), F.col("y")).alias("morton")
        )
        .orderBy("morton", "p_partkey")
        .limit(200)
    )


@query(
    "dedup_cluster_canonical",
    oracle=f"""
WITH pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  -- list_inner_product over DOUBLE[]-cast lists: identical rounded
  -- scores to the unnest-SUM formulation (verified pairwise at sf0.1),
  -- without the 64x unnest blowup that spilled ~38 GB at sf10
  WHERE ROUND(list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])), 6) > 0.4
),
edges AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
{_cc_min_label_cte(_CC_ROUNDS)},
comp AS (SELECT node AS doc_id, lbl AS component_id FROM lp{_CC_ROUNDS}),
ranked AS (
  SELECT c.component_id, c.doc_id, e.label,
         row_number() OVER (PARTITION BY c.component_id
                            ORDER BY e.label DESC, c.doc_id) AS rn
  FROM comp c JOIN embeddings e ON e.vec_id = c.doc_id
)
SELECT component_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS survivor_id,
       CAST(max(CASE WHEN rn = 1 THEN label END) AS BIGINT) AS survivor_label,
       CAST(count(*) - 1 AS BIGINT) AS n_dropped
FROM ranked GROUP BY component_id ORDER BY component_id
""",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's LAST step, usually left implicit: after
    transitive grouping (``dedup_connected_components``), each near-dup
    cluster keeps exactly one survivor under an explicit quality policy
    (highest label, doc-id tie-break) and drops the rest. One window
    rank inside the component partition + one aggregate — at 100 TB the
    survivor choice shuffles on component_id, whose cardinality is the
    number of CLUSTERS, and the heaviest cluster costs its own size,
    not the corpus."""
    from pyspark.sql.window import Window

    from sim_spark.ops.connected_components import connected_components

    e = table(spark, sf_dir, "embeddings")
    pairs = _cosine_pairs(e, 0.4)
    cc = connected_components(
        e.select("vec_id"), pairs, node_col="vec_id", src="id_a", dst="id_b"
    )
    ranked = (
        cc.join(e.select("vec_id", "label"), "vec_id")
        .select(
            F.col("component").alias("component_id"),
            F.col("vec_id").alias("doc_id"),
            "label",
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("component_id").orderBy(
                    F.desc("label"), F.asc("doc_id")
                )
            ),
        )
    )
    return (
        ranked.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
            .cast("long")
            .alias("survivor_id"),
            F.max(F.when(F.col("rn") == 1, F.col("label")))
            .cast("long")
            .alias("survivor_label"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("component_id")
    )


@query(
    "join_cbo_reordered_star",
    oracle="""
SELECT r.r_name AS region_name,
       n.n_name AS nation_name,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(30,6)) * 1000000
                     AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY r.r_name, n.n_name
ORDER BY region_name, nation_name
""",
)
def join_cbo_reordered_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based join reordering over ANALYZEd catalog tables (SURVEY
    §4.2's deferred action): the five-way chain is written fact-first
    with the selective region filter last; ops/cbo.py registers the
    fixtures as external tables, runs ANALYZE … FOR ALL COLUMNS once per
    session, and enables spark.sql.cbo.{enabled,joinReorder.enabled} so
    CostBasedJoinReorder re-sequences the join by cost (row counts +
    NDVs), not by syntax. At 100 TB the ANALYZE is a scan-once ingest
    step; without it a bad literal order ships the fact table through
    every intermediate join."""
    from sim_spark.ops.cbo import cbo_star_join

    return cbo_star_join(spark, sf_dir)
