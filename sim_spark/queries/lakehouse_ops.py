"""Lakehouse table-maintenance operators (SURVEY.md §2.1/§2.13
extension): the MERGE / slowly-changing-dimension surface every
warehouse feeding a training pipeline runs nightly.

Scale designs:
- merge_upsert_scd1: MERGE INTO semantics (update matched, insert
  unmatched) as ONE full-outer join on the key + coalesce per column —
  the shuffle is key-partitioned on both sides, so the plan is the
  minimum possible data movement for a keyed merge at any scale; AQE
  broadcasts the delta side when it is small (the common CDC case).
  No row ever reaches the driver.
- scd2_validity_ranges: type-2 history build — each change event
  becomes a version row with [valid_from, valid_to) derived from
  `lead()` over the per-key change stream. One window shuffle on the
  business key; at 100 TB the key cardinality (customers) dwarfs the
  executor count, so partitions stay balanced without salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query


@query(
    "merge_upsert_scd1",
    oracle="""
WITH delta AS (
  SELECT c_custkey AS k,
         CAST(c_acctbal AS DECIMAL(15,2)) + 100 AS new_bal
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000 AS k, CAST(0.00 AS DECIMAL(15,2)) AS new_bal
  FROM customer WHERE c_custkey % 13 = 0
)
SELECT COALESCE(t.c_custkey, d.k) AS c_custkey,
       CAST(COALESCE(d.new_bal, t.c_acctbal) AS DOUBLE) AS acctbal,
       CASE WHEN t.c_custkey IS NULL THEN 'insert'
            WHEN d.k IS NULL THEN 'keep'
            ELSE 'update' END AS action
FROM (SELECT c_custkey, CAST(c_acctbal AS DECIMAL(15,2)) AS c_acctbal
      FROM customer) t
FULL OUTER JOIN delta d ON t.c_custkey = d.k
""",
)
def merge_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (SCD type 1) over the customer dimension: a CDC delta
    (updated balances for custkey % 7, brand-new keys for custkey % 13
    shifted by 1e6) upserts into the target in one full-outer join —
    matched rows take the delta's value, unmatched target rows pass
    through, unmatched delta rows insert. Per-row `action` makes the
    merge decision itself oracle-checkable, not just the end state.

    Both sides canonicalize the TARGET balance through DECIMAL(15,2)
    before the merge (r12): the sf10 sweep surfaced a customer whose
    raw double balance is -0.0 — the decimal round-trip drops the sign
    on the Spark side, so an oracle keep-path reading the raw double
    disagreed on negative zero. Note the fixture's +1e6 insert keys
    COLLIDE with real custkeys at sf10 (1.5M customers) and become
    updates — semantics both engines apply identically."""
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(15,2)")
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("k"), (bal + 100).alias("new_bal")
    )
    inserts = c.filter(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1000000).alias("k"),
        F.lit("0.00").cast("decimal(15,2)").alias("new_bal"),
    )
    delta = updates.unionAll(inserts)
    t = c.select("c_custkey", bal.alias("c_acctbal"))
    action = (
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("k").isNull(), "keep")
        .otherwise("update")
    )
    return t.join(delta, t.c_custkey == delta.k, "full_outer").select(
        F.coalesce("c_custkey", "k").alias("c_custkey"),
        F.coalesce("new_bal", "c_acctbal").cast("double").alias("acctbal"),
        action.alias("action"),
    )


@query(
    "scd2_validity_ranges",
    oracle="""
WITH v AS (
  SELECT o_custkey, o_orderdate AS valid_from,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS valid_to,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS version,
         CAST(o_totalprice AS DOUBLE) AS attr
  FROM orders
)
SELECT o_custkey AS custkey, version, valid_from, valid_to,
       CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current, attr
FROM v WHERE o_custkey % 50 = 0
""",
)
def scd2_validity_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension build: each order is a change event for its
    customer; versions get [valid_from, valid_to) ranges via `lead()`
    over the per-key change stream and the open-ended latest row is
    flagged current. The %50 key filter keeps the oracle frame small
    while the window plan is identical for the full key space."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # Filter BEFORE the window: the predicate is on the partition key, so
    # this is semantics-preserving and keeps the window shuffle 1/50th
    # the size (Catalyst 4.1 does not push a modulo predicate through a
    # Window on its own — verified in tests/test_plans.py).
    v = o.filter(F.col("o_custkey") % 50 == 0).select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.col("o_totalprice").cast("double").alias("attr"),
    )
    return v.select(
        "custkey",
        "version",
        "valid_from",
        "valid_to",
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).alias("is_current"),
        "attr",
    )


@query(
    "lakehouse_time_travel",
    oracle="""
WITH log AS (
  SELECT 1 AS version, 'insert' AS op, c_custkey AS k,
         CAST(c_acctbal AS DECIMAL(15,2)) AS bal
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT 2, 'update', c_custkey,
         CAST(c_acctbal AS DECIMAL(15,2)) + 50
  FROM customer WHERE c_custkey % 6 = 0
  UNION ALL
  SELECT 2, 'insert', c_custkey + 2000000,
         CAST(c_acctbal AS DECIMAL(15,2))
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT 3, 'delete', c_custkey, NULL
  FROM customer WHERE c_custkey % 9 = 0
),
snap AS (
  SELECT version, op, k, bal,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY version DESC) AS rn
  FROM log WHERE version <= 2
)
SELECT k AS c_custkey, CAST(bal AS DOUBLE) AS acctbal,
       CAST(version AS BIGINT) AS from_version
FROM snap WHERE rn = 1 AND op <> 'delete'
""",
)
def lakehouse_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel (SELECT ... AS OF version 2) over an append-only
    commit log — the Delta/Iceberg read path expressed relationally:
    filter the log to versions ≤ the requested snapshot, keep each key's
    LATEST entry (one window over the business key), and drop keys whose
    latest entry is a delete. The v3 delete batch exists precisely so
    the snapshot read must prove it ignores later versions.

    Scale: the log is partitioned by key for the window (one shuffle);
    a real table-format reader prunes files by version manifest first,
    which this plan mirrors by filtering version BEFORE the shuffle —
    the filter sits under the exchange (same discipline as the SCD2
    plan audit)."""
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(15,2)")
    log = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select(
            F.lit(1).alias("version"),
            F.lit("insert").alias("op"),
            F.col("c_custkey").alias("k"),
            bal.alias("bal"),
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 6 == 0).select(
                F.lit(2), F.lit("update"), F.col("c_custkey"), bal + 50
            )
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 5 == 0).select(
                F.lit(2),
                F.lit("insert"),
                F.col("c_custkey") + 2000000,
                bal,
            )
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 9 == 0).select(
                F.lit(3),
                F.lit("delete"),
                F.col("c_custkey"),
                F.lit(None).cast("decimal(15,2)"),
            )
        )
    )
    w = W.partitionBy("k").orderBy(F.desc("version"))
    return (
        log.filter(F.col("version") <= 2)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "delete"))
        .select(
            F.col("k").alias("c_custkey"),
            F.col("bal").cast("double").alias("acctbal"),
            F.col("version").cast("long").alias("from_version"),
        )
    )


@query(
    "lakehouse_vacuum_stats",
    oracle="""
WITH log AS (
  SELECT 1 AS version, 'insert' AS op, c_custkey AS k
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT 2, 'update', c_custkey FROM customer WHERE c_custkey % 6 = 0
  UNION ALL
  SELECT 2, 'insert', c_custkey + 2000000 FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT 3, 'delete', c_custkey FROM customer WHERE c_custkey % 9 = 0
),
live AS (
  SELECT DISTINCT k, version FROM (
    SELECT k, version,
           row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
    FROM log WHERE version <= 2
  ) WHERE rn = 1
  UNION
  SELECT DISTINCT k, version FROM (
    SELECT k, version,
           row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
    FROM log WHERE version <= 3
  ) WHERE rn = 1
)
SELECT CAST((SELECT count(*) FROM log) AS BIGINT) AS n_log_entries,
       CAST((SELECT count(*) FROM log l JOIN live v
             ON l.k = v.k AND l.version = v.version) AS BIGINT) AS n_retained,
       CAST((SELECT count(*) FROM log l
             WHERE NOT EXISTS (SELECT 1 FROM live v
                               WHERE v.k = l.k AND v.version = l.version))
            AS BIGINT) AS n_vacuumed,
       CAST((SELECT COALESCE(sum(l.k), 0) FROM log l
             WHERE NOT EXISTS (SELECT 1 FROM live v
                               WHERE v.k = l.k AND v.version = l.version))
            AS BIGINT) AS vacuumed_checksum
""",
)
def lakehouse_vacuum_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM planning over the same commit log `lakehouse_time_travel`
    reads: with snapshots {v2, v3} retained, a log entry survives iff it
    is some key's LATEST entry at one of the retained versions;
    everything else (v1 rows superseded in v2, for example) is
    reclaimable. Two snapshot-resolution windows + an anti-join — the
    reachability computation a table-format VACUUM runs over its
    manifest, with the reclaimed-key checksum pinning the exact set.
    At 100 TB this is manifest-sized work, never a data-file scan."""
    from pyspark.sql.window import Window as W

    c = table(spark, sf_dir, "customer")
    log = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select(
            F.lit(1).alias("version"),
            F.lit("insert").alias("op"),
            F.col("c_custkey").alias("k"),
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 6 == 0).select(
                F.lit(2), F.lit("update"), F.col("c_custkey")
            )
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 5 == 0).select(
                F.lit(2), F.lit("insert"), F.col("c_custkey") + 2000000
            )
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 9 == 0).select(
                F.lit(3), F.lit("delete"), F.col("c_custkey")
            )
        )
    )

    def snapshot_live(v: int) -> DataFrame:
        w = W.partitionBy("k").orderBy(F.desc("version"))
        return (
            log.filter(F.col("version") <= v)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("k", "version")
        )

    live = snapshot_live(2).unionAll(snapshot_live(3)).distinct()
    entries = log.select("k", "version")
    retained = entries.join(live, ["k", "version"], "left_semi")
    vacuumed = entries.join(live, ["k", "version"], "left_anti")
    return (
        entries.agg(F.count(F.lit(1)).cast("long").alias("n_log_entries"))
        .crossJoin(retained.agg(F.count(F.lit(1)).cast("long").alias("n_retained")))
        .crossJoin(vacuumed.agg(F.count(F.lit(1)).cast("long").alias("n_vacuumed")))
        .crossJoin(
            vacuumed.agg(
                F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias(
                    "vacuumed_checksum"
                )
            )
        )
    )


@query(
    "lakehouse_cdc_apply",
    oracle="""
WITH feed AS (
  SELECT o_custkey AS k, o_orderkey AS seq,
         CASE WHEN o_orderkey % 10 = 0 THEN 'delete' ELSE 'update' END AS op,
         CAST(o_totalprice AS DECIMAL(15,2)) AS new_bal
  FROM orders
), latest AS (
  SELECT k, op, new_bal
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        FROM feed)
  WHERE rn = 1
)
SELECT t.c_custkey,
       CAST(CASE WHEN l.op = 'update' THEN l.new_bal
                 ELSE CAST(t.c_acctbal AS DECIMAL(15,2)) END AS DOUBLE) AS acctbal,
       COALESCE(l.op, 'keep') AS action
FROM customer t LEFT JOIN latest l ON t.c_custkey = l.k
WHERE l.op IS NULL OR l.op <> 'delete'
""",
)
def lakehouse_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered change-feed apply (Debezium/Delta-CDF shape): orders is
    read as a CDC log over the customer dimension — key = o_custkey,
    monotone sequence = o_orderkey, op = delete for every 10th order,
    else update-balance-to-o_totalprice. Apply = compact the feed to its
    per-key LATEST change (one row_number window on the key — the
    standard log-compaction step, NOT a full fold, so cost scales with
    the feed), then one left join against the target: update rewrites
    the balance, delete drops the row, untouched keys pass through as
    'keep'. Unlike merge_upsert_scd1 (single-batch upsert), this is the
    multi-change-per-key, delete-bearing path; both shuffles are keyed
    on the business key, the minimum movement for a keyed apply at
    100 TB.
    """
    feed = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("new_bal"),
    )
    latest = (
        feed.withColumn(
            "rn", F.row_number().over(W.partitionBy("k").orderBy(F.col("seq").desc()))
        )
        .filter(F.col("rn") == 1)
        .select("k", "op", "new_bal")
    )
    t = table(spark, sf_dir, "customer")
    return (
        t.join(latest, t.c_custkey == latest.k, "left")
        .filter(F.col("op").isNull() | (F.col("op") != "delete"))
        .select(
            "c_custkey",
            F.when(F.col("op") == "update", F.col("new_bal"))
            .otherwise(F.col("c_acctbal").cast("decimal(15,2)"))
            .cast("double")
            .alias("acctbal"),
            F.coalesce(F.col("op"), F.lit("keep")).alias("action"),
        )
    )
