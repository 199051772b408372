"""Fully-oracled distinct-count sketches and a Bloom-prefilter join.

The built-in DataSketches key (`sketch_hll_mergeable`, scale_ops.py)
stays rows-only because its hash family is implementation-private. The
keys here re-derive the same sketch mathematics from an md5-based 48-bit
hash BOTH engines compute bit-identically (the `dedup_minhash_exactperm`
idiom), so every register / minimum / bit position — and therefore the
estimate itself — is hash-oracle-checkable:

- `sketch_kmv_distinct` — K-minimum-values estimator: keep the k
  smallest distinct hash values per group; the k-th one's position in
  [0, 2^48) estimates cardinality as (k-1)·2^48/h_k. Build is a
  partial+final MIN-k (here: distinct + window row_number on a short
  group key) — one shuffle on (group, hash), mergeable across shards.
- `sketch_hll_exactreg` — HyperLogLog with m=64 explicit registers:
  register = h mod 64, rho = leading-zero rank of the remaining 42
  bits. The power sum Σ 2^-rho is a sum of exact powers of two, all
  multiples of 2^-43 bounded by 64, so it is EXACTLY representable in a
  double and immune to reduction order — the one float reduction in the
  plan is provably deterministic at any cluster size. Linear-counting
  small-range correction included (both engines evaluate the identical
  ln(m/V) expression).
- `join_bloom_prefilter` — the 100 TB scan-reduction pattern: build a
  256-bit Bloom filter (3 md5-salted probes) from a filtered dim-side
  key set, prefilter the fact side's distinct keys through it with an
  equi-join on bit position (group-count == 3 ⇔ all probes present:
  no bitmap datatype needed, so the same plan runs anywhere), then
  verify against the exact semi-join and report the false-positive
  count. All-integer output — nothing to round.

At production scale the KMV/HLL aggregates run as one combine-enabled
shuffle of bounded width (k or m rows per group, independent of input
size), and the Bloom bit set (≤ 256 rows) broadcasts to the fact scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sim_spark.io import table
from sim_spark.registry import query

_H48 = 281474976710656  # 2^48: hash domain size


from sim_spark.exprs import h48 as _h48_spark, sql_h48 as _h48_sql  # shared


# --------------------------------------------------------------------------
# KMV
# --------------------------------------------------------------------------
_KMV_K = 8

_KMV_ORACLE = f"""
WITH hv AS (
  SELECT DISTINCT event_type, {_h48_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM hv
)
SELECT event_type,
       CAST(max(nd) AS BIGINT) AS exact_distinct,
       CAST(CASE WHEN max(nd) < {_KMV_K} THEN max(nd)
                 ELSE CAST(floor({_KMV_K - 1} * {float(_H48)}
                                 / max(CASE WHEN rn = {_KMV_K} THEN h END)
                                 + 0.5) AS BIGINT)
            END AS BIGINT) AS kmv_estimate,
       CAST(sum(CASE WHEN rn <= {_KMV_K} THEN h ELSE 0 END) AS BIGINT) AS sketch_checksum
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


@query("sketch_kmv_distinct", oracle=_KMV_ORACLE)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch per event_type (module docstring).

    The estimate (k-1)·2^48/h_k and the k-minimum multiset itself (as a
    checksum) are both emitted, so the oracle pins the sketch CONTENT,
    not just the headline number. Degenerate groups (fewer than k
    distinct keys) fall back to the exact count, as a mergeable KMV
    union would."""
    e = table(spark, sf_dir, "events")
    hv = e.select(
        "event_type", _h48_spark(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    w = W.partitionBy("event_type")
    ranked = hv.select(
        "event_type",
        "h",
        F.row_number().over(w.orderBy("h")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("nd"),
    )
    kth = F.max(F.when(F.col("rn") == _KMV_K, F.col("h")))
    est = (
        F.when(F.max("nd") < _KMV_K, F.max("nd"))
        .otherwise(
            F.floor(F.lit(float(_KMV_K - 1)) * F.lit(float(_H48)) / kth + 0.5)
        )
        .cast("long")
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("nd").cast("long").alias("exact_distinct"),
            est.alias("kmv_estimate"),
            F.sum(F.when(F.col("rn") <= _KMV_K, F.col("h")).otherwise(0))
            .cast("long")
            .alias("sketch_checksum"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# HLL with explicit registers
# --------------------------------------------------------------------------
_HLL_M = 64  # 2^6 registers
_HLL_ALPHA = 0.709  # canonical alpha for m = 64
_HLL_WBITS = 42  # remaining bits after the 6-bit register index


def _hll_oracle() -> str:
    return f"""
WITH hv AS (
  SELECT DISTINCT event_type, {_h48_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
cells AS (
  SELECT event_type, h % {_HLL_M} AS reg, h // {_HLL_M} AS w FROM hv
),
rho AS (
  SELECT event_type, reg,
         max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                  ELSE {_HLL_WBITS + 1} - length(bin(w)) END) AS rho
  FROM cells GROUP BY event_type, reg
),
spine AS (
  SELECT t.event_type, r.reg
  FROM (SELECT DISTINCT event_type FROM hv) t
  CROSS JOIN (SELECT CAST(x AS BIGINT) AS reg FROM range({_HLL_M}) s(x)) r
),
regs AS (
  SELECT s.event_type, s.reg, COALESCE(rho.rho, 0) AS rho
  FROM spine s LEFT JOIN rho ON s.event_type = rho.event_type AND s.reg = rho.reg
),
est AS (
  SELECT event_type,
         {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / sum(power(2.0, -rho)) AS raw,
         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros,
         CAST(sum(rho) AS BIGINT) AS register_checksum
  FROM regs GROUP BY event_type
)
SELECT e.event_type,
       CAST(d.nd AS BIGINT) AS exact_distinct,
       round(CASE WHEN e.raw <= 2.5 * {_HLL_M} AND e.zeros > 0
                  THEN {_HLL_M} * ln({_HLL_M} * 1.0 / e.zeros)
                  ELSE e.raw END, 6) AS hll_estimate,
       e.register_checksum
FROM est e
JOIN (SELECT event_type, count(*) AS nd FROM hv GROUP BY event_type) d
  ON e.event_type = d.event_type
ORDER BY e.event_type
"""


@query("sketch_hll_exactreg", oracle=_hll_oracle())
def sketch_hll_exactreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog(m=64) with oracle-pinned registers (module docstring).

    rho is derived from length(bin(w)) — an exact integer in both
    engines — and the register power sum is exactly representable, so
    the float estimate is reproducible to the last bit; round(…, 6)
    only absorbs ln() libm tails in the linear-counting branch."""
    e = table(spark, sf_dir, "events")
    hv = e.select(
        "event_type", _h48_spark(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    cells = hv.select(
        "event_type",
        (F.col("h") % _HLL_M).alias("reg"),
        F.expr(f"h div {_HLL_M}").alias("w"),
    )
    rho = cells.groupBy("event_type", "reg").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
                F.lit(_HLL_WBITS + 1) - F.length(F.bin("w"))
            )
        ).alias("rho")
    )
    spine = (
        hv.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(_HLL_M).select(F.col("id").alias("reg"))
        )
    )
    regs = spine.join(rho, ["event_type", "reg"], "left").select(
        "event_type", "reg", F.coalesce("rho", F.lit(0)).alias("rho")
    )
    est = regs.groupBy("event_type").agg(
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / F.sum(F.pow(F.lit(2.0), -F.col("rho")))
        ).alias("raw"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("zeros"),
        F.sum("rho").cast("long").alias("register_checksum"),
    )
    nd = hv.groupBy("event_type").agg(F.count(F.lit(1)).alias("nd"))
    lin = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("zeros"))
    return (
        est.join(nd, "event_type")
        .select(
            "event_type",
            F.col("nd").cast("long").alias("exact_distinct"),
            F.round(
                F.when(
                    (F.col("raw") <= 2.5 * _HLL_M) & (F.col("zeros") > 0), lin
                ).otherwise(F.col("raw")),
                6,
            ).alias("hll_estimate"),
            "register_checksum",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Bloom-prefilter join
# --------------------------------------------------------------------------
_BLOOM_M = 256
_BLOOM_K = 3


def _bloom_pos_sql(expr: str, j: int) -> str:
    salted = expr + " || '#" + str(j) + "'"
    return f"({_h48_sql(salted)} % {_BLOOM_M})"


_BLOOM_ORACLE = f"""
WITH members AS (
  SELECT CAST(s_suppkey AS VARCHAR) AS key FROM supplier WHERE s_suppkey % 2 = 0
),
bits AS (
  SELECT DISTINCT pos FROM (
    {" UNION ALL ".join(f"SELECT {_bloom_pos_sql('key', j)} AS pos FROM members" for j in range(_BLOOM_K))}
  )
),
fact_keys AS (
  SELECT DISTINCT CAST(l_suppkey AS VARCHAR) AS key FROM lineitem
),
probes AS (
  {" UNION ALL ".join(f"SELECT key, {_bloom_pos_sql('key', j)} AS pos FROM fact_keys" for j in range(_BLOOM_K))}
),
cand AS (
  SELECT p.key FROM probes p JOIN bits b ON p.pos = b.pos
  GROUP BY p.key HAVING count(*) = {_BLOOM_K}
)
SELECT CAST((SELECT count(*) FROM fact_keys) AS BIGINT) AS n_fact_keys,
       CAST((SELECT count(*) FROM members) AS BIGINT) AS n_members,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM cand c
             WHERE NOT EXISTS (SELECT 1 FROM members m WHERE m.key = c.key))
            AS BIGINT) AS n_false_pos
"""


@query("join_bloom_prefilter", oracle=_BLOOM_ORACLE)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join prefilter (module docstring): dim keys set
    3 of 256 bit positions; a fact key survives iff all 3 of its
    positions are set (equi-join on position + HAVING count = k). The
    bit set is ≤ 256 rows regardless of dim size — broadcast side — and
    the exact verify is a plain semi/anti join on the (much smaller)
    candidate set, which is exactly how a Bloom-pushdown cuts a 100 TB
    fact scan before the real join."""
    sup = table(spark, sf_dir, "supplier")
    members = sup.filter(F.col("s_suppkey") % 2 == 0).select(
        F.col("s_suppkey").cast("string").alias("key")
    )

    def positions(df: DataFrame) -> DataFrame:
        pos_arr = F.array(
            *[
                (_h48_spark(F.concat(F.col("key"), F.lit(f"#{j}"))) % _BLOOM_M).alias(
                    f"p{j}"
                )
                for j in range(_BLOOM_K)
            ]
        )
        return df.select("key", F.explode(pos_arr).alias("pos"))

    bits = positions(members).select("pos").distinct()
    fact_keys = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").cast("string").alias("key"))
        .distinct()
    )
    cand = (
        positions(fact_keys)
        .join(F.broadcast(bits), "pos")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == _BLOOM_K)
        .select("key")
    )
    fp = cand.join(members, "key", "left_anti")
    return (
        fact_keys.agg(F.count(F.lit(1)).cast("long").alias("n_fact_keys"))
        .crossJoin(members.agg(F.count(F.lit(1)).cast("long").alias("n_members")))
        .crossJoin(cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates")))
        .crossJoin(fp.agg(F.count(F.lit(1)).cast("long").alias("n_false_pos")))
    )


# --------------------------------------------------------------------------
# KMV set operations (simplified theta-sketch union/intersection)
# --------------------------------------------------------------------------
#
# Two predicate-defined user sets are sketched independently (k smallest
# hashes each); θ = min of the two k-th minimums (2^48 when a sketch is
# exact), and estimates follow the theta-sketch rule: |X| ≈ |{h∈K_X : h<θ}|
# · 2^48/θ. Everything — retained hashes, θ, the counts — is integer
# arithmetic on the shared md5 hash, so the ESTIMATORS themselves are
# hash-oracled, not just sanity-checked. At scale each sketch is one
# partial+final min-k aggregate (k rows out per shard), and set ops on
# sketches never touch the raw data again — the point of theta sketches.

_KMV_SET_K = 8

_KMV_SETOPS_ORACLE = f"""
WITH a_keys AS (
  SELECT DISTINCT {_h48_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type = 'view' AND value > 30
),
b_keys AS (
  SELECT DISTINCT {_h48_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type = 'purchase' AND value > 70
),
ka AS (SELECT h FROM a_keys ORDER BY h LIMIT {_KMV_SET_K}),
kb AS (SELECT h FROM b_keys ORDER BY h LIMIT {_KMV_SET_K}),
theta AS (
  SELECT least(
    CASE WHEN (SELECT count(*) FROM ka) < {_KMV_SET_K} THEN {_H48}
         ELSE (SELECT max(h) FROM ka) END,
    CASE WHEN (SELECT count(*) FROM kb) < {_KMV_SET_K} THEN {_H48}
         ELSE (SELECT max(h) FROM kb) END) AS th
),
u AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)),
est AS (
  SELECT t.th,
         (SELECT count(*) FROM u WHERE h < t.th) AS cu,
         (SELECT count(*) FROM ka JOIN kb USING (h) WHERE h < t.th) AS ci
  FROM theta t
)
SELECT CAST((SELECT count(*) FROM a_keys) AS BIGINT) AS n_a_exact,
       CAST((SELECT count(*) FROM b_keys) AS BIGINT) AS n_b_exact,
       CAST((SELECT count(*) FROM (SELECT h FROM a_keys UNION SELECT h FROM b_keys)) AS BIGINT) AS n_union_exact,
       CAST((SELECT count(*) FROM a_keys JOIN b_keys USING (h)) AS BIGINT) AS n_inter_exact,
       CAST(floor(cu * {float(_H48)} / th + 0.5) AS BIGINT) AS union_est,
       CAST(floor(ci * {float(_H48)} / th + 0.5) AS BIGINT) AS inter_est,
       CAST(th AS BIGINT) AS theta
FROM est
"""


@query("sketch_kmv_setops", oracle=_KMV_SETOPS_ORACLE)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-style union/intersection estimates from two KMV sketches
    (header comment), with the exact counts alongside."""
    e = table(spark, sf_dir, "events")
    h = _h48_spark(F.col("user_id").cast("string")).alias("h")
    a_keys = (
        e.filter((F.col("event_type") == "view") & (F.col("value") > 30))
        .select(h)
        .distinct()
    )
    b_keys = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 70))
        .select(h)
        .distinct()
    )
    ka = a_keys.orderBy("h").limit(_KMV_SET_K)
    kb = b_keys.orderBy("h").limit(_KMV_SET_K)

    def theta_leg(sk: DataFrame):
        return sk.agg(
            F.when(F.count(F.lit(1)) < _KMV_SET_K, F.lit(_H48))
            .otherwise(F.max("h"))
            .alias("th")
        )

    theta = (
        theta_leg(ka)
        .crossJoin(theta_leg(kb).withColumnRenamed("th", "th_b"))
        .select(F.least("th", "th_b").alias("th"))
    )
    u = ka.unionAll(kb).distinct()
    cu = (
        u.crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("th"))
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    ci = (
        ka.join(kb, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("th"))
        .agg(F.count(F.lit(1)).alias("ci"))
    )
    exacts = (
        a_keys.agg(F.count(F.lit(1)).cast("long").alias("n_a_exact"))
        .crossJoin(b_keys.agg(F.count(F.lit(1)).cast("long").alias("n_b_exact")))
        .crossJoin(
            a_keys.unionAll(b_keys)
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("n_union_exact"))
        )
        .crossJoin(
            a_keys.join(b_keys, "h").agg(
                F.count(F.lit(1)).cast("long").alias("n_inter_exact")
            )
        )
    )
    scale = F.lit(float(_H48))
    return (
        exacts.crossJoin(cu)
        .crossJoin(ci)
        .crossJoin(theta)
        .select(
            "n_a_exact",
            "n_b_exact",
            "n_union_exact",
            "n_inter_exact",
            F.floor(F.col("cu") * scale / F.col("th") + 0.5)
            .cast("long")
            .alias("union_est"),
            F.floor(F.col("ci") * scale / F.col("th") + 0.5)
            .cast("long")
            .alias("inter_est"),
            F.col("th").cast("long").alias("theta"),
        )
    )


# --------------------------------------------------------------------------
# HLL register-level union: the mergeability proof, oracled
# --------------------------------------------------------------------------



def _hll_rho() -> "F.Column":
    """rho (leading-zero rank) of the shared-hash column h — the single
    Spark definition of the register update, shared by every
    explicit-register HLL key."""
    return F.when(F.expr(f"h div {_HLL_M}") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(F.expr(f"h div {_HLL_M}")))
    )


def _hll_fill(spark: SparkSession, regs: DataFrame) -> DataFrame:
    """Dense m-register view (missing registers = 0)."""
    spine = spark.range(_HLL_M).select(F.col("id").alias("reg"))
    return spine.join(regs, "reg", "left").select(
        "reg", F.coalesce("rho", F.lit(0)).alias("rho")
    )


def _hll_estimate(regs: DataFrame, out: str) -> DataFrame:
    """The canonical small-range-corrected HLL estimate — one shared
    formula so no key can fork alpha or the linear-counting cutoff."""
    est = regs.agg(
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / F.sum(F.pow(F.lit(2.0), -F.col("rho")))
        ).alias("raw"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("zeros"),
    )
    lin = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("zeros"))
    return est.select(
        F.round(
            F.when(
                (F.col("raw") <= 2.5 * _HLL_M) & (F.col("zeros") > 0), lin
            ).otherwise(F.col("raw")),
            6,
        ).alias(out)
    )


_HLL_UNION_ORACLE = f"""
WITH hv AS (
  SELECT DISTINCT event_type, {_h48_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
cells AS (
  SELECT event_type, h % {_HLL_M} AS reg,
         CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_WBITS + 1}
              ELSE {_HLL_WBITS + 1} - length(bin(h // {_HLL_M})) END AS rho
  FROM hv
),
per_type AS (SELECT event_type, reg, max(rho) AS rho FROM cells GROUP BY 1, 2),
merged AS (SELECT reg, max(rho) AS rho FROM per_type GROUP BY reg),
direct AS (SELECT reg, max(rho) AS rho FROM cells GROUP BY reg),
spine AS (SELECT CAST(x AS BIGINT) AS reg FROM range({_HLL_M}) s(x)),
m_full AS (SELECT s.reg, COALESCE(m.rho, 0) AS rho FROM spine s LEFT JOIN merged m USING (reg)),
d_full AS (SELECT s.reg, COALESCE(d.rho, 0) AS rho FROM spine s LEFT JOIN direct d USING (reg)),
m_est AS (
  SELECT {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / sum(power(2.0, -rho)) AS raw,
         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros FROM m_full
),
d_est AS (
  SELECT {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / sum(power(2.0, -rho)) AS raw,
         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros FROM d_full
),
mism AS (
  SELECT count(*) AS n FROM m_full m JOIN d_full d USING (reg) WHERE m.rho <> d.rho
)
SELECT round(CASE WHEN m.raw <= 2.5 * {_HLL_M} AND m.zeros > 0
                  THEN {_HLL_M} * ln({_HLL_M} * 1.0 / m.zeros) ELSE m.raw END, 6)
         AS merged_estimate,
       round(CASE WHEN d.raw <= 2.5 * {_HLL_M} AND d.zeros > 0
                  THEN {_HLL_M} * ln({_HLL_M} * 1.0 / d.zeros) ELSE d.raw END, 6)
         AS direct_estimate,
       CAST(mism.n AS BIGINT) AS n_register_mismatch,
       CAST((SELECT count(DISTINCT h) FROM hv) AS BIGINT) AS exact_global
FROM m_est m, d_est d, mism
"""


@query("sketch_hll_union", oracle=_HLL_UNION_ORACLE)
def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register-level HLL union: per-group sketches max-merge into the
    global sketch and the oracle pins that merged registers EQUAL the
    direct global registers (n_register_mismatch = 0) — the mergeability
    property that lets daily 100 TB sketches roll up without rescans,
    proven on the explicit-register HLL rather than asserted."""
    e = table(spark, sf_dir, "events")
    hv = e.select(
        "event_type", _h48_spark(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    cells = hv.select(
        "event_type", (F.col("h") % _HLL_M).alias("reg"), _hll_rho().alias("rho")
    )
    per_type = cells.groupBy("event_type", "reg").agg(F.max("rho").alias("rho"))
    merged = per_type.groupBy("reg").agg(F.max("rho").alias("rho"))
    direct = cells.groupBy("reg").agg(F.max("rho").alias("rho"))
    m_full, d_full = _hll_fill(spark, merged), _hll_fill(spark, direct)
    estimate = _hll_estimate

    mism = (
        m_full.withColumnRenamed("rho", "rho_m")
        .join(d_full.withColumnRenamed("rho", "rho_d"), "reg")
        .filter(F.col("rho_m") != F.col("rho_d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_register_mismatch"))
    )
    exact = hv.select("h").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("exact_global")
    )
    return (
        estimate(m_full, "merged_estimate")
        .crossJoin(estimate(d_full, "direct_estimate"))
        .crossJoin(mism)
        .crossJoin(exact)
    )


_HLL_INTER_ORACLE = f"""
WITH pu AS (
  SELECT DISTINCT {_h48_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type = 'purchase'
),
vu AS (
  SELECT DISTINCT {_h48_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type = 'view'
),
spine AS (SELECT CAST(x AS BIGINT) AS reg FROM range({_HLL_M}) s(x)),
ra AS (
  SELECT s.reg, COALESCE(r.rho, 0) AS rho FROM spine s LEFT JOIN (
    SELECT h % {_HLL_M} AS reg,
           max(CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_WBITS + 1}
                    ELSE {_HLL_WBITS + 1} - length(bin(h // {_HLL_M})) END) AS rho
    FROM pu GROUP BY 1) r ON s.reg = r.reg
),
rb AS (
  SELECT s.reg, COALESCE(r.rho, 0) AS rho FROM spine s LEFT JOIN (
    SELECT h % {_HLL_M} AS reg,
           max(CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_WBITS + 1}
                    ELSE {_HLL_WBITS + 1} - length(bin(h // {_HLL_M})) END) AS rho
    FROM vu GROUP BY 1) r ON s.reg = r.reg
),
ru AS (
  SELECT a.reg, GREATEST(a.rho, b.rho) AS rho FROM ra a JOIN rb b ON a.reg = b.reg
),
est AS (
  SELECT
    (SELECT round(CASE WHEN raw <= 2.5 * {_HLL_M} AND zeros > 0
                       THEN {_HLL_M} * ln({_HLL_M} * 1.0 / zeros) ELSE raw END, 6)
     FROM (SELECT {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / sum(power(2.0, -rho)) AS raw,
                  sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros FROM ra)) AS est_a,
    (SELECT round(CASE WHEN raw <= 2.5 * {_HLL_M} AND zeros > 0
                       THEN {_HLL_M} * ln({_HLL_M} * 1.0 / zeros) ELSE raw END, 6)
     FROM (SELECT {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / sum(power(2.0, -rho)) AS raw,
                  sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros FROM rb)) AS est_b,
    (SELECT round(CASE WHEN raw <= 2.5 * {_HLL_M} AND zeros > 0
                       THEN {_HLL_M} * ln({_HLL_M} * 1.0 / zeros) ELSE raw END, 6)
     FROM (SELECT {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / sum(power(2.0, -rho)) AS raw,
                  sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros FROM ru)) AS est_union
)
SELECT e.est_a, e.est_b, e.est_union,
       ROUND(e.est_a + e.est_b - e.est_union, 6) AS est_intersection,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM pu JOIN vu ON pu.h = vu.h) AS exact_intersection
FROM est e
"""


@query("sketch_hll_intersection", oracle=_HLL_INTER_ORACLE)
def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-intersection estimate by inclusion-exclusion over explicit-
    register HLL sketches (purchase users ∩ view users): |A∩B| ≈
    est(A) + est(B) − est(max-merge(A,B)) — the only intersection a
    mergeable-sketch store can serve without rescanning, reported next
    to the exact join count so the estimator's error is measurable in
    the result itself. Registers, max-merges, and zero counts are exact
    integers; the estimates reuse the sketch_hll_exactreg formula."""
    from sim_spark.scratch import track_cache

    e = table(spark, sf_dir, "events")

    def hashes(etype: str) -> DataFrame:
        # Cached: each set's distinct-hash frame feeds its register
        # build AND the exact-intersection join (r7e review: uncached,
        # the events corpus was scanned ~6 times).
        return track_cache(
            e.filter(F.col("event_type") == etype)
            .select(_h48_spark(F.col("user_id").cast("string")).alias("h"))
            .distinct()
        )

    pu, vu = hashes("purchase"), hashes("view")

    def regs(hv: DataFrame) -> DataFrame:
        r = (
            hv.select((F.col("h") % _HLL_M).alias("reg"), _hll_rho().alias("rho"))
            .groupBy("reg")
            .agg(F.max("rho").alias("rho"))
        )
        return _hll_fill(spark, r)

    ra, rb = regs(pu), regs(vu)
    ru = (
        ra.withColumnRenamed("rho", "rho_a")
        .join(rb.withColumnRenamed("rho", "rho_b"), "reg")
        .select("reg", F.greatest("rho_a", "rho_b").alias("rho"))
    )

    est = _hll_estimate
    vua = vu.withColumnRenamed("h", "ha")
    exact = pu.join(vua, pu.h == vua.ha).agg(
        F.count(F.lit(1)).cast("long").alias("exact_intersection")
    )
    return (
        est(ra, "est_a")
        .crossJoin(est(rb, "est_b"))
        .crossJoin(est(ru, "est_union"))
        .crossJoin(F.broadcast(exact))
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 6
            ).alias("est_intersection"),
            "exact_intersection",
        )
    )
