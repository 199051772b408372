"""Distributed order statistics without single-partition windows.

The naive Spark idiom for a global rank / cumulative count —
``F.row_number().over(Window.orderBy(k))`` with an empty partition
spec — moves the ENTIRE frame into one task (WindowExec logs "No
Partition Defined ... Moving all data to a single partition").  Fine
for a 10-row report, fatal for a corpus-scale frame at 100 TB: one
straggler task sorts everything and OOMs.

This module provides the scalable replacement, the classic
quantize-group-cumulate decomposition (SURVEY.md §4; the same shape
every MPP engine uses for percentiles/NTILE):

1. reduce the frame to ONE ROW PER DISTINCT ORDER KEY with an additive
   weight (count, sum, ...) — an ordinary shuffle-parallel ``groupBy``;
2. assign each distinct key an order-preserving coarse bucket (equal
   width over the observed [min, max], ``n_buckets`` of them);
3. per-bucket subtotals (≤ ``n_buckets`` rows) → exclusive bucket
   offsets via a prefix sum over that BOUNDED frame;
4. broadcast the offsets back and finish with a window PARTITIONED BY
   BUCKET — parallel across buckets, each task holds one bucket's
   distinct keys only.

The exclusive prefix sum ``cum_below`` then answers every order
statistic by pure filtering: the value at global rank ``r`` is the
unique distinct key with ``cum_below < r <= cum_below + weight`` —
no per-row rank is ever materialized.

Bucket-offset frame and the ``_bounded_window`` contract
--------------------------------------------------------
Step 3 still needs one tiny global prefix sum — over at most
``n_buckets`` rows (bounded BY CONSTRUCTION: it is the output of a
groupBy on the bucket id).  We run it through a window partitioned by
the non-foldable constant ``__cumbkt % 1``: physically a single
partition of ≤ ``n_buckets`` rows, but with a non-empty partition spec
so WindowExec's "No Partition Defined" warning stays a TRUE alarm for
corpus-scale frames elsewhere.  ``bounded_seq_window`` exposes the same
contract for other frames that are provably small (a 10-row decile
report, a 24-row calendar).  Never use it on a frame whose row count
grows with the data.

Determinism: bucket assignment is monotone in the key (floor of a
nondecreasing affine map), so WHICH bucket a key lands in never affects
``cum_below`` — only the partition layout.  The [min, max] bounds are
computed in-plan (1-row aggregate, keyless broadcast attach — the
accepted model-scalar shape), so the whole thing is one lazy plan and
Catalyst reuses the distinct-frame exchange across the two branches.

Skew: equal-width buckets degrade when the key range is dominated by
outliers (most mass in few buckets).  Each bucket is still only the
DISTINCT keys it covers, the weights having been pre-aggregated, and a
production deployment would swap step 2 for sampled-quantile bounds;
the interface isolates that choice here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = [
    "cum_below",
    "ntile_bounds",
    "ntile_col",
    "ntile_by",
    "cum_max_below",
    "bounded_seq_window",
    "bounded_total_window",
    "global_row_number",
    "ntile_from_rank",
    "at_rank",
]

_KMIN = "__dr_kmin"
_KMAX = "__dr_kmax"
_BKT = "__cumbkt"
_BOFF = "__dr_boff"
_BW = "__dr_bw"


def _const_key(const_col: str) -> Column:
    """``const_col % 1`` — zero on every row, but NOT foldable by
    Catalyst (it references a column), so the window keeps a non-empty
    partition spec and WindowExec's "No Partition Defined" warning
    stays a true alarm for corpus-scale frames elsewhere.
    ``const_col`` MUST be a non-null INTEGRAL column: a double's
    ``x % 1`` is its fractional part (not constant) and a NULL lands
    in a second partition."""
    return F.col(const_col) % F.lit(1)


def bounded_seq_window(const_col: str, *order_cols):
    """A total-order window over a frame that is BOUNDED BY CONSTRUCTION
    (≤ tens of thousands of rows regardless of data volume: decile
    reports, bucket subtotals, calendar spines).  ``const_col`` names
    any non-null integral column of the frame (see ``_const_key``);
    ``order_cols`` are the ordering (str or Column, asc/desc).  Callers
    are classified in PLANS.md §bounded-windows; never use on a frame
    whose row count grows with the data."""
    return W.partitionBy(_const_key(const_col)).orderBy(*order_cols)


def bounded_total_window(const_col: str):
    """Whole-frame (no order) aggregate window under the same
    bounded-by-construction contract as :func:`bounded_seq_window` —
    for normalizing a ≤few-thousand-row report by its own total."""
    return W.partitionBy(_const_key(const_col))


def cum_below(
    dist: DataFrame,
    key: str,
    weight: str,
    *,
    descending: bool = False,
    n_buckets: int = 4096,
    out: str = "cum_below",
) -> DataFrame:
    """Add an exclusive prefix sum of ``weight`` in ``key`` order.

    ``dist`` must hold ONE ROW PER DISTINCT ``key`` (the caller's
    groupBy guarantees it); all other columns pass through.  Returns
    ``dist`` plus ``out`` = Σ weight over strictly-preceding keys
    (0 for the first).  With ``descending=True`` "preceding" means
    larger keys.  No single-partition window over an unbounded frame
    appears anywhere in the plan.
    """
    kd = F.col(key).cast("double")
    if descending:
        kd = -kd

    bounds = dist.agg(F.min(kd).alias(_KMIN), F.max(kd).alias(_KMAX))
    span = F.col(_KMAX) - F.col(_KMIN)
    # Monotone bucket id in [0, n_buckets): floor((k-min)/width), width>0;
    # degenerate single-value frames collapse to bucket 0.
    bkt = (
        F.when(span <= 0.0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((kd - F.col(_KMIN)) / (span / n_buckets)),
            )
        )
        .cast("long")
    )
    b = dist.crossJoin(F.broadcast(bounds)).withColumn(_BKT, bkt).drop(_KMIN, _KMAX)

    btot = b.groupBy(_BKT).agg(F.sum(weight).alias(_BW))
    woff = bounded_seq_window(_BKT, _BKT).rowsBetween(W.unboundedPreceding, -1)
    boff = btot.select(
        _BKT, F.coalesce(F.sum(_BW).over(woff), F.lit(0)).alias(_BOFF)
    )

    order = F.col(key).desc() if descending else F.col(key).asc()
    win = (
        W.partitionBy(_BKT)
        .orderBy(order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(boff), _BKT)
        .withColumn(
            out, F.col(_BOFF) + F.coalesce(F.sum(weight).over(win), F.lit(0))
        )
        .drop(_BKT, _BOFF)
    )


def cum_max_below(
    df: DataFrame,
    key: str,
    val: str,
    *,
    n_buckets: int = 4096,
    out: str = "max_below",
) -> DataFrame:
    """Per-row EXCLUSIVE running max of ``val`` in ``key`` order (NULL
    for the first row) — the watermark / high-water-mark shape — with
    the same bucket decomposition as :func:`cum_below`: per-bucket
    maxes, an exclusive prefix-max over the ≤``n_buckets`` bucket frame,
    and a bucket-PARTITIONED exclusive prefix-max inside each bucket.
    ``key`` must be unique per row (the caller's injective ordering
    key); max is tie-sensitive otherwise."""
    kd = F.col(key).cast("double")
    bounds = df.agg(F.min(kd).alias(_KMIN), F.max(kd).alias(_KMAX))
    span = F.col(_KMAX) - F.col(_KMIN)
    bkt = (
        F.when(span <= 0.0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((kd - F.col(_KMIN)) / (span / n_buckets)),
            )
        )
        .cast("long")
    )
    b = df.crossJoin(F.broadcast(bounds)).withColumn(_BKT, bkt).drop(_KMIN, _KMAX)

    btot = b.groupBy(_BKT).agg(F.max(val).alias(_BW))
    woff = bounded_seq_window(_BKT, _BKT).rowsBetween(W.unboundedPreceding, -1)
    boff = btot.select(_BKT, F.max(_BW).over(woff).alias(_BOFF))

    win = (
        W.partitionBy(_BKT)
        .orderBy(F.col(key).asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(boff), _BKT)
        .withColumn(out, F.greatest(F.col(_BOFF), F.max(val).over(win)))
        .drop(_BKT, _BOFF)
    )


def global_row_number(
    df: DataFrame,
    key: str,
    tiebreak,
    *,
    descending: bool = False,
    n_buckets: int = 4096,
    out: str = "rn",
) -> DataFrame:
    """Per-row global ROW_NUMBER() by (``key`` asc/desc, ``tiebreak``
    asc) without a single-partition window: exclusive prefix counts
    over the DISTINCT-key frame (:func:`cum_below`), joined back on the
    key, plus a key-PARTITIONED row_number over the tiebreak columns.
    Window parallelism = distinct-key cardinality; a frame whose key
    takes few heavily-tied values keeps large per-value partitions (the
    tiebreak sort), which is intrinsic to demanding a total order."""
    tiebreak = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak)
    dist = cum_below(
        df.groupBy(key).agg(F.count(F.lit(1)).alias("__gr_cnt")),
        key,
        "__gr_cnt",
        descending=descending,
        n_buckets=n_buckets,
        out="__gr_cb",
    ).select(key, "__gr_cb")
    intra = F.row_number().over(W.partitionBy(key).orderBy(*tiebreak))
    return (
        df.join(dist, key)
        .withColumn(out, F.col("__gr_cb") + intra)
        .drop("__gr_cb")
    )


def ntile_bounds(
    df: DataFrame,
    key: str,
    tiebreak: str,
    k: int,
    *,
    descending: bool = False,
    n_buckets: int = 4096,
    out: str = "__nt_bnds",
) -> DataFrame:
    """The k-1 NTILE boundary (v, u) pairs of (``key`` asc/desc,
    ``tiebreak`` asc) as ONE ROW holding an array — ready to broadcast.

    Targeted-bucket shape (cheaper than a full cum_below): distinct-key
    counts → per-bucket subtotals (≤``n_buckets`` rows) → the k-1
    boundary RANKS are located in bucket space on that bounded frame →
    only the ≤k-1 buckets containing a boundary are examined at
    distinct-key grain → only those ≤k-1 tie GROUPS are examined at row
    grain for the tiebreak value.  The carrying frame is read twice
    (distinct counts; boundary tie groups) and never shuffled by the
    caller.  Multi-dimension callers (RFM) derive each dimension's
    bounds INDEPENDENTLY from the base frame and apply them in one
    final projection — chaining full ntile_by calls would nest the
    lineage exponentially."""
    kd = F.col(key).cast("double")
    if descending:
        kd = -kd
    bounds = df.agg(F.min(kd).alias(_KMIN), F.max(kd).alias(_KMAX))
    span = F.col(_KMAX) - F.col(_KMIN)
    bkt = (
        F.when(span <= 0.0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((kd - F.col(_KMIN)) / (span / n_buckets)),
            )
        )
        .cast("long")
    )
    d2 = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__nt_cnt"))
        .crossJoin(F.broadcast(bounds))
        .withColumn(_BKT, bkt)
        .drop(_KMIN, _KMAX)
    )
    btot = d2.groupBy(_BKT).agg(F.sum("__nt_cnt").alias("__nt_bw"))
    woff = bounded_seq_window(_BKT, _BKT).rowsBetween(W.unboundedPreceding, -1)
    boff = btot.select(
        _BKT,
        "__nt_bw",
        F.coalesce(F.sum("__nt_bw").over(woff), F.lit(0)).alias("__nt_boff"),
        F.sum("__nt_bw").over(bounded_total_window(_BKT)).alias("__nt_n"),
    )
    # boundary rank of tile t: t*(n div k) + min(t, n mod k)
    b_rank = F.expr(f"t * (__nt_n div {k}) + least(t, __nt_n % {k})")
    tgt = (
        boff.select(
            _BKT,
            "__nt_bw",
            "__nt_boff",
            "__nt_n",
            F.explode(F.sequence(F.lit(1), F.lit(k - 1))).alias("t"),
        )
        .filter(
            (F.col("__nt_boff") < b_rank)
            & (b_rank <= F.col("__nt_boff") + F.col("__nt_bw"))
        )
        .select(_BKT, "t", (b_rank - F.col("__nt_boff")).alias("__nt_obkt"))
    )
    # exact covering distinct key inside the ≤k-1 boundary buckets
    order = F.col(key).desc() if descending else F.col(key).asc()
    wv = (
        W.partitionBy(_BKT, "t").orderBy(order).rowsBetween(W.unboundedPreceding, -1)
    )
    dk = (
        d2.join(F.broadcast(tgt), _BKT)
        .withColumn(
            "__nt_cum", F.coalesce(F.sum("__nt_cnt").over(wv), F.lit(0))
        )
        .filter(
            (F.col("__nt_cum") < F.col("__nt_obkt"))
            & (F.col("__nt_obkt") <= F.col("__nt_cum") + F.col("__nt_cnt"))
        )
        .select(key, "t", (F.col("__nt_obkt") - F.col("__nt_cum")).alias("__nt_off"))
    )
    # tiebreak value at the in-group offset, inside the ≤k-1 tie groups
    cand = df.select(key, tiebreak).join(F.broadcast(dk), key)
    intra = F.row_number().over(W.partitionBy("t").orderBy(tiebreak))
    return (
        cand.withColumn("__nt_rn", intra)
        .filter(F.col("__nt_rn") == F.col("__nt_off"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(key).alias("v"), F.col(tiebreak).alias("u"))
                )
            ).alias(out)
        )
    )


def ntile_col(
    key: str, tiebreak: str, *, descending: bool = False, bnds: str = "__nt_bnds"
) -> Column:
    """Tile assignment from a broadcast ``ntile_bounds`` array column:
    1 + the number of boundaries lexicographically below this row — a
    pure projection, no shuffle of the carrying frame."""
    if descending:
        below = lambda b: (F.col(key) < b["v"]) | (  # noqa: E731
            (F.col(key) == b["v"]) & (F.col(tiebreak) > b["u"])
        )
    else:
        below = lambda b: (F.col(key) > b["v"]) | (  # noqa: E731
            (F.col(key) == b["v"]) & (F.col(tiebreak) > b["u"])
        )
    return (F.lit(1) + F.size(F.filter(F.col(bnds), below))).cast("long")


def ntile_by(
    df: DataFrame,
    key: str,
    tiebreak: str,
    k: int,
    *,
    descending: bool = False,
    n_buckets: int = 4096,
    out: str = "tile",
) -> DataFrame:
    """NTILE(k) over (``key`` asc/desc, ``tiebreak`` asc) WITHOUT
    shuffling ``df`` at all: the k-1 tile-boundary rows are located on
    the DISTINCT-key frame (:func:`ntile_bounds`), broadcast as one
    array row, and each row's tile is 1 + the number of boundaries
    lexicographically below it (:func:`ntile_col`) — a pure projection
    over the corpus.

    Standard NTILE semantics (first ``n mod k`` tiles one row fatter),
    so oracles keep their window formulation.  The only ordered work
    runs over distinct keys and the ≤k-1 boundary tie groups; a
    boundary group the size of the corpus (all rows one key value) is
    the intrinsic worst case of demanding a total order and would need
    the tiebreak distributed the same way.  For SEVERAL ntiles over one
    frame, call :func:`ntile_bounds` per dimension and apply the
    :func:`ntile_col` projections together — chaining this wrapper
    nests the lineage exponentially."""
    pairs = ntile_bounds(
        df, key, tiebreak, k, descending=descending, n_buckets=n_buckets
    )
    return (
        df.crossJoin(F.broadcast(pairs))
        .withColumn(out, ntile_col(key, tiebreak, descending=descending))
        .drop("__nt_bnds")
    )


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """Standard SQL NTILE(k) recovered from a 1-based global rank and
    the frame count: the first ``n mod k`` tiles hold ``n div k + 1``
    rows, the rest ``n div k`` — the exact semantics of Spark's and
    DuckDB's NTILE, so oracles can keep their window formulation.
    Guarded so the q=0 (n < k) branch never divides by zero.  All
    magnitudes stay far below 2^53, so the double divisions inside
    ceil are exact-enough (error << the 1/q gap to the next integer)."""
    qd = ((n - (n % F.lit(k))) / F.lit(k)).cast("long")  # n div k
    r = (n % F.lit(k)).cast("long")
    boundary = (qd + 1) * r  # ranks in the first r (fat) tiles
    return (
        F.when(rn <= boundary, F.ceil(rn / (qd + 1)))
        .otherwise(r + F.ceil((rn - boundary) / qd))
        .cast("long")
    )


def at_rank(rank_expr: Column, weight: str = "cnt", cum: str = "cum_below") -> Column:
    """Boolean: this distinct-key row covers global rank ``rank_expr``
    (1-based), i.e. ``cum_below < r <= cum_below + weight``.  Summing
    ``key * at_rank(r).cast int`` selects the order statistic without
    materializing per-row ranks; a row covering several requested ranks
    counts once per rank, which is exactly the tie semantics of
    row_number-based selection on the raw frame."""
    return (F.col(cum) < rank_expr) & (rank_expr <= F.col(cum) + F.col(weight))
