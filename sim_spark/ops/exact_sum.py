"""Exact order-independent decimal sums with a long-speed inner loop.

``exprs.dsum`` (sum of ``cast(expr AS DECIMAL(30,6))``) is the canonical
order-independent sum, but Spark's decimal aggregation buffer is
BigDecimal-backed above 18 digits of precision — measured ~0.45 s of the
flagship Q1's 1.4 s at sf0.1/local[32], ~3x the cost of the long-typed
sums the JVM can keep in registers.

:func:`grouped_exact_sums` computes the SAME exact result two-stage:

1. Per (group key, ``spark_partition_id()``): each measure is cast to
   DECIMAL(30,6) per row (identical rounding to the oracle's CAST),
   unscaled to µ-units (* 1e6 — exact in decimal), carried as LONG, and
   summed map-side. The long partial never overflows because it only
   accumulates ONE scan partition: at the default 128 MB
   ``maxPartitionBytes`` a partition holds ~1e6 rows, so even 1e12-µunit
   rows stay 6 orders of magnitude under 2^63. The shuffle carries one
   row per (group, partition) — same volume as a plain partial agg.
2. Per group: the handful of long partials are summed as DECIMAL(38,0)
   (exact, trivially few rows); the OUTPUT double is then
   CAST(µ-int total AS DOUBLE) / 1e6 — cast FIRST, divide in double
   (r10): an integer-valued decimal casts correctly-rounded in both
   engines and /1e6 is one more correctly-rounded IEEE op, whereas a
   decimal-divide-then-cast diverged one ulp from DuckDB once the
   unscaled total passed 2^53 (the sf1 drive's finding).

One rounding happens per row (the decimal cast) and one at the end
(decimal -> double) — exactly the roundings ``dsum`` performs, so results
are bit-identical (asserted against the dsum formulation in
tests/test_ops_properties.py). A single-stage ``sum(long)`` would be
faster still but its FINAL merge accumulates the grand total in a long:
fine at test SF, an ANSI overflow abort at 100 TB. The decimal merge
stage is the scale-safety premium (~0.25 s at sf0.1).

Per-row magnitude ceiling: the µ-unit long conversion
``(m.cast(decimal(30,6)) * 1e6).cast('long')`` aborts (loudly, under
ANSI) for any SINGLE value with ``|v| > ~9.2e12`` (2^63 / 1e6) — a case
plain ``dsum`` handles fine, since its decimal buffer has 30 digits of
headroom per row. Callers whose measures can exceed ~9.2e12 per row
must use ``dsum``; this helper trades that per-row ceiling for the
long-speed inner loop.

Use this for hot wide-aggregate queries; ``dsum`` remains the right
one-liner where the sum is not the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,6)"
_SCALE = 1_000_000


def grouped_exact_sums(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, Column],
    count_alias: str = "__n",
) -> DataFrame:
    """Group ``df`` by ``keys``; for each ``alias -> expr`` in ``measures``
    produce an exact order-independent DOUBLE sum named ``alias`` and its
    NON-NULL evaluation count named ``n_{alias}`` (the COUNT(expr) an
    average denominator needs — COUNT(*) would diverge from SUM/COUNT
    semantics the moment a measure is NULL on some row), plus a row
    count named ``count_alias``. Output: keys + sums + per-measure
    counts + row count.

    Per-row limit: any single measure value with ``|v| > ~9.2e12``
    overflows the µ-unit long conversion — a loud ANSI abort, not a
    wrong answer; fall back to ``exprs.dsum`` for such magnitudes (see
    module docstring)."""
    out_names = (
        list(keys)
        + list(measures)
        + [f"n_{a}" for a in measures]
        + [count_alias]
    )
    if len(set(out_names)) != len(out_names):
        raise ValueError(
            f"grouped_exact_sums output name collision: {sorted(out_names)} "
            "(keys, measure aliases, their n_ counts, and count_alias must "
            "all be distinct)"
        )
    pid = F.spark_partition_id().alias("__pid")
    stage1 = df.groupBy(*keys, pid).agg(
        *[
            F.sum((m.cast(_DEC) * _SCALE).cast("long")).alias(f"__u_{a}")
            for a, m in measures.items()
        ],
        *[F.count(m).alias(f"__c_{a}") for a, m in measures.items()],
        F.count(F.lit(1)).alias("__pn"),
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[
            F.sum(F.col(f"__u_{a}").cast("decimal(38,0)")).alias(f"__t_{a}")
            for a in measures
        ],
        *[F.sum(f"__c_{a}").alias(f"n_{a}") for a in measures],
        F.sum("__pn").alias(count_alias),
    )
    # Output double = CAST(µ-int total AS DOUBLE) / 1e6 — NOT a
    # decimal-divide-then-cast: integer-valued decimals cast to double
    # correctly rounded in BOTH engines, while DuckDB's fractional
    # decimal→double (double(unscaled)/10^scale) drifts one ulp from
    # Spark's BigDecimal.doubleValue once the unscaled total passes 2^53
    # (r10 sf1 drive). Identical sequence in exprs.dsum / sql_dsum keeps
    # this helper bit-identical to the dsum formulation.
    return stage2.select(
        *keys,
        *[
            (F.col(f"__t_{a}").cast("double") / F.lit(float(_SCALE))).alias(a)
            for a in measures
        ],
        *[F.col(f"n_{a}") for a in measures],
        count_alias,
    )
