"""Interval (range) join without an equi key (SURVEY.md §4.3).

A pure range predicate plans as BroadcastNestedLoop/CartesianProduct in
OSS Spark — O(n·m). The classic fix is bucket-and-refine: quantize both
time axes into buckets as wide as the search window, explode the left
side to the (at most two) buckets its window overlaps, equi-join on the
bucket id, then refine with the exact range predicate. The join becomes
a hash/sort-merge join on an integer key; the blowup factor is bounded
by ceil(window/width)+1 = 2. At 100 TB the bucket key also gives AQE a
skew-split handle that a nested loop never exposes.

Caveat ts dtypes: the op casts both ts columns to TIMESTAMP — pass real
timestamps. An integer epoch-MICROSECOND column would be reinterpreted
as epoch SECONDS by that cast (silently inflated 1e6x); convert with
timestamp_micros() first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
) -> DataFrame:
    """Join pairs where ``right_ts`` ∈ [``left_ts`` + lower_us, ``left_ts``
    + upper_us) (microsecond offsets). Returns left.* + right.* rows.

    Columns must be disjoint between the two inputs (rename beforehand).
    """
    if upper_us <= lower_us:
        raise ValueError("empty interval: upper_us must exceed lower_us")
    width = upper_us - lower_us

    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))

    # Buckets the left window [l+lower, l+upper) can overlap:
    # floor((l+lower)/width) .. floor((l+upper-1)/width) — at most 2.
    lo_bucket = F.floor((l_us + F.lit(lower_us)) / F.lit(width))
    hi_bucket = F.floor((l_us + F.lit(upper_us) - 1) / F.lit(width))
    l_exploded = left.withColumn(
        _BUCKET, F.explode(F.sequence(lo_bucket, hi_bucket))
    )
    r_bucketed = right.withColumn(_BUCKET, F.floor(r_us / F.lit(width)))

    joined = l_exploded.join(r_bucketed, on=_BUCKET, how="inner")
    l_us_j = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us_j = F.unix_micros(F.col(right_ts).cast("timestamp"))
    refined = joined.filter(
        (r_us_j >= l_us_j + F.lit(lower_us)) & (r_us_j < l_us_j + F.lit(upper_us))
    )
    return refined.drop(_BUCKET)
