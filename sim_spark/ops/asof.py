"""Backward as-of join as a DataFrame composition (SURVEY.md §4.3).

Spark has no as-of join in SQL/DataFrame (pandas-on-Spark ``merge_asof``
routes through a different API). The union-tag formulation costs one
shuffle on the key plus one in-partition sort — O(n log n), the same
shape as a sort-merge join, so it scales like any keyed window:

  1. tag right rows 1, left rows 0; union on (key, ts, payload);
  2. window per key ordered by (ts, right-first-at-ties, right order col);
  3. ``last(payload, ignoreNulls)`` over the preceding frame gives each
     left row the most recent right payload with right.ts <= left.ts.

Determinism: ties on right.ts resolve to the greatest ``right_order``
value (caller supplies a unique column, e.g. event_id) — matching an
ORDER BY ts DESC, right_order DESC LIMIT 1 correlated subquery exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Integral only: __asof_order is carried as long in the union leg, so a
# fractional order column would truncate (1.2 vs 1.9 tie alias) and the
# "total tie-break" guarantee would silently break.
_ORDER_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

_PAYLOAD = "__asof_payload"
_IS_RIGHT = "__asof_is_right"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_order: str,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the latest right row (same ``key``) with
    ``right_ts`` <= ``left_ts``; payload columns are NULL when no such row
    exists (left-outer semantics).

    ``direction='forward'`` flips the scan: the EARLIEST right row with
    ``right_ts`` >= ``left_ts`` (ties to the smallest ``right_order``,
    matching ORDER BY ts ASC, order ASC LIMIT 1) — same single
    shuffle+sort, just a descending window order.

    NULL semantics match the correlated-subquery contract exactly:
    right rows with NULL key or NULL ts can never satisfy
    ``r.key = l.key AND r.ts <= l.ts`` (three-valued logic) and are
    filtered out; left rows with NULL ts are pinned FIRST in the window
    order so no right row precedes them — they get NULL payloads rather
    than a phantom match. ``right_order`` must be integral (it travels as
    long in the union leg) — a non-integral column would cast lossily or
    to NULL and silently destroy the tie-break, so it is rejected loudly."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward': {direction!r}")
    if not isinstance(right.schema[right_order].dataType, _ORDER_TYPES):
        raise TypeError(
            f"right_order column {right_order!r} must be an integral type "
            f"(byte/short/int/long) for a lossless total tie-break; got "
            f"{right.schema[right_order].dataType.simpleString()}"
        )
    lcols = left.columns
    l_tag = left.withColumn(_IS_RIGHT, F.lit(0)).withColumn(_PAYLOAD, F.lit(None).cast(
        "struct<" + ",".join(f"{c}:string" for c in payload_cols) + ">"
    ))
    # Payload travels as a struct of strings: one column, one last() call;
    # callers re-cast on the way out. Keeps the helper schema-generic.
    r_payload = F.struct(*[F.col(c).cast("string").alias(c) for c in payload_cols])
    r_tag = (
        right.filter(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            F.col(key),
            F.col(right_ts).alias(left_ts),
            F.lit(1).alias(_IS_RIGHT),
            r_payload.alias(_PAYLOAD),
            F.col(right_order).cast("long").alias("__asof_order"),
        )
    )
    l_tag = l_tag.select(
        *lcols, _IS_RIGHT, _PAYLOAD, F.lit(None).cast("long").alias("__asof_order")
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts (<=/>= include the
    # boundary); among right ties, last() keeps whichever it sees last:
    # backward wants the greatest right_order (asc order), forward the
    # smallest (desc order).
    # NULL-ts left rows pin FIRST in both directions (no preceding right
    # rows -> NULL payload), matching the unknown-comparison SQL result.
    if direction == "forward":
        order = [
            F.col(left_ts).desc_nulls_first(),
            F.col(_IS_RIGHT).desc(),
            F.col("__asof_order").desc_nulls_first(),
        ]
    else:
        order = [
            F.col(left_ts).asc_nulls_first(),
            F.col(_IS_RIGHT).desc(),
            F.col("__asof_order").asc_nulls_first(),
        ]
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = matched.filter(F.col(_IS_RIGHT) == 0).select(
        *lcols, *[F.col(f"{_PAYLOAD}.{c}").alias(f"asof_{c}") for c in payload_cols]
    )
    return out
