"""Scale-adaptive fan-out for compute-heavy narrow stages.

A single-file fixture parquet is one row group — unsplittable, so every
expression evaluated before the query's first Exchange runs in ONE task
no matter how many cores the session has (measured: the shingle-hash
projection of dedup_jaccard_shingles spent 1.5 s serial at sf0.1 on
local[32]). The same applies to any compute-bound stage AQE coalesces
down to a handful of partitions because its *bytes* are small: AQE sizes
partitions by data volume and cannot see per-row CPU cost.

:func:`spread` round-robins a frame across the session's task slots,
but ONLY when its current layout under-parallelizes — a well-laid-out
input (100 TB = many row groups/files) already splits wide, and adding
an Exchange there would pay a shuffle for nothing (and can even reduce
parallelism). Same guard as the decode keys' ``_doc_ids`` fan-out.
Callers project to the narrow column set FIRST so the Exchange moves
only what the compute needs (guide §2: shuffle fewer bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin ``df`` across all task slots iff it currently has
    fewer partitions than ``min_partitions`` (default: the session's
    ``defaultParallelism``). No-op under Spark Connect (no ``.rdd``)."""
    try:
        slots = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext — leave layout alone
        return df
    target = min_partitions or slots
    try:
        if df.rdd.getNumPartitions() >= target:
            return df
    except Exception:
        return df
    return df.repartition(target)
