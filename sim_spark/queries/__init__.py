"""Importing this package populates sim_spark.registry with every operator."""

from sim_spark.queries import (  # noqa: F401
    aggregations,
    functions_bits,
    functions_extra,
    functions_scalar,
    grouping_ext,
    joins,
    joins_advanced,
    ml_llm,
    pivots,
    profiling,
    subqueries,
    tpch_shapes,
    projections,
    scans,
    sim_ann,
    sorts_sets,
    streaming_batch,
    text_extras,
    udfs,
    windows,
)
