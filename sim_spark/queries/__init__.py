"""Importing this package populates sim_spark.registry with every operator."""

from sim_spark.queries import (  # noqa: F401
    aggregations,
    functions_scalar,
    grouping_ext,
    joins,
    joins_advanced,
    projections,
    scans,
    sorts_sets,
    streaming_batch,
    windows,
)
