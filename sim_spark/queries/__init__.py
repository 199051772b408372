"""Importing this package populates sim_spark.registry with every operator."""

from sim_spark.queries import aggregations  # noqa: F401
