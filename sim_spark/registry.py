"""Query registry: the single source of truth for the engine's declared surface.

Each operator from SURVEY.md §2 registers a callable ``(spark, sf_dir) ->
DataFrame`` under its contract key, optionally with a DuckDB-dialect oracle
SQL string. ``__spark_entry__.py`` re-exports these to the driver harness.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``key``; ``oracle`` is DuckDB SQL or None.

    Rows-only operators (non-SQL-expressible: seeded ML, streaming
    artifacts) pass ``oracle=None`` and are checked by pytest invariants
    instead (SURVEY.md §2.12.5).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco
