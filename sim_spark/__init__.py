"""sim_spark — a PySpark-native analytics engine.

A ground-up, Spark-first engine providing the query and data-processing
capabilities surveyed in SURVEY.md: relational operators over a TPC-H-ish
star schema, event-time (streaming-semantics) operators, scalar function
families, UDF surfaces, and large-scale LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Everything is expressed as declarative DataFrame / Spark SQL plans so that
Catalyst + Tungsten pick the physical strategy; Python (Arrow-batched
pandas UDFs) is used only where built-in operators genuinely cannot
express the semantics.

Public entry points:
    sim_spark.registry.QUERIES   — {key: fn(spark, sf_dir) -> DataFrame}
    sim_spark.registry.ORACLES   — {key: equivalent DuckDB ANSI SQL}
Populated by importing :mod:`sim_spark.queries`.
"""

__version__ = "0.1.0"
