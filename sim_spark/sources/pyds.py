"""Custom connector via the Spark 4 Python Data Source API
(pyspark.sql.datasource) — the extension point for reading systems Spark
has no built-in source for (internal services, bespoke formats).

This one generates a deterministic synthetic event stream so its output
is SQL-oracle-checkable; the part that matters is the connector
machinery: schema declaration, option handling, and EXPLICIT partition
planning (``partitions()`` → one ``read()`` call per partition, executed
in parallel across the cluster). A real connector swaps the arithmetic
for client calls; the partition planning is how it scales — one
partition per shard/day/offset-range of the remote system.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RangeEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        step = max(1, (self.n + self.parts - 1) // self.parts)
        return [_Slice(s, min(s + step, self.n)) for s in range(0, self.n, step)]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            # Deterministic integer arithmetic only — identical in any
            # engine, so the oracle can reproduce it from range().
            yield (i, i % 97, round((i * 31 % 1000) / 10.0, 1))


class RangeEventsDataSource(DataSource):
    """``spark.read.format("range_events").option("n", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "range_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, amount double"

    def reader(self, schema) -> RangeEventsReader:
        return RangeEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "RangeEventsStreamReader":
        return RangeEventsStreamReader(self.options)


class RangeEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming face of the same source: offsets are row
    positions, each poll serves up to ``batch`` rows and advances the
    offset; ``readBetweenOffsets`` replays a committed range exactly
    (the recovery contract checkpointed streams rely on). A real
    connector maps offsets to its log positions (Kafka offsets, change
    streams); the arithmetic rows keep this one oracle-checkable."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.batch = int(options.get("batch", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    @staticmethod
    def _rows(start: int, end: int):
        return [(i, i % 97, round((i * 31 % 1000) / 10.0, 1)) for i in range(start, end)]

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.batch, self.n)
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["pos"], end["pos"]))


def register(spark) -> None:
    spark.dataSource.register(RangeEventsDataSource)
