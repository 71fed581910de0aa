"""Spark 4 Python data source: a deterministic synthetic event generator.

Demonstrates the ``pyspark.sql.datasource`` API — the extension point
for ingesting from systems Spark has no built-in connector for
(internal HTTP APIs, bespoke queues, custom binary formats). The reader
fans out over ``InputPartition`` s, one generator task per partition, so
the read parallelizes exactly like a parquet scan and composes with the
rest of the engine (filters, aggregations, joins, oracles).

Determinism: every column derives from the row index via md5 (the
engine-wide hash-id convention, ``operators.dedup.hash_id_expr``), so a
DuckDB ``generate_series`` oracle reproduces the read bit-for-bit — the
gate proves a custom Python source feeds the same plans and passes the
same value-hash as a parquet scan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("view", "click", "cart", "purchase", "refund")


def _h(i: int) -> int:
    """First 15 hex chars of md5(str(i)) as int — matches
    ``dedup.hash_id_expr`` / ``hash_id_sql``."""
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration.

    Options: ``rows`` (total row count, default 1000), ``partitions``
    (read parallelism, default 8).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string, value double"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):
        # round-robin row assignment: each task generates its stripe
        for i in range(partition.value, self.n, self.parts):
            yield _row(i)


def _row(i: int):
    h = _h(i)
    return (i, h % 100, EVENT_TYPES[h % 5], (h % 10000) / 100.0)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream form of the same source: the offset is just
    the next row index, ``read`` advances it by ``batchRows`` per
    trigger, and ``readBetweenOffsets`` regenerates any committed range
    for recovery replay — deterministic generation makes replay exact,
    which is what a real connector needs for end-to-end exactly-once.
    """

    def __init__(self, options) -> None:
        self.n = int(options.get("rows", 1000))
        self.batch = int(options.get("batchRows", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i = int(start["i"])
        end = min(i + self.batch, self.n)
        return (iter([_row(j) for j in range(i, end)]), {"i": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(j) for j in range(int(start["i"]), int(end["i"]))])
