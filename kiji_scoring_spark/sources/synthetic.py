"""Custom Python DataSource (§2.B extension, Spark 4 ``pyspark.sql.datasource``).

The reference reads exclusively from its own storage layer; a Spark
engine additionally needs the escape hatch for systems with no built-in
connector. Spark 4's Python DataSource API is that hatch: ``partitions()``
plans the parallel split, ``read(partition)`` produces each split's rows
on executors — the same planner-visible shape as a JVM connector (each
InputPartition becomes one task; no driver-side materialization).

``SyntheticEventsDataSource`` is the load-generator instance: a
deterministic event stream computed from pure integer functions of
``event_id``, so any size of input can be conjured for stress/soak runs
with zero storage, and the DuckDB oracle can re-derive the identical
rows from ``range()`` — which makes even the custom-source path
hash-checkable end to end.

Scale: rows never exist anywhere but the executing task; total volume =
``num_partitions × rows_per_partition`` scales by adding partitions
(tasks), the same knob a real connector would turn. Options arrive as
strings (DataSourceReader contract), hence the int() coercions.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Knuth multiplicative hash constant — spreads user_ids deterministically
_MIX = 2654435761

EVENT_TYPES = ("view", "click", "purchase", "refund")


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows_per_partition = int(options.get("rows_per_partition", 1000))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        rpp = self.rows_per_partition
        base = partition.value * rpp
        for i in range(rpp):
            event_id = base + i
            yield (
                event_id,
                (event_id * _MIX) % 10_000,
                EVENT_TYPES[event_id % 4],
                (event_id * 31) % 9_700,
            )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id BIGINT, user_id BIGINT, event_type STRING, value_cents BIGINT"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)
