"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic event generator.

Demonstrates the connector surface a user extends when their input is not
a file format — a feed, an internal service, a fuzz generator. The source
is PARTITIONED (each InputPartition generates its own id-range, so a
1000-executor cluster fans the generation out with no driver bottleneck)
and supports FILTER PUSHDOWN on ``event_type`` (pushed predicates skip row
construction entirely — the Python mirror of parquet PushedFilters).

Rows are a pure function of (row_id, seed) via md5 — the same recipe on
any executor layout, so generated data is reproducible and assertable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
SCHEMA_DDL = "event_id BIGINT, event_type STRING, user_id BIGINT, cents BIGINT"


def _row(i: int, seed: int) -> tuple[int, str, int, int]:
    h = int.from_bytes(
        hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "big"
    )
    return (
        i,
        EVENT_TYPES[h % len(EVENT_TYPES)],
        (h >> 8) % 1000,
        (h >> 24) % 50_000,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "4"))
        self.seed = int(options.get("seed", "42"))
        self.type_filter: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("event_type",)
                and self.type_filter is None
            ):
                self.type_filter = f.value  # accepted: skip at generation
            else:
                # rejected (or a SECOND event_type equality — accepting
                # both would silently keep only one): Spark re-applies it
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        if self.n_rows <= 0:
            return [_RangePartition(0, 0)]
        per = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            row = _row(i, self.seed)
            if self.type_filter is not None and row[1] != self.type_filter:
                continue
            yield row


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the same generator: each micro-batch emits the
    next ``batch_rows`` ids. Offsets are plain dicts over the row counter,
    so exactly-once replay is trivial — ``readBetweenOffsets`` regenerates
    any committed range bit-identically from (row_id, seed), which is
    precisely the replayability contract a production feed source
    implements with a log position. (SimpleDataSourceStreamReader reads on
    the driver and is for modest per-batch volumes; a partitioned
    DataSourceStreamReader fans read() out per InputPartition — same
    recipe, executor-side.)"""

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", "100"))
        self.max_rows = int(options.get("rows", "1000"))
        self.seed = int(options.get("seed", "42"))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_rows, self.max_rows)
        end = {"next": hi}
        return (iter([_row(i, self.seed) for i in range(lo, hi)]), end)

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_row(i, self.seed) for i in range(int(start["next"]), int(end["next"]))]
        )

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent registration; afterwards
    ``spark.read.format("synthetic_events").option("rows", N).load()``."""
    # required for pushFilters; runtime-settable SQL conf
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsSource)


def expected_rows(n: int, seed: int = 42) -> list[tuple[int, str, int, int]]:
    """Driver-side mirror of the generation recipe, for assertions."""
    return [_row(i, seed) for i in range(n)]
