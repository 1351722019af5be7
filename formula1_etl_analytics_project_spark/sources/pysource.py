"""Custom Python data source (Spark 4 DataSource API).

The extension surface for sources Spark has no built-in reader for
(internal feeds, bespoke formats, synthetic generators). This one
generates deterministic synthetic telemetry events - the shape of the
driver's ``events`` table - split across N partitions, demonstrating:

  * schema declaration on the source (``schema()``)
  * PARTITIONED reads: each ``InputPartition`` is generated
    independently on an executor - the same mechanism that lets a
    custom source scale out over a cluster instead of funneling
    through the driver
  * option passing (``rows``, ``partitions``, ``seed``)

Register + use:

    spark.dataSource.register(SyntheticEventsDataSource)
    spark.read.format("synthetic_events").option("rows", 1000).load()

Determinism: row i is a pure function of (seed, i), so any executor
layout produces the same table - the property every replayable
training-data source needs.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_EVENT_TYPES = ("click", "view", "purchase", "error", "scroll")


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events") - deterministic event rows."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("event_id", LongType(), False),
                StructField("user_id", LongType(), False),
                StructField("event_type", StringType(), False),
                StructField("ts", TimestampType(), False),
                StructField("value", DoubleType(), False),
            ]
        )

    def reader(self, schema: StructType) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> list[_Slice]:
        per = max(1, self.rows // self.n_parts)
        slices = []
        start = 0
        while start < self.rows:
            end = min(start + per, self.rows)
            slices.append(_Slice(start, end, self.seed))
            start = end
        return slices

    def read(self, partition: _Slice):
        # Pure function of (seed, i): same rows on any executor layout.
        import datetime
        import hashlib

        base = datetime.datetime(2024, 1, 1)
        for i in range(partition.start, partition.end):
            h = int.from_bytes(
                hashlib.md5(f"{partition.seed}|{i}".encode()).digest()[:8], "big"
            )
            yield (
                i,
                h % 150,
                _EVENT_TYPES[h % len(_EVENT_TYPES)],
                base + datetime.timedelta(seconds=(h % 2_592_000)),
                round((h % 1_000_000) / 1000.0, 3),
            )


# ---------------------------------------------------------------------------
# Streaming variant: the same deterministic feed as an unbounded source
# ---------------------------------------------------------------------------


class SyntheticEventsStreamDataSource(DataSource):
    """spark.readStream.format("synthetic_events_stream") - the
    STREAMING form of the synthetic feed (Spark 4
    SimpleDataSourceStreamReader API): offsets are plain row indices,
    each micro-batch reads [start, min(start+batch_rows, max_rows)),
    and row i is the same pure function of (seed, i) as the batch
    source - so the stream is REPLAYABLE from any offset, which is
    what lets Structured Streaming give exactly-once on top of it
    (checkpointed offsets + deterministic re-read). ``max_rows``
    bounds the feed so availableNow/processAllAvailable terminate in
    tests; a real feed would return the ever-growing tail instead.

    Demonstrates the full custom-source surface: batch
    (SyntheticEventsDataSource), streaming (this), both sharing one
    row function - the dual-mode layout a bespoke internal feed needs.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> StructType:
        return SyntheticEventsDataSource.schema(self)  # same shape

    def simpleStreamReader(self, schema: StructType):
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Driver-side offset bookkeeping; each batch is returned as a
    picklable list ITERATOR (see read()), and recovery re-reads any
    committed [start, end) range deterministically."""

    def __init__(self, options: dict):
        self.max_rows = int(options.get("max_rows", 100))
        self.batch_rows = int(options.get("batch_rows", 37))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        s = start["index"]
        e = min(s + self.batch_rows, self.max_rows)
        # iter(list): the engine requires an ITERATOR (it next()s the
        # empty-batch case) that is also PICKLABLE (the prefetched
        # batch ships to the JVM) - list iterators are both; a lazy
        # generator fails pickling, a bare list fails next().
        return iter(list(self._rows(s, e))), {"index": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        # recovery path: deterministic re-read of a committed range
        return iter(list(self._rows(start["index"], end["index"])))

    def _rows(self, start: int, end: int):
        import datetime
        import hashlib

        base = datetime.datetime(2024, 1, 1)
        for i in range(start, end):
            h = int.from_bytes(
                hashlib.md5(f"{self.seed}|{i}".encode()).digest()[:8], "big"
            )
            yield (
                i,
                h % 150,
                _EVENT_TYPES[h % len(_EVENT_TYPES)],
                base + datetime.timedelta(seconds=(h % 2_592_000)),
                round((h % 1_000_000) / 1000.0, 3),
            )
