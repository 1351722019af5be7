"""Structured Streaming layer (SURVEY.md section 2.9 + M6).

The reference is batch-only (daily full reload), but its orphaned
``MERGE INTO`` experiment shows intended incremental load. Here both
shapes are first-class:

  * ``windowed_event_counts`` - watermarked tumbling-window aggregation
    over an event stream (late data dropped past the watermark; state
    bounded).
  * ``incremental_upsert_stream`` - ``foreachBatch`` merge of each
    micro-batch into a parquet snapshot via the same anti-join+union
    upsert the batch layer uses (sources.sinks.upsert_parquet, staged
    write + swap) - at-least-once per-key on plain parquet; the
    exactly-once form is the same plan over a transactional format.

Scale notes: watermarks bound state store size (without one, a
groupBy-window over an unbounded stream grows state forever). The
foreachBatch upsert rewrites the snapshot per batch - fine for
dimension-sized sinks; a 100 TB fact sink would use Delta/Iceberg
MERGE (row-level) instead, same logical plan.

Tests drive these with a file source over the events testdata +
``processAllAvailable()`` so a batch of rows runs the streaming query
to completion synchronously.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from formula1_etl_analytics_project_spark.schemas import TESTDATA_SCHEMAS
from formula1_etl_analytics_project_spark.sources.sinks import (
    upsert_parquet,
    upsert_parquet_versioned,
    read_current_epoch,
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over events-shaped parquet. The testdata
    events file stores TIMESTAMP(NANOS) which file streaming cannot
    read directly; callers stage a micro-second copy first (tests do),
    or point this at any events-schema directory."""
    return (
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with a watermark
    bounding state (and dropping data later than ``watermark``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_event_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop key-duplicates arriving within the
    watermark horizon (``dropDuplicatesWithinWatermark``) - the
    streaming form of the D1/D2 dedup family, with state bounded by the
    watermark instead of growing with the whole key history (which
    plain ``dropDuplicates`` on a stream would)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running totals
    carried across micro-batches via ``applyInPandasWithState``.

    This is the escape hatch for stateful semantics Spark's built-in
    windowed aggregates can't express (per-key accumulators, custom
    eviction, decaying counters): user-defined state (a counter + sum
    here) lives in the state store, each micro-batch's rows arrive as
    Arrow batches, and the operator emits one updated row per key per
    batch (output mode ``update``).

    Scale notes: state is partitioned by the grouping key across the
    cluster and checkpointed incrementally; per-key state is O(1) here
    so total state grows with distinct users, not events. An
    unbounded-key stream would add a timeout
    (``GroupStateTimeout.EventTimeTimeout``) to evict idle keys.
    """
    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` -
    the Spark 4 arbitrary-stateful-processing API that supersedes
    ``applyInPandasWithState`` (stateful_user_totals above keeps the
    legacy form for comparison).

    What the new API buys at scale: named state variables with
    per-variable schemas (value/list/map state) instead of one opaque
    tuple, native TTL on state values, timers for event-/processing-
    time callbacks, and schema evolution of state across restarts.
    Requires the RocksDB state store provider (callers set
    ``spark.sql.streaming.stateStore.providerClass``; the catalog
    entry scopes that to its own query).

    The running sum is kept in integer CENTS (callers pre-compute a
    ``cents`` long column): integer addition is associative, so the
    final state is bit-identical however the stream is micro-batched -
    the float-accumulation drift the legacy operator papers over with
    ROUND is designed out.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(
            self, key, rows, timerValues
        ) -> Iterator[pd.DataFrame]:
            n, cents = (
                self._state.get() if self._state.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "cents": [cents]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType="user_id long, n_events long, cents long",
        outputMode="Update",
        timeMode="None",
    )


def incremental_upsert_stream(
    events: DataFrame,
    snapshot_path: str,
    keys: list[str] | None = None,
    versioned: bool = True,
):
    """foreachBatch incremental load: merge each micro-batch into the
    parquet snapshot (new keys insert, existing keys update). Returns
    the StreamingQuery; caller awaits/stops it.

    Durability: with ``versioned`` (default) each merge goes through
    ``sinks.upsert_parquet_versioned`` - write-new-then-repoint, atomic
    pointer flip - so readers through ``sinks.read_snapshot`` NEVER see
    a missing or partial snapshot, even if the job dies mid-batch; a
    replayed interrupted batch is SKIPPED entirely: the micro-batch
    epoch id commits atomically with the pointer flip, and
    ``merge_epoch_batch`` compares the incoming epoch against the
    committed one before touching anything - EXACTLY-once for this
    single-writer sink, even for non-idempotent merges (tested by
    tests/test_streaming.py::test_replayed_epoch_is_skipped).
    ``versioned=False`` keeps the legacy in-place layout (directly
    ``spark.read``-able at ``snapshot_path``) at the cost of the
    delete/rename window - per-key at-least-once. Concurrent
    multi-writer commit still needs a transactional table format
    (Delta/Iceberg MERGE); this store is its single-writer logical
    twin."""
    keys = keys or ["event_id"]

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        if versioned:
            merge_epoch_batch(batch, epoch_id, snapshot_path, keys)
        else:
            upsert_parquet(batch.sparkSession, batch, snapshot_path, keys)

    return (
        events.writeStream.outputMode("update")
        .foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )


def merge_epoch_batch(
    batch: DataFrame,
    epoch_id: int,
    snapshot_path: str,
    keys: list[str],
) -> bool:
    """One exactly-once foreachBatch merge: skip if ``epoch_id`` IS the
    committed epoch (checkpoint replay after a crash BETWEEN the
    snapshot commit and the streaming checkpoint advance - the only
    epoch Structured Streaming ever re-delivers for one checkpoint),
    else merge and commit the epoch atomically with the snapshot
    pointer. Returns True when the batch was applied, False skipped.

    An epoch LOWER than the committed one is neither a replay nor
    progress - it means the query restarted against a DIFFERENT (or
    wiped) checkpoint whose epoch counter reset, and silently skipping
    would discard genuinely new data until the counter caught up.
    That is refused loudly: pair each store with one checkpoint for
    its lifetime, or start a fresh store for a fresh checkpoint.
    """
    committed = read_current_epoch(snapshot_path)
    if committed is not None:
        if epoch_id == committed:
            return False
        if epoch_id < committed:
            raise ValueError(
                f"epoch regression: store {snapshot_path} committed "
                f"epoch {committed} but received epoch {epoch_id}; the "
                "stream's checkpoint was reset or a different query is "
                "writing - refusing to silently drop batches. Use a "
                "fresh snapshot store for a fresh checkpoint."
            )
    upsert_parquet_versioned(
        batch.sparkSession, batch, snapshot_path, keys, epoch_id=epoch_id
    )
    return True


def stream_stream_user_pairs(
    left: DataFrame,
    right: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream INNER join: each left event pairs with
    right events of the SAME user whose timestamp falls within the
    trailing ``horizon``.

    Both sides carry event-time watermarks, and the join condition
    bounds the time skew, so the state store provably evicts: a
    buffered right row can only match left rows within ``horizon``, and
    once the left watermark passes that bound the row is dropped. This
    is THE unbounded-state hazard of stream-stream joins - without the
    time bound the state grows forever. Tests run with a huge watermark
    (all data "on time") so the result equals the batch join exactly.
    """
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("r.ts") <= F.col("l.ts"))
    )
    return l.join(r, cond).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("event_a"),
        F.col("r.event_id").alias("event_b"),
    )
