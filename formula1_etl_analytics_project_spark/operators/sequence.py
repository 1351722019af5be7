"""Distributed deterministic sequences (P5 surrogate keys at fact
scale).

The reference takes surrogate ids from a DB sequence over pandas insert
order (``DDL Final.sql:75-87``); the naive Spark translation is
``row_number() OVER (ORDER BY _row_id)`` - a window with NO partition
key, which Catalyst executes as a single-partition Exchange: the whole
fact table funnels through one task. Fine for a 1000-row dimension,
fatal for a 100 TB fact.

:func:`distributed_sequence` keeps the exact same semantics (dense ids
1..N in ``order_col`` order) with no single-partition stage, the
classic ``zipWithIndex`` design expressed DataFrame-first:

1. ``repartitionByRange(order_col)`` - one range shuffle; partition i
   holds an ordered, non-overlapping slice of the key space.
2. ``sortWithinPartitions(order_col)`` - local sort, no shuffle.
3. A ``mapInPandas`` pass stamps ``spark_partition_id`` and a running
   LOCAL index per partition (Arrow batches stream in partition order,
   so the counter is deterministic).
4. Per-partition row counts (a k-row aggregate, k = #partitions) turn
   into cumulative offsets on the driver-side-sized window, then
   broadcast-join back: ``seq = offset + local_idx``.

Total cost: one range shuffle over the fact + one broadcast join -
the minimum any global ordering can cost - instead of one
all-to-one shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

_PID = "__seq_pid"
_LOCAL = "__seq_local"


def distributed_sequence(
    df: DataFrame,
    order_col: str | list[str],
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add dense sequence ids 1..N ordered by ``order_col`` without a
    single-partition window.

    ``order_col`` may be one column name or a composite list (ordered
    lexicographically, like a multi-key ORDER BY); the combination
    must be unique per row (the builders' ``_row_id`` is; composite
    callers append a PK tiebreak). Ties would make the sequence
    nondeterministic, exactly as in any ORDER BY. Output rows keep all
    input columns plus ``out_col`` (long). Row order of the result is
    not defined - sequences are values, not physical order.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    ranged = ranged.sortWithinPartitions(*order_cols)

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    # NB: StructType.add mutates in place, and DataFrame.schema is a
    # cached object - build a fresh StructType, never .add on df.schema
    out_schema = StructType(
        list(ranged.schema.fields)
        + [StructField(_PID, IntegerType()), StructField(_LOCAL, LongType())]
    )

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Runs once per partition; batches arrive in partition order
        # (post sortWithinPartitions), so `seen` is a deterministic
        # running count. The pid is taken from TaskContext.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for b in batches:
            b = b.copy()
            b[_PID] = pid
            b[_LOCAL] = range(seen, seen + len(b))
            seen += len(b)
            yield b

    # Two consumers read `stamped` (the k-row counts aggregate and the
    # final join probe). Persist so (a) the mapInPandas stamping pass
    # runs once per action instead of twice over the full fact, and
    # (b) both consumers are guaranteed the SAME pid/local assignment
    # rather than relying on shuffle-reuse determinism. No explicit
    # unpersist: the API is lazy, so the earliest safe point is after
    # the caller's action - Spark's ContextCleaner drops the blocks
    # when the plan is garbage-collected.
    stamped = ranged.mapInPandas(stamp, schema=out_schema).persist()

    # k rows (k = #partitions): cumulative count of everything in
    # partitions BEFORE mine. The single-partition window here is over
    # k rows, not N - that is the whole point.
    counts = stamped.groupBy(_PID).agg(F.count("*").alias("__n"))
    offsets = counts.select(
        _PID,
        (
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy(_PID).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            )
        ).alias("__offset"),
    )

    return (
        stamped.join(F.broadcast(offsets), _PID)
        .withColumn(
            out_col, (F.col("__offset") + F.col(_LOCAL) + 1).cast("long")
        )
        .drop(_PID, _LOCAL, "__offset")
    )


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Running total of ``val_col`` (long) in ``order_col`` order with
    no single-partition window - the prefix-sum twin of
    :func:`distributed_sequence`, same two-phase shape:

    1. range-partition + local sort on ``order_col``;
    2. one mapInPandas pass stamps each row's LOCAL prefix sum
       (inclusive) per partition;
    3. per-partition totals (k rows) become broadcast offsets:
       ``cumsum = offset + local_cumsum``.

    ``order_col`` must be unique per row (ties would make the prefix
    sum order-dependent); ``val_col`` must be integral - exact
    arithmetic is the point, callers doing weighted selection on the
    running total (operators/sampling.py) rely on it.
    """
    ranged = (
        df.repartitionByRange(num_partitions, order_col)
        if num_partitions
        else df.repartitionByRange(order_col)
    )
    ranged = ranged.sortWithinPartitions(order_col)

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    out_schema = StructType(
        list(ranged.schema.fields)
        + [StructField(_PID, IntegerType()), StructField(_LOCAL, LongType())]
    )

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        running = 0
        for b in batches:
            b = b.copy()
            b[_PID] = pid
            local = b[val_col].astype("int64").cumsum() + running
            b[_LOCAL] = local
            running = int(local.iloc[-1]) if len(b) else running
            yield b

    stamped = ranged.mapInPandas(stamp, schema=out_schema).persist()

    # Partition total = sum of values, NOT max of the local prefix sum
    # (they agree only for non-negative values; sum is sign-safe).
    totals = stamped.groupBy(_PID).agg(
        F.sum(F.col(val_col).cast("long")).alias("__n")
    )
    offsets = totals.select(
        _PID,
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy(_PID).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__offset"),
    )

    return (
        stamped.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col("__offset") + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, "__offset")
    )
