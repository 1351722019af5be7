"""Interval algebra over keyed event streams.

The 1D interval-union (sweep-line island merge) is the primitive under
"time on site", sensor uptime, and validity-range consolidation: given
per-key intervals [s, e), merge every overlapping/touching group into
one island and measure what the union actually covers - a naive
SUM(e - s) double-counts overlaps.

Algorithm (all window-relational, no UDF, no iteration):

1. Per key, order intervals by (s, tiebreak).
2. An interval OPENS A NEW ISLAND iff its start exceeds the running
   MAX of all previous ends. The running max matters: an earlier long
   interval can swallow several later short ones, so comparing against
   lag(e) alone (the common bug) splits islands that overlap through
   a chain.
3. The cumulative sum of the new-island flags numbers the islands;
   grouping by (key, island) yields [min(s), max(e)) per island.

Both windows partition on the key columns and share one hash
exchange, so the operator scales out on the key space; per-row window
state is O(1). Works on any totally ordered numeric domain - callers
with timestamps should pass exact integer microseconds
(``F.unix_micros``), keeping the arithmetic float-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def interval_islands(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Merge overlapping [start, end) intervals per key into islands.

    Returns one row per island: key columns, ``island`` (1-based rank
    within the key), ``st`` (island start), ``en`` (island end).
    ``tiebreak_col`` must make (start_col, tiebreak_col) unique per
    key so island assignment is deterministic. Intervals that merely
    touch (next.start == prev.end) merge - the union is over
    half-open intervals.
    """
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(start_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new_island",
        F.when(
            F.col(start_col)
            > F.coalesce(
                F.max(end_col).over(w_prev),
                F.col(start_col) - F.lit(1),
            ),
            1,
        ).otherwise(0),
    )
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy(start_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islanded = flagged.withColumn(
        "island", F.sum("__new_island").over(w_cum)
    )
    return islanded.groupBy(*key_cols, "island").agg(
        F.min(start_col).alias("st"), F.max(end_col).alias("en")
    )


def covered_length(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Total covered length of the per-key interval union.

    Returns one row per key: ``n_islands`` and ``covered`` (the exact
    union measure, sum of island extents - no double counting).
    """
    islands = interval_islands(df, key_cols, start_col, end_col, tiebreak_col)
    return islands.groupBy(*key_cols).agg(
        F.count("*").alias("n_islands"),
        F.sum(F.col("en") - F.col("st")).alias("covered"),
    )
