"""Record linkage / entity resolution: blocked fuzzy matching.

The reference deduplicates only on exact keys (driver/constructor refs,
SURVEY.md section 2.5); a training-data pipeline additionally needs
FUZZY identity resolution - "cold bolt" vs "old bolt" style typo and
variant collapse over name-like columns - before exact keys exist.

The classic scale shape is blocking (Fellegi-Sunter style record
linkage): never compare all pairs. Candidates are generated only
within cheap deterministic blocks (same last token, same first token,
same phonetic code, ...), each record can enter several blocks so one
bad blocker does not cost recall, and the expensive string distance
runs only on the blocked candidates.

100 TB design notes:
- the name DICTIONARY is distinct()'d first: corpora repeat names
  (vocabulary << rows), so pairing runs on the vocabulary, and results
  join back to rows by normalized name when needed. distinct() is a
  map-side-combined hash aggregate - the only full-data pass.
- blocks are joined with a plain hash equi-join on the block key; the
  per-block pair space is quadratic, so block keys must be chosen to
  bound block size (for skewed/hot blocks, salt the block key or cap
  block size with a deterministic top-N as in operators/dedup.py).
- the length pre-filter (|len(a)-len(b)| <= max_dist is a lower bound
  on edit distance) discards most candidates BEFORE levenshtein runs;
  both the filter and levenshtein are JVM builtins (no Python).
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def normalize_name(col: Column | str) -> Column:
    """Canonical form for matching: lowercase, trim, collapse runs of
    whitespace. Kept intentionally cheap and reversible-ish; heavier
    normalization (unicode folding, punctuation strip) composes on top."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def blocked_edit_pairs(
    df: DataFrame,
    name_col: str,
    blockers: Sequence[Callable[[Column], Column]],
    max_dist: int = 2,
) -> DataFrame:
    """Fuzzy near-duplicate pairs over the distinct values of
    ``name_col``: ``(left_name, right_name, edit_dist)`` with
    ``left_name < right_name`` and ``edit_dist <= max_dist``, where the
    pair shares at least one block under ``blockers``.

    Each blocker maps the normalized name to a block key; candidate
    pairs are the union (set semantics) over blockers of same-block
    pairs. Recall is exact WITHIN the union of blocks; pairs no blocker
    co-locates are missed by design - that is the blocking trade-off,
    mitigated by passing several complementary blockers.
    """
    names = df.select(normalize_name(name_col).alias("_n")).distinct()
    per_block = []
    for blk in blockers:
        b = names.withColumn("_b", blk(F.col("_n")))
        a, c = b.alias("a"), b.alias("c")
        per_block.append(
            a.join(
                c,
                (F.col("a._b") == F.col("c._b"))
                & (F.col("a._n") < F.col("c._n")),
            )
            # length gap lower-bounds edit distance: cheap pre-filter
            .where(
                F.abs(F.length("a._n") - F.length("c._n")) <= max_dist
            )
            .where(F.levenshtein(F.col("a._n"), F.col("c._n")) <= max_dist)
            .select(
                F.col("a._n").alias("left_name"),
                F.col("c._n").alias("right_name"),
            )
        )
    pairs = reduce(DataFrame.unionByName, per_block).distinct()
    return pairs.withColumn(
        "edit_dist", F.levenshtein("left_name", "right_name")
    )


def funnel_first_times(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[tuple[str, Column]],
) -> DataFrame:
    """Ordered-step funnel: per user, the earliest time each step was
    completed STRICTLY AFTER the previous step's completion time.

    Returns one row per user who completed step 0, with a ``t_<label>``
    timestamp column per step (NULL from the first incomplete step on).
    A user whose only step-1 events precede their first step-0 event
    has NOT completed step 1 - event order, not event existence, is
    what a funnel measures.

    Scale: every stage is a filter -> hash aggregate on the user key
    plus an equi-join on the same key; all shuffles share the user-key
    partitioning so AQE/exchange-reuse keeps the funnel to effectively
    one partitioning of the event log, with per-stage state bounded by
    |users|, never |events|. No windows over the full log, no driver
    loops (the Python ``for`` builds the plan; Spark executes it once).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    label0, pred0 = steps[0]
    cur = (
        events.where(pred0)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{label0}"))
    )
    prev = f"t_{label0}"
    for label, pred in steps[1:]:
        nxt = (
            events.where(pred)
            .join(cur.select(user_col, prev), user_col)
            .where(F.col(ts_col) > F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{label}"))
        )
        cur = cur.join(nxt, user_col, "left")
        prev = f"t_{label}"
    return cur
