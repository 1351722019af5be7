"""Join-layer operators (SURVEY.md section 2.4).

The reference executes zero runtime joins - its input CSV is the
materialized result of a 10-way join - but join semantics are declared
in its DDL (FK equi-joins J1, the integrity anti-join J2) and in the
orphaned MERGE experiment (J3, implemented in sources.sinks.upsert).

Scale notes: dimension sides get explicit ``broadcast()`` hints -
dims stay broadcastable even at sf10000 (they grow with entities, not
events), so the fact scan never shuffles for the star join. Fact-fact
joins rely on AQE for sort-merge vs shuffled-hash and skew splitting;
pre-bucketing both facts on the join key removes that shuffle entirely
when the tables are co-bucketed at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def star_join(
    fact: DataFrame,
    dims: dict[str, tuple[DataFrame, str]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1: fact joined against each dimension.

    ``dims`` maps a label to (dim_df, key). Dimensions are broadcast by
    default - the planner would usually pick this anyway, but the hint
    pins the property the 100 TB design depends on (no fact shuffle).
    """
    out = fact
    for _, (dim, key) in dims.items():
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on=key, how="inner")
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-defeating equi-join: left rows get a random salt in [0, salt),
    the right side is replicated ``salt`` times, and the join key becomes
    (key, salt) - a single hot key's rows now spread across ``salt``
    reducer partitions instead of landing on one straggler.

    Semantically identical to ``left.join(right, on, how)`` (each left
    row still matches exactly the right rows of its key, via exactly one
    salt copy). Cost: right side shuffled/broadcast x salt - use for
    fact-fact joins where one side has pathological key skew AQE's
    skew-join splitting can't fix (e.g. the skewed side feeds a window,
    not a join). Inner/left joins only - the replicated right side makes
    right/full-outer null-matching ambiguous.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salted_left = left.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_left.join(salted_right, on=[on, "_salt"], how=how).drop("_salt")


def integrity_violations(
    child: DataFrame, parent: DataFrame, on: str | list[str]
) -> DataFrame:
    """J2: FK-integrity check - child rows whose key has no parent
    (the reference's commented-out trigger, DDL Final.sql:140-162).
    Empty result == constraint holds."""
    return child.join(parent, on=on, how="left_anti")


def integrity_keep(
    child: DataFrame, parent: DataFrame, on: str | list[str]
) -> DataFrame:
    """Keep-side twin of J2: child rows that satisfy the FK (semi-join,
    never duplicates child rows the way an inner join against a
    non-unique parent would)."""
    return child.join(parent, on=on, how="left_semi")
