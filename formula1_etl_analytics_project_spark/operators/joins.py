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
