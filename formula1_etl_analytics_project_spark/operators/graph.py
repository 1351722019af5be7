"""Iterative graph algorithms on edge-list DataFrames.

PageRank here runs ENTIRELY in fixed-point BIGINT arithmetic (ranks in
1e-12 units): contribution = rank div out_degree, update = base +
(damping * sum) div 100, all integer ops - so the distributed sums are
bit-exact regardless of partition count or aggregation order. That is
what makes an ITERATIVE algorithm reproducible enough to value-check
across engines (plans/catalog_r6.py states the same fixpoint as
chained SQL CTEs) and across cluster sizes.

Scale shape per iteration: one shuffle-join of the edge list against
the current rank vector (both partitioned on ``src``) plus one
hash-agg by ``dst``. Edges and out-degrees are loop-invariant; callers
should localCheckpoint() them once (the catalog entry does) so the
rounds reuse one materialization - the same lineage-cut pattern as
``operators.dedup.connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 1.0 in fixed-point 1e-12 units.
PR_INIT = 1_000_000_000_000
# 0.15 teleport mass (damping 0.85).
PR_BASE = 150_000_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    init: int = PR_INIT,
    base: int = PR_BASE,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list.

    ``edges`` must have ``src`` and ``dst`` columns (any integral
    type; the caller guarantees distinct edges). Returns one row per
    node with its ``rank`` after ``iterations`` rounds. Dangling
    nodes (no outgoing edges) contribute nothing; nodes with no
    incoming edges settle at ``base``. All arithmetic is integer
    (div, not /), so results are exactly reproducible at any
    parallelism - see the module docstring.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select("dst", F.expr("`rank` div `d`").alias("c"))
        )
        inc = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        ranks = nodes.join(inc, nodes["node"] == inc["dst"], "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(inc, 0)) div 100")
            ).alias("rank"),
        )
    return ranks


def pagerank_fixed_point_local(
    edge_list: list[tuple[int, int]],
    iterations: int = 3,
    init: int = PR_INIT,
    base: int = PR_BASE,
    damping_pct: int = 85,
) -> dict[int, int]:
    """Pure-Python reference fixpoint with IDENTICAL integer
    arithmetic - the oracle for property tests: on any graph, the
    distributed iteration must reproduce this exactly."""
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {n: init for n in nodes}
    for _ in range(iterations):
        inc: dict[int, int] = {}
        for s, d in edges:
            inc[d] = inc.get(d, 0) + ranks[s] // outdeg[s]
        ranks = {
            n: base + (damping_pct * inc.get(n, 0)) // 100 for n in nodes
        }
    return ranks
