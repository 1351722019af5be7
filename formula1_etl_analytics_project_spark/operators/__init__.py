from formula1_etl_analytics_project_spark.operators import (
    aggregates,
    dedup,
    graph,
    grouped,
    joins,
    layout,
    linkage,
    multimodal,
    sequence,
    similarity,
    skyline,
)

__all__ = [
    "aggregates",
    "dedup",
    "graph",
    "grouped",
    "joins",
    "layout",
    "linkage",
    "multimodal",
    "sequence",
    "similarity",
    "skyline",
]
