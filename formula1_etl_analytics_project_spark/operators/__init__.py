from formula1_etl_analytics_project_spark.operators import (
    dedup,
    grouped,
    joins,
    multimodal,
    similarity,
)

__all__ = ["dedup", "grouped", "joins", "similarity", "multimodal"]
