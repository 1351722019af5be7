from formula1_etl_analytics_project_spark.operators import (
    dedup,
    joins,
    multimodal,
    similarity,
)

__all__ = ["dedup", "joins", "similarity", "multimodal"]
