from formula1_etl_analytics_project_spark.plans import (
    analytics,
    catalog,
    catalog_etl,
    catalog_ext,
    catalog_r4,
    catalog_r5,
    catalog_r6,
    catalog_r7,
    catalog_r8,
    catalog_r9,
    catalog_r10,
    star,
)

__all__ = [
    "star",
    "analytics",
    "catalog",
    "catalog_ext",
    "catalog_etl",
    "catalog_r4",
    "catalog_r5",
    "catalog_r6",
    "catalog_r7",
    "catalog_r8",
    "catalog_r9",
    "catalog_r10",
]
