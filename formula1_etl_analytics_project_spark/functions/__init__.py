from formula1_etl_analytics_project_spark.functions import cleaning, text, vectors

__all__ = ["cleaning", "text", "vectors"]
