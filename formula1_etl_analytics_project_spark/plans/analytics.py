"""Analytics layer: the queries the star schema exists to serve.

The reference computes none of these in code - they are encoded in its
pre-aggregated columns (standings, fastest-lap rank; SURVEY.md section
2.6) and in the Power BI dashboard the schema feeds. Recomputing them
from atomic facts and validating against the stored columns is the
honest 'same query capabilities' surface.

Scale notes: running totals / ranks are windows over
``partitionBy(entity)`` - one shuffle on the entity key, state bounded
per partition. The dashboard rollups use cube/rollup (partial
aggregation per grouping set, map-side combine). Nothing collects to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def driver_standings_recompute(
    results: DataFrame, race: DataFrame
) -> DataFrame:
    """Cumulative points + wins per driver across the season timeline,
    and per-race championship position - the recomputation of
    ``DriverStandings`` (reference stores it pre-aggregated,
    CompleteETL.py:569-585).
    """
    r = results.join(
        F.broadcast(race.select(F.col("race_id").alias("raceId"), "date")),
        "raceId",
    )
    timeline = Window.partitionBy("driverId").orderBy("date", "raceId")
    cum = (
        r.groupBy("driverId", "raceId", "date")
        .agg(
            F.sum("points").alias("race_points"),
            F.sum(F.when(F.col("position_order") == 1, 1).otherwise(0)).alias(
                "race_wins"
            ),
        )
        .withColumn(
            "points_cum",
            F.sum("race_points").over(
                timeline.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "wins_cum",
            F.sum("race_wins").over(
                timeline.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    standing = Window.partitionBy("raceId").orderBy(
        F.col("points_cum").desc(), F.col("wins_cum").desc(), "driverId"
    )
    return cum.withColumn("position_recomputed", F.rank().over(standing)).select(
        "raceId",
        "driverId",
        F.col("points_cum").alias("points_recomputed"),
        F.col("wins_cum").alias("wins_recomputed"),
        "position_recomputed",
    )


def fastest_lap_ranking(results: DataFrame) -> DataFrame:
    """Per-race fastest-lap rank - recomputes ``Results.rank``
    (DDL Final.sql:272-274)."""
    w = Window.partitionBy("raceId").orderBy(
        F.col("fastestLapTime").asc_nulls_last(), "driverId"
    )
    return results.filter(F.col("fastestLapTime").isNotNull()).select(
        "raceId",
        "driverId",
        "fastestLapTime",
        F.rank().over(w).alias("fastest_rank"),
    )


def pitstop_aggregates(pit_stop: DataFrame) -> DataFrame:
    """Pit-stop count / avg / min duration per (race, driver) - the
    dashboard's pit-stop page."""
    return pit_stop.groupBy("race_id", "driver_id").agg(
        F.count("*").alias("n_stops"),
        F.round(F.avg("duration"), 3).alias("avg_duration"),
        F.min("duration").alias("min_duration"),
    )


def season_team_rollup(results: DataFrame, race: DataFrame) -> DataFrame:
    """Dashboard matrix rollup: points by (year, constructor) with
    subtotals - the Power BI year x team matrix as a ROLLUP."""
    r = results.join(
        F.broadcast(race.select(F.col("race_id").alias("raceId"), "date")), "raceId"
    ).withColumn("year", F.year("date"))
    return (
        r.rollup("year", "constructorId")
        .agg(F.sum("points").alias("total_points"), F.count("*").alias("n_results"))
        .orderBy(F.col("year").asc_nulls_first(), F.col("constructorId").asc_nulls_first())
    )
