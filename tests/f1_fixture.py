"""Back-compat shim: the F1 fixture generator moved into the package
(sources.fixture) so the ETL correctness-gate entries can stage it
outside the test tree."""

from formula1_etl_analytics_project_spark.sources.fixture import (  # noqa: F401
    COLUMNS,
    LAPS_PER,
    N_DRIVERS,
    N_RACES,
    N_TEAMS,
    make_rows,
    write_csv,
)
