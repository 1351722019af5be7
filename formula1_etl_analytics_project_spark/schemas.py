"""Explicit schema declarations.

The reference infers schemas per-read with ``pd.read_csv`` and only
fixes types at the MSSQL sink (SURVEY.md section 1.2; reference
``DDL Final.sql:75-302``). Here every table has a declared
``StructType`` so scans never pay inference, the parquet/CSV readers
prune columns against a known contract, and the SQL surface exposes
stable types.

Type mapping notes (SURVEY.md section 1.3):
  * MSSQL ``time`` has no Spark equivalent -> ``StringType`` in
    ``HH:mm:ss[.fff]`` form at boundaries (matches the reference's own
    string formatting, ``CompleteETL.py:810``).
  * DB sequences (``SEQ_laps_id``/``SEQ_pits_id``) -> deterministic
    ``row_number()`` surrogate keys (plans.star).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# The 66-column wide (pre-joined) input table - SURVEY.md section 1.5.
# Integer-like columns that may carry the '\\N' sentinel arrive as strings
# and are cast after sentinel decoding; the CSV reader's nullValue handles
# the sentinel declaratively (reference: fpractice_etl.py:17 df.replace).
# ---------------------------------------------------------------------------


def _f(name: str, dtype: T.DataType) -> T.StructField:
    return T.StructField(name, dtype, nullable=True)


_S = T.StringType()
_I = T.IntegerType()
_D = T.DoubleType()

WIDE_F1_SCHEMA = T.StructType(
    [
        _f("raceId", _I),
        _f("date", _S),
        _f("round", _I),
        _f("circuitId", _I),
        _f("circuitRef", _S),
        _f("name_x", _S),
        _f("location", _S),
        _f("country", _S),
        _f("lat", _D),
        _f("lng", _D),
        _f("url_x", _S),
        _f("statusId", _I),
        _f("status", _S),
        _f("driverId", _I),
        _f("forename", _S),
        _f("surname", _S),
        _f("dob", _S),
        _f("nationality", _S),
        _f("url", _S),
        _f("number", _S),
        _f("constructorRef", _S),
        _f("driverRef", _S),
        _f("code", _S),
        _f("constructorId", _I),
        _f("name", _S),
        _f("nationality_constructors", _S),
        _f("url_constructors", _S),
        _f("fp1_date", _S),
        _f("fp1_time", _S),
        _f("fp2_date", _S),
        _f("fp2_time", _S),
        _f("fp3_date", _S),
        _f("fp3_time", _S),
        _f("quali_date", _S),
        _f("quali_time", _S),
        _f("position", _S),
        _f("sprint_date", _S),
        _f("sprint_time", _S),
        _f("stop", _S),
        _f("lap_pitstops", _S),
        _f("time_pitstops", _S),
        _f("duration", _S),
        _f("milliseconds_pitstops", _S),
        _f("driverStandingsId", _I),
        _f("points_driverstandings", _D),
        _f("position_driverstandings", _I),
        _f("wins", _I),
        _f("constructorStandingsId", _I),
        _f("points_constructorstandings", _D),
        _f("position_constructorstandings", _I),
        _f("wins_constructorstandings", _I),
        _f("time", _S),
        _f("time_races", _S),
        _f("resultId", _I),
        _f("positionOrder", _I),
        _f("points", _D),
        _f("laps", _I),
        _f("grid", _I),
        _f("rank", _S),
        _f("fastestLap", _S),
        _f("fastestLapTime", _S),
        _f("fastestLapSpeed", _S),
        _f("lap", _S),
        _f("time_laptimes", _S),
        _f("position_laptimes", _S),
        _f("milliseconds_laptimes", _S),
    ]
)

# ---------------------------------------------------------------------------
# Star-schema sink tables - SURVEY.md section 1.4 / reference DDL Final.sql.
# ---------------------------------------------------------------------------

STAR_SCHEMAS: dict[str, T.StructType] = {
    "date_dim": T.StructType(
        [_f("date", T.DateType()), _f("day", _I), _f("month", _I), _f("year", _I)]
    ),
    "location_dim": T.StructType(
        [
            _f("locationId", _I),
            _f("name_loc", _S),
            _f("circuitRef", _S),
            _f("location", _S),
            _f("country", _S),
            _f("lat", _D),
            _f("lng", _D),
            _f("url_location", _S),
        ]
    ),
    "status_dim": T.StructType([_f("statusId", _I), _f("statusDescription", _S)]),
    "driver": T.StructType(
        [
            _f("driverId", _I),
            _f("driverRef", _S),
            _f("constructorRef", _S),
            _f("number", _S),
            _f("code", _S),
            _f("forename", _S),
            _f("surname", _S),
            _f("dob", T.DateType()),
            _f("nationality", _S),
            _f("url_driver", _S),
            _f("age", _I),
        ]
    ),
    "team": T.StructType(
        [
            _f("constructorId", _I),
            _f("name_team", _S),
            _f("constructorRef", _S),
            _f("nationality_constructors", _S),
            _f("url_constructors", _S),
        ]
    ),
    "race": T.StructType(
        [
            _f("race_id", _I),
            _f("date", T.DateType()),
            _f("round", _I),
            _f("locationId", _I),
        ]
    ),
    "time_dim": T.StructType(
        [_f("raceId", _I), _f("race_duration", _S), _f("start_time", _S)]
    ),
    "sprint": T.StructType(
        [_f("raceId", _I), _f("sprint_date", T.DateType()), _f("sprint_time", _S)]
    ),
    "free_practice": T.StructType(
        [
            _f("raceId", _I),
            _f("fp1_date", T.DateType()),
            _f("fp1_time", _S),
            _f("fp2_date", T.DateType()),
            _f("fp2_time", _S),
            _f("fp3_date", T.DateType()),
            _f("fp3_time", _S),
        ]
    ),
    "qualification": T.StructType(
        [
            _f("race_id", _I),
            _f("driver_id", _I),
            _f("quali_date", T.DateType()),
            _f("quali_time", _S),
            _f("position", _I),
        ]
    ),
    "laps": T.StructType(
        [
            _f("lapsId", T.LongType()),
            _f("raceId", _I),
            _f("driver_id", _I),
            _f("laps", _I),
            _f("lap", _I),
            _f("time_laptimes", _S),
            _f("position_laptimes", _I),
            _f("milliseconds_laptimes", T.LongType()),
        ]
    ),
    "pit_stop": T.StructType(
        [
            _f("pitsId", T.LongType()),
            _f("race_id", _I),
            _f("driver_id", _I),
            _f("stop_number", _I),
            _f("lap_pitstops", _I),
            _f("time_pitstops", _S),
            _f("duration", _D),
            _f("milliseconds_pitstops", T.LongType()),
        ]
    ),
    "results": T.StructType(
        [
            _f("resultId", _I),
            _f("raceId", _I),
            _f("driverId", _I),
            _f("constructorId", _I),
            _f("position_order", _I),
            _f("points", _D),
            _f("laps", _I),
            _f("rank", _I),
            _f("fastestLap", _I),
            _f("fastestLapTime", _S),
            _f("fastestLapSpeed", _D),
            _f("statusId", _I),
            _f("grid", _I),
        ]
    ),
    "driver_standings": T.StructType(
        [
            _f("driverStandingsId", _I),
            _f("raceId", _I),
            _f("driverId", _I),
            _f("points_driverstandings", _D),
            _f("position_driverstandings", _I),
            _f("wins", _I),
        ]
    ),
    "team_standings": T.StructType(
        [
            _f("constructorStandingsId", _I),
            _f("constructorId", _I),
            _f("race_id", _I),
            _f("points_constructorstandings", _D),
            _f("position_constructorstandings", _I),
            _f("wins_constructorstandings", _I),
        ]
    ),
}

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/, TESTDATA.md). Schemas match
# the parquet footers; events.ts has shipped as TIMESTAMP(NANOS) (surfaced
# as LongType by the nanosAsLong conf) and as TIMESTAMP(MICROS, NTZ) -
# sources.readers.read_table normalizes either to session-UTC TIMESTAMP.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([_f("r_regionkey", _I), _f("r_name", _S)]),
    "nation": T.StructType(
        [_f("n_nationkey", _I), _f("n_name", _S), _f("n_regionkey", _I)]
    ),
    "customer": T.StructType(
        [
            _f("c_custkey", T.LongType()),
            _f("c_name", _S),
            _f("c_nationkey", _I),
            _f("c_acctbal", _D),
            _f("c_mktsegment", _S),
        ]
    ),
    "supplier": T.StructType(
        [
            _f("s_suppkey", T.LongType()),
            _f("s_name", _S),
            _f("s_nationkey", _I),
            _f("s_acctbal", _D),
        ]
    ),
    "part": T.StructType(
        [
            _f("p_partkey", T.LongType()),
            _f("p_name", _S),
            _f("p_brand", _S),
            _f("p_type", _S),
            _f("p_size", _I),
            _f("p_retailprice", _D),
        ]
    ),
    "orders": T.StructType(
        [
            _f("o_orderkey", T.LongType()),
            _f("o_custkey", T.LongType()),
            _f("o_orderstatus", _S),
            _f("o_totalprice", _D),
            _f("o_orderdate", T.TimestampType()),
            _f("o_orderpriority", _S),
        ]
    ),
    "lineitem": T.StructType(
        [
            _f("l_orderkey", T.LongType()),
            _f("l_partkey", T.LongType()),
            _f("l_suppkey", T.LongType()),
            _f("l_linenumber", _I),
            _f("l_quantity", _D),
            _f("l_extendedprice", _D),
            _f("l_discount", _D),
            _f("l_tax", _D),
            _f("l_returnflag", _S),
            _f("l_linestatus", _S),
            _f("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            _f("event_id", T.LongType()),
            _f("ts", T.TimestampType()),
            _f("user_id", T.LongType()),
            _f("event_type", _S),
            _f("value", _D),
            _f("props", _S),
        ]
    ),
    "documents": T.StructType(
        [
            _f("doc_id", T.LongType()),
            _f("text", _S),
            _f("lang", _S),
            _f("source", _S),
            _f("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            _f("vec_id", T.LongType()),
            _f("embedding", T.ArrayType(T.FloatType())),
            _f("label", _I),
        ]
    ),
}
