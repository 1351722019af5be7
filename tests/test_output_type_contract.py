"""Catalog-wide OUTPUT TYPE CONTRACT — the Spark side of the sweep.

Three rounds, three instances of one bug class: an entry's OUTPUT
column carries a type the driver's pandas round-trip cannot digest —
HUGEINT (4 hash-red rows r03), a 9999-12-31 timestamp sentinel
(scd2_history err r03), and ARRAY<BIGINT> (pq_codes err r04, the
driver's raw-column ``sort_values`` crashes on unhashable list cells).
`scripts/sweep_oracle_types.py` guards the DuckDB twin; this test pins
the SPARK twin's declared schema for every catalog entry, so the class
cannot recur by construction from either side:

* no ArrayType / MapType / StructType — unhashable cells crash the
  driver's sort; arrays must be joined to strings at the boundary
  (the array_agg_orders idiom);
* no DecimalType — DuckDB ``.df()`` yields ``decimal.Decimal`` objects
  while Spark yields the same, but the two engines' scales rarely
  agree and the catalog convention is round-to-double at the boundary;
Timestamp RANGE (the scd2_history sentinel bug) cannot be checked from
the schema alone; it is covered by the executing parity sweep (pandas
raises OutOfBoundsDatetime, exactly like the driver) and by the value
checks in ``scripts/sweep_oracle_types.py``. TimestampNTZ itself is
driver-proven (the parquet date columns are NTZ and dozens of entries
carrying them are driver green).

Schema inspection is LAZY (``DataFrame.schema``), so this sweeps all
~234 entries in seconds — only entries whose *construction* runs jobs
(iterative fixpoints) cost more, at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF_DIR = "/root/testdata/sf0.001"

BANNED = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)
BANNED_NAMES = "ArrayType/MapType/StructType/DecimalType"


@pytest.mark.parametrize("spec", list(CATALOG.values()), ids=lambda s: s.name)
def test_output_schema_is_driver_compatible(spark, spec):
    schema = spec.spark(spark, SF_DIR).schema
    for field in schema.fields:
        assert not isinstance(field.dataType, BANNED), (
            f"{spec.name}.{field.name} is {field.dataType.simpleString()}: "
            f"{BANNED_NAMES} at the output boundary crashes or skews the "
            "driver's pandas canonicalization — join arrays to strings, "
            "round decimals to double"
        )
