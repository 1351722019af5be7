"""Round-18 catalog entries (round 5) - the two conditional-aggregate
TPC-H queries the round-4 verdict flagged as claimed-by-shape only
(catalog_r17's mapping note): literal `sql_surface_q12` and
`sql_surface_q14` close the "Q1-Q22 literal except the 4
partsupp-blocked" statement exactly.

Both are SQL-surface entries: the SAME SQL text runs through
`spark.sql` (over registered temp views) and the DuckDB oracle, so
the entry pins the LANGUAGE shape, not a DataFrame translation.

Q12 column note: the driver testdata's lineitem carries no
l_shipmode / l_commitdate / l_receiptdate (reference DDL ships them;
TESTDATA.md's slice does not), so the literal spec text cannot bind.
The entry keeps Q12's exact clause skeleton - two-arm CASE counts on
o_orderpriority (verbatim from the spec), a small IN-list filter on
the grouping column, a cross-column date inequality, and a one-year
date window - with l_returnflag standing in for l_shipmode and
l_shipdate > o_orderdate for the late-line commit/receipt compare.
Q14 is fully literal (p_type LIKE 'PROMO%' binds as spec'd).

Portability rules as in plans/catalog.py: revenue terms are rounded
to DECIMAL(30,4) per row before the exact decimal sum, ratios divide
as IEEE doubles only at the end, counts cast to BIGINT (HUGEINT
trap), date window bounds are TIMESTAMP literals (the parquet date
columns are timestamp_ntz).

Importing this module registers everything into catalog.CATALOG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from formula1_etl_analytics_project_spark.plans.catalog import _register
from formula1_etl_analytics_project_spark.sources.readers import (
    register_views,
)

# ===========================================================================
# TPC-H Q12: shipping-priority two-arm conditional counts
# ===========================================================================

_Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                       OR o_orderpriority = '2-HIGH'
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                      AND o_orderpriority <> '2-HIGH'
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('R', 'A')
  AND l_shipdate > o_orderdate
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@_register(
    "sql_surface_q12",
    _Q12_SQL,
    tags=("sql", "join", "agg"),
    gate_priority=True,
)
def q_sql_surface_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority): per mode, count
    lines from high-priority vs low-priority orders - the canonical
    two-arm conditional aggregate (one pass, both arms from the same
    CASE column; the naive translation runs the join twice). Column
    mapping per the module docstring: the testdata lacks l_shipmode /
    l_commitdate / l_receiptdate, so l_returnflag carries the
    IN-list + GROUP BY role and l_shipdate > o_orderdate the
    cross-column late-line compare; the priority CASE arms are
    verbatim spec text.

    Shape at 100 TB: the single-column predicates (IN-list + one-year
    window) push into the parquet scan (pinned in
    tests/test_plan_quality_r18.py); the cross-column compare filters
    post-join rows before the aggregate; the join shuffles on the
    orderkey and the aggregate is map-side combinable to |modes| x 2
    cells. Nothing in the plan grows faster than the filtered fact.
    """
    register_views(spark, sf_dir)
    return spark.sql(_Q12_SQL)


# ===========================================================================
# TPC-H Q14: promotion revenue share (conditional-ratio aggregate)
# ===========================================================================

_Q14_SQL = """
SELECT 100.0
       * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                       THEN CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(30,4))
                       ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(30,4))) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@_register(
    "sql_surface_q14",
    _Q14_SQL,
    tags=("sql", "join", "agg"),
    gate_priority=True,
)
def q_sql_surface_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect), literal: the share of one month's
    revenue from PROMO-typed parts - a conditional-RATIO aggregate
    where numerator and denominator come out of ONE pass (two CASE
    sums), never two scans. Both sums are exact decimals (per-row
    terms rounded to DECIMAL(30,4), so partial-sum order cannot move
    the total in either engine); the division happens once, double vs
    double, bit-identical IEEE - the catalog's standard cross-engine
    ratio discipline.

    Shape at 100 TB: the one-month l_shipdate window prunes the fact
    scan (pushdown pinned in tests/test_plan_quality_r18.py); part is
    the small side - Catalyst broadcasts it at testdata scale, and at
    warehouse scale the partkey join co-partitions; output is a
    single cell.
    """
    register_views(spark, sf_dir)
    return spark.sql(_Q14_SQL)
