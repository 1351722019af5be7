"""Round-38 catalog entry (round 7) - schema-evolution MERGE, the J3
family's untested seam closed:

* `upsert_schema_evolution` - a partitioned MERGE whose incoming
  batch carries a column the snapshot has never seen. The reference's
  orphaned `MERGE INTO` experiment (SURVEY.md J3) has no evolution
  story at all; Delta/Iceberg solve it with `mergeSchema`-on-MERGE.
  This entry composes the repo's two existing halves - partition-
  pruned `upsert_parquet_partitioned` (sources/sinks.py) and the
  mixed-schema `mergeSchema` scan (`schema_evolution_scan`,
  plans/catalog_ext.py) - into the end-to-end lake pattern: only the
  touched partitions are rewritten with the widened schema, untouched
  partition directories keep their old files, and the read side
  unifies them with NULL-fill.

Importing this module registers everything into catalog.CATALOG.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from formula1_etl_analytics_project_spark.plans.catalog import _dsum, _register
from formula1_etl_analytics_project_spark.plans.catalog_ext import _stage_dir
from formula1_etl_analytics_project_spark.sources.readers import read_table

# Only status-'F' orders are touched, so only the F partition is
# rewritten with the new column: the O and P directories stay on the
# original schema, which is exactly the mixed-schema lake the
# mergeSchema read must reconcile. The oracle restates base-plus-
# updates from the base table, so the merge, the NULL-fill, and the
# new column's values are all value-checked per partition.
_UPSERT_EVO_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' AND o_orderkey % 500 = 0
                          THEN o_totalprice + 10000
                          ELSE o_totalprice END AS DECIMAL(30,4)))
            AS DOUBLE) AS total_price,
       CAST(COUNT(CASE WHEN o_orderstatus = 'F' AND o_orderkey % 500 = 0
                       THEN 1 END) AS BIGINT) AS n_tagged,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' AND o_orderkey % 500 = 0
                     THEN o_orderkey % 7 END) AS BIGINT) AS sum_tag
FROM orders
GROUP BY o_orderstatus
"""


@_register("upsert_schema_evolution", _UPSERT_EVO_SQL, tags=("sink", "merge", "schema"))
def q_upsert_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution MERGE through a real write/read round-trip:
    orders are snapshotted partitioned by status, then a batch bumping
    every 500th 'F' order's price AND introducing a brand-new
    ``priority_code`` column is merged with ``evolve_schema=True``.
    Dynamic overwrite rewrites ONLY the F partition (now on the
    widened schema, NULL ``priority_code`` for its un-updated rows);
    O and P keep their original files, so the final scan needs
    ``mergeSchema`` and must NULL-fill the column for those
    partitions. The oracle restates base-plus-updates directly from
    the base table - counts, exact-decimal totals, and the new
    column's tagged count/sum per partition - so a merge that widened
    the wrong rows, dropped the column, or rewrote an untouched
    partition hash-mismatches.

    Shape at 100 TB: identical to `upsert_partitioned_orders` - the
    partition-pruned MERGE reads and rewrites only partitions named
    by the incoming batch (one tiny distinct on the partition column);
    evolution adds zero IO because widening is metadata (a NULL-typed
    column on the plan, no data-column scan), and history is never
    rewritten - old partitions stay byte-identical, which is the only
    evolution strategy that survives a 100 TB table."""
    from formula1_etl_analytics_project_spark.sources.sinks import (
        upsert_parquet_partitioned,
        write_parquet,
    )

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap = os.path.join(_stage_dir(sf_dir, "upsertevo", "orders"), "snap")
    # fresh snapshot every call: the entry checks the MERGE, so the
    # starting state must be the base table, not a previous merge
    write_parquet(orders, snap, partition_by=["o_orderstatus"])
    incoming = (
        orders.filter(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 500 == 0)
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + 10000)
        .withColumn("priority_code", (F.col("o_orderkey") % 7).cast("long"))
    )
    upsert_parquet_partitioned(
        spark,
        incoming,
        snap,
        keys=["o_orderkey"],
        partition_col="o_orderstatus",
        evolve_schema=True,
    )
    merged = spark.read.option("mergeSchema", True).parquet(snap)
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        _dsum(F.col("o_totalprice"), "total_price"),
        F.count("priority_code").alias("n_tagged"),
        F.sum("priority_code").alias("sum_tag"),
    )
