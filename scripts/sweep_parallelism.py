"""Full-catalog parallelism-invariance sweep.

tests/test_parallelism_invariance.py pins the 22 adversarially-chosen
order-sensitive entries on every suite run; this script runs the SAME
experiment over the ENTIRE catalog (each entry at 32 and at 5 shuffle
partitions, canonical frames must match exactly) as a round-level
audit. Any mismatch is a distributed-correctness bug by definition:
the result depended on the physical partitioning, which the driver's
harness and any real cluster are free to change.

Usage: python scripts/sweep_parallelism.py [--sf=DIR]
Prints one line per mismatch and a final tally; exit 1 on any.
"""

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
for a in sys.argv[1:]:
    if a.startswith("--sf="):
        SF_DIR = a.split("=", 1)[1]


def main() -> None:
    from formula1_etl_analytics_project_spark import oracle_harness as oh
    from formula1_etl_analytics_project_spark.plans.catalog import CATALOG
    from formula1_etl_analytics_project_spark.session import get_spark

    spark = get_spark(app_name="parallelism-sweep")
    key = "spark.sql.shuffle.partitions"
    bad, err = [], []
    for name, spec in CATALOG.items():
        try:
            spark.conf.set(key, "32")
            a = oh.canon_frame(oh.spark_df(spec.spark(spark, SF_DIR)))
            spark.conf.set(key, "5")
            b = oh.canon_frame(oh.spark_df(spec.spark(spark, SF_DIR)))
        except Exception as e:  # pragma: no cover
            err.append(name)
            print(f"ERR  {name}: {str(e)[:100]}")
            continue
        if a != b:
            bad.append(name)
            print(f"MISMATCH {name}: result depends on partitioning")
    print(
        f"{len(CATALOG) - len(bad) - len(err)} invariant, "
        f"{len(bad)} mismatched, {len(err)} errored "
        f"of {len(CATALOG)} entries"
    )
    sys.exit(1 if (bad or err) else 0)


if __name__ == "__main__":
    main()
