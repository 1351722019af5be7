"""Ad-hoc parity check for a subset of catalog entries (dev loop).

Usage: python scripts/check_new.py entry1 entry2 ... [--sf SF_DIR]
"""

import sys

sys.path.insert(0, "/root/repo")

import datetime
import math

import duckdb

SF_DIR = "/root/testdata/sf0.001"
args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
for a in sys.argv[1:]:
    if a.startswith("--sf="):
        SF_DIR = a.split("=", 1)[1]


def _norm_cell(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ncols = [cols[i] for i in order]
    nrows = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return ncols, nrows


def main():
    from pyspark.sql import SparkSession

    from formula1_etl_analytics_project_spark.plans.catalog import CATALOG
    from formula1_etl_analytics_project_spark.schemas import TESTDATA_TABLES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    names = args or [n for n in CATALOG]
    failed = []
    for name in names:
        spec = CATALOG[name]
        try:
            sdf = spec.spark(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = [tuple(r) for r in res.fetchall()]
            assert sorted(scols) == sorted(dcols), (
                f"cols spark={scols} duck={dcols}"
            )
            _, ns = _normalize(scols, srows)
            _, nd = _normalize(dcols, drows)
            assert len(ns) == len(nd), f"rows spark={len(ns)} duck={len(nd)}"
            diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            assert not diffs, f"first diffs {diffs}"
            print(f"OK   {name}: {len(ns)} rows")
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: {str(e)[:500]}")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
