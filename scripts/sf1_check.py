"""Per-entry sf1 parity check with an oracle watchdog.

`refresh_parity.py` assumes the DuckDB oracle finishes; at sf1 a few
oracles are honestly intractable (recursive-CTE closures, exact
pair-join truths) and would hang a sweep for its full outer timeout.
This runner bounds the oracle with duckdb's cross-thread
``interrupt()`` so every entry terminates with an honest record:

* ``match: true``            - full driver-faithful compare passed
* ``oracle_timeout_sec: N``  - Spark side produced rows; oracle did
                               not finish its budget (recorded with
                               the Spark row count)
* ``error: ...``             - Spark-side failure (the interesting
                               case the round-6 sweep left unresolved)

DuckDB memory is capped (default 24 GB) so an oracle can never OOM
the box out from under the Spark JVM sharing it.

Usage:
  python scripts/sf1_check.py entry [entry ...]
      [--sf=/root/repo/testdata_sf1] [--out=FILE.json]
      [--oracle-budget=300]

With --out the result MERGES into the existing file (refresh_parity
artifact layout), so per-entry fresh-process loops accumulate into
one artifact.
"""

import json
import sys
import threading

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = "/root/repo/testdata_sf1"
OUT = None
BUDGET = 300
names = []
for a in sys.argv[1:]:
    if a.startswith("--sf="):
        SF_DIR = a.split("=", 1)[1]
    elif a.startswith("--out="):
        OUT = a.split("=", 1)[1]
    elif a.startswith("--oracle-budget="):
        BUDGET = int(a.split("=", 1)[1])
    elif not a.startswith("--"):
        names.append(a)


def main():
    import __spark_entry__ as e
    from formula1_etl_analytics_project_spark import oracle_harness as oh
    from formula1_etl_analytics_project_spark.schemas import TESTDATA_TABLES
    from formula1_etl_analytics_project_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, osql = e.queries(), e.oracle_sql()
    unknown = set(names) - set(qs)
    if unknown:
        raise SystemExit(f"unknown entries: {sorted(unknown)}")

    entries = {}
    for name in names:
        fn = qs[name]
        # ---- Spark side first: this is the side the round-6 sweep
        # left in an error state; its outcome is the finding.
        try:
            sdf = oh.spark_df(fn(spark, SF_DIR))
        except Exception as ex:  # noqa: BLE001 - record, keep sweeping
            entries[name] = {"error": str(ex)[:300], "match": False}
            print(f"SPARK-ERROR {name}", flush=True)
            continue
        if name not in osql:
            entries[name] = {
                "rows": len(sdf),
                "match": True,
                "rows_only": True,
            }
            print(f"ROWS-ONLY {name} ({len(sdf)})", flush=True)
            continue
        # ---- Oracle under the watchdog.
        timer = threading.Timer(BUDGET, con.interrupt)
        timer.start()
        try:
            ddf = oh.duck_df(con, osql[name])
        except duckdb.Error:
            entries[name] = {
                "rows": len(sdf),
                "match": False,
                "oracle_timeout_sec": BUDGET,
            }
            print(f"ORACLE-TIMEOUT {name} (spark rows={len(sdf)})", flush=True)
            continue
        finally:
            timer.cancel()
        rep = oh.compare_frames(sdf, ddf)
        match = rep["rows_match"] and rep["schema_match"] and rep["hash_match"]
        entries[name] = {
            "rows": rep["spark_rows"],
            "oracle_rows": rep["oracle_rows"],
            "match": match,
        }
        if not match:
            entries[name]["first_diffs"] = rep["first_diffs"]
        print(("MATCH " if match else "MISMATCH ") + name, flush=True)

    if OUT:
        try:
            with open(OUT) as f:
                out = json.load(f)
        except (OSError, ValueError):
            sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
            out = {"sf": sf, "entries": {}}
        out["entries"].update(entries)
        out["n_entries"] = len(out["entries"])
        out["n_matched"] = sum(
            1 for v in out["entries"].values() if v.get("match")
        )
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
        print(f"merged -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
