"""Regenerate PARITY_SF01_r03.json: hash-compare every catalog entry
against its DuckDB oracle at sf0.1 (10x the driver's gate scale —
catches tie bugs that only appear once composite keys collide).

Usage: python scripts/refresh_parity.py [--sf=/root/testdata/sf0.1]
                                        [--out=PARITY_SF01_r03.json]
"""

import datetime
import hashlib
import json
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = "/root/testdata/sf0.1"
OUT = "PARITY_SF01_r03.json"
ONLY = None  # --only=a,b,c: sweep just these entries and MERGE into OUT
for a in sys.argv[1:]:
    if a.startswith("--sf="):
        SF_DIR = a.split("=", 1)[1]
    if a.startswith("--out="):
        OUT = a.split("=", 1)[1]
    if a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))


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


def _vhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    nrows = sorted(tuple(str(_norm_cell(r[i])) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in nrows:
        h.update(("|".join(r) + "\n").encode())
    return h.hexdigest()[:16]


def main():
    import __spark_entry__ as e
    from formula1_etl_analytics_project_spark.schemas import TESTDATA_TABLES
    from formula1_etl_analytics_project_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, osql = e.queries(), e.oracle_sql()
    if ONLY is not None:
        unknown = ONLY - set(qs)
        if unknown:
            raise SystemExit(f"--only names not in catalog: {sorted(unknown)}")
        qs = {n: f for n, f in qs.items() if n in ONLY}
    entries, n_matched = {}, 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(osql[name])
            drows = res.fetchall()
            match = _vhash(sdf.columns, srows) == _vhash(
                [d[0] for d in res.description], drows
            )
            entries[name] = {
                "rows": len(srows),
                "oracle_rows": len(drows),
                "match": match,
            }
        except Exception as ex:  # noqa: BLE001 - record, keep sweeping
            entries[name] = {"error": str(ex)[:300], "match": False}
            match = False
        n_matched += bool(match)
        print(("MATCH " if match else "MISMATCH ") + name, flush=True)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    if ONLY is not None:
        try:
            with open(OUT) as f:
                out = json.load(f)
        except (OSError, ValueError):
            out = {"sf": sf, "entries": {}}
        out["entries"].update(entries)
        out["n_entries"] = len(out["entries"])
        out["n_matched"] = sum(
            1 for v in out["entries"].values() if v.get("match")
        )
    else:
        out = {
            "sf": sf,
            "n_entries": len(qs),
            "n_matched": n_matched,
            "entries": entries,
        }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"{out['n_matched']}/{out['n_entries']} matched -> {OUT}", flush=True
    )


if __name__ == "__main__":
    main()
