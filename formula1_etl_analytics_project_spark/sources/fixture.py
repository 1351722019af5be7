"""Deterministic F1-shaped wide-CSV fixture (FIXTURES.md section A.1).

Generates the 66-column pre-joined input with every edge case the
reference's operators handle: '\\N' sentinels, malformed dates/times,
'+ss.mmm' gap times, duplicate keys (dedup targets), all-null
free-practice rows, embedded quotes.
"""

from __future__ import annotations

import csv
import random

from formula1_etl_analytics_project_spark.schemas import WIDE_F1_SCHEMA

COLUMNS = [f.name for f in WIDE_F1_SCHEMA.fields]

N_RACES = 4
N_DRIVERS = 5
N_TEAMS = 3
LAPS_PER = 3


def _base_row(race: int, driver: int, lap: int, rng: random.Random) -> dict:
    team = driver % N_TEAMS
    date = f"202{race % 4}-0{race + 1}-1{driver % 3}"
    return {
        "raceId": race,
        "date": date,
        "round": race + 1,
        "circuitId": race % 3,
        "circuitRef": f"circuit_{race % 3}",
        "name_x": f"Grand Prix {race % 3}",
        "location": f"City{race % 3}",
        "country": f"Country{race % 3}",
        "lat": round(40 + race, 4),
        "lng": round(2 + race, 4),
        "url_x": f"http://circuit/{race % 3}",
        "statusId": driver % 4,
        "status": ["Finished", "Engine", "+1 Lap", "Accident"][driver % 4],
        "driverId": driver,
        "forename": f"Fore{driver}",
        # embedded quote exercises C6 (no escaping needed in Spark)
        "surname": "O'Neil" if driver == 1 else f"Sur{driver}",
        "dob": "not-a-date" if driver == 4 else f"199{driver}-03-0{driver + 1}",
        "nationality": f"Nat{driver}",
        "url": f"http://driver/{driver}",
        "number": str(driver + 10),
        "constructorRef": f"team_{team}",
        "driverRef": f"driver_{driver}",
        "code": f"D{driver}",
        "constructorId": team,
        "name": f"Team {team}",
        "nationality_constructors": f"TNat{team}",
        "url_constructors": f"http://team/{team}",
        "fp1_date": date,
        "fp1_time": "11:30:00",
        "fp2_date": date,
        "fp2_time": "15:00:00",
        "fp3_date": r"\N",
        "fp3_time": "bad-time" if driver == 2 else "12:00:00",
        "quali_date": date,
        "quali_time": "14:00:00",
        "position": r"\N" if driver == 3 else str(driver + 1),
        "sprint_date": r"\N" if race % 2 else date,
        "sprint_time": "'10:30:00'" if driver == 0 else "10:30:00",
        "stop": str(lap % 2 + 1),
        "lap_pitstops": str(lap + 1),
        "time_pitstops": "13:0%d:22" % driver,
        "duration": ["21.0", "22.345", r"\N"][lap % 3],
        "milliseconds_pitstops": str(21000 + lap),
        "driverStandingsId": race * 100 + driver,
        "points_driverstandings": float((N_DRIVERS - driver) * (race + 1)),
        "position_driverstandings": driver + 1,
        "wins": 1 if driver == 0 else 0,
        "constructorStandingsId": race * 10 + team,
        "points_constructorstandings": float((N_TEAMS - team) * (race + 1)),
        "position_constructorstandings": team + 1,
        "wins_constructorstandings": 1 if team == 0 else 0,
        # race finish: winner gets clock time, others '+gap', some null
        "time": "1:30:05.123" if driver == 0 else (r"\N" if driver == 4 else f"+{5.478 + driver:.3f}"),
        "time_races": r"\N" if driver == 4 else ("1:30:05.123" if driver == 0 else f"+{5.478 + driver:.3f}"),
        "resultId": race * 1000 + driver,
        "positionOrder": driver + 1,
        "points": float(max(0, 25 - driver * 7)),
        "laps": LAPS_PER,
        "grid": (driver + 2) % N_DRIVERS + 1,
        "rank": r"\N" if driver == 3 else str(driver + 1),
        "fastestLap": str(lap + 40),
        "fastestLapTime": "garbage" if driver == 2 else f"1:2{driver}.45{driver}",
        "fastestLapSpeed": r"\N" if driver == 3 else f"{210.5 + driver}",
        "lap": str(lap + 1),
        "time_laptimes": f"1:3{driver}.99{lap}",
        "position_laptimes": str(driver + 1),
        "milliseconds_laptimes": str(90000 + driver * 1000 + lap),
    }


def make_rows() -> list[dict]:
    rng = random.Random(42)
    rows = []
    for race in range(N_RACES):
        for driver in range(N_DRIVERS):
            for lap in range(LAPS_PER):
                rows.append(_base_row(race, driver, lap, rng))
    # duplicate rows: exact dup (D1 target) + conflicting dup (keep-first)
    rows.append(dict(rows[0]))
    conflicting = dict(rows[3])
    conflicting["surname"] = "ShouldLose"  # same driverId, later file order
    rows.append(conflicting)
    # row with both time and time_races null -> F4 drop for time_dim
    both_null = dict(rows[6])
    both_null["time"] = r"\N"
    both_null["time_races"] = r"\N"
    rows.append(both_null)
    # free-practice all-null row -> F1 drop
    fp_null = dict(rows[9])
    for c in ("fp1_date", "fp1_time", "fp2_date", "fp2_time", "fp3_date", "fp3_time"):
        fp_null[c] = r"\N"
    rows.append(fp_null)
    return rows


def write_csv(path: str) -> str:
    with open(path, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=COLUMNS)
        writer.writeheader()
        writer.writerows(make_rows())
    return path


def write_csv_with_rowid(path: str) -> str:
    r"""Oracle twin of :func:`write_csv`: same rows plus an explicit
    ``_row_id`` file-order column. Spark captures file order with
    ``monotonically_increasing_id`` on the plain CSV; DuckDB 1.0 has no
    file_row_number for CSV scans, so the keep-first-in-file-order
    dedup semantics are restated against this column instead. Note the
    '\N' sentinels stay literal - the oracle decodes them with nullstr,
    exactly like the engine's reader."""
    rows = make_rows()
    for i, r in enumerate(rows):
        r["_row_id"] = i
    with open(path, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=COLUMNS + ["_row_id"])
        writer.writeheader()
        writer.writerows(rows)
    return path
