"""operators.intervals: the sweep-line interval union vs brute force.

Property: for random per-key interval sets, ``covered_length`` must
equal the union measure computed by brute-force point accounting, and
the island count must equal the number of maximal overlapping groups.
Includes the chain-swallow case (one long interval covering several
later short ones) that breaks lag(e)-based implementations.
"""

from __future__ import annotations

import random

from pyspark.sql import Row

from formula1_etl_analytics_project_spark.operators.intervals import (
    covered_length,
    interval_islands,
)


def _brute_union(intervals):
    """Exact union measure + island count via sorted sweep."""
    ivs = sorted(intervals)
    total, n_islands = 0, 0
    cur_s, cur_e = None, None
    for s, e in ivs:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
            n_islands += 1
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return n_islands, total


def test_random_intervals_match_brute_force(spark):
    rng = random.Random(20260814)
    rows, want = [], {}
    rid = 0
    for key in range(25):
        ivs = []
        for _ in range(rng.randint(1, 40)):
            s = rng.randint(0, 1000)
            e = s + rng.randint(1, 120)
            ivs.append((s, e))
            rows.append(Row(k=key, rid=rid, s=s, e=e))
            rid += 1
        want[key] = _brute_union(ivs)
    df = spark.createDataFrame(rows).repartition(8)
    got = {
        r["k"]: (r["n_islands"], r["covered"])
        for r in covered_length(df, ["k"], "s", "e", "rid").collect()
    }
    assert got == want


def test_long_interval_swallows_chain(spark):
    """[0,100) covers [10,20) and [30,40); [90,150) extends the island;
    [200,210) starts a new one. lag(e)-based logic would wrongly split
    after [30,40) because 90 > 40."""
    rows = [
        Row(k=1, rid=i, s=s, e=e)
        for i, (s, e) in enumerate(
            [(0, 100), (10, 20), (30, 40), (90, 150), (200, 210)]
        )
    ]
    df = spark.createDataFrame(rows)
    islands = {
        (r["st"], r["en"])
        for r in interval_islands(df, ["k"], "s", "e", "rid").collect()
    }
    assert islands == {(0, 150), (200, 210)}


def test_touching_intervals_merge(spark):
    """Half-open [0,10) + [10,20) merge into one island of extent 20."""
    rows = [Row(k=1, rid=0, s=0, e=10), Row(k=1, rid=1, s=10, e=20)]
    out = covered_length(
        spark.createDataFrame(rows), ["k"], "s", "e", "rid"
    ).collect()
    assert (out[0]["n_islands"], out[0]["covered"]) == (1, 20)
