"""Skew-safe holistic aggregation (operators/aggregates.py)."""

from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.operators.aggregates import (
    salted_distinct_count,
)
from formula1_etl_analytics_project_spark.sources.readers import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_distinct_count_matches_plain(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    got = {
        r["l_returnflag"]: r["n_distinct"]
        for r in salted_distinct_count(
            li, ["l_returnflag"], "l_orderkey", buckets=8
        ).collect()
    }
    want = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert got == want


def test_salted_distinct_count_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", None), ("b", None)],
        "k string, v int",
    )
    rows = {
        r["k"]: r["n_distinct"]
        for r in salted_distinct_count(df, ["k"], "v", buckets=4).collect()
    }
    # NULL values are never counted, but an all-NULL key still yields
    # its 0 row - same as groupBy(k).agg(countDistinct(v)).
    assert rows == {"a": 1, "b": 0}


def test_salted_distinct_count_partial_groups_by_value_bucket(spark):
    """Phase 1 must group by (keys, _vbucket) so a hot key spreads;
    phase 2 groups by keys alone."""
    li = read_table(spark, SF_DIR, "lineitem")
    plan = (
        salted_distinct_count(li, ["l_returnflag"], "l_orderkey")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # phase 1 groups by (key, pmod(crc32(value))), phase 2 by key alone
    assert "pmod(crc32" in plan
    assert plan.count("Aggregate [l_returnflag") == 2


def _fp_row(spark, rows, n_parts):
    from formula1_etl_analytics_project_spark.operators.aggregates import (
        table_fingerprint,
    )

    df = spark.createDataFrame(rows, "a string, b string").repartition(n_parts)
    return table_fingerprint(df, ["a", "b"], "t").collect()[0]


def test_table_fingerprint_is_order_and_partition_insensitive(spark):
    rows = [(str(i), f"v{i % 7}") for i in range(200)]
    base = _fp_row(spark, rows, 1)
    shuffled = _fp_row(spark, list(reversed(rows)), 13)
    assert base == shuffled
    assert base["n_rows"] == 200


def test_table_fingerprint_detects_single_cell_change(spark):
    rows = [(str(i), "x") for i in range(50)]
    base = _fp_row(spark, rows, 4)
    mutated = _fp_row(spark, rows[:-1] + [("49", "y")], 4)
    assert (base["hash_sum"], base["hash_xor"]) != (
        mutated["hash_sum"],
        mutated["hash_xor"],
    )


def test_table_fingerprint_null_is_not_empty_string(spark):
    with_null = _fp_row(spark, [("k", None)], 1)
    with_empty = _fp_row(spark, [("k", "")], 1)
    assert with_null["hash_xor"] != with_empty["hash_xor"]


def test_hll_union_is_partition_invariant(spark):
    """The property sketch_rollup_gate (plans/catalog_r7.py) relies
    on: slicing the input two unrelated ways, sketching each slice,
    and unioning gives IDENTICAL estimates once both paths are
    guaranteed dense (NDV 50k >> k=4096 forces HLL mode on every
    path; registers merge by max, so both unions hold the same
    registers and the composite estimator agrees bit-for-bit). Near
    the sparse/dense boundary the LIST→SET→HLL promotion depends on
    merge history and the paths can disagree WITHIN the error bound
    — that regime is why the catalog gate is tolerance-based; and
    union-vs-DIRECT equality fails even when dense (HIP vs composite
    estimator), which is why neither gate compares against a
    directly-streamed sketch."""

    def union_nd(df, slicer):
        return (
            df.groupBy(slicer.alias("g"))
            .agg(F.hll_sketch_agg("v").alias("sk"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("nd"))
            .collect()[0]["nd"]
        )

    df = spark.range(0, 200000).select(
        F.col("id"), (F.col("id") % 50000).alias("v")
    )
    by_mod = union_nd(df, F.col("id") % 13)
    by_range = union_nd(df, (F.col("id") / 7000).cast("int"))
    assert by_mod == by_range
    assert abs(by_mod - 50000) <= 0.1 * 50000


def test_event_transitions_tiebreak_is_deterministic(spark):
    """Simultaneous events (identical user_id + ts) must order by
    event_id in the transition window - the total (ts, event_id)
    order is what makes the Markov matrix reproducible; without it
    the lead() result is partition-luck."""
    import datetime

    from pyspark.sql import Window

    t = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t, 10, "a"),
        (1, t, 11, "b"),  # same instant: event_id decides the order
        (1, t, 12, "c"),
        (1, datetime.datetime(2024, 1, 1, 13, 0, 0), 13, "d"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    for n_parts in (1, 7):
        got = sorted(
            (r["event_type"], r["nxt"])
            for r in df.repartition(n_parts)
            .select("event_type", F.lead("event_type").over(w).alias("nxt"))
            .collect()
        )
        assert got == [("a", "b"), ("b", "c"), ("c", "d"), ("d", None)]
