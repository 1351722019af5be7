"""Blocked fuzzy linkage, funnel, and approx-gate semantics
(operators/linkage.py; catalog entries fuzzy_name_pairs /
event_funnel / approx_agg_gate)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.operators.linkage import (
    blocked_edit_pairs,
    funnel_first_times,
    normalize_name,
)

SF = "/root/testdata/sf0.001"


def _last_tok(n):
    return F.split(n, " ").getItem(1)


def _first_tok(n):
    return F.split(n, " ").getItem(0)


class TestBlockedEditPairs:
    def test_finds_typo_pairs_within_block(self, spark):
        df = spark.createDataFrame(
            [("cold bolt",), ("old bolt",), ("red gear",), ("red bear",)],
            ["name"],
        )
        pairs = blocked_edit_pairs(
            df, "name", blockers=(_last_tok,), max_dist=2
        ).collect()
        got = {(r.left_name, r.right_name, r.edit_dist) for r in pairs}
        assert ("cold bolt", "old bolt", 1) in got
        # 'red gear'/'red bear' share the FIRST token but not the last:
        # the last-token blocker alone misses them (blocking trade-off).
        assert not any("bear" in l or "bear" in r for l, r, _ in got)

    def test_union_of_blockers_recovers_cross_block_pairs(self, spark):
        df = spark.createDataFrame(
            [("red gear",), ("red bear",), ("cold bolt",)], ["name"]
        )
        pairs = blocked_edit_pairs(
            df, "name", blockers=(_last_tok, _first_tok), max_dist=2
        ).collect()
        got = {(r.left_name, r.right_name) for r in pairs}
        assert ("red bear", "red gear") in got

    def test_pairs_run_on_distinct_vocabulary_not_rows(self, spark):
        # 100 copies of each name must still yield exactly one pair.
        rows = [("cold bolt",), ("old bolt",)] * 100
        df = spark.createDataFrame(rows, ["name"])
        pairs = blocked_edit_pairs(
            df, "name", blockers=(_last_tok,), max_dist=2
        ).collect()
        assert len(pairs) == 1

    def test_normalization_collapses_case_and_whitespace(self, spark):
        df = spark.createDataFrame(
            [("  Cold   Bolt ",), ("old bolt",)], ["name"]
        )
        pairs = blocked_edit_pairs(
            df, "name", blockers=(_last_tok,), max_dist=2
        ).collect()
        assert {(r.left_name, r.right_name) for r in pairs} == {
            ("cold bolt", "old bolt")
        }
        norm = df.select(normalize_name("name").alias("n")).collect()
        assert {r.n for r in norm} == {"cold bolt", "old bolt"}

    def test_block_join_is_not_cartesian(self, spark):
        df = spark.createDataFrame([("cold bolt",), ("old bolt",)], ["name"])
        out = blocked_edit_pairs(df, "name", blockers=(_last_tok,))
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestFunnel:
    def _events(self, spark, rows):
        t0 = datetime.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [
                (u, t, t0 + datetime.timedelta(minutes=m))
                for u, t, m in rows
            ],
            ["user_id", "event_type", "ts"],
        )

    def test_in_order_completion(self, spark):
        ev = self._events(
            spark, [(1, "view", 0), (1, "click", 5), (1, "purchase", 9)]
        )
        steps = [
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ]
        row = funnel_first_times(ev, "user_id", "ts", steps).collect()[0]
        assert row.t_view.minute == 0
        assert row.t_click.minute == 5
        assert row.t_purchase.minute == 9

    def test_out_of_order_steps_do_not_count(self, spark):
        # user 2 clicks BEFORE their first view: not a funnel click;
        # user 3 clicks before AND after - only the later click counts.
        ev = self._events(
            spark,
            [
                (2, "click", 0),
                (2, "view", 5),
                (3, "click", 0),
                (3, "view", 5),
                (3, "click", 8),
            ],
        )
        steps = [
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
        ]
        out = {
            r.user_id: r
            for r in funnel_first_times(ev, "user_id", "ts", steps).collect()
        }
        assert out[2].t_click is None
        assert out[3].t_click.minute == 8

    def test_user_without_first_step_is_absent(self, spark):
        ev = self._events(spark, [(4, "click", 0)])
        steps = [
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
        ]
        assert funnel_first_times(ev, "user_id", "ts", steps).count() == 0


class TestApproxGate:
    def test_gate_is_empty_and_bounds_are_tight_in_practice(self, spark):
        from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

        assert CATALOG["approx_agg_gate"].spark(spark, SF).count() == 0
        # The gate's 15% NDV bound is generous by design; pin the
        # observed error much tighter so silent sketch regressions
        # surface here long before they near the gate bound.
        from formula1_etl_analytics_project_spark.sources.readers import (
            read_table,
        )

        g = (
            read_table(spark, SF, "events")
            .groupBy("event_type")
            .agg(
                F.countDistinct("user_id").alias("exact"),
                F.approx_count_distinct("user_id", 0.05).alias("approx"),
            )
            .collect()
        )
        for r in g:
            assert abs(r.approx - r.exact) <= 0.05 * r.exact + 1

    def test_gate_is_deterministic(self, spark):
        from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

        a = CATALOG["approx_agg_gate"].spark(spark, SF).collect()
        b = CATALOG["approx_agg_gate"].spark(spark, SF).collect()
        assert a == b == []
