"""Catalog-wide PLAN SMELL contract — the plan-shape side of the
output-type contract (tests/test_output_type_contract.py).

Seven files of hand-pinned plan tests assert pushdown/broadcast/
partial-agg shapes for specific entries; this sweep asserts the two
smells that are NEVER acceptable at 100 TB across EVERY catalog
entry, so a future entry cannot regress silently:

* ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan; every
  Python crossing must be Arrow-batched (ArrowEvalPython / pandas
  UDFs / mapInPandas / MapInArrow).
* ``CartesianProduct`` — an unconditioned all-pairs join of
  data-scale inputs.

Both counts are ZERO across all entries today (verified by sweep),
so no allowlist exists — an entry that needs one has to argue its
case in this file. ``BroadcastNestedLoopJoin`` is deliberately NOT
banned: 32 entries legitimately cross k-row aggregate results
(scalar broadcasts — a 1-row normalizer against a fact table lowers
to BNLJ), which is the standard scalar-bind shape, bounded by the
broadcast side's k rows.

Plan inspection is construction-only (no execution) at sf0.001, so
the sweep covers all entries in about the same time as the type
contract. Iterative entries pay their fixpoint's build cost once.
"""

from __future__ import annotations

import pytest

from formula1_etl_analytics_project_spark.plans.catalog import CATALOG

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("spec", list(CATALOG.values()), ids=lambda s: s.name)
def test_plan_has_no_scale_smells(spark, spec):
    df = spec.spark(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan, (
        f"{spec.name}: row-at-a-time Python UDF in the plan - use a "
        "pandas UDF / mapInPandas / mapInArrow (Arrow-batched) instead"
    )
    assert "CartesianProduct" not in plan, (
        f"{spec.name}: CartesianProduct in the plan - an unconditioned "
        "all-pairs join of data-scale inputs cannot survive 100 TB; "
        "scalar crosses belong on k-row aggregate results (which lower "
        "to BroadcastNestedLoopJoin, allowed)"
    )
