"""Pins the driver-gate sample rotation (VERDICT.md round 2, task 1).

The driver's correctness gate cross-checks exactly the FIRST 50 keys of
``__spark_entry__.queries()`` against DuckDB. Registration order alone
left 44 catalog entries without a driver row after two rounds, so
``plans.catalog.gate_order()`` rotates them to the front. These tests
pin that contract so a refactor cannot silently push an unsampled entry
back out of the gate.
"""

from __future__ import annotations

import json
import pathlib

from formula1_etl_analytics_project_spark.plans import catalog

REPO = pathlib.Path(__file__).resolve().parent.parent


def _ever_green() -> set[str]:
    """Entries with an all-three-green driver row in any past round."""
    green: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


def test_gate_order_covers_every_catalog_entry_once():
    order = catalog.gate_order()
    assert sorted(order) == sorted(catalog.CATALOG)
    assert len(order) == len(set(order))


def test_queries_and_oracles_iterate_in_gate_order():
    import __spark_entry__ as entry

    order = catalog.gate_order()
    assert list(entry.queries()) == order
    oracle_keys = list(entry.oracle_sql())
    assert oracle_keys == [n for n in order if catalog.CATALOG[n].oracle]


def test_first_50_samples_the_unverified_entries_first():
    """The driver checks the first 50 keys; every slot must count.
    Never-green entries (plus the verdict-pinned stale-green pair) fill
    the window before ANY entry that already has a green driver row."""
    order = catalog.gate_order()[:50]
    green = _ever_green()
    must_sample = (set(catalog.CATALOG) - green) | (
        set(catalog._GATE_PIN) & set(catalog.CATALOG)
    )
    if len(must_sample) >= 50:
        # Backlog exceeds the window: all 50 slots must be rotation
        # targets — a green, unpinned entry inside the window wastes one.
        wasted = [n for n in order if n not in must_sample]
        assert not wasted, f"gate slots wasted on already-green entries: {wasted}"
    else:
        overflow = must_sample - set(order)
        assert not overflow, (
            f"unsampled entries pushed outside the driver gate: {sorted(overflow)}"
        )


def test_gate_order_prefers_stalest_green_rows_after_backlog():
    """Once the never-green backlog clears, rotation continues by ledger
    staleness: among already-green unpinned entries, one whose last green
    row is older must never sort after a fresher one."""
    ledger = catalog._driver_ledger()
    order = catalog.gate_order()
    pinned = set(catalog._GATE_PIN) | set(catalog._GATE_PRIORITY_DYNAMIC)
    rounds = [
        ledger[n] for n in order if n in ledger and n not in pinned
    ]
    assert rounds == sorted(rounds)


def test_new_gate_priority_entries_land_in_first_50():
    """Priority entries claim a gate slot only while never-green: once
    the driver has confirmed one, it must NOT keep occupying the window
    (round 3's unfiltered front block would have wasted 31 of round 4's
    50 slots on already-green entries — the r03 verdict's task 2)."""
    ledger = catalog._driver_ledger()
    window = catalog.gate_order()[:50]
    for name in catalog._GATE_PRIORITY_DYNAMIC:
        if name in ledger:
            assert name not in window, (
                f"{name} is already driver-green and must cede its slot"
            )
        else:
            assert name in window, name


def test_green_pinned_entries_cede_their_front_slot():
    ledger = catalog._driver_ledger()
    window = catalog.gate_order()[:50]
    never_green_backlog = len(set(catalog.CATALOG) - set(ledger))
    if never_green_backlog >= 50:
        for name in catalog._GATE_PIN:
            if name in ledger:
                assert name not in window, name
