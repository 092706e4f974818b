"""Committed plan-fingerprint ledger diff (round-11 VERDICT task 4).

The four registry gates (width / window / dup-UDF / cartesian,
tests/test_plan_widths.py) assert the ABSENCE of anti-patterns. Nothing
used to pin the POSITIVE plan shape: a refactor or a Spark upgrade that
silently drops a broadcast hint to a sort-merge join, or adds a
shuffle, passes every gate and surfaces only as a bench mystery two
rounds later. PLAN_FINGERPRINTS.json commits per-query
{shuffles, broadcast_joins, corpus_widths, expand, unpart_windows,
dup_udfs, cartesian} — stable scalar counts, no expression/node ids —
and this test diffs the live registry against it.

A diff here is not necessarily a bug. Update path after a REVIEWED
plan change:  python tools/plan_audit.py --snapshot   and commit the
ledger diff alongside the code change that caused it.

Determinism was verified at introduction: two snapshots from separate
fresh sessions produced byte-identical ledgers (149/149).
"""

from __future__ import annotations

import json
import os

import pytest

import __spark_entry__ as entrymod
from setu_spark.plans.inspect import plan_fingerprint

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER_PATH = os.path.join(ROOT, "PLAN_FINGERPRINTS.json")

UPDATE_HINT = (
    "after REVIEWING the plan change, regenerate with "
    "`python tools/plan_audit.py --snapshot` and commit the diff"
)


@pytest.fixture(scope="module")
def ledger():
    with open(LEDGER_PATH) as fh:
        return json.load(fh)


def test_ledger_covers_exactly_the_registry(ledger):
    registered = set(entrymod.queries())
    pinned = set(ledger["fingerprints"])
    assert pinned == registered, (
        f"ledger out of sync with registry: missing={sorted(registered - pinned)} "
        f"stale={sorted(pinned - registered)}; {UPDATE_HINT}"
    )


def test_ledger_has_no_error_entries(ledger):
    broken = {
        k: v for k, v in ledger["fingerprints"].items() if "error" in v
    }
    assert not broken, (
        f"ledger recorded plan-construction errors: {broken}; fix the "
        f"queries, then {UPDATE_HINT}"
    )


def test_every_registered_plan_matches_its_fingerprint(spark, ledger):
    """The load-bearing diff: recompute every query's fingerprint at the
    ledger's own sf_dir and compare. Reported all-at-once so one
    refactor that moves five plans shows the full blast radius."""
    sf_dir = ledger["sf_dir"]
    pinned = ledger["fingerprints"]
    drifted = {}
    for name, fn in sorted(entrymod.queries().items()):
        try:
            now = plan_fingerprint(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            now = {"error": type(exc).__name__}
        finally:
            spark.catalog.clearCache()
        if now != pinned.get(name):
            drifted[name] = {"pinned": pinned.get(name), "now": now}
    assert not drifted, (
        f"{len(drifted)} plan fingerprints drifted from the committed "
        f"ledger: {drifted}; {UPDATE_HINT}"
    )
