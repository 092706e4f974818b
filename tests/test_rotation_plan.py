"""The committed driver-window rotation schedule (ROTATION.md, emitted
by ``tools/staleness.py --plan``) must keep every registered query's
driver-hash staleness ≤3 rounds — the rotation ceiling the round-6
VERDICT set.  With ~147 registered queries and a 50-slot window, only a
strict 3-round cycle achieves that, so the plan is load-bearing: these
tests fail if the registry outgrows 150 queries or the planned blocks
stop partitioning it.
"""

from __future__ import annotations

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

import staleness  # noqa: E402


@pytest.fixture(scope="module")
def state():
    os.chdir(ROOT)
    last = staleness.last_green(ROOT)
    names, front = staleness.registry_and_front()
    return names, front, last


def test_rotation_plan_partitions_registry(state):
    names, front, last = state
    plan = staleness.rotation_plan(names, front, last)
    blocks = [list(front)] + [plan[r] for r in sorted(plan)]
    flat = [q for b in blocks for q in b]
    assert len(flat) == len(set(flat)), "a query appears in two blocks"
    assert set(flat) == set(names), "plan must cover every registered query"
    assert all(len(b) <= staleness.WINDOW for b in blocks)


def test_rotation_plan_staleness_ceiling(state):
    names, front, last = state
    plan = staleness.rotation_plan(names, front, last)
    worst = staleness.simulate_staleness(names, front, last, plan)
    assert worst <= 3, (
        f"planned schedule lets a query go {worst} rounds without a "
        "driver hash row — rotate more aggressively or shrink the registry"
    )


def test_registry_fits_three_round_cycle(state):
    names, front, last = state
    assert len(names) <= 3 * staleness.WINDOW, (
        "registry outgrew the 3-round window cycle: adding queries now "
        "REQUIRES retiring or merging others to keep staleness <=3"
    )


def test_rotation_artifact_in_sync(state):
    """ROTATION.md is the committed artifact of --plan; a drifted copy
    would misdirect the next round's window pinning."""
    names, front, last = state
    plan = staleness.rotation_plan(names, front, last)
    text = open(os.path.join(ROOT, "ROTATION.md")).read()
    planned = {ln.strip() for ln in text.splitlines() if ln.startswith("  q")}
    assert planned == set(names), "regenerate: python tools/staleness.py --plan > ROTATION.md"
    for rnd, block in plan.items():
        assert f"round {rnd} ({len(block)}):" in text
