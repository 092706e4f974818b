"""Distributed CC one decade up (round-12 VERDICT task 7).

The pointer-jump loop has committed evidence at 1M edges / 200k
length-5 chains (3 rounds / 18.8s, PERF.md round 8) and on a single
diameter-9999 chain (14 rounds — the O(log d) regime; the 1-hop loop
could never finish inside any sane cap). This suite probes one decade
up, where a regression to O(diameter) rounds or an accidental
local-path dispatch actually SHOWS:

  * 10M edges / 2M length-5 chains / 12M nodes — round count must stay
    at the diameter-bound 3 (rounds scale with diameter, not edge
    volume), the distributed path must dispatch (10M ≫ the 500k
    local_edge_bound), and the output must satisfy the exact component
    invariants (2M components, every size 6, label = min node id)
    checked DISTRIBUTEDLY — no 12M-row collect.
  * a single diameter-20000 chain — one doubling past the committed
    9999-chain probe: the jump regime needs ~+1 round (≤16), while an
    O(diameter) regression needs 20000 rounds and trips the
    max_iterations raise long before.

Marked slow: the two graphs cost ~2-4 min together on local[32]; the
suite runs under SETU_SLOW=1 only. Wall/rounds land in PERF.md round
13.
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SETU_SLOW"),
    reason="decade-up CC stress is slow; set SETU_SLOW=1 to run",
)

N_EDGES = 10_000_000
CHAIN_LEN = 5  # edges per chain -> 6 nodes, diameter 5


def _chain_graph(spark, n_edges: int):
    """n_edges/CHAIN_LEN disjoint length-CHAIN_LEN chains: edge e of
    chain j = (6j+p, 6j+p+1). Odd edges are emitted REVERSED so the
    canonicalization path (least/greatest before distinct) does real
    work, mirroring LSH output that lists both orientations."""
    j = F.floor(F.col("id") / CHAIN_LEN)
    flip = F.col("id") % 2 == 0
    u = F.col("id") + j
    v = F.col("id") + j + 1
    return spark.range(n_edges).select(
        F.when(flip, u).otherwise(v).alias("id_a"),
        F.when(flip, v).otherwise(u).alias("id_b"),
    )


def test_ten_million_edge_chains(spark):
    import setu_spark.operators.dedup as dd

    n_chains = N_EDGES // CHAIN_LEN
    pairs = _chain_graph(spark, N_EDGES)
    t0 = time.perf_counter()
    labels = dd.connected_components(pairs)
    # exact invariants, computed distributedly: component count, every
    # size = 6, and label = min member id (the survivor contract)
    stats = labels.groupBy("component").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("lo")
    )
    bad = stats.filter(
        (F.col("n") != CHAIN_LEN + 1) | (F.col("lo") != F.col("component"))
    ).count()
    n_comp = stats.count()
    n_nodes = labels.count()
    wall = time.perf_counter() - t0
    print(
        f"\n[cc-stress] 10M edges: {dd.LAST_CC_ROUNDS} rounds, "
        f"{wall:.1f}s, {n_comp} components"
    )
    assert bad == 0
    assert n_comp == n_chains
    assert n_nodes == n_chains * (CHAIN_LEN + 1)
    # the distributed path must have dispatched (rounds instrumented),
    # and the jump regime holds: diameter-5 graphs converge in 3
    # rounds regardless of edge volume — a 4th round at 10M edges
    # means the jump or the convergence fold regressed
    assert dd.LAST_CC_ROUNDS == 3, dd.LAST_CC_ROUNDS


def test_diameter_twenty_thousand_chain(spark):
    import setu_spark.operators.dedup as dd

    n = 20_000  # edges; diameter-20000 path, nodes 0..20000
    chain = spark.range(n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    t0 = time.perf_counter()
    labels = dd.connected_components(
        chain, max_iterations=25, local_edge_bound=0
    )
    one = labels.groupBy("component").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("lo")
    ).collect()
    wall = time.perf_counter() - t0
    print(
        f"\n[cc-stress] diameter-20000: {dd.LAST_CC_ROUNDS} rounds, "
        f"{wall:.1f}s"
    )
    assert len(one) == 1
    assert one[0].n == n + 1 and one[0].lo == 0 == one[0].component
    # one doubling past the committed diameter-9999 probe (14 rounds):
    # the O(log d) regime needs ~15; an O(d) regression needs 20000
    assert dd.LAST_CC_ROUNDS <= 16, dd.LAST_CC_ROUNDS
