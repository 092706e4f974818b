"""Registry-wide plan-width gate — the q28-class regression net.

A scale-killer can cost 3s at sf0.1 and ~195s at 60M rows (q28's
mixed-distinct aggregate carried the HLL++ buffer as ~1600 columns per
row through its FIRST exchange), so test-scale wall-clock cannot catch
the class; plan shape can. This asserts EVERY corpus-volume exchange
of every registered query — any shuffle whose input descends from a
raw scan with no row-bounding node (aggregate / limit) in between, in
ANY branch of the plan — stays narrow. (Round-7 ADVICE: gating only
the first detail-section exchange would let a q28-class buffer ride
the second branch of a join unchecked.) Exchanges over
already-aggregated rows may be legitimately wide and are not gated
(tools/plan_audit.py prints the full per-query width profile for
humans).
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from setu_spark.plans.inspect import corpus_exchange_widths

SF_DIR = "/root/testdata/sf0.001"

#: wide enough for honest multi-metric aggregates; a sketch buffer
#: riding a per-row exchange is two orders of magnitude past it
MAX_CORPUS_EXCHANGE_WIDTH = 24


def test_q151_collapsed_branch_is_narrow(spark):
    """q151's registered plan dispatches on duplicate density; every
    testdata SF is duplicate-free so the main gate only ever sees the
    raw branch. Gate the collapsed branch explicitly — it is the one
    that runs on the corpora where width matters."""
    from setu_spark.operators.dedup import _q151_collapsed

    widths = corpus_exchange_widths(_q151_collapsed(spark, SF_DIR))
    spark.catalog.clearCache()
    assert not widths or max(widths) <= MAX_CORPUS_EXCHANGE_WIDTH, widths


def test_every_corpus_volume_exchange_is_narrow(spark):
    offenders = {}
    for name, fn in sorted(entrymod.queries().items()):
        widths = corpus_exchange_widths(fn(spark, SF_DIR))
        spark.catalog.clearCache()
        if widths and max(widths) > MAX_CORPUS_EXCHANGE_WIDTH:
            offenders[name] = widths
    assert not offenders, (
        "corpus-volume exchanges carrying wide buffers (q28 class): "
        f"{offenders}"
    )
