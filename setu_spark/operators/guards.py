"""Loud scale guards shared by the pair-listing near-dup queries.

The pair-LISTING queries (q52 MinHash+LSH, q55 embedding bands, q57
SimHash bands) are inherently quadratic in copy count: their ANSWER is
the pair set, and a k-clique of duplicates contributes C(k,2) rows no
matter how the candidates are generated (the q57 precedent — see
PERF.md round-10 duplicate-density audit). That is correct semantics,
but unlike q126's Y-side collect (``similarity.MINE_Y_BOUND``) nothing
used to fail loudly when a duplicate-dense corpus made the pair table
explode: the band self-join would just quietly shuffle billions of
rows. This module is the missing mechanical contract (round-10 VERDICT
task 4): ONE scalar aggregate over the band table estimates the
candidate pair volume as sum of C(bucket_size, 2), and past the budget
the query raises with a pointer at the per-vector (linear-output)
forms instead of melting the cluster.

The gate rides INSIDE the query plan (broadcast 1-row aggregate +
``assert_true``), not as an eager driver action: an up-front
``.first()`` added a whole blocking job per invocation (+30% on
q52/q57 at sf0.1, measured), while the in-plan form shares the cached
band scan, map-combines the bucket counts (the shuffle moves per-key
partial counts, not band rows), and costs ~nothing. The failure
surfaces at materialization as a SparkRuntimeException carrying the
full message — as loud as a constructor raise, at the moment the
explosion would otherwise start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Hard ceiling on ESTIMATED candidate pairs for the pair-listing
#: queries. 50M pairs ≈ 1.2 GB of (id, id, score) output — already an
#: answer no human consumer of a pair LIST wants, and ~2500× the pair
#: volume of the stock sf0.1 corpus; every honest use past this size
#: wants the per-vector forms (q123 semantic dedup, q125 dedup-impact
#: audit, q56 components) whose output is linear in the corpus. Like
#: MINE_Y_BOUND, deliberately far above anything a test corpus
#: produces and far below anything that hurts a cluster.
PAIR_BUDGET = 50_000_000


def pair_budget_gate(
    pairs: DataFrame,
    bands: DataFrame,
    keys: list[str],
    query: str,
    alternative: str,
    budget: int | None = None,
) -> DataFrame:
    """Wrap a pair-listing result so materializing it fails loudly when
    the banded self-join would generate more than ``budget`` candidate
    pairs.

    The estimate is exact for the JOIN volume (before any verify
    filter): a bucket of n rows yields C(n,2) ordered-id candidates,
    so one groupBy-count + one scalar aggregate over ``bands`` — both
    narrow (key columns only; the band payload prunes away) — give
    ``sum n·(n−1)/2``.

    Gate shape (round-11 ADVICE fix): the 1-row estimate becomes a
    ZERO-ROW SENTINEL BRANCH unioned onto ``pairs``, whose filter IS
    the assertion — ``assert_true(est ≤ budget, msg).isNotNull()``
    raises past the budget and yields no rows otherwise. The original
    form filtered the crossJoin OUTPUT, which only evaluates per
    flowing row: post-join verify filters that leave zero output rows
    (q57's hamming ≤ 3) let an over-budget corpus run the full
    quadratic self-join without raising; an estimate-side filter under
    ``crossJoin(broadcast(...))`` has the same hole, because AQE's
    empty-relation propagation cancels the broadcast build when the
    probe side materializes empty. The union arm cannot be
    OPTIMIZER-pruned — runtime empty-propagation can only drop it
    AFTER executing it, and the single non-foldable predicate cannot
    be conjunct-reordered away — but PARTIAL materialization is a
    weaker story: a downstream ``limit``/``take`` that is satisfied
    from the pairs arm alone may return before the sentinel partition
    is ever scheduled, so the assert fires only on full
    materialization (count/collect/write — everything the registered
    queries and the driver do). Bonus: ``pairs`` rows now flow with NO
    per-row broadcast hop at all.

    Rows and schema — INCLUDING per-field nullability — are untouched
    when the budget holds: the sentinel's zero rows are built from
    non-null dummy literals wherever the ``pairs`` field is
    non-nullable (an all-``lit(None)`` arm would relax every output
    column to nullable through the union), falling back to
    ``lit(None)`` — and thus a nullability relaxation — only for
    non-nullable fields of a type with no cheap non-null literal
    (none of the pair queries has one).

    ``budget=None`` reads :data:`PAIR_BUDGET` at call time (so tests
    can squeeze it via monkeypatch)."""
    if budget is None:
        budget = PAIR_BUDGET
    est = (
        bands.groupBy(*[F.col(k) for k in keys])
        .count()
        .agg(
            F.coalesce(
                F.sum(F.col("count") * (F.col("count") - 1) / 2),
                F.lit(0.0),
            ).alias("_pair_est")
        )
    )
    msg = F.concat(
        F.lit(f"{query}: banded candidate-pair estimate "),
        F.col("_pair_est").cast("bigint").cast("string"),
        F.lit(
            f" exceeds the pair-listing budget {budget}. The pair LIST "
            "itself is quadratic in duplicate-copy count (a k-clique "
            "emits C(k,2) rows by semantics) — on a duplicate-dense "
            f"corpus run {alternative} instead, whose output is linear "
            "in the corpus."
        ),
    )
    sentinel = est.where(
        # raises past the budget; NULL → isNotNull() false → 0 rows
        F.assert_true(
            F.col("_pair_est") <= F.lit(float(budget)), msg
        ).isNotNull()
    ).select(
        *[_zero_row_literal(f).alias(f.name) for f in pairs.schema.fields]
    )
    return pairs.unionByName(sentinel)


def _zero_row_literal(field) -> F.Column:
    """A typed literal for one zero-row sentinel column.

    ``unionByName`` ORs nullability per field, so an all-``lit(None)``
    sentinel would relax every non-nullable output column to nullable
    even though it contributes no rows (round-12 ADVICE). Non-nullable
    fields therefore get a non-null dummy whose cast stays
    non-nullable (literal→wider-numeric/string/boolean/binary casts
    never force nullability); nullable fields keep the plain NULL.

    Decimals need their own dummy: ``lit(0)`` is an INT literal, and
    Spark marks int→narrow-decimal casts nullable (the target cannot
    hold every int — measured: ``lit(0).cast(decimal(5,2))`` is
    nullable in BOTH ANSI modes, while a ``Decimal(0)`` literal cast
    to any decimal stays non-nullable)."""
    from decimal import Decimal

    from pyspark.sql.types import (
        BooleanType,
        BinaryType,
        DecimalType,
        NumericType,
        StringType,
    )

    t = field.dataType
    if field.nullable:
        return F.lit(None).cast(t)
    if isinstance(t, DecimalType):
        return F.lit(Decimal(0)).cast(t)
    if isinstance(t, NumericType):
        return F.lit(0).cast(t)
    if isinstance(t, StringType):
        return F.lit("")
    if isinstance(t, BooleanType):
        return F.lit(False)
    if isinstance(t, BinaryType):
        return F.lit(b"")
    # exotic non-nullable type: accept the relaxation (documented)
    return F.lit(None).cast(t)
