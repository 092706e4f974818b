"""Dedup operators on planted fixtures (the testdata corpus has no
near-duplicates, so these prove the machinery detects them when present)."""

from __future__ import annotations

from pyspark.sql import functions as F

from setu_spark.operators.dedup import (
    NUM_PERM,
    band_table,
    distinct_shingles,
    lsh_candidate_pairs,
    minhash_columns,
    minhash_signatures,
    simhash_column,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "into the deep dark forest where nobody ever goes at night"
)
NEAR_DUP = BASE.replace("dark", "cold")  # one-word edit
UNRELATED = (
    "completely different content about spark query engines and "
    "distributed columnar storage with vectorized execution pipelines"
)


def _corpus(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR_DUP), (3, UNRELATED), (4, BASE)],
        ["doc_id", "text"],
    )


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    [row] = df.select(distinct_shingles("text").alias("s")).collect()
    assert row.s == ["a b c", "b c d"]
    [short] = (
        spark.createDataFrame([("a b",)], ["text"])
        .select(distinct_shingles("text").alias("s"))
        .collect()
    )
    assert short.s == []


def test_minhash_detects_near_dup(spark):
    sig = _corpus(spark).select("doc_id", *minhash_columns())
    rows = {r.doc_id: [r[f"m{j}"] for j in range(NUM_PERM)] for r in sig.collect()}
    agree = lambda a, b: sum(x == y for x, y in zip(rows[a], rows[b]))
    assert agree(1, 4) == NUM_PERM          # exact dup: all minhashes equal
    assert agree(1, 2) >= NUM_PERM // 2     # near dup: most agree
    assert agree(1, 3) <= 1                 # unrelated: (almost) none

    pairs = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sig).collect()
    }
    assert (1, 4) in pairs
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_band_table_shape(spark):
    sig = _corpus(spark).select("doc_id", *minhash_columns())
    bands = band_table(sig)
    assert bands.count() == 4 * 4  # 4 docs × 4 bands
    assert set(bands.columns) == {"doc_id", "band", "band_hash"}


def test_simhash_column_matches_composition(spark):
    """The narrow per-row SimHash must equal q54's shuffle composition."""
    from setu_spark.operators.dedup import q54_simhash

    df = _corpus(spark)
    narrow = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", simhash_column("text").alias("sh")
        ).collect()
    }
    df.createOrReplaceTempView("documents_fixture")

    # run the registered composition against the same fixture by swapping
    # the loader: easiest is to recompute inline with the same ops
    from setu_spark.functions.hashes import hash64
    from pyspark.sql import functions as F

    toks = df.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split("text", " ", -1), lambda w: w != F.lit(""))
            )
        ).alias("tok"),
    )
    bits = (
        toks.select(
            "doc_id",
            hash64("tok").alias("h"),
            F.explode(F.sequence(F.lit(0), F.lit(31))).alias("i"),
        )
        .groupBy("doc_id", "i")
        .agg(
            F.sum(
                F.when(F.expr("shiftright(h, cast(i as int)) % 2") == 1, 1)
                .otherwise(-1)
            ).alias("balance")
        )
    )
    composed = {
        r.doc_id: r.simhash
        for r in bits.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("balance") > 0,
                    F.expr("shiftleft(cast(1 as bigint), cast(i as int))"),
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("simhash")
        )
        .collect()
    }
    assert narrow == composed

    # near-dups have small Hamming distance; unrelated docs large
    ham = lambda a, b: bin(narrow[a] ^ narrow[b]).count("1")
    assert ham(1, 4) == 0
    assert ham(1, 2) <= 8
    assert ham(1, 3) >= 8


def test_null_signature_docs_generate_no_pairs(spark):
    """Docs too short to shingle (NULL minhash signature) must not collide
    into one LSH bucket (concat_ws skips NULLs → md5('') bucket) — they
    carry no similarity evidence and can never be candidates."""
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "also"), (3, "x y"),
         (4, "a proper document with enough words to shingle here"),
         (5, "a proper document with enough words to shingle here")],
        ["doc_id", "text"],
    )
    sig = minhash_signatures(docs)
    short = {r.doc_id: r.m0 for r in sig.collect()}
    assert short[1] is None and short[3] is None
    pairs = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(sig).collect()
    }
    assert pairs == {(4, 5)}


def test_minhash_estimates_track_true_jaccard(spark):
    """Property: the fraction of agreeing minhashes estimates the true
    shingle Jaccard (E[match_j] = J; with 8 permutations σ ≈ 0.17, so we
    assert the MEAN absolute error over many pairs, not per-pair bounds).
    Pins the affine-permutation family (PERM_A/PERM_B over one 60-bit
    hash) as a valid MinHash family."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(400)]
    rows, truths = [], []
    for pid in range(40):
        n = 60
        base = [rng.choice(vocab) for _ in range(n)]
        keep = rng.randrange(0, n + 1)   # overlap from 0 to full
        other = base[:keep] + [rng.choice(vocab) for _ in range(n - keep)]

        def shingles(ws):
            return {
                " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
            }

        sa, sb = shingles(base), shingles(other)
        truths.append(len(sa & sb) / len(sa | sb))
        rows.append((2 * pid, " ".join(base)))
        rows.append((2 * pid + 1, " ".join(other)))

    sig = {
        r.doc_id: [r[f"m{j}"] for j in range(NUM_PERM)]
        for r in minhash_signatures(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    errs = []
    for pid, truth in enumerate(truths):
        a, b = sig[2 * pid], sig[2 * pid + 1]
        est = sum(x == y for x, y in zip(a, b)) / NUM_PERM
        errs.append(abs(est - truth))
    mean_err = sum(errs) / len(errs)
    # E[|est-J|] ≤ σ ≈ sqrt(J(1-J)/8) ≤ 0.177; mean over 40 pairs has
    # further √40 concentration — 0.12 is a loose, stable bound.
    assert mean_err < 0.12, mean_err


def test_connected_components_planted_clusters(spark):
    """Min-label propagation over a path, a triangle, and an isolated
    pair — including a long path (worst case for propagation rounds)."""
    from setu_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # path 1-2-3-4-5, triangle 10-11-12, pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        ["id_a", "id_b"],
    )
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                10: 10, 11: 10, 12: 10,
                20: 20, 21: 20}
    # both execution paths must produce identical labels: the default
    # (small graph → driver-local union-find) and the distributed
    # min-label loop (forced with local_edge_bound=0)
    got_local = {
        r.doc_id: r.component
        for r in connected_components(pairs).collect()
    }
    got_dist = {
        r.doc_id: r.component
        for r in connected_components(pairs, local_edge_bound=0).collect()
    }
    assert got_local == expected
    assert got_dist == expected


def test_cc_pairs_canonical_matches_default(spark):
    """``pairs_canonical=True`` (round-14: skips the re-canonicalize +
    distinct exchange for generators that already emit distinct
    ``id_a < id_b`` pairs, like lsh_candidate_pairs) must label
    identically to the default path on the same canonical pair set —
    on the union-find dispatch AND the forced-distributed loop."""
    from setu_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # already canonical: distinct rows, id_a < id_b everywhere
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (10, 12), (11, 12),
         (20, 21)],
        ["id_a", "id_b"],
    )
    want = {
        r.doc_id: r.component
        for r in connected_components(pairs).collect()
    }
    got = {
        r.doc_id: r.component
        for r in connected_components(
            pairs, pairs_canonical=True
        ).collect()
    }
    got_dist = {
        r.doc_id: r.component
        for r in connected_components(
            pairs, pairs_canonical=True, local_edge_bound=0
        ).collect()
    }
    assert got == want
    assert got_dist == want


def test_cc_duplicate_edges_match_unique(spark):
    """``pairs_unique=False`` (round-14: the funnel feeds CC the RAW
    banded pairs — one row per shared band — skipping the generator's
    pair-dedup exchange): duplicate edges must label identically to
    the distinct edge set, on the union-find dispatch AND the
    forced-distributed loop (which dedups before iterating)."""
    from setu_spark.operators.dedup import connected_components

    uniq = [(1, 2), (2, 3), (10, 11), (20, 21)]
    dup = uniq + [(1, 2), (1, 2), (10, 11)]  # banded repeats
    want = {
        r.doc_id: r.component
        for r in connected_components(
            spark.createDataFrame(uniq, ["id_a", "id_b"])
        ).collect()
    }
    dup_df = spark.createDataFrame(dup, ["id_a", "id_b"])
    got = {
        r.doc_id: r.component
        for r in connected_components(
            dup_df, pairs_canonical=True, pairs_unique=False
        ).collect()
    }
    got_dist = {
        r.doc_id: r.component
        for r in connected_components(
            dup_df,
            pairs_canonical=True,
            pairs_unique=False,
            local_edge_bound=0,
        ).collect()
    }
    assert got == want
    assert got_dist == want


def test_connected_components_empty_graph(spark):
    """Zero candidate pairs (tiny or all-unique corpora) must yield an
    empty labeling on both execution paths, not a schema error from the
    local path's empty createDataFrame."""
    from setu_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
    assert connected_components(pairs, local_edge_bound=0).count() == 0


def test_dedup_removed_docs_on_planted_dupes(spark):
    """q59's anti-join semantics on planted exact duplicates: lower id
    survives, higher-id copies are listed as removed."""
    import setu_spark.operators.dedup as dd

    docs = spark.createDataFrame(
        [(1, "same text", "s"), (4, "same text", "s"),
         (2, "unique a", "s"), (9, "same text", "s")],
        ["doc_id", "text", "source"],
    )
    orig = dd.load_table
    dd.load_table = lambda sp, d, n: docs
    try:
        removed = {
            r.doc_id for r in dd.q59_dedup_removed_docs(spark, "x").collect()
        }
    finally:
        dd.load_table = orig
    assert removed == {4, 9}


def test_shared_span_removal_planted_boilerplate(spark):
    """q111 on planted boilerplate: a shared license header is spliced
    out of every doc except the lowest-id owner; unique text survives."""
    import setu_spark.operators.textstats as ts
    from setu_spark.operators.textstats import FP_K

    # header long enough to contain winnowed windows (hash % 16 == 0 is
    # content-dependent, so use a long repeated block to guarantee hits)
    header = "standard license header boilerplate " * 8
    docs = spark.createDataFrame(
        [
            (1, header + "alpha unique tail one"),
            (2, header + "beta unique tail two"),
            (3, "wholly original text with no repeats at all here"),
        ],
        ["doc_id", "text"],
    )
    # q111 loads through load_table_parallel (round-13 input rebalance);
    # patch both loader names so the fixture swap keeps intercepting
    orig, orig_par = ts.load_table, ts.load_table_parallel
    ts.load_table = ts.load_table_parallel = lambda sp, d, n: docs
    try:
        rows = {r.doc_id: r for r in
                ts.q111_shared_span_removal(spark, "x").collect()}
    finally:
        ts.load_table, ts.load_table_parallel = orig, orig_par
    # doc 1 is the owner of the shared windows -> untouched (absent);
    # doc 3 shares nothing -> absent; doc 2 loses header chars
    assert 3 not in rows
    assert 2 in rows
    r2 = rows[2]
    assert r2.chars_removed >= FP_K
    assert r2.clean_len < len(header + "beta unique tail two")
    # the unique tail must survive somewhere in the cleaned text: its
    # md5 changes, but length accounting must be consistent
    assert r2.clean_len + r2.chars_removed == len(header + "beta unique tail two")


def test_levenshtein_engine_parity_and_codepoint_semantics(spark, duck):
    """q108's oracle validity: Spark levenshtein is codepoint-based and
    must EQUAL DuckDB's on ASCII (all driver testdata is ASCII —
    verified); on multi-byte text DuckDB counts BYTE edits and the
    engines legitimately diverge — pin both facts so a testdata
    generation that goes non-ASCII fails here with a readable message,
    not as an opaque q108 hash mismatch."""
    from pyspark.sql import functions as F

    cases = [
        ("kitten", "sitting"),       # classic ASCII: 3
        ("abc def", "abc deg"),      # 1
        ("café", "cafe"),            # Spark 1 (codepoint), Duck 2 (bytes)
        ("नमस्ते", "नमस्कार"),          # Devanagari
        ("日本語テスト", "日本語てすと"),  # CJK
    ]
    df = spark.createDataFrame(cases, "a string, b string").select(
        "a", "b", F.levenshtein("a", "b").alias("d"),
        F.length("a").alias("la"),
    )
    got = {(r.a, r.b): (r.d, r.la) for r in df.collect()}
    for a, b in cases:
        duck_d, duck_len, duck_bytes = duck.execute(
            "SELECT levenshtein(?, ?), length(?), strlen(?)", [a, b, a, a]
        ).fetchone()
        spark_d, spark_len = got[(a, b)]
        assert spark_len == duck_len  # both lengths are codepoints
        if a.isascii() and b.isascii():
            assert spark_d == duck_d, (a, b, spark_d, duck_d)
        else:
            # documented divergence: DuckDB edits bytes
            assert duck_bytes > duck_len
    # Spark is codepoint-based: café -> cafe is ONE substitution
    assert got[("café", "cafe")][0] == 1


def test_connected_components_nonconvergence_raises(spark):
    """A chain longer than max_iterations hops must raise (round-4
    ADVICE), not return partial labels that mismatch the exact
    transitive-closure oracle."""
    import pytest as _pytest

    from setu_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], ["id_a", "id_b"]
    )
    # force the distributed loop: the union-find fast path has no
    # iteration count to exhaust
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=2, local_edge_bound=0)
    # and with room to converge, the whole chain is one component
    labels = connected_components(
        chain, max_iterations=15, local_edge_bound=0
    ).collect()
    assert {r.component for r in labels} == {0}


def test_connected_components_pointer_jump_depth(spark):
    """Pointer jumping makes rounds O(log diameter): a 128-hop chain
    must converge well inside 10 rounds (the plain 1-hop loop needs
    128), and still label every node with the chain's min id. Also
    pins that mirrored-duplicate pair input ((a,b) AND (b,a)) is
    normalized before the local-path edge count and changes nothing."""
    import setu_spark.operators.dedup as dd

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(128)], ["id_a", "id_b"]
    )
    labels = dd.connected_components(
        chain, max_iterations=10, local_edge_bound=0
    ).collect()
    assert {r.component for r in labels} == {0}
    assert len(labels) == 129
    assert 0 < dd.LAST_CC_ROUNDS <= 10

    # mirrored orientation: same labels, and the canonicalized edge
    # count keeps the graph eligible for whichever path the bound picks
    both = chain.union(
        chain.select(
            chain.id_b.alias("id_a"), chain.id_a.alias("id_b")
        )
    )
    labels2 = dd.connected_components(
        both, max_iterations=10, local_edge_bound=0
    ).collect()
    assert {r.component for r in labels2} == {0}
    assert len(labels2) == 129


def test_dedup_impact_audit_planted_clusters(spark):
    """q125's histogram on planted exact duplicates: a 3-cluster, a
    2-cluster, and a singleton roll up with exact removed-char sums
    (survivor = min doc_id)."""
    import setu_spark.operators.dedup as dd

    rows = [
        (1, "alpha beta gamma delta words", "s"),
        (5, "alpha beta gamma delta words", "s"),
        (9, "alpha beta gamma delta words", "s"),
        (2, "zig zag zoom entirely other", "s"),
        (7, "zig zag zoom entirely other", "s"),
        (3, "unique standalone document text", "s"),
    ]
    docs = spark.createDataFrame(
        [(i, t, s, len(t)) for i, t, s in rows],
        "doc_id long, text string, source string, n_chars long",
    )
    orig = dd.load_table
    dd.load_table = lambda sp, d, n: docs
    try:
        out = {
            r["cluster_size"]: r
            for r in dd.q125_dedup_impact_audit(spark, "x").collect()
        }
    finally:
        dd.load_table = orig
    assert out[3]["n_clusters"] == 1 and out[3]["removed_docs"] == 2
    assert out[3]["removed_chars"] == 2 * len(rows[0][1])
    assert out[2]["n_clusters"] == 1 and out[2]["removed_chars"] == len(
        rows[3][1]
    )
    assert out[1]["n_clusters"] == 1 and out[1]["removed_chars"] == 0
    assert sum(r["n_docs"] for r in out.values()) == len(rows)


def test_leak_free_split_reassigns_planted_leak(spark):
    """q144 on a planted cross-split near-dup pair: doc 1 hashes to
    train, doc 44 to test (md5 prefixes computed offline); identical
    text makes them an LSH pair, so q144 must pull doc 44 into doc 1's
    split (component label = min id = 1 → train) — the exact leak q98's
    per-document rule would have shipped. Singleton doc 49 (test split)
    must stay where its own hash puts it."""
    import setu_spark.operators.dedup as dd

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, shared), (44, shared), (49, "one two three four five six")],
        ["doc_id", "text"],
    )
    orig = dd.load_table
    dd.load_table = lambda sp, d, n: docs
    try:
        cells = {
            (r.final_split, r.raw_split): (r.n_docs, r.n_components)
            for r in dd.q144_leak_free_split(spark, "x").collect()
        }
    finally:
        dd.load_table = orig
    assert cells == {
        ("train", "train"): (1, 1),   # doc 1 in place
        ("train", "test"): (1, 1),    # doc 44 PULLED train-ward: the leak
        ("test", "test"): (1, 1),     # singleton 49 untouched
    }


def test_leak_free_split_collapse_equivalence(spark):
    """q144's exact-collapse funnel must produce the IDENTICAL matrix to
    the naive uncollapsed composition (LSH over every copy) on a
    fixture exercising every collapse case: an exact 3-clique of long
    docs, a near-dup pair of DIFFERENT texts, a short exact pair
    (must NOT merge — no signature, no pairs in the naive graph),
    and a singleton."""
    import setu_spark.operators.dedup as dd
    from pyspark.sql import functions as F

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    long_b = long_a.replace("kappa", "lambda")  # near-dup of long_a
    docs = spark.createDataFrame(
        [(1, long_a), (44, long_a), (49, long_a),   # exact 3-clique
         (2, long_b),                               # near-dup neighbor
         (3, "a b"), (64, "a b"),                   # short exact pair
         # 3 RAW tokens but 2 WORDS (trailing space): the signature
         # kernel emits NULL for these, so this exact pair must NOT
         # collapse either — guards the shingleable predicate using
         # the kernel's non-empty word count, not the raw split size
         (6, "x y "), (83, "x y "),
         (5, "completely different words here make this doc unique ok")],
        ["doc_id", "text"],
    )
    orig = dd.load_table
    dd.load_table = lambda sp, d, n: docs
    try:
        got = {
            (r.final_split, r.raw_split): (r.n_docs, r.n_components)
            for r in dd.q144_leak_free_split(spark, "x").collect()
        }
    finally:
        dd.load_table = orig

    # naive composition, inline
    sig = dd.minhash_signatures(docs)
    comps = dd.connected_components(dd.lsh_candidate_pairs(sig))
    full = (
        docs.select("doc_id")
        .join(comps, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("component")
        )
    )
    want = {
        (r.final_split, r.raw_split): (r.n_docs, r.n_components)
        for r in full.select(
            dd._split_col(F.col("component")).alias("final_split"),
            dd._split_col(F.col("doc_id")).alias("raw_split"),
            "component",
        )
        .groupBy("final_split", "raw_split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("component").alias("n_components"),
        )
        .collect()
    }
    assert got == want
    # and the short exact pairs really did stay apart: docs 64/83 keep
    # their own components, not doc 3's/6's
    naive = {r.doc_id: r.component for r in full.collect()}
    assert naive[64] == 64 and naive[3] == 3
    assert naive[83] == 83 and naive[6] == 6


def test_funnel_collapse_equivalence_q56_q125(spark):
    """q56 and q125 now run through exact_collapsed_components; both
    must reproduce the naive uncollapsed composition exactly on the
    hostile fixture (exact clique, near-dup, short exact pair,
    trailing-space 2-word pair, singleton) — including q56's
    graph-membership contract (only docs with >=1 candidate pair
    appear) and q125's per-size char-removal accounting."""
    import setu_spark.operators.dedup as dd
    from pyspark.sql import functions as F

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    long_b = long_a.replace("kappa", "lambda")
    rows = [(1, long_a), (44, long_a), (49, long_a),
            (2, long_b),
            (3, "a b"), (64, "a b"),
            (6, "x y "), (83, "x y "),
            (5, "completely different words here make this doc unique ok")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "n_chars", F.length("text").cast("long")
    )

    # naive compositions, inline
    sig = dd.minhash_signatures(docs)
    comps = dd.connected_components(dd.lsh_candidate_pairs(sig))
    naive_q56 = {
        (r.component, r.cluster_size, r.survivor_doc_id)
        for r in comps.groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("survivor_doc_id"),
        )
        .collect()
    }
    naive_full = (
        docs.select("doc_id", "n_chars")
        .join(comps, "doc_id", "left")
        .select(
            F.coalesce("component", "doc_id").alias("component"),
            "doc_id",
            "n_chars",
        )
    )
    naive_per = naive_full.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        (F.sum("n_chars") - F.min_by("n_chars", "doc_id")).alias(
            "removed_chars"
        ),
    )
    naive_q125 = {
        (r.cluster_size, r.n_clusters, r.n_docs, r.removed_docs,
         r.removed_chars)
        for r in naive_per.groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
            F.sum(F.col("cluster_size") - 1).alias("removed_docs"),
            F.sum("removed_chars").alias("removed_chars"),
        )
        .collect()
    }

    orig = dd.load_table
    dd.load_table = lambda sp, d, n: docs
    try:
        got_q56 = {
            (r.component, r.cluster_size, r.survivor_doc_id)
            for r in dd.q56_dedup_components(spark, "x").collect()
        }
        got_q125 = {
            (r.cluster_size, r.n_clusters, r.n_docs, r.removed_docs,
             r.removed_chars)
            for r in dd.q125_dedup_impact_audit(spark, "x").collect()
        }
    finally:
        dd.load_table = orig
    assert got_q56 == naive_q56
    assert got_q125 == naive_q125
    # the exact clique must actually be in q56's output (graph members)
    assert any(c == 1 and s >= 3 for c, s, _ in got_q56)


def test_collapsed_components_keeps_null_text_docs(spark):
    """NULL text must NOT vanish from the collapse funnel (round-6
    ADVICE medium): a bare ok/~ok filter split drops NULL-predicate rows
    from both branches.  NULL-text docs take the short path — their own
    singleton component, in_graph false — matching the oracles, which
    run comp_full over ALL documents."""
    import setu_spark.operators.dedup as dd
    from pyspark.sql import types as T

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    docs = spark.createDataFrame(
        [(1, long_a), (2, long_a), (7, None), (9, None), (3, "a b")],
        schema,
    )
    got = {
        r.doc_id: (r.component, r.in_graph)
        for r in dd.exact_collapsed_components(docs).collect()
    }
    assert set(got) == {1, 2, 3, 7, 9}, "every input doc must survive"
    # NULL-text docs: singleton components, never in the pair graph
    assert got[7] == (7, False) and got[9] == (9, False)
    # the exact pair still collapses to the min-id component
    assert got[1] == (1, True) and got[2] == (1, True)
    assert got[3] == (3, False)


def test_funnel_shared_mode_identity_and_memo(spark):
    """bench.py --funnel-shared: with dedup.FUNNEL_SHARED on, repeated
    exact_collapsed_components calls on the same input plan reuse ONE
    cached funnel (memo keyed by semantic hash), results are identical
    to standalone, and clear_funnel_memo releases everything."""
    import setu_spark.operators.dedup as dd

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, long_a), (2, long_a), (3, "a b")], ["doc_id", "text"]
    )
    alone = sorted(
        map(tuple, dd.exact_collapsed_components(docs).collect())
    )
    dd.FUNNEL_SHARED = True
    try:
        a = dd.exact_collapsed_components(docs)
        b = dd.exact_collapsed_components(docs)
        assert a is b, "second call must hit the memo"
        assert len(dd._FUNNEL_MEMO) == 1
        assert sorted(map(tuple, a.collect())) == alone
    finally:
        dd.FUNNEL_SHARED = False
        dd.clear_funnel_memo()
    assert not dd._FUNNEL_MEMO


def test_component_source_purity_planted(spark):
    """q149 on planted provenance: a cross-source exact pair (mirror),
    an intra-source exact pair (repost), and singletons — the histogram
    must separate them by distinct-source count."""
    import setu_spark.operators.dedup as dd
    from pyspark.sql import functions as F  # noqa: F401

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    long_b = "one two three four five six seven eight nine ten eleven"
    docs = spark.createDataFrame(
        [(1, long_a, "crawlA"), (2, long_a, "crawlB"),   # cross-source mirror
         (3, long_b, "crawlA"), (4, long_b, "crawlA"),   # intra-source repost
         (5, "totally unrelated text with enough words to shingle fine",
          "crawlC")],
        ["doc_id", "text", "source"],
    )
    orig = dd.load_table
    dd.load_table = lambda sp, d, n: docs
    try:
        hist = {
            r.n_sources: (r.n_clusters, r.n_docs)
            for r in dd.q149_component_source_purity(spark, "x").collect()
        }
    finally:
        dd.load_table = orig
    assert hist == {1: (1, 2), 2: (1, 2)}  # singletons excluded


def test_quality_survivor_delta_planted(spark):
    """q150 on planted clusters: one cluster where the biggest copy has
    the HIGHER id (survivor changes, chars gained), one where the
    min-id copy is already the biggest (no change), and a max-chars TIE
    broken toward the min id (no change, zero gain)."""
    import setu_spark.operators.dedup as dd
    from pyspark.sql import functions as F  # noqa: F401

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    big = base + " extra trailing words proving the larger copy wins"
    other = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    )
    tie = "completely different words that shingle fine and tie on size"
    rows = [
        # cluster A: near-dups, doc 10 small, doc 20 big -> survivor 10->20
        (10, base), (20, big),
        # cluster B: doc 30 big (min id), doc 40 small -> unchanged
        (30, other + " nineteen twenty"), (40, other),
        # cluster C: exact copies (equal chars) -> tie -> min id, 0 gain
        (50, tie), (60, tie),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    orig = dd.load_table
    dd.load_table = lambda sp, d, n: docs
    try:
        [r] = dd.q150_quality_survivor_delta(spark, "x").collect()
    finally:
        dd.load_table = orig
    assert r.n_clusters == 3
    assert r.n_changed == 1
    assert r.chars_gained == (len(big) - len(base))


def test_joint_dedup_agreement_planted(spark):
    """q151 on planted tiers: an identical-text pair with ORTHOGONAL
    embeddings must land text_only, an identical-embedding pair with
    disjoint texts embedding_only, and a pair identical in both lands
    both — with the recomputed cross-metrics exposing each tier's view
    (text_only avg cosine 0.0; embedding_only est_jaccard 0.0)."""
    import setu_spark.operators.dedup as dd
    import setu_spark.operators.similarity as sim

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten eleven"
    t3 = "red orange yellow green blue indigo violet pink brown black"
    t4 = "mon tue wed thu fri sat sun jan feb mar apr may jun jul aug"
    ax = lambda i: [1.0 if j == i else 0.0 for j in range(64)]
    docs = spark.createDataFrame(
        [(1, t1), (2, t1),        # text-dup, orthogonal vectors
         (3, t2), (4, t3),        # disjoint texts, identical vectors
         (6, t4), (7, t4)],       # identical in both
        ["doc_id", "text"],
    )
    embs = spark.createDataFrame(
        [(1, ax(0)), (2, ax(1)),
         (3, ax(2)), (4, ax(2)),
         (6, ax(3)), (7, ax(3))],
        "vec_id long, embedding array<float>",
    )

    def fake_load(sp, d, name):
        return embs if name == "embeddings" else docs

    orig_d, orig_s = dd.load_table, sim.load_table
    dd.load_table = sim.load_table = fake_load
    try:
        rows = {
            r.tier: r
            for r in dd.q151_joint_dedup_agreement(spark, "x").collect()
        }
    finally:
        dd.load_table, sim.load_table = orig_d, orig_s
    assert rows["text_only"].n_pairs == 1
    assert rows["text_only"].avg_est_jaccard == 1.0
    assert rows["text_only"].avg_cosine == 0.0
    assert rows["embedding_only"].n_pairs == 1
    assert rows["embedding_only"].avg_cosine == 1.0
    assert rows["embedding_only"].avg_est_jaccard == 0.0
    assert rows["both"].n_pairs == 1
    assert rows["both"].avg_est_jaccard == 1.0
    assert rows["both"].avg_cosine == 1.0


def test_ann_admission_fn_planted(spark):
    """The shared ann_admission stage: an incoming copy of an existing
    vector is near_dup at cosine 1.0; an orthogonal newcomer is novel
    (any accidental band collision verifies below threshold)."""
    import setu_spark.operators.dedup as dd

    ax = lambda i: [1.0 if j == i else 0.0 for j in range(64)]
    existing = spark.createDataFrame(
        [(100, ax(0))], "vec_id long, embedding array<float>"
    )
    incoming = spark.createDataFrame(
        [(1, ax(0)), (2, ax(7))], "vec_id long, embedding array<float>"
    )
    got = {
        r.vec_id: (r.status, r.best_cosine)
        for r in dd.ann_admission(incoming, existing).collect()
    }
    assert got[1] == ("near_dup", 1.0)
    assert got[2][0] == "novel"


def test_ann_admission_null_embedding_gets_decision(spark):
    """Every-row-gets-a-decision contract (round-9 ADVICE): a
    NULL-embedding incoming row cannot probe the index and must NOT
    silently vanish through the embedding equi-join — it is admitted
    novel with 0 candidates."""
    import setu_spark.operators.dedup as dd

    ax = lambda i: [1.0 if j == i else 0.0 for j in range(64)]
    existing = spark.createDataFrame(
        [(100, ax(0))], "vec_id long, embedding array<float>"
    )
    incoming = spark.createDataFrame(
        [(1, ax(0)), (2, None)], "vec_id long, embedding array<float>"
    )
    got = {
        r.vec_id: (r.status, r.best_cosine, r.n_candidates)
        for r in dd.ann_admission(incoming, existing).collect()
    }
    assert len(got) == 2
    assert got[1] == ("near_dup", 1.0, 1)
    assert got[2] == ("novel", None, 0)


def test_joint_agreement_collapsed_equals_raw(spark):
    """Dual-path witness (the CC pattern): the collapsed production
    q151 must be row-identical to the raw-pair composition on a corpus
    with real duplicate structure — exact text copies, exact embedding
    copies, misaligned cliques, docs without embeddings, and NULL/too-
    short texts."""
    import setu_spark.operators.dedup as dd
    import setu_spark.operators.similarity as sim

    texts = {
        "A": "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "B": "one two three four five six seven eight nine ten eleven",
        "C": "red orange yellow green blue indigo violet pink brown grey",
        "D": "mon tue wed thu fri sat sun jan feb mar apr may jun julx",
    }
    ax = lambda i: [1.0 if j == i else 0.0 for j in range(64)]
    # doc: (id, text, embedding-or-None) — cliques deliberately misaligned
    spec = [
        (1, texts["A"], ax(0)), (2, texts["A"], ax(1)),   # text clique
        (3, texts["A"], None),                            # copy w/o vector
        (4, texts["B"], ax(2)), (5, texts["C"], ax(2)),   # emb clique
        (6, texts["D"], ax(3)), (7, texts["D"], ax(3)),   # both clique
        (8, "tiny", ax(4)), (9, "tiny", ax(4)),           # unshingleable text dup + emb dup
        (10, None, ax(5)), (11, None, ax(5)),             # NULL text, emb dup
        (12, texts["B"], ax(6)),                          # text dup of 4 across emb classes
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in spec], "doc_id long, text string"
    )
    embs = spark.createDataFrame(
        [(i, v) for i, _, v in spec if v is not None],
        "vec_id long, embedding array<float>",
    )

    def fake_load(sp, d, name):
        return embs if name == "embeddings" else docs

    orig_d, orig_s = dd.load_table, sim.load_table
    dd.load_table = sim.load_table = fake_load
    try:
        collapsed = {
            r.tier: tuple(r)
            for r in dd.q151_joint_dedup_agreement(spark, "x").collect()
        }
        raw = {
            r.tier: tuple(r)
            for r in dd._q151_pairs_raw(spark, "x").collect()
        }
    finally:
        dd.load_table, sim.load_table = orig_d, orig_s
    assert collapsed == raw
    # the fixture must exercise all three tiers
    assert set(collapsed) == {"both", "text_only", "embedding_only"}


def test_pair_budget_gate_planted_clique(spark):
    """Round-10 VERDICT task 4: the pair-listing queries must fail
    LOUDLY, with a pointer at the linear-output forms, when the banded
    candidate volume passes the budget — estimated from band-bucket
    sizes with one scalar aggregate riding the plan, never by
    generating the pairs. A planted 30-clique of identical docs puts
    30 rows in the same bucket of every band: est = bands * C(30,2).
    Under the budget the gate is a row-identical pass-through."""
    import pytest

    from setu_spark.operators.dedup import NUM_BANDS, pair_est_jaccard
    from setu_spark.operators.guards import pair_budget_gate

    docs = spark.createDataFrame(
        [(i, BASE) for i in range(30)] + [(100, UNRELATED)],
        ["doc_id", "text"],
    )
    sig = minhash_signatures(docs)
    bands = band_table(sig)
    pairs = pair_est_jaccard(sig, lsh_candidate_pairs(sig))
    est = NUM_BANDS * (30 * 29) // 2
    gated = pair_budget_gate(
        pairs, bands, ["band", "band_hash"], "q52_minhash_lsh_pairs",
        "q56_dedup_components", budget=est,
    )
    want = sorted(map(tuple, pairs.collect()))
    assert sorted(map(tuple, gated.collect())) == want  # pass-through
    assert gated.columns == pairs.columns
    tripped = pair_budget_gate(
        pairs, bands, ["band", "band_hash"], "q52_minhash_lsh_pairs",
        "q56_dedup_components", budget=est - 1,
    )
    with pytest.raises(Exception, match=r"q56_dedup_components.*linear"):
        tripped.collect()


def test_pair_budget_gate_trips_on_empty_pair_output(spark):
    """Round-11 ADVICE: the assertion must ride the ESTIMATE side of
    the broadcast, not a filter over the join output — a post-join
    verify filter (q57's hamming ≤ 3) that leaves ZERO output rows
    previously let an over-budget corpus execute the full quadratic
    band self-join without ever evaluating the assert. Plant an
    over-budget clique, then filter the pair set empty: the gate must
    still raise at materialization."""
    import pytest

    from setu_spark.operators.dedup import pair_est_jaccard
    from setu_spark.operators.guards import pair_budget_gate

    docs = spark.createDataFrame(
        [(i, BASE) for i in range(30)], ["doc_id", "text"]
    )
    sig = minhash_signatures(docs)
    bands = band_table(sig)
    # an always-false verify filter: the join output is empty by
    # construction, exactly the hole the output-side filter form had
    pairs = pair_est_jaccard(sig, lsh_candidate_pairs(sig)).where(
        "id_a = id_b"
    )
    gated = pair_budget_gate(
        pairs, bands, ["band", "band_hash"], "q52_minhash_lsh_pairs",
        "q56_dedup_components", budget=1,
    )
    with pytest.raises(Exception, match="pair-listing budget"):
        gated.collect()


def test_pair_listing_queries_run_their_budget_gate(spark, monkeypatch):
    """The gate must be wired into the REGISTERED q52/q55/q57 bodies
    (not just exist as a helper): with PAIR_BUDGET squeezed to zero,
    materializing each query raises. budget=None resolves at call
    time, so the monkeypatch reaches all three."""
    import pytest

    import setu_spark.operators.guards as guards
    from setu_spark.operators.dedup import (
        q52_minhash_lsh_pairs,
        q57_simhash_neardup_pairs,
    )
    from setu_spark.operators.similarity import q55_embedding_neardup

    monkeypatch.setattr(guards, "PAIR_BUDGET", 0)
    sf = "/root/testdata/sf0.001"
    for q in (q52_minhash_lsh_pairs, q57_simhash_neardup_pairs,
              q55_embedding_neardup):
        with pytest.raises(Exception, match="pair-listing budget"):
            q(spark, sf).collect()


def test_pair_budget_gate_preserves_nullability(spark):
    """Round-12 ADVICE: an all-lit(None) sentinel arm relaxed every
    output column to nullable through unionByName even though it
    contributes zero rows — strict-schema consumers (parquet schema
    expectations, downstream unions) saw the changed nullability. The
    sentinel now builds non-null dummies for non-nullable fields, so
    the gated schema — including per-field nullability — must equal
    the input schema exactly on a mixed-nullability frame."""
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pyspark.sql.types import DecimalType

    from setu_spark.operators.guards import pair_budget_gate

    docs = spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, UNRELATED)], ["doc_id", "text"]
    )
    sig = minhash_signatures(docs)
    bands = band_table(sig)
    # a mixed-nullability pairs frame: literals and coalesce are
    # non-nullable, a parquet-born column stays nullable; the NARROW
    # decimal is the trap case — an int-literal dummy cast to it is
    # nullable in both ANSI modes, so the sentinel must use a
    # Decimal-typed literal to keep the field non-nullable
    pairs = (
        spark.range(3)
        .select(
            F.col("id").alias("id_a"),                    # non-nullable
            F.lit("x").alias("id_b"),                     # non-nullable
            F.lit(True).alias("flag"),                    # non-nullable
            F.lit(b"").alias("blob"),                     # non-nullable
            F.lit(Decimal("1.50"))
            .cast(DecimalType(5, 2))
            .alias("amt"),                                # non-nullable
            F.when(F.col("id") > 1, F.col("id")).alias("score"),  # nullable
        )
    )
    assert not pairs.schema["amt"].nullable  # trap case is armed
    before = [(f.name, f.dataType, f.nullable) for f in pairs.schema.fields]
    gated = pair_budget_gate(
        pairs, bands, ["band", "band_hash"], "qXX", "qYY",
        budget=10**9,
    )
    after = [(f.name, f.dataType, f.nullable) for f in gated.schema.fields]
    assert after == before
    assert sorted(map(tuple, gated.collect())) == sorted(
        map(tuple, pairs.collect())
    )
