"""Full-registry Spark-vs-DuckDB oracle sweep at an arbitrary SF dir.

Replays the driver's t2 correctness comparison (hash of canonicalized
values, schema, row counts) for EVERY oracled query in
__spark_entry__.py — the same harness tests/test_oracle_parity.py runs
at sf0.001, lifted to a CLI so end-of-round sweeps at sf0.1 are one
command instead of an ad-hoc snippet.

Usage: python tools/oracle_sweep.py [sf_dir] [--only q146,q63,...]
Prints one line per query (MATCH / MISMATCH / ERROR) and a final
summary line; exits non-zero if any query mismatches or errors.

Oracle-side memoization (round-11 VERDICT task 5, widened round 13):
two shared fragments dominate sf0.1 sweep wall, both DuckDB-side — NOT
engine regressions:

  * the recursive transitive-closure CTE embedded by the five
    CC-family oracles (q56/q125/q144/q149/q150; q144: 178s of its 184s
    was the closure, measured round 11), and
  * the MinHash signature select (8 affine permutations over the
    polynomial shingle hash of every doc) embedded by THIRTEEN oracles
    (q51/q52/q56/q58/q93/q108/q122/q125/q133/q144/q149/q150/q151;
    q151: 63.1s and q52: 54.9s sweep lines were sig-dominated,
    measured round 12 — the engine side is ~1-2s each).

When ≥2 members of a family ride a sweep, the shared fragment is
materialized ONCE as a temp table and each member's SQL is rewritten
to read it — the signature select becomes ``_sig_memo`` and the
closure becomes ``_cc_comp_memo`` (built on top of the sig memo when
both fire), exposing the same names (``sig`` / ``comp``) downstream so
per-oracle semantics are unchanged. Matching is WHITESPACE-NORMALIZED
(round-12 ADVICE): verbatim f-string equality silently disabled the
memo on any reflow — q58's sig CTE differs from q52's by one newline —
and the only symptom was a slow sweep. A family member swept without
memoization (``--no-memo`` absent) now prints an explicit ``[memo]
NOTE`` line, as does any oracle carrying the minhash cost marker that
stops matching the fragment (drift canary). ``--no-memo`` disables
everything (e.g. to time a single oracle honestly end-to-end).
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from setu_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare_frames, register_views  # noqa: E402


def _ws_pattern(fragment: str) -> re.Pattern:
    """Compile ``fragment`` into a regex that tolerates any whitespace
    run wherever the fragment has whitespace — oracles are assembled
    from f-strings with varying indentation, so exact-text surgery
    breaks on pure reflows (round-12 ADVICE)."""
    return re.compile(r"\s+".join(re.escape(tok) for tok in fragment.split()))


def memoized_oracles(duck, names, oracles) -> dict[str, str]:
    """Materialize the shared sig/closure fragments once; return the
    rewritten oracle SQL for every swept query that embeds one (empty
    for families with <2 swept members — a lone member pays its
    fragment once either way, and the temp-table detour would only
    blur its standalone timing; an explicit NOTE line records the
    skip)."""
    from setu_spark.operators.dedup import _components_cte, _minhash_sql_cols

    sig_sel = (
        "SELECT doc_id, " + ", ".join(_minhash_sql_cols()) + " FROM documents"
    )
    cte = _components_cte()
    sig_pat, cte_pat = _ws_pattern(sig_sel), _ws_pattern(cte)
    sig_users = [n for n in names if sig_pat.search(oracles.get(n, ""))]
    cc_family = [n for n in names if cte_pat.search(oracles.get(n, ""))]
    out: dict[str, str] = {}

    sig_repl = "SELECT * FROM _sig_memo"
    do_sig = len(sig_users) >= 2
    if do_sig:
        t0 = time.time()
        duck.execute(f"CREATE OR REPLACE TEMP TABLE _sig_memo AS {sig_sel}")
        print(
            f"[memo] MinHash sig table materialized once for "
            f"{len(sig_users)} oracles ({time.time()-t0:.1f}s)",
            flush=True,
        )
    elif sig_users:
        print(
            f"[memo] NOTE: {sig_users} swept WITHOUT sig memoization "
            "(<2 family members in this sweep)",
            flush=True,
        )

    if len(cc_family) >= 2:
        t0 = time.time()
        cte_build = sig_pat.sub(sig_repl, cte) if do_sig else cte
        duck.execute(
            f"CREATE OR REPLACE TEMP TABLE _cc_comp_memo AS {cte_build} "
            "SELECT * FROM comp"
        )
        print(
            f"[memo] CC closure materialized once for {cc_family} "
            f"({time.time()-t0:.1f}s)",
            flush=True,
        )
        comp_repl = "WITH comp AS (SELECT * FROM _cc_comp_memo)"
        for n in cc_family:
            out[n] = cte_pat.sub(lambda _m: comp_repl, oracles[n])
    elif cc_family:
        print(
            f"[memo] NOTE: {cc_family} swept WITHOUT CC memoization "
            "(<2 family members in this sweep)",
            flush=True,
        )

    if do_sig:
        for n in sig_users:
            base = out.get(n, oracles[n])
            out[n] = sig_pat.sub(lambda _m: sig_repl, base)

    # drift canary: the minhash cost marker with no normalized match
    # means the fragment and an oracle have diverged — the memo would
    # silently stop covering it and the only symptom is a slow sweep
    drifted = [
        n for n in names
        if "list_min(list_transform" in oracles.get(n, "")
        and n not in sig_users
    ]
    if drifted:
        print(
            f"[memo] NOTE: {drifted} carry minhash-cost SQL but no "
            "longer match the sig fragment — memoization skipped "
            "(fragment drift?)",
            flush=True,
        )
    return out


def main() -> int:
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        if i + 1 >= len(argv):
            sys.exit("usage: oracle_sweep.py [sf_dir] [--only q1,q2]")
        only = {p.strip() for p in argv[i + 1].split(",") if p.strip()}
        argv = argv[:i] + argv[i + 2 :]
    memo_enabled = "--no-memo" not in argv
    if not memo_enabled:
        argv.remove("--no-memo")
    # a stray flag must not be mistaken for the sf dir (duckdb would fail
    # later with a confusing "no files match --sf/region.parquet")
    unknown = [a for a in argv if a.startswith("--")]
    if unknown:
        sys.exit(
            f"unknown flags {unknown}; usage: oracle_sweep.py [sf_dir] "
            "[--only q1,q2] [--no-memo]"
        )
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(oracles)
    if only:
        names = [n for n in names if any(n == o or n.startswith(o + "_") or n.split("_")[0] == o for o in only)]

    spark = get_spark("oracle-sweep")
    duck = duckdb.connect()
    register_views(duck, sf_dir)
    memo = memoized_oracles(duck, names, oracles) if memo_enabled else {}

    n_match = n_mismatch = n_err = 0
    t_start = time.time()
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            oracle_pdf = duck.execute(memo.get(name, oracles[name])).df()
            problems = compare_frames(spark_pdf, oracle_pdf)
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            n_err += 1
            print(f"ERROR    {name}  {time.time()-t0:6.2f}s  {type(exc).__name__}: {exc}", flush=True)
            continue
        if problems:
            n_mismatch += 1
            print(f"MISMATCH {name}  {time.time()-t0:6.2f}s  " + "; ".join(problems), flush=True)
        else:
            n_match += 1
            print(f"MATCH    {name}  {time.time()-t0:6.2f}s", flush=True)
    total = len(names)
    print(
        f"SWEEP {n_match}/{total} MATCH, {n_mismatch} mismatch, {n_err} error, "
        f"{time.time()-t_start:.1f}s, sf_dir={sf_dir}",
        flush=True,
    )
    spark.stop()
    return 1 if (n_mismatch or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
