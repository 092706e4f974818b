"""Full-registry Spark-vs-DuckDB oracle sweep at an arbitrary SF dir.

Replays the driver's t2 correctness comparison (hash of canonicalized
values, schema, row counts) for EVERY oracled query in
__spark_entry__.py — the same harness tests/test_oracle_parity.py runs
at sf0.001, lifted to a CLI so end-of-round sweeps at sf0.1 are one
command instead of an ad-hoc snippet.

Usage: python tools/oracle_sweep.py [sf_dir] [--only q146,q63,...]
Prints one line per query (MATCH / MISMATCH / ERROR) and a final
summary line; exits non-zero if any query mismatches or errors.

Oracle-side memoization (round-11 VERDICT task 5): the five CC-family
oracles (q56/q125/q144/q149/q150) each embed the identical recursive
transitive-closure CTE, which dominates sf0.1 sweep wall (q144: 178s
of its 184s is the DuckDB closure, measured round 11 — NOT an engine
regression). When ≥2 family members ride a sweep, the shared closure
is materialized ONCE as a temp table and the family oracles' common
CTE prefix is rewritten — exact-text surgery on the verbatim
``_components_cte()`` string, exposing the same single name (``comp``)
downstream, so per-oracle semantics are unchanged. ``--no-memo``
disables it (e.g. to time a single oracle honestly end-to-end).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from setu_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare_frames, register_views  # noqa: E402


def memoized_oracles(duck, names, oracles) -> dict[str, str]:
    """Materialize the CC family's shared closure once; return the
    rewritten oracle SQL for every swept query that embeds the verbatim
    CTE (empty dict when fewer than 2 do — a lone member pays the
    closure once either way, and the temp-table detour would only blur
    its standalone timing)."""
    from setu_spark.operators.dedup import _components_cte

    cte = _components_cte()
    family = [n for n in names if cte in oracles.get(n, "")]
    if len(family) < 2:
        return {}
    t0 = time.time()
    duck.execute(
        f"CREATE OR REPLACE TEMP TABLE _cc_comp_memo AS {cte} "
        "SELECT * FROM comp"
    )
    print(
        f"[memo] CC closure materialized once for {family} "
        f"({time.time()-t0:.1f}s)",
        flush=True,
    )
    repl = "WITH comp AS (SELECT * FROM _cc_comp_memo)"
    return {n: oracles[n].replace(cte, repl) for n in family}


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
