#!/usr/bin/env python
"""Window-rotation helper: per-query last-green round from the
CORRECTNESS_r*.json history vs the registered catalog.

The driver checks roughly the first 50 entries of ``queries()`` each
round (__spark_entry__._FRONT pins the order), so stale families must be
rotated back in deliberately. This prints the staleness table the
rotation decision needs:

  never    — registered but no green driver row in any round (highest
             priority: new queries, or ones that always missed the window)
  r<N>     — last green (hash_match, or rows-only with a row count) in
             round N; older rounds sort first

Usage: python tools/staleness.py   (run from the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys


def main() -> None:
    last: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        for name, row in json.load(open(path)).items():
            green = row.get("hash_match") or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    # registry via ONE subprocess so this tool never holds a
    # SparkSession; a failed import must abort loudly — an empty name
    # list would silently hide the 'never' bucket, the one output the
    # rotation decision depends on.
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __spark_entry__ as e;"
         "[print('Q', n) for n in e.queries()];"
         "[print('F', n) for n in e._FRONT]"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": "."},
    )
    if proc.returncode != 0 or not proc.stdout.strip():
        sys.exit(f"registry import failed (run from the repo root):\n"
                 f"{proc.stderr}")
    names = [l[2:] for l in proc.stdout.splitlines() if l.startswith("Q ")]
    front = {l[2:] for l in proc.stdout.splitlines() if l.startswith("F ")}
    by_round: dict[int, list[str]] = {}
    for n in names:
        by_round.setdefault(last.get(n, 0), []).append(n)
    for rnd in sorted(by_round):
        label = "never" if rnd == 0 else f"r{rnd:02d}"
        qs = sorted(by_round[rnd])
        inw = sum(1 for q in qs if q in front)
        print(f"last-green {label} ({len(qs)} queries, {inw} in current"
              f" window): {' '.join(qs)}")


if __name__ == "__main__":
    main()
