#!/usr/bin/env python
"""Regenerate QUERIES.md — the auto-generated index of the declared query
corpus. Run from the repo root after adding/removing registered queries:

    python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    m = re.search(r"(.+?\.)(\s|$)", text)
    out = (m.group(1) if m else text)[:190]
    return out.replace("|", "\\|")


def main() -> None:
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    lines = [
        "# QUERIES — the declared corpus (auto-generated index)",
        "",
        f"{len(queries)} queries, {len(oracles)} with DuckDB oracles (the"
        " rest are the",
        "contract's rows-only carve-outs: model inference, stubbed decode,",
        "iterative fixpoint). Descriptions are the first docstring sentence;",
        "see the implementation for the full scale notes.",
        "",
        "| query | oracle | summary |",
        "|---|---|---|",
    ]
    for name in sorted(queries):
        mark = "✓" if name in oracles else "rows-only"
        lines.append(
            f"| {name} | {mark} | {first_sentence(queries[name].__doc__)} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(queries)} queries, {len(oracles)} oracles")


if __name__ == "__main__":
    main()
