"""PII detection / redaction — native regex scalar family.

A training-data pipeline must find and mask personally-identifying
strings (emails, phone numbers, IP addresses, long ID numbers) before a
corpus ships. The reference stops at NSFW-word filtering
(setu/filters.py:733-748); this module adds the PII pass every
production curation run performs (the same shape as e.g. BigScience
ROOTS / Dolma PII masking), expressed entirely as JVM-side regex
expressions — no UDFs, so the scan stays inside whole-stage codegen
and the filter pushes down like any other native projection.

Pattern dialect is the RE2-compatible subset (no backrefs, no
lookaround) so the SAME pattern string runs identically under Spark's
Java regex and DuckDB's RE2 — the oracle twin is exact, not "close".

At 100 TB: per-row regex work, zero shuffle, and redaction rewrites
the text column in place during an existing projection — PII masking
adds no stage to whatever plan it is embedded in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: kind -> (RE2-safe pattern, replacement token). Order matters for
#: redaction (EMAIL before ID_NUM so the digits inside an address are
#: consumed by the more specific pattern first); redact_pii applies
#: them in this declared order in BOTH engines.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "ipv4": (
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
    "phone": (
        # +country or 3+ dash/space-separated digit groups, ≥9 digits
        # total the way real-world CRM exports format them.
        r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}",
        "<PHONE>",
    ),
    "id_num": (
        # bare long digit runs (account / national-ID shaped).
        r"[0-9]{5,}",
        "<ID>",
    ),
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII kind in ``col`` (codegen'd
    ``regexp_count``; DuckDB twin ``len(regexp_extract_all(...))``)."""
    pat, _ = PII_PATTERNS[kind]
    return F.regexp_count(F.col(col) if isinstance(col, str) else col,
                          F.lit(pat))


def redact_pii(col: Column | str, kinds: tuple[str, ...] | None = None
               ) -> Column:
    """Replace every PII match with its kind token, applying patterns
    in declared order (chained ``regexp_replace`` — one projection,
    still codegen'd)."""
    out = F.col(col) if isinstance(col, str) else col
    for kind in kinds or tuple(PII_PATTERNS):
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count_sql(expr: str, kind: str) -> str:
    """DuckDB twin of :func:`pii_count`."""
    pat, _ = PII_PATTERNS[kind]
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def redact_pii_sql(expr: str, kinds: tuple[str, ...] | None = None) -> str:
    """DuckDB twin of :func:`redact_pii` (global-flag replace, same
    declared order)."""
    out = expr
    for kind in kinds or tuple(PII_PATTERNS):
        pat, repl = PII_PATTERNS[kind]
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out
