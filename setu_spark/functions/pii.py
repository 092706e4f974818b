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
One documented exception: ``\\b``. Java's word-boundary is
Unicode-aware REGARDLESS of UNICODE_CHARACTER_CLASS (a long-standing
JDK asymmetry: ``\\w`` is ASCII by default but ``\\b`` consults
Unicode word characters), while RE2's ``\\b`` is strictly ASCII — so
``1.2.3.4五`` or ``8901१`` is a boundary under RE2 but NOT under the
JVM. Found by the round-13 wide-unicode fuzz
(tests/test_privacy.py::test_pii_twins_wide_unicode_fuzz). The engine
standardizes on the ASCII semantics: for PII masking, a CJK/Indic
character abutting an IP must not SUPPRESS redaction (under-masking is
the unsafe failure), and ASCII-``\\b`` is the one spelling both
engines can replay exactly — the JVM side rewrites ``\\b`` to an
explicit ASCII-class lookaround alternation (:data:`_JVM_ASCII_B`,
zero-width, so counts and replacement spans are unchanged), the RE2
side keeps ``\\b`` verbatim.

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


#: ASCII word-boundary spelled as a zero-width lookaround alternation —
#: the JVM replacement for ``\b`` (see module docstring). Equivalent to
#: RE2's ASCII ``\b`` at every position: a boundary is exactly "ASCII
#: word char on one side, not on the other (or string edge)".
_ASCII_W = "0-9A-Za-z_"
_JVM_ASCII_B = (
    f"(?:(?<=[{_ASCII_W}])(?![{_ASCII_W}])"
    f"|(?<![{_ASCII_W}])(?=[{_ASCII_W}]))"
)


def _jvm_pattern(pat: str) -> str:
    """The Spark spelling of an RE2 pattern: ``\\b`` rewritten to the
    explicit ASCII boundary (Java's own ``\\b`` is Unicode-aware and
    would silently under-match next to non-ASCII word characters).

    The rewrite is a blind two-char replace, which is only sound when
    every ``\\b`` in the pattern IS a word boundary — inside a
    character class it means backspace, and after an escaped backslash
    (``\\\\b``) it's a literal. Neither occurs in a sane PII pattern,
    so both are REJECTED here rather than silently corrupted (the
    failure would otherwise be a JVM-only bad rewrite the RE2 oracle
    twin can't see)."""
    in_class = False
    i = 0
    while i < len(pat):
        c = pat[i]
        if c == "\\":
            nxt = pat[i + 1 : i + 2]
            assert nxt != "\\", (
                f"pattern {pat!r} escapes a backslash — the blind "
                "\\b->ASCII-boundary rewrite would corrupt it"
            )
            assert not (in_class and nxt == "b"), (
                f"pattern {pat!r} uses \\b as backspace inside a "
                "character class — the blind \\b->ASCII-boundary "
                "rewrite would corrupt it"
            )
            i += 2
            continue
        if c == "[":
            in_class = True
        elif c == "]":
            in_class = False
        i += 1
    return pat.replace(r"\b", _JVM_ASCII_B)


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII kind in ``col`` (codegen'd
    ``regexp_count``; DuckDB twin ``len(regexp_extract_all(...))``)."""
    pat, _ = PII_PATTERNS[kind]
    return F.regexp_count(F.col(col) if isinstance(col, str) else col,
                          F.lit(_jvm_pattern(pat)))


def redact_pii(col: Column | str, kinds: tuple[str, ...] | None = None
               ) -> Column:
    """Replace every PII match with its kind token, applying patterns
    in declared order (chained ``regexp_replace`` — one projection,
    still codegen'd)."""
    out = F.col(col) if isinstance(col, str) else col
    for kind in kinds or tuple(PII_PATTERNS):
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, _jvm_pattern(pat), repl)
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
