"""flashtext-equivalent keyword matching (reference U6 exact semantics).

The reference matches per-language NSFW/stopword/junk keyword lists with
flashtext ``KeywordProcessor.extract_keywords(line, span_info=True)``
(reference filters.py:725-748, constants.py:190-233). The scanner below
is a faithful reimplementation of flashtext's trie automaton — NOT just
the word-boundary rules a summary would state, because the reference's
real lists are INDIC-SCRIPT words and every non-ASCII character sits
OUTSIDE flashtext's word-char set ``[A-Za-z0-9_]``, putting Indic
keywords entirely in the automaton's BOUNDARY branch. The round-8
rewrite fixed a U5-class parity bug: the previous scanner required an
ASCII word-start, so a pure-Devanagari keyword could never match at
all. Semantics, pinned by hand-computed vectors in
tests/test_wordlists.py:

  * **case-insensitive** (flashtext default; the text is lowercased and
    spans index the lowered string, exactly like flashtext),
  * for keywords of WORD chars ``[A-Za-z0-9_]``: match at word
    boundaries only — start at a word start, end at a word end,
  * **boundary-branch matching**: a boundary character (space, punct,
    and EVERY non-ASCII char — all of Devanagari etc.) can both
    CONTINUE a keyword ("hash join"'s space) and START one; keywords
    beginning with a boundary char match mid-text with no word-start
    requirement, and complete at any position whose next char is a
    boundary or end-of-input — so in running Indic text (every char a
    boundary) keywords match like substrings, longest-first,
  * **multi-word keywords** match their exact character sequence
    (single spaces included) — "hash join" does not match "hash  join",
  * **longest match wins** at each position ("slow query" beats "slow"),
  * matches are **non-overlapping, left-to-right greedy**: after a match
    the scan resumes AFTER it, so "hash join order" with keywords
    {"hash join", "join order"} yields only "hash join",
  * flashtext QUIRKS replayed deliberately (the reference_vote_compat
    philosophy — byte parity beats tidiness): (a) after a failed
    word-char trie descent the scan SKIPS past the word's terminating
    boundary char, so a boundary-char keyword immediately after a
    failed partial word match is missed ("ab" prefix dying at "aq"
    skips a following "क"); (b) after a boundary-branch match the scan
    resumes one PAST the match-ending boundary, so an adjacent
    boundary-char keyword at that exact position is skipped.

An extras-gated differential test (tests/test_plug_extras.py) fuzzes
this implementation against real ``flashtext`` when that package is
installed; this container gates it out.

Scale note: this is the per-row library form consumed by Arrow-batched
pandas UDFs (:func:`keyword_dist_udf`) — the keyword list rides in the UDF
closure (broadcast-variable pattern) and the scan is per-document, so the
operator is narrow and embarrassingly parallel. The screening form that
avoids Python entirely (overlap-allowed shingle join) is
``operators/wordlists.py::phrase_hits``.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

from pyspark.sql import functions as F

_WORD_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)


#: trie terminal marker (flashtext uses '_keyword_'; any non-char key works)
_END = "\0end\0"


class KeywordMatcher:
    """Trie-automaton keyword scanner, flashtext-exact (see module doc).

    Keywords are canonicalized to lowercase; matches report the canonical
    form (flashtext's clean-name behavior with identity mapping).
    """

    def __init__(self, keywords: Iterable[str]):
        self._trie: dict = {}
        for k in {k.lower() for k in keywords if k and k.strip()}:
            node = self._trie
            for ch in k:
                node = node.setdefault(ch, {})
            node[_END] = k

    @staticmethod
    def _is_word(ch: str) -> bool:
        return ch in _WORD_CHARS

    def extract(self, text: str) -> list[tuple[str, int, int]]:
        """All (keyword, start, end) spans, greedy left-to-right —
        flashtext's control flow: word chars descend the trie; boundary
        chars (everything else, incl. all non-ASCII) both complete
        pending matches and extend/start matches through the boundary
        branch; failed word-char descents skip to the end of the word."""
        if not text or not self._trie:
            return []
        low = text.lower()
        n = len(low)
        out: list[tuple[str, int, int]] = []
        node = self._trie
        start = 0
        idx = 0
        while idx < n:
            ch = low[idx]
            reset = False
            if ch not in _WORD_CHARS:
                # boundary char: complete and/or extend through it
                if _END in node or ch in node:
                    longest = node.get(_END)
                    end_pos = idx
                    if ch in node:
                        cont = node[ch]
                        idy = idx + 1
                        extended = False
                        while idy < n:
                            inner = low[idy]
                            if inner not in _WORD_CHARS and _END in cont:
                                longest = cont[_END]
                                end_pos = idy
                                extended = True
                            if inner in cont:
                                cont = cont[inner]
                            else:
                                break
                            idy += 1
                        else:  # ran off the end of the text
                            if _END in cont:
                                longest = cont[_END]
                                end_pos = idy
                                extended = True
                        if extended:
                            idx = end_pos
                    if longest is not None:
                        out.append((longest, start, end_pos))
                node = self._trie
                reset = True
            elif ch in node:
                node = node[ch]
            else:
                # failed word-char descent: reset and skip past the
                # rest of this word AND its terminating boundary char
                # (flashtext quirk (a) — a boundary-char keyword right
                # after the failed word is deliberately missed)
                node = self._trie
                reset = True
                idy = idx + 1
                while idy < n and low[idy] in _WORD_CHARS:
                    idy += 1
                idx = idy
            # end-of-input completes a pending word-char match
            if idx + 1 >= n and _END in node:
                out.append((node[_END], start, n))
            idx += 1
            if reset:
                start = idx
        return out

    def dist(self, text: str) -> dict[str, int]:
        """keyword → count map (reference ``get_nsfw_word_dist`` /
        ``get_stop_word_dist`` shape, filters.py:725-748)."""
        return dict(Counter(k for k, _, _ in self.extract(text)))


def keyword_dist_udf(keywords: Iterable[str]):
    """Arrow-batched map<keyword,count> column (U6's ``Map<Str,Int>``
    output, reference analysis.py:32). The matcher is built once per UDF
    instantiation and shipped in the closure."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, MapType, StringType

    matcher = KeywordMatcher(keywords)

    @F.pandas_udf(MapType(StringType(), IntegerType()))
    def _dist(texts):  # no hints: strings unresolvable in closure scope
        return texts.map(lambda t: matcher.dist(t) if t is not None else {})

    return _dist


def keyword_spans_udf(keywords: Iterable[str]):
    """Arrow-batched array<struct<start,end>> spans column (reference
    ``get_nsfw_words_pos`` for_spark=True shape, filters.py:733-740)."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    matcher = KeywordMatcher(keywords)
    schema = ArrayType(
        StructType(
            [StructField("start", IntegerType()), StructField("end", IntegerType())]
        )
    )

    @F.pandas_udf(schema)
    def _spans(texts):  # no hints: strings unresolvable in closure scope
        return texts.map(
            lambda t: [(s, e) for _, s, e in matcher.extract(t)]
            if t is not None
            else []
        )

    return _spans
