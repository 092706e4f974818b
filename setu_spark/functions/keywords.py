"""flashtext-equivalent keyword matching (reference U6 exact semantics).

The reference matches per-language NSFW/stopword/junk keyword lists with
flashtext ``KeywordProcessor.extract_keywords(line, span_info=True)``
(reference filters.py:725-748, constants.py:190-233). The semantics that
matter — pinned here and unit-tested against hand-computed spans:

  * **case-insensitive** (flashtext default),
  * matches only at **word boundaries**: a word char is ``[A-Za-z0-9_]``
    (flashtext's default ``non_word_boundaries`` set); a match must start
    at a word start and end at a word end,
  * **multi-word keywords** match their exact character sequence
    (single spaces included) — "hash join" does not match "hash  join",
  * **longest match wins** at each position ("slow query" beats "slow"),
  * matches are **non-overlapping, left-to-right greedy**: after a match
    the scan resumes AFTER it, so "hash join order" with keywords
    {"hash join", "join order"} yields only "hash join".

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


class KeywordMatcher:
    """Greedy longest-match keyword scanner with flashtext semantics.

    Keywords are canonicalized to lowercase; matches report the canonical
    form (flashtext's clean-name behavior with identity mapping).
    """

    def __init__(self, keywords: Iterable[str]):
        kws = sorted(
            {k.lower() for k in keywords if k and k.strip()},
            key=len,
            reverse=True,
        )
        # first-char index; within a bucket keep the longest-first order so
        # the first hit is the longest match
        self._by_first: dict[str, list[str]] = {}
        for k in kws:
            self._by_first.setdefault(k[0], []).append(k)
        self._max_len = max((len(k) for k in kws), default=0)

    @staticmethod
    def _is_word(ch: str) -> bool:
        return ch in _WORD_CHARS

    def extract(self, text: str) -> list[tuple[str, int, int]]:
        """All (keyword, start, end) spans, greedy left-to-right."""
        if not text or not self._max_len:
            return []
        low = text.lower()
        n = len(low)
        out: list[tuple[str, int, int]] = []
        i = 0
        while i < n:
            ch = low[i]
            at_word_start = self._is_word(ch) and (
                i == 0 or not self._is_word(low[i - 1])
            )
            if at_word_start:
                for k in self._by_first.get(ch, ()):
                    j = i + len(k)
                    if (
                        j <= n
                        and low[i:j] == k
                        and (j == n or not self._is_word(low[j]))
                    ):
                        out.append((k, i, j))
                        i = j
                        break
                else:
                    i += 1
                    continue
                continue
            i += 1
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
