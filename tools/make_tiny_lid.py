#!/usr/bin/env python
"""Build the vendored tiny LID model fixture (setu_spark/data/lid_models/tiny_lid.npz).

The artifact is a real on-disk model in the fasttext *supervised*
architecture (reference lid.py:435-583 runs exactly this shape through
NLLB-fasttext): FNV-1a-hashed bag-of-words → mean input embedding →
linear output layer → softmax. We craft the weights instead of running
an SGD loop — each language's stopwords map to alpha-scaled one-hot
input rows, so prediction probabilities are exact, deterministic
functions of stopword counts (what the pytest vote/threshold
assertions need), while the LOADER exercises the same load/batch/
predict path a real few-MB lid.bin would.

Usage: python tools/make_tiny_lid.py   (writes the .npz; idempotent)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
# The generator MUST hash with the loader's own function: a private copy
# here would silently desync the artifact's stopword rows from the
# loader's bucket ids if either side ever changed variants.
from setu_spark.stages.lid import _fnv1a as fnv1a  # noqa: E402


LABELS = ("de", "en", "es", "fr")  # sorted; row i of `output` scores LABELS[i]
BUCKETS = 512
ALPHA = 8.0  # logit scale: one stopword hit → prob ~0.999 for its language

#: the same stopword inventory the heuristic tier uses, so the two
#: detectors agree on clear-cut text and the vote tests can stage
#: agreement AND conflict deterministically
SEEDS = {
    "en": ("the", "and", "of", "to", "in", "is", "was", "for"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ein", "mit"),
    "es": ("el", "la", "de", "que", "y", "los", "se", "por"),
    "fr": ("le", "la", "les", "et", "des", "une", "est", "dans"),
}


def main() -> None:
    dim = len(LABELS)
    inp = np.zeros((BUCKETS, dim), dtype=np.float32)
    for li, lang in enumerate(LABELS):
        for w in SEEDS[lang]:
            inp[fnv1a(w) % BUCKETS, li] += ALPHA
    out = np.eye(dim, dtype=np.float32)
    # write INSIDE the package data tree so package-data ships it
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "setu_spark", "data", "lid_models", "tiny_lid.npz",
    )
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez_compressed(
        dst,
        input=inp,
        output=out,
        labels=np.array(LABELS),
        buckets=np.int64(BUCKETS),
    )
    print(f"wrote {dst} ({os.path.getsize(dst)} bytes)")


if __name__ == "__main__":
    main()
