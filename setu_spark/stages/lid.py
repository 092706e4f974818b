"""Language-identification stage — the ML-inference pattern.

The reference runs a 3-model LID ensemble inside ``rdd.mapPartitionsWith
Index`` with per-partition model loading and a hard vote (lid.py:435-660,
SURVEY.md U19/R3). The rebuild keeps the *shape* — per-worker model
singleton, batched inference, majority vote — but as ``mapInPandas``
(Arrow-batched, one DataFrame end to end, no RDD hop) behind a pluggable
detector interface.

Heavy models (IndicLID / NLLB-fasttext / cld3) are not available in this
container, so the default detector is a deterministic n-gram/stopword
heuristic — the real models plug in by registering another ``Detector``.
The vote implements the *intended* probability-threshold semantics: the
reference counts a vote in both branches of the threshold check, making the
threshold a no-op (defect, lid.py:575-578 / SURVEY.md §4.1); here a
below-threshold prediction abstains.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: per-language stopword profiles for the heuristic tier, loaded from the
#: ``data/lid_profiles/<lang>.txt`` files (the reference loads the same
#: per-language lists driver-side in constants.py:82-88 and ships them in
#: closures). Real deployments replace the heuristic with model detectors.
from setu_spark.operators.wordlists import load_stopword_profiles

STOPWORD_PROFILES: dict[str, tuple[str, ...]] = load_stopword_profiles()

Detector = Callable[[pd.Series], pd.DataFrame]  # text → (lang, prob)


@dataclass
class _HeuristicModel:
    """Deterministic stand-in for a fasttext-style LID model. Loaded once
    per Python worker (the mapInPandas closure caches it), mirroring the
    reference's per-partition model singleton (lid.py:588-660)."""

    profiles: dict[str, tuple[str, ...]]

    def predict(self, texts: pd.Series) -> pd.DataFrame:
        langs, probs = [], []
        for t in texts.fillna(""):
            toks = t.split(" ")
            n = max(len(toks), 1)
            scores = {
                lang: sum(toks.count(w) for w in words) / n
                for lang, words in self.profiles.items()
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            langs.append(best if scores[best] > 0 else "und")
            probs.append(float(scores[best]))
        return pd.DataFrame({"lang": langs, "prob": probs})


@dataclass
class _CharNgramModel:
    """Second deterministic detector tier: scores languages by occurrence
    density of distinctive character bigrams — the shape of cld3-style
    character-n-gram LID, deterministic so tests can pin the vote."""

    profiles: dict[str, tuple[str, ...]]

    def predict(self, texts: pd.Series) -> pd.DataFrame:
        langs, probs = [], []
        for t in texts.fillna(""):
            n = max(len(t), 1)
            scores = {
                lang: sum(t.count(g) for g in grams) / n
                for lang, grams in self.profiles.items()
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            langs.append(best if scores[best] > 0 else "und")
            probs.append(float(scores[best]))
        return pd.DataFrame({"lang": langs, "prob": probs})


#: distinctive char bigrams per language for the charngram tier
CHAR_NGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("th", "he", "ng", "wh"),
    "de": ("ch", "ei", "un", "sch"),
    "fr": ("ou", "qu", "eu", "oi"),
    "es": ("ll", "os", "ñ", "ci"),
}


def _fnv1a(word: str) -> int:
    """FNV-1a 32-bit over UTF-8 bytes — fasttext's dictionary hash."""
    h = 2166136261
    for b in word.encode("utf-8"):
        h = (h ^ b) * 16777619 & 0xFFFFFFFF
    return h


class FasttextStyleModel:
    """REAL-MODEL tier: a file-loaded LID model in the fasttext
    *supervised* architecture (the reference's NLLB-fasttext /
    IndicLID shape, lid.py:435-583): FNV-1a-hashed bag-of-words →
    mean input embedding → linear output layer → softmax → (label,
    prob). The artifact is an .npz with ``input`` [buckets × dim],
    ``output`` [labels × dim], ``labels``, ``buckets`` — the vendored
    few-KB fixture at :data:`TINY_LID_PATH` ships in-repo so this
    path (load from disk, batch predict, vote, threshold abstention)
    executes in pytest (round-6 VERDICT task 6); a production
    deployment points the factory at its own multi-MB artifact.

    Unlike the heuristic tiers this model ALWAYS emits a label
    (softmax has an argmax) — abstention happens purely through the
    ensemble's probability threshold, exactly fasttext-LID's
    deployment contract. Text with no in-vocabulary word hits scores
    a uniform softmax (prob = 1/|labels|), which a threshold above
    that turns into an abstain."""

    def __init__(self, path: str):
        import numpy as np

        with np.load(path, allow_pickle=False) as z:
            self.input = z["input"].astype("float64")
            self.output = z["output"].astype("float64")
            self.labels = [str(x) for x in z["labels"]]
            self.buckets = int(z["buckets"])

    def predict(self, texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        langs, probs = [], []
        for t in texts.fillna(""):
            words = [w for w in t.split(" ") if w]
            if words:
                ids = [_fnv1a(w) % self.buckets for w in words]
                h = self.input[ids].mean(axis=0)
            else:
                h = np.zeros(self.input.shape[1])
            logits = self.output @ h
            e = np.exp(logits - logits.max())
            p = e / e.sum()
            i = int(np.argmax(p))
            langs.append(self.labels[i])
            probs.append(float(p[i]))
        return pd.DataFrame({"lang": langs, "prob": probs})


#: vendored few-KB model artifact (tools/make_tiny_lid.py regenerates).
#: Resolved PACKAGE-relative like every other data file (wordlists.py
#: DATA_ROOT convention) so [tool.setuptools.package-data]'s
#: setu_spark = ["data/**/*"] ships it on pip install — a repo-root
#: data/ path exists only in the source checkout.
TINY_LID_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "lid_models", "tiny_lid.npz",
)


# --------------------------------------------------------- detector registry

#: name → zero-arg factory returning a loaded model. The registry is the
#: plug point the reference lacks an interface for (its 3 models are
#: hard-wired inside run_lid, lid.py:588-660): a real deployment registers
#:   register_detector("indiclid", lambda: IndicLIDWrapper(model_path))
#: and lists the name in ``detectors=`` / the stage config. Factories run
#: lazily on each Python WORKER (not the driver) and the loaded model is
#: cached per worker process — exactly the reference's per-partition model
#: singleton, minus the reload-per-partition cost.
DETECTOR_FACTORIES: dict[str, Callable[[], Detector]] = {}


def register_detector(name: str, factory: Callable[[], object]) -> None:
    DETECTOR_FACTORIES[name] = factory


register_detector("stopword", lambda: _HeuristicModel(STOPWORD_PROFILES))
register_detector(
    "charngram", lambda: _CharNgramModel(CHAR_NGRAM_PROFILES)
)
# the file-loaded real-model tier: the factory captures only the PATH —
# the numpy matrices load lazily on each worker (per-process cache),
# the same deployment shape as pointing this at a multi-MB lid.bin
register_detector("tinylid", lambda: FasttextStyleModel(TINY_LID_PATH))

#: per-worker-process loaded-model cache, keyed by detector name
_MODEL_CACHE: dict[str, object] = {}


def predict_lid(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probability_threshold: float = 0.0,
    detectors: tuple[str, ...] = ("stopword",),
    reference_vote_compat: bool = False,
) -> DataFrame:
    """mapInPandas LID ensemble: (id, text) in, (id, lang, prob, per-model
    labels) out.

    Vote semantics are the reference's INTENDED ones (U19): each named
    detector predicts (lang, prob); a prediction below
    ``probability_threshold`` or equal to 'und' ABSTAINS (the reference
    counts a vote in both branches of the threshold check, making the
    threshold a no-op — defect lid.py:575-578); the majority of
    non-abstaining votes wins, ties break deterministically by
    (votes desc, lang asc); zero votes → 'und'. ``lid_prob`` is the
    highest probability among the winner's voters. ``model_langs`` is the
    per-model label map (reference lid.py:686's ``MapType`` column).

    ``reference_vote_compat=True`` replays the reference's OBSERVABLE
    defect exactly (SURVEY.md §4.1): ``hard_vote`` counts a vote in both
    branches of the probability check, so below-threshold predictions
    still vote and ``probability_threshold`` is a no-op — only the
    'und' abstention survives. Outputs under the flag match a reference
    deployment byte-for-byte where the defect changes the winner.

    Scale: Arrow-batched, models cached per worker, only the two needed
    columns cross the JVM↔Python boundary (column pruning — the reference
    ships whole rows)."""
    # keep the caller's id type so the join back is type-exact
    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("pred_lang", StringType()),
            StructField("lid_prob", DoubleType()),
            StructField("model_langs", MapType(StringType(), StringType())),
        ]
    )

    # resolve names → factories DRIVER-side (workers never see the
    # registry dict — a detector registered mid-session would be missing
    # from their imported module copy); the factories ride the closure and
    # the loaded models cache per worker process
    factories = [(name, DETECTOR_FACTORIES[name]) for name in detectors]

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        models = []
        for name, factory in factories:
            if name not in _MODEL_CACHE:  # setdefault would load eagerly
                _MODEL_CACHE[name] = factory()
            models.append((name, _MODEL_CACHE[name]))
        for pdf in batches:
            preds = {name: m.predict(pdf[text_col]) for name, m in models}
            out_lang, out_prob, out_map = [], [], []
            for i in range(len(pdf)):
                votes: dict[str, list[float]] = {}
                labels = {}
                for name, _ in models:
                    lang = preds[name]["lang"].iat[i]
                    prob = float(preds[name]["prob"].iat[i])
                    labels[name] = lang
                    if lang != "und" and (
                        reference_vote_compat
                        or prob >= probability_threshold
                    ):
                        votes.setdefault(lang, []).append(prob)
                if votes:
                    winner = max(
                        sorted(votes), key=lambda k: (len(votes[k]),)
                    )
                    out_lang.append(winner)
                    out_prob.append(max(votes[winner]))
                elif pdf[text_col].iat[i] is None:
                    # NULL text has no prediction CONFIDENCE — 'und'
                    # with a NULL prob, not 0.0 (a zero is a real
                    # measured confidence; a missing text has none) —
                    # matching the SQL replay's NULL propagation
                    out_lang.append("und")
                    out_prob.append(None)
                else:
                    out_lang.append("und")
                    out_prob.append(0.0)
                out_map.append(labels)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pred_lang": out_lang,
                    "lid_prob": pd.array(out_prob, dtype="Float64"),
                    "model_langs": out_map,
                }
            )

    narrow = docs.select(id_col, text_col)
    return narrow.mapInPandas(infer, schema=schema)


def attach_lid(docs: DataFrame, id_col: str = "doc_id",
               partition_col: str = "doc_lang") -> DataFrame:
    """LID result joined back (J1) + partition column for the partitioned
    sink (S7) — the reference's lid.py:708/820 flow."""
    preds = predict_lid(docs, id_col=id_col)
    return docs.join(preds, id_col, "left").withColumn(
        partition_col, F.coalesce(F.col("pred_lang"), F.lit("und"))
    )
