"""ANN family one decade up (the CC-stress sibling, round 13).

The committed ANN scale evidence tops out at 200k replicated vectors
(PERF.md "ANN at 100×"), and replicated fixtures are bit-identical
copies — the wrong regime for an inverted file, whose cost model only
shows on DISTINCT vectors. This suite runs the ANN tier on 2M unique
deterministic vectors (``make_stress.make_annscale`` — splitmix64
values, no RNG state) and checks the DISTRIBUTED answers against a
driver-side numpy REPLAY of the same disciplines (round-6 cosines,
argmax ties to the lowest cell, desc-sim/asc-id ordering):

  * q60 brute-force top-k at 2M must equal the numpy full-ranking
    top-k exactly (ids AND round-6 sims) — the TakeOrdered path
    cannot silently drop or misrank rows at a scale where partial
    top-k merging actually fans in from many partitions;
  * q63's IVF answer must equal the numpy replay of the SAME trained
    codebook's probe → scan → top-k, so the mapInPandas
    assign+score+filter pass is value-identical to its spec at 2M
    (not just at the 2k oracle scale);
  * q143's occupancy audit must cover every vector exactly once
    (Σ n_vecs = 2M over ≤ ceil(sqrt(2M)) cells, shares summing to 1)
    with the sqrt-n codebook the production miner trains.

Wall times land in PERF.md round 13. Marked slow: the fixture build +
three queries cost ~2-4 min on local[32]; SETU_SLOW=1 only.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SETU_SLOW"),
    reason="ANN decade-up stress is slow; set SETU_SLOW=1 to run",
)

N_VECTORS = 2_000_000
DIM = 64


@pytest.fixture(scope="module")
def ann_dir():
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    import make_stress

    d = tempfile.mkdtemp(prefix="annstress_ci_")
    t0 = time.time()
    make_stress.make_annscale(d, N_VECTORS, DIM)
    print(f"[annstress] fixture build {time.time() - t0:.1f}s")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def corpus(ann_dir):
    """The full fixture as (float64 matrix, int64 vec_ids) — 2M × 64
    doubles ≈ 1 GB, the driver-side ground truth for every replay."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(ann_dir, "embeddings.parquet"))
    mat = np.stack(t["embedding"].to_pandas().values).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    assert mat.shape == (N_VECTORS, DIM)
    return mat, ids


def _round6_cosines(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    from setu_spark.operators.similarity import round6_away

    num = mat @ q
    den = np.sqrt((mat * mat).sum(axis=1)) * np.sqrt((q * q).sum())
    return round6_away(num / den)


def _topk(sims: np.ndarray, ids: np.ndarray, k: int):
    """(sim desc, id asc) top-k — the q60/q63 ordering contract."""
    order = np.lexsort((ids, -sims))
    return [(int(ids[i]), float(sims[i])) for i in order[:k]]


def test_brute_topk_two_million(spark, ann_dir, corpus):
    from setu_spark.operators.similarity import BRUTE_TOPK, q60_cosine_topk

    t0 = time.time()
    got = q60_cosine_topk(spark, ann_dir).collect()
    wall = time.time() - t0
    print(f"[annstress] q60 brute top-k over {N_VECTORS}: {wall:.1f}s")
    assert len(got) == BRUTE_TOPK

    mat, ids = corpus
    sims = _round6_cosines(mat[1:], mat[0])
    want = _topk(sims, ids[1:], BRUTE_TOPK)
    assert [(r["vec_id"], r["cosine_sim"]) for r in got] == want


def test_ivf_topk_two_million(spark, ann_dir, corpus):
    from setu_spark.operators.similarity import (
        IVF_TOPK,
        N_CENTROIDS,
        N_PROBE,
        load_vectors,
        q63_ann_ivf_topk,
        round6_away,
        train_codebook,
    )

    t0 = time.time()
    got = q63_ann_ivf_topk(spark, ann_dir).collect()
    wall = time.time() - t0
    print(f"[annstress] q63 IVF top-k over {N_VECTORS}: {wall:.1f}s")
    assert len(got) == IVF_TOPK

    # numpy replay of the SAME trained codebook (memoized — this is
    # the codebook the query itself used): assign all vectors, probe
    # the query's N_PROBE best cells, top-k the probed subset
    mat, ids = corpus
    cmat = train_codebook(load_vectors(spark, ann_dir), N_CENTROIDS)
    q = mat[0]
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    qc = round6_away(
        (cmat * q).sum(axis=1) / (cnorm * np.sqrt((q * q).sum()))
    )
    probe = set(np.argsort(-qc, kind="stable")[:N_PROBE].tolist())
    body, bids = mat[1:], ids[1:]
    cs = round6_away(
        (body @ cmat.T)
        / (np.sqrt((body * body).sum(axis=1))[:, None] * cnorm[None, :])
    )
    cell = np.argmax(cs, axis=1)
    keep = np.isin(cell, list(probe))
    want = _topk(_round6_cosines(body[keep], q), bids[keep], IVF_TOPK)
    assert [(r["vec_id"], r["cosine_sim"]) for r in got] == want
    assert all(r["cell"] in probe for r in got)


def test_cell_balance_two_million(spark, ann_dir):
    import math

    from setu_spark.operators.similarity import q143_ivf_cell_balance

    n_cells = int(math.ceil(math.sqrt(float(N_VECTORS))))
    t0 = time.time()
    rows = q143_ivf_cell_balance(spark, ann_dir).collect()
    wall = time.time() - t0
    print(
        f"[annstress] q143 occupancy over {N_VECTORS} "
        f"({n_cells}-cell codebook): {wall:.1f}s"
    )
    # every vector assigned exactly once, to a real cell
    assert sum(r["n_vecs"] for r in rows) == N_VECTORS
    assert 0 < len(rows) <= n_cells
    assert all(0 <= r["cell"] < n_cells for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    # load_factor is share × n_cells by definition — internal
    # consistency of the audit's own arithmetic
    for r in rows:
        assert r["load_factor"] == pytest.approx(
            r["share"] * n_cells, abs=2e-3
        )
