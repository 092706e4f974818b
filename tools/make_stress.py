#!/usr/bin/env python
"""Build the N×-replicated stress corpus used for the PERF.md scaling
sweeps: documents / embeddings / events from a source SF dir, each
replicated with id offsets so every copy is id-distinct (duplicate TEXT
density rises with N by design — that's the point of the sweep: banded
near-dup cost follows true-duplicate density; see PERF.md's 20× table).

Usage: python tools/make_stress.py [src_sf_dir] [dst_dir] [N]
       python tools/make_stress.py --vocab [dst_dir] [n_docs] [words_per_doc]
       python tools/make_stress.py --dupdense [src_sf_dir] [dst_dir] [N]
       python tools/make_stress.py --annscale [dst_dir] [n_vectors]
Defaults: /root/testdata/sf0.1 /tmp/stress100k 20
          --vocab: /tmp/vocabstress 50000 100
          --dupdense: /root/testdata/sf0.001 /tmp/dupdense 20
          --annscale: /tmp/annstress2m 2000000

--annscale builds the UNIQUE-vector ANN corpus (round-13 fixture, the
CC-stress sibling): n deterministic 64-dim float32 vectors, every one
distinct — the replication fixtures are bit-identical copies, the
wrong regime for an inverted file (tests/test_ann_scale_stress.py).

--dupdense is the DUPLICATE-DENSITY fixture (round-10 VERDICT task 6,
promoted to CI from the hand-run /tmp sweep that found q123's
quadratic pairwise stage): documents + embeddings ONLY, each source
row replicated N times with id offsets — every text and every vector
becomes an N-clique of bit-identical copies, the regime where raw
pairwise forms pay C(N,2) per value and the collapse-first hybrids
must both DISPATCH and win (tests/test_dupdense_stress.py).

--vocab builds the UNIQUE-WORD corpus (round-9 PERF.md fixture,
committed per round-9 VERDICT task 4): every word in every document is
globally unique (w<i>), so |vocabulary| = n_docs × words_per_doc. The
stock corpora have a ~31-word vocabulary, which makes any
vocabulary-shaped cost INVISIBLE at every replication factor — this is
the fixture that exposed q121/q132's single-task global windows (5M
distinct words at the defaults; 200000 docs → the 20M 'vocabstress20'
variant). Only documents.parquet is written: the vocabulary queries
read nothing else.

The three big tables replicate with per-table id offsets. The
relational facts replicate too, with orders and lineitem sharing ONE
orderkey offset so the orders⋈lineitem join stays intact (each copy is
a fresh batch of orders by the same customers/parts/suppliers — the
realistic scale-up); dims copy verbatim so every dim join resolves.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}

#: fact tables sharing the orderkey offset; dims copied verbatim
FACT_KEYS = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
DIMS = ("customer", "supplier", "part", "nation", "region")

#: Row-group size for the stress parquet: pyarrow's default writes ONE
#: row group per table, and a single-row-group file is unsplittable --
#: Spark's byte-range splits all resolve to the one task that owns the
#: group midpoint, so CPU-heavy text kernels measured 1-way-parallel
#: (q146 read 33s at 100x where the same plan runs 3s once the scan
#: can fan out). Production 100 TB files always have many row groups;
#: the fixture must too, or every stress number under-reports the
#: engine.
ROW_GROUP = 8192


def replicate(src: str, dst: str, n: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name, id_cols in TABLES.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        offsets = {
            c: pc.max(t[c]).as_py() + 1 for c in id_cols
        }
        copies = []
        for i in range(n):
            cols = {}
            for c in t.column_names:
                if c in id_cols and i > 0:
                    cols[c] = pc.add(t[c], i * offsets[c])
                else:
                    cols[c] = t[c]
            copies.append(pa.table(cols))
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=ROW_GROUP)
        print(f"{name}: {len(t)} -> {len(out)} rows")

    # relational facts: one shared orderkey stride keeps orders⋈lineitem
    # join-consistent across copies; every other key column (custkey,
    # partkey, suppkey) is left as-is so dim joins resolve unchanged
    orders = pq.read_table(os.path.join(src, "orders.parquet"))
    stride = pc.max(orders["o_orderkey"]).as_py() + 1
    for name, key in FACT_KEYS.items():
        t = (orders if name == "orders"
             else pq.read_table(os.path.join(src, f"{name}.parquet")))
        copies = []
        for i in range(n):
            cols = {
                c: (pc.add(t[c], i * stride) if c == key and i > 0 else t[c])
                for c in t.column_names
            }
            copies.append(pa.table(cols))
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=ROW_GROUP)
        print(f"{name}: {len(t)} -> {len(out)} rows")
    for name in DIMS:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=ROW_GROUP)
        print(f"{name}: copied verbatim ({len(t)} rows)")


def make_dupdense(src: str, dst: str, n: int) -> None:
    """Duplicate-dense documents + embeddings: the TABLES id-offset
    replication restricted to the two tables the dedup hybrids read —
    cheap enough (sf0.001 × 20 ≈ 10k docs) to rebuild inside a CI
    fixture."""
    os.makedirs(dst, exist_ok=True)
    for name, id_cols in (("documents", ["doc_id"]),
                          ("embeddings", ["vec_id"])):
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        offsets = {c: pc.max(t[c]).as_py() + 1 for c in id_cols}
        copies = []
        for i in range(n):
            cols = {
                c: (pc.add(t[c], i * offsets[c])
                    if c in id_cols and i > 0 else t[c])
                for c in t.column_names
            }
            copies.append(pa.table(cols))
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=ROW_GROUP)
        print(f"{name}: {len(t)} -> {len(out)} rows ({n}-cliques)")


def make_vocab(dst: str, n_docs: int, words_per_doc: int) -> None:
    """Unique-word documents table: doc i holds words
    ``w{i*wpd} .. w{(i+1)*wpd - 1}`` — deterministic, no RNG, every
    word distinct across the whole corpus.  Schema matches the
    testdata documents table so every registered query runs on it
    unchanged."""
    os.makedirs(dst, exist_ok=True)
    langs = ("en", "hi", "ta", "bn")
    batches = []
    BATCH = 10_000
    for lo in range(0, n_docs, BATCH):
        hi = min(lo + BATCH, n_docs)
        texts, ids, lang_col, src_col, nch = [], [], [], [], []
        for i in range(lo, hi):
            base = i * words_per_doc
            text = " ".join(
                f"w{j}" for j in range(base, base + words_per_doc)
            )
            ids.append(i)
            texts.append(text)
            lang_col.append(langs[i % len(langs)])
            src_col.append(f"src{i % 5}")
            nch.append(len(text))
        batches.append(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(lang_col, pa.string()),
                    "source": pa.array(src_col, pa.string()),
                    "n_chars": pa.array(nch, pa.int64()),
                }
            )
        )
    out = pa.concat_tables(batches)
    pq.write_table(
        out, os.path.join(dst, "documents.parquet"),
        row_group_size=ROW_GROUP,
    )
    print(
        f"documents: {len(out)} rows, "
        f"{n_docs * words_per_doc} distinct words -> {dst}"
    )


def make_annscale(dst: str, n: int, dim: int = 64) -> None:
    """UNIQUE-vector corpus for the ANN decade-up sweep (the CC-stress
    sibling): ``n`` deterministic 64-dim float32 vectors, every one
    distinct — the regime where IVF's cost model (scan ~ nprobe/cells
    of the corpus, codebook ~ sqrt(n) cells) is actually exercised.
    The id-offset replication fixtures CANNOT probe this: every copy
    is bit-identical, so the vector-distinct collapse paths swallow
    the scale before the index sees it.

    Values are splitmix64(vec_id·dim + i) mapped to [-1, 1) — no RNG
    state, rebuildable bit-identically anywhere. vec_id 0 doubles as
    the q60/q63 query vector; label = vec_id % 10 matches the stock
    schema. Only embeddings.parquet is written (the ANN family reads
    nothing else)."""
    import numpy as np

    os.makedirs(dst, exist_ok=True)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    path = os.path.join(dst, "embeddings.parquet")
    chunk = 262_144
    with pq.ParquetWriter(path, schema) as writer:
        for start in range(0, n, chunk):
            cnt = min(chunk, n - start)
            idx = np.arange(
                start * dim, (start + cnt) * dim, dtype=np.uint64
            )
            with np.errstate(over="ignore"):
                z = idx + np.uint64(0x9E3779B97F4A7C15)
                z = (z ^ (z >> np.uint64(30))) * np.uint64(
                    0xBF58476D1CE4E5B9
                )
                z = (z ^ (z >> np.uint64(27))) * np.uint64(
                    0x94D049BB133111EB
                )
                z = z ^ (z >> np.uint64(31))
            vals = (
                (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)
            ) * 2.0 - 1.0
            emb = pa.ListArray.from_arrays(
                pa.array(
                    np.arange(0, (cnt + 1) * dim, dim, dtype=np.int32)
                ),
                pa.array(vals.astype(np.float32)),
            )
            vec_ids = np.arange(start, start + cnt, dtype=np.int64)
            writer.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(vec_ids),
                        "embedding": emb,
                        "label": pa.array(
                            (vec_ids % 10).astype(np.int32)
                        ),
                    },
                    schema=schema,
                ),
                row_group_size=ROW_GROUP,
            )
    print(f"embeddings: {n} unique {dim}-dim vectors -> {dst}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--annscale":
        dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/annstress2m"
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
        make_annscale(dst, n)
        sys.exit(0)
    if len(sys.argv) > 1 and sys.argv[1] == "--dupdense":
        src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/dupdense"
        n = int(sys.argv[4]) if len(sys.argv) > 4 else 20
        make_dupdense(src, dst, n)
        sys.exit(0)
    if len(sys.argv) > 1 and sys.argv[1] == "--vocab":
        dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vocabstress"
        n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
        wpd = int(sys.argv[4]) if len(sys.argv) > 4 else 100
        make_vocab(dst, n_docs, wpd)
        sys.exit(0)
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress100k"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    replicate(src, dst, n)
