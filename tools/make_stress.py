#!/usr/bin/env python
"""Build the N×-replicated stress corpus used for the PERF.md scaling
sweeps: documents / embeddings / events from a source SF dir, each
replicated with id offsets so every copy is id-distinct (duplicate TEXT
density rises with N by design — that's the point of the sweep: banded
near-dup cost follows true-duplicate density; see PERF.md's 20× table).

Usage: python tools/make_stress.py [src_sf_dir] [dst_dir] [N]
Defaults: /root/testdata/sf0.1 /tmp/stress100k 20

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


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress100k"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    replicate(src, dst, n)
