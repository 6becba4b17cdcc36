#!/usr/bin/env python
"""Generate scaled-up corpora (sf1, sf5, ...) from the driver's sf0.1 tables
by replica expansion, for the scaling gate in bench.py.

The driver ships sf0.001/0.01/0.1 only; the asymptotic check needs 10x and
50x corpora with the SAME schema and join topology. Each scale factor sfN is
built as N*10 key-offset replicas of sf0.1:

- fact/dim keys are offset per replica (custkey, orderkey, partkey, suppkey,
  user_id, doc_id, vec_id, ...) so referential integrity and per-key group
  sizes are preserved — each replica's facts join to that replica's dims;
- region/nation stay fixed-cardinality (TPC-H semantics: dims that never
  grow with SF), so per-group row counts in groupBy(nation/region) queries
  grow 10x like they would in real TPC-H;
- document text is deterministically perturbed per replica (every 9th word
  tagged) so the corpus gains NEAR-duplicates rather than 10 exact copies
  of every doc — exact-dup groups stay bounded while near-dup operators see
  realistic candidate structure;
- embeddings get small deterministic Gaussian noise per replica (seeded by
  (replica, table)) — near-dup vectors, not exact copies;
- timestamps are left unchanged: the time RANGE does not grow with SF, so
  per-timestamp densities scale 10x (the hard direction for windows).

Output: {out_root}/sf{N}/{table}.parquet, one file per table, ~100k-row
row groups (the sf0.1 inputs are single-row-group files — fine for
correctness, but honest scan parallelism needs splittable files).

Everything is seeded/deterministic; re-runs are byte-stable.

Usage: python scale_data.py [--sf 1] [--out data/scale]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ROW_GROUP = 100_000

# table -> columns that are (or reference) a per-replica key space, mapped to
# the key space name whose stride offsets them
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
STRIDE_SOURCE = {  # key space -> (table, column) holding its max
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ord": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
FIXED_DIMS = ("region", "nation")


def _strides() -> dict[str, int]:
    out = {}
    for space, (table, col) in STRIDE_SOURCE.items():
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"), columns=[col])
        out[space] = int(pc.max(t[col]).as_py()) + 1
    return out


def _perturb_documents(tbl: pa.Table, replica: int) -> pa.Table:
    """Tag every 9th word with the replica id: cross-replica copies become
    near- (not exact-) duplicates, and n_chars stays consistent with text."""
    if replica == 0:
        return tbl
    texts = tbl["text"].to_pylist()
    tag = str(replica)
    new_texts = []
    for s in texts:
        if s is None:
            new_texts.append(None)
            continue
        words = s.split(" ")
        for i in range(0, len(words), 9):
            words[i] = words[i] + tag
        new_texts.append(" ".join(words))
    n_chars = [None if s is None else len(s) for s in new_texts]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(new_texts, pa.string())
    )
    return tbl.set_column(
        tbl.schema.get_field_index("n_chars"), "n_chars", pa.array(n_chars, pa.int64())
    )


def _perturb_embeddings(tbl: pa.Table, replica: int) -> pa.Table:
    if replica == 0:
        return tbl
    vecs = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    rng = np.random.default_rng(1_000_003 * replica + 7)
    vecs = vecs + rng.normal(0.0, 0.02, size=vecs.shape).astype(np.float32)
    col = pa.array(list(vecs), type=tbl.schema.field("embedding").type)
    return tbl.set_column(tbl.schema.get_field_index("embedding"), "embedding", col)


def _replica(tbl: pa.Table, table: str, replica: int, strides: dict[str, int]) -> pa.Table:
    for col, space in KEYED.get(table, {}).items():
        if replica == 0:
            continue
        idx = tbl.schema.get_field_index(col)
        shifted = pc.add(tbl[col], pa.scalar(replica * strides[space], tbl[col].type))
        tbl = tbl.set_column(idx, col, shifted)
    if table == "documents":
        tbl = _perturb_documents(tbl, replica)
    elif table == "embeddings":
        tbl = _perturb_embeddings(tbl, replica)
    return tbl


def generate(sf: float, out_root: str = "data/scale") -> str:
    replicas = round(sf / 0.1)
    assert replicas >= 1 and abs(replicas * 0.1 - sf) < 1e-9, f"sf must be k*0.1, got {sf}"
    out_dir = os.path.join(out_root, f"sf{sf:g}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    strides = _strides()
    for table in FIXED_DIMS:
        src = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        pq.write_table(src, os.path.join(out_dir, f"{table}.parquet"))
    for table in KEYED:
        src = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        dest = os.path.join(out_dir, f"{table}.parquet")
        with pq.ParquetWriter(dest, src.schema) as w:
            for r in range(replicas):
                w.write_table(_replica(src, table, r, strides), row_group_size=ROW_GROUP)
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="data/scale")
    args = ap.parse_args()
    print(generate(args.sf, args.out))
