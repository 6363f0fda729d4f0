"""Deterministic scale-up of a driver testdata directory by integer
replication with key striding — perf-stress input only, never a
correctness oracle input.

Usage:
    python tools/make_scaled_sf.py [src_dir] [out_dir] [factor]

Each fact table is replicated ``factor`` times; copy k shifts every
key column by ``k * stride`` where stride is the smallest power of 10
above the key's source maximum, so copies never collide and the
per-key fan-outs (orders per customer, lineitems per order, events
per user) are EXACTLY preserved — join and groupby cardinalities grow
linearly, which is the property scale-stress measurements need.
Dimension tables (region, nation) stay fixed, like TPC-H.

Content columns are perturbed only where replication would change the
workload's character rather than its size:
- ``documents.text``: copies k>0 word-shuffle each doc with an RNG
  keyed by (doc_id, k). Shuffling preserves length and vocabulary but
  destroys shingle structure, so copies are NOT near-duplicates of
  each other and the corpus keeps the source's intra-copy duplicate
  rate at 10x the size (naive replication would instead make every
  doc a member of a size-factor dup cluster and quadratically explode
  MinHash buckets).
- ``embeddings.embedding``: copy k rolls each vector by k positions —
  norms preserved, directions distinct, so ANN neighbor structure
  scales instead of degenerating into factor-sized ties.

Everything else (dates, amounts, types, props) is carried verbatim;
distributions are unchanged by construction.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: key columns per table, keyed by the table whose max defines the
#: stride domain (custkey stride must match between customer/orders)
KEY_DOMAINS = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

COPY_TABLES = ["region", "nation"]
SCALE_TABLES = ["customer", "supplier", "part", "orders", "lineitem",
                "events", "documents", "embeddings"]


def _strides(src: str) -> dict[str, int]:
    out = {}
    for col, (table, base_col) in KEY_DOMAINS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"),
                          columns=[base_col])
        mx = int(pc.max(t[base_col]).as_py())
        out[col] = 10 ** len(str(mx))
    return out


def _shuffle_texts(texts: list[str], k: int) -> list[str]:
    # RNG keyed by (text content, copy): identical source texts
    # shuffle identically, so each copy keeps the source's exact-dup
    # clusters; different copies of the same doc still diverge
    import zlib
    out = []
    for t in texts:
        rng = np.random.default_rng(
            (zlib.crc32(t.encode()) << 8) ^ k)
        words = t.split()
        rng.shuffle(words)
        out.append(" ".join(words))
    return out


def _scale_table(name: str, src: str, dst: str, factor: int,
                 strides: dict[str, int]) -> int:
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    copies = [t]
    for k in range(1, factor):
        cols = []
        for i, col in enumerate(t.column_names):
            arr = t.column(i)
            if col in strides:
                arr = pc.add(arr, k * strides[col])
            elif name == "documents" and col == "text":
                arr = pa.array(_shuffle_texts(arr.to_pylist(), k),
                               type=pa.string())
            elif name == "embeddings" and col == "embedding":
                m = np.vstack(arr.to_pandas().to_numpy())
                rolled = np.roll(m, k % m.shape[1], axis=1)
                arr = pa.array(list(rolled), type=t.schema.field(i).type)
            cols.append(arr)
        copies.append(pa.table(dict(zip(t.column_names, cols))))
    full = pa.concat_tables(copies)
    if name == "documents":
        # n_chars must stay consistent with the (shuffled) text
        full = full.set_column(
            full.column_names.index("n_chars"), "n_chars",
            pc.cast(pc.utf8_length(full["text"]), pa.int64()))
    pq.write_table(full, os.path.join(dst, f"{name}.parquet"),
                   compression="zstd", compression_level=1)
    return len(full)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ves_sf_scaled"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    marker = os.path.join(dst, "_complete")
    if os.path.exists(marker):
        print(f"{dst} already built")
        return
    os.makedirs(dst, exist_ok=True)
    import shutil
    for name in COPY_TABLES:
        shutil.copy(os.path.join(src, f"{name}.parquet"),
                    os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied")
    for name in SCALE_TABLES:
        n = _scale_table(name, src, dst, factor, _strides(src))
        print(f"{name}: {n} rows")
    open(marker, "w").write("ok")


if __name__ == "__main__":
    main()
