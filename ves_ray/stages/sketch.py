"""Cardinality sketches: HyperLogLog-style approximate distinct
counts (Flajolet et al. 2007, public algorithm).

The exact distinct-count (see queries.q_events_by_type) pays a
full exchange of (group, key) pairs; at 100 TB the sketch form is the
one that scales: each block folds its keys into a fixed 2^p-register
array (one vectorized pass), registers MERGE by elementwise max —
associative, commutative, tiny — so the driver combine is
O(blocks × 2^p) bytes and NO shuffle of row-scale data ever happens.
Standard error ≈ 1.04/√(2^p) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import U64, hash_strings, splitmix64


def _hash_col(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return splitmix64(col.to_numpy(zero_copy_only=False).astype(U64))
    return hash_strings(col, seed=0x11C)


def _registers(h: np.ndarray, p: int) -> np.ndarray:
    """Fold a hash stream into 2^p HLL registers (vectorized)."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rank = leading zeros of the remaining bits + 1, via bit_length
    lz = np.zeros(len(h), dtype=np.int64)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):       # branchless CLZ, 6 steps
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        v[mask] = v[mask] << np.uint64(shift)
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:             # small-range correction
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, col: str, *, p: int = 12) -> int:
    """Approximate distinct count of ``col`` (~1.6% error at p=12)."""
    def local(b: pa.Table) -> pa.Table:
        regs = _registers(_hash_col(b[col]), p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          type=pa.binary())})

    parts = ds.map_batches(local, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for blob in parts.get("regs", ()):
        np.maximum(merged, np.frombuffer(blob, dtype=np.uint8),
                   out=merged)
    return round(_estimate(merged))


def distributed_topk(ds, col: str, *, k: int = 20,
                     per_block_top: int = 256) -> pa.Table:
    """PROVABLY-EXACT top-k over a corpus-scale key domain without the
    full-domain exchange (threshold / TPUT-family algorithm, Cao &
    Wang 2004 — public).

    Pass 1: each block groupby-counts locally and reports only its top
    ``per_block_top`` keys plus the count of the first key it DROPPED
    (``eps``, that block's per-key undercount bound). The driver holds
    O(blocks × per_block_top) rows — never the vocabulary.

    Bounds: lower(key) = Σ reported counts; upper(key) = lower +
    Σ eps over blocks that did NOT report the key. With τ = k-th
    largest lower bound, any key whose upper < τ can't be top-k —
    pruning is exact, not heuristic. Pass 2 recounts ONLY the
    surviving candidates (broadcast ``is_in`` probe, block partials).

    Fallback: if Σ eps ≥ τ, a key reported by NO block could still
    qualify, so the result would not be provable — we then pay the
    exact full groupby instead. On zipfian corpora with adequate
    ``per_block_top`` the bound holds and the fallback never fires.
    Two passes over ``ds`` (lineage re-executes) — both are maps.
    """
    import ray

    def local_top(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select([col]), [col]).aggregate(
            [([], "count_all")])
        counts = g.column(1).to_numpy(zero_copy_only=False)
        order = np.argsort(-counts, kind="stable")
        m = min(per_block_top, len(order))
        top = g.take(pa.array(order[:m]))
        eps = int(counts[order[m]]) if len(order) > m else 0
        keys = top.column(0)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        # one null-key sentinel row per block carries its eps so the
        # driver can form Σ eps without a second output table
        keys = pa.concat_arrays([keys, pa.nulls(1, type=keys.type)])
        ns = np.concatenate([
            top.column(1).to_numpy(zero_copy_only=False), [0]])
        return pa.table({col: keys,
                         "n": pa.array(ns.astype(np.int64)),
                         "eps": pa.array(np.full(m + 1, eps,
                                                 dtype=np.int64))})

    parts = ds.map_batches(local_top, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if len(parts) == 0:
        return pa.table({col: pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    sentinel = parts[parts[col].isna()]
    total_e = int(sentinel["eps"].sum())
    rep = parts[parts[col].notna()]
    g = rep.groupby(col).agg(lower=("n", "sum"), eps_rep=("eps", "sum"))
    topk_lower = g["lower"].nlargest(k)
    tau = int(topk_lower.iloc[-1]) if len(topk_lower) else 0
    upper = g["lower"] + (total_e - g["eps_rep"])
    cand = sorted(g.index[upper >= tau])

    if total_e > 0 and (total_e >= tau or len(g) < k):
        # bound too loose to exclude never-reported keys (or fewer
        # than k reported keys, leaving free slots any truncated key
        # could occupy) → exact path; total_e == 0 means no block
        # dropped anything, so the report is complete and exact
        from ray.data.aggregate import Count
        full = ds.groupby(col).aggregate(Count(alias_name="n"))
        out = full.sort(["n", col], descending=[True, False]) \
                  .limit(k).to_pandas()
        return pa.table({col: pa.array(out[col]),
                         "n": pa.array(out["n"].to_numpy()
                                       .astype(np.int64))})

    ref = ray.put(pa.array(cand))

    def recount(b: pa.Table) -> pa.Table:
        ks = b[col]
        if isinstance(ks, pa.ChunkedArray):
            ks = ks.combine_chunks()
        mask = pc.is_in(ks, value_set=ray.get(ref))
        gg = pa.TableGroupBy(pa.table({col: ks.filter(mask)}),
                             [col]).aggregate([([], "count_all")])
        return gg.rename_columns([col, "n"])

    partials = ds.map_batches(recount, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    tot = partials.groupby(col, as_index=False)["n"].sum()
    tot = tot.sort_values(["n", col], ascending=[False, True]).head(k)
    return pa.table({col: pa.array(tot[col]),
                     "n": pa.array(tot["n"].to_numpy().astype(np.int64))})


def grouped_approx_distinct(ds, group_col: str, key_col: str, *,
                            p: int = 12):
    """Per-group approximate distinct counts: each block emits one
    register blob per group present; the (tiny) blobs groupby-merge by
    elementwise max. Returns a pandas DataFrame
    (group, approx_distinct) — output is group-scale."""
    import pandas as pd

    def local(b: pa.Table) -> pa.Table:
        h = _hash_col(b[key_col])
        groups = b[group_col]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        enc = groups.dictionary_encode()
        gidx = enc.indices.to_numpy(zero_copy_only=False)
        out_g, out_r = [], []
        for gi, gval in enumerate(enc.dictionary.to_pylist()):
            regs = _registers(h[gidx == gi], p)
            out_g.append(gval)
            out_r.append(regs.tobytes())
        return pa.table({group_col: pa.array(out_g),
                         "regs": pa.array(out_r, type=pa.binary())})

    parts = ds.map_batches(local, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    rows = []
    for g, sub in parts.groupby(group_col):
        merged = np.zeros(1 << p, dtype=np.uint8)
        for blob in sub["regs"]:
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8),
                       out=merged)
        rows.append((g, round(_estimate(merged))))
    return pd.DataFrame(rows, columns=[group_col, "approx_distinct"]) \
        .sort_values(group_col, ignore_index=True)
