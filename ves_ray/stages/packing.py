"""Sequence packing: assemble documents' token arrays into fixed-
length training sequences (the last batch-prep step of an LLM data
pipeline).

Two packing disciplines, both block-local (each ``map_batches`` call
packs only its own batch — packing has no cross-partition constraint,
so the operator is embarrassingly parallel, streams, and never
shuffles; at 100 TB each worker packs its shard independently and the
per-block tail waste is O(max_len) per block, amortized to nothing by
block sizes in the hundreds of MB):

- ``concat`` (default): concatenate the block's token stream and cut
  every ``max_len`` tokens — documents may span pack boundaries
  (GPT-style packing). Fully vectorized: one offsets subtraction, one
  ``np.arange`` cut-point construction; zero Python per-doc work.
- ``first_fit``: first-fit-decreasing bin packing — no document ever
  splits (documents longer than ``max_len`` are pre-chunked). The FFD
  loop is O(docs-per-block · log bins) driver-free Python; use when
  sample integrity matters more than raw throughput.

Output rows are packs: ``pack_id`` (stable: "<first-doc-of-block>/<i>"
— deterministic under retry because blocks re-run identically),
``n_docs`` (documents contributing, split chunks counted once per
chunk), ``n_tok`` (fill), and optionally the packed ``tokens``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tokens_flat(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat int32 values, int64 offsets starting at 0) of a
    list<int32> column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat[off[0]:off[-1]], off - off[0]


def pack_sequences(ds, *, max_len: int, mode: str = "concat",
                   id_col: str = "doc_id", tokens_col: str = "tokens",
                   emit_tokens: bool = False, drop_tail: bool = False):
    """Pack ``tokens_col`` into sequences of ≤ ``max_len`` tokens."""
    if mode not in ("concat", "first_fit"):
        raise ValueError(f"unknown packing mode: {mode}")

    def pack(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, off = _tokens_flat(b[tokens_col])
        lens = np.diff(off)
        n = len(b)
        empty = pa.table(
            {"pack_id": pa.array([], type=pa.string()),
             "n_docs": pa.array([], type=pa.int64()),
             "n_tok": pa.array([], type=pa.int64()),
             **({"tokens": pa.array([], type=pa.list_(pa.int32()))}
                if emit_tokens else {})})
        if n == 0 or len(flat) == 0:
            return empty
        first = str(ids[0].as_py())

        if mode == "concat":
            total = len(flat)
            n_packs = total // max_len if drop_tail else -(-total // max_len)
            if n_packs == 0:
                return empty
            cuts = np.minimum(np.arange(1, n_packs + 1) * max_len, total)
            starts = np.concatenate(([0], cuts[:-1]))
            fills = cuts - starts
            # docs touching each pack: doc i spans [off[i], off[i+1]);
            # count via searchsorted over the cut points
            lo = np.searchsorted(off[:-1], starts, side="right") - 1
            hi = np.searchsorted(off[:-1], cuts, side="left")
            # skip zero-length docs sitting exactly on a boundary
            n_docs = hi - np.maximum(lo, 0)
            out = {"pack_id": pa.array(
                       [f"{first}/{i}" for i in range(n_packs)]),
                   "n_docs": pa.array(n_docs, type=pa.int64()),
                   "n_tok": pa.array(fills, type=pa.int64())}
            if emit_tokens:
                val = pa.array(flat[:int(cuts[-1])], type=pa.int32())
                offsets = pa.array(np.concatenate(([0], cuts)),
                                   type=pa.int32())
                out["tokens"] = pa.ListArray.from_arrays(offsets, val)
            return pa.table(out)

        # first_fit: pre-chunk oversized docs, sort desc, FFD
        chunks = []                       # (value_start, length)
        for i in range(n):
            s, ln = int(off[i]), int(lens[i])
            while ln > max_len:
                chunks.append((s, max_len))
                s += max_len
                ln -= max_len
            if ln > 0:
                chunks.append((s, ln))
        order = sorted(range(len(chunks)),
                       key=lambda j: chunks[j][1], reverse=True)
        bins_fill: list[int] = []
        assign = np.empty(len(chunks), dtype=np.int64)
        for j in order:
            ln = chunks[j][1]
            for bi, f in enumerate(bins_fill):   # first fit
                if f + ln <= max_len:
                    bins_fill[bi] += ln
                    assign[j] = bi
                    break
            else:
                assign[j] = len(bins_fill)
                bins_fill.append(ln)
        n_packs = len(bins_fill)
        n_docs = np.bincount(assign, minlength=n_packs)
        out = {"pack_id": pa.array([f"{first}/{i}"
                                    for i in range(n_packs)]),
               "n_docs": pa.array(n_docs, type=pa.int64()),
               "n_tok": pa.array(bins_fill, type=pa.int64())}
        if emit_tokens:
            parts: list[list[np.ndarray]] = [[] for _ in range(n_packs)]
            for j, (s, ln) in enumerate(chunks):
                parts[int(assign[j])].append(flat[s:s + ln])
            vals = np.concatenate([np.concatenate(p) for p in parts])
            offsets = np.concatenate(
                ([0], np.cumsum(np.asarray(bins_fill))))
            out["tokens"] = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(vals, type=pa.int32()))
        return pa.table(out)

    return ds.map_batches(pack, batch_format="pyarrow",
                          zero_copy_batch=True)
