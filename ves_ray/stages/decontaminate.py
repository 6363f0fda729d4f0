"""Benchmark decontamination: flag/drop training documents sharing a
word n-gram with an evaluation set (the GPT-3-style n-gram collision
rule; ref. Brown et al. 2020, appendix C — public method).

Scale shape: the EVAL side of decontamination is a benchmark suite —
small by construction (MBs, not TBs) — so its distinct shingle-hash
set is computed distributed (per-block unique), unioned once on the
driver, and broadcast via ``ray.put``; the TRAIN side then streams
through one stateless ``map_batches`` doing a vectorized sorted-array
membership probe (``np.searchsorted``) per batch. No shuffle at all on
the 100-TB side. If the eval set ever outgrew broadcast, the fallback
is the shingle-exchange shape already used by
:func:`ves_ray.stages.dedup.jaccard_pairs` (hash-partition both sides
by shingle); the broadcast path is the right default and is the one
implemented here.

N-gram semantics are the strict SQL-matching ones of
:func:`ves_ray.stages.dedup._strict_shingle_hashes` (lowercase,
whitespace split, a row with w words yields max(w-n+1, 0) shingles),
so a DuckDB oracle building n-grams from ``regexp_split_to_array``
agrees exactly. Matching compares 64-bit shingle hashes, not strings —
collision probability is negligible at any realistic eval-set size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _strict_shingle_hashes

DEFAULT_SEED = 0x3A


def eval_shingle_hashes(eval_ds, *, text_col: str = "text", n: int = 5,
                        seed: int = DEFAULT_SEED) -> np.ndarray:
    """Distinct shingle hashes of the (small) eval set, sorted —
    computed distributed, unioned on the driver."""
    def uniq(b: pa.Table) -> pa.Table:
        sh, _ = _strict_shingle_hashes(b[text_col], n, seed)
        return pa.table({"h": pa.array(np.unique(sh), type=pa.uint64())})

    parts = eval_ds.map_batches(uniq, batch_format="pyarrow",
                                zero_copy_batch=True)
    df = parts.to_pandas()
    if len(df) == 0:   # an all-empty result can drop the column
        return np.empty(0, dtype=np.uint64)
    return np.unique(df["h"].to_numpy(dtype=np.uint64, copy=False))


def flag_contaminated(train_ds, eval_hashes: np.ndarray, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      n: int = 5, seed: int = DEFAULT_SEED):
    """(id, n_hits) for every train document sharing ≥1 word n-gram
    with the eval set; n_hits = count of DISTINCT shared n-grams."""
    import ray
    ref = ray.put(np.sort(np.asarray(eval_hashes, dtype=np.uint64)))

    def flag(b: pa.Table) -> pa.Table:
        ev = ray.get(ref)
        id_type = b.schema.field(id_col).type
        sh, off = _strict_shingle_hashes(b[text_col], n, seed)
        rows = np.repeat(np.arange(len(b), dtype=np.int64), np.diff(off))
        if len(sh) and len(ev):
            idx = np.searchsorted(ev, sh)
            mask = ev[np.minimum(idx, len(ev) - 1)] == sh
        else:
            mask = np.zeros(len(sh), dtype=bool)
        if not mask.any():
            return pa.table({id_col: pa.array([], type=id_type),
                             "n_hits": pa.array([], type=pa.int64())})
        # distinct (row, shingle) pairs → per-row distinct-hit counts
        pairs = np.empty(int(mask.sum()),
                         dtype=[("r", np.int64), ("v", np.uint64)])
        pairs["r"], pairs["v"] = rows[mask], sh[mask]
        u = np.unique(pairs)
        counts = np.bincount(u["r"], minlength=len(b))
        hit_rows = np.nonzero(counts)[0]
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(hit_rows)),
            "n_hits": pa.array(counts[hit_rows], type=pa.int64())})

    return train_ds.map_batches(flag, batch_format="pyarrow",
                                zero_copy_batch=True)


def drop_contaminated(train_ds, eval_hashes: np.ndarray, *,
                      text_col: str = "text", n: int = 5,
                      seed: int = DEFAULT_SEED):
    """The train corpus with contaminated documents removed — the
    actual pipeline op (flag_contaminated is its report form). Same
    single broadcast-probe pass; rows stream through untouched unless
    any shingle collides."""
    import ray
    ref = ray.put(np.sort(np.asarray(eval_hashes, dtype=np.uint64)))

    def keep(b: pa.Table) -> pa.Table:
        ev = ray.get(ref)
        sh, off = _strict_shingle_hashes(b[text_col], n, seed)
        if len(sh) and len(ev):
            idx = np.searchsorted(ev, sh)
            hit = ev[np.minimum(idx, len(ev) - 1)] == sh
        else:
            hit = np.zeros(len(sh), dtype=bool)
        rows = np.repeat(np.arange(len(b), dtype=np.int64), np.diff(off))
        bad = np.zeros(len(b), dtype=bool)
        bad[rows[hit]] = True
        return b.filter(pa.array(~bad))

    return train_ds.map_batches(keep, batch_format="pyarrow",
                                zero_copy_batch=True)


def contamination_report(train_ds, eval_hashes: np.ndarray, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 5, seed: int = DEFAULT_SEED):
    """Per-document contamination FRACTION — the graded form of
    :func:`flag_contaminated` (which reports only colliding docs):
    every train doc with ≥1 shingle gets (n_shingles, n_hits,
    hit_pct_e6), where the percentage is exact integer millionths of
    DISTINCT shared shingles over DISTINCT shingles. Thresholding
    policies ("drop >50 % overlap, keep incidental quotes") need the
    fraction, not the flag. Same single broadcast-probe pass; zero
    shuffle on the train side."""
    import ray
    ref = ray.put(np.sort(np.asarray(eval_hashes, dtype=np.uint64)))

    def report(b: pa.Table) -> pa.Table:
        ev = ray.get(ref)
        id_type = b.schema.field(id_col).type
        sh, off = _strict_shingle_hashes(b[text_col], n, seed)
        rows = np.repeat(np.arange(len(b), dtype=np.int64), np.diff(off))
        pairs = np.empty(len(sh), dtype=[("r", np.int64),
                                         ("v", np.uint64)])
        pairs["r"], pairs["v"] = rows, sh
        u = np.unique(pairs)
        n_sh = np.bincount(u["r"], minlength=len(b))
        if len(u) and len(ev):
            idx = np.searchsorted(ev, u["v"])
            hit = ev[np.minimum(idx, len(ev) - 1)] == u["v"]
        else:
            hit = np.zeros(len(u), dtype=bool)
        n_hit = np.bincount(u["r"][hit], minlength=len(b))
        keep = np.nonzero(n_sh)[0]           # docs shorter than n drop
        pct = (1_000_000 * n_hit[keep]) // n_sh[keep]
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(keep)).cast(id_type),
            "n_shingles": pa.array(n_sh[keep], type=pa.int64()),
            "n_hits": pa.array(n_hit[keep], type=pa.int64()),
            "hit_pct_e6": pa.array(pct, type=pa.int64())})

    return train_ds.map_batches(report, batch_format="pyarrow",
                                zero_copy_batch=True)
