"""Deduplication operators for large-scale training-data pipelines.

All variants follow the same scale shape: a vectorized per-batch
signature stage (``map_batches``), a key-partitioned ``groupby`` that
co-locates only CANDIDATES (never an all-pairs pass over the corpus),
and a per-group verify. The only all-to-all exchanges move signatures
or candidate keys, not documents.

- exact          : content-hash → groupby(hash) → keep min doc_id
- minhash + LSH  : word-shingle minhash → banded keys → bucket groupby
                   → verified candidate pairs
- simhash        : 64-bit weighted fingerprint → 4-band blocking →
                   Hamming-verified pairs
- n-gram Jaccard : exact Jaccard over shingle sets for candidate pairs
- embedding      : cosine near-dup over `list<float>` embeddings,
                   LSH-bucketed (see stages.similarity for the ANN path)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import MASK63, U64, hash2, hash_strings, splitmix64

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def content_hash_batch(batch: pa.Table, *, text_col: str = "text",
                       out_col: str = "content_hash") -> pa.Table:
    h = (hash_strings(batch[text_col], seed=0xD0) & U64(MASK63)).astype(np.int64)
    return batch.append_column(out_col, pa.array(h))


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: hash the content, keep the smallest id per hash
    (deterministic winner) plus dup_count.

    Shape: block-local partial aggregation (per-hash min(id) + count
    inside ``map_batches``) followed by a ``groupby`` over partials —
    NOT a per-group ``map_groups``: on a mostly-unique corpus nearly
    every group is a singleton and per-group Python call overhead
    dominates (the same reasoning as :func:`minhash_lsh_candidates`'s
    collision filter). The shuffle key is the 63-bit hash — uniformly
    distributed, no skew mitigation needed. Returns
    (content_hash, <id_col>, dup_count)."""
    from ray.data.aggregate import Min, Sum

    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, ["content_hash"]).aggregate(
            [(id_col, "min"), ([], "count_all")])
        return g.rename_columns(["content_hash", id_col, "dup_count"])

    partials = hashed.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return partials.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col),
        Sum("dup_count", alias_name="dup_count"))


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

def _word_shingle_hashes(text: pa.ChunkedArray | pa.Array, n: int,
                         seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row arrays of n-gram shingle hashes (uint64) over the
    whitespace word sequence. Returns (flat_hashes, row_offsets).
    Fully vectorized: word hashes once, then a rolling combine of n
    shifted views."""
    import pyarrow.compute as pc
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern_regex(pc.utf8_lower(text), pattern=r"\s+")
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    flat = words.values[words.offsets[0].as_py():words.offsets[-1].as_py()]
    wh = hash_strings(flat, seed=seed) if len(flat) else np.empty(0, dtype=np.uint64)
    n_rows = len(off) - 1
    lens = np.diff(off)
    sh_lens = np.maximum(lens - (n - 1), np.minimum(lens, 1))  # min 1 shingle if any words
    sh_off = np.concatenate(([0], np.cumsum(sh_lens)))
    total = int(sh_off[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), sh_off
    # build combined hash of n consecutive word hashes
    starts = np.repeat(off[:-1], sh_lens)
    pos = np.arange(total, dtype=np.int64) - np.repeat(sh_off[:-1], sh_lens) + starts
    acc = np.zeros(total, dtype=np.uint64)
    row_len = np.repeat(lens, sh_lens)
    with np.errstate(over="ignore"):
        for k in range(n):
            idx = np.minimum(pos + k, np.repeat(off[1:], sh_lens) - 1)
            acc = splitmix64(acc ^ (wh[idx] + U64(k)))
    return acc, sh_off


def minhash_signatures_batch(batch: pa.Table, *, text_col: str = "text",
                             num_perm: int = 64, shingle_n: int = 3,
                             seed: int = 0x3A) -> pa.Table:
    """Per-doc MinHash signature (num_perm × uint64→int64) as a
    fixed-size list column. Permutations are splitmix64 re-keyings of
    the shingle hash (one vectorized op per permutation, reduced with
    np.minimum.reduceat — no per-doc loops)."""
    sh, off = _word_shingle_hashes(batch[text_col], shingle_n, seed)
    n_rows = len(batch)
    sig = np.full((n_rows, num_perm), np.iinfo(np.int64).max, dtype=np.int64)
    if len(sh):
        nonempty = np.diff(off) > 0
        starts = off[:-1][nonempty]
        with np.errstate(over="ignore"):
            for p in range(num_perm):
                perm_key = U64((p * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF)
                hp = (splitmix64(sh ^ perm_key) >> U64(1)).astype(np.int64)
                sig[nonempty, p] = np.minimum.reduceat(hp, starts)
    flat = pa.array(sig.reshape(-1), type=pa.int64())
    col = pa.FixedSizeListArray.from_arrays(flat, num_perm)
    return batch.append_column("minhash", col)


def lsh_band_keys_batch(batch: pa.Table, *, num_bands: int = 8,
                        id_col: str = "doc_id") -> pa.Table:
    """Explode each signature into (band, band_key, doc_id) rows.
    band_key hashes the rows of the band together; the downstream
    groupby(band, band_key) co-locates only colliding docs."""
    mh = batch["minhash"]
    if isinstance(mh, pa.ChunkedArray):
        mh = mh.combine_chunks()
    num_perm = mh.type.list_size
    rows_per_band = num_perm // num_bands
    sig = mh.values.to_numpy(zero_copy_only=False).reshape(-1, num_perm)
    n = len(batch)
    keys = np.zeros((n, num_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(num_bands):
            part = sig[:, b * rows_per_band:(b + 1) * rows_per_band].astype(np.uint64)
            acc = np.full(n, U64(b + 1), dtype=np.uint64)
            for c in range(rows_per_band):
                acc = splitmix64(acc ^ part[:, c])
            keys[:, b] = acc
    ids = batch[id_col].to_pylist()
    return pa.table({
        "band": pa.array(np.tile(np.arange(num_bands, dtype=np.int32), n)),
        "band_key": pa.array((keys.reshape(-1) & U64(MASK63)).astype(np.int64)),
        id_col: pa.array(np.repeat(np.asarray(ids, dtype=object), num_bands).tolist()),
    })


def _bucket_pairs(id_col: str, max_bucket: int):
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())
        if len(ids) < 2 or len(ids) > max_bucket:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=object),
                                 "doc_b": pd.Series([], dtype=object)})
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1:]])
        return pd.DataFrame({"doc_a": list(a), "doc_b": list(b)})
    return pairs


def minhash_lsh_candidates(ds, *, text_col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 64, num_bands: int = 8,
                           shingle_n: int = 3, max_bucket: int = 64):
    """Candidate near-dup pairs via MinHash-LSH: signatures → banded
    keys → collision detection → in-bucket pairs.

    Collision detection is a distributed count-aggregate over band
    keys (block-local partials, tiny shuffle) — NOT a per-group
    map_groups, whose per-group overhead dominates when almost every
    bucket is a singleton. Only rows whose band_key actually collides
    (output-scale, near-dup-sparse by construction) are pulled to the
    driver for vectorized pair generation. ``max_bucket`` caps
    pathological buckets (a degenerate key would otherwise produce
    O(n²) pairs). Returns a pandas DataFrame (doc_a, doc_b)."""
    import pyarrow.compute as pc

    sigs = ds.map_batches(
        lambda b: minhash_signatures_batch(b, text_col=text_col,
                                           num_perm=num_perm, shingle_n=shingle_n),
        batch_format="pyarrow", zero_copy_batch=True)
    keys = sigs.map_batches(
        lambda b: lsh_band_keys_batch(b, num_bands=num_bands, id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    # band_key is salted per band, so it alone is the collision key
    def key_counts(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, ["band_key"]).aggregate([([], "count_all")])
        return g.rename_columns(["band_key", "n"])
    from ray.data.aggregate import Sum
    counts = (keys.map_batches(key_counts, batch_format="pyarrow",
                               zero_copy_batch=True)
                  .groupby("band_key").aggregate(Sum("n", alias_name="n")))
    collide = counts.map_batches(
        lambda b: b.filter(pc.greater(b["n"], 1)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if len(collide) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=object),
                             "doc_b": pd.Series([], dtype=object)})
    wanted = pa.array(collide["band_key"].to_numpy(), type=pa.int64())

    def only_collisions(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["band_key"], value_set=wanted))

    hits = keys.map_batches(only_collisions, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    rows_a, rows_b = [], []
    for _, g in hits.groupby("band_key"):
        ids = sorted(g[id_col].unique())
        if len(ids) < 2 or len(ids) > max_bucket:
            continue
        for i, x in enumerate(ids):
            for y in ids[i + 1:]:
                rows_a.append(x)
                rows_b.append(y)
    out = pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b})
    return out.drop_duplicates(ignore_index=True)


def jaccard_pairs(ds, candidate_pairs: pd.DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id", shingle_n: int = 3,
                  threshold: float = 0.0) -> pd.DataFrame:
    """Exact n-gram Jaccard verification for candidate pairs.

    The (doc, shingle-hash) pairs for every doc named in a candidate
    are computed distributed (map_batches over the corpus, filtered to
    candidates — a broadcast semi-join) and come back exploded; the
    per-pair intersections are a single row-wise incidence-matrix dot
    on the driver — vectorized end to end, no per-pair set ops."""
    import ray

    if len(candidate_pairs) == 0:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    wanted = set(candidate_pairs["doc_a"]) | set(candidate_pairs["doc_b"])
    wanted_ref = ray.put(wanted)

    def shingle_rows(batch: pa.Table) -> pd.DataFrame:
        w = ray.get(wanted_ref)
        ids = batch[id_col].to_pylist()
        mask = [i for i, d in enumerate(ids) if d in w]
        if not mask:
            return pd.DataFrame({id_col: pd.Series([], dtype=object),
                                 "sh": pd.Series([], dtype=np.uint64)})
        sub = batch.take(mask)
        sh, off = _word_shingle_hashes(sub[text_col], shingle_n, 0x3A)
        out_ids = np.repeat(np.asarray(sub[id_col].to_pylist(), dtype=object),
                            np.diff(off))
        return pd.DataFrame({id_col: out_ids, "sh": sh})

    exploded = (ds.map_batches(shingle_rows, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas())
    doc_codes, doc_uniq = pd.factorize(exploded[id_col])
    sh_codes, sh_uniq = pd.factorize(exploded["sh"])
    m, u = len(doc_uniq), len(sh_uniq)
    inc = np.zeros((m, max(u, 1)), dtype=np.float32)
    inc[doc_codes, sh_codes] = 1.0            # duplicates collapse: sets
    sizes = inc.sum(axis=1)
    idx = {d: i for i, d in enumerate(doc_uniq)}
    ai = np.array([idx.get(a, -1) for a in candidate_pairs["doc_a"]])
    bi = np.array([idx.get(b, -1) for b in candidate_pairs["doc_b"]])
    ok = (ai >= 0) & (bi >= 0)
    jac = np.zeros(len(candidate_pairs))
    if ok.any():
        inter = np.einsum("ij,ij->i", inc[ai[ok]], inc[bi[ok]])
        union = sizes[ai[ok]] + sizes[bi[ok]] - inter
        jac[ok] = np.divide(inter, union, out=np.zeros_like(inter),
                            where=union > 0)
    keep = jac >= threshold
    return pd.DataFrame({
        "doc_a": candidate_pairs["doc_a"].to_numpy()[keep],
        "doc_b": candidate_pairs["doc_b"].to_numpy()[keep],
        "jaccard": jac[keep],
    })


def _strict_shingle_hashes(text: pa.ChunkedArray | pa.Array, n: int,
                           seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Like :func:`_word_shingle_hashes` but with strict SQL-matching
    semantics: a row with w words yields exactly ``max(w-(n-1), 0)``
    shingles (no clamped singleton for short rows), so cardinalities
    agree with an oracle building n-grams via ``list_transform``."""
    import pyarrow.compute as pc
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern_regex(pc.utf8_lower(text), pattern=r"\s+")
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    flat = words.values[words.offsets[0].as_py():words.offsets[-1].as_py()]
    wh = hash_strings(flat, seed=seed) if len(flat) else np.empty(0, dtype=np.uint64)
    lens = np.diff(off)
    sh_lens = np.maximum(lens - (n - 1), 0)
    sh_off = np.concatenate(([0], np.cumsum(sh_lens)))
    total = int(sh_off[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), sh_off
    starts = np.repeat(off[:-1], sh_lens)
    pos = np.arange(total, dtype=np.int64) - np.repeat(sh_off[:-1], sh_lens) + starts
    acc = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(n):
            acc = splitmix64(acc ^ (wh[pos + k] + U64(k)))
    return acc, sh_off


def ngram_jaccard_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        block_col: str = "source", shingle_n: int = 2,
                        threshold: float = 0.2) -> pd.DataFrame:
    """All-pairs word-n-gram Jaccard similarity within blocking groups.

    The O(all-pairs) comparison is confined to blocks (groupby on
    ``block_col`` — at scale, choose a key bounding block size); within
    a block the pairwise intersection is a single binary incidence
    matmul (docs × distinct-shingles), fully vectorized — no per-pair
    Python set ops. Returns (doc_a, doc_b, jaccard≥threshold)."""

    def pairs_in_group(group: pa.Table) -> pd.DataFrame:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sh, off = _strict_shingle_hashes(group[text_col], shingle_n, 0x3A)
        m = len(ids)
        if m < 2:
            return _empty_pairs()
        uniq, inv = np.unique(sh, return_inverse=True)
        inc = np.zeros((m, max(len(uniq), 1)), dtype=np.float32)
        row_idx = np.repeat(np.arange(m), np.diff(off))
        inc[row_idx, inv] = 1.0  # duplicate shingles collapse: set semantics
        sizes = inc.sum(axis=1)
        inter = inc @ inc.T
        ia, ib = np.triu_indices(m, k=1)
        ixn = inter[ia, ib]
        union = sizes[ia] + sizes[ib] - ixn
        valid = (sizes[ia] > 0) & (sizes[ib] > 0)
        jac = np.divide(ixn, union, out=np.zeros_like(ixn), where=union > 0)
        keep = valid & (jac >= threshold)
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"doc_a": lo, "doc_b": hi,
                             "jaccard": np.round(jac[keep].astype(np.float64), 6)})

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})

    out = ds.groupby(block_col).map_groups(pairs_in_group,
                                           batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        return _empty_pairs()
    return out.sort_values(["doc_a", "doc_b"], ignore_index=True)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, *, text_col: str = "text",
                  seed: int = 0x51) -> pa.Table:
    """64-bit SimHash over word hashes (unweighted): sign-sum of the
    bit matrix, vectorized with reduceat over the flat word array."""
    import pyarrow.compute as pc
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern_regex(pc.utf8_lower(text), pattern=r"\s+")
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    flat = words.values[words.offsets[0].as_py():words.offsets[-1].as_py()]
    n = len(batch)
    if len(flat) == 0:
        return batch.append_column("simhash", pa.array(np.zeros(n, dtype=np.int64)))
    wh = hash_strings(flat, seed=seed)
    bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & U64(1)).astype(np.int64)
    contrib = bits * 2 - 1                      # ±1 per bit
    # reduceat over only nonempty row starts aligns 1:1 with nonempty rows
    nonempty = np.diff(off) > 0
    sums = np.zeros((n, 64), dtype=np.int64)
    if nonempty.any():
        sums[nonempty] = np.add.reduceat(contrib, off[:-1][nonempty], axis=0)
    sh = (sums > 0).astype(np.uint64) @ (U64(1) << np.arange(64, dtype=np.uint64))
    return batch.append_column("simhash", pa.array(sh.view(np.int64)))


def simhash_band_batch(batch: pa.Table, *, id_col: str = "doc_id") -> pa.Table:
    """Explode simhash into 4 × 16-bit bands (classic Hamming≤3
    blocking: any pair within distance 3 shares at least one band)."""
    sh = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    n = len(batch)
    bands = np.arange(4, dtype=np.int32)
    vals = np.empty((n, 4), dtype=np.int64)
    for b in range(4):
        vals[:, b] = ((sh >> U64(16 * b)) & U64(0xFFFF)).astype(np.int64)
    ids = batch[id_col].to_pylist()
    return pa.table({
        "band": pa.array(np.tile(bands, n)),
        "band_key": pa.array(vals.reshape(-1)),
        id_col: pa.array(np.repeat(np.asarray(ids, dtype=object), 4).tolist()),
        "simhash": pa.array(np.repeat(sh.view(np.int64), 4)),
    })


def simhash_neardup_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                          max_hamming: int = 3, max_bucket: int = 256
                          ) -> pd.DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via 4-band
    blocking + in-bucket verification.

    Same collision-detection shape as :func:`minhash_lsh_candidates`:
    a distributed count-aggregate finds colliding band keys (the vast
    majority are singletons), only colliding rows reach the driver for
    vectorized verification — no per-group map_groups overhead."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    sigs = ds.map_batches(lambda b: simhash_batch(b, text_col=text_col),
                          batch_format="pyarrow", zero_copy_batch=True)
    bands = sigs.map_batches(lambda b: simhash_band_batch(b, id_col=id_col),
                             batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def add_ckey(b: pa.Table) -> pa.Table:
        ck = (b["band"].to_numpy(zero_copy_only=False).astype(np.int64)
              * 65536 + b["band_key"].to_numpy(zero_copy_only=False))
        return b.append_column("ckey", pa.array(ck))

    keyed = bands.map_batches(add_ckey, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def key_counts(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, ["ckey"]).aggregate([([], "count_all")])
        return g.rename_columns(["ckey", "n"])

    counts = (keyed.map_batches(key_counts, batch_format="pyarrow",
                                zero_copy_batch=True)
                   .groupby("ckey").aggregate(Sum("n", alias_name="n")))
    collide = counts.map_batches(
        lambda b: b.filter(pc.greater(b["n"], 1)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype=object),
                          "doc_b": pd.Series([], dtype=object),
                          "hamming": pd.Series([], dtype=np.int64)})
    if len(collide) == 0:
        return empty
    wanted = pa.array(collide["ckey"].to_numpy(), type=pa.int64())
    hits = keyed.map_batches(
        lambda b: b.filter(pc.is_in(b["ckey"], value_set=wanted)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()

    frames = [empty]
    for _, g in hits.groupby("ckey"):
        sub = g.drop_duplicates(id_col).sort_values(id_col)
        if len(sub) < 2 or len(sub) > max_bucket:
            continue
        ids = sub[id_col].to_numpy()
        hs = sub["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        x = hs[:, None] ^ hs[None, :]
        ham = np.zeros_like(x, dtype=np.int64)
        while x.any():
            ham += (x & U64(1)).astype(np.int64)
            x = x >> U64(1)
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = ham[ii, jj] <= max_hamming
        frames.append(pd.DataFrame({"doc_a": ids[ii[keep]],
                                    "doc_b": ids[jj[keep]],
                                    "hamming": ham[ii, jj][keep]}))
    out = pd.concat(frames, ignore_index=True)
    return out.drop_duplicates(["doc_a", "doc_b"], ignore_index=True)
