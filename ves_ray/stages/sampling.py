"""Deterministic sampling operators for training-data mixing.

Stratified (per-stratum rate) hash sampling: the standard way to hit a
target source mixture ("2% of crawl, 40% of books, ...") over a corpus
that cannot be shuffled or counted first. Every row's keep/drop
decision is a pure function of its id and its stratum's rate, so the
sample is reproducible, resumable (a re-run of a failed shard picks
the same rows), and needs NO shuffle, no global state and no RNG —
one stateless ``map_batches`` pass with the tiny rate table broadcast.

Integer ids use ``id % denom`` as the uniform variate (exactly
reproducible in SQL for the DuckDB oracle); string ids use the
vectorized splitmix-based ``hash_strings`` (same determinism, no SQL
parity — document per call site).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hash_strings


def stratified_sample(ds, rate_units: dict[str, int], *,
                      strata_col: str, id_col: str, denom: int = 10_000,
                      default_units: int = 0):
    """Keep each row iff ``uniform(id) < rate_units[stratum]`` where
    ``uniform`` is ``id % denom`` (int ids) or ``hash(id) % denom``
    (string ids). ``rate_units`` maps stratum → units out of
    ``denom`` (e.g. {"crawl": 200} with denom=10000 → 2%); strata
    absent from the map get ``default_units``."""
    import ray
    ref = ray.put(dict(rate_units))

    def keep(b: pa.Table) -> pa.Table:
        units = ray.get(ref)
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if pa.types.is_integer(ids.type):
            u = (ids.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(denom))
        else:
            u = hash_strings(ids, seed=0x5E) % np.uint64(denom)
        strata = b[strata_col]
        if isinstance(strata, pa.ChunkedArray):
            strata = strata.combine_chunks()
        # dictionary-encode the stratum column once per batch; map the
        # (few) distinct strata through the rate dict, then gather
        enc = strata.dictionary_encode()
        dict_rates = np.array([units.get(s, default_units)
                               for s in enc.dictionary.to_pylist()],
                              dtype=np.uint64)
        row_rates = dict_rates[enc.indices.to_numpy(zero_copy_only=False)]
        return b.filter(pa.array(u < row_rates))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
