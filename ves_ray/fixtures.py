"""Deterministic synthetic fixtures (FIXTURES.md §1–2).

Byte-identical output for a given ``(seed, n_rows)``: all randomness is
splitmix64 over explicit (seed, row, position) coordinates — no RNG
state, no wall clock. Vectorized end-to-end; the token matrix for 1M
rows generates in ~1s.

Distribution (FIXTURES.md §1):
- ~0.5 % of rows carry a source ABSENT from the lookup table
  (``svc-unk-*``) → exercises enrich default-route handling.
- ~60 % of the remainder land on the hot source ``svc-000`` →
  exercises salted-key skew mitigation (SURVEY T5).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .hashing import U64, hash2, splitmix64
from .schema import MAX_TOKENS, SEQUENCES_SCHEMA, SOURCES_SCHEMA, VOCAB_SIZE

N_SOURCES = 32
HOT_SOURCE = "svc-000"
UNKNOWN_FRAC = 0.005
HOT_FRAC = 0.60

_DOMAIN_SRC = 0x51
_DOMAIN_LEN = 0x52
_DOMAIN_TOK = 0x53


def _coords(seed: int, domain: int, i: np.ndarray) -> np.ndarray:
    return hash2(splitmix64(U64(seed & 0xFFFFFFFFFFFFFFFF) ^ U64(domain)), i.astype(U64))


def make_sources_table() -> pa.Table:
    """The source→(tenant, severity, route) lookup (FIXTURES.md §2)."""
    k = np.arange(N_SOURCES)
    return pa.table({
        "source": [f"svc-{v:03d}" for v in k],
        "tenant": [f"tenant-{v % 5}" for v in k],
        "severity": [["debug", "info", "warn", "error"][v % 4] for v in k],
        "route": [f"route-{v % 6}" for v in k],
        "hot": [v == 0 for v in k],
    }, schema=SOURCES_SCHEMA)


def make_sequences_table(seed: int, n_rows: int, row_offset: int = 0) -> pa.Table:
    """Generate `n_rows` sequences starting at global row `row_offset`."""
    i = np.arange(row_offset, row_offset + n_rows, dtype=np.int64)

    # -- source assignment --------------------------------------------
    u = _coords(seed, _DOMAIN_SRC, i).astype(np.float64) / float(2**64)
    unknown = u < UNKNOWN_FRAC
    hot = (~unknown) & (u < UNKNOWN_FRAC + HOT_FRAC)
    cold_pick = 1 + (_coords(seed, _DOMAIN_SRC + 7, i) % U64(N_SOURCES - 1)).astype(np.int64)
    src_idx = np.where(hot, 0, cold_pick)
    sources = np.where(
        unknown,
        np.char.add("svc-unk-", (i % 17).astype(str)),
        np.char.add("svc-", np.char.zfill(src_idx.astype(str), 3)),
    )

    # -- token lengths & values ---------------------------------------
    n_tok = (1 + _coords(seed, _DOMAIN_LEN, i) % U64(MAX_TOKENS)).astype(np.int32)
    offsets = np.concatenate(([0], np.cumsum(n_tok))).astype(np.int32)
    total = int(offsets[-1])
    row_of = np.repeat(i, n_tok)
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1].astype(np.int64), n_tok)
    row_key = _coords(seed, _DOMAIN_TOK, row_of)
    values = (hash2(row_key, j.astype(U64)) % U64(VOCAB_SIZE)).astype(np.int32)

    doc_id = np.char.add(np.char.add(sources, "-"), np.char.zfill(i.astype(str), 12))

    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pa.array(values, type=pa.int32()))
    return pa.table({
        "doc_id": pa.array(doc_id.tolist(), type=pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": pa.array(sources.tolist(), type=pa.string()),
    }, schema=SEQUENCES_SCHEMA)


def write_sequences(out_dir: str, seed: int = 7, n_rows: int = 2000,
                    n_files: int = 8, rows_per_group: int | None = None) -> list[str]:
    """Write the sequences table as >=`n_files` Parquet fragments
    (FIXTURES.md: multi-file so manifest / lineage / resume tests have
    real fragments to checkpoint). Returns the file paths."""
    os.makedirs(out_dir, exist_ok=True)
    per = -(-n_rows // n_files)
    paths = []
    for f in range(n_files):
        start, stop = f * per, min((f + 1) * per, n_rows)
        if start >= stop:
            break
        t = make_sequences_table(seed, stop - start, row_offset=start)
        p = os.path.join(out_dir, f"sequences-{f:05d}.parquet")
        pq.write_table(t, p, row_group_size=rows_per_group or max(64, per // 2))
        paths.append(p)
    return paths


def write_sources(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, "sources.parquet")
    pq.write_table(make_sources_table(), p)
    return p
