"""Export/ship sink (SURVEY T10): the batch analogue of the
reference's planned gRPC export.

The reference declares a gRPC shipping stage via its dependency set
(``tonic``/``prost``/``tonic-prost`` — components/core-agent/
Cargo.toml:36-38) but contains no implementation. In a batch rebuild
the natural "wire" is a directory a downstream collector ingests:
newline-delimited JSON records (the lingua franca of log shippers)
plus a manifest carrying row counts, schemas and order-insensitive
checksums so the receiving side can verify integrity without trusting
transport — the same role gRPC message framing + ack would play.

Shape: per-table distributed JSONL render (``map_batches`` → one
shard file per block, written by the tasks), then an atomic publish
(temp dir + rename, exactly the flagship sink protocol) with the
manifest written LAST — a manifest's existence certifies a complete,
checksummed export. Re-export of an existing dir is a no-op unless
``overwrite=True``.

Multi-node: every path goes through ``state.fs`` — pass
``filesystem=`` (or a ``scheme://`` out_dir) to ship onto shared or
object storage; the filesystem handle rides into the render tasks.
"""

from __future__ import annotations

import json
import uuid

import numpy as np
import pyarrow as pa
from pyarrow import fs as pafs

from . import fs as vfs

MANIFEST_NAME = "manifest.json"


def _lines_checksum(lines: list[str]) -> int:
    """Order-insensitive 63-bit checksum over JSON lines — computable
    identically by any consumer from the wire bytes."""
    from ..hashing import MASK63, hash_strings
    if not lines:
        return 0
    with np.errstate(over="ignore"):
        s = int(np.sum(hash_strings(lines, seed=0xE0),
                       dtype=np.uint64))
    return s & int(MASK63)


def _render_jsonl(tag: str, dest: str, f_sys: pafs.FileSystem):
    """map_batches fn: render one shard .jsonl per block + emit a tiny
    (file, rows, checksum) record for the manifest. ``f_sys`` rides
    into the Ray tasks (pyarrow filesystems are picklable), so shards
    land on the shared store directly from the workers."""
    def fn(b: pa.Table) -> pa.Table:
        name = f"{tag}-{uuid.uuid4().hex}.jsonl"
        path = vfs.join(dest, name)
        lines = [json.dumps(r, sort_keys=True, default=str)
                 for r in b.to_pylist()]
        vfs.write_text(f_sys, path,
                       "\n".join(lines) + ("\n" if lines else ""))
        return pa.table({"file": pa.array([name]),
                         "rows": pa.array([len(b)], type=pa.int64()),
                         "checksum": pa.array([_lines_checksum(lines)],
                                              type=pa.int64())})
    return fn


def export_results(tables: dict, out_dir: str, *,
                   overwrite: bool = False,
                   filesystem: pafs.FileSystem | None = None) -> dict:
    """Ship result tables as a checksummed JSONL export directory.

    ``tables``: name → pa.Table or ray.data.Dataset. Datasets render
    distributed (one shard per block, written by the tasks); plain
    tables render on the driver (they are result-scale). Returns the
    manifest dict. Layout::

        out_dir/
          manifest.json            # written LAST — presence = complete
          <name>/<name>-<hex>.jsonl

    Checksums are per-table XOR-free SUMS of per-row hashes, so shard
    order and row order never matter; the consumer re-hashes the lines
    it received and compares."""
    import ray.data as rd

    f_sys, out_inner = vfs.resolve_fs(out_dir, filesystem)
    man_path = vfs.join(out_inner, MANIFEST_NAME)
    if vfs.exists(f_sys, man_path):
        if not overwrite:
            return json.loads(vfs.read_text(f_sys, man_path))
        vfs.delete_dir(f_sys, out_inner)
    parent = vfs.parent(out_inner) or "."
    vfs.makedirs(f_sys, parent)
    tmp = vfs.join(parent, f".tmp-export-{uuid.uuid4().hex[:8]}")
    vfs.makedirs(f_sys, tmp)
    manifest: dict = {"tables": {}}
    try:
        for name, obj in tables.items():
            dest = vfs.join(tmp, name)
            vfs.makedirs(f_sys, dest)
            if isinstance(obj, rd.Dataset):
                recs = (obj.map_batches(_render_jsonl(name, dest, f_sys),
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)
                        .to_pandas())
                from ..hashing import MASK63
                files = sorted(recs["file"].tolist())
                rows = int(recs["rows"].sum())
                cksum = int(recs["checksum"].sum()) & int(MASK63)
            else:
                t = obj if isinstance(obj, pa.Table) else \
                    pa.Table.from_pandas(obj, preserve_index=False)
                rec = _render_jsonl(name, dest, f_sys)(t)
                files = [rec["file"][0].as_py()]
                rows = len(t)
                cksum = rec["checksum"][0].as_py()
            manifest["tables"][name] = {
                "files": files, "rows": rows, "checksum": cksum}
        vfs.write_text(f_sys, vfs.join(tmp, MANIFEST_NAME),
                       json.dumps(manifest, indent=1, sort_keys=True))
        vfs.move(f_sys, tmp, out_inner)
    finally:
        vfs.delete_dir(f_sys, tmp)
    return manifest


def verify_export(out_dir: str,
                  filesystem: pafs.FileSystem | None = None) -> dict:
    """Consumer-side integrity check: recompute each table's row count
    and checksum from the wire bytes and compare to the manifest.
    Returns {table: bool}; a missing manifest raises (no silent
    partial ingest — the reference ADR's no-skip invariant)."""
    from ..hashing import MASK63

    f_sys, out_inner = vfs.resolve_fs(out_dir, filesystem)
    manifest = json.loads(
        vfs.read_text(f_sys, vfs.join(out_inner, MANIFEST_NAME)))
    out = {}
    for name, meta in manifest["tables"].items():
        rows, s = 0, 0
        for fn in meta["files"]:
            text = vfs.read_text(f_sys, vfs.join(out_inner, name, fn))
            lines = [ln for ln in text.split("\n") if ln]
            rows += len(lines)
            # same composition as the producer: per-FILE masked sum,
            # then masked sum across files (files are the framing)
            s = (s + _lines_checksum(lines)) & int(MASK63)
        out[name] = (rows == meta["rows"] and s == meta["checksum"])
    return out
