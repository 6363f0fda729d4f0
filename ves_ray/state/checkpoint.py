"""Fragment manifest + per-partition completion checkpoint.

Reference semantics translated to batch-over-Parquet (SURVEY §1.2):

- live file (inode)            → input Parquet fragment (path is the
  stable identity; inodes don't exist in object storage — SURVEY S6)
- ``discover_initial_files``   → ``build_manifest`` (footer-only stat
  of every fragment; reference: src/watcher/discovery.rs:18-49)
- ``translate_event`` watcher  → ``diff_manifest`` classifying
  discovered / rotated / removed fragments
  (reference: src/watcher/events.rs:18-65)
- ``Checkpoint{inode→offset}`` → one durable marker file per COMPLETED
  fragment under ``<out>/_checkpoint/``; resume = anti-join pending
  fragments against markers (reference: src/watcher/models.rs:56-58)
- ADR write-ordering invariant ("persistent writes happen before
  in-memory updates", checkpoint-store ADR :31) → data + lineage are
  durable (written and atomically renamed) BEFORE markers are written.

Markers are tiny JSON files, one per fragment, so completion updates
are atomic at fragment granularity and a 100 TB resume never rewrites
a global manifest under contention.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

from pyarrow import fs as pafs

from . import fs as vfs

CHECKPOINT_DIR = "_checkpoint"


@dataclass(frozen=True)
class FragmentInfo:
    """Batch analogue of the reference FileState
    (src/watcher/models.rs:46-50): identity + extent."""
    path: str
    num_rows: int
    size_bytes: int

    @property
    def key(self) -> str:
        return hashlib.sha1(self.path.encode()).hexdigest()[:16]


# unit-id separator for sub-fragment (row-group range) checkpointing:
# "<file>#rg<start>-<end>" identifies row groups [start, end) of <file>
UNIT_SEP = "#rg"


def parse_unit(unit_path: str) -> tuple[str, int | None, int | None]:
    """Split a (possibly unit-qualified) fragment id into
    (file_path, rg_start, rg_end). Plain paths → (path, None, None)."""
    if UNIT_SEP not in unit_path:
        return unit_path, None, None
    file_path, _, rng = unit_path.rpartition(UNIT_SEP)
    a, _, b = rng.partition("-")
    return file_path, int(a), int(b)


def build_manifest(paths: list[str],
                   split_rows: int | None = None,
                   filesystem: pafs.FileSystem | None = None
                   ) -> list[FragmentInfo]:
    """Stat every input fragment (Parquet footer only — the analogue of
    the reference's fs::metadata stat in determine_file_state,
    src/watcher/state.rs:8-31).

    ``split_rows`` enables sub-fragment checkpoint granularity — the
    batch analogue of the reference's inode→OFFSET checkpoint
    (src/watcher/models.rs:46-58): a fragment whose row count exceeds
    the threshold is split into row-group-range units
    ("<file>#rg<a>-<b>"), each its own checkpointable FragmentInfo, so
    a crash mid-file re-does at most one unit instead of the whole
    fragment. Unit extents carry the unit's rows + the FILE's byte
    size, so an in-place rewrite (rotation) still invalidates every
    unit of the file.

    Footer reads are I/O-bound and independent, so they run on a
    thread pool — a serial loop over 10⁵–10⁶ fragments would make
    planning, not compute, the startup bottleneck at corpus scale."""
    from concurrent.futures import ThreadPoolExecutor

    def stat_one(p: str) -> list[FragmentInfo]:
        f, inner = vfs.resolve_fs(p, filesystem)
        md = vfs.open_parquet(f, inner).metadata
        size = vfs.file_size(f, inner)
        if not split_rows or md.num_rows <= split_rows:
            return [FragmentInfo(path=p, num_rows=md.num_rows,
                                 size_bytes=size)]
        units, start, acc = [], 0, 0
        for rg in range(md.num_row_groups):
            acc += md.row_group(rg).num_rows
            last = rg == md.num_row_groups - 1
            if acc >= split_rows or last:
                units.append(FragmentInfo(
                    path=f"{p}{UNIT_SEP}{start}-{rg + 1}",
                    num_rows=acc, size_bytes=size))
                start, acc = rg + 1, 0
        return units

    ordered = sorted(paths)
    if len(ordered) <= 4:
        return [u for p in ordered for u in stat_one(p)]
    with ThreadPoolExecutor(max_workers=min(32, len(ordered))) as pool:
        return [u for units in pool.map(stat_one, ordered) for u in units]


def diff_manifest(current: list[FragmentInfo],
                  previous: dict[str, dict]) -> dict[str, list[FragmentInfo]]:
    """Classify fragments against checkpointed state — the batch
    translate_event (src/watcher/events.rs:18-65): new path →
    discovered; same path, different extent → rotated (reprocess);
    checkpointed path no longer present → removed."""
    cur_by_path = {f.path: f for f in current}
    discovered, rotated, unchanged = [], [], []
    for f in current:
        prev = previous.get(f.path)
        if prev is None:
            discovered.append(f)
        elif (prev.get("num_rows") != f.num_rows
              or prev.get("size_bytes") != f.size_bytes):
            rotated.append(f)
        else:
            unchanged.append(f)
    removed = [p for p in previous if p not in cur_by_path]
    return {"discovered": discovered, "rotated": rotated,
            "unchanged": unchanged, "removed": removed}


class CheckpointStore:
    """Durable completion markers under ``<root>/_checkpoint/``."""

    def __init__(self, root: str,
                 filesystem: pafs.FileSystem | None = None):
        self.fs, inner = vfs.resolve_fs(root, filesystem)
        self.dir = vfs.join(inner, CHECKPOINT_DIR)
        vfs.makedirs(self.fs, self.dir)

    def _marker_path(self, frag: FragmentInfo) -> str:
        return vfs.join(self.dir, f"{frag.key}.json")

    def completed(self) -> dict[str, dict]:
        """path → marker record for every completed fragment."""
        out = {}
        for name in vfs.listdir(self.fs, self.dir):
            if not name.endswith(".json"):
                continue
            rec = json.loads(
                vfs.read_text(self.fs, vfs.join(self.dir, name)))
            out[rec["path"]] = rec
        return out

    def mark_done(self, frag: FragmentInfo, extra: dict | None = None) -> None:
        """Atomic (write temp + rename) per-fragment completion record.
        MUST be called only after the fragment's output data and lineage
        are durable (ADR invariant 4)."""
        rec = {"path": frag.path, "num_rows": frag.num_rows,
               "size_bytes": frag.size_bytes, **(extra or {})}
        vfs.write_text_atomic(self.fs, self._marker_path(frag),
                              json.dumps(rec))

    def remove_marker(self, path: str) -> None:
        key = hashlib.sha1(path.encode()).hexdigest()[:16]
        vfs.delete_file(self.fs, vfs.join(self.dir, f"{key}.json"))

    def pending(self, current: list[FragmentInfo]) -> list[FragmentInfo]:
        """Resume planner: anti-join current manifest against markers.
        Rotated fragments (extent changed since marker) are reprocessed,
        mirroring rotation = restart-at-zero semantics
        (src/tailer/tailer_events.rs:35-48)."""
        d = diff_manifest(current, self.completed())
        return sorted(d["discovered"] + d["rotated"], key=lambda f: f.path)


def atomic_publish_dir(tmp_dir: str, final_dir: str,
                       filesystem: pafs.FileSystem | None = None) -> None:
    """Atomically publish a completed output directory (write to temp,
    single rename — SURVEY §4.2 hard part 2; on object stores the
    rename degrades to copy+delete, which is why every reader also
    checks a manifest-last marker rather than trusting the rename)."""
    f, final_inner = vfs.resolve_fs(final_dir, filesystem)
    _, tmp_inner = vfs.resolve_fs(tmp_dir, filesystem)
    if vfs.exists(f, final_inner):
        raise FileExistsError(final_dir)
    vfs.move(f, tmp_inner, final_inner)


def clean_stale_tmp(root: str,
                    filesystem: pafs.FileSystem | None = None) -> None:
    """Remove crashed runs' uncommitted temp output dirs."""
    f, inner = vfs.resolve_fs(root, filesystem)
    if not vfs.is_dir(f, inner):
        return
    for name in vfs.listdir(f, inner):
        if name.startswith(".tmp-"):
            try:
                vfs.delete_dir(f, vfs.join(inner, name))
            except OSError:
                pass
