"""Raw log-file source — the reference agent's native input.

The reference tails live ``.log``/``.txt`` files discovered under a
configured directory; this is the batch analogue over the same file
surface:

- ``valid_log_file`` mirrors the watcher's path predicate exactly:
  reject directories and dotfiles, accept only ``.log``/``.txt``
  extensions (components/core-agent/src/watcher/discovery.rs:101-116).
- ``discover_log_files`` mirrors ``build_walker``: no symlink follow,
  depth 0–1 when non-recursive (discovery.rs:89-99), with the S4
  predicate applied per entry.
- ``read_log_lines`` replaces the Tailer's 16 KiB chunk reads
  (src/tailer/reader.rs:10,30-43) with ``ray.data.read_text`` — the
  line framing the reference deferred to its unimplemented
  normalization stage (src/tailer/manager.rs:28-30) happens at the
  read, one record per line with the originating path attached.
- ``parse_log_lines`` is the normalization stage itself: a grok
  pattern (stages.parse) vectorized over the line column.
"""

from __future__ import annotations

import posixpath

from pyarrow import fs as pafs

from ..state import fs as vfs

DEFAULT_GROK = ("%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} "
                "%{NOTSPACE:src} %{GREEDYDATA:msg}")


def _valid_name(name: str) -> bool:
    return (not name.startswith(".")
            and (name.endswith(".log") or name.endswith(".txt")))


def valid_log_file(path: str,
                   filesystem: pafs.FileSystem | None = None) -> bool:
    """S4 predicate (discovery.rs:101-116): no dirs, no dotfiles, only
    .log/.txt."""
    f, p = vfs.resolve_fs(path, filesystem)
    if vfs.is_dir(f, p):
        return False
    return _valid_name(posixpath.basename(p.rstrip("/")))


def discover_log_files(root: str, *, recursive: bool = True,
                       filesystem: pafs.FileSystem | None = None
                       ) -> list[str]:
    """S1/S3 walk: sorted valid log files under root; symlinked dirs
    are not followed (FileSelector never follows links); non-recursive
    = depth 0–1 (discovery.rs:89-99)."""
    f, p = vfs.resolve_fs(root, filesystem)
    sel = pafs.FileSelector(p, recursive=recursive)
    out = []
    for info in f.get_file_info(sel):
        # the predicate checks only the entry's OWN name — the
        # reference WalkDir has no filter_entry, so it descends into
        # dot-directories and accepts valid files inside them
        # (discovery.rs:89-116)
        if info.type == pafs.FileType.File \
                and _valid_name(posixpath.basename(info.path)):
            out.append(info.path)
    return sorted(out)


def read_log_lines(root: str, *, recursive: bool = True,
                   filesystem: pafs.FileSystem | None = None):
    """Dataset of (text, path) — one record per log line."""
    import ray.data as rd
    f, _ = vfs.resolve_fs(root, filesystem)
    paths = discover_log_files(root, recursive=recursive,
                               filesystem=filesystem)
    if not paths:
        raise FileNotFoundError(f"no .log/.txt files under {root}")
    return rd.read_text(paths, include_paths=True, filesystem=f)


def parse_log_lines(ds, *, grok: str = DEFAULT_GROK,
                    keep_unmatched: bool = True):
    """Normalization stage: grok-extract structured fields from each
    line (vectorized RE2 via stages.parse); non-matching lines are
    flagged ``parse_ok=false``, never dropped silently."""
    from ..stages.parse import grok_extract_batch
    return ds.map_batches(
        lambda b: grok_extract_batch(b, grok, "text",
                                     keep_unmatched=keep_unmatched),
        batch_format="pyarrow", zero_copy_batch=True)
