"""Process/allocator tuning for throughput.

Large data engines are allocator-bound more often than CPU-bound:
glibc malloc serves >128 KiB requests straight from mmap and returns
them to the OS on free, so every large Arrow/numpy temporary in a hot
batch loop re-faults its pages (on virtualized hosts, first-touch page
faults can run 10-40x slower than resident-memory bandwidth). Raising
the mmap/trim thresholds keeps freed pages in the heap for reuse —
the standard deployment tuning for Arrow/numpy pipelines (Ray's own
docs recommend switching allocators for the same reason).

Call :func:`tune_memory_allocator` BEFORE ``ray.init`` in any process
that owns a Ray session (bench.py, cli, tests): the env vars are
inherited by the raylet and every Ray worker it spawns, and the
``mallopt`` call applies the same settings to the already-running
driver process.
"""

from __future__ import annotations

import ctypes
import os

_ONE_GIB = 1 << 30
_M_TRIM_THRESHOLD = -1
_M_TOP_PAD = -2
_M_MMAP_THRESHOLD = -3


def tune_memory_allocator() -> None:
    """Keep freed large buffers in-process instead of unmapping them.

    Idempotent; safe on non-glibc platforms (env vars are ignored and
    the mallopt call is skipped).
    """
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(_ONE_GIB))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(_ONE_GIB))
    os.environ.setdefault("MALLOC_TOP_PAD_", str(64 << 20))
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, _ONE_GIB)
        libc.mallopt(_M_TRIM_THRESHOLD, _ONE_GIB)
        libc.mallopt(_M_TOP_PAD, 64 << 20)
    except Exception:
        pass
