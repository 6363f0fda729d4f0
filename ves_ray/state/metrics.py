"""Per-stage throughput metrics (SURVEY T12).

The reference declares ``prometheus`` + ``hdrhistogram`` self-metrics
(components/core-agent/Cargo.toml:45,51) and captures payload ``size``
"required ONLY for metrics" (src/tailer/payload.rs:12-18). Batch
analogue: a zero-CPU collector actor receives (stage, rows, wall_s)
records fire-and-forget from instrumented ``map_batches`` callables —
one tiny remote call per BATCH, never per row — and the driver drains
it once at run end into per-stage series: rows/s and batch-wall
p50/p99 (the hdrhistogram role). Dropped records (a crashed task's
in-flight call) only under-count metrics; they never affect data
correctness — lineage/aggregates come from the written sink.
"""

from __future__ import annotations

import time

import numpy as np

_COLLECTOR_CLS = None


def _collector_cls():
    global _COLLECTOR_CLS
    if _COLLECTOR_CLS is None:
        import ray

        @ray.remote(num_cpus=0)
        class MetricsCollector:
            def __init__(self):
                self._records: list[tuple[str, int, float]] = []

            def record(self, stage: str, rows: int, wall_s: float) -> None:
                self._records.append((stage, rows, wall_s))

            def drain(self) -> list[tuple[str, int, float]]:
                out, self._records = self._records, []
                return out

        _COLLECTOR_CLS = MetricsCollector
    return _COLLECTOR_CLS


def make_collector():
    """One collector per pipeline run (num_cpus=0 — never steals a
    worker slot)."""
    return _collector_cls().remote()


def timed_stage(stage: str, fn, handle):
    """Wrap a batch transform so every call reports (rows, wall) to the
    collector fire-and-forget. The wrapper adds one clock read and one
    async actor call per batch — negligible against batch compute."""
    def wrapped(batch):
        t0 = time.perf_counter()
        out = fn(batch)
        handle.record.remote(stage, len(out), time.perf_counter() - t0)
        return out
    return wrapped


def drain_summary(handle) -> dict[str, dict]:
    """Drain the collector and fold records into per-stage series."""
    import ray
    records = ray.get(handle.drain.remote())
    stages: dict[str, list[tuple[int, float]]] = {}
    for stage, rows, wall in records:
        stages.setdefault(stage, []).append((rows, wall))
    out = {}
    for stage, recs in stages.items():
        rows = np.array([r for r, _ in recs], dtype=np.int64)
        walls = np.array([w for _, w in recs], dtype=np.float64)
        total_wall = float(walls.sum())
        out[stage] = {
            "batches": int(len(recs)),
            "rows": int(rows.sum()),
            "rows_per_s": round(float(rows.sum()) / total_wall, 1)
            if total_wall else None,
            "batch_wall_p50_ms": round(float(np.percentile(walls, 50)) * 1e3, 3),
            "batch_wall_p99_ms": round(float(np.percentile(walls, 99)) * 1e3, 3),
        }
    return out


def host_snapshot() -> dict:
    """Self/host metrics (the reference's ``sysinfo`` role): process
    peak RSS + CPU availability, stdlib-only."""
    import os
    import resource
    ru = resource.getrusage(resource.RUSAGE_SELF)
    return {
        "cpus": os.cpu_count(),
        "driver_maxrss_mb": round(ru.ru_maxrss / 1024, 1),
        "driver_utime_s": round(ru.ru_utime, 2),
        "driver_stime_s": round(ru.ru_stime, 2),
    }
