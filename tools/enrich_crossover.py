"""Measure the task-mode vs actor-mode enrich crossover at realistic
lookup sizes (round-4 verdict item 6) to ground
``FlagshipPipeline.ENRICH_ACTOR_THRESHOLD_BYTES`` in data.

The two physical plans for a broadcast-lookup enrich:

- task mode: stateless ``map_batches`` fn; the ``ray.put`` lookup is
  fetched + chunk-combined once per WORKER PROCESS (module-scope
  cache). Zero extra processes, but with W warm workers the cluster
  holds W decoded copies and pays W decode walls.
- actor mode: ``map_batches(Enricher, concurrency=A)``; decoded once
  per ACTOR (A ≪ W), at the cost of dedicated processes the streaming
  executor must feed (an extra plasma hop vs the fused task stage).

So task mode should win while decode-cost × W is small vs the scan,
and actor mode should win when the lookup is large. This tool sweeps
lookup size, runs both modes over the same synthetic corpus on fresh
Ray sessions, and prints one JSON line per (size, mode).

Usage:
    python tools/enrich_crossover.py [rows] [sizes_mb ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAYLOAD = 96        # bytes of value payload per key (3 cols x 32)


def make_lookup(target_mb: int):
    """source→(tenant, severity, route) lookup of ~target_mb MB:
    key count scaled so Arrow in-memory size hits the target."""
    import numpy as np
    import pyarrow as pa
    n = (target_mb << 20) // (PAYLOAD + 16)
    k = np.arange(n)
    pad = "x" * 30
    t = pa.table({
        "source": pa.array([f"src-{v:09d}" for v in k]),
        "tenant": pa.array([f"t{v % 50:02d}{pad}" for v in k]),
        "severity": pa.array([f"s{v % 4}{pad}" for v in k]),
        "route": pa.array([f"r{v % 64:02d}{pad}" for v in k]),
    })
    return t, n


def run_mode(mode: str, rows: int, size_mb: int, num_cpus: int) -> dict:
    import numpy as np
    import pyarrow as pa
    import ray

    from ves_ray.tuning import tune_memory_allocator
    tune_memory_allocator()
    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False

    from ves_ray.stages.enrich import Enricher, make_task_enricher

    lookup, n_keys = make_lookup(size_mb)
    actual_mb = lookup.nbytes >> 20
    ref = ray.put(lookup)

    def add_source(b: pa.Table) -> pa.Table:
        i = b["id"]
        if isinstance(i, pa.ChunkedArray):
            i = i.combine_chunks()
        iv = i.to_numpy(zero_copy_only=False) % n_keys
        # vectorized "src-%09d" formatting
        s = np.char.add("src-",
                        np.char.zfill(iv.astype("U9"), 9))
        return b.append_column("source", pa.array(s))

    base = rd.range(rows).map_batches(add_source,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
    if mode == "task":
        ds = base.map_batches(make_task_enricher(ref),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
    else:
        ds = base.map_batches(Enricher,
                              fn_constructor_kwargs=dict(lookup=ref),
                              batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=32_768,
                              concurrency=4, num_cpus=1)
    # consume with a cheap exact aggregate so enrich output never
    # gathers to the driver
    t0 = time.perf_counter()
    n = ds.count()
    wall = time.perf_counter() - t0
    ray.shutdown()
    assert n == rows
    return {"mode": mode, "lookup_mb": actual_mb, "rows": rows,
            "num_cpus": num_cpus, "wall_s": round(wall, 2),
            "rows_per_s": round(rows / wall)}


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    sizes = [int(s) for s in sys.argv[2:]] or [4, 64, 256]
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    out = []
    for size in sizes:
        for mode in ("task", "actor"):
            r = run_mode(mode, rows, size, num_cpus)
            print(json.dumps(r))
            out.append(r)
    with open("/tmp/enrich_crossover.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
