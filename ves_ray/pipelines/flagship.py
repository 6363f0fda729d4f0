"""Flagship pipeline: parse → enrich → route → aggregate (north_star).

One streaming Dataset execution per shard of input fragments. Default
physical plan (enrich_mode auto → task for small lookups):

    read_parquet(pending, include_paths)        # S8/S9: fragment read
      → map_batches(parse+checksum+enrich+salt) # T1/T4/T5 one fused stage
      → write_parquet(.tmp-shard, partition_cols=['route'])   # T7
    atomic rename .tmp-shard → shard=<id>        # durable data
    stats    = ONE narrow pass over the WRITTEN shard:          # T6+T8
               block-local (fragment,route,source) partials →
               driver combine → lineage + per-shard aggregates
    markers  = per-fragment checkpoint records (written LAST)   # T9
    final aggregates = O(shards) merge of per-shard records

With enrich_mode="actor" (auto for lookups ≥ 96 MB — measured
crossover, see ENRICH_ACTOR_THRESHOLD_BYTES) the fused stage
splits into stateless parse tasks → Enricher actor pool → salt tasks.

Exactly-once story (ADR invariants, checkpoint-store ADR :10-13,27-34):
- data + lineage become durable via atomic directory renames BEFORE
  completion markers are written ("persist before in-memory update");
- a crash before rename leaves only ``.tmp-*`` dirs (deleted on the
  next run); a crash between rename and markers is recovered by
  re-deriving markers from the published lineage records —
  no reprocessing, no duplication, no skips;
- lineage and aggregates are computed FROM THE WRITTEN SINK
  (column-pruned read-back), never from side-effect counters, so Ray
  task retries and resumed runs yield identical totals (SURVEY §4.2
  hard part 1).

Scale notes: no all-to-all exchange anywhere — the only "shuffle" is
collecting O(blocks × routes) partial rows to the driver per shard;
routing skew is handled by salting hot routes (stages.route); the
stats read-back touches 5 narrow columns of the written shard.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import fs as pafs

from ..schema import SOURCES_SCHEMA
from ..sources.sequences import expand_paths
from ..stages.enrich import Enricher, _as_table
from ..stages.parse import parse_batch
from ..stages.route import hot_route_salts, make_salter
from ..state.checkpoint import (CheckpointStore, atomic_publish_dir,
                                build_manifest, clean_stale_tmp)
from ..state import fs as vfs
from ..state.lineage import add_row_checksum_batch


def _shard_partial(batch: pa.Table) -> pa.Table:
    """Block-local partial for every per-shard statistic at once:
    grouped by (fragment, route, source) → events / n_tok_sum /
    checksum. One row per key-combo per block (a block usually covers
    one fragment), so the collected partials are O(blocks × routes) —
    driver-combinable at any shard size."""
    if len(batch) == 0:
        return pa.table({"fragment": pa.array([], type=pa.string()),
                         "route": pa.array([], type=pa.string()),
                         "source": pa.array([], type=pa.string()),
                         "events": pa.array([], type=pa.int64()),
                         "n_tok_sum": pa.array([], type=pa.int64()),
                         "checksum": pa.array([], type=pa.int64())})
    g = pa.TableGroupBy(batch, ["fragment", "route", "source"]).aggregate(
        [([], "count_all"), ("n_tok", "sum"), ("row_ck", "sum")])
    return g.rename_columns(["fragment", "route", "source",
                             "events", "n_tok_sum", "checksum"])


def _combine_partials(part: pa.Table) -> dict[str, pa.Table]:
    """Driver-side final combine of the tiny partials: lineage per
    fragment, per-sink counts, per-sink source histogram."""
    lin = pa.TableGroupBy(part, ["fragment"]).aggregate(
        [("events", "sum"), ("n_tok_sum", "sum"), ("checksum", "sum")]
    ).rename_columns(["fragment", "rows", "n_tok_sum", "checksum"])
    counts = pa.TableGroupBy(part, ["route"]).aggregate(
        [("events", "sum"), ("n_tok_sum", "sum")]
    ).rename_columns(["route", "events", "n_tok_sum"])
    hist = pa.TableGroupBy(part, ["route", "source"]).aggregate(
        [("events", "sum")]
    ).rename_columns(["route", "source", "events"])
    return {"lineage": lin.sort_by("fragment"),
            "route_counts": counts.sort_by("route"),
            "source_hist": hist.sort_by([("route", "ascending"),
                                         ("source", "ascending")])}


def _shard_id(frags) -> str:
    """Deterministic shard identity over the fragment set INCLUDING
    extents, so a rotated fragment (same path, new content —
    src/watcher/events.rs FileRotated) never collides with the shard
    published from its old content."""
    key = "\n".join(f"{f.path}\t{f.num_rows}\t{f.size_bytes}"
                    for f in sorted(frags, key=lambda f: f.path))
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def _parse_and_checksum(batch: pa.Table) -> pa.Table:
    if "path" in batch.column_names:
        names = ["fragment" if c == "path" else c for c in batch.column_names]
        batch = batch.rename_columns(names)
    batch = parse_batch(batch)
    return add_row_checksum_batch(batch)


# Per-worker-process cache for the fused task-mode transform (same
# pattern as stages.enrich._TASK_ENRICHERS: a cloudpickled closure is
# re-deserialized per task, so per-worker state must live at module
# scope keyed by the broadcast ref).
_FUSED_ENRICHERS: dict[str, Enricher] = {}


def make_fused_transform(lookup_ref, hot_salt):
    """parse → checksum → broadcast-lookup enrich → salt as ONE
    map_batches stage. Explicit fusion: one operator means one plasma
    hop between read and write instead of three, and no rebatching
    between stages. Used when the lookup is small enough that the
    stateful-setup argument for a dedicated actor pool doesn't apply."""
    from ..stages.route import make_salter
    salter = make_salter(hot_salt)
    ref_key = lookup_ref.hex()

    def transform(batch: pa.Table) -> pa.Table:
        e = _FUSED_ENRICHERS.get(ref_key)
        if e is None:
            import ray
            e = Enricher(ray.get(lookup_ref))
            _FUSED_ENRICHERS[ref_key] = e
        return salter(e(_parse_and_checksum(batch)))

    return transform


def _stub_fsspec_http() -> None:
    """Make Ray's per-read `from fsspec.implementations.http import
    HTTPFileSystem` probe deterministic under driver threads.

    Without aiohttp installed that import FAILS on every read_parquet
    call; Ray catches the single-thread ModuleNotFoundError, but two
    threads importing concurrently can race — one observes the
    partially-initialized module and gets a bare ImportError that Ray
    does not catch. Registering a sentinel module (whose class nothing
    is ever an instance of) makes the probe succeed and side-steps the
    race; genuinely-HTTP filesystems would need aiohttp regardless."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except ImportError:
        pass
    import sys
    import types
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:          # sentinel only — never instantiated
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def _read_routed(routed_root: str, columns: list[str] | None,
                 filesystem: pafs.FileSystem | None = None):
    import ray.data as rd
    return rd.read_parquet(routed_root, columns=columns,
                           filesystem=filesystem)


class FlagshipPipeline:
    """Driver object (the batch analogue of the reference Watcher +
    TailerManager wiring, src/watcher/watcher.rs:92-161 +
    src/tailer/manager.rs:44-66): owns config, manifest and checkpoint
    state; Ray Data owns scheduling, backpressure and retries."""

    # parquet encode options for the routed sink: dictionary-encode only
    # the low-cardinality string columns (dict-encoding the token arrays
    # costs ~3x encode CPU for no win; doc_id is unique so a dictionary
    # just doubles the work); zstd-1 ≈ snappy+dict size at half the CPU.
    WRITE_OPTS = dict(compression="zstd", compression_level=1,
                      use_dictionary=["fragment", "source", "src",
                                      "tenant", "severity"])

    # lookups under this size ship to every task worker for free (one
    # ray.get from plasma, decoded once per worker); above it, the
    # dedicated actor pool (setup once per actor, north_star pattern)
    # pays for itself. Measured crossover on this host
    # (tools/enrich_crossover.py, 20M probe rows, 32 task workers vs a
    # 4-actor pool, quiet box): task mode wins to ~72 MB (8.6 s vs
    # 16.7 s), actor wins from ~145 MB (18.1 s vs 28.0 s) and is 4.6x
    # ahead by 226 MB — actor wall is flat in lookup size while task
    # mode pays per-worker decode+index-build. Threshold sits between.
    # It scales inversely with workers-per-node: more task workers
    # multiply the decode cost, pushing the crossover DOWN.
    ENRICH_ACTOR_THRESHOLD_BYTES = 96 << 20

    # shard_size governs checkpoint granularity: None processes all
    # pending fragments as one shard (one streaming execution — right
    # for bounded jobs and benches); long 100 TB jobs should set a
    # bounded shard_size (e.g. 64–256 fragments) so completion markers
    # land incrementally and a crash loses at most one shard of work.
    # Shards run sequentially on purpose: each shard is itself a
    # whole-cluster streaming execution.
    # enrich_concurrency sizes the ACTOR-mode pool; "auto" resolves
    # from live cluster CPUs at construction (~cluster_cpus/8 pool
    # cpus, floor 2 actors — the pool is throughput-bound at roughly
    # 300-400k rows/s per actor-cpu, tools/enrich_crossover.py). A
    # 4-CPU pytest session resolves to one pool cpu: pool cpus must
    # stay under session cpus or the streaming executor deadlocks.
    # shard_parallelism bounds how many shards execute concurrently
    # (driver threads, each owning one streaming Dataset execution).
    # Default 1: one shard normally saturates the cluster. Raise to
    # 2–3 when shard_size is small relative to the cluster so actor
    # spin-up / write barriers of one shard overlap another's compute.
    def __init__(self, input_path, lookup, out_dir: str, *,
                 shard_size: int | None = None,
                 shard_parallelism: int = 1,
                 enrich_mode: str = "auto",
                 enrich_concurrency="auto",
                 enrich_num_cpus: float = 0.5,
                 enrich_batch_size: int = 8_192,
                 salt_k: int = 16, min_rows_per_file: int | None = None,
                 read_concurrency: int | None = None,
                 stage_metrics: bool = True,
                 split_fragment_rows: int | None = None,
                 filesystem: pafs.FileSystem | None = None):
        # ONE filesystem covers input and output (a shared store on a
        # real cluster); bare local paths resolve to LocalFileSystem,
        # so all existing callers are unchanged. The resolved handle
        # rides into the Ray read/write tasks. Input paths that
        # resolve to a DIFFERENT filesystem kind than out_dir would
        # surface as FileNotFoundError deep in build_manifest — catch
        # the mismatch loudly here instead.
        self.fs, out_inner = vfs.resolve_fs(out_dir, filesystem)
        for probe in ([input_path] if isinstance(input_path, str)
                      else list(input_path)):
            in_fs, _ = vfs.resolve_fs(probe, filesystem)
            if in_fs.type_name != self.fs.type_name:
                raise ValueError(
                    f"input {probe!r} resolves to a "
                    f"{in_fs.type_name!r} filesystem but out_dir "
                    f"{out_dir!r} resolves to {self.fs.type_name!r}; "
                    "put both on one store or pass an explicit "
                    "filesystem=")
        self.input_paths = expand_paths(input_path, filesystem)
        self.lookup = _as_table(lookup)
        self.out_dir = out_inner
        self.routed_root = vfs.join(out_inner, "routed")
        self.lineage_root = vfs.join(out_inner, "lineage")
        self.counts_dir = vfs.join(out_inner, "counts")
        self.shard_size = shard_size
        self.shard_parallelism = max(1, shard_parallelism)
        if enrich_mode == "auto":
            enrich_mode = ("task" if self.lookup.nbytes
                           < self.ENRICH_ACTOR_THRESHOLD_BYTES else "actor")
        self.enrich_mode = enrich_mode
        if enrich_concurrency == "auto":
            # resolve at construction from the live cluster: one
            # enrich-actor cpu per ~8 cluster cpus keeps a
            # throughput-bound pool (~300-400k rows/s per actor-cpu,
            # tools/enrich_crossover.py) off the critical path while
            # bounding decoded-lookup copies. Floor 2 actors; with
            # num_cpus=0.5 a 4-CPU pytest session resolves to 2 x 0.5
            # = 1 cpu, well under the executor-deadlock line.
            try:
                import ray
                cpus = (int(ray.cluster_resources().get("CPU", 4))
                        if ray.is_initialized() else 4)
            except Exception:
                cpus = 4
            enrich_concurrency = max(
                2, int(cpus // 8 / max(enrich_num_cpus, 0.125)))
        self.enrich_concurrency = enrich_concurrency
        self.enrich_num_cpus = enrich_num_cpus
        self.enrich_batch_size = enrich_batch_size
        self.hot_salt = hot_route_salts(self.lookup, k=salt_k)
        self.min_rows_per_file = min_rows_per_file
        self.read_concurrency = read_concurrency
        self.stage_metrics = stage_metrics
        # sub-fragment checkpoint granularity (reference inode→offset
        # analogue): fragments above this row count split into
        # row-group-range units, each checkpointed independently, so a
        # crash mid-fragment loses at most one unit of work
        self.split_fragment_rows = split_fragment_rows
        self._metrics_handle = None
        self.store = CheckpointStore(out_inner, self.fs)

    # -- planning ------------------------------------------------------
    def _manifest(self):
        return build_manifest(self.input_paths,
                              split_rows=self.split_fragment_rows,
                              filesystem=self.fs)

    def plan(self):
        manifest = self._manifest()
        pending = self.store.pending(manifest)
        return manifest, pending

    def _shards(self, pending):
        if not pending:
            return []
        size = self.shard_size or len(pending)
        return [pending[i:i + size] for i in range(0, len(pending), size)]

    # -- transform DAG -------------------------------------------------
    def _read_fragments(self, paths: list[str]):
        """Source Dataset for a shard. Plain fragment paths go through
        ``read_parquet`` (include_paths supplies the fragment id);
        unit-qualified ids ("<file>#rg<a>-<b>", split_fragment_rows)
        are read by a map stage that pulls exactly its row-group range
        — one task per unit, the unit id as the fragment column."""
        import ray.data as rd
        from ..state.checkpoint import parse_unit
        parsed = [parse_unit(p) for p in paths]
        if all(a is None for _, a, _ in parsed):
            return rd.read_parquet(paths, include_paths=True,
                                   concurrency=self.read_concurrency,
                                   filesystem=self.fs)
        items = [{"file": f, "rg_start": -1 if a is None else a,
                  "rg_end": -1 if b is None else b, "unit": p}
                 for p, (f, a, b) in zip(paths, parsed)]

        f_sys = self.fs

        def read_unit(batch: pa.Table) -> pa.Table:
            tabs = []
            for row in batch.to_pylist():
                pf = vfs.open_parquet(f_sys, row["file"])
                if row["rg_start"] >= 0:
                    t = pf.read_row_groups(
                        list(range(row["rg_start"], row["rg_end"])))
                else:
                    t = pf.read()
                tabs.append(t.append_column(
                    "path", pa.array([row["unit"]] * len(t))))
            return pa.concat_tables(tabs)

        # Two things here are load-bearing for parallelism, because the
        # executor's input-bundling counts THIS stage's input rows —
        # the one-row unit descriptors, not the ~split_fragment_rows
        # data rows each expands into:
        # - batch_size=1 (forwarded as min_rows_per_bundled_input):
        #   the default would bundle every descriptor into one task;
        # - ray_remote_args_fn=... blocks operator fusion with the
        #   downstream transform+Write chain, whose min_rows_per_file
        #   would otherwise impose a data-scale row demand ON
        #   DESCRIPTOR ROWS and serialize the whole shard into one
        #   task. Unfused, the write's bundling counts real rows —
        #   exactly like the ReadParquet path, where the read operator
        #   is separate as well.
        return rd.from_items(items, override_num_blocks=len(items)) \
                 .map_batches(read_unit, batch_format="pyarrow",
                              batch_size=1, zero_copy_batch=True,
                              ray_remote_args_fn=lambda: {})

    def build_routed_dataset(self, paths: list[str]):
        import ray
        ds = self._read_fragments(paths)
        lookup_ref = ray.put(self.lookup)

        def instrument(stage, fn):
            if self._metrics_handle is None:
                return fn
            from ..state.metrics import timed_stage
            return timed_stage(stage, fn, self._metrics_handle)

        if self.enrich_mode == "task":
            # broadcast-small-side path: ONE fused task stage
            # (parse+checksum+enrich+salt); lookup decoded once per
            # warm, persistent task worker — no dedicated actors, no
            # extra plasma hops between sub-stages
            return ds.map_batches(
                instrument("parse_enrich_salt",
                           make_fused_transform(lookup_ref, self.hot_salt)),
                batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(instrument("parse", _parse_and_checksum),
                            batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(Enricher,
                            fn_constructor_kwargs=dict(lookup=lookup_ref),
                            batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=self.enrich_batch_size,
                            concurrency=self.enrich_concurrency,
                            num_cpus=self.enrich_num_cpus)
        ds = ds.map_batches(instrument("salt", make_salter(self.hot_salt)),
                            batch_format="pyarrow", zero_copy_batch=True)
        return ds

    # -- shard execution ----------------------------------------------
    def _kill_shard(self, sid: str, member_paths) -> None:
        vfs.delete_dir(self.fs, vfs.join(self.routed_root, f"shard={sid}"))
        vfs.delete_dir(self.fs, vfs.join(self.lineage_root, f"shard={sid}"))
        for path in member_paths:
            self.store.remove_marker(path)

    def _drop_removed(self, manifest) -> None:
        """FileRemoved semantics: a checkpointed fragment that is no
        longer present in the input has been deleted — drop its state
        and output, mirroring the reference's Remove(File) →
        FileRemoved → tailer Stop + checkpoint removal
        (src/watcher/events.rs:40-47, src/watcher/watcher.rs:77-88,
        src/tailer/tailer_events.rs:49-53). The whole shard containing
        the removed fragment is killed (data + lineage + markers) so
        final aggregates stop counting rows whose input is gone;
        surviving members of that shard become pending again and are
        reprocessed into a new shard."""
        completed = self.store.completed()
        cur = {f.path for f in manifest}
        removed = [p for p in completed if p not in cur]
        if not removed:
            return
        dead_shards = {completed[p].get("shard") for p in removed}
        dead_shards.discard(None)
        for sid in dead_shards:
            self._kill_shard(sid, [p for p, rec in completed.items()
                                   if rec.get("shard") == sid])
        for p in removed:          # markers that carried no shard field
            self.store.remove_marker(p)

    def _invalidate_rotated(self, pending) -> None:
        """Rotation recovery: a pending fragment that already has a
        completion marker was REPLACED in place (FileRotated). Its old
        rows live inside a published shard; drop that whole shard
        (data + lineage + every member fragment's marker) so the
        member fragments are reprocessed from current content —
        no stale rows, no duplicates (ADR: no duplicated or skipped
        data across restarts)."""
        completed = self.store.completed()
        dead_shards = {completed[f.path].get("shard")
                       for f in pending if f.path in completed}
        dead_shards.discard(None)
        for sid in dead_shards:
            self._kill_shard(sid, [p for p, rec in completed.items()
                                   if rec.get("shard") == sid])

    def _recover_markers(self, manifest) -> None:
        """Marker-store recovery (ADR: in-memory state reconstructable
        from the durable record, :22-24): published lineage dirs record
        each shard's member fragments and extents. For every published
        shard: re-mark members whose current extents still match
        (markers were lost after publish); kill the shard wholesale if
        any member was rotated since, or its data dir is gone."""
        completed = self.store.completed()
        cur = {f.path: f for f in manifest}
        for name in vfs.listdir(self.fs, self.lineage_root):
            if not name.startswith("shard="):
                continue
            lin_dir = vfs.join(self.lineage_root, name)
            sid = name.split("=", 1)[1]
            frag_file = vfs.join(lin_dir, "fragments.parquet")
            if not vfs.exists(self.fs, frag_file):
                continue
            members = pq.read_table(frag_file,
                                    filesystem=self.fs).to_pylist()
            data_ok = vfs.is_dir(self.fs,
                                 vfs.join(self.routed_root, f"shard={sid}"))
            intact = data_ok and all(
                (f := cur.get(m["path"])) is not None
                and f.num_rows == m["num_rows"]
                and f.size_bytes == m["size_bytes"]
                for m in members)
            if not intact:
                self._kill_shard(sid, [m["path"] for m in members])
                continue
            lin = {r["fragment"]: r for r in pq.read_table(
                vfs.join(lin_dir, "lineage.parquet"),
                filesystem=self.fs).to_pylist()}
            for m in members:
                if m["path"] not in completed:
                    rec = lin.get(m["path"], {})
                    self.store.mark_done(cur[m["path"]], extra={
                        "shard": sid, "rows_out": rec.get("rows"),
                        "checksum": rec.get("checksum")})

    def _process_shard(self, frags) -> dict:
        t0 = time.perf_counter()
        phases = {}
        paths = [f.path for f in frags]
        sid = _shard_id(frags)
        shard_dir = vfs.join(self.routed_root, f"shard={sid}")
        vfs.makedirs(self.fs, self.routed_root)
        vfs.makedirs(self.fs, self.lineage_root)

        if not vfs.exists(self.fs, shard_dir):
            tmp = vfs.join(self.routed_root, f".tmp-{sid}")
            ds = self.build_routed_dataset(paths)
            ds.write_parquet(tmp, partition_cols=["route"],
                             min_rows_per_file=self.min_rows_per_file,
                             filesystem=self.fs,
                             **self.WRITE_OPTS)
            atomic_publish_dir(tmp, shard_dir, self.fs)
        phases["write_s"] = round(time.perf_counter() - t0, 3)
        # lineage AND per-shard aggregates from the WRITTEN shard, in
        # one narrow read-back (exactly-once; also the recovery path
        # for a crash after data-rename, before markers). Storing the
        # shard's aggregates beside its lineage makes the final
        # aggregate an O(shards) metadata merge — no O(sink) re-read
        # per run, which is what keeps resume cheap at 100 TB.
        lin_dir = vfs.join(self.lineage_root, f"shard={sid}")
        if not vfs.exists(self.fs, lin_dir):
            # ONE distributed pass over the narrow columns: block-local
            # (fragment, route, source) partials, collected (tiny —
            # O(blocks × routes) rows) and combined on the driver. No
            # all-to-all shuffle, no second groupby execution per stat.
            import ray
            narrow = _read_routed(
                shard_dir, ["fragment", "route", "source", "n_tok", "row_ck"],
                filesystem=self.fs)
            partial_fn = _shard_partial
            if self._metrics_handle is not None:
                from ..state.metrics import timed_stage
                partial_fn = timed_stage("stats_partial", _shard_partial,
                                         self._metrics_handle)
            refs = narrow.map_batches(
                partial_fn, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
            part = pa.concat_tables(t for t in ray.get(refs) if len(t))
            stats = _combine_partials(part)
            tmp = vfs.join(self.lineage_root, f".tmp-{sid}")
            vfs.makedirs(self.fs, tmp)
            # stamp the checksum implementation version: stored
            # checksums are only comparable within the same version
            # (hashing.checksum_version) — a future resume with a
            # mismatched version must treat them as unverifiable
            from ..hashing import checksum_version
            stats["lineage"] = stats["lineage"].replace_schema_metadata(
                {"ck_ver": checksum_version()})
            for name in ("lineage", "route_counts", "source_hist"):
                pq.write_table(stats[name], vfs.join(tmp, f"{name}.parquet"),
                               filesystem=self.fs)
            # shard membership + extents: the durable record markers
            # are reconstructed from (ADR :22-24)
            pq.write_table(pa.table({
                "path": [f.path for f in frags],
                "num_rows": [f.num_rows for f in frags],
                "size_bytes": [f.size_bytes for f in frags],
            }), vfs.join(tmp, "fragments.parquet"), filesystem=self.fs)
            atomic_publish_dir(tmp, lin_dir, self.fs)
        phases["stats_s"] = round(time.perf_counter() - t0 - phases["write_s"], 3)
        lin_table = pq.read_table(vfs.join(lin_dir, "lineage.parquet"),
                                  filesystem=self.fs)
        # markers last (ADR write-ordering invariant)
        by_path = {r["fragment"]: r for r in lin_table.to_pylist()}
        for f in frags:
            rec = by_path.get(f.path, {})
            self.store.mark_done(f, extra={
                "shard": sid, "rows_out": rec.get("rows"),
                "checksum": rec.get("checksum")})
        t_end = time.perf_counter()
        wall = t_end - t0
        rows = int(sum(r["rows"] for r in by_path.values()))
        tokens = int(sum(r["n_tok_sum"] for r in by_path.values()))
        return {"shard": sid, "fragments": len(frags),
                "start_s": t0, "end_s": t_end,
                "rows": rows, "tokens": tokens, "wall_s": wall,
                "rows_per_s": round(rows / wall, 1) if wall else None,
                "tokens_per_s": round(tokens / wall, 1) if wall else None,
                **phases}

    # -- aggregates from the sink -------------------------------------
    def compute_aggregates(self) -> dict[str, pa.Table]:
        """Merge the per-shard aggregates (each computed exactly once
        from its written shard) — an O(shards) driver-side combine,
        independent of sink size; resumed runs fold in prior shards'
        records automatically."""
        import pandas as pd

        shard_dirs = [vfs.join(self.lineage_root, n)
                      for n in vfs.listdir(self.fs, self.lineage_root)
                      if n.startswith("shard=")]
        if not shard_dirs:
            empty = pa.table({"route": pa.array([], type=pa.string()),
                              "events": pa.array([], type=pa.int64()),
                              "n_tok_sum": pa.array([], type=pa.int64())})
            empty_h = pa.table({"route": pa.array([], type=pa.string()),
                                "source": pa.array([], type=pa.string()),
                                "events": pa.array([], type=pa.int64())})
            return {"route_counts": empty, "source_hist": empty_h}
        counts = pd.concat(
            [pq.read_table(vfs.join(d, "route_counts.parquet"),
                           filesystem=self.fs).to_pandas()
             for d in shard_dirs], ignore_index=True
        ).groupby("route", as_index=False).sum().sort_values("route",
                                                             ignore_index=True)
        hist = pd.concat(
            [pq.read_table(vfs.join(d, "source_hist.parquet"),
                           filesystem=self.fs).to_pandas()
             for d in shard_dirs], ignore_index=True
        ).groupby(["route", "source"], as_index=False).sum().sort_values(
            ["route", "source"], ignore_index=True)
        vfs.makedirs(self.fs, self.counts_dir)
        counts_t = pa.Table.from_pandas(counts, preserve_index=False)
        hist_t = pa.Table.from_pandas(hist, preserve_index=False)
        pq.write_table(counts_t, vfs.join(self.counts_dir, "route_counts.parquet"),
                       filesystem=self.fs)
        pq.write_table(hist_t, vfs.join(self.counts_dir, "source_hist.parquet"),
                       filesystem=self.fs)
        return {"route_counts": counts_t, "source_hist": hist_t}

    def run(self, *, aggregate: bool = True,
            max_shards: int | None = None,
            deadline_s: float | None = None,
            _clock=None) -> dict:
        """Process pending fragments shard by shard.

        ``max_shards`` / ``deadline_s`` are the bounded-work stop
        conditions — the batch analogue of the reference tailer's
        stop-future composition (read-until: byte-limit / timeout /
        external-signal, src/tailer/async_read.rs:8-72): the run stops
        CLEANLY at a shard boundary once the budget is spent, with
        markers consistent (each finished shard published data +
        lineage + markers already), so a later ``run()`` resumes
        exactly where this one stopped and final aggregates are
        byte-identical to an unbounded run. ``deadline_s`` is checked
        before each shard starts (each WAVE with shard_parallelism >
        1) — a shard in flight always completes (stopping mid-shard
        would just discard work; the shard is the checkpoint granule).
        ``_clock`` swaps the deadline clock for a deterministic one in
        tests; wall_s always reports real time."""
        clock = _clock if _clock is not None else time.perf_counter
        t0 = clock()
        t0_wall = time.perf_counter()
        clean_stale_tmp(self.routed_root, self.fs)
        clean_stale_tmp(self.lineage_root, self.fs)
        if self.stage_metrics and self._metrics_handle is None:
            from ..state.metrics import make_collector
            self._metrics_handle = make_collector()
        manifest = self._manifest()
        self._drop_removed(manifest)   # FileRemoved: must run even when
        pending = self.store.pending(manifest)  # nothing looks pending
        if pending:
            # remaining recovery paths only engage when something looks
            # pending: with intact markers this block is skipped, so the
            # happy-path resume never scans O(shards) lineage dirs
            self._recover_markers(manifest)
            pending = self.store.pending(manifest)
            self._invalidate_rotated(pending)
            pending = self.store.pending(manifest)  # re-plan post-recovery
        shards = self._shards(pending)
        stopped_early = False
        if max_shards is not None and len(shards) > max_shards:
            shards = shards[:max_shards]
            stopped_early = True

        def _deadline_hit() -> bool:
            return (deadline_s is not None
                    and clock() - t0 >= deadline_s)

        if self.shard_parallelism > 1 and len(shards) > 1:
            # bounded-concurrency scheduler: each worker thread owns one
            # streaming Dataset execution; shard outputs are disjoint
            # (distinct shard dirs, distinct fragment markers) so no
            # cross-shard synchronization is needed
            from concurrent.futures import ThreadPoolExecutor

            _stub_fsspec_http()
            shard_stats = []
            with ThreadPoolExecutor(
                    max_workers=self.shard_parallelism) as pool:
                if deadline_s is None:
                    shard_stats = list(pool.map(self._process_shard,
                                                shards))
                else:
                    # deadline-checked waves of shard_parallelism
                    i = 0
                    while i < len(shards):
                        if _deadline_hit():
                            stopped_early = True
                            break
                        chunk = shards[i:i + self.shard_parallelism]
                        shard_stats.extend(
                            pool.map(self._process_shard, chunk))
                        i += len(chunk)
        else:
            shard_stats = []
            for s in shards:
                if _deadline_hit():
                    stopped_early = True
                    break
                shard_stats.append(self._process_shard(s))
        result = {
            "pending_fragments": len(pending),
            "shards": shard_stats,
            "stopped_early": stopped_early,
            "remaining_fragments": len(pending) - sum(
                s["fragments"] for s in shard_stats),
            "rows": sum(s["rows"] for s in shard_stats),
            "tokens": sum(s["tokens"] for s in shard_stats),
        }
        if aggregate:
            aggs = self.compute_aggregates()
            result["route_counts"] = aggs["route_counts"]
            result["source_hist"] = aggs["source_hist"]
        result["wall_s"] = time.perf_counter() - t0_wall
        if self._metrics_handle is not None:
            # T12 self-metrics: per-stage rows/s + batch-wall p50/p99
            # (the reference's prometheus/hdrhistogram role) and a host
            # snapshot, drained once per run
            import ray

            from ..state.metrics import drain_summary, host_snapshot
            result["stages"] = drain_summary(self._metrics_handle)
            result["host"] = host_snapshot()
            ray.kill(self._metrics_handle)
            self._metrics_handle = None
        vfs.write_text(self.fs, vfs.join(self.out_dir, "metrics.json"),
                       json.dumps({k: v for k, v in result.items()
                                   if k not in ("route_counts",
                                                "source_hist")},
                                  default=str))
        return result


def run_flagship(input_path, lookup, out_dir: str, **kw) -> dict:
    return FlagshipPipeline(input_path, lookup, out_dir, **kw).run()


def run_follow(input_path, lookup, out_dir: str, *, rescans: int = 0,
               interval_s: float = 5.0, before_rescan=None,
               **kw) -> list[dict]:
    """Follow mode: the reference watcher's periodic discovery rescan
    (5 s tokio interval, components/core-agent/src/watcher/
    watcher.rs:124) as a batch loop. Each cycle re-lists the input and
    processes ONLY fragments whose checkpoint markers are absent or
    stale — new files, rotations — appending to the same sinks;
    ``run()`` is idempotent, so an idle cycle is a cheap no-op
    (manifest stat + marker check, no data read).

    ``rescans`` bounds the number of follow cycles after the initial
    run; ``interval_s`` sleeps between them. ``before_rescan(i)`` (an
    ops/test hook) runs before cycle ``i``; returning False stops the
    loop early. Returns the per-cycle result dicts.

    Each cycle constructs a fresh pipeline: ``FlagshipPipeline``
    expands its input listing once at construction (deliberately — a
    run plans against a stable manifest), so the re-construction IS
    the rescan."""
    results = [FlagshipPipeline(input_path, lookup, out_dir,
                                **kw).run()]
    for i in range(rescans):
        if before_rescan is not None and before_rescan(i) is False:
            break
        if interval_s > 0:
            time.sleep(interval_s)
        results.append(FlagshipPipeline(input_path, lookup, out_dir,
                                        **kw).run())
    return results
