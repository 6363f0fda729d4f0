"""Sink compaction (state.compact)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ves_ray.state.compact import (cleanup_stale, compact_partitions)


def _make_fragmented_sink(root):
    # two partitions, each with 5 tiny files; one partition with 1 file
    n = 0
    for part, files in [("route=a", 5), ("route=b", 5), ("route=c", 1)]:
        d = os.path.join(root, part)
        os.makedirs(d)
        for i in range(files):
            t = pa.table({"doc_id": pa.array(range(n, n + 10),
                                             type=pa.int64()),
                          "v": pa.array([part] * 10)})
            pq.write_table(t, os.path.join(d, f"f{i}.parquet"))
            n += 10
    return n


def test_compact_merges_files_preserves_rows(tmp_path):
    root = str(tmp_path / "sink")
    total = _make_fragmented_sink(root)
    import duckdb
    before = duckdb.sql(
        f"SELECT COUNT(*) n, COUNT(DISTINCT doc_id) d FROM "
        f"read_parquet('{root}/*/*.parquet')").df()
    stats = compact_partitions(root, min_files=2,
                               min_rows_per_file=1000)
    assert stats["partitions"] == 2          # route=c left alone
    assert stats["files_before"] == 10
    after = duckdb.sql(
        f"SELECT COUNT(*) n, COUNT(DISTINCT doc_id) d FROM "
        f"read_parquet('{root}/*/*.parquet')").df()
    assert int(after["n"][0]) == int(before["n"][0]) == total
    assert int(after["d"][0]) == total       # no dup, no loss
    a_files = [f for f in os.listdir(os.path.join(root, "route=a"))
               if f.endswith(".parquet")]
    assert len(a_files) == 1                 # 5 → 1


def test_cleanup_stale_removes_leftovers(tmp_path):
    root = str(tmp_path / "sink")
    _make_fragmented_sink(root)
    os.makedirs(os.path.join(root, ".tmp-xyz-route=a"))
    os.makedirs(os.path.join(root, ".old-xyz-route=b"))
    assert cleanup_stale(root) == 2
    assert not any(d.startswith((".tmp-", ".old-"))
                   for d in os.listdir(root))


def test_cleanup_stale_restores_orphaned_old(tmp_path):
    # crash between compact's two renames: partition exists ONLY as
    # .old-<tag>-<base> (+ the fully-written .tmp). cleanup must
    # restore the .old dir, not delete the partition's sole copy.
    root = str(tmp_path / "sink")
    _make_fragmented_sink(root)
    import shutil
    shutil.move(os.path.join(root, "route=a"),
                os.path.join(root, ".old-deadbeef-route=a"))
    os.makedirs(os.path.join(root, ".tmp-deadbeef-route=a"))
    assert cleanup_stale(root) == 2
    files = [f for f in os.listdir(os.path.join(root, "route=a"))
             if f.endswith(".parquet")]
    assert len(files) == 5                   # data restored intact
    assert not any(d.startswith((".tmp-", ".old-"))
                   for d in os.listdir(root))
    # idempotent: a second cleanup (fresh interrupted swap where the
    # final dir DOES exist) deletes the .old copy as before
    os.makedirs(os.path.join(root, ".old-cafe0000-route=a"))
    assert cleanup_stale(root) == 1
    assert os.path.isdir(os.path.join(root, "route=a"))


def test_compact_skips_metadata_dirs(tmp_path):
    # pointed at a flagship out_dir, compaction must not touch the
    # lineage/_checkpoint subtrees (load-bearing filenames,
    # heterogeneous schemas)
    root = str(tmp_path / "out")
    _make_fragmented_sink(os.path.join(root, "routed"))
    lin = os.path.join(root, "lineage", "shard=0")
    os.makedirs(lin)
    for name in ("lineage", "route_counts"):
        pq.write_table(pa.table({name: [1]}),
                       os.path.join(lin, f"{name}.parquet"))
    ck = os.path.join(root, "_checkpoint")
    os.makedirs(ck)
    pq.write_table(pa.table({"m": [1]}), os.path.join(ck, "a.parquet"))
    pq.write_table(pa.table({"m": [2]}), os.path.join(ck, "b.parquet"))
    stats = compact_partitions(root, min_files=2,
                               min_rows_per_file=1000)
    assert stats["partitions"] == 2          # only routed/route=[ab]
    assert sorted(os.listdir(lin)) == ["lineage.parquet",
                                       "route_counts.parquet"]
    assert sorted(os.listdir(ck)) == ["a.parquet", "b.parquet"]
