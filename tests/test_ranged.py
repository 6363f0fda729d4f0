"""Range-partitioned persisted layout (state.ranged): equi-depth
bounds, zone-map pruning, scan exactness, crash-publish order."""

import os

import numpy as np
import pyarrow as pa

import ray.data as rd
from ves_ray.state.ranged import (choose_bounds, range_scan,
                                  read_manifest, select_partitions,
                                  write_range_partitioned)


def _table(n=20000, seed=3, hi=10000):
    rng = np.random.default_rng(seed)
    return pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                     "v": pa.array(rng.integers(0, hi, n)
                                   .astype(np.int64))})


def test_range_scan_matches_filter_and_prunes(tmp_path):
    t = _table()
    path = str(tmp_path / "lay")
    man = write_range_partitioned(rd.from_arrow(t).repartition(8),
                                  path, value_col="v",
                                  num_partitions=16)
    assert len(man["bounds"]) == 15
    assert list(man["bounds"]) == sorted(man["bounds"])

    lo, hi = 2500, 3000
    sel = select_partitions(man, lo, hi)
    assert 1 <= len(sel) <= 3          # narrow band → few partitions
    got = range_scan(path, lo, hi).to_pandas()
    want = t.to_pandas().query("@lo <= v <= @hi")
    assert sorted(got["id"]) == sorted(want["id"])

    # full-domain scan returns everything
    assert range_scan(path, 0, 10**9).count() == len(t)
    # band outside the domain: no partitions, empty typed result
    assert select_partitions(man, -100, -1) == []
    assert range_scan(path, -100, -1).count() == 0


def test_equi_depth_bounds_balance_partitions(tmp_path):
    t = _table(n=40000, seed=9)
    ds = rd.from_arrow(t).repartition(8)
    bounds = choose_bounds(ds, "v", 8)
    part = np.searchsorted(np.asarray(bounds, dtype=np.int64),
                           t["v"].to_numpy(), side="right")
    counts = np.bincount(part, minlength=8)
    assert counts.min() > 0.5 * counts.max()   # equi-depth, roughly


def test_manifest_last_publish_and_zone_maps(tmp_path):
    t = _table(n=5000, seed=1)
    path = str(tmp_path / "lay")
    man = write_range_partitioned(rd.from_arrow(t), path,
                                  value_col="v", num_partitions=4)
    # zone maps never lie: every partition's data sits inside its zone
    import pyarrow.parquet as pq
    for k, (zlo, zhi) in man["zones"].items():
        sub = pq.read_table(os.path.join(path, f"range_part={k}"),
                            columns=["v"])
        vs = sub["v"].to_numpy()
        assert vs.min() >= zlo and vs.max() <= zhi
    # unpublished dir (no manifest) is refused
    os.remove(os.path.join(path, "_ranged.json"))
    try:
        read_manifest(path)
        raise AssertionError("manifest-less layout must be refused")
    except FileNotFoundError:
        pass


def test_rebuild_over_crashed_partial_has_no_duplicates(tmp_path):
    """A prior build that crashed after writing data files but before
    the manifest must NOT leak its partials into a rebuild: the writer
    builds into a fresh temp dir and atomically renames into place
    (ADVICE r3 — the old in-place write appended uniquely-named files
    alongside the stale ones and the zone-map harvest swept them all,
    duplicating every scan)."""
    t = _table(n=5000)
    path = str(tmp_path / "lay")
    # simulate the crashed build: data landed, manifest never written
    write_range_partitioned(rd.from_arrow(t).repartition(4), path,
                            value_col="v", num_partitions=8)
    os.remove(os.path.join(path, "_ranged.json"))
    # rebuild (what a reader does after FileNotFoundError)
    write_range_partitioned(rd.from_arrow(t).repartition(4), path,
                            value_col="v", num_partitions=8)
    got = range_scan(path, 0, 10**9).to_pandas()
    assert len(got) == len(t)                      # no duplicates
    assert sorted(got["id"]) == sorted(range(len(t)))
    # no stray build/old dirs left behind in the parent
    leftovers = [d for d in os.listdir(tmp_path)
                 if d.startswith((".tmp-", ".old-"))]
    assert leftovers == []


def test_rebuild_replaces_published_layout_atomically(tmp_path):
    """Re-running write_range_partitioned over a PUBLISHED layout
    swaps it whole — never merges old and new data files."""
    path = str(tmp_path / "lay")
    write_range_partitioned(rd.from_arrow(_table(n=3000)), path,
                            value_col="v", num_partitions=4)
    t2 = _table(n=1000, seed=9)
    write_range_partitioned(rd.from_arrow(t2), path,
                            value_col="v", num_partitions=4)
    got = range_scan(path, 0, 10**9).to_pandas()
    assert len(got) == len(t2)
    assert sorted(got["id"]) == sorted(range(len(t2)))
