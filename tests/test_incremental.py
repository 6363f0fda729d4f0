"""Incremental dedup against a persisted seen-hash index
(stages.incremental): novelty exactness, idempotent re-probe after
append, within-shard winner determinism."""

import pyarrow as pa

import ray.data as rd
from ves_ray.stages.incremental import (append_to_index,
                                        build_seen_index, probe_novel)


def _docs(rows):
    ids, texts = zip(*rows)
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts)})


def test_probe_returns_only_novel_min_id(tmp_path):
    idx = str(tmp_path / "idx")
    corpus = _docs([(0, "alpha beta"), (2, "gamma delta"),
                    (4, "alpha beta")])          # internal dup in corpus
    build_seen_index(rd.from_arrow(corpus), idx, num_buckets=8)

    shard = _docs([(1, "alpha beta"),            # seen → dropped
                   (3, "epsilon zeta"),          # novel
                   (5, "epsilon zeta"),          # within-shard dup → min id
                   (7, "eta theta")])            # novel
    got = probe_novel(rd.from_arrow(shard), idx).to_pandas()
    assert sorted(got["doc_id"]) == [3, 7]
    assert set(got.columns) == {"doc_id", "text"}


def test_append_makes_reprobe_empty_and_is_shard_scoped(tmp_path):
    idx = str(tmp_path / "idx")
    build_seen_index(rd.from_arrow(_docs([(0, "seen one")])), idx,
                     num_buckets=8)
    shard = _docs([(1, "new one"), (2, "new two"), (3, "seen one")])
    novel = probe_novel(rd.from_arrow(shard), idx).to_pandas()
    assert sorted(novel["doc_id"]) == [1, 2]

    n = append_to_index(rd.from_arrow(_docs(
        list(zip(novel["doc_id"], novel["text"])))), idx)
    assert n == 2
    # idempotence: the same shard now yields nothing novel
    again = probe_novel(rd.from_arrow(shard), idx).to_pandas()
    assert len(again) == 0
    # an unrelated later shard still probes correctly
    nxt = probe_novel(rd.from_arrow(_docs([(9, "new three"),
                                           (10, "new one")])),
                      idx).to_pandas()
    assert sorted(nxt["doc_id"]) == [9]


def test_wrong_index_kind_is_refused(tmp_path):
    from ves_ray.state.bucketed import write_bucketed
    lay = str(tmp_path / "lay")
    write_bucketed(rd.from_arrow(_docs([(0, "x")])), lay,
                   key_col="doc_id", num_buckets=4)
    try:
        probe_novel(rd.from_arrow(_docs([(1, "y")])), lay)
        raise AssertionError("non-hash index must be refused")
    except ValueError:
        pass


def test_index_appends_compact_and_still_probe(tmp_path):
    """Long-run maintenance: repeated appends fragment the index's
    bucket dirs; state.compact folds them (the _bucketed.json manifest
    survives — compaction only touches leaf parquet dirs) and probing
    is unchanged after."""
    import os
    from ves_ray.state.compact import compact_partitions

    idx = str(tmp_path / "idx")
    build_seen_index(rd.from_arrow(_docs([(0, "base doc")])), idx,
                     num_buckets=4)
    for i in range(1, 6):        # five appends -> many small files
        append_to_index(rd.from_arrow(_docs([(i, f"doc number {i}")])),
                        idx)
    files_before = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(idx))
    stats = compact_partitions(idx, min_files=2, min_rows_per_file=10)
    assert stats["files_after"] < files_before
    assert os.path.exists(os.path.join(idx, "_bucketed.json"))
    # everything indexed so far is still seen; a fresh doc is novel
    shard = _docs([(20, "doc number 3"), (21, "base doc"),
                   (22, "genuinely new")])
    got = probe_novel(rd.from_arrow(shard), idx).to_pandas()
    assert sorted(got["doc_id"]) == [22]
