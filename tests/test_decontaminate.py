"""Decontamination (stages.decontaminate): n-gram collision flagging
against a broadcast eval shingle set."""

import numpy as np
import pyarrow as pa

import ray.data as rd
from ves_ray.stages.decontaminate import (drop_contaminated,
                                          eval_shingle_hashes,
                                          flag_contaminated)

EVAL = ["the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs"]
TRAIN = [
    # 0: contains the eval 5-gram "quick brown fox jumps over"
    "he saw a quick brown fox jumps over a fence today",
    # 1: clean — shares words but no 5-gram run
    "the quick dog and the lazy fox are friends forever",
    # 2: contains two distinct colliding 5-grams (a 6-word run)
    "again the quick brown fox jumps over the wall",
    # 3: short doc, no 5-grams at all
    "tiny doc",
]


def _ds(texts, start=0):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(start, start + len(texts)),
                           type=pa.int64()),
        "text": pa.array(texts)}))


def test_flag_contaminated_counts_distinct_collisions():
    ev = eval_shingle_hashes(_ds(EVAL, start=100), n=5)
    got = flag_contaminated(_ds(TRAIN), ev, n=5).to_pandas()
    got = got.set_index("doc_id")["n_hits"].to_dict()
    # doc 0: one colliding 5-gram; doc 2: "the quick brown fox jumps"
    # "quick brown fox jumps over", "brown fox jumps over the" → 3
    assert got == {0: 1, 2: 3}


def test_drop_contaminated_keeps_clean_docs():
    ev = eval_shingle_hashes(_ds(EVAL, start=100), n=5)
    kept = drop_contaminated(_ds(TRAIN), ev, n=5).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3]


def test_empty_eval_set_flags_nothing():
    ev = eval_shingle_hashes(_ds(["a b"]), n=5)  # too short: no grams
    assert len(ev) == 0
    assert flag_contaminated(_ds(TRAIN), ev, n=5).count() == 0
    assert drop_contaminated(_ds(TRAIN), ev, n=5).count() == len(TRAIN)


def test_eval_hashes_sorted_unique():
    ev = eval_shingle_hashes(_ds(EVAL + EVAL), n=5)
    assert np.all(np.diff(ev.astype(np.uint64)) > 0)


def test_contamination_report_fractions():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ves_ray.stages.decontaminate import (contamination_report,
                                              eval_shingle_hashes)
    ev = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                   "text": pa.array(["a b c d e f"])})  # 2 five-grams
    tr = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "a b c d e x y z",      # shares 'a b c d e': 1 of 4
            "p q r s t u",          # no overlap: 0 of 2
            "short one"])})         # < 5 words: no shingles, dropped
    hashes = eval_shingle_hashes(rd.from_arrow(ev), n=5)
    out = (contamination_report(rd.from_arrow(tr), hashes, n=5)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    got = {int(r["doc_id"]): (int(r["n_shingles"]), int(r["n_hits"]),
                              int(r["hit_pct_e6"]))
           for _, r in out.iterrows()}
    assert got == {1: (4, 1, 250000), 2: (2, 0, 0)}
    assert 3 not in got
