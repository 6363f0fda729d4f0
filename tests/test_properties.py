"""Property-based tests (hypothesis) for the operators whose
correctness is a law, not an example: join vs pandas merge, packing
conservation, dedup cluster resolution vs naive union-find, hashing
determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

import ray.data as rd

SLOW = settings(max_examples=8, deadline=None)


@st.composite
def join_inputs(draw):
    nl = draw(st.integers(1, 60))
    nr = draw(st.integers(1, 60))
    key_hi = draw(st.integers(2, 20))
    lk = draw(st.lists(st.integers(0, key_hi), min_size=nl, max_size=nl))
    rk = draw(st.lists(st.integers(0, key_hi), min_size=nr, max_size=nr))
    return lk, rk


@SLOW
@given(join_inputs())
def test_hash_join_is_pandas_merge(inp):
    from ves_ray.stages.relational import hash_join
    lk, rk = inp
    left = pa.table({"k": pa.array(lk, type=pa.int64()),
                     "lv": pa.array(range(len(lk)), type=pa.int64())})
    right = pa.table({"k": pa.array(rk, type=pa.int64()),
                      "rv": pa.array(range(len(rk)), type=pa.int64())})
    got = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                    key_col="k", left_cols=["lv"], right_cols=["rv"],
                    num_buckets=4).to_pandas()
    exp = pd.merge(left.to_pandas(), right.to_pandas(), on="k")
    cols = ["k", "lv", "rv"]
    if len(exp) == 0:            # disjoint keys: Ray's to_pandas on a
        assert len(got) == 0     # zero-row result drops columns (same
        return                   # quirk the packing test documents)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols, ignore_index=True),
        exp[cols].sort_values(cols, ignore_index=True),
        check_dtype=False)


@SLOW
@given(st.lists(st.integers(0, 70), min_size=1, max_size=40),
       st.integers(4, 32))
def test_packing_conserves_tokens(lens, max_len):
    from ves_ray.stages.packing import pack_sequences
    toks, t = [], 0
    for ln in lens:
        toks.append(list(range(t, t + ln)))
        t += ln
    tbl = pa.table({"doc_id": pa.array([f"d{i}" for i in range(len(lens))]),
                    "tokens": pa.array(toks, type=pa.list_(pa.int32()))})
    for mode in ("concat", "first_fit"):
        out = pack_sequences(rd.from_arrow(tbl), max_len=max_len,
                             mode=mode, emit_tokens=True).to_pandas()
        if len(out) == 0:        # all docs empty → no packs (and
            assert sum(lens) == 0  # empty to_pandas drops columns)
            continue
        assert (out["n_tok"] <= max_len).all()
        got = np.sort(np.concatenate(out["tokens"].to_list())
                      if len(out) else np.array([], dtype=np.int64))
        assert got.tolist() == list(range(sum(lens)))


@st.composite
def pair_sets(draw):
    n = draw(st.integers(2, 30))
    pairs = draw(st.lists(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
        max_size=40))
    return n, [(a, b) for a, b in pairs if a != b]


def _naive_components(n, pairs):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


@SLOW
@given(pair_sets())
def test_fuzzy_dedup_keep_is_union_find(inp):
    from ves_ray.stages.dedup import fuzzy_dedup_keep
    n, pairs = inp
    ids = rd.from_arrow(pa.table({"doc_id": pa.array(range(n),
                                                     type=pa.int64())}))
    pdf = pd.DataFrame(pairs, columns=["doc_a", "doc_b"]) \
        if pairs else pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                    "doc_b": pd.Series([], dtype="int64")})
    kept = fuzzy_dedup_keep(ids, pdf).to_pandas()
    roots = _naive_components(n, pairs)
    expect = sorted({r for r in roots.values()})
    assert sorted(kept["doc_id"].tolist()) == expect


@given(st.lists(st.text(max_size=20), min_size=1, max_size=50))
@settings(max_examples=20, deadline=None)
def test_hash_strings_deterministic_and_seeded(strs):
    from ves_ray.hashing import hash_strings
    a = hash_strings(strs, seed=1)
    b = hash_strings(strs, seed=1)
    c = hash_strings(strs, seed=2)
    assert (a == b).all()
    if len(set(strs)) > 3:
        assert (a != c).any()
