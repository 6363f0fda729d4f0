"""Sequence packing (stages.packing)."""

import numpy as np
import pyarrow as pa

import ray.data as rd
from ves_ray.stages.packing import pack_sequences


def _seq_table(lens, start_tok=0):
    toks, t = [], start_tok
    for ln in lens:
        toks.append(list(range(t, t + ln)))
        t += ln
    return pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(lens))]),
        "tokens": pa.array(toks, type=pa.list_(pa.int32())),
    })


def test_concat_mode_cuts_and_conserves():
    t = _seq_table([30, 25, 10, 40, 7])   # 112 tokens
    out = (pack_sequences(rd.from_arrow(t), max_len=32, mode="concat",
                          emit_tokens=True)
           .to_pandas().sort_values("pack_id", ignore_index=True))
    assert len(out) == 4                   # ceil(112/32)
    assert out["n_tok"].tolist() == [32, 32, 32, 16]
    # packed stream is the identity concatenation
    got = np.concatenate(out["tokens"].to_list())
    assert got.tolist() == list(range(112))
    # pack 0 covers docs 0,1 (doc1 spans the boundary)
    assert out["n_docs"].iloc[0] == 2


def test_concat_drop_tail():
    t = _seq_table([30, 25, 10, 40, 7])
    out = pack_sequences(rd.from_arrow(t), max_len=32, mode="concat",
                         drop_tail=True).to_pandas()
    assert out["n_tok"].tolist() == [32, 32, 32]


def test_first_fit_never_splits_and_respects_capacity():
    lens = [30, 25, 10, 40, 7, 31, 2, 2]
    t = _seq_table(lens)
    out = (pack_sequences(rd.from_arrow(t), max_len=32, mode="first_fit",
                          emit_tokens=True).to_pandas())
    assert (out["n_tok"] <= 32).all()
    assert out["n_tok"].sum() == sum(lens) + 0  # doc of 40 chunked
    # every token appears exactly once
    got = np.sort(np.concatenate(out["tokens"].to_list()))
    assert got.tolist() == list(range(sum(lens)))
    # FFD guarantee: at most one bin under half capacity
    assert int((out["n_tok"] < 16).sum()) <= 1
    # chunk accounting: 9 chunks (doc3 splits into 32+8)
    assert out["n_docs"].sum() == len(lens) + 1


def test_oversized_doc_chunked_in_first_fit():
    t = _seq_table([100])
    out = pack_sequences(rd.from_arrow(t), max_len=32,
                         mode="first_fit").to_pandas()
    assert out["n_tok"].sum() == 100
    assert (out["n_tok"] <= 32).all()


def test_empty_input_and_stable_schema():
    t = _seq_table([])
    out = pack_sequences(rd.from_arrow(t), max_len=32)
    assert out.count() == 0
    schema = out.schema()
    assert schema is None or schema.names == ["pack_id", "n_docs", "n_tok"]
