import pyarrow as pa

from ves_ray.stages.textstats import (fingerprint_batch, lang_id_batch,
                                      quality_batch, token_count_batch)


def _t(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_counts():
    out = token_count_batch(_t(["one two three", "a,b c!", ""]))
    assert out["n_words"].to_pylist() == [3, 2, 1]
    # "a,b c!" → a , b c !  = 5 BPE-ish pieces
    assert out["n_tok_bpe"].to_pylist() == [3, 5, 0]


def test_quality_components():
    out = quality_batch(_t(["the cat and the hat!", "xxxxx"]))
    assert out["n_words"].to_pylist() == [5, 1]
    assert out["n_chars_calc"].to_pylist() == [20, 5]
    assert out["stop_count"].to_pylist() == [3, 0]   # the, and, the
    assert out["punct_count"].to_pylist() == [1, 0]
    q = out["quality"].to_pylist()
    assert 0 <= q[1] < q[0] <= 1


def test_lang_id_heuristic():
    out = lang_id_batch(_t([
        "the cat is on the mat and it was a good day for they",
        "la casa de los niños es una de las mejores que se ven por el pueblo",
        "der Hund und die Katze sind in dem Haus mit den Kindern",
        "这 是 一个 中文 测试 文本 的 例子",
    ]))
    assert out["lang_pred"].to_pylist() == ["en", "es", "de", "zh"]


def test_fingerprint_order_sensitive():
    out = fingerprint_batch(_t(["alpha beta gamma", "beta alpha gamma",
                                "alpha beta gamma", "", ""]))
    fp = out["fingerprint"].to_pylist()
    assert fp[0] == fp[2]
    assert fp[0] != fp[1]
    assert fp[3] == fp[4]  # empty docs fingerprint consistently


def test_sliced_batch_consistency():
    t = _t(["aa bb", "cc dd ee", "the and of", "x"])
    whole = quality_batch(t)
    part = quality_batch(t.slice(2, 2))
    assert whole["stop_count"].to_pylist()[2:] == part["stop_count"].to_pylist()
