"""Substring-level (token-span) dedup: stages/spans.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ves_ray.stages.spans import dup_spans, remove_duplicate_spans


def _corpus(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string())}))


SPAN = "a b c d"          # k=4 duplicated span
DOCS = [
    (1, f"x y {SPAN} z w q"),          # first occurrence (pos 3)
    (2, f"p {SPAN} r s t"),            # duplicate (removed)
    (3, "unrelated words only here now"),
    (4, f"{SPAN} {SPAN} tail tail2"),  # two in-doc occurrences (removed)
    (5, "tiny"),                        # shorter than k
]


def test_dup_spans_report():
    rep = dup_spans(_corpus(DOCS), k=4)
    row = rep[rep["gram"] == SPAN]
    assert len(row) == 1
    r = row.iloc[0]
    assert (r["n_docs"], r["occurrences"]) == (3, 4)
    assert (r["first_doc"], r["first_pos"]) == (1, 3)
    # every reported gram really occurs >= 2 times
    assert (rep["occurrences"] >= 2).all()


def test_remove_duplicate_spans_keeps_first_only():
    out = (remove_duplicate_spans(_corpus(DOCS), k=4).to_pandas()
           .set_index("doc_id").sort_index())
    assert SPAN in out.loc[1, "text_dedup"]          # first kept
    assert SPAN not in out.loc[2, "text_dedup"]
    assert out.loc[2, "text_dedup"] == "p r s t"
    # doc 4: both occurrences (and every overlapping window they form)
    # are non-first, so all eight span words go
    assert out.loc[4, "text_dedup"] == "tail tail2"
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[5, "text_dedup"] == "tiny"
    # conservation: kept words + removed = original words
    orig = {d: len(t.split()) for d, t in DOCS}
    for d, row in out.iterrows():
        kept = len(row["text_dedup"].split()) if row["text_dedup"] else 0
        assert kept + row["n_removed"] == orig[d]


def test_overlapping_removals_merge():
    # two duplicated spans overlapping in the victim doc: coverage is
    # a union of intervals, not double-counted
    docs = [
        (1, "a b c d e TAIL1 x"),
        (2, "b c d e f TAIL2 y"),
        (3, "a b c d e f z"),   # covers both spans, overlapping
    ]
    out = (remove_duplicate_spans(_corpus(docs), k=5).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[3, "text_dedup"] == "z"
    assert out.loc[3, "n_removed"] == 6
    assert out.loc[1, "n_removed"] == 0 and out.loc[2, "n_removed"] == 0


def test_no_duplicates_normalizes_only():
    docs = [(1, "Alpha   Beta\tGamma"), (2, "delta epsilon")]
    out = (remove_duplicate_spans(_corpus(docs), k=3).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1, "text_dedup"] == "alpha beta gamma"
    assert out["n_removed"].sum() == 0
    rep = dup_spans(_corpus(docs), k=3)
    assert len(rep) == 0


def test_matches_duckdb_oracle(sf_dir):
    import duckdb

    from ves_ray.pipelines.queries import (SQL_SUBSTRING_DEDUP,
                                           q_substring_dedup)
    got = q_substring_dedup(sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    ref = con.sql(SQL_SUBSTRING_DEDUP).df()
    ref["n_removed"] = ref["n_removed"].astype("int64")
    got = got.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "text_dedup", "n_removed"]], ref)
    assert got["n_removed"].sum() > 0   # testdata has real dup spans
