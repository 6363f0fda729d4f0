"""Invariants for the rows-only catalog entries must (a) pass on the
real query outputs and (b) actually TRIP on corrupted outputs — an
invariant that can't fail verifies nothing."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_wrapped_queries_pass_with_invariants_on(monkeypatch):
    monkeypatch.delenv("VES_CHECK_INVARIANTS", raising=False)
    from ves_ray.pipelines.queries import QUERIES
    # cheap representatives of each invariant family
    for name in ("pack_sequences", "lang_id", "users_approx_distinct"):
        QUERIES[name](SF)          # raises AssertionError on violation


def test_invariant_registry_covers_all_no_oracle_entries():
    from ves_ray.pipelines.invariants import INVARIANT_CHECKS, INVARIANTS
    from ves_ray.pipelines.queries import ORACLE_SQL, QUERIES
    no_oracle = set(QUERIES) - set(ORACLE_SQL)
    assert no_oracle == set(INVARIANTS) == set(INVARIANT_CHECKS)


def test_pack_conservation_trips():
    from ves_ray.pipelines.invariants import check_pack_sequences
    from ves_ray.pipelines.queries import QUERIES
    import os
    os.environ["VES_CHECK_INVARIANTS"] = "0"
    try:
        out = QUERIES["pack_sequences"](SF).to_pandas()
    finally:
        os.environ.pop("VES_CHECK_INVARIANTS")
    check_pack_sequences(out, SF)                 # genuine output passes
    bad = out.copy()
    bad.loc[0, "n_tok"] = bad.loc[0, "n_tok"] - 1  # lose one token
    with pytest.raises(AssertionError, match="conservation"):
        check_pack_sequences(bad, SF)


def test_hll_bound_trips():
    from ves_ray.pipelines.invariants import check_users_approx_distinct
    from ves_ray.pipelines.queries import QUERIES
    import os
    os.environ["VES_CHECK_INVARIANTS"] = "0"
    try:
        out = QUERIES["users_approx_distinct"](SF)
    finally:
        os.environ.pop("VES_CHECK_INVARIANTS")
    check_users_approx_distinct(out, SF)
    bad = out.copy()
    bad["approx_distinct"] = (bad["approx_distinct"] * 2).astype("int64")
    with pytest.raises(AssertionError, match="HLL bound"):
        check_users_approx_distinct(bad, SF)


def test_ann_score_exactness_and_recall_trip():
    from ves_ray.pipelines.invariants import check_ann_ivf_topk
    from ves_ray.pipelines.queries import QUERIES
    import os
    os.environ["VES_CHECK_INVARIANTS"] = "0"
    try:
        out = QUERIES["ann_ivf_topk"](SF)
    finally:
        os.environ.pop("VES_CHECK_INVARIANTS")
    check_ann_ivf_topk(out, SF)
    # a fabricated score must be caught by the exact re-derivation
    bad = out.copy()
    bad.loc[0, "cos_sim"] = float(bad.loc[0, "cos_sim"]) + 0.01
    with pytest.raises(AssertionError,
                       match="exact|descending"):
        check_ann_ivf_topk(bad, SF)
    # shuffled ids (random results) must fall below the recall floor
    rng = np.random.default_rng(3)
    worse = out.copy()
    worse["vec_id"] = rng.integers(100, 400, len(worse))
    with pytest.raises(AssertionError):
        check_ann_ivf_topk(worse, SF)


def test_identical_text_completeness_trips():
    from ves_ray.pipelines.invariants import check_minhash_pairs
    from ves_ray.pipelines.queries import QUERIES
    import os
    os.environ["VES_CHECK_INVARIANTS"] = "0"
    try:
        out = QUERIES["minhash_pairs"](SF)
    finally:
        os.environ.pop("VES_CHECK_INVARIANTS")
    assert len(out) > 0
    check_minhash_pairs(out, SF)
    # testdata has no identical texts below sf0.1, so force a fake
    # identical group: the completeness branch must demand its pair
    from ves_ray.pipelines import invariants as inv
    orig = inv._identical_text_groups
    inv._identical_text_groups = lambda sf: [[1, 2]]
    try:
        missing = out[~((out["doc_a"] == 1) & (out["doc_b"] == 2))]
        with pytest.raises(AssertionError, match="identical-text"):
            check_minhash_pairs(missing.reset_index(drop=True), SF)
    finally:
        inv._identical_text_groups = orig


def test_identical_text_groups_found_at_sf01():
    """The group finder actually finds the real duplicate groups at
    sf0.1 (DuckDB-verified: 8 groups exist there) — so the minhash /
    simhash / dedup completeness invariants are non-vacuous at the
    scale the stress sweeps run."""
    import duckdb
    from ves_ray.pipelines.invariants import _identical_text_groups
    groups = _identical_text_groups("/root/testdata/sf0.1")
    n_dup = duckdb.sql(
        "select count(*) from (select text from read_parquet("
        "'/root/testdata/sf0.1/documents.parquet') "
        "group by text having count(*)>1)").fetchone()[0]
    assert len(groups) == n_dup > 0
    assert all(len(g) >= 2 for g in groups)


def test_media_reconciliation_trips():
    from ves_ray.pipelines.invariants import check_media_stats
    from ves_ray.pipelines.queries import QUERIES
    import os
    os.environ["VES_CHECK_INVARIANTS"] = "0"
    try:
        out = QUERIES["media_stats"](SF).to_pandas()
    finally:
        os.environ.pop("VES_CHECK_INVARIANTS")
    check_media_stats(out, SF)
    bad = out.copy()
    bad.loc[0, "width_sum"] += 1
    with pytest.raises(AssertionError, match="decode"):
        check_media_stats(bad, SF)
