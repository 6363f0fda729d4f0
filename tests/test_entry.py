"""Driver-contract smoke: entry() runs and the catalogs line up."""

import sys

sys.path.insert(0, "/root/repo")


def test_entry_runs():
    import __ray_entry__ as e
    out = e.entry()
    import pyarrow as pa
    assert isinstance(out, pa.Table)
    assert out.num_rows >= 1
    assert set(out.column_names) == {"route", "events", "n_tok_sum"}


def test_catalogs_consistent():
    import __ray_entry__ as e
    qs, sql = e.queries(), e.oracle_sql()
    assert len(qs) >= 20
    assert set(sql).issubset(set(qs))
    # non-SQL ops are the documented ones only
    assert set(qs) - set(sql) == {"lang_id", "fingerprints", "minhash_pairs",
                                  "simhash_pairs", "ann_lsh_topk",
                                  "ann_ivf_topk", "ann_ivf_indexed",
                                  "ann_lsh_indexed", "media_stats",
                                  "pack_sequences",
                                  "users_approx_distinct",
                                  "dedup_keep_minhash",
                                  "embedding_clusters"}


def test_one_query_executes(sf_dir):
    import __ray_entry__ as e
    res = e.queries()["route_counts"](sf_dir)
    df = res.to_pandas()
    assert len(df) == 6
    assert df["events"].sum() == 500
