import collections

import pyarrow as pa
import pyarrow.parquet as pq

from ves_ray.fixtures import (HOT_SOURCE, make_sequences_table,
                              make_sources_table, write_sequences)
from ves_ray.schema import SEQUENCES_SCHEMA


def test_deterministic():
    assert make_sequences_table(7, 500).equals(make_sequences_table(7, 500))
    assert not make_sequences_table(8, 500).equals(make_sequences_table(7, 500))


def test_chunked_equals_whole():
    parts = [make_sequences_table(7, 100, row_offset=o) for o in (0, 100, 200)]
    assert pa.concat_tables(parts).equals(make_sequences_table(7, 300))


def test_schema_and_invariants():
    t = make_sequences_table(3, 300)
    assert t.schema.equals(SEQUENCES_SCHEMA)
    n_tok = t["n_tok"].to_pylist()
    lens = [len(x) for x in t["tokens"].to_pylist()]
    assert n_tok == lens
    assert min(n_tok) >= 1 and max(n_tok) <= 512


def test_distribution(tmp_path):
    t = make_sequences_table(7, 4000)
    c = collections.Counter(t["source"].to_pylist())
    hot = c[HOT_SOURCE] / len(t)
    unk = sum(v for k, v in c.items() if "unk" in k) / len(t)
    assert 0.55 < hot < 0.65
    assert 0.001 < unk < 0.02
    paths = write_sequences(str(tmp_path / "seq"), seed=7, n_rows=1000, n_files=8)
    assert len(paths) == 8
    total = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    assert total == 1000


def test_sources_lookup():
    s = make_sources_table()
    assert s.num_rows == 32
    d = s.to_pydict()
    assert d["hot"] == [k == 0 for k in range(32)]
    assert d["route"][0] == "route-0" and d["route"][7] == "route-1"
