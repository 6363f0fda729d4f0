"""Export/ship sink (state.export) — the T10 batch analogue."""

import json
import os

import pyarrow as pa

import ray.data as rd
from ves_ray.state.export import (MANIFEST_NAME, export_results,
                                  verify_export)


def _tables():
    agg = pa.table({"route": ["a", "b"], "events": pa.array([3, 4],
                                                            type=pa.int64())})
    rows = pa.table({"doc_id": pa.array(range(500), type=pa.int64()),
                     "v": [f"x{i}" for i in range(500)]})
    return agg, rows


def test_export_roundtrip_and_verify(tmp_path):
    agg, rows = _tables()
    out = str(tmp_path / "export")
    man = export_results({"agg": agg,
                          "rows": rd.from_arrow(rows)
                          .repartition(4)}, out)
    assert os.path.exists(os.path.join(out, MANIFEST_NAME))
    assert man["tables"]["agg"]["rows"] == 2
    assert man["tables"]["rows"]["rows"] == 500
    assert len(man["tables"]["rows"]["files"]) >= 2  # distributed shards
    assert verify_export(out) == {"agg": True, "rows": True}
    # wire bytes readable by a plain consumer
    recs = []
    for fn in man["tables"]["rows"]["files"]:
        with open(os.path.join(out, "rows", fn)) as f:
            recs += [json.loads(line) for line in f if line.strip()]
    assert sorted(r["doc_id"] for r in recs) == list(range(500))


def test_export_tamper_detected(tmp_path):
    agg, _ = _tables()
    out = str(tmp_path / "export")
    man = export_results({"agg": agg}, out)
    fn = os.path.join(out, "agg", man["tables"]["agg"]["files"][0])
    with open(fn, "a") as f:
        f.write('{"route": "evil", "events": 9}\n')
    assert verify_export(out) == {"agg": False}


def test_export_idempotent_and_atomic(tmp_path):
    agg, _ = _tables()
    out = str(tmp_path / "export")
    m1 = export_results({"agg": agg}, out)
    # second call is a no-op returning the existing manifest
    m2 = export_results({"agg": pa.table({"route": ["z"],
                                          "events": [1]})}, out)
    assert m1 == m2
    # overwrite republishes atomically
    m3 = export_results({"agg": agg}, out, overwrite=True)
    assert verify_export(out) == {"agg": True}
    assert m3["tables"]["agg"]["rows"] == 2
    # no stale temp dirs beside the export
    assert not any(d.startswith(".tmp-export-")
                   for d in os.listdir(str(tmp_path)))
