"""CLI driver surface (ves_ray.cli) — exercised in-process against
the session Ray fixture (cmd functions skip ray.init when a session
exists)."""

import json
import os

import pytest

from ves_ray import cli


def _run(capsys, argv):
    rc = cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, out


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli") / "seq")
    rc = cli.main(["gen", "--out", d, "--rows", "2000", "--files", "4"])
    assert rc == 0
    return d


def test_cli_gen_and_run(gen_dir, tmp_path, capsys):
    capsys.readouterr()
    out_dir = str(tmp_path / "out")
    rc, out = _run(capsys, ["run", "--input", gen_dir, "--out", out_dir])
    assert rc == 0
    summary = json.loads(out[-1])
    assert summary["rows"] == 2000
    assert any(r["route"].startswith("route-")
               for r in summary["route_counts"])
    # resume: second run is a no-op (0 newly processed rows)
    capsys.readouterr()
    rc, out = _run(capsys, ["run", "--input", gen_dir, "--out", out_dir])
    assert rc == 0
    again = json.loads(out[-1])
    assert again["rows"] == 0 and again["pending_fragments"] == 0


def test_cli_plan_lists_pending(gen_dir, tmp_path, capsys):
    capsys.readouterr()
    rc, out = _run(capsys, ["plan", "--input", gen_dir,
                            "--out", str(tmp_path / "never_run")])
    assert rc == 0
    plan = json.loads(out[-1])
    assert len(plan["discovered"]) == 4 and plan["removed"] == []


def test_cli_query_list_and_unknown(capsys):
    capsys.readouterr()
    rc, out = _run(capsys, ["query", "list"])
    assert rc == 0 and "route_counts" in out
    rc = cli.main(["query", "no_such_query"])
    assert rc == 2


def test_cli_query_writes_parquet(tmp_path, capsys):
    capsys.readouterr()
    dest = str(tmp_path / "rc.parquet")
    rc, out = _run(capsys, ["query", "route_counts",
                            "--sf-dir", "/root/testdata/sf0.001",
                            "--out", dest])
    assert rc == 0
    import duckdb
    df = duckdb.sql(f"SELECT SUM(events) e FROM '{dest}'").df()
    assert int(df["e"][0]) == 500


def test_cli_compact(tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq
    root = str(tmp_path / "sink")
    os.makedirs(os.path.join(root, "route=a"))
    for i in range(4):
        pq.write_table(pa.table({"x": pa.array(range(5))}),
                       os.path.join(root, "route=a", f"{i}.parquet"))
    capsys.readouterr()
    rc, out = _run(capsys, ["compact", "--root", root,
                            "--min-rows-per-file", "100"])
    assert rc == 0
    stats = json.loads(out[-1])
    assert stats == {"partitions": 1, "files_before": 4,
                     "files_after": 1}


def test_cli_export(gen_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    capsys.readouterr()
    rc, _ = _run(capsys, ["run", "--input", gen_dir, "--out", out_dir])
    assert rc == 0
    capsys.readouterr()
    exp_dir = str(tmp_path / "export")
    rc, out = _run(capsys, ["export", "--run-dir", out_dir,
                            "--out", exp_dir, "--include-rows"])
    assert rc == 0
    res = json.loads(out[-1])
    assert res["verified"] == {"route_counts": True,
                               "source_hist": True, "routed": True}
    assert res["tables"]["routed"] == 2000
