"""Raw log-file source: discovery predicate (reference S4), line read,
grok normalization."""

import os

from ves_ray.sources.logs import (discover_log_files, parse_log_lines,
                                  read_log_lines, valid_log_file)

LINES = [
    "2024-03-01T10:00:01 INFO svc-a started worker pool",
    "2024-03-01T10:00:02.250 ERROR svc-b failed to bind port 8080",
    "not a log line at all",
    "2024-03-01T10:00:03 WARN svc-a queue depth 900",
]


def _mklogs(root):
    os.makedirs(os.path.join(root, "sub"))
    with open(os.path.join(root, "app.log"), "w") as f:
        f.write("\n".join(LINES[:2]) + "\n")
    with open(os.path.join(root, "sub", "more.txt"), "w") as f:
        f.write("\n".join(LINES[2:]) + "\n")
    # must all be rejected (S4, discovery.rs:101-116)
    with open(os.path.join(root, ".hidden.log"), "w") as f:
        f.write("nope\n")
    with open(os.path.join(root, "data.parquet"), "w") as f:
        f.write("nope\n")


def test_valid_log_file(tmp_path):
    _mklogs(str(tmp_path))
    assert valid_log_file(str(tmp_path / "app.log"))
    assert not valid_log_file(str(tmp_path / ".hidden.log"))
    assert not valid_log_file(str(tmp_path / "data.parquet"))
    assert not valid_log_file(str(tmp_path))


def test_discover_recursive_and_flat(tmp_path):
    _mklogs(str(tmp_path))
    rec = discover_log_files(str(tmp_path))
    assert [os.path.basename(p) for p in rec] == ["app.log", "more.txt"]
    flat = discover_log_files(str(tmp_path), recursive=False)
    assert [os.path.basename(p) for p in flat] == ["app.log"]


def test_read_and_grok_parse(tmp_path):
    _mklogs(str(tmp_path))
    ds = read_log_lines(str(tmp_path))
    out = parse_log_lines(ds).to_pandas()
    assert len(out) == 4
    ok = out[out["parse_ok"]]
    assert len(ok) == 3
    assert set(ok["level"]) == {"INFO", "ERROR", "WARN"}
    assert set(ok["src"]) == {"svc-a", "svc-b"}
    bad = out[~out["parse_ok"]]
    assert list(bad["text"]) == ["not a log line at all"]
    # path attribution survives the read
    assert out["path"].str.endswith((".log", ".txt")).all()
