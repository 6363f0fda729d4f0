"""Single-process oracle: a pure pyarrow/pandas reimplementation of the
flagship transforms (SURVEY §5.2 — never uses Ray), used to verify the
distributed pipeline row-for-row."""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ves_ray.schema import DEFAULT_ROUTE, DEFAULT_SEVERITY, DEFAULT_TENANT

_DOC_RE = re.compile(r"^(.*?)-([+-]?\d+)$")


def oracle_routed(input_paths: list[str], lookup: pa.Table) -> pd.DataFrame:
    """Expected routed output: one row per input row with
    (doc_id, tokens, n_tok, source, src, seq_idx, parse_ok,
    tenant, severity, route)."""
    frames = []
    for p in sorted(input_paths):
        frames.append(pq.read_table(p).to_pandas())
    df = pd.concat(frames, ignore_index=True)
    m = df["doc_id"].map(lambda s: _DOC_RE.match(s))
    df["src"] = [x.group(1) if x else None for x in m]
    df["seq_idx"] = [int(x.group(2)) if x else None for x in m]
    df["parse_ok"] = [x is not None for x in m]
    lk = lookup.to_pandas().set_index("source")
    for col, default in (("tenant", DEFAULT_TENANT), ("severity", DEFAULT_SEVERITY),
                         ("route", DEFAULT_ROUTE)):
        df[col] = df["source"].map(lk[col]).fillna(default)
    return df


def oracle_route_counts(routed: pd.DataFrame) -> pd.DataFrame:
    g = (routed.groupby("route", as_index=False)
               .agg(events=("doc_id", "size"), n_tok_sum=("n_tok", "sum")))
    g = g.astype({"events": "int64", "n_tok_sum": "int64"})
    return g.sort_values("route", ignore_index=True)


def oracle_source_hist(routed: pd.DataFrame) -> pd.DataFrame:
    g = (routed.groupby(["route", "source"], as_index=False)
               .agg(events=("doc_id", "size")))
    g = g.astype({"events": "int64"})
    return g.sort_values(["route", "source"], ignore_index=True)
