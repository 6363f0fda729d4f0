"""Persisted hash-bucketed table layout: co-located joins and
groupbys with ZERO shuffle.

At 100 TB the dominant cost of ``hash_join`` / ``groupby`` is the
all-to-all exchange. When the same join/group key is reused across
stages or runs (the brief's "pick ONE partitioning key and reuse it
across stages"), pay that exchange ZERO times: persist the table
hash-partitioned by key bucket (``write_bucketed`` — each write task
appends its slice of every bucket, so the bucketing write itself is
shuffle-free), then every later join or aggregate on that key is
bucket-local: task k reads ``bucket=k`` of each side (directory-
pruned parquet read) and joins / aggregates in memory. Perfectly
parallel, no exchange, resumable per bucket.

A ``_bucketed.json`` manifest (written LAST — readers treat a
manifest-less directory as unpublished) records key, bucket count,
hash version and the Arrow schema; co-located ops validate both
sides' manifests are compatible before running. The bucket hash is
``stages.window._bucket_of`` — the SAME function the in-memory
exchanges use, so persisted layouts and live shuffles agree on key
placement.

Partitioning assumption (per the hash_join contract): one bucket of
each side must fit a worker's heap; size ``num_buckets`` to the
table, and salt/pre-split pathologically hot keys BEFORE bucketing.

Reference analogue: none — motivated by the LLM-pipeline brief's
scale axis.
"""

from __future__ import annotations

import base64
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_HASH_VER = 1          # bump if stages.window._bucket_of ever changes
_MANIFEST = "_bucketed.json"


def _schema_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def _schema_from_b64(s: str) -> pa.Schema:
    import pyarrow.ipc
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


def write_bucketed(ds, path: str, *, key_col: str,
                   num_buckets: int = 64) -> dict:
    """Materialize ``ds`` hash-partitioned by ``key_col`` into
    ``path/bucket=K/`` dirs (hive layout). No shuffle: each streaming
    write task splits its own blocks across bucket directories.
    Returns the manifest (also published to ``path/_bucketed.json``,
    after the data — manifest-last atomic publish)."""
    from ..stages.window import _bucket_of

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pa.array(_bucket_of(b[key_col], num_buckets)))

    schema = ds.schema()
    tagged = ds.map_batches(add_bucket, batch_format="pyarrow",
                            zero_copy_batch=True)
    tagged.write_parquet(path, partition_cols=["bucket"])
    man = {"key_col": key_col, "num_buckets": num_buckets,
           "hash_ver": _HASH_VER,
           "schema": _schema_b64(
               pa.schema(list(zip(schema.names, schema.types))))}
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))
    return man


def read_manifest(path: str) -> dict:
    p = os.path.join(path, _MANIFEST)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"{path} has no {_MANIFEST}: not a published bucketed "
            "layout (write_bucketed publishes the manifest last)")
    with open(p) as f:
        return json.load(f)


def _check_compatible(man_l: dict, man_r: dict) -> None:
    for field in ("key_col", "num_buckets", "hash_ver"):
        if man_l[field] != man_r[field]:
            raise ValueError(
                f"bucketed layouts incompatible on {field}: "
                f"{man_l[field]!r} vs {man_r[field]!r} — co-located "
                "ops require identical key, bucket count and hash")


def _read_bucket(path: str, k: int, schema: pa.Schema,
                 columns: list[str]) -> pa.Table:
    d = os.path.join(path, f"bucket={k}")
    if not os.path.isdir(d):        # no key hashed here: empty, typed
        return pa.schema([schema.field(c) for c in columns]) \
                 .empty_table()
    return pq.read_table(d, columns=columns)


def colocated_join(path_l: str, path_r: str, *, left_cols: list[str],
                   right_cols: list[str], how: str = "inner",
                   right_suffix: str = "_r",
                   right_agg: dict | None = None):
    """Join two bucketed layouts sharing a key WITHOUT any exchange:
    one task per bucket reads ``bucket=k`` of both sides and joins
    them with the Acero kernel (same semantics as
    ``relational.hash_join``, including the join-aggregate fusion via
    ``right_agg``). Returns a streaming Dataset of joined rows."""
    import ray.data as rd

    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how}")
    man_l, man_r = read_manifest(path_l), read_manifest(path_r)
    _check_compatible(man_l, man_r)
    key_col = man_l["key_col"]
    num_buckets = int(man_l["num_buckets"])
    schema_l = _schema_from_b64(man_l["schema"])
    schema_r = _schema_from_b64(man_r["schema"])
    out_right = [c + right_suffix if (c in left_cols or c == key_col)
                 else c for c in right_cols]
    agg_out = {(c + right_suffix if (c in left_cols or c == key_col)
                else c): a for c, a in (right_agg or {}).items()}
    join_type = {"inner": "inner", "left": "left outer"}[how]
    final_order = [key_col] + left_cols + out_right

    def join_bucket(batch: pa.Table) -> pa.Table:
        out = []
        for k in batch["item"].to_pylist():
            left = _read_bucket(path_l, k, schema_l,
                                [key_col] + left_cols)
            right = _read_bucket(path_r, k, schema_r,
                                 [key_col] + right_cols)
            right = right.rename_columns([key_col] + out_right)
            if agg_out:
                gb = pa.TableGroupBy(right, [key_col]).aggregate(
                    list(agg_out.items()))
                right = gb.rename_columns([key_col] + list(agg_out))
            j = left.join(right, keys=key_col, join_type=join_type)
            out.append(j.select(final_order))
        return pa.concat_tables(out).combine_chunks()

    return rd.from_items(list(range(num_buckets))) \
             .map_batches(join_bucket, batch_format="pyarrow",
                          batch_size=1)


def colocated_groupby(path: str, *, agg_cols: dict[str, str],
                      count_alias: str | None = None):
    """Exact grouped aggregate over a bucketed layout with NO
    exchange: every key lives in exactly one bucket, so per-bucket
    groupby results ARE the global results. ``agg_cols`` maps column
    → Arrow aggregate ("sum", "min", "max", "mean"); ``count_alias``
    adds a COUNT(*) column. Returns a streaming Dataset with one row
    per key."""
    import ray.data as rd

    man = read_manifest(path)
    key_col = man["key_col"]
    num_buckets = int(man["num_buckets"])
    schema = _schema_from_b64(man["schema"])
    cols = [key_col] + list(agg_cols)
    aggs = ([([], "count_all")] if count_alias else []) \
        + [(c, a) for c, a in agg_cols.items()]
    names = [key_col] + ([count_alias] if count_alias else []) \
        + list(agg_cols)

    def agg_bucket(batch: pa.Table) -> pa.Table:
        out = []
        for k in batch["item"].to_pylist():
            t = _read_bucket(path, k, schema, cols)
            g = pa.TableGroupBy(t, [key_col]).aggregate(aggs)
            out.append(g.rename_columns(names))
        return pa.concat_tables(out).combine_chunks()

    return rd.from_items(list(range(num_buckets))) \
             .map_batches(agg_bucket, batch_format="pyarrow",
                          batch_size=1)
