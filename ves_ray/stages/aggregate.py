"""Aggregate stage (SURVEY T6): per-sink counts / sums / histograms.

north_star: "per-sink groupby-aggregate counts (events, n_tok sums,
source histograms)".

Scale design: a bare ``groupby(key).aggregate(...)`` shuffles every
row. Both aggregates here key on LOW-cardinality columns (``route``,
``(route, source)``), so we pre-aggregate inside ``map_batches``
(one partial row per key per block) and then run the wide
``groupby`` over partials only — the all-to-all exchange moves
O(routes × blocks) rows instead of O(input rows). At 100 TB this is
the difference between shuffling kilobytes and shuffling the corpus.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Count, Sum


def _partial_counts(keys: list[str], sum_col: str | None):
    """Build a map_batches fn computing per-key partials within a block."""
    def _partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            # empty partial must carry the batch's REAL key types (a
            # hardcoded string type would emit a conflicting block
            # schema for e.g. timestamp keys)
            fields = {k: pa.array([], type=batch.schema.field(k).type)
                      for k in keys}
            fields["events"] = pa.array([], type=pa.int64())
            if sum_col:
                fields["n_tok_sum"] = pa.array([], type=pa.int64())
            return pa.table(fields)
        aggs = [([], "count_all")]
        if sum_col:
            aggs.append((sum_col, "sum"))
        g = pa.TableGroupBy(batch, keys).aggregate(aggs)
        names = list(keys) + ["events"] + (["n_tok_sum"] if sum_col else [])
        return g.rename_columns(names)
    return _partial


def grouped_counts(ds, keys: list[str], sum_col: str | None = None,
                   batch_size: int = 131_072):
    """groupby(keys) → events:=count(*) [, n_tok_sum:=sum(sum_col)]
    with block-local partial aggregation before the shuffle."""
    partial = ds.map_batches(_partial_counts(keys, sum_col),
                             batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=batch_size)
    aggs = [Sum("events", alias_name="events")]
    if sum_col:
        aggs.append(Sum("n_tok_sum", alias_name="n_tok_sum"))
    return partial.groupby(keys).aggregate(*aggs)


def route_counts(ds):
    """Per-sink totals: (route, events, n_tok_sum)."""
    return grouped_counts(ds, ["route"], sum_col="n_tok")


def source_histogram(ds):
    """Per-sink source histogram, exploded form (route, source, events)
    — SQL-verifiable (SURVEY §1.2)."""
    return grouped_counts(ds, ["route", "source"], sum_col=None)


def topk(ds, keys: list[str], k: int = 10, by: str = "events"):
    """Top-k hot groups: pre-aggregated grouped count → sort → limit.
    The sort runs over the tiny aggregate, never the raw rows."""
    return grouped_counts(ds, keys).sort(by, descending=True).limit(k)
