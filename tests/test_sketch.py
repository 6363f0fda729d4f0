"""HyperLogLog approximate distinct (stages.sketch)."""

import numpy as np
import pyarrow as pa

import ray.data as rd
from ves_ray.stages.sketch import (approx_distinct,
                                   grouped_approx_distinct)


def test_approx_distinct_within_error():
    n = 100_000
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(np.concatenate([ids, ids]))}))
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - n) / n < 0.05           # 1.6% expected, 5% bound


def test_approx_distinct_small_range_exactish():
    ds = rd.from_arrow(pa.table({"k": pa.array(list(range(50)) * 10)}))
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - 50) <= 2                # small-range correction


def test_grouped_approx_distinct_string_keys():
    rng = np.random.default_rng(17)
    groups = np.where(rng.random(30_000) < 0.5, "a", "b")
    # group a: ~5000 distinct users; group b: ~500
    users = np.where(groups == "a",
                     rng.integers(0, 5000, 30_000),
                     rng.integers(100_000, 100_500, 30_000))
    ds = rd.from_arrow(pa.table({
        "g": pa.array(groups), "u": pa.array(users, type=pa.int64())}))
    out = grouped_approx_distinct(ds, "g", "u", p=12)
    got = out.set_index("g")["approx_distinct"].to_dict()
    import pandas as pd
    exact = (pd.DataFrame({"g": groups, "u": users})
             .groupby("g")["u"].nunique().to_dict())
    for g in ("a", "b"):
        assert abs(got[g] - exact[g]) / exact[g] < 0.06
