"""As-of join and grouped top-k operators (stages.relational)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ves_ray.stages.relational import asof_join, grouped_topk


def _events():
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00",
        "2024-01-01 00:30", "2024-01-01 01:30",
        "2024-01-01 00:10",
    ])
    return pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


def test_asof_join_backward():
    t = _events()
    left = rd.from_arrow(t.filter(pa.compute.is_in(
        t["event_id"], value_set=pa.array([1, 2, 4, 5]))))
    right = rd.from_arrow(t.filter(pa.compute.is_in(
        t["event_id"], value_set=pa.array([0, 3]))))
    out = asof_join(left, right, key_col="user_id", ts_col="ts",
                    left_cols=["event_id"], right_cols=["event_id"],
                    num_buckets=4).to_pandas()
    lut = dict(zip(out["event_id"].astype(int),
                   out["event_id_r"]))
    assert lut[1] == 0 and lut[2] == 0        # user 1 → most recent = 0
    assert lut[4] == 3                         # user 2 → 3
    assert np.isnan(lut[5])                    # user 3: no right row


def test_asof_exact_match_allowed():
    t = _events()
    left = rd.from_arrow(t.slice(0, 1))        # event 0 at 00:00 user 1
    right = rd.from_arrow(t.slice(0, 1))
    out = asof_join(left, right, key_col="user_id", ts_col="ts",
                    left_cols=["event_id"], right_cols=["event_id"],
                    num_buckets=2).to_pandas()
    assert out["event_id_r"].iloc[0] == 0      # ts >= ts: equal matches


def test_grouped_topk_rank():
    t = _events()
    out = grouped_topk(rd.from_arrow(t), key_col="user_id",
                       order_cols=["ts", "event_id"],
                       ascending=[False, False], k=2,
                       keep_cols=["event_id"], num_buckets=4).to_pandas()
    got = {(r.user_id, r.rk): r.event_id for r in out.itertuples()}
    assert got[(1, 1)] == 2 and got[(1, 2)] == 1
    assert got[(2, 1)] == 4 and got[(2, 2)] == 3
    assert got[(3, 1)] == 5
    assert len(out) == 5
