"""Windowed / session operators over event streams.

The reference snapshot has no window semantics (SURVEY §2 checklist:
"no windows/watermarks in snapshot"); these are the batch analogues a
log pipeline grows next: tumbling windows (see
stages.parse.truncate_to_hour) and gap-based sessionization.

Sessionization is a per-key ordered scan — the one operator family
where ``groupby(key).map_groups`` is the right Ray Data shape: groups
(users) are bounded, each group's scan is vectorized numpy, and the
groupby shuffle co-locates exactly what the scan needs. At larger key
cardinality, pre-bucket keys (hash(user) % B) and sessionize each
bucket's users inside one map_groups call.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(ds, *, key_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id", gap_s: int = 1800):
    """Assign gap-based sessions per key and aggregate one row per
    session: (key, session_id, events, duration_s).

    session_id numbers sessions 1..N per key in time order; a new
    session starts when the gap to the previous event exceeds
    ``gap_s`` seconds.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col], kind="mergesort")
        # integer microseconds end-to-end: sub-second fractions must
        # count toward gaps/durations exactly as in a SQL oracle
        ts_us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap_us = gap_s * 1_000_000
        gaps = np.diff(ts_us, prepend=ts_us[0] - gap_us - 1)
        session = np.cumsum(gaps > gap_us)
        starts = ts_us[np.concatenate(([True], np.diff(session) > 0))]
        ends = ts_us[np.concatenate((np.diff(session) > 0, [True]))]
        counts = np.bincount(session - 1)
        return pd.DataFrame({
            key_col: g[key_col].iloc[0],
            "session_id": np.arange(1, len(counts) + 1, dtype=np.int64),
            "events": counts.astype(np.int64),
            "duration_s": ((ends - starts) // 1_000_000).astype(np.int64),
        })

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
