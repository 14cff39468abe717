"""Stream-shaped operators over the ordered, partitioned event log —
tumbling-window aggregates, gap-based sessionization, as-of carry-forward.

Ray Data has no event-time windows/watermarks (neither does the reference —
SURVEY.md §2.10); stream semantics are expressed as
``groupby(key).map_groups(fn)`` over ts-sorted groups (the ray_guide
"streaming-shaped workloads" pattern). Ordering assumption: within one key
group, rows are explicitly sorted by (ts, event_id) inside the group function;
no cross-group ordering is assumed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

US_PER_HOUR = 3_600_000_000


def add_hour_bucket(batch: pa.Table, ts_col: str = "ts", out_col: str = "hour") -> pa.Table:
    """Tumbling 1h window key: ts truncated to the hour (timestamp[us])."""
    us = pc.cast(batch.column(ts_col), pa.int64())
    floored = pc.multiply(pc.divide(us, US_PER_HOUR), US_PER_HOUR)
    return batch.append_column(out_col, pc.cast(floored, pa.timestamp("us")))


def sessionize(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> "ray.data.Dataset":
    """Gap-based session windows per key: a new session starts when the gap
    to the previous event exceeds ``gap_minutes``. Output one row per session:
    (key, session_idx 0-based, n_events, start_ts, end_ts)."""
    gap_us = gap_minutes * 60_000_000

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort").reset_index(drop=True)
        ts = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_session) - 1
        g["_sid"] = sid
        out = (
            g.groupby("_sid")
            .agg(
                n_events=(id_col, "size"),
                start_ts=(ts_col, "min"),
                end_ts=(ts_col, "max"),
            )
            .reset_index()
            .rename(columns={"_sid": "session_idx"})
        )
        out[key_col] = g[key_col].iloc[0]
        out["start_ts"] = out["start_ts"].astype("datetime64[us]")
        out["end_ts"] = out["end_ts"].astype("datetime64[us]")
        return out[[key_col, "session_idx", "n_events", "start_ts", "end_ts"]]

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def asof_last_marker(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    marker_type: str = "signup",
    target_type: str = "purchase",
    out_col: str = "last_marker_ts",
) -> "ray.data.Dataset":
    """As-of join within a key: for every ``target_type`` row, the most recent
    ``marker_type`` timestamp at-or-before it (merge_asof semantics expressed
    as a sorted carry-forward per group — SURVEY.md §2.4 as-of pattern)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort").reset_index(drop=True)
        marker_ts = g[ts_col].where(g[type_col] == marker_type)
        g[out_col] = marker_ts.ffill().astype("datetime64[us]")
        out = g[g[type_col] == target_type].copy()
        out[ts_col] = out[ts_col].astype("datetime64[us]")
        return out[[id_col, key_col, ts_col, out_col]]

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
