"""Stream-shaped operators over the ordered, partitioned event log —
tumbling-window aggregates, gap-based sessionization, as-of carry-forward.

Ray Data has no event-time windows/watermarks (neither does the reference —
SURVEY.md §2.10); stream semantics are expressed as SEGMENTED SCANS: one
global (key, ts, id) range-partitioned sort, per-block vectorized run
detection / carry-forward, and a tiny boundary-stitch task for each block's
edge keys. No task ever materializes a whole key group, so hot keys (one
user with 10^8 events) are bounded by their sorted-block share, and the
per-key state that travels to the stitcher is session/summary-bounded,
never event-bounded.
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
    (key, session_idx 0-based, n_events, start_ts, end_ts).

    HOT-KEY-SAFE shape (sessionization is a segmented scan, not a
    whole-group problem): one global range-partitioned sort on
    (key, ts, id) → per-BLOCK vectorized run detection. A key strictly
    interior to a block is globally complete; only each block's FIRST and
    LAST key can straddle a boundary, and for those only the per-RUN
    partials (session-count-bounded, not event-count-bounded) travel to one
    small stitching task that merges boundary-adjacent runs and assigns the
    final per-key session indices. A single key with 10^8 events costs any
    one task at most its share of sorted blocks plus its run partials —
    never the whole group in memory (the map_groups scale-killer this
    replaces)."""
    gap_us = gap_minutes * 60_000_000
    sch = ds.schema()
    key_type = dict(zip(sch.names, sch.types))[key_col]
    _SESSION_SCHEMA = pa.schema(
        [
            (key_col, key_type),
            ("session_idx", pa.int64()),
            ("n_events", pa.int64()),
            ("start_ts", pa.timestamp("us")),
            ("end_ts", pa.timestamp("us")),
        ]
    )

    def runs_in_block(t: pa.Table) -> pa.Table:
        """Vectorized per-block run partials: one row per (key, local run)
        with an ``_edge`` flag on the block's first/last key."""
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], key_type),
                    "start_ts": pa.array([], pa.timestamp("us")),
                    "end_ts": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "_edge": pa.array([], pa.bool_()),
                }
            )
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        # normalize to µs FIRST (inputs may be timestamp[ns] from pandas)
        ts = pc.cast(
            pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        new_run = np.ones(len(keys), dtype=bool)
        new_run[1:] = (keys[1:] != keys[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(keys)) - 1
        run_keys = keys[starts]
        edge = (run_keys == keys[0]) | (run_keys == keys[-1])
        return pa.table(
            {
                key_col: pa.array(run_keys, key_type),
                "start_ts": pa.array(ts[starts]).cast(pa.timestamp("us")),
                "end_ts": pa.array(ts[ends]).cast(pa.timestamp("us")),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
                "_edge": pa.array(edge),
            }
        )

    def finalize_interior(t: pa.Table) -> pa.Table:
        """Interior keys: runs are final; assign 0-based indices per key
        (runs are in sorted order within the block)."""
        if t.num_columns == 0 or t.num_rows == 0:
            return _SESSION_SCHEMA.empty_table()
        t = t.filter(pc.invert(t.column("_edge"))).drop_columns(["_edge"])
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        first = np.ones(len(keys), dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        idx = np.arange(len(keys)) - np.maximum.accumulate(
            np.where(first, np.arange(len(keys)), 0)
        )
        return pa.table(
            {
                key_col: t.column(key_col),
                "session_idx": pa.array(idx.astype(np.int64)),
                "n_events": pc.cast(t.column("n_events"), pa.int64()),
                "start_ts": t.column("start_ts"),
                "end_ts": t.column("end_ts"),
            }
        )

    def stitch_edges(t: pa.Table) -> pa.Table:
        """Merge boundary-adjacent runs of the block-edge keys (run partials
        only — session-count-bounded) and assign final indices."""
        if t.num_columns == 0 or t.num_rows == 0:
            return _SESSION_SCHEMA.empty_table()
        df = t.drop_columns(["_edge"]).to_pandas()
        df = df.sort_values([key_col, "start_ts", "end_ts"], kind="mergesort")
        keys = df[key_col].to_numpy()
        s = df["start_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        e = df["end_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        n = df["n_events"].to_numpy()
        out = {key_col: [], "session_idx": [], "n_events": [], "start_ts": [], "end_ts": []}
        i = 0
        while i < len(df):
            k = keys[i]
            sidx = 0
            cs, ce, cn = s[i], e[i], int(n[i])
            j = i + 1
            while j <= len(df):
                if j < len(df) and keys[j] == k and s[j] - ce <= gap_us:
                    ce = max(ce, e[j])
                    cn += int(n[j])
                    j += 1
                    continue
                out[key_col].append(k)
                out["session_idx"].append(sidx)
                out["n_events"].append(cn)
                out["start_ts"].append(cs)
                out["end_ts"].append(ce)
                sidx += 1
                if j < len(df) and keys[j] == k:
                    cs, ce, cn = s[j], e[j], int(n[j])
                    j += 1
                else:
                    break
            i = j
        return pa.table(
            {
                key_col: pa.array(out[key_col], key_type),
                "session_idx": pa.array(out["session_idx"], pa.int64()),
                "n_events": pa.array(out["n_events"], pa.int64()),
                "start_ts": pa.array(out["start_ts"], pa.int64()).cast(pa.timestamp("us")),
                "end_ts": pa.array(out["end_ts"], pa.int64()).cast(pa.timestamp("us")),
            }
        )

    from .fastagg import drop_empty_blocks

    tagged = (
        ds.sort([key_col, ts_col, id_col])
        .map_batches(runs_in_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    interior = tagged.map_batches(finalize_interior, batch_format="pyarrow")
    edges = (
        tagged.map_batches(
            lambda t: t.filter(t.column("_edge"))
            if t.num_columns
            else _SESSION_SCHEMA.empty_table().append_column("_edge", pa.array([], pa.bool_())),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(stitch_edges, batch_format="pyarrow", batch_size=None, concurrency=1)
    )
    return drop_empty_blocks(interior.union(edges), _SESSION_SCHEMA)


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
    ``marker_type`` timestamp at-or-before it (merge_asof semantics —
    SURVEY.md §2.4 as-of pattern).

    HOT-KEY-SAFE segmented scan (same shape as ``sessionize``): global sort
    on (key, ts, id) → per-block vectorized carry-forward. Interior keys
    resolve completely in-block. Only target rows of a block's FIRST/LAST
    key that precede that block's first marker are PENDING; they plus
    one last-marker summary row per (edge key, block) — never raw events —
    go to one small stitching task, which answers each pending row as the
    max summary marker ts ≤ its ts (sorted order guarantees any earlier
    block's markers sort before)."""
    gap_na = np.int64(np.iinfo(np.int64).min)
    sch = ds.schema()
    key_type = dict(zip(sch.names, sch.types))[key_col]
    id_type = dict(zip(sch.names, sch.types))[id_col]
    OUT_SCHEMA = pa.schema(
        [
            (id_col, id_type),
            (key_col, key_type),
            (ts_col, pa.timestamp("us")),
            (out_col, pa.timestamp("us")),
        ]
    )
    MID_SCHEMA = pa.schema(
        [
            ("kind", pa.string()),  # 'final' | 'pending' | 'summary'
            (id_col, id_type),
            (key_col, key_type),
            (ts_col, pa.timestamp("us")),
            (out_col, pa.timestamp("us")),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID_SCHEMA.empty_table()
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        # normalize to µs FIRST (inputs may be timestamp[ns] from pandas)
        ts = pc.cast(
            pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        types = t.column(type_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        is_marker = types == marker_type
        is_target = types == target_type
        pos = np.where(is_marker, np.arange(n), -1)
        last_marker_pos = np.maximum.accumulate(pos)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        valid = last_marker_pos >= key_start  # marker within current key seg
        marker_ts = np.where(valid, ts[np.maximum(last_marker_pos, 0)], gap_na)
        is_edge = (keys == keys[0]) | (keys == keys[-1])

        def emit(mask: np.ndarray, kind: str, with_marker: bool) -> pa.Table:
            idx = pa.array(np.flatnonzero(mask))
            mts = marker_ts[mask]
            out_arr = pa.array(
                mts, pa.int64(), mask=(mts == gap_na) if with_marker else np.ones(len(mts), bool)
            ).cast(pa.timestamp("us"))
            return pa.table(
                {
                    "kind": pa.array([kind] * len(mts), pa.string()),
                    id_col: t.column(id_col).take(idx),
                    key_col: t.column(key_col).take(idx),
                    ts_col: pa.array(ts[mask], pa.int64()).cast(pa.timestamp("us")),
                    out_col: out_arr,
                }
            )

        parts = [
            emit(is_target & (valid | ~is_edge), "final", True),
            emit(is_target & ~valid & is_edge, "pending", False),
        ]
        # per-(edge key) last marker summary: one row per edge key (≤ 2)
        s_key, s_ts = [], []
        for k in {keys[0], keys[-1]}:
            mask = (keys == k) & is_marker
            if mask.any():
                s_key.append(k)
                s_ts.append(int(ts[mask].max()))
        if s_key:
            parts.append(
                pa.table(
                    {
                        "kind": pa.array(["summary"] * len(s_key), pa.string()),
                        id_col: pa.array([ids[0]] * len(s_key), id_type),  # unused
                        key_col: pa.array(s_key, key_type),
                        ts_col: pa.array(s_ts, pa.int64()).cast(pa.timestamp("us")),
                        out_col: pa.array(s_ts, pa.int64()).cast(pa.timestamp("us")),
                    }
                )
            )
        return pa.concat_tables(parts)

    def finals(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        f = t.filter(pc.equal(t.column("kind"), "final"))
        return f.select([id_col, key_col, ts_col, out_col])

    def stitch(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        df = t.to_pandas()
        pend = df[df["kind"] == "pending"]
        summ = df[df["kind"] == "summary"]
        if len(pend) == 0:
            return OUT_SCHEMA.empty_table()
        m = pend[[id_col, key_col, ts_col]].merge(
            summ[[key_col, out_col]], on=key_col, how="left"
        )
        # at-or-before: keep summary markers ≤ the target ts, take the max
        m.loc[m[out_col] > m[ts_col], out_col] = pd.NaT
        agg = (
            m.groupby([id_col, key_col, ts_col], as_index=False)[out_col].max()
        )
        agg[ts_col] = agg[ts_col].astype("datetime64[us]")
        agg[out_col] = agg[out_col].astype("datetime64[us]")
        return pa.Table.from_pandas(
            agg[[id_col, key_col, ts_col, out_col]], preserve_index=False
        ).replace_schema_metadata(None).cast(OUT_SCHEMA)

    from .fastagg import drop_empty_blocks

    mid = (
        ds.sort([key_col, ts_col, id_col])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    final_rows = mid.map_batches(finals, batch_format="pyarrow")
    stitched = (
        mid.map_batches(
            lambda t: t.filter(
                pc.is_in(t.column("kind"), value_set=pa.array(["pending", "summary"]))
            )
            if t.num_columns
            else MID_SCHEMA.empty_table(),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(stitch, batch_format="pyarrow", batch_size=None, concurrency=1)
    )
    return drop_empty_blocks(final_rows.union(stitched), OUT_SCHEMA)
