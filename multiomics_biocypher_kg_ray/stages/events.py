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

from ..arrow_util import floor_div_i64

US_PER_HOUR = 3_600_000_000


def add_hour_bucket(batch: pa.Table, ts_col: str = "ts", out_col: str = "hour") -> pa.Table:
    """Tumbling 1h window key: ts truncated to the hour (timestamp[us])."""
    # normalize to µs FIRST (pandas-backed inputs arrive as timestamp[ns])
    us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")), pa.int64())
    # floor (not trunc) division: pre-epoch timestamps round down, matching
    # the oracle's DuckDB time_bucket/floor semantics
    floored = pc.multiply(floor_div_i64(us, US_PER_HOUR), US_PER_HOUR)
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
    LAST key can straddle a boundary. Cross-block merges can only join a
    block's LAST run of a key with the next block's FIRST run of the same
    key (in-block adjacent runs are already separated by > gap), so the
    only state any task needs globally is the per-(edge key, block)
    BOUNDARY runs — ≤ 4 rows per sorted block (2 edge keys × first/last
    run), i.e. block-count-bounded, never session- or event-bounded. Those
    boundary rows are collected once, broadcast, and every edge run then
    resolves DISTRIBUTED in a plain map_batches pass: from the broadcast
    summary each worker derives, per key, the boundary-merge flags, the
    merged-chain extents, and the per-block global session-index offsets,
    and each run independently emits (or is absorbed into) its final
    session row. A single key with 10^8 events across 10^4 blocks costs
    any one task at most its share of sorted blocks; no single-task stitch
    funnel exists (the ``repartition(1)`` shape this replaces).

    Precondition: ``id_col`` is unique per key (it breaks ts ties in the
    sort and identifies a block's first event of a key)."""
    gap_us = gap_minutes * 60_000_000
    sch = ds.schema()
    key_type = dict(zip(sch.names, sch.types))[key_col]
    id_type = dict(zip(sch.names, sch.types))[id_col]
    _SESSION_SCHEMA = pa.schema(
        [
            (key_col, key_type),
            ("session_idx", pa.int64()),
            ("n_events", pa.int64()),
            ("start_ts", pa.timestamp("us")),
            ("end_ts", pa.timestamp("us")),
        ]
    )
    # run-partial rows: session fields + block-boundary bookkeeping.
    # (_kft, _kfi) = ts/id of the FIRST event of the run's key in this block
    # — a sort-order-stable surrogate for the block ordinal within a key
    # (id_col is unique per key, so no two blocks share it). _ridx / _nruns
    # position the run among its key's runs within the block.
    _RUN_SCHEMA = pa.schema(
        [
            (key_col, key_type),
            ("start_ts", pa.timestamp("us")),
            ("end_ts", pa.timestamp("us")),
            ("n_events", pa.int64()),
            ("_edge", pa.bool_()),
            ("_kft", pa.int64()),
            ("_kfi", id_type),
            ("_ridx", pa.int64()),
            ("_nruns", pa.int64()),
        ]
    )

    def runs_in_block(t: pa.Table) -> pa.Table:
        """Vectorized per-block run partials: one row per (key, local run)
        with an ``_edge`` flag on the block's first/last key."""
        if t.num_columns == 0 or t.num_rows == 0:
            return _RUN_SCHEMA.empty_table()
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        # normalize to µs FIRST (inputs may be timestamp[ns] from pandas)
        ts = pc.cast(
            pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        new_key_evt = np.ones(n, dtype=bool)
        new_key_evt[1:] = keys[1:] != keys[:-1]
        seg_start = np.maximum.accumulate(np.where(new_key_evt, np.arange(n), 0))
        new_run = new_key_evt | np.concatenate(
            ([True], (ts[1:] - ts[:-1]) > gap_us)
        )
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n) - 1
        run_keys = keys[starts]
        edge = (run_keys == keys[0]) | (run_keys == keys[-1])
        kf = seg_start[starts]  # first-event index of each run's key
        # run index within (key, block) + runs-per-key-in-block
        new_key_run = np.ones(len(starts), dtype=bool)
        new_key_run[1:] = run_keys[1:] != run_keys[:-1]
        rseg = np.maximum.accumulate(
            np.where(new_key_run, np.arange(len(starts)), 0)
        )
        ridx = np.arange(len(starts)) - rseg
        seg_id = np.cumsum(new_key_run) - 1
        nruns = np.bincount(seg_id)[seg_id]
        return pa.table(
            {
                key_col: pa.array(run_keys, key_type),
                "start_ts": pa.array(ts[starts]).cast(pa.timestamp("us")),
                "end_ts": pa.array(ts[ends]).cast(pa.timestamp("us")),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
                "_edge": pa.array(edge),
                "_kft": pa.array(ts[kf]),
                "_kfi": pa.array(ids[kf], id_type),
                "_ridx": pa.array(ridx.astype(np.int64)),
                "_nruns": pa.array(nruns.astype(np.int64)),
            }
        )

    def finalize_interior(t: pa.Table) -> pa.Table:
        """Interior keys: runs are final; assign 0-based indices per key
        (runs are in sorted order within the block)."""
        if t.num_columns == 0 or t.num_rows == 0:
            return _SESSION_SCHEMA.empty_table()
        t = t.filter(pc.invert(t.column("_edge"))).select(
            [key_col, "start_ts", "end_ts", "n_events"]
        )
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

    def bound_rows(t: pa.Table) -> pa.Table:
        """Per-(edge key, block) boundary runs: the FIRST (_ridx == 0) and
        LAST (_ridx == _nruns-1) run of each edge key — ≤ 4 rows/block."""
        if t.num_columns == 0 or t.num_rows == 0:
            return _RUN_SCHEMA.empty_table()
        m = pc.and_(
            t.column("_edge"),
            pc.or_(
                pc.equal(t.column("_ridx"), 0),
                pc.equal(t.column("_ridx"), pc.subtract(t.column("_nruns"), 1)),
            ),
        )
        return t.filter(m)

    from .fastagg import drop_empty_blocks
    from ..state.broadcast import broadcast, state_key, task_state

    tagged = (
        ds.sort([key_col, ts_col, id_col])
        .map_batches(runs_in_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    # batch_size=None pins positional run-index logic to whole-block batches
    # (ADVICE r2: never rely on Ray's default batching for positional state)
    interior = tagged.map_batches(
        finalize_interior, batch_format="pyarrow", batch_size=None
    )
    # boundary summary is block-count-bounded (≤ 4 rows per sorted block):
    # the only state a cross-block merge needs, and small enough to broadcast
    summ_tbl = pa.concat_tables(
        [
            b
            for b in tagged.map_batches(
                bound_rows, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        or [_RUN_SCHEMA.empty_table()]
    ).combine_chunks()
    summ_ref = broadcast(
        summ_tbl.select([key_col, "_kft", "_kfi", "_ridx", "_nruns", "start_ts", "end_ts", "n_events"])
    )

    def _key_index(ref):
        """Per-worker memo: key → per-block arrays (in sort order) of run
        counts, boundary-merge flags, chain extents and global session-index
        offsets — everything an edge run needs to finalize independently."""
        tbl = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        if tbl.num_rows == 0:
            return {}
        df = tbl.to_pandas()
        df["_s"] = df["start_ts"].astype("datetime64[us]").astype("int64")
        df["_e"] = df["end_ts"].astype("datetime64[us]").astype("int64")
        df = df.sort_values([key_col, "_kft", "_kfi", "_ridx"], kind="mergesort")
        index: dict = {}
        for k, g in df.groupby(key_col, sort=False):
            # one or two rows per (key, block): _ridx==0 is the first run,
            # _ridx==_nruns-1 the last (the same row when _nruns == 1)
            firsts = g[g["_ridx"] == 0]
            lasts = g[g["_ridx"] == g["_nruns"] - 1]
            kft = firsts["_kft"].to_numpy()
            kfi = firsts["_kfi"].to_numpy()
            nruns = firsts["_nruns"].to_numpy().astype(np.int64)
            f_s = firsts["_s"].to_numpy()
            f_e = firsts["_e"].to_numpy()
            f_n = firsts["n_events"].to_numpy().astype(np.int64)
            l_e = lasts["_e"].to_numpy()
            B = len(firsts)
            merge_prev = np.zeros(B, dtype=bool)
            if B > 1:
                merge_prev[1:] = (f_s[1:] - l_e[:-1]) <= gap_us
            starts_in_block = nruns - merge_prev.astype(np.int64)
            S = np.concatenate(([0], np.cumsum(starts_in_block)[:-1]))
            # chains: head = a block's LAST run followed by ≥1 boundary
            # merges; intermediate chain members are single-run blocks.
            # One forward pass — chains are disjoint, total cost O(B).
            head_extra = np.zeros(B, dtype=np.int64)
            head_end = l_e.copy()
            j = 1
            while j < B:
                if not merge_prev[j]:
                    j += 1
                    continue
                h = j - 1
                extra, end = 0, l_e[h]
                while j < B and merge_prev[j]:
                    extra += f_n[j]
                    end = f_e[j]
                    j += 1
                    if nruns[j - 1] != 1:
                        break
                head_extra[h] = extra
                head_end[h] = max(end, l_e[h])
            index[k] = {
                "bmap": {p: i for i, p in enumerate(zip(kft.tolist(), kfi.tolist()))},
                "nruns": nruns,
                "merge_prev": merge_prev,
                "S": S,
                "head_extra": head_extra,
                "head_end": head_end,
            }
        return index

    def resolve_edges(t: pa.Table) -> pa.Table:
        """Finalize edge runs distributed: each run looks up its block's
        merge flags / index offset in the broadcast summary and emits its
        session row (absorbed first-of-block runs emit nothing; chain heads
        emit the merged extent). Vectorized per key within the batch."""
        if t.num_columns == 0 or t.num_rows == 0:
            return _SESSION_SCHEMA.empty_table()
        t = t.filter(t.column("_edge"))
        if t.num_rows == 0:
            return _SESSION_SCHEMA.empty_table()
        index = task_state(
            state_key("sess_summ", summ_ref), lambda: _key_index(summ_ref)
        )
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        s = pc.cast(
            pc.cast(t.column("start_ts"), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        e = pc.cast(
            pc.cast(t.column("end_ts"), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        n = t.column("n_events").to_numpy(zero_copy_only=False)
        kft = t.column("_kft").to_numpy(zero_copy_only=False)
        kfi = t.column("_kfi").to_numpy(zero_copy_only=False)
        ridx = t.column("_ridx").to_numpy(zero_copy_only=False)
        o_key, o_idx, o_n, o_s, o_e = [], [], [], [], []
        for k in np.unique(keys):
            ki = index[k]
            m = keys == k
            bmap = ki["bmap"]
            j = np.fromiter(
                (bmap[p] for p in zip(kft[m].tolist(), kfi[m].tolist())),
                dtype=np.int64,
                count=int(m.sum()),
            )
            i = ridx[m]
            mp = ki["merge_prev"][j]
            keep = ~((i == 0) & mp)
            before = ki["S"][j] + np.where(i > 0, i - mp.astype(np.int64), 0)
            ishead = (i == ki["nruns"][j] - 1) & (ki["head_extra"][j] > 0)
            o_key.append(pa.array(keys[m][keep], key_type))
            o_idx.append(before[keep])
            o_n.append((n[m] + np.where(ishead, ki["head_extra"][j], 0))[keep])
            o_s.append(s[m][keep])
            o_e.append(np.where(ishead, ki["head_end"][j], e[m])[keep])
        if not o_key:
            return _SESSION_SCHEMA.empty_table()
        return pa.table(
            {
                key_col: pa.concat_arrays(o_key),
                "session_idx": pa.array(
                    np.concatenate(o_idx).astype(np.int64)
                ),
                "n_events": pa.array(np.concatenate(o_n).astype(np.int64)),
                "start_ts": pa.array(np.concatenate(o_s)).cast(pa.timestamp("us")),
                "end_ts": pa.array(np.concatenate(o_e)).cast(pa.timestamp("us")),
            }
        )

    edges = tagged.map_batches(
        resolve_edges, batch_format="pyarrow", batch_size=None
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
    ``marker_type`` timestamp strictly-preceding-or-tied in (ts, id) window
    order (the oracle's ``ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING``).

    HOT-KEY-SAFE segmented scan (same shape as ``sessionize``): global sort
    on (key, ts, id) → per-block vectorized carry-forward. Interior keys
    resolve completely in-block. Target rows of a block's FIRST/LAST key
    that precede that block's first marker are PENDING; each block also
    emits ONE summary row per (edge key) carrying its positionally-last
    marker's own (ts, id). The summary table is block-count-bounded (≤ 2
    rows/block), so it is collected once, broadcast, and every pending row
    resolves DISTRIBUTED in the same pass that emits finals — a markerless
    hot key never funnels raw rows into a single stitch task. Window
    correctness under ts ties: a summary marker answers a pending target
    iff (marker_ts, marker_id) < (target_ts, target_id) lexicographically —
    a same-block marker (always positionally after a pending target) and
    any later-block marker fail that test, an earlier-block marker passes
    it, exactly matching ROWS UNBOUNDED PRECEDING."""
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
        # per-(edge key) last marker summary: one row per edge key (≤ 2),
        # carrying the marker's OWN (ts, id) so ties at ts resolve by the
        # window order (ADVICE r2: ts-only comparison picked up markers
        # that sort AFTER the target by event_id)
        s_key, s_ts, s_id = [], [], []
        for k in {keys[0], keys[-1]}:
            mask = (keys == k) & is_marker
            if mask.any():
                last = int(np.flatnonzero(mask)[-1])  # positionally last = max (ts, id)
                s_key.append(k)
                s_ts.append(int(ts[last]))
                s_id.append(ids[last])
        if s_key:
            parts.append(
                pa.table(
                    {
                        "kind": pa.array(["summary"] * len(s_key), pa.string()),
                        id_col: pa.array(s_id, id_type),
                        key_col: pa.array(s_key, key_type),
                        ts_col: pa.array(s_ts, pa.int64()).cast(pa.timestamp("us")),
                        out_col: pa.array(s_ts, pa.int64()).cast(pa.timestamp("us")),
                    }
                )
            )
        return pa.concat_tables(parts)

    from .fastagg import drop_empty_blocks
    from ..state.broadcast import broadcast, state_key, task_state

    mid = (
        ds.sort([key_col, ts_col, id_col])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    # summary table is block-count-bounded (≤ 2 rows per sorted block): the
    # only state small enough to broadcast, and all a pending row needs
    summ_tbl = pa.concat_tables(
        [
            b
            for b in mid.map_batches(
                lambda t: t.filter(pc.equal(t.column("kind"), "summary"))
                if t.num_columns
                else MID_SCHEMA.empty_table(),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        or [MID_SCHEMA.empty_table()]
    )
    summ_ref = broadcast(
        summ_tbl.select([key_col, ts_col, id_col]).sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
    )

    def _summ_index(ref):
        """Per-worker memo: key → (marker_ts int64 asc, marker_id asc-within-ts)."""
        tbl = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        sts = pc.cast(
            pc.cast(tbl.column(ts_col), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        sids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        idx: dict = {}
        if len(keys):
            bounds = np.flatnonzero(
                np.concatenate(([True], keys[1:] != keys[:-1], [True]))
            )
            for a, b in zip(bounds[:-1], bounds[1:]):
                idx[keys[a]] = (sts[a:b], sids[a:b])
        return idx

    def resolve(t: pa.Table) -> pa.Table:
        """Finals pass through; pendings resolve against broadcast summaries:
        max marker ts among markers with (ts, id) strictly before the target
        in window order. Vectorized per edge key (≤ 2 keys per block)."""
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        finals = t.filter(pc.equal(t.column("kind"), "final")).select(
            [id_col, key_col, ts_col, out_col]
        )
        pend = t.filter(pc.equal(t.column("kind"), "pending"))
        if pend.num_rows == 0:
            return finals
        index = task_state(state_key("asof_summ", summ_ref), lambda: _summ_index(summ_ref))
        keys = pend.column(key_col).to_numpy(zero_copy_only=False)
        ts = pc.cast(
            pc.cast(pend.column(ts_col), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        ids = pend.column(id_col).to_numpy(zero_copy_only=False)
        ans = np.full(len(keys), gap_na, dtype=np.int64)
        for k in np.unique(keys):
            entry = index.get(k)
            if entry is None:
                continue
            sts, sids = entry
            m = keys == k
            t_k, i_k = ts[m], ids[m]
            lo = np.searchsorted(sts, t_k, side="left")   # markers with ts <  target
            hi = np.searchsorted(sts, t_k, side="right")  # markers with ts <= target
            # tie run [lo, hi): ids ascending, so a tie qualifies iff the
            # run's FIRST id < target id
            has_tie = (hi > lo) & (sids[np.minimum(lo, len(sts) - 1)] < i_k)
            a = np.where(
                has_tie, t_k, np.where(lo > 0, sts[np.maximum(lo - 1, 0)], gap_na)
            )
            ans[m] = a
        out_arr = pa.array(ans, pa.int64(), mask=(ans == gap_na)).cast(
            pa.timestamp("us")
        )
        resolved = pa.table(
            {
                id_col: pend.column(id_col),
                key_col: pend.column(key_col),
                ts_col: pc.cast(pend.column(ts_col), pa.timestamp("us")),
                out_col: out_arr,
            }
        )
        return pa.concat_tables([finals.cast(OUT_SCHEMA), resolved.cast(OUT_SCHEMA)])

    return drop_empty_blocks(
        mid.map_batches(resolve, batch_format="pyarrow", batch_size=None), OUT_SCHEMA
    )


# ------------------------------------------------------- hopping windows


def _hop_explode_fn(
    batch: pa.Table, ts_col: str, window_us: int, hop_us: int
) -> pa.Table:
    """Each event lands in exactly window/hop overlapping hopping windows;
    emit one copy per window_start. The fan-out constant k = window/hop is
    small (e.g. 4 for 1h/15min), so the loop is over k shifted COPIES —
    each iteration fully vectorized — never over rows."""
    k = window_us // hop_us
    # normalize to µs FIRST (pandas-backed inputs arrive as timestamp[ns])
    us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")), pa.int64())
    # floor division so pre-epoch events align to the same hop grid as the
    # oracle's floor-based window math
    base = pc.multiply(floor_div_i64(us, hop_us), pa.scalar(hop_us, pa.int64()))
    parts = []
    for j in range(k):
        ws = pc.subtract(base, pa.scalar(j * hop_us, pa.int64()))
        parts.append(
            batch.append_column("window_start", pc.cast(ws, pa.timestamp("us")))
        )
    return pa.concat_tables(parts)


def hopping_window_agg(
    events: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str]],
    ts_col: str = "ts",
    window_s: int = 3600,
    hop_s: int = 900,
    out_names: list[str] | None = None,
) -> "ray.data.Dataset":
    """Hopping (sliding) window aggregate: per (keys…, window_start) over
    windows of ``window_s`` seconds advancing every ``hop_s`` (tumbling when
    window == hop). The reference has no stream windows (SURVEY.md §2.10 —
    its closest shape is the per-experiment timepoint rollup); this is the
    windowed aggregate a monitoring/training-data pipeline needs.

    Scale shape: the window assignment is a k = window/hop constant fan-out
    inside map_batches (an event at t belongs to every window starting in
    (t - window, t], i.e. exactly k hop-aligned starts), then ONE
    Arrow-native grouped aggregation (fastagg sample-sort; no per-group
    Python). Skew rides the existing fastagg partial-combine: per-batch
    group_by collapses each (key, window) to one partial row before the
    shuffle, so a hot key costs bandwidth proportional to its distinct
    windows, not its events.
    """
    if window_s % hop_s != 0:
        raise ValueError("window_s must be a multiple of hop_s")
    from .fastagg import sorted_grouped_agg

    exploded = events.map_batches(
        _hop_explode_fn,
        fn_kwargs={
            "ts_col": ts_col,
            "window_us": window_s * 1_000_000,
            "hop_us": hop_s * 1_000_000,
        },
        batch_format="pyarrow",
    )
    return sorted_grouped_agg(
        exploded, list(keys) + ["window_start"], aggs, out_names=out_names
    )


def cohort_retention(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> "ray.data.Dataset":
    """Cohort retention: (cohort_ym, month_offset, n_users) — users grouped
    by the calendar month of their FIRST event, counted once per month they
    were active, keyed by months-since-cohort. The standard product-
    analytics rollup; everything is integer month arithmetic
    (ym = year·12 + month) so the DuckDB twin matches bit-for-bit.

    Scale shape: per-row month ints are a stateless map; first-month per
    user and the distinct (user, month) activity set both run through
    fastagg / sorted_distinct (user-cardinality groups, hot users collapse
    in per-batch combiners); cohort attaches via one distributed hash join
    (both sides user-cardinality — no broadcast of a data-proportional
    side); the final count is distinct-row fastagg."""
    from .fastagg import drop_empty_blocks, sorted_distinct, sorted_grouped_agg
    from .joins import hash_join

    YM = pa.schema([("u", pa.int64()), ("ym", pa.int64())])

    def months(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return YM.empty_table()
        ts = t.column(ts_col)
        ym = pc.add(
            pc.multiply(pc.cast(pc.year(ts), pa.int64()), 12),
            pc.cast(pc.month(ts), pa.int64()),
        )
        return pa.table({"u": pc.cast(t.column(user_col), pa.int64()), "ym": ym})

    monthly = sorted_distinct(
        events.map_batches(months, batch_format="pyarrow"), ["u", "ym"]
    ).materialize()  # consumed twice: cohort min + activity join

    cohort = sorted_grouped_agg(
        monthly, ["u"], [("ym", "min")], out_names=["cohort_ym"]
    )
    joined = hash_join(
        drop_empty_blocks(monthly), drop_empty_blocks(cohort), on=("u",)
    )

    def offs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [
                    ("cohort_ym", pa.int64()),
                    ("month_offset", pa.int64()),
                    ("_one", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "cohort_ym": t.column("cohort_ym"),
                "month_offset": pc.subtract(t.column("ym"), t.column("cohort_ym")),
                "_one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    return sorted_grouped_agg(
        joined.map_batches(offs, batch_format="pyarrow"),
        ["cohort_ym", "month_offset"],
        [("_one", "sum")],
        out_names=["n_users"],
    )


def event_transitions(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Event-type transition counts: (prev_type, event_type, n) over each
    user's (ts, event_id)-ordered stream — the behavioral bigram / Markov-
    transition census (and the same shape as corpus token-bigram counting).
    Rides ``window.lag_over``'s hot-key-safe segmented scan: a user with a
    billion events never lands in one task.

    The low-cardinality type codebook is collected once (event-type count is
    schema-bounded, not data-proportional) and broadcast as int codes so the
    lag scan stays on int64 columns end to end."""
    from .fastagg import sorted_grouped_agg
    from .window import lag_over

    types: set[str] = set()
    for bt in (
        events.select_columns(["event_type"])
        .map_batches(
            lambda t: pa.table({"event_type": pc.unique(t.column("event_type"))})
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        if bt.num_rows:
            types.update(bt.column("event_type").to_pylist())
    codebook = pa.array(sorted(types), pa.string())

    def encode(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("event_id", pa.int64()),
                    ("ts_us", pa.int64()),
                    ("code", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "ts_us": pc.cast(
                    pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
                ),
                "code": pc.cast(
                    pc.index_in(t.column("event_type"), value_set=codebook),
                    pa.int64(),
                ),
            }
        )

    lagged = lag_over(
        events.map_batches(encode, batch_format="pyarrow"),
        "user_id",
        ["ts_us", "event_id"],
        "code",
        out_col="prev_code",
    )
    pairs = lagged.map_batches(
        lambda t: pa.table(
            {
                "prev_code": t.column("prev_code"),
                "code": t.column("code"),
                "_one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ).filter(pc.is_valid(t.column("prev_code")))
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )
    counts = sorted_grouped_agg(
        pairs, ["prev_code", "code"], [("_one", "sum")], out_names=["n"]
    )

    def decode(t: pa.Table) -> pa.Table:
        OUT = pa.schema(
            [
                ("prev_type", pa.string()),
                ("event_type", pa.string()),
                ("n", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        return pa.table(
            {
                "prev_type": codebook.take(t.column("prev_code")),
                "event_type": codebook.take(t.column("code")),
                "n": t.column("n"),
            }
        ).cast(OUT)

    return counts.map_batches(decode, batch_format="pyarrow")


def funnel_2step(
    events: "ray.data.Dataset", type_a: str, type_b: str
) -> "ray.data.Dataset":
    """Two-step funnel: users whose FIRST ``type_a`` event is later followed
    by any ``type_b`` event. One summary row (n_a, n_ab, conv_ppm) with
    integer-ppm conversion — the product-analytics counterpart of the
    decontamination overlap report.

    Scale shape: first-A per user via fastagg min; the B stream joins on
    user_id (distributed hash join, both sides user/event-proportional — no
    broadcast of a data-proportional side); post-join filter + distinct +
    two tiny count reductions. No driver state beyond two scalars."""
    from .fastagg import drop_empty_blocks, sorted_distinct, sorted_grouped_agg
    from .joins import hash_join

    def pick(t: pa.Table, typ: str) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("u", pa.int64()), ("ts_us", pa.int64())]
            ).empty_table()
        sub = t.filter(pc.equal(t.column("event_type"), typ))
        return pa.table(
            {
                "u": pc.cast(sub.column("user_id"), pa.int64()),
                "ts_us": pc.cast(
                    pc.cast(sub.column("ts"), pa.timestamp("us")), pa.int64()
                ),
            }
        )

    ev = events.materialize()  # consumed twice (A and B streams)
    first_a = sorted_grouped_agg(
        ev.map_batches(lambda t: pick(t, type_a), batch_format="pyarrow"),
        ["u"],
        [("ts_us", "min")],
        out_names=["ta"],
    ).materialize()  # consumed twice: count + join

    def _count(ds) -> int:
        tot = 0
        for bt in ds.map_batches(
            lambda t: pa.table({"c": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            if bt.num_rows:
                tot += int(pc.sum(bt.column("c")).as_py() or 0)
        return tot

    n_a = _count(first_a)
    b_rows = ev.map_batches(lambda t: pick(t, type_b), batch_format="pyarrow")
    joined = hash_join(drop_empty_blocks(b_rows), drop_empty_blocks(first_a), on=("u",))
    converted = sorted_distinct(
        joined.map_batches(
            lambda t: t.filter(
                pc.greater(t.column("ts_us"), t.column("ta"))
            ).select(["u"])
            if t.num_columns
            else t,
            batch_format="pyarrow",
        ),
        ["u"],
    )
    n_ab = _count(converted)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_a": pa.array([n_a], pa.int64()),
                "n_ab": pa.array([n_ab], pa.int64()),
                "conv_ppm": pa.array([(n_ab * 1_000_000) // max(n_a, 1)], pa.int64()),
            }
        )
    )


def debounce_events(
    events: "ray.data.Dataset", gap_us: int
) -> "ray.data.Dataset":
    """Windowed dedup ("debounce"): drop an event when the SAME
    (user, event_type) fired within the trailing ``gap_us`` microseconds —
    the streaming-ingest repeat-suppression every event pipeline needs
    (double-clicks, retry storms, duplicated webhooks). Emits the surviving
    (event_id, user_id, event_type, ts) rows.

    Rides ``window.lag_over``'s segmented scan on a composite
    (user|type) partition key — hot users never land one task; the
    comparison is pure int64 µs arithmetic, so the DuckDB lag() twin
    matches row-for-row. Note the window is RELATIVE TO THE PREVIOUS KEPT-
    OR-DROPPED event (standard lag semantics, what DuckDB expresses), not a
    chain-collapsing session merge — ``sessionize`` is the chain variant."""
    from .window import lag_over

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("ts", pa.timestamp("us")),
                    ("_part", pa.string()),
                    ("ts_us", pa.int64()),
                ]
            ).empty_table()
        part = pc.binary_join_element_wise(
            pc.cast(t.column("user_id"), pa.string()),
            t.column("event_type"),
            "|",
        )
        return pa.table(
            {
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "event_type": t.column("event_type"),
                "ts": pc.cast(t.column("ts"), pa.timestamp("us")),
                "_part": part,
                "ts_us": pc.cast(
                    pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
                ),
            }
        )

    lagged = lag_over(
        events.map_batches(prep, batch_format="pyarrow"),
        "_part",
        ["ts_us", "event_id"],
        "ts_us",
        out_col="_prev",
    )

    def keep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("ts", pa.timestamp("us")),
                ]
            ).empty_table()
        prev = t.column("_prev")
        gap_ok = pc.greater(
            pc.subtract(t.column("ts_us"), pc.fill_null(prev, 0)), gap_us
        )
        mask = pc.or_(pc.is_null(prev), gap_ok)
        return t.filter(mask).select(
            ["event_id", "user_id", "event_type", "ts"]
        )

    return lagged.map_batches(keep, batch_format="pyarrow")


def coalesce_intervals(
    ds: "ray.data.Dataset",
    part_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    out_islands: str = "n_islands",
    out_covered: str = "covered_us",
    out_count: str = "n_intervals",
) -> "ray.data.Dataset":
    """Interval union per key (gaps-and-islands coalescing): merge every
    overlapping-or-touching ``[start, end)`` interval of a key into islands
    and emit one row per key with the island count, the total covered
    microseconds (the union length, overlaps counted ONCE), and the raw
    interval count — the availability/coverage rollup behind session
    merging, SLA windows, and GFF feature-span consolidation (reference
    computes feature overlap spans in single-process pandas,
    ``omics_adapter.py`` interval handling).

    Algorithm: with intervals sorted by (start, end, id) within a key, an
    interval opens a NEW island iff its start exceeds the EXCLUSIVE running
    max of all earlier ends, and its novel coverage is
    ``max(0, end - max(start, running_max))`` — so the whole problem
    reduces to ``window.cummax_over``'s segmented scan (hot keys bounded by
    their sorted-block share) plus per-row vectorized arithmetic and one
    fastagg rollup. Pure int64 throughout: bit-exact vs the DuckDB
    ``max(e) OVER (... ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``
    twin at any parallelism.

    Precondition: ``(start, end, id)`` tuples unique within a key (``id_col``
    is the tiebreaker — equal-start ties merge identically under any tie
    order, because start <= previous start implies start <= running max).
    """
    from .fastagg import sorted_grouped_agg
    from .window import cummax_over

    part_type = dict(zip(ds.schema().names, ds.schema().types))[part_col]
    w = cummax_over(ds, part_col, [start_col, end_col, id_col], end_col, out_col="_pmax")
    MID = pa.schema(
        [(part_col, part_type), ("_flag", pa.int64()), ("_cov", pa.int64())]
    )

    def contrib(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        s = t.column(start_col).to_numpy(zero_copy_only=False).astype(np.int64)
        e = t.column(end_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pmax = t.column("_pmax")
        isnull = np.asarray(pc.is_null(pmax).combine_chunks())
        pm = (
            pc.fill_null(pmax, np.iinfo(np.int64).min)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flag = (isnull | (s > pm)).astype(np.int64)
        base = np.maximum(s, pm)  # null carry -> int64 min -> base = s
        cov = np.maximum(e - base, 0)
        return pa.Table.from_arrays(
            [t.column(part_col), pa.array(flag, pa.int64()), pa.array(cov, pa.int64())],
            schema=MID,
        )

    return sorted_grouped_agg(
        w.map_batches(contrib, batch_format="pyarrow"),
        [part_col],
        [("_flag", "sum"), ("_cov", "sum"), ("_flag", "count")],
        out_names=[out_islands, out_covered, out_count],
    )


def scd2_intervals(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    id_col: str,
    attr_col: str,
) -> "ray.data.Dataset":
    """Slowly-changing-dimension (type 2) history build: collapse an event
    stream to its CHANGE POINTS per key and emit validity intervals
    ``(key, attr, valid_from, valid_to)`` with half-open [from, to) and a
    NULL ``valid_to`` on each key's current value — the dimension-table
    reconstruction every warehouse ingest runs over a mutation log.

    Change detection compares each attr to its predecessor through the
    60-bit md5 projection ``sampling._hash60`` (DuckDB-vectorized, and the
    SQL twin lags the IDENTICAL expression, so both engines agree even on
    the 2⁻⁶⁰ collision event — bit-parity by construction, no string-lag
    kernel needed). Two segmented scans total: one ``lag_over`` for change
    points over the full stream, one ``lead_over`` for interval ends over
    the (much smaller) change-point subset. Hot keys bounded by their
    sorted-block share both times."""
    from ..stages.sampling import _hash60
    from .window import lag_over, lead_over

    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    MID = pa.schema(
        [
            (key_col, typ[key_col]),
            (attr_col, typ[attr_col]),
            ("_ts_us", pa.int64()),
            (id_col, typ[id_col]),
            ("_h", pa.int64()),
        ]
    )

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        h = _hash60(t.column(attr_col), "scd2")
        return pa.Table.from_arrays(
            [
                t.column(key_col),
                t.column(attr_col),
                pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()),
                t.column(id_col),
                pa.array(h, pa.int64()),
            ],
            schema=MID,
        )

    lagged = lag_over(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col,
        ["_ts_us", id_col],
        "_h",
        out_col="_ph",
    )

    def change_points(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        ph = t.column("_ph")
        keep = pc.or_(
            pc.is_null(ph), pc.invert(pc.equal(ph, t.column("_h")))
        )
        return t.filter(pc.fill_null(keep, True)).select(MID.names)

    changes = lagged.map_batches(change_points, batch_format="pyarrow")
    ended = lead_over(
        changes, key_col, ["_ts_us", id_col], "_ts_us", out_col="_vt"
    )
    OUT = pa.schema(
        [
            (key_col, typ[key_col]),
            (attr_col, typ[attr_col]),
            ("valid_from", pa.timestamp("us")),
            ("valid_to", pa.timestamp("us")),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        return pa.Table.from_arrays(
            [
                t.column(key_col),
                t.column(attr_col),
                pc.cast(t.column("_ts_us"), pa.timestamp("us")),
                pc.cast(t.column("_vt"), pa.timestamp("us")),
            ],
            schema=OUT,
        )

    return ended.map_batches(finish, batch_format="pyarrow")


def point_in_time_join(
    points: "ray.data.Dataset",
    versions: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    out_col: str = "val_at_ts",
) -> "ray.data.Dataset":
    """Point-in-time join of an event stream against an SCD2 change-point
    table: every point row gets the version value whose half-open
    ``[valid_from, next valid_from)`` interval contains its ts — the
    dimension-as-of-fact-time lookup every warehouse query layer runs
    against a type-2 history (compose with ``scd2_intervals``; the SQL twin
    is the textbook ``ts >= valid_from AND (valid_to IS NULL OR ts <
    valid_to)`` interval join).

    ``versions`` columns: (key_col, ts_col = valid_from, val_col).
    PRECONDITION: (key, valid_from) is unique in ``versions`` —
    ``scd2_intervals`` over a (key, ts)-deduplicated mutation log guarantees
    it; duplicates would make the interval join itself ambiguous. Tie rule
    is ts-only (a version starting exactly AT the point's ts applies),
    matching the half-open SQL semantics. Points before their key's first
    version emit a NULL ``out_col``.

    HOT-KEY-SAFE segmented scan (the ``asof_last_marker`` shape): union the
    two streams, one global sort on (key, ts, kind) with versions ordered
    before points at equal ts, per-block vectorized carry-forward of the
    last version VALUE. Interior keys resolve entirely in-block (including
    the legitimate-NULL case); a block-edge point preceding its block's
    first version is PENDING and resolves DISTRIBUTED against a broadcast
    summary table carrying each block's positionally-last version per edge
    key (≤ 2 rows/block — block-count-bounded, never data-bounded), found
    by one searchsorted on the summary ts run. No single-task funnel at any
    key skew."""
    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import drop_empty_blocks

    def _pa_type(t):
        # pandas-backed datasets report numpy dtypes; normalize to Arrow
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()  # object dtype → string

    psch = points.schema()
    vsch = versions.schema()
    key_type = _pa_type(dict(zip(psch.names, psch.types))[key_col])
    id_type = _pa_type(dict(zip(psch.names, psch.types))[id_col])
    val_type = _pa_type(dict(zip(vsch.names, vsch.types))[val_col])

    MID = pa.schema(
        [
            (key_col, key_type),
            ("_ts_us", pa.int64()),
            ("_kind", pa.int8()),  # 0 = version, 1 = point
            (id_col, id_type),
            (val_col, val_type),
        ]
    )

    def prep_points(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                t.column(key_col),
                pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()),
                pa.array(np.ones(n, dtype=np.int8), pa.int8()),
                t.column(id_col),
                pa.nulls(n, val_type),
            ],
            schema=MID,
        )

    def prep_versions(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                t.column(key_col),
                pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()),
                pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
                pa.nulls(n, id_type),
                t.column(val_col),
            ],
            schema=MID,
        )

    stream = points.map_batches(prep_points, batch_format="pyarrow").union(
        versions.map_batches(prep_versions, batch_format="pyarrow")
    )

    OUT = pa.schema(
        [
            (id_col, id_type),
            (key_col, key_type),
            (ts_col, pa.timestamp("us")),
            (out_col, val_type),
        ]
    )
    SCAN = pa.schema(
        [
            ("_tag", pa.int8()),  # 0 final | 1 pending | 2 summary
            (id_col, id_type),
            (key_col, key_type),
            ("_ts_us", pa.int64()),
            (val_col, val_type),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return SCAN.empty_table()
        t = t.combine_chunks()
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        ts = t.column("_ts_us").to_numpy(zero_copy_only=False)
        kind = t.column("_kind").to_numpy(zero_copy_only=False)
        n = len(keys)
        is_ver = kind == 0
        pos = np.where(is_ver, np.arange(n), -1)
        last_ver = np.maximum.accumulate(pos)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        valid = last_ver >= key_start
        is_edge = (keys == keys[0]) | (keys == keys[-1])
        is_point = ~is_ver

        vals = t.column(val_col)

        def emit(mask: np.ndarray, tag: int, carry: bool) -> pa.Table:
            idx = np.flatnonzero(mask)
            src = last_ver[idx]
            v_idx = pa.array(
                src,
                pa.int64(),
                mask=(~valid[idx]) if carry else np.ones(len(idx), bool),
            )
            return pa.Table.from_arrays(
                [
                    pa.array(np.full(len(idx), tag, dtype=np.int8), pa.int8()),
                    t.column(id_col).take(pa.array(idx)),
                    t.column(key_col).take(pa.array(idx)),
                    pa.array(ts[idx], pa.int64()),
                    vals.take(v_idx),
                ],
                schema=SCAN,
            )

        parts = [
            emit(is_point & (valid | ~is_edge), 0, True),
            emit(is_point & ~valid & is_edge, 1, False),
        ]
        # one summary per edge key: the block's positionally-last version
        s_idx = []
        for k in {keys[0], keys[-1]}:
            m = (keys == k) & is_ver
            if m.any():
                s_idx.append(int(np.flatnonzero(m)[-1]))
        if s_idx:
            si = np.asarray(s_idx, dtype=np.int64)
            parts.append(
                pa.Table.from_arrays(
                    [
                        pa.array(np.full(len(si), 2, dtype=np.int8), pa.int8()),
                        pa.nulls(len(si), id_type),
                        t.column(key_col).take(pa.array(si)),
                        pa.array(ts[si], pa.int64()),
                        vals.take(pa.array(si)),
                    ],
                    schema=SCAN,
                )
            )
        return pa.concat_tables(parts)

    mid = (
        stream.sort([key_col, "_ts_us", "_kind"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    summ_tbl = pa.concat_tables(
        [
            b
            for b in mid.map_batches(
                lambda t: t.filter(pc.equal(t.column("_tag"), 2))
                if t.num_columns
                else SCAN.empty_table(),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        or [SCAN.empty_table()]
    )
    summ_ref = broadcast(
        summ_tbl.select([key_col, "_ts_us", val_col]).sort_by(
            [(key_col, "ascending"), ("_ts_us", "ascending")]
        )
    )

    def _summ_index(ref):
        tbl = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        sts = tbl.column("_ts_us").to_numpy(zero_copy_only=False)
        idx: dict = {}
        if len(keys):
            bounds = np.flatnonzero(
                np.concatenate(([True], keys[1:] != keys[:-1], [True]))
            )
            for a, b in zip(bounds[:-1], bounds[1:]):
                idx[keys[a]] = (sts[a:b], int(a))
        return idx, tbl.column(val_col)

    def resolve(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()

        def fin(sub: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [
                    sub.column(id_col),
                    sub.column(key_col),
                    pc.cast(sub.column("_ts_us"), pa.timestamp("us")),
                    sub.column(val_col),
                ],
                schema=OUT,
            )

        finals = fin(t.filter(pc.equal(t.column("_tag"), 0)))
        pend = t.filter(pc.equal(t.column("_tag"), 1))
        if pend.num_rows == 0:
            return finals
        index, all_vals = task_state(
            state_key("pit_summ", summ_ref), lambda: _summ_index(summ_ref)
        )
        keys = pend.column(key_col).to_numpy(zero_copy_only=False)
        ts = pend.column("_ts_us").to_numpy(zero_copy_only=False)
        take_idx = np.full(len(keys), -1, dtype=np.int64)
        for k in np.unique(keys):
            entry = index.get(k)
            if entry is None:
                continue
            sts, base = entry
            m = keys == k
            # latest version with ts <= point ts (version ts unique per key)
            j = np.searchsorted(sts, ts[m], side="right") - 1
            take_idx[m] = np.where(j >= 0, base + j, -1)
        v = all_vals.take(pa.array(take_idx, pa.int64(), mask=(take_idx < 0)))
        resolved = pa.Table.from_arrays(
            [
                pend.column(id_col),
                pend.column(key_col),
                pc.cast(pend.column("_ts_us"), pa.timestamp("us")),
                v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v,
            ],
            schema=OUT,
        )
        return pa.concat_tables([finals, resolved])

    return drop_empty_blocks(
        mid.map_batches(resolve, batch_format="pyarrow", batch_size=None), OUT
    )


def hopping_distinct_count(
    events: "ray.data.Dataset",
    keys: list[str],
    distinct_col: str,
    ts_col: str = "ts",
    window_s: int = 3600,
    hop_s: int = 900,
    out_col: str = "n_distinct",
) -> "ray.data.Dataset":
    """COUNT(DISTINCT x) per (keys…, hopping window) — the rolling-unique
    metric (e.g. hourly active users every 15 min) a monitoring pipeline
    reads next to ``hopping_window_agg``'s plain counts.

    Scale shape: the same constant k = window/hop fan-out as
    ``hopping_window_agg``, then exact distinct via ``sorted_distinct``
    (per-batch C++ group_by collapses each batch's repeats BEFORE the
    shuffle — a hot (key, window) costs bandwidth proportional to its
    distinct members per batch, not its events) and one fastagg count over
    the deduplicated rows. Two sample-sort waves total; no per-group
    Python, no driver state."""
    if window_s % hop_s != 0:
        raise ValueError("window_s must be a multiple of hop_s")
    from .fastagg import sorted_distinct, sorted_grouped_agg

    exploded = events.map_batches(
        _hop_explode_fn,
        fn_kwargs={
            "ts_col": ts_col,
            "window_us": window_s * 1_000_000,
            "hop_us": hop_s * 1_000_000,
        },
        batch_format="pyarrow",
    ).select_columns(list(keys) + ["window_start", distinct_col])
    uniq = sorted_distinct(exploded, list(keys) + ["window_start", distinct_col])
    return sorted_grouped_agg(
        uniq,
        list(keys) + ["window_start"],
        [(distinct_col, "count")],
        out_names=[out_col],
    )


def session_concurrency(
    sessions: "ray.data.Dataset",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> "pa.Table":
    """Peak number of simultaneously-open sessions (interval stabbing by
    endpoint sweep) — ONE row ``(n_sessions, peak, at_us)`` where peak is
    the maximum concurrency ever reached and at_us the EARLIEST µs instant
    reaching it. The capacity-planning readout (max simultaneous users /
    connections / jobs) over any interval table, here ``sessionize``
    output; intervals are closed [start, end].

    Shape: each interval becomes two delta rows (+1 at start_us, −1 at
    end_us+1 — so a session ending at t still overlaps one starting at t),
    deltas pre-aggregate per distinct instant (fastagg — concurrency only
    changes at endpoints, so the sweep stream is endpoint-cardinality, not
    time-cardinality), then ONE global segmented inclusive cumsum in time
    order gives the concurrency after every instant. The peak is an O(1)
    scalar; at_us is a distributed filter + min. No per-row Python, no
    whole-timeline task: the single sweep "group" is exactly the segmented
    scan's hot-part case (per-block compiled scan + block-count-bounded
    carry). Reference analog: the overlap audits of SURVEY.md §2.5 over
    experiment time ranges."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .window import cumsum_over

    EP = pa.schema([("_t", pa.int64()), ("_d", pa.int64())])

    def endpoints(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return EP.empty_table()
        s = (
            pc.cast(pc.cast(t.column(start_col), pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        e = (
            pc.cast(pc.cast(t.column(end_col), pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([s, e + 1]), pa.int64()),
                pa.array(
                    np.concatenate([np.ones(n, np.int64), -np.ones(n, np.int64)])
                ),
            ],
            schema=EP,
        )

    eps = sorted_grouped_agg(
        sessions.select_columns([start_col, end_col]).map_batches(
            endpoints, batch_format="pyarrow"
        ),
        ["_t"],
        [("_d", "count"), ("_d", "sum")],
        out_names=["_c", "_d"],
    )
    cum = cumsum_over(
        eps.map_batches(
            lambda t: t.append_column(
                "_g", pa.array(np.zeros(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
        ),
        "_g",
        ["_t"],
        "_d",
        out_col="_cur",
    ).materialize()  # consumed twice: peak scalar + earliest-instant filter

    n_sessions, peak = 0, 0
    agg = sorted_grouped_agg(
        cum, ["_g"], [("_c", "sum"), ("_cur", "max")], out_names=["_n", "_p"]
    )
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_columns and b.num_rows:
            n_sessions = int(b.column("_n")[0].as_py()) // 2
            peak = int(b.column("_p")[0].as_py())
    at_us = None
    AT = pa.schema([("_g", pa.int64()), ("_t", pa.int64())])

    def at_peak(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return AT.empty_table()
        sel = t.filter(pc.equal(t.column("_cur"), peak))
        return pa.Table.from_arrays(
            [sel.column("_g"), sel.column("_t")], schema=AT
        )

    first = sorted_grouped_agg(
        drop_empty_blocks(
            cum.map_batches(at_peak, batch_format="pyarrow"), AT
        ),
        ["_g"],
        [("_t", "min")],
        out_names=["_at"],
    )
    for b in first.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_columns and b.num_rows:
            at_us = int(b.column("_at")[0].as_py())
    return pa.table(
        {
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "peak": pa.array([peak], pa.int64()),
            "at_us": pa.array([at_us], pa.int64()),
        }
    )


def survival_km(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    unit_us: int = 86_400_000_000,
    censor_units: int = 7,
    quantum: int = 1_000_000,
) -> "ray.data.Dataset":
    """Kaplan-Meier product-limit survival of entity LIFETIMES (days from
    first to last observed event), with right-censoring: an entity whose
    last event falls within ``censor_units`` (in ``unit_us`` time units) of the corpus max timestamp is
    CENSORED (still alive at observation end), not dead — the estimator
    retention/churn dashboards need, where naive "empirical survival"
    over-counts churn for recently-active users. Durations are measured
    in ``unit_us`` microsecond units (days by default; pass hours for a
    dense always-on corpus). One row per distinct
    death duration: ``(dur, n_risk, n_died, log_surv_e6)`` with
    log_surv_e6 = Σ_{d'≤d} floor(ln((n_r−n_d)/n_r)·10⁶) — the KM product
    carried in per-step-quantized micro-nat log space (the ``contingency_mi``
    discipline: quantize each pointwise log FIRST, sum exactly), so the
    running product is bit-stable across engines; survival itself is
    exp(log_surv_e6/1e6). NULL on the (necessarily last) row where the
    risk set dies out entirely.

    Tie convention: deaths precede censors at the same duration (the
    standard KM rule) — censored entities leave the risk set AFTER the
    deaths at their duration are counted, which the exclusive cumsum over
    (deaths+censored) per strictly-smaller duration encodes exactly.

    Scale shape: one entity-cardinality fastagg (min/max ts per key), one
    O(1) corpus-max scalar, one duration-cardinality fastagg, one global
    segmented cumsum over the duration axis (duration-cardinality ≪ row
    count), one vectorized finalize. No driver loops, no per-group Python."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .window import cumsum_over

    typ = dict(zip(events.schema().names, events.schema().types))
    PREP = pa.schema([(key_col, typ[key_col]), ("_t", pa.int64())])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return PREP.empty_table()
        return pa.Table.from_arrays(
            [
                t.column(key_col),
                pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()),
            ],
            schema=PREP,
        )

    lives = sorted_grouped_agg(
        events.select_columns([key_col, ts_col]).map_batches(
            prep, batch_format="pyarrow"
        ),
        [key_col],
        [("_t", "min"), ("_t", "max")],
        out_names=["_f", "_l"],
    ).materialize()  # consumed twice: corpus-max scalar + lifetime map

    corpus_max = 0
    mx = sorted_grouped_agg(
        lives.map_batches(
            lambda t: t.append_column(
                "_g", pa.array(np.zeros(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
        ),
        ["_g"],
        [("_l", "max")],
        out_names=["_m"],
    )
    for b in mx.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_columns and b.num_rows:
            corpus_max = int(b.column("_m")[0].as_py())

    LT = pa.schema([("_dur", pa.int64()), ("_died", pa.int64())])

    def lifetime(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return LT.empty_table()
        f = t.column("_f").to_numpy(zero_copy_only=False).astype(np.int64)
        last = t.column("_l").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array((last - f) // unit_us, pa.int64()),
                pa.array(
                    (corpus_max - last >= censor_units * unit_us).astype(np.int64)
                ),
            ],
            schema=LT,
        )

    durs = sorted_grouped_agg(
        drop_empty_blocks(
            lives.map_batches(lifetime, batch_format="pyarrow"), LT
        ),
        ["_dur"],
        [("_died", "count"), ("_died", "sum")],
        out_names=["_tot", "_deaths"],
    )
    left = cumsum_over(
        durs.map_batches(
            lambda t: t.append_column(
                "_g", pa.array(np.zeros(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
        ),
        "_g",
        ["_dur"],
        "_tot",
        out_col="_gone",
        inclusive=False,
    )
    n_total = int(lives.count())

    STEP = pa.schema(
        [
            ("_g", pa.int64()),
            ("_dur", pa.int64()),
            ("_risk", pa.int64()),
            ("_deaths", pa.int64()),
            ("_step", pa.int64()),
            ("_zero", pa.bool_()),
        ]
    )

    def step(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return STEP.empty_table()
        deaths = t.column("_deaths").to_numpy(zero_copy_only=False).astype(np.int64)
        gone = t.column("_gone").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = deaths > 0
        risk = n_total - gone
        zero = risk <= deaths  # survival hits 0 → log −inf → NULL row
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.floor(
                np.log(
                    (risk - deaths).astype(np.float64) / risk.astype(np.float64)
                )
                * float(quantum)
            )
        s = np.where(zero, 0.0, s)
        out = pa.Table.from_arrays(
            [
                pa.array(np.zeros(len(deaths), np.int64)),
                t.column("_dur"),
                pa.array(risk, pa.int64()),
                pa.array(deaths, pa.int64()),
                pa.array(s.astype(np.int64), pa.int64()),
                pa.array(zero),
            ],
            schema=STEP,
        )
        return out.filter(pa.array(keep))

    cum = cumsum_over(
        drop_empty_blocks(left.map_batches(step, batch_format="pyarrow"), STEP),
        "_g",
        ["_dur"],
        "_step",
        out_col="_cum",
    )
    OUT = pa.schema(
        [
            ("dur", pa.int64()),
            ("n_risk", pa.int64()),
            ("n_died", pa.int64()),
            ("log_surv_e6", pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        zero = t.column("_zero").to_numpy(zero_copy_only=False)
        cumv = t.column("_cum").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t.column("_dur"),
                t.column("_risk"),
                t.column("_deaths"),
                pa.array(cumv, pa.int64(), mask=zero),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(cum.map_batches(finalize, batch_format="pyarrow"), OUT)


def longest_streak(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> "ray.data.Dataset":
    """Longest run of CONSECUTIVE active days per entity (gaps-and-islands
    at day grain): ``(key, n_active_days, longest_streak)`` — the
    engagement-streak metric behind retention dashboards. An "active day"
    is any calendar day (UTC, epoch-µs // 86400e6) with ≥ 1 event; a
    streak breaks when a full day passes with no activity.

    Shape: row stream collapses to DISTINCT (key, day) immediately (one
    fastagg — day-cardinality per key, never event-cardinality), then the
    hot-key-safe segmented lag scan marks island starts (day − prev > 1),
    a segmented cumsum numbers islands per key, and two fastaggs fold
    (key, island) → length → per-key max. Every stage is
    day-count-proportional; a user with 10⁹ events on 400 days costs the
    scan 400 rows. No per-group Python, no driver state."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .window import cumsum_over, lag_over

    typ = dict(zip(events.schema().names, events.schema().types))
    kt = typ[key_col]
    DAYS = pa.schema([(key_col, kt), ("_day", pa.int64())])

    def to_day(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return DAYS.empty_table()
        from ..arrow_util import floor_div_i64

        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64())
        return pa.Table.from_arrays(
            [t.column(key_col), floor_div_i64(us, 86_400_000_000)],
            schema=DAYS,
        )

    days = sorted_grouped_agg(
        events.select_columns([key_col, ts_col]).map_batches(
            to_day, batch_format="pyarrow"
        ),
        [key_col, "_day"],
        [("_day", "count")],
        out_names=["_c"],
    )
    lagged = lag_over(days, key_col, ["_day"], "_day", out_col="_prev")
    NEW = pa.schema(
        [(key_col, kt), ("_day", pa.int64()), ("_new", pa.int64())]
    )

    def mark(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return NEW.empty_table()
        day = t.column("_day").to_numpy(zero_copy_only=False).astype(np.float64)
        # lag nulls surface as NaN; day ordinals ≪ 2^53 so float compare is exact
        prev = t.column("_prev").to_numpy(zero_copy_only=False).astype(np.float64)
        isnew = (np.isnan(prev) | (day - prev > 1.0)).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column(key_col), t.column("_day"), pa.array(isnew, pa.int64())],
            schema=NEW,
        )

    isl = cumsum_over(
        drop_empty_blocks(lagged.map_batches(mark, batch_format="pyarrow"), NEW),
        key_col,
        ["_day"],
        "_new",
        out_col="_isl",
    )
    lens = sorted_grouped_agg(
        isl, [key_col, "_isl"], [("_day", "count")], out_names=["_len"]
    )
    agg = sorted_grouped_agg(
        lens,
        [key_col],
        [("_len", "sum"), ("_len", "max")],
        out_names=["n_active_days", "longest_streak"],
    )
    OUT = pa.schema(
        [
            (key_col, kt),
            ("n_active_days", pa.int64()),
            ("longest_streak", pa.int64()),
        ]
    )
    return drop_empty_blocks(
        agg.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column(key_col),
                    pc.cast(t.column("n_active_days"), pa.int64()),
                    pc.cast(t.column("longest_streak"), pa.int64()),
                ],
                schema=OUT,
            )
            if t.num_columns
            else OUT.empty_table(),
            batch_format="pyarrow",
        ),
        OUT,
    )


def funnel_ksteps(
    events: "ray.data.Dataset",
    steps: "list[str]",
    max_gap_s: "int | None" = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> "ray.data.Dataset":
    """K-step ORDERED funnel: one row per step ``(step_idx, step_type,
    n_users)`` — users whose first ``steps[0]`` is followed by a strictly
    later ``steps[1]``, which is followed by a strictly later ``steps[2]``,
    … taking each step's EARLIEST qualifying event as the anchor for the
    next (the greedy anchor is optimal here: an earlier anchor can only
    admit a superset of later completions). ``max_gap_s`` additionally
    requires each step to land within that window of the previous anchor —
    the attribution-window semantics real funnels use. Generalizes
    ``funnel_2step`` (k = 2, no gap, and that op also reports raw pair
    counts).

    Scale shape: one materialized pass over events, then per step ONE
    user-proportional hash join against the previous anchor table + ONE
    fastagg min — k small (funnel definitions are human-written), so the
    whole funnel is k joins over shrinking user sets. Step counts ride
    one-row per-batch partials into a single k-row fastagg; no driver-side
    counting, no broadcast of data-proportional state."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join

    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    gap_us = max_gap_s * 1_000_000 if max_gap_s is not None else None

    EV = pa.schema([("u", pa.int64()), ("ts_us", pa.int64())])

    def pick(t: pa.Table, typ: str) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return EV.empty_table()
        sub = t.filter(pc.equal(t.column(type_col), typ))
        return pa.Table.from_arrays(
            [
                pc.cast(sub.column(user_col), pa.int64()),
                pc.cast(
                    pc.cast(sub.column(ts_col), pa.timestamp("us")), pa.int64()
                ),
            ],
            schema=EV,
        )

    ev = events.select_columns([user_col, type_col, ts_col]).materialize()

    MID = pa.schema([("step_idx", pa.int64()), ("_n", pa.int64())])

    def counter(idx: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return MID.empty_table()
            return pa.Table.from_arrays(
                [pa.array([idx], pa.int64()), pa.array([t.num_rows], pa.int64())],
                schema=MID,
            )

        return fn

    count_parts = []
    anchor = None  # Dataset (u, anchor_ts)
    for i, st in enumerate(steps):
        stream = ev.map_batches(
            lambda t, typ=st: pick(t, typ), batch_format="pyarrow"
        )
        if i == 0:
            anchor = sorted_grouped_agg(
                stream, ["u"], [("ts_us", "min")], out_names=["anchor_ts"]
            )
        else:
            joined = hash_join(
                drop_empty_blocks(stream, EV),
                drop_empty_blocks(anchor),
                on=("u",),
            )
            ANC = pa.schema([("u", pa.int64()), ("ts_us", pa.int64())])

            def qualify(t: pa.Table) -> pa.Table:
                if t.num_columns == 0 or t.num_rows == 0:
                    return ANC.empty_table()
                keep = pc.greater(t.column("ts_us"), t.column("anchor_ts"))
                if gap_us is not None:
                    keep = pc.and_(
                        keep,
                        pc.less_equal(
                            t.column("ts_us"),
                            pc.add(
                                t.column("anchor_ts"),
                                pa.scalar(gap_us, pa.int64()),
                            ),
                        ),
                    )
                return t.filter(keep).select(["u", "ts_us"])

            anchor = sorted_grouped_agg(
                drop_empty_blocks(
                    joined.map_batches(qualify, batch_format="pyarrow"), ANC
                ),
                ["u"],
                [("ts_us", "min")],
                out_names=["anchor_ts"],
            )
        anchor = anchor.materialize()  # consumed by the count AND next join
        count_parts.append(
            anchor.map_batches(counter(i), batch_format="pyarrow")
        )

    parts = count_parts[0]
    for p in count_parts[1:]:
        parts = parts.union(p)
    # every step emits a row even with zero survivors: seed 0-count partials
    seed = pa.Table.from_arrays(
        [
            pa.array(list(range(len(steps))), pa.int64()),
            pa.array([0] * len(steps), pa.int64()),
        ],
        schema=MID,
    )
    parts = parts.union(ray.data.from_arrow(seed))
    agg = sorted_grouped_agg(
        drop_empty_blocks(parts, MID),
        ["step_idx"],
        [("_n", "sum")],
        out_names=["n_users"],
    )
    names = pa.array(list(steps), pa.string())
    OUT = pa.schema(
        [
            ("step_idx", pa.int64()),
            ("step_type", pa.string()),
            ("n_users", pa.int64()),
        ]
    )

    def label(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        idx = t.column("step_idx")
        return pa.Table.from_arrays(
            [idx, pc.take(names, idx.combine_chunks()), t.column("n_users")],
            schema=OUT,
        )

    return drop_empty_blocks(agg.map_batches(label, batch_format="pyarrow"), OUT)


def cohort_ltv(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Cohort LTV curve: per (cohort_ym, month_offset), distinct active
    users, that month's summed value (cents) and the RUNNING cumulative
    value — ``cohort_retention``'s revenue sibling and the classic
    lifetime-value table (how much has the March cohort spent by month 3).
    Integer month keys (ym = year·12 + month) and integer cents throughout,
    so the twin matches bit-for-bit.

    Scale shape: per-(user, month) value partials run through the per-batch
    combiner + fastagg path (hot users collapse before the shuffle); the
    cohort min attaches via one user-cardinality hash join; the final
    rollup is one (cohort × offset)-cardinality fastagg; the running sum
    rides ``window.cumsum_over``'s segmented scan (never a whole cohort in
    one task)."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join
    from .relational import to_cents
    from .window import cumsum_over

    YMV = pa.schema([("u", pa.int64()), ("ym", pa.int64()), ("v", pa.int64())])

    def months(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return YMV.empty_table()
        t = to_cents(t, {"value": "_cents"})
        ts = t.column("ts")
        ym = pc.add(
            pc.multiply(pc.cast(pc.year(ts), pa.int64()), 12),
            pc.cast(pc.month(ts), pa.int64()),
        )
        return pa.table(
            {
                "u": pc.cast(t.column("user_id"), pa.int64()),
                "ym": ym,
                "v": t.column("_cents"),
            }
        )

    mv = sorted_grouped_agg(
        drop_empty_blocks(
            events.map_batches(months, batch_format="pyarrow"), YMV
        ),
        ["u", "ym"],
        [("v", "sum")],
        out_names=["v"],
    ).materialize()  # consumed twice: cohort min + activity join

    cohort = sorted_grouped_agg(
        mv, ["u"], [("ym", "min")], out_names=["cohort_ym"]
    )
    joined = hash_join(
        drop_empty_blocks(mv), drop_empty_blocks(cohort), on=("u",)
    )

    MID = pa.schema(
        [
            ("cohort_ym", pa.int64()),
            ("month_offset", pa.int64()),
            ("_one", pa.int64()),
            ("v", pa.int64()),
        ]
    )

    def offs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        return pa.Table.from_arrays(
            [
                pc.cast(t.column("cohort_ym"), pa.int64()),
                pc.cast(pc.subtract(t.column("ym"), t.column("cohort_ym")), pa.int64()),
                pa.array(np.ones(t.num_rows, dtype=np.int64)),
                pc.cast(t.column("v"), pa.int64()),
            ],
            schema=MID,
        )

    g = sorted_grouped_agg(
        drop_empty_blocks(joined.map_batches(offs, batch_format="pyarrow"), MID),
        ["cohort_ym", "month_offset"],
        [("_one", "sum"), ("v", "sum")],
        out_names=["n_users", "ltv_cents"],
    )
    return cumsum_over(
        g, "cohort_ym", ["month_offset"], "ltv_cents", out_col="cum_cents"
    )


def session_type_rules(
    events: "ray.data.Dataset", gap_minutes: int = 30
) -> "ray.data.Dataset":
    """Session-basket association rules over event types: for every ordered
    type pair (a → b), the sessions containing both (n_ab), each side's
    session count, confidence ppm = n_ab·10⁶ // n_a and lift ppm =
    n_ab·N·10⁶ // (n_a·n_b) — the market-basket census at 30-min-gap
    session granularity (``user_type_lift``'s user-level cousin, where
    co-occurrence must happen within one sitting to count).

    Scale shape: per-event session ids come from the hot-key-safe
    ``window.lag_over`` + ``cumsum_over`` segmented scans (a user with 10⁹
    events never lands in one task); baskets dedup via sorted_distinct;
    pair emission rides the segmented ``bucket_pairs`` kernel keyed on
    (user, session); every aggregate past the pair pass is type-cardinality
    bounded (the event-type codebook is schema-sized, not
    data-proportional), so the final rule table assembles on the driver
    from tiny aggregates. Pure integer confidence/lift (all non-negative —
    // is floor on both engines)."""
    from .dedup import bucket_pairs
    from .fastagg import drop_empty_blocks, sorted_distinct, sorted_grouped_agg
    from .window import cumsum_over, lag_over

    gap_us = gap_minutes * 60_000_000
    PREP = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("ts_us", pa.int64()),
        ]
    )

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return PREP.empty_table()
        return pa.Table.from_arrays(
            [
                pc.cast(t.column("user_id"), pa.int64()),
                pc.cast(t.column("event_id"), pa.int64()),
                t.column("event_type"),
                pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()),
            ],
            schema=PREP,
        )

    ds = drop_empty_blocks(events.map_batches(prep, batch_format="pyarrow"), PREP)
    lagged = lag_over(ds, "user_id", ["ts_us", "event_id"], "ts_us", out_col="_prev")

    def flag(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        gap = pc.subtract(t.column("ts_us"), t.column("_prev"))
        new_s = pc.cast(
            pc.fill_null(pc.greater(gap, gap_us), True), pa.int64()
        )
        return t.drop_columns(["_prev"]).append_column("_new", new_s)

    flagged = lagged.map_batches(flag, batch_format="pyarrow")
    sess = cumsum_over(
        flagged, "user_id", ["ts_us", "event_id"], "_new", out_col="_sess"
    )
    b = sorted_distinct(
        sess.select_columns(["user_id", "_sess", "event_type"]),
        ["user_id", "_sess", "event_type"],
    ).materialize()  # consumed three times: na, N, pairs

    na_ds = sorted_grouped_agg(
        b, ["event_type"], [("event_type", "count")], out_names=["n"]
    )
    na_parts = [
        x
        for x in na_ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if x.num_columns and x.num_rows
    ]
    na_tbl = (
        pa.concat_tables(na_parts)
        if na_parts
        else pa.schema([("event_type", pa.string()), ("n", pa.int64())]).empty_table()
    )
    na = dict(
        zip(na_tbl.column("event_type").to_pylist(), na_tbl.column("n").to_pylist())
    )
    n_sessions = sorted_distinct(
        b.select_columns(["user_id", "_sess"]), ["user_id", "_sess"]
    ).count()

    pairs = bucket_pairs(
        b, ["user_id", "_sess"], id_col="event_type", cap=None
    )
    nab_ds = sorted_grouped_agg(
        pairs, ["doc_a", "doc_b"], [("doc_a", "count")], out_names=["n_ab"]
    )
    nab_parts = [
        x
        for x in nab_ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if x.num_columns and x.num_rows
    ]
    nab_tbl = (
        pa.concat_tables(nab_parts)
        if nab_parts
        else pa.schema(
            [("doc_a", pa.string()), ("doc_b", pa.string()), ("n_ab", pa.int64())]
        ).empty_table()
    )

    ta, tb, nab = [], [], []
    for a, bb, n in zip(
        nab_tbl.column("doc_a").to_pylist(),
        nab_tbl.column("doc_b").to_pylist(),
        nab_tbl.column("n_ab").to_pylist(),
    ):
        ta += [a, bb]
        tb += [bb, a]
        nab += [n, n]
    n_a = [na[x] for x in ta]
    n_b = [na[x] for x in tb]
    conf = [x * 1_000_000 // y for x, y in zip(nab, n_a)]
    lift = [
        x * n_sessions * 1_000_000 // (y * z) for x, y, z in zip(nab, n_a, n_b)
    ]
    out = pa.table(
        {
            "type_a": pa.array(ta, pa.string()),
            "type_b": pa.array(tb, pa.string()),
            "n_ab": pa.array(nab, pa.int64()),
            "n_a": pa.array(n_a, pa.int64()),
            "n_b": pa.array(n_b, pa.int64()),
            "conf_ppm": pa.array(conf, pa.int64()),
            "lift_ppm": pa.array(lift, pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


def last_touch_attribution(
    events: "ray.data.Dataset",
    target_type: str = "purchase",
    window_us: int = 86_400_000_000,
) -> "ray.data.Dataset":
    """Last-touch attribution: every ``target_type`` event credits the most
    recent PRECEDING event of any other type by the same user within
    ``window_us``; credits roll up to (attributed_type, n_purchases,
    value_cents), with '(none)' for unattributed targets — the standard
    marketing/causal credit table.

    Determinism contract (mirrored bit-for-bit in the twin): the carried
    marker is the max of the ENCODED value ts_us·64 + type_code over the
    preceding window — the engine rides the EXCLUSIVE ``cummax_over`` and
    the twin an inclusive frame, which agree here because targets encode
    −1 (the current row can never win its own attribution). Two markers at
    the same µs resolve by type code, not arrival order.
    The type codebook is schema-bounded (alphabetical codes, < 64 types —
    asserted) and collected once.

    Scale shape: one codebook fastagg; one hot-key-safe
    ``window.cummax_over`` segmented scan (a user with 10⁹ events never
    lands in one task); one stateless decode + type-cardinality fastagg.
    Pure int64 end to end."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .relational import to_cents
    from .window import cummax_over

    types_ds = sorted_grouped_agg(
        events.select_columns(["event_type"]),
        ["event_type"],
        [("event_type", "count")],
        out_names=["_n"],
    )
    tparts = [
        x
        for x in types_ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if x.num_columns and x.num_rows
    ]
    all_types = sorted(
        t
        for t in (
            pa.concat_tables(tparts).column("event_type").to_pylist()
            if tparts
            else []
        )
        if t != target_type
    )
    if len(all_types) >= 64:
        raise ValueError("type codebook exceeds the 6-bit encoding budget")
    code_of = {t: i for i, t in enumerate(all_types)}

    PREP = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("_is_target", pa.bool_()),
            ("cents", pa.int64()),
            ("_enc", pa.int64()),
        ]
    )
    codes_arr = pa.array(all_types, pa.string())

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return PREP.empty_table()
        t = to_cents(t, {"value": "_cents"})
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        # the ts*64+code encoding (and its // 64 decode) requires ts >= 0;
        # pre-epoch timestamps would flip the max ordering — fail loudly
        mn = pc.min(ts).as_py()
        if mn is not None and mn < 0:
            raise ValueError("last_touch_attribution requires ts >= epoch")
        ty = t.column("event_type")
        is_t = pc.equal(ty, target_type)
        code = pc.cast(
            pc.fill_null(pc.index_in(ty, value_set=codes_arr), 0), pa.int64()
        )
        enc = pc.if_else(
            is_t,
            pa.scalar(-1, pa.int64()),
            pc.add(pc.multiply(ts, 64), code),
        )
        return pa.Table.from_arrays(
            [
                pc.cast(t.column("user_id"), pa.int64()),
                pc.cast(t.column("event_id"), pa.int64()),
                ts,
                is_t,
                t.column("_cents"),
                enc,
            ],
            schema=PREP,
        )

    ds = drop_empty_blocks(events.map_batches(prep, batch_format="pyarrow"), PREP)
    carried = cummax_over(
        ds, "user_id", ["ts_us", "event_id"], "_enc", out_col="_attr"
    )

    MID = pa.schema(
        [("attributed_type", pa.string()), ("_one", pa.int64()), ("cents", pa.int64())]
    )

    def decode(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        t = t.filter(t.column("_is_target"))
        if t.num_rows == 0:
            return MID.empty_table()
        # fill nulls (the exclusive cummax's first-row-of-part) while still
        # int64 — a null-bearing to_numpy degrades to float64, which cannot
        # represent the ts·64+code encoding (> 2^53) and corrupts the code
        # bits on the way back
        attr = (
            pc.fill_null(pc.cast(t.column("_attr"), pa.int64()), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ts = t.column("ts_us").to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (attr >= 0) & (ts - (attr // 64) <= window_us)
        code = np.where(ok, attr % 64, -1)
        names = np.array(all_types + ["(none)"], dtype=object)
        return pa.Table.from_arrays(
            [
                pa.array(names[np.where(ok, code, len(all_types))], pa.string()),
                pa.array(np.ones(t.num_rows, np.int64)),
                pc.cast(t.column("cents"), pa.int64()),
            ],
            schema=MID,
        )

    return sorted_grouped_agg(
        drop_empty_blocks(carried.map_batches(decode, batch_format="pyarrow"), MID),
        ["attributed_type"],
        [("_one", "sum"), ("cents", "sum")],
        out_names=["n_purchases", "value_cents"],
    )
