"""Distributed SQL window functions — per-key ``lag`` and running-sum scans.

The reference computes every ordered per-entity derivation (expression ranks,
time-point orderings, parallel arrays ordered by tp_order) with explicit
multi-key sorts inside single-process Cypher/pandas passes (reference
``scripts/post-import.cypher:693-735``, ``omics_adapter.py:446-475``). The
Ray-native expression is the segmented-scan shape shared with ``sessionize``
/ ``asof_last_marker`` / ``corpus.segmented_prefix_sum``:

one global range-partitioned sort on ``[part] + order_cols`` → per-block
vectorized scan (every row whose predecessor lives in the same block resolves
locally) → each block emits ONE summary row per (part, block-segment) — a
block-count-bounded side table, NOT row-proportional — → summaries broadcast
once → a second stateless pass resolves only each segment's carry-in from its
part's earlier segments. A hot key costs its sorted-block share; no task ever
holds a whole partition, so a single part with 10⁸ rows is as safe as 10⁸
parts with one row.

Value convention: ``val_col`` must be int64 (timestamps pre-cast to epoch
micros, money pre-quantized to cents) so running sums are EXACT integer
arithmetic — immune to float summation order, bit-identical to the DuckDB
window oracles at any parallelism (the determinism discipline of SURVEY §7.4).

Precondition (same as the oracle's ``ORDER BY``): ``order_cols`` tuples are
unique within a part — they order block segments deterministically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _np(col: "pa.ChunkedArray") -> np.ndarray:
    return col.to_numpy(zero_copy_only=False)


def _segmented_window(
    ds: "ray.data.Dataset",
    part_col: str,
    order_cols: list[str],
    val_col: str,
    out_col: str,
    kind: str,  # 'lag' | 'cumsum' | 'cummax'
    inclusive: bool = True,
) -> "ray.data.Dataset":
    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    names = list(sch.names)
    sf_cols = [f"_sf_{c}" for c in order_cols]
    sf_fields = [(f, typ[c]) for f, c in zip(sf_cols, order_cols)]
    OUT_SCHEMA = pa.schema([(n, typ[n]) for n in names] + [(out_col, pa.int64())])
    MID_SCHEMA = pa.schema(
        [(n, typ[n]) for n in names] + [(out_col, pa.int64())] + sf_fields
    )
    SUMM_SCHEMA = pa.schema(
        [(part_col, typ[part_col])] + sf_fields + [("_seg_val", pa.int64())]
    )

    def seg_starts(parts: np.ndarray) -> np.ndarray:
        n = len(parts)
        new_p = np.ones(n, dtype=bool)
        new_p[1:] = parts[1:] != parts[:-1]
        return np.maximum.accumulate(np.where(new_p, np.arange(n), 0))

    def local_scan(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID_SCHEMA.empty_table()
        parts = _np(t.column(part_col))
        vals = _np(t.column(val_col)).astype(np.int64)
        start = seg_starts(parts)
        n = len(parts)
        is_first = np.arange(n) == start
        if kind == "lag":
            # in-block predecessor value; segment-first rows stay null and
            # resolve against the broadcast summaries in pass 2
            prev = np.empty(n, dtype=np.int64)
            prev[1:] = vals[:-1]
            prev[0] = 0
            local = pa.array(prev, pa.int64(), mask=is_first)
        elif kind == "cummax":
            # EXCLUSIVE per-segment running max: one compiled pandas groupby
            # cummax pass (segment labels = start indices, already sorted —
            # a single C scan, never per-group Python), shifted by one;
            # segment-first rows stay null and merge the part carry in pass 2
            import pandas as pd

            incl = pd.Series(vals).groupby(start).cummax().to_numpy()
            prev = np.empty(n, dtype=np.int64)
            prev[1:] = incl[:-1]
            prev[0] = 0
            local = pa.array(prev, pa.int64(), mask=is_first)
        else:
            cum = np.cumsum(vals)
            excl = (cum - vals) - (cum - vals)[start]
            local = pa.array(excl + vals if inclusive else excl, pa.int64())
        t = t.append_column(out_col, local)
        for f, c in zip(sf_cols, order_cols):
            arr = t.column(c).take(pa.array(start))
            t = t.append_column(f, arr)
        return t

    def seg_summary(t: pa.Table) -> pa.Table:
        """One row per (part, block segment): first order tuple + the
        segment's carry-out (total for cumsum, last value for lag)."""
        if t.num_columns == 0 or t.num_rows == 0:
            return SUMM_SCHEMA.empty_table()
        parts = _np(t.column(part_col))
        vals = _np(t.column(val_col)).astype(np.int64)
        n = len(parts)
        new_p = np.ones(n, dtype=bool)
        new_p[1:] = parts[1:] != parts[:-1]
        starts = np.flatnonzero(new_p)
        ends = np.append(starts[1:], n)
        if kind == "lag":
            seg_val = vals[ends - 1]
        elif kind == "cummax":
            seg_val = np.maximum.reduceat(vals, starts).astype(np.int64)
        else:
            seg_val = np.add.reduceat(vals, starts).astype(np.int64)
        cols = [t.column(part_col).take(pa.array(starts))]
        cols += [t.column(c).take(pa.array(starts)) for c in order_cols]
        cols.append(pa.array(seg_val, pa.int64()))
        return pa.Table.from_arrays(cols, schema=SUMM_SCHEMA)

    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import drop_empty_blocks

    sorted_ds = ds.sort([part_col] + order_cols).materialize()
    scanned = sorted_ds.map_batches(local_scan, batch_format="pyarrow", batch_size=None)
    summ_tbl = pa.concat_tables(
        [
            b
            for b in sorted_ds.map_batches(
                seg_summary, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns
        ]
        or [SUMM_SCHEMA.empty_table()]
    ).combine_chunks()
    summ_ref = broadcast(summ_tbl)

    def _carry_index(ref):
        """(part, *seg_first) → carry-in: for cumsum the exclusive prefix of
        earlier segments' totals; for lag the previous segment's last value.
        Built once per worker from the block-count-bounded summary table."""
        tbl = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        out: dict = {}
        if tbl.num_rows == 0:
            return out
        tbl = tbl.sort_by([(part_col, "ascending")] + [(f, "ascending") for f in sf_cols])
        parts = _np(tbl.column(part_col))
        firsts = [_np(tbl.column(f)) for f in sf_cols]
        vals = _np(tbl.column("_seg_val"))
        prev_part = None
        run = np.int64(0)
        prev_val = None
        run_max = None
        for i in range(len(parts)):
            p = parts[i]
            if p != prev_part:
                run = np.int64(0)
                prev_val = None
                run_max = None
                prev_part = p
            key = (p, *(f[i] for f in firsts))
            if kind == "lag":
                out[key] = prev_val
            elif kind == "cummax":
                out[key] = run_max
            else:
                out[key] = run
            run += vals[i]
            prev_val = vals[i]
            v = vals[i]
            run_max = v if run_max is None else max(run_max, v)
        return out

    def add_carry(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        index = task_state(
            state_key("window", summ_ref), lambda: _carry_index(summ_ref)
        )
        parts = _np(t.column(part_col))
        firsts = [_np(t.column(f)) for f in sf_cols]
        local = t.column(out_col)
        # segment boundaries: part or any seg-first column changes
        n = len(parts)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = parts[1:] != parts[:-1]
        for f in firsts:
            change[1:] |= f[1:] != f[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        # exact int64 extraction: to_numpy on a NULLABLE int column degrades
        # to float64 (lossy past 2^53 — bites 60-bit hash values); fill
        # nulls first and track the mask separately
        import pyarrow.compute as pc

        null_mask = np.asarray(local.is_null().combine_chunks())
        loc = (
            pc.fill_null(local, 0)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if kind == "lag":
            out = loc.copy()
            mask = null_mask.copy()
            for s, e in zip(starts, ends):
                carry = index.get((parts[s], *(f[s] for f in firsts)))
                if mask[s]:
                    if carry is None:
                        continue  # first row of its part: stays null
                    out[s] = carry
                    mask[s] = False
            arr = pa.array(out, pa.int64(), mask=mask)
        elif kind == "cummax":
            out = loc.copy()
            mask = null_mask.copy()
            for s, e in zip(starts, ends):
                carry = index.get((parts[s], *(f[s] for f in firsts)))
                if carry is None:
                    continue  # part-first segment: local excl max is final
                seg = slice(s, e)
                out[seg] = np.where(mask[seg], carry, np.maximum(out[seg], carry))
                mask[seg] = False
            arr = pa.array(out, pa.int64(), mask=mask)
        else:
            off = np.zeros(n, dtype=np.int64)
            for s, e in zip(starts, ends):
                off[s:e] = index.get((parts[s], *(f[s] for f in firsts)), 0)
            arr = pa.array(loc + off, pa.int64())
        t = t.drop_columns(sf_cols + [out_col]).append_column(out_col, arr)
        return t.select(OUT_SCHEMA.names)

    return drop_empty_blocks(
        scanned.map_batches(add_carry, batch_format="pyarrow", batch_size=None),
        OUT_SCHEMA,
    )


def lag_over(
    ds: "ray.data.Dataset",
    part_col: str,
    order_cols: list[str],
    val_col: str,
    out_col: str = "lag_val",
) -> "ray.data.Dataset":
    """``lag(val) OVER (PARTITION BY part ORDER BY order_cols)`` — int64,
    null for each part's first row."""
    return _segmented_window(ds, part_col, order_cols, val_col, out_col, "lag")


def cumsum_over(
    ds: "ray.data.Dataset",
    part_col: str,
    order_cols: list[str],
    val_col: str,
    out_col: str = "cum_val",
    inclusive: bool = True,
) -> "ray.data.Dataset":
    """``sum(val) OVER (PARTITION BY part ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` — exact int64 running sum (exclusive variant available)."""
    return _segmented_window(
        ds, part_col, order_cols, val_col, out_col, "cumsum", inclusive=inclusive
    )


def cummax_over(
    ds: "ray.data.Dataset",
    part_col: str,
    order_cols: list[str],
    val_col: str,
    out_col: str = "max_val",
) -> "ray.data.Dataset":
    """``max(val) OVER (PARTITION BY part ORDER BY order_cols ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` — the EXCLUSIVE running max,
    int64, null for each part's first row.

    This is the scan underneath interval-union/gaps-and-islands problems:
    with intervals sorted by start, an interval opens a new island iff its
    start exceeds the exclusive running max of all earlier ends, and its
    novel coverage is ``max(0, end - max(start, running_max))`` — both pure
    per-row functions of this column (``events.coalesce_intervals``).

    Same two-pass segmented-scan shape as ``lag_over``/``cumsum_over``; the
    in-block scan is one compiled pandas groupby-cummax pass, the cross-block
    carry is the running max of earlier segment maxima per part (broadcast,
    block-count-bounded).
    """
    return _segmented_window(ds, part_col, order_cols, val_col, out_col, "cummax")


def rolling_sum_over(
    ds: "ray.data.Dataset",
    part_col: str,
    order_cols: list[str],
    val_col: str,
    window: int,
    sum_col: str = "win_sum",
    cnt_col: str = "win_n",
) -> "ray.data.Dataset":
    """``sum(val) OVER (PARTITION BY part ORDER BY order_cols ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)`` plus the matching ``count(*)``
    window — the bounded-window sibling of ``cumsum_over`` (same exact-int64
    discipline, same DuckDB-twin bit parity).

    Same segmented-scan shape as ``_segmented_window``: rows whose whole
    window lives in their own sorted block resolve locally from a padded
    cumsum (two array reads per row, no per-row Python); only each block
    segment's first ``window-1`` rows can need earlier values, and those
    resolve in pass 2 against a broadcast summary where every segment
    contributes its last ``min(window-1, seg_len)`` values plus its length.
    The summary is therefore blocks × (window-1) values — block-count- and
    window-bounded, never row-proportional — so the operator is safe for a
    hot part holding any number of rows, but is intended for the bounded
    windows real pipelines use (trailing 7 / 24 / 1000 rows), not for
    window ≈ partition size (use ``cumsum_over`` + a lag difference there).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    W = int(window)
    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    names = list(sch.names)
    sf_cols = [f"_sf_{c}" for c in order_cols]
    sf_fields = [(f, typ[c]) for f, c in zip(sf_cols, order_cols)]
    OUT_SCHEMA = pa.schema(
        [(n, typ[n]) for n in names] + [(sum_col, pa.int64()), (cnt_col, pa.int64())]
    )
    MID_SCHEMA = pa.schema(
        [(n, typ[n]) for n in names]
        + [(sum_col, pa.int64()), ("_segoff", pa.int64())]
        + sf_fields
    )
    SUMM_SCHEMA = pa.schema(
        [(part_col, typ[part_col])]
        + sf_fields
        + [("_tail", pa.list_(pa.int64())), ("_seg_len", pa.int64())]
    )

    def local_scan(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID_SCHEMA.empty_table()
        parts = _np(t.column(part_col))
        vals = _np(t.column(val_col)).astype(np.int64)
        n = len(parts)
        new_p = np.ones(n, dtype=bool)
        new_p[1:] = parts[1:] != parts[:-1]
        start = np.maximum.accumulate(np.where(new_p, np.arange(n), 0))
        # padded cumsum: C[i+1]-C[lo] = vals[lo..i]
        C = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(vals, out=C[1:])
        idx = np.arange(n)
        lo = np.maximum(idx - (W - 1), start)
        local = C[idx + 1] - C[lo]
        segoff = idx - start  # in-segment row index, for pass-2 carry math
        t = t.append_column(sum_col, pa.array(local, pa.int64()))
        t = t.append_column("_segoff", pa.array(segoff, pa.int64()))
        for f, c in zip(sf_cols, order_cols):
            t = t.append_column(f, t.column(c).take(pa.array(start)))
        return t

    def seg_summary(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return SUMM_SCHEMA.empty_table()
        parts = _np(t.column(part_col))
        vals = _np(t.column(val_col)).astype(np.int64)
        n = len(parts)
        new_p = np.ones(n, dtype=bool)
        new_p[1:] = parts[1:] != parts[:-1]
        starts = np.flatnonzero(new_p)
        ends = np.append(starts[1:], n)
        tails = [vals[max(e - (W - 1), s) : e] for s, e in zip(starts, ends)]
        cols = [t.column(part_col).take(pa.array(starts))]
        cols += [t.column(c).take(pa.array(starts)) for c in order_cols]
        cols.append(pa.array([tl.tolist() for tl in tails], pa.list_(pa.int64())))
        cols.append(pa.array((ends - starts).astype(np.int64), pa.int64()))
        return pa.Table.from_arrays(cols, schema=SUMM_SCHEMA)

    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import drop_empty_blocks

    sorted_ds = ds.sort([part_col] + order_cols).materialize()
    scanned = sorted_ds.map_batches(local_scan, batch_format="pyarrow", batch_size=None)
    summ_tbl = pa.concat_tables(
        [
            b
            for b in sorted_ds.map_batches(
                seg_summary, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns
        ]
        or [SUMM_SCHEMA.empty_table()]
    ).combine_chunks()
    summ_ref = broadcast(summ_tbl)

    def _carry_index(ref):
        """(part, *seg_first) → (suffix_sums, prev_count): suffix_sums[k] =
        sum of the last k rows before this segment within its part (k up to
        W-1), prev_count = total earlier rows in the part (uncapped — sets
        the true window count for parts shorter than W)."""
        tbl = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        out: dict = {}
        if tbl.num_rows == 0:
            return out
        tbl = tbl.sort_by(
            [(part_col, "ascending")] + [(f, "ascending") for f in sf_cols]
        )
        parts = _np(tbl.column(part_col))
        firsts = [_np(tbl.column(f)) for f in sf_cols]
        tails = tbl.column("_tail").to_pylist()
        lens = _np(tbl.column("_seg_len"))
        prev_part = None
        carry: list = []
        prev_count = 0
        for i in range(len(parts)):
            p = parts[i]
            if p != prev_part:
                carry, prev_count, prev_part = [], 0, p
            key = (p, *(f[i] for f in firsts))
            if carry or prev_count:
                rev = np.array(carry[::-1], dtype=np.int64)
                ss = np.zeros(len(rev) + 1, dtype=np.int64)
                np.cumsum(rev, out=ss[1:])
                out[key] = (ss, prev_count)
            carry = (carry + list(tails[i]))[-(W - 1) :] if W > 1 else []
            prev_count += int(lens[i])
        return out

    def add_carry(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        index = task_state(
            state_key("rollwin", summ_ref), lambda: _carry_index(summ_ref)
        )
        parts = _np(t.column(part_col))
        firsts = [_np(t.column(f)) for f in sf_cols]
        segoff = _np(t.column("_segoff"))
        sums = _np(t.column(sum_col)).copy()
        n = len(parts)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = parts[1:] != parts[:-1]
        for f in firsts:
            change[1:] |= f[1:] != f[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        cnt = np.minimum(segoff + 1, W)
        for s, e in zip(starts, ends):
            got = index.get((parts[s], *(f[s] for f in firsts)))
            if got is None:
                continue
            ss, prev_count = got
            # rows with fewer than W-1 in-segment predecessors borrow the
            # missing head of their window from the carry suffix sums
            j = segoff[s:e]
            missing = np.minimum(np.maximum((W - 1) - j, 0), len(ss) - 1)
            sums[s:e] += ss[missing]
            cnt[s:e] = np.minimum(prev_count + j + 1, W)
        t = t.drop_columns(sf_cols + [sum_col, "_segoff"])
        t = t.append_column(sum_col, pa.array(sums, pa.int64()))
        t = t.append_column(cnt_col, pa.array(cnt.astype(np.int64), pa.int64()))
        return t.select(OUT_SCHEMA.names)

    return drop_empty_blocks(
        scanned.map_batches(add_carry, batch_format="pyarrow", batch_size=None),
        OUT_SCHEMA,
    )


def lead_over(
    ds: "ray.data.Dataset",
    part_col: str,
    order_cols: list[str],
    val_col: str,
    out_col: str = "lead_val",
) -> "ray.data.Dataset":
    """``lead(val) OVER (PARTITION BY part ORDER BY order_cols)`` — int64,
    null for each part's last row.

    Runs ``lag`` over the NEGATED order axis (lead under an ordering is lag
    under its reverse), which keeps the one battle-tested segmented-scan
    kernel instead of a mirrored second implementation. The trade: order
    columns must be int64 (the module's value convention already demands
    pre-cast epoch-µs / quantized ints everywhere; enforced here), and
    int64-min is rejected by the checked negation.
    """
    import pyarrow.compute as pc

    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    for c in order_cols:
        if not pa.types.is_integer(typ[c]):
            raise TypeError(
                f"lead_over order column {c!r} has type {typ[c]}; negation-"
                "based lead needs integer order columns (pre-cast timestamps "
                "to epoch micros)"
            )
    neg_cols = [f"_neg_{c}" for c in order_cols]

    def add_neg(t: pa.Table) -> pa.Table:
        for nc, c in zip(neg_cols, order_cols):
            t = t.append_column(
                nc, pc.negate_checked(pc.cast(t.column(c), pa.int64()))
            )
        return t

    out = _segmented_window(
        ds.map_batches(add_neg, batch_format="pyarrow"),
        part_col,
        neg_cols,
        val_col,
        out_col,
        "lag",
    )
    return out.map_batches(
        lambda t: t.drop_columns(neg_cols), batch_format="pyarrow"
    )


def rolling_range_sum_over(
    ds: "ray.data.Dataset",
    part_col: str,
    ts_col: str,
    order_cols: list[str],
    val_col: str,
    horizon: int,
    sum_col: str = "win_sum",
    cnt_col: str = "win_n",
) -> "ray.data.Dataset":
    """``sum(val) OVER (PARTITION BY part ORDER BY ts RANGE BETWEEN horizon
    PRECEDING AND CURRENT ROW)`` plus the matching ``count(*)`` — the
    TIME-based trailing window (trailing 1-hour spend, 24-hour event rate),
    the variable-width sibling of ``rolling_sum_over``. The frame of row r
    is every row of its part with ``ts ∈ [ts_r − horizon, ts_r]`` — both
    ends inclusive and INCLUDING peers (rows sharing ts_r) on either side
    of r, exactly the SQL RANGE frame.

    ``ts_col`` must be int64 (epoch µs) and ``horizon`` in the same unit;
    ``order_cols`` = [ts_col, tiebreaks...] must be unique within a part
    (they key block segments, same precondition as ``_segmented_window``).

    Shape: one global sort on [part] + order_cols → per-block scan where
    each row's frame bounds come from two ``searchsorted`` probes into its
    own segment (vectorized per segment; peer-safe) → per block segment ONE
    summary row carrying (a) the tail rows within ``horizon`` of the
    segment's last ts — the only rows any LATER row can still see — and
    (b) the head peer-run (count/sum of rows equal to the first ts), which
    lets a row whose peer run straddles a block boundary collect its
    FORWARD peers. The summary table is block-count × in-horizon-density
    bounded, never row-proportional (same budget argument as
    ``rolling_sum_over``'s W−1 tails: a horizon enclosing an entire hot
    part means the caller wanted ``cumsum_over``). Pass 2 resolves back
    carries with one suffix-sum searchsorted per affected segment and
    forward peer-runs with a flag lookup — no task ever holds a whole
    partition."""
    H = int(horizon)
    if H < 0:
        raise ValueError("horizon must be >= 0")
    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    names = list(sch.names)
    sf_cols = [f"_sf_{c}" for c in order_cols]
    sf_fields = [(f, typ[c]) for f, c in zip(sf_cols, order_cols)]
    OUT_SCHEMA = pa.schema(
        [(n, typ[n]) for n in names] + [(sum_col, pa.int64()), (cnt_col, pa.int64())]
    )
    MID_SCHEMA = pa.schema(
        [(n, typ[n]) for n in names]
        + [(sum_col, pa.int64()), (cnt_col, pa.int64()), ("_fwd", pa.bool_())]
        + sf_fields
    )
    SUMM_SCHEMA = pa.schema(
        [(part_col, typ[part_col])]
        + sf_fields
        + [
            ("_tail_ts", pa.list_(pa.int64())),
            ("_tail_val", pa.list_(pa.int64())),
            ("_head_ts", pa.int64()),
            ("_head_cnt", pa.int64()),
            ("_head_sum", pa.int64()),
            ("_last_ts", pa.int64()),
            ("_seg_len", pa.int64()),
        ]
    )

    def _seg_bounds(parts: np.ndarray):
        n = len(parts)
        new_p = np.ones(n, dtype=bool)
        new_p[1:] = parts[1:] != parts[:-1]
        starts = np.flatnonzero(new_p)
        return starts, np.append(starts[1:], n)

    def local_scan(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID_SCHEMA.empty_table()
        parts = _np(t.column(part_col))
        ts = _np(t.column(ts_col)).astype(np.int64)
        vals = _np(t.column(val_col)).astype(np.int64)
        n = len(parts)
        starts, ends = _seg_bounds(parts)
        C = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(vals, out=C[1:])
        sums = np.empty(n, dtype=np.int64)
        cnts = np.empty(n, dtype=np.int64)
        fwd = np.zeros(n, dtype=bool)
        start_of = np.maximum.accumulate(
            np.where(np.isin(np.arange(n), starts), np.arange(n), 0)
        )
        for s, e in zip(starts, ends):
            seg_ts = ts[s:e]
            lo = s + np.searchsorted(seg_ts, seg_ts - H, side="left")
            hi = s + np.searchsorted(seg_ts, seg_ts, side="right")
            sums[s:e] = C[hi] - C[lo]
            cnts[s:e] = hi - lo
            fwd[s:e] = seg_ts == seg_ts[-1]
        t = t.append_column(sum_col, pa.array(sums, pa.int64()))
        t = t.append_column(cnt_col, pa.array(cnts, pa.int64()))
        t = t.append_column("_fwd", pa.array(fwd))
        for f, c in zip(sf_cols, order_cols):
            t = t.append_column(f, t.column(c).take(pa.array(start_of)))
        return t

    def seg_summary(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return SUMM_SCHEMA.empty_table()
        parts = _np(t.column(part_col))
        ts = _np(t.column(ts_col)).astype(np.int64)
        vals = _np(t.column(val_col)).astype(np.int64)
        starts, ends = _seg_bounds(parts)
        tail_ts, tail_val, h_cnt, h_sum = [], [], [], []
        for s, e in zip(starts, ends):
            k = s + np.searchsorted(ts[s:e], ts[e - 1] - H, side="left")
            tail_ts.append(ts[k:e].tolist())
            tail_val.append(vals[k:e].tolist())
            hp = s + np.searchsorted(ts[s:e], ts[s], side="right")
            h_cnt.append(int(hp - s))
            h_sum.append(int(C_sum(vals, s, hp)))
        cols = [t.column(part_col).take(pa.array(starts))]
        cols += [t.column(c).take(pa.array(starts)) for c in order_cols]
        cols.append(pa.array(tail_ts, pa.list_(pa.int64())))
        cols.append(pa.array(tail_val, pa.list_(pa.int64())))
        cols.append(pa.array(ts[starts], pa.int64()))
        cols.append(pa.array(np.asarray(h_cnt, dtype=np.int64), pa.int64()))
        cols.append(pa.array(np.asarray(h_sum, dtype=np.int64), pa.int64()))
        cols.append(pa.array(ts[ends - 1], pa.int64()))
        cols.append(pa.array((ends - starts).astype(np.int64), pa.int64()))
        return pa.Table.from_arrays(cols, schema=SUMM_SCHEMA)

    def C_sum(vals: np.ndarray, a: int, b: int) -> int:
        return int(vals[a:b].sum())

    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import drop_empty_blocks

    sorted_ds = ds.sort([part_col] + order_cols).materialize()
    scanned = sorted_ds.map_batches(local_scan, batch_format="pyarrow", batch_size=None)
    summ_tbl = pa.concat_tables(
        [
            b
            for b in sorted_ds.map_batches(
                seg_summary, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns
        ]
        or [SUMM_SCHEMA.empty_table()]
    ).combine_chunks()
    summ_ref = broadcast(summ_tbl)

    def _carry_index(ref):
        """Two driver-side maps over the (block-count-bounded) summaries,
        in part + order_cols order:
        back: (part, *seg_first) → (carry_ts asc, suffix_sums, suffix_cnts)
              over earlier rows still within ``horizon`` of any future row;
        fwd:  (part, *seg_first) → (add_sum, add_cnt) of this segment's
              last-ts peer run continuing into LATER segments."""
        tbl = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        back: dict = {}
        fwd: dict = {}
        if tbl.num_rows == 0:
            return back, fwd
        tbl = tbl.sort_by(
            [(part_col, "ascending")] + [(f, "ascending") for f in sf_cols]
        )
        parts = _np(tbl.column(part_col))
        firsts = [_np(tbl.column(f)) for f in sf_cols]
        tails_ts = tbl.column("_tail_ts").to_pylist()
        tails_val = tbl.column("_tail_val").to_pylist()
        head_ts = _np(tbl.column("_head_ts"))
        head_cnt = _np(tbl.column("_head_cnt"))
        head_sum = _np(tbl.column("_head_sum"))
        last_ts = _np(tbl.column("_last_ts"))
        seg_len = _np(tbl.column("_seg_len"))
        n = len(parts)
        # backward sweep for forward peer-runs
        for i in range(n - 2, -1, -1):
            if parts[i + 1] != parts[i] or head_ts[i + 1] != last_ts[i]:
                continue
            add_s, add_c = int(head_sum[i + 1]), int(head_cnt[i + 1])
            # segment i+1 entirely one peer run -> its own fwd chain continues
            if head_cnt[i + 1] == seg_len[i + 1] and last_ts[i + 1] == last_ts[i]:
                nxt = fwd.get((parts[i + 1], *(f[i + 1] for f in firsts)))
                if nxt is not None:
                    add_s += nxt[0]
                    add_c += nxt[1]
            fwd[(parts[i], *(f[i] for f in firsts))] = (add_s, add_c)
        # forward sweep for backward carries
        prev_part = None
        c_ts: list = []
        c_val: list = []
        for i in range(n):
            p = parts[i]
            if p != prev_part:
                c_ts, c_val, prev_part = [], [], p
            if c_ts:
                a_ts = np.asarray(c_ts, dtype=np.int64)
                a_val = np.asarray(c_val, dtype=np.int64)
                ss = np.zeros(len(a_val) + 1, dtype=np.int64)
                np.cumsum(a_val[::-1], out=ss[1:])
                suf = ss[::-1].copy()  # suf[k] = sum of a_val[k:]
                key = (p, *(f[i] for f in firsts))
                back[key] = (a_ts, suf)
            c_ts.extend(tails_ts[i])
            c_val.extend(tails_val[i])
            # prune to the horizon of this segment's end: no later row can
            # reach further back (later rows have ts >= last_ts[i])
            cut = np.searchsorted(
                np.asarray(c_ts, dtype=np.int64), last_ts[i] - H, side="left"
            )
            if cut:
                c_ts, c_val = c_ts[cut:], c_val[cut:]
        return back, fwd

    def add_carry(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        back, fwd = task_state(
            state_key("rangewin", summ_ref), lambda: _carry_index(summ_ref)
        )
        parts = _np(t.column(part_col))
        firsts = [_np(t.column(f)) for f in sf_cols]
        ts = _np(t.column(ts_col)).astype(np.int64)
        sums = _np(t.column(sum_col)).copy()
        cnts = _np(t.column(cnt_col)).copy()
        fflag = _np(t.column("_fwd"))
        n = len(parts)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = parts[1:] != parts[:-1]
        for f in firsts:
            change[1:] |= f[1:] != f[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            key = (parts[s], *(f[s] for f in firsts))
            got = back.get(key)
            if got is not None:
                a_ts, suf = got
                idx = np.searchsorted(a_ts, ts[s:e] - H, side="left")
                sums[s:e] += suf[idx]
                cnts[s:e] += len(a_ts) - idx
            fq = fwd.get(key)
            if fq is not None:
                m = fflag[s:e]
                sums[s:e][m] += fq[0]
                cnts[s:e][m] += fq[1]
        t = t.drop_columns(sf_cols + [sum_col, cnt_col, "_fwd"])
        t = t.append_column(sum_col, pa.array(sums, pa.int64()))
        t = t.append_column(cnt_col, pa.array(cnts, pa.int64()))
        return t.select(OUT_SCHEMA.names)

    return drop_empty_blocks(
        scanned.map_batches(add_carry, batch_format="pyarrow", batch_size=None),
        OUT_SCHEMA,
    )


def _range_max_query(vals: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Vectorized range-maximum over half-open windows [lo, hi) of ``vals``
    via an O(n log n) sparse table — O(1) per query, no per-row Python.
    Requires hi > lo for every query."""
    n = len(vals)
    levels = [vals]
    size = 1
    while size * 2 <= n:
        prev = levels[-1]
        levels.append(np.maximum(prev[: n - size * 2 + 1], prev[size : n - size + 1]))
        size *= 2
    width = hi - lo
    # branchless floor(log2(width)) via frexp's exponent (width >= 1 always:
    # every RANGE frame contains at least the current row)
    k = np.frexp(width.astype(np.float64))[1] - 1
    half = (1 << k.astype(np.int64)).astype(np.int64)
    out = np.empty(len(width), dtype=np.int64)
    for lev in np.unique(k):
        m = k == lev
        tbl = levels[int(lev)]
        out[m] = np.maximum(tbl[lo[m]], tbl[hi[m] - half[m]])
    return out


def rolling_range_max_over(
    ds: "ray.data.Dataset",
    part_col: str,
    ts_col: str,
    order_cols: list[str],
    val_col: str,
    horizon: int,
    max_col: str = "win_max",
    cnt_col: str = "win_n",
) -> "ray.data.Dataset":
    """``max(val) OVER (PARTITION BY part ORDER BY ts RANGE BETWEEN horizon
    PRECEDING AND CURRENT ROW)`` plus the matching ``count(*)`` — the
    trailing-time PEAK detector (largest single spend in the last hour,
    burst ceiling in the last minute), sibling of ``rolling_range_sum_over``
    with identical frame semantics (both ends inclusive, peers on either
    side of the current row included) and identical distribution shape.

    Differences from the sum sibling, forced by max being non-invertible:
    in-block windows resolve against an O(n log n) sparse table instead of
    a cumsum (still O(1) per row, fully vectorized per level); the back
    carry stores per-segment suffix MAXIMA over the horizon-bounded tails;
    the forward peer-run stitch carries the run's max instead of its sum.
    Same preconditions: int64 epoch-µs ``ts_col``, unique ``order_cols``
    tuples per part, horizon-bounded in-window density."""
    H = int(horizon)
    if H < 0:
        raise ValueError("horizon must be >= 0")
    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    names = list(sch.names)
    sf_cols = [f"_sf_{c}" for c in order_cols]
    sf_fields = [(f, typ[c]) for f, c in zip(sf_cols, order_cols)]
    OUT_SCHEMA = pa.schema(
        [(n, typ[n]) for n in names] + [(max_col, pa.int64()), (cnt_col, pa.int64())]
    )
    MID_SCHEMA = pa.schema(
        [(n, typ[n]) for n in names]
        + [(max_col, pa.int64()), (cnt_col, pa.int64()), ("_fwd", pa.bool_())]
        + sf_fields
    )
    SUMM_SCHEMA = pa.schema(
        [(part_col, typ[part_col])]
        + sf_fields
        + [
            ("_tail_ts", pa.list_(pa.int64())),
            ("_tail_val", pa.list_(pa.int64())),
            ("_head_ts", pa.int64()),
            ("_head_cnt", pa.int64()),
            ("_head_max", pa.int64()),
            ("_last_ts", pa.int64()),
            ("_seg_len", pa.int64()),
        ]
    )

    def _seg_bounds(parts: np.ndarray):
        n = len(parts)
        new_p = np.ones(n, dtype=bool)
        new_p[1:] = parts[1:] != parts[:-1]
        starts = np.flatnonzero(new_p)
        return starts, np.append(starts[1:], n)

    def local_scan(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID_SCHEMA.empty_table()
        parts = _np(t.column(part_col))
        ts = _np(t.column(ts_col)).astype(np.int64)
        vals = _np(t.column(val_col)).astype(np.int64)
        n = len(parts)
        starts, ends = _seg_bounds(parts)
        maxs = np.empty(n, dtype=np.int64)
        cnts = np.empty(n, dtype=np.int64)
        fwd = np.zeros(n, dtype=bool)
        start_of = np.zeros(n, dtype=np.int64)
        start_of[starts] = starts
        np.maximum.accumulate(start_of, out=start_of)
        for s, e in zip(starts, ends):
            seg_ts = ts[s:e]
            lo = np.searchsorted(seg_ts, seg_ts - H, side="left")
            hi = np.searchsorted(seg_ts, seg_ts, side="right")
            maxs[s:e] = _range_max_query(vals[s:e], lo, hi)
            cnts[s:e] = hi - lo
            fwd[s:e] = seg_ts == seg_ts[-1]
        t = t.append_column(max_col, pa.array(maxs, pa.int64()))
        t = t.append_column(cnt_col, pa.array(cnts, pa.int64()))
        t = t.append_column("_fwd", pa.array(fwd))
        for f, c in zip(sf_cols, order_cols):
            t = t.append_column(f, t.column(c).take(pa.array(start_of)))
        return t

    def seg_summary(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return SUMM_SCHEMA.empty_table()
        parts = _np(t.column(part_col))
        ts = _np(t.column(ts_col)).astype(np.int64)
        vals = _np(t.column(val_col)).astype(np.int64)
        starts, ends = _seg_bounds(parts)
        tail_ts, tail_val, h_cnt, h_max = [], [], [], []
        for s, e in zip(starts, ends):
            k = s + np.searchsorted(ts[s:e], ts[e - 1] - H, side="left")
            tail_ts.append(ts[k:e].tolist())
            tail_val.append(vals[k:e].tolist())
            hp = s + np.searchsorted(ts[s:e], ts[s], side="right")
            h_cnt.append(int(hp - s))
            h_max.append(int(vals[s:hp].max()))
        cols = [t.column(part_col).take(pa.array(starts))]
        cols += [t.column(c).take(pa.array(starts)) for c in order_cols]
        cols.append(pa.array(tail_ts, pa.list_(pa.int64())))
        cols.append(pa.array(tail_val, pa.list_(pa.int64())))
        cols.append(pa.array(ts[starts], pa.int64()))
        cols.append(pa.array(np.asarray(h_cnt, dtype=np.int64), pa.int64()))
        cols.append(pa.array(np.asarray(h_max, dtype=np.int64), pa.int64()))
        cols.append(pa.array(ts[ends - 1], pa.int64()))
        cols.append(pa.array((ends - starts).astype(np.int64), pa.int64()))
        return pa.Table.from_arrays(cols, schema=SUMM_SCHEMA)

    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import drop_empty_blocks

    sorted_ds = ds.sort([part_col] + order_cols).materialize()
    scanned = sorted_ds.map_batches(local_scan, batch_format="pyarrow", batch_size=None)
    summ_tbl = pa.concat_tables(
        [
            b
            for b in sorted_ds.map_batches(
                seg_summary, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns
        ]
        or [SUMM_SCHEMA.empty_table()]
    ).combine_chunks()
    summ_ref = broadcast(summ_tbl)

    def _carry_index(ref):
        """back: (part, *seg_first) → (carry_ts asc, suffix_max, suffix_cnt);
        fwd: (part, *seg_first) → (run_max, run_cnt) of the last-ts peer run
        continuing into later segments."""
        tbl = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        back: dict = {}
        fwd: dict = {}
        if tbl.num_rows == 0:
            return back, fwd
        tbl = tbl.sort_by(
            [(part_col, "ascending")] + [(f, "ascending") for f in sf_cols]
        )
        parts = _np(tbl.column(part_col))
        firsts = [_np(tbl.column(f)) for f in sf_cols]
        tails_ts = tbl.column("_tail_ts").to_pylist()
        tails_val = tbl.column("_tail_val").to_pylist()
        head_ts = _np(tbl.column("_head_ts"))
        head_cnt = _np(tbl.column("_head_cnt"))
        head_max = _np(tbl.column("_head_max"))
        last_ts = _np(tbl.column("_last_ts"))
        seg_len = _np(tbl.column("_seg_len"))
        n = len(parts)
        for i in range(n - 2, -1, -1):
            if parts[i + 1] != parts[i] or head_ts[i + 1] != last_ts[i]:
                continue
            add_m, add_c = int(head_max[i + 1]), int(head_cnt[i + 1])
            if head_cnt[i + 1] == seg_len[i + 1] and last_ts[i + 1] == last_ts[i]:
                nxt = fwd.get((parts[i + 1], *(f[i + 1] for f in firsts)))
                if nxt is not None:
                    add_m = max(add_m, nxt[0])
                    add_c += nxt[1]
            fwd[(parts[i], *(f[i] for f in firsts))] = (add_m, add_c)
        prev_part = None
        c_ts: list = []
        c_val: list = []
        for i in range(n):
            p = parts[i]
            if p != prev_part:
                c_ts, c_val, prev_part = [], [], p
            if c_ts:
                a_ts = np.asarray(c_ts, dtype=np.int64)
                a_val = np.asarray(c_val, dtype=np.int64)
                sm = np.empty(len(a_val) + 1, dtype=np.int64)
                sm[-1] = np.iinfo(np.int64).min
                sm[:-1] = np.maximum.accumulate(a_val[::-1])[::-1]
                back[(p, *(f[i] for f in firsts))] = (a_ts, sm)
            c_ts.extend(tails_ts[i])
            c_val.extend(tails_val[i])
            cut = np.searchsorted(
                np.asarray(c_ts, dtype=np.int64), last_ts[i] - H, side="left"
            )
            if cut:
                c_ts, c_val = c_ts[cut:], c_val[cut:]
        return back, fwd

    def add_carry(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        back, fwd = task_state(
            state_key("rangemax", summ_ref), lambda: _carry_index(summ_ref)
        )
        parts = _np(t.column(part_col))
        firsts = [_np(t.column(f)) for f in sf_cols]
        ts = _np(t.column(ts_col)).astype(np.int64)
        maxs = _np(t.column(max_col)).copy()
        cnts = _np(t.column(cnt_col)).copy()
        fflag = _np(t.column("_fwd"))
        n = len(parts)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = parts[1:] != parts[:-1]
        for f in firsts:
            change[1:] |= f[1:] != f[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            key = (parts[s], *(f[s] for f in firsts))
            got = back.get(key)
            if got is not None:
                a_ts, sm = got
                idx = np.searchsorted(a_ts, ts[s:e] - H, side="left")
                has = idx < len(a_ts)
                maxs[s:e] = np.where(
                    has, np.maximum(maxs[s:e], sm[idx]), maxs[s:e]
                )
                cnts[s:e] += len(a_ts) - idx
            fq = fwd.get(key)
            if fq is not None:
                m = fflag[s:e]
                maxs[s:e][m] = np.maximum(maxs[s:e][m], fq[0])
                cnts[s:e][m] += fq[1]
        t = t.drop_columns(sf_cols + [max_col, cnt_col, "_fwd"])
        t = t.append_column(max_col, pa.array(maxs, pa.int64()))
        t = t.append_column(cnt_col, pa.array(cnts, pa.int64()))
        return t.select(OUT_SCHEMA.names)

    return drop_empty_blocks(
        scanned.map_batches(add_carry, batch_format="pyarrow", batch_size=None),
        OUT_SCHEMA,
    )
