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
