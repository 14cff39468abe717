"""Join helpers — broadcast hash join for small sides, partitioned hash join
(``Dataset.join``) for two large sides.

Reference analog: every reference join is a driver-side dict probe against a
small side (``build_gene_annotations.py:996-1001``, ``uniprot_adapter.py:
80-133``); at 100 TB the small-side probes become ``ray.put``-broadcast tables
probed inside ``map_batches`` (no shuffle), and genuinely large-large joins
use Ray Data's hash-partitioned join.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..arrow_util import floor_div_i64
from ..state.broadcast import fetch


class _BroadcastMerge:
    """Actor-pool stage: pandas merge of each batch against a broadcast table."""

    def __init__(self, small_ref, on, how, suffix) -> None:
        small = fetch(small_ref)
        if isinstance(small, pa.Table):
            small = small.to_pandas()
        self.small = small
        self.on = list(on)
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(
            self.small, on=self.on, how=self.how, suffixes=("", self.suffix)
        )


def broadcast_join(
    large: "ray.data.Dataset",
    small: "pa.Table | pd.DataFrame | ray.ObjectRef",
    on: tuple[str, ...] | list[str],
    how: str = "inner",
    *,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Join a Dataset against a small in-memory side without any shuffle.

    The small side is ``ray.put`` once and pulled once per actor — never
    re-shipped per batch (SURVEY.md §2.4 J1-J7 pattern).

    Fast path: when the small side is UNIQUE on a single join key and ``how``
    is inner/left, the probe is Arrow-native (``index_in`` + ``take`` — no
    per-batch pandas round-trip); anything else falls back to pandas merge.
    """
    # decide the path from the small side's shape (driver-side, once)
    small_tbl = small
    if isinstance(small, ray.ObjectRef):
        small_tbl = None  # unknown shape → generic path
    elif isinstance(small, pd.DataFrame):
        small_tbl = pa.Table.from_pandas(small, preserve_index=False)
    if (
        small_tbl is not None
        and len(on) == 1
        and how in ("inner", "left")
        and small_tbl.column(on[0]).null_count == 0
        and len(pc.unique(small_tbl.column(on[0]).combine_chunks()))
        == small_tbl.num_rows
    ):
        ref = ray.put(small_tbl.replace_schema_metadata(None))
        return large.map_batches(
            _broadcast_probe_fn,
            fn_kwargs={"small_ref": ref, "key": on[0], "how": how, "suffix": suffix},
            batch_format="pyarrow",
        )
    ref = small if isinstance(small, ray.ObjectRef) else ray.put(small)
    return large.map_batches(
        _broadcast_merge_fn,
        fn_kwargs={
            "small_ref": ref,
            "on": tuple(on),
            "how": how,
            "suffix": suffix,
        },
        batch_format="pandas",
    )


def _broadcast_probe_fn(
    batch: pa.Table, small_ref, key: str, how: str, suffix: str = "_r"
) -> pa.Table:
    """Arrow-native probe: inv = index_in(batch.key, small.key); append every
    small payload column via take(inv); inner drops non-matches. A small-side
    column whose name already exists in the batch gets ``suffix`` appended —
    same contract as the pandas merge path's ``suffixes=("", suffix)``
    (ADVICE r2: the fast path silently produced duplicate column names)."""
    from ..state.broadcast import state_key, task_state

    small: pa.Table = task_state(state_key("bprobe", small_ref), lambda: fetch(small_ref))
    col = batch.column(key)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    inv = pc.index_in(col, value_set=small.column(key).combine_chunks())
    if how == "inner":
        keep = pc.is_valid(inv)
        batch = batch.filter(keep)
        inv = inv.filter(keep)
    out = batch
    existing = set(batch.column_names)
    for name in small.column_names:
        if name == key:
            continue
        out_name = name + suffix if name in existing else name
        out = out.append_column(out_name, pc.take(small.column(name), inv))
    return out


def _broadcast_merge_fn(batch, small_ref, on, how, suffix):
    from ..state.broadcast import state_key, task_state

    merger = task_state(
        state_key("bmerge", small_ref, on, how, suffix),
        lambda: _BroadcastMerge(small_ref, on, how, suffix),
    )
    return merger(batch)


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...],
    how: str = "inner",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Large-large join: Ray Data hash-partitioned join (all-to-all shuffle).

    Keep the sides projected to the minimum column set before calling — wide
    payload columns must never ride through a shuffle (SURVEY.md §7.4).
    ``num_partitions`` defaults to the cluster-aware
    ``tuning.default_join_partitions()``: a fixed 32 spawns 32 aggregator
    actors whose combined fractional CPUs consume a small session whole and
    deadlock the producing stage (observed at num_cpus=4).
    """
    from ..tuning import default_join_partitions

    np_ = num_partitions or default_join_partitions()
    return left.join(right, join_type=how, num_partitions=np_, on=tuple(on))


def semi_join_filter(
    large: "ray.data.Dataset",
    key_set,
    column: str,
) -> "ray.data.Dataset":
    """Semi-join via broadcast key set (brite_adapter.py:104-134 analog)."""
    ref = key_set if isinstance(key_set, ray.ObjectRef) else ray.put(frozenset(key_set))
    return large.map_batches(
        _semi_filter_fn,
        fn_kwargs={"key_ref": ref, "column": column},
        batch_format="pyarrow",
    )


def _semi_filter_fn(batch: pa.Table, key_ref, column: str) -> pa.Table:
    import pyarrow.compute as pc

    from ..state.broadcast import state_key, task_state

    value_set = task_state(
        state_key("semiset", key_ref), lambda: pa.array(sorted(fetch(key_ref)))
    )
    return batch.filter(pc.is_in(batch.column(column), value_set=value_set))


# ----------------------------------------------------------------- range join


_RJ_BUCKET = "_rj_bucket"


def _bucket_points_fn(batch: pa.Table, ts_col: str, bucket_us: int) -> pa.Table:
    # floor (not trunc) so negative/pre-epoch timestamps bucket identically
    # to the numpy `//` used by the interval explode and the oracle SQL
    ts_us = pc.cast(batch.column(ts_col), pa.int64())
    return batch.append_column(_RJ_BUCKET, floor_div_i64(ts_us, bucket_us))


def _explode_intervals_fn(
    batch: pa.Table, start_col: str, end_col: str, bucket_us: int, closed: str
) -> pa.Table:
    """One output row per (interval, overlapped bucket), fully vectorized:
    np.repeat for the fan-out, cumsum-reset arange for the within-interval
    bucket offsets — no Python loop over rows, arbitrary interval spans."""
    import numpy as np

    s = pc.cast(batch.column(start_col), pa.int64()).to_numpy(zero_copy_only=False)
    e = pc.cast(batch.column(end_col), pa.int64()).to_numpy(zero_copy_only=False)
    b0 = s // bucket_us
    # half-open intervals never own the bucket that starts exactly at `end`
    b1 = (e if closed == "both" else np.maximum(e - 1, s)) // bucket_us
    counts = (b1 - b0 + 1).astype(np.int64)
    idx = np.repeat(np.arange(len(s), dtype=np.int64), counts)
    if len(idx) == 0:
        return batch.take(idx).append_column(_RJ_BUCKET, pa.array(idx))
    offs = np.arange(len(idx), dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    bucket = b0[idx] + (offs - starts[idx])
    return batch.take(idx).append_column(_RJ_BUCKET, pa.array(bucket))


def range_join(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_s: int,
    closed: str = "left",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Distributed non-equi range join: point rows to every interval row whose
    [start, end) (``closed="left"``) or [start, end] (``closed="both"``)
    contains the point's timestamp. No reference analog (the reference joins
    only on equality keys); this is the time-range join a training-data
    pipeline needs for window attribution.

    Scale shape: coarse time buckets of ``bucket_s`` seconds turn the range
    predicate into an equi-join — each interval is exploded to every bucket
    it overlaps (vectorized np.repeat, exactly once per bucket), each point
    lands in exactly ONE bucket, so every qualifying (point, interval) pair
    meets in exactly one partition of ONE hash-partitioned ``Dataset.join``
    and duplicates are impossible by construction. The exact containment
    filter runs vectorized after the join. Partitioning assumption: per-bucket
    cost is points_in_bucket × intervals_overlapping_bucket — pick
    ``bucket_s`` near the typical interval length (intervals then span ≤ 2
    buckets) and pre-filter/pre-aggregate hot buckets upstream if point
    density is very skewed. This materializes every qualifying PAIR — right
    only when the pairs themselves are the output. A consumer that
    aggregates per interval must use ``range_join_agg`` instead (the pair
    count is quadratic in density at fixed span: 518 s vs 9 s on the sf0.1
    shipments query).

    Timestamp columns on both sides must share one unit (timestamp[us] or
    int64); column names must be disjoint apart from the join bucket.
    """
    overlap = (set(points.schema().names) & set(intervals.schema().names)) - {
        point_ts
    }
    if overlap:
        raise ValueError(f"range_join sides share column names: {sorted(overlap)}")
    if closed not in ("left", "both"):
        raise ValueError("closed must be 'left' or 'both'")
    bucket_us = bucket_s * 1_000_000
    from .fastagg import drop_empty_blocks

    p = points.map_batches(
        _bucket_points_fn,
        fn_kwargs={"ts_col": point_ts, "bucket_us": bucket_us},
        batch_format="pyarrow",
    )
    iv = intervals.map_batches(
        _explode_intervals_fn,
        fn_kwargs={
            "start_col": start_col,
            "end_col": end_col,
            "bucket_us": bucket_us,
            "closed": closed,
        },
        batch_format="pyarrow",
    )
    joined = hash_join(
        drop_empty_blocks(p),
        drop_empty_blocks(iv),
        on=(_RJ_BUCKET,),
        num_partitions=num_partitions,
    )

    def containment(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column(point_ts), pa.int64())
        lo = pc.greater_equal(ts, pc.cast(batch.column(start_col), pa.int64()))
        hi_fn = pc.less_equal if closed == "both" else pc.less
        hi = hi_fn(ts, pc.cast(batch.column(end_col), pa.int64()))
        return batch.filter(pc.and_(lo, hi)).drop_columns([_RJ_BUCKET])

    return joined.map_batches(containment, batch_format="pyarrow")


def _iv_decompose_fn(
    batch: pa.Table, start_col: str, end_col: str, fine_us: int, closed: str
) -> pa.Table:
    """Decompose each interval into its touched fine buckets, flagging each
    (interval, bucket) row FULL (bucket ⊆ interval) or PARTIAL (boundary).
    ≤ 2 partial rows per interval; full fan-out = span/fine. Vectorized via
    the same repeat/cumsum machinery as ``_explode_intervals_fn``."""
    import numpy as np

    s = pc.cast(batch.column(start_col), pa.int64()).to_numpy(zero_copy_only=False)
    e = pc.cast(batch.column(end_col), pa.int64()).to_numpy(zero_copy_only=False)
    # integer-microsecond half-open view: [s, e] ≡ [s, e+1)
    e_x = e + 1 if closed == "both" else e
    e_x = np.maximum(e_x, s)  # empty intervals touch nothing
    b0 = s // fine_us
    b1 = np.maximum((e_x - 1) // fine_us, b0)  # last touched bucket
    counts = np.where(e_x > s, b1 - b0 + 1, 0).astype(np.int64)
    idx = np.repeat(np.arange(len(s), dtype=np.int64), counts)
    base = batch.drop_columns([start_col, end_col])
    if len(idx) == 0:
        out = base.take(idx)
        for name in (_RJ_BUCKET, "_rj_full", "_rj_s", "_rj_e"):
            typ = pa.bool_() if name == "_rj_full" else pa.int64()
            out = out.append_column(name, pa.array([], typ))
        return out
    offs = np.arange(len(idx), dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    bucket = b0[idx] + (offs - starts[idx])
    full = (bucket * fine_us >= s[idx]) & ((bucket + 1) * fine_us <= e_x[idx])
    return (
        base.take(idx)
        .append_column(_RJ_BUCKET, pa.array(bucket))
        .append_column("_rj_full", pa.array(full))
        .append_column("_rj_s", pa.array(s[idx]))
        .append_column("_rj_e", pa.array(e_x[idx]))
    )


_FINAL_COMBINE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def range_join_agg(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    point_ts: str,
    start_col: str,
    end_col: str,
    fine_s: int,
    aggs: list[tuple[str, str]],
    out_names: list[str] | None = None,
    closed: str = "left",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Aggregate points per containing interval WITHOUT materializing the
    point×interval pairs — the scale path for aggregate-after-range-join
    (``range_join`` + groupby would pay points_in_bucket ×
    intervals_in_bucket joined rows per bucket, which is quadratic in data
    density at fixed time span; measured 518 s vs ~5 s on the sf0.1
    shipments query).

    Exact decomposition: each interval splits into fully-covered fine
    buckets of ``fine_s`` seconds (joined against per-bucket PRE-AGGREGATED
    point partials — one row per bucket) plus ≤ 2 boundary buckets (joined
    against raw points, containment-filtered). Both contribution streams
    union into one Arrow-native grouped aggregation over the interval's
    carried columns. Decomposable aggs only: fn ∈ {count, sum, min, max}
    (count → sum of bucket counts + 1s; min/max → min/max of partials).
    Intervals with zero contained points do not appear (inner-join
    semantics, same as the pair-path + GROUP BY).

    Fan-out/granularity trade-off: full-bucket rows per interval =
    span/fine_s, boundary raw-point work per interval = points in ≤ 2 fine
    buckets. Pick ``fine_s`` so both are acceptable (e.g. 1 day for
    month-scale windows over date-grained points).
    """
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    overlap = (set(points.schema().names) & set(intervals.schema().names)) - {point_ts}
    if overlap:
        raise ValueError(f"range_join_agg sides share column names: {sorted(overlap)}")
    bad = [fn for _, fn in aggs if fn not in _FINAL_COMBINE]
    if bad:
        raise ValueError(f"non-decomposable agg fns: {bad}")
    if closed not in ("left", "both"):
        raise ValueError("closed must be 'left' or 'both'")
    fine_us = fine_s * 1_000_000
    if num_partitions is None:
        from ..tuning import default_join_partitions

        num_partitions = default_join_partitions()
    ikeys = [c for c in intervals.schema().names if c not in (start_col, end_col)]
    names = out_names or [f"{c}_{fn}" for c, fn in aggs]
    acols = sorted({c for c, _ in aggs})

    decomposed = intervals.map_batches(
        _iv_decompose_fn,
        fn_kwargs={
            "start_col": start_col,
            "end_col": end_col,
            "fine_us": fine_us,
            "closed": closed,
        },
        batch_format="pyarrow",
    ).materialize()  # consumed by both the full and the partial branch

    # explicit schemas: either branch can be EMPTY (day-aligned intervals
    # have no partial buckets; sub-bucket intervals have no full ones), and
    # an all-empty dataset must still present typed columns to the join
    iv_sch = intervals.schema()
    ityp = dict(zip(iv_sch.names, iv_sch.types))
    key_fields = [(c, ityp[c]) for c in ikeys]
    full_sch = pa.schema(key_fields + [(_RJ_BUCKET, pa.int64())])
    part_sch = pa.schema(
        key_fields
        + [(_RJ_BUCKET, pa.int64()), ("_rj_s", pa.int64()), ("_rj_e", pa.int64())]
    )
    full_iv = drop_empty_blocks(
        decomposed.map_batches(
            lambda t: t.filter(t.column("_rj_full")).select(ikeys + [_RJ_BUCKET]),
            batch_format="pyarrow",
        ),
        full_sch,
    )
    part_iv = drop_empty_blocks(
        decomposed.map_batches(
            lambda t: t.filter(pc.invert(t.column("_rj_full"))).select(
                ikeys + [_RJ_BUCKET, "_rj_s", "_rj_e"]
            ),
            batch_format="pyarrow",
        ),
        part_sch,
    )

    # narrow projection (bucket, ts, agg cols) materialized ONCE — consumed
    # by both branches; without the pin the whole upstream would re-execute
    # twice (fastagg note), and the projection keeps the pinned bytes to the
    # columns the aggregation actually needs
    pcols = [c for c in dict.fromkeys([point_ts] + acols)]
    p = points.map_batches(
        _bucket_points_fn,
        fn_kwargs={"ts_col": point_ts, "bucket_us": fine_us},
        batch_format="pyarrow",
    ).map_batches(
        lambda t: t.select([_RJ_BUCKET] + pcols), batch_format="pyarrow"
    ).materialize()

    # one pre-aggregated partial row per fine bucket — the full-branch join
    # is interval-bucket × bucket-row, never × raw points
    bucket_aggs = sorted_grouped_agg(
        p.map_batches(
            lambda t: t.select([_RJ_BUCKET] + acols), batch_format="pyarrow"
        ),
        [_RJ_BUCKET],
        aggs,
        out_names=names,
    )
    p_sch = points.schema()
    ptyp = dict(zip(p_sch.names, p_sch.types))

    def _out_type(c: str, fn: str):
        if fn == "count":
            return pa.int64()
        return ptyp[c]

    contrib_sch = pa.schema(
        key_fields + [(n, _out_type(c, fn)) for (c, fn), n in zip(aggs, names)]
    )

    def _empty_contrib():
        return ray.data.from_arrow(contrib_sch.empty_table())

    # materialized so the two hash joins NEVER run concurrently: each join
    # spins an aggregator pool sized to num_partitions, and two full-width
    # pools in one streaming topology starve each other's upstream tasks
    # (observed as a hard hang). The pin is narrow and ≈ fan-out-bounded
    # (≤ span/fine_s rows per interval). An EMPTY side never enters a join:
    # the hash shuffle forwards 0-row blocks as 0-column blocks and Acero
    # then rejects the key reference; drop_empty_blocks materializes, so
    # the count here is metadata-only.
    if full_iv.count() == 0:
        full_contrib = _empty_contrib()
    else:
        full_contrib = hash_join(
            full_iv, bucket_aggs, on=(_RJ_BUCKET,), num_partitions=num_partitions
        ).map_batches(
            lambda t: t.drop_columns([_RJ_BUCKET]), batch_format="pyarrow"
        ).materialize()

    raw_joined = (
        None
        if part_iv.count() == 0
        else hash_join(
            part_iv,
            drop_empty_blocks(p),
            on=(_RJ_BUCKET,),
            num_partitions=num_partitions,
        )
    )

    def partial_contrib(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column(point_ts), pa.int64())
        keep = pc.and_(
            pc.greater_equal(ts, batch.column("_rj_s")),
            pc.less(ts, batch.column("_rj_e")),
        )
        batch = batch.filter(keep)
        arrays, out_cols = [], []
        for col in ikeys:
            arrays.append(batch.column(col))
            out_cols.append(col)
        for (c, fn), name in zip(aggs, names):
            if fn == "count":
                arrays.append(
                    pc.cast(pc.is_valid(batch.column(c)), pa.int64())
                )
            else:
                arrays.append(batch.column(c))
            out_cols.append(name)
        return pa.Table.from_arrays(arrays, names=out_cols)

    part_contrib = (
        _empty_contrib()
        if raw_joined is None
        else raw_joined.map_batches(partial_contrib, batch_format="pyarrow")
    )

    combined = drop_empty_blocks(full_contrib.union(part_contrib), contrib_sch)
    return sorted_grouped_agg(
        combined,
        ikeys,
        [(name, _FINAL_COMBINE[fn]) for (_, fn), name in zip(aggs, names)],
        out_names=names,
    )


def skew_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    hot_top_n: int = 16,
    hot_min_share_ppm: int = 10_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Skew-safe inner join on one key: the handful of HOT keys (detected
    from the left side's combined per-batch counts — top ``hot_top_n`` keys
    holding ≥ ``hot_min_share_ppm`` of rows each) route through a
    broadcast probe, so a key owning 30% of the table never funnels 30% of
    the data into one hash partition; all remaining keys take the normal
    hash-partitioned join. Results union. Output rows are identical to a
    plain inner join (pinned by the SQL twin) — only the ROUTING differs.

    Documented assumption: the RIGHT side's rows for hot keys fit in one
    broadcast table (hot keys are few by definition; a dimension side has
    one row per key). If right-side hot rows were themselves huge, the pair
    volume IS the answer and no routing can shrink it.

    This is the named, reusable form of the salting/broadcast skew handling
    the checkpoint sharding and graph kernels apply internally (ray_guide
    "skew" pattern; reference analog: the hot-conversation salting called
    out in its partition plan)."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    # hot-key detection: per-batch combiners → key-cardinality merge →
    # driver reads only the top rows (bounded by hot_top_n)
    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("k", pa.string()), ("n", pa.int64())]
            ).empty_table()
        g = t.select([on]).group_by([on]).aggregate([(on, "count")])
        return pa.table(
            {"k": pc.cast(g.column(on), pa.string()), "n": g.column(f"{on}_count")}
        )

    left = left.materialize()  # consumed twice: detection + join
    counted = sorted_grouped_agg(
        left.map_batches(partial, batch_format="pyarrow"),
        ["k"],
        [("n", "sum")],
        out_names=["n"],
    )
    total = 0
    rows: list[tuple[str, int]] = []
    for bt in counted.iter_batches(batch_format="pyarrow", batch_size=None):
        if bt.num_rows:
            total += int(pc.sum(bt.column("n")).as_py() or 0)
            for k, n in zip(bt.column("k").to_pylist(), bt.column("n").to_pylist()):
                rows.append((k, int(n)))
    rows.sort(key=lambda kv: (-kv[1], kv[0]))
    cut = max(total, 1) * hot_min_share_ppm // 1_000_000
    hot = {k for k, n in rows[:hot_top_n] if n >= max(cut, 1)}

    if not hot:
        return hash_join(
            drop_empty_blocks(left),
            drop_empty_blocks(right),
            on=(on,),
            num_partitions=num_partitions,
        )

    hot_arr = pa.array(sorted(hot), pa.string())

    def split(t: pa.Table, want_hot: bool) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        m = pc.is_in(pc.cast(t.column(on), pa.string()), value_set=hot_arr)
        return t.filter(m if want_hot else pc.invert(m))

    right = right.materialize()  # consumed twice: hot collect + cold join
    hot_right_parts = [
        bt
        for bt in right.map_batches(
            lambda t: split(t, True), batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if bt.num_columns and bt.num_rows
    ]
    cold = hash_join(
        drop_empty_blocks(
            left.map_batches(lambda t: split(t, False), batch_format="pyarrow")
        ),
        drop_empty_blocks(
            right.map_batches(lambda t: split(t, False), batch_format="pyarrow")
        ),
        on=(on,),
        num_partitions=num_partitions,
    )
    if not hot_right_parts:
        return cold
    hot_tbl = pa.concat_tables(hot_right_parts).combine_chunks()
    hot_joined = broadcast_join(
        left.map_batches(lambda t: split(t, True), batch_format="pyarrow"),
        hot_tbl,
        on=(on,),
        how="inner",
    )
    return cold.union(hot_joined)


def interval_overlap_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_cols: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_s: int,
    overlap_col: str = "overlap_us",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Interval × interval overlap join within equality keys: every (left,
    right) pair sharing all ``key_cols`` whose HALF-OPEN intervals
    [start, end) overlap (``l_start < r_end AND r_start < l_end``), plus the
    exact ``overlap_col`` = min(ends) − max(starts) in µs. The temporal-
    overlap shape ``range_join`` (point ∈ interval) cannot express —
    sessions × validity windows, shifts × incidents, ad flights × browsing
    windows.

    Scale shape: both sides explode to every ``bucket_s``-second time bucket
    they overlap (the vectorized np.repeat explode shared with
    ``range_join``), meet in ONE hash-partitioned equi-join on
    (keys…, bucket), and duplicates are impossible by construction via the
    OWNERSHIP rule: a pair is emitted only in the bucket containing
    max(l_start, r_start) — a timestamp that lies inside BOTH intervals iff
    they overlap, so exactly one shared bucket owns each qualifying pair
    and no dedup shuffle ever runs. Zero-length [t, t) intervals are kept
    (they pair with intervals strictly containing t, at overlap 0 — the
    same rows the strict-< SQL twin emits).

    Partitioning assumption (same trade as ``range_join``): per-bucket join
    cost is left_rows_in_bucket × right_rows_in_bucket per key; pick
    ``bucket_s`` near the SHORTER side's typical span so that side stays in
    ≤ 2 buckets, and accept fan-out = span/bucket on the longer side. This
    materializes every qualifying PAIR — aggregate consumers should reduce
    the pairs immediately downstream. Both ts columns on each side must be
    timestamp[us] or int64 µs; the two sides' column names must be disjoint
    apart from ``key_cols``."""
    overlap_names = (
        set(left.schema().names) & set(right.schema().names)
    ) - set(key_cols)
    if overlap_names:
        raise ValueError(
            f"interval_overlap_join sides share column names: {sorted(overlap_names)}"
        )
    bucket_us = bucket_s * 1_000_000
    from ..arrow_util import strip_meta
    from .fastagg import drop_empty_blocks

    def _explode(side, start_col, end_col):
        # strip pandas schema metadata BEFORE the hash join — mismatched
        # metadata breaks the shuffle's schema dedup (arrow_util.strip_meta)
        def fn(batch: pa.Table) -> pa.Table:
            return _explode_intervals_fn(
                strip_meta(batch),
                start_col=start_col,
                end_col=end_col,
                bucket_us=bucket_us,
                closed="left",
            )

        return drop_empty_blocks(
            side.map_batches(fn, batch_format="pyarrow"), None
        )

    le = _explode(left, l_start, l_end)
    re_ = _explode(right, r_start, r_end)
    from ..tuning import default_join_partitions

    joined = le.join(
        re_,
        join_type="inner",
        num_partitions=num_partitions or default_join_partitions(),
        on=tuple(key_cols) + (_RJ_BUCKET,),
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        import numpy as np

        ls = pc.cast(t.column(l_start), pa.int64()).to_numpy(zero_copy_only=False)
        le_ = pc.cast(t.column(l_end), pa.int64()).to_numpy(zero_copy_only=False)
        rs = pc.cast(t.column(r_start), pa.int64()).to_numpy(zero_copy_only=False)
        re2 = pc.cast(t.column(r_end), pa.int64()).to_numpy(zero_copy_only=False)
        bkt = t.column(_RJ_BUCKET).to_numpy(zero_copy_only=False)
        mx = np.maximum(ls, rs)
        keep = (ls < re2) & (rs < le_) & (mx // bucket_us == bkt)
        out = t.drop_columns([_RJ_BUCKET]).take(pa.array(np.flatnonzero(keep)))
        ov = np.minimum(le_, re2)[keep] - mx[keep]
        return out.append_column(overlap_col, pa.array(ov, pa.int64()))

    # 0-column empty blocks (Ray forwards them schemaless) are scrubbed so
    # downstream consumers see one consistent schema
    return drop_empty_blocks(
        joined.map_batches(finish, batch_format="pyarrow"), None
    )


def bloom_prefilter_join(
    large: "ray.data.Dataset",
    small: "ray.data.Dataset",
    on: str,
    how: str = "inner",
    bits_per_key: int = 16,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Hash join with a BLOOM PREFILTER on the large side: build a compact
    bitmap of the small side's join keys, drop large-side rows whose key
    can't possibly match BEFORE the all-to-all shuffle, then run the exact
    hash join on the survivors. The row set is provably identical to the
    plain join (the bitmap admits false positives, never false negatives —
    the exact join removes them), so the oracle is the plain join's SQL —
    the ``skew_join`` contract.

    Why not ``semi_join_filter``'s exact key set? The bloom broadcast is a
    FIXED m/8-byte payload (``bits_per_key`` × distinct keys, rounded to a
    power of two) independent of key count and string length, and the
    per-batch probe is three vectorized int ops (hash, mask, bit-test)
    instead of an ``is_in`` against a giant value set — the right tier when
    the small side's distinct keys are millions of long strings. One-hash
    bloom: false-positive rate ≈ n/m = 1/bits_per_key (6% at 16) — tune
    ``bits_per_key`` to the shuffle volume saved per surviving row.

    Build shape: per-batch distinct bit positions (int64 rows, ≤ small-side
    rows total) stream to the driver which ORs them into the bitmap once —
    the only driver state is the fixed-size bitmap itself, then ``ray.put``
    broadcast. Probes memoize the fetched bitmap per worker."""
    import numpy as np

    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import drop_empty_blocks
    from ..stages.sampling import _hash60

    # size the bitmap to the small side's row count (upper bound on
    # distinct keys) rounded up to a power of two for mask math
    n_small = small.count()
    m = 1 << max(10, int(np.ceil(np.log2(max(n_small, 1) * bits_per_key))))
    mask = m - 1

    POS = pa.schema([("pos", pa.int64())])

    def positions(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return POS.empty_table()
        h = _hash60(t.column(on), "bloom") & mask
        return pa.table({"pos": pa.array(np.unique(h), pa.int64())})

    bitmap = np.zeros(m // 64, dtype=np.uint64)
    for b in (
        drop_empty_blocks(
            small.map_batches(positions, batch_format="pyarrow"), POS
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        p = b.column("pos").to_numpy(zero_copy_only=False)
        np.bitwise_or.at(
            bitmap, p >> 6, np.uint64(1) << (p.astype(np.uint64) & np.uint64(63))
        )
    bm_ref = broadcast(bitmap)

    def prefilter(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        bm = task_state(state_key("bloom_bm", bm_ref), lambda: ray.get(bm_ref))
        h = _hash60(t.column(on), "bloom") & mask
        hit = (bm[h >> 6] >> (h.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
        return t.take(pa.array(np.flatnonzero(hit != 0)))

    survivors = drop_empty_blocks(
        large.map_batches(prefilter, batch_format="pyarrow"), None
    )
    return hash_join(
        survivors,
        drop_empty_blocks(small, None),
        on=(on,),
        how=how,
        num_partitions=num_partitions,
    )
