"""Generic relational operators — grouped aggregates with partial pre-agg,
per-group ranks/top-k, percentile buckets, distribution stats, sorted-distinct
collect — the Ray Data expressions of the reference's post-import aggregation
engine (SURVEY.md §2.5/§2.6; ``scripts/post-import.cypher``).

Numeric convention: money-like doubles are converted to integer cents via
``np.rint(x*100)`` at the operator boundary so grouped sums are EXACT integer
arithmetic — immune to float summation order, matching DuckDB oracles
bit-for-bit at any parallelism (the determinism discipline of SURVEY §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..arrow_util import pa_from_pandas


def to_cents(batch: pa.Table, cols: dict[str, str]) -> pa.Table:
    """Append integer-cents columns: {src_col: out_col}. rint is safe because
    inputs are cents-valued ± float error, never exactly half-cent."""
    for src, out in cols.items():
        vals = batch.column(src).to_numpy(zero_copy_only=False)
        batch = batch.append_column(
            out, pa.array(np.rint(vals * 100).astype(np.int64))
        )
    return batch


def preaggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    sums: list[str],
    count_alias: str = "n",
) -> "ray.data.Dataset":
    """Partial-aggregate inside map_batches (one row per key per batch), then
    a small final groupby — the combiner pattern: the all-to-all shuffle moves
    pre-combined rows, not the raw table."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + sums).to_pandas()
        g = df.groupby(keys, sort=False, dropna=False)
        out = g[sums].sum() if sums else g.size().to_frame("_")
        out[count_alias] = g.size()
        return pa_from_pandas(out.reset_index())

    # final reduce on the Arrow-native path: key cardinality is often small
    # for rollups but DATA-PROPORTIONAL for e.g. (user, hour) buckets, and
    # fastagg wins even at 100 groups (no per-group Python)
    from .fastagg import sorted_grouped_agg

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg_specs = [(count_alias, "sum")] + [(c, "sum") for c in sums]
    out_names = [count_alias] + list(sums)
    return sorted_grouped_agg(partials, keys, agg_specs, out_names=out_names)


def top_k_per_group(
    ds: "ray.data.Dataset",
    keys: list[str],
    order_by: list[tuple[str, bool]],
    k: int,
    rank_col: str | None = "rank",
    presalt: int | None = None,
) -> "ray.data.Dataset":
    """Deterministic per-group top-k: multi-key sort with explicit tie-break
    columns in ``order_by`` (post-import.cypher:699-701 ordering discipline).

    Implemented as ``ranked_over`` (global range-partitioned sort +
    order-preserving split numbering) + a rank filter — row_number semantics
    with NO per-group task materialization and no per-group Python, so both
    hot keys (one group ≫ one block) and data-proportional group counts are
    safe. ``presalt`` is accepted for API compatibility and ignored: the
    sort-based path needs no salting (nothing ever holds a whole group)."""
    import pyarrow.compute as pc

    ranked = ranked_over(ds, keys, order_by, rank_col=rank_col or "_rank")
    rc = rank_col or "_rank"

    def head(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column(rc), k))
        return t.drop_columns(["_rank"]) if rank_col is None else t

    return ranked.map_batches(head, batch_format="pyarrow")


def global_top_k(
    ds: "ray.data.Dataset", order_by: list[tuple[str, bool]], k: int
) -> "ray.data.Dataset":
    """sort + limit; Ray's distributed sort does a sampled range partition."""
    cols = [c for c, _ in order_by]
    desc = [not a for _, a in order_by]
    return ds.sort(cols, descending=desc).limit(k)


BROADCAST_GROUP_STATS_MAX = 200_000


def ranked_over(
    ds: "ray.data.Dataset",
    keys: list[str],
    order_by: list[tuple[str, bool]],
    rank_col: str = "rank",
    *,
    with_group_size: bool = False,
) -> "ray.data.Dataset":
    """Per-group ``row_number()`` WITHOUT materializing any group in one task
    — the scale-safe replacement for whole-group ``map_groups`` ranking (a
    low-cardinality skewed key, e.g. one predicate holding most edges, lands
    an unbounded group in a single pandas task under map_groups).

    Shape: one global range-partitioned sort on (keys…, order_by…) → order-
    preserving global row index (``zip_with_index`` split numbering, the
    canonical-id machinery from stages/canonicalize.py) → per-group min index
    (and optional count) via a combiner aggregate → rank = idx − group_min +
    1. The per-group stats table is group-cardinality-sized: broadcast-joined
    when small (no shuffle, immune to hot keys), hash-joined beyond
    ``BROADCAST_GROUP_STATS_MAX`` (many groups ⇒ no single group is hot).

    ``order_by`` entries are (column, ascending). Include explicit unique
    tie-break columns — determinism must come from the sort, never from
    block arrival order. With ``with_group_size`` the output also carries a
    ``_gn`` column (group row count) for percentile-style finalizers.
    """
    import pyarrow.compute as pc

    from .canonicalize import zip_with_index
    from .joins import broadcast_join

    cols = list(keys) + [c for c, _ in order_by]
    desc = [False] * len(keys) + [not asc for _, asc in order_by]
    # materialized: consumed twice (group stats + the join back); empty
    # blocks pruned — this can be a join side and Ray's join breaks on them
    from .fastagg import drop_empty_blocks

    idxed = drop_empty_blocks(zip_with_index(ds.sort(cols, descending=desc), col="_gidx"))

    from .fastagg import sorted_grouped_agg

    agg_specs = [("_gidx", "min")]
    out_names = ["_gstart"]
    if with_group_size:
        agg_specs.append(("_gidx", "count"))
        out_names.append("_gn")
    stats = sorted_grouped_agg(
        idxed.select_columns(keys + ["_gidx"]), keys, agg_specs, out_names=out_names
    ).materialize()

    if stats.count() <= BROADCAST_GROUP_STATS_MAX:
        joined = broadcast_join(idxed, stats.to_pandas(), on=keys, how="inner")
    else:
        joined = idxed.join(
            stats,
            join_type="inner",
            num_partitions=max(32, stats.count() // 500_000),
            on=tuple(keys),
        )

    def finish(t: pa.Table) -> pa.Table:
        rank = pc.add(pc.subtract(t.column("_gidx"), t.column("_gstart")), 1)
        out = t.drop_columns(["_gidx", "_gstart"])
        return out.append_column(rank_col, pc.cast(rank, pa.int64()))

    return joined.map_batches(finish, batch_format="pyarrow")


def percentile_buckets(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    id_col: str,
) -> "ray.data.Dataset":
    """Per-group rank (value desc, id asc), integer percentile 0..100 and
    bucket — A5 analog (post-import.cypher:742-762). Integer math only:
    pct = (n - rank) * 100 // (n - 1); bucket thresholds 90/75/25.

    Scale shape: ``ranked_over`` (global sort + split numbering) — a group
    is NEVER materialized in one task, so billion-row event types rank fine."""
    ranked = ranked_over(
        ds,
        keys,
        [(value_col, False), (id_col, True)],
        rank_col="rnk",
        with_group_size=True,
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rnk = batch.column("rnk").to_numpy(zero_copy_only=False)
        n = batch.column("_gn").to_numpy(zero_copy_only=False)
        pct = np.where(n > 1, (n - rnk) * 100 // np.maximum(n - 1, 1), 100)
        bucket = np.select(
            [pct >= 90, pct >= 75, pct >= 25], ["top10", "top25", "mid"], "low"
        )
        out = batch.drop_columns(["_gn"])
        return out.append_column("pct", pa.array(pct, pa.int64())).append_column(
            "bucket", pa.array(bucket, pa.string())
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


def distribution_stats(
    ds: "ray.data.Dataset", keys: list[str], value_col: str,
    method: str = "cont",
) -> "ray.data.Dataset":
    """Per-group n/min/max/q1/median/q3 (A6 analog, post-import.cypher:
    339-350). ``method="cont"``: linear interpolation over integer-valued
    doubles — exact in float64, identical to DuckDB ``quantile_cont``.
    ``method="disc"``: discrete quantiles (numpy ``inverted_cdf`` ==
    DuckDB ``quantile_disc``) — the assay variant
    (post-import.cypher:1203-1214 uses percentileDisc).

    Scale shape: exact quantiles WITHOUT materializing a group in one task —
    ``ranked_over`` assigns per-group value ranks via the global sort; each
    quantile needs only its two bracketing ranked rows (the markers), so a
    vectorized pass keeps ≤ 8 marker rows per group and one Arrow-native
    grouped min folds them into the closed-form interpolation. A hot group
    with billions of rows costs any task only its sorted-block share."""
    QS = (0.25, 0.5, 0.75)
    qnames = ("q1", "median", "q3")

    ranked = ranked_over(
        ds.select_columns(keys + [value_col]),
        keys,
        [(value_col, True)],
        rank_col="_rnk",
        with_group_size=True,
    )

    def markers(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            cols = {k: pa.array([], pa.string()) for k in keys}
            cols["_n"] = pa.array([], pa.int64())
            for qn in qnames:
                cols[f"_{qn}_lo"] = pa.array([], pa.float64())
                cols[f"_{qn}_hi"] = pa.array([], pa.float64())
            cols["_min"] = pa.array([], pa.float64())
            cols["_max"] = pa.array([], pa.float64())
            return pa.table(cols)
        rnk = t.column("_rnk").to_numpy(zero_copy_only=False)
        n = t.column("_gn").to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = np.zeros(len(rnk), dtype=bool)
        marks: dict[str, np.ndarray] = {}
        for q, qn in zip(QS, qnames):
            if method == "cont":
                pos = (n - 1) * q
                lo = np.floor(pos).astype(np.int64) + 1
                hi = np.ceil(pos).astype(np.int64) + 1
            else:  # disc = inverted_cdf: 0-based index ceil(q*n) - 1
                lo = np.maximum(np.ceil(q * n).astype(np.int64), 1)
                hi = lo
            m_lo = rnk == lo
            m_hi = rnk == hi
            marks[f"_{qn}_lo"] = np.where(m_lo, v, np.nan)
            marks[f"_{qn}_hi"] = np.where(m_hi, v, np.nan)
            keep |= m_lo | m_hi
        m_min = rnk == 1
        m_max = rnk == n
        marks["_min"] = np.where(m_min, v, np.nan)
        marks["_max"] = np.where(m_max, v, np.nan)
        keep |= m_min | m_max
        idx = pa.array(np.flatnonzero(keep))
        cols = {k: t.column(k).take(idx) for k in keys}
        cols["_n"] = pa.array(n[keep].astype(np.int64))
        for name, arr in marks.items():
            sel = arr[keep]
            cols[name] = pa.array(sel, pa.float64(), mask=np.isnan(sel))
        return pa.table(cols)

    marked = ranked.map_batches(markers, batch_format="pyarrow")
    from .fastagg import sorted_grouped_agg

    agg_specs = [("_n", "max")]
    out_names = ["n"]
    for qn in qnames:
        agg_specs += [(f"_{qn}_lo", "min"), (f"_{qn}_hi", "min")]
        out_names += [f"_{qn}_lo", f"_{qn}_hi"]
    agg_specs += [("_min", "min"), ("_max", "min")]
    out_names += ["min_v", "max_v"]
    stats = sorted_grouped_agg(marked, keys, agg_specs, out_names=out_names)

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        out_cols: dict[str, object] = {k: t.column(k) for k in keys}
        out_cols["n"] = pc.cast(t.column("n"), pa.int64())
        out_cols["min_v"] = t.column("min_v")
        out_cols["max_v"] = t.column("max_v")
        for q, qn in zip(QS, qnames):
            lo = t.column(f"_{qn}_lo").to_numpy(zero_copy_only=False)
            hi = t.column(f"_{qn}_hi").to_numpy(zero_copy_only=False)
            if method == "cont":
                pos = (n - 1) * q
                frac = pos - np.floor(pos)
                val = lo + (hi - lo) * frac  # numpy 'linear' formula exactly
            else:
                val = lo
            out_cols[qn] = pa.array(val, pa.float64())
        order = keys + ["n", "min_v", "max_v", "q1", "median", "q3"]
        return pa.table({c: out_cols[c] for c in order})

    return stats.map_batches(finalize, batch_format="pyarrow")


def majority_vote(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    out_col: str = "consensus",
) -> "ray.data.Dataset":
    """Per-group most-common value with deterministic tie-break (count desc,
    value asc) — the consensus aggregate (A13 analog; reference:
    ``ortholog_group_adapter.py:51-81`` most-common non-excluded product/name).

    Two-phase: partial (keys+value) counts inside map_batches shrink the
    shuffle to distinct combinations; the final per-key argmax packs
    (count desc, value asc) into one lexicographic key and takes an
    Arrow-native grouped MIN — zero per-group Python, so entity-proportional
    key spaces are safe (stages/fastagg.py)."""
    import numpy as np
    import pyarrow.compute as pc

    from .fastagg import sorted_grouped_agg

    BIG = 10**12
    sch = ds.schema()
    vtype = dict(zip(sch.names, sch.types))[value_col]
    if not isinstance(vtype, pa.DataType):  # pandas-backed: numpy dtype
        try:
            vtype = pa.from_numpy_dtype(vtype)
        except (pa.ArrowNotImplementedError, TypeError):
            vtype = pa.string()  # object dtype → string values
    is_utf8 = pa.types.is_string(vtype) or pa.types.is_large_string(vtype)
    counted = preaggregate(ds.select_columns(keys + [value_col]), keys + [value_col], [])

    # non-string values pack through an ORDER-PRESERVING fixed-width string
    # encoding (int: flip the sign bit of the two's-complement bits; float:
    # IEEE-754 total-order bit trick; both bijective), so the lexicographic
    # min keeps the numeric value-asc tie-break (ADVICE r2: the utf8-only
    # pack raised on non-string columns and changed their tie-break).
    # Caveat shared with the SQL twin: utf8 values must not contain NUL.
    def _encode(col: pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
        if is_utf8:
            return col
        v = col.to_numpy(zero_copy_only=False)
        if pa.types.is_floating(vtype):
            b = np.ascontiguousarray(v, dtype=np.float64).view(np.uint64)
            u = np.where(b >> np.uint64(63) != 0, ~b, b | np.uint64(1 << 63))
        else:  # ints / bools via int64 two's complement
            u = np.ascontiguousarray(v, dtype=np.int64).view(np.uint64) ^ np.uint64(1 << 63)
        return pc.utf8_lpad(pc.cast(pa.array(u, pa.uint64()), pa.string()), 20, "0")

    def _decode(arr: pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
        if is_utf8:
            return pc.cast(arr, vtype)
        u = pc.cast(arr, pa.uint64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        if pa.types.is_floating(vtype):
            b = np.where(u >> np.uint64(63) != 0, u & ~np.uint64(1 << 63), ~u)
            return pa.array(b.view(np.float64)).cast(vtype)
        return pa.array((u ^ np.uint64(1 << 63)).view(np.int64)).cast(vtype)

    def pack(t: pa.Table) -> pa.Table:
        inv = pc.utf8_lpad(
            pc.cast(pc.subtract(pa.scalar(BIG, pa.int64()), pc.cast(t.column("n"), pa.int64())), pa.string()),
            12,
            "0",
        )
        val = _encode(t.column(value_col))
        packed = pc.binary_join_element_wise(inv, pc.cast(val, pa.string()), "\x00")
        return t.select(keys).append_column("_pack", packed)

    winner = sorted_grouped_agg(
        counted.map_batches(pack, batch_format="pyarrow"),
        keys,
        [("_pack", "min")],
        out_names=["_pack"],
    )

    def unpack(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("_pack"), "\x00", max_splits=1)
        n = pc.subtract(
            pa.scalar(BIG, pa.int64()),
            pc.cast(pc.list_element(parts, 0), pa.int64()),
        )
        return (
            t.drop_columns(["_pack"])
            .append_column(out_col, _decode(pc.list_element(parts, 1)))
            .append_column("n_votes", n)
        )

    return winner.map_batches(unpack, batch_format="pyarrow")


def replicate_stats(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    round_decimals: int = 4,
) -> "ray.data.Dataset":
    """Per-group replicate aggregation: (n, n_non_zero, mean, sd,
    detection_status ∈ {detected, sporadic, not_detected}) — M16 analog
    (``metabolite_assay_adapter.py:106-169``).

    value_col must be INTEGER-valued (cents convention): partials accumulate
    exact integer (sum, sum_sq, n, n_non_zero); mean/sd are computed once from
    the exact totals in float64 and rounded, so any parallelism and any DuckDB
    oracle using the same closed form agree."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + [value_col]).to_pandas()
        v = df[value_col]
        df["_sum"] = v
        df["_sumsq"] = v * v
        df["_nz"] = (v != 0).astype("int64")
        g = df.groupby(keys, sort=False, dropna=False)
        out = g[["_sum", "_sumsq", "_nz"]].sum()
        out["_n"] = g.size()
        return pa_from_pandas(out.reset_index())

    from .fastagg import sorted_grouped_agg

    totals = sorted_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys,
        [("_sum", "sum"), ("_sumsq", "sum"), ("_nz", "sum"), ("_n", "sum")],
        out_names=["_sum", "_sumsq", "n_non_zero", "n"],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = df["n"].to_numpy(dtype=np.float64)
        s = df["_sum"].to_numpy(dtype=np.float64)
        sq = df["_sumsq"].to_numpy(dtype=np.float64)
        mean = s / n
        # sample variance from exact totals: (sumsq - sum^2/n) / (n-1)
        # n == 1 → sd 0.0 by convention (NOT NaN/NULL: engines disagree on
        # NaN identity, a deterministic sentinel keeps oracles hash-equal)
        with np.errstate(invalid="ignore", divide="ignore"):
            var = np.where(n > 1, (sq - s * s / n) / np.maximum(n - 1, 1), 0.0)
        sd = np.sqrt(np.maximum(var, 0.0))
        df["mean_v"] = np.round(mean, round_decimals)
        df["sd_v"] = np.round(sd, round_decimals)
        nz = df["n_non_zero"].to_numpy()
        df["detection_status"] = np.select(
            [nz == df["n"].to_numpy(), nz == 0], ["detected", "not_detected"], "sporadic"
        )
        return pa_from_pandas(
            df[keys + ["n", "n_non_zero", "mean_v", "sd_v", "detection_status"]]
        )

    return totals.map_batches(finalize, batch_format="pyarrow")


def categorical_distribution(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    sep: str = ",",
) -> "ray.data.Dataset":
    """Per-group categorical distribution as PARALLEL sorted arrays
    (labels, counts) — A7 analog (post-import.cypher:366-373). Arrays are
    rendered as joined strings in label-sorted order for hash-stable compare.
    Segmented ``sorted_collect`` over the counted pairs — no whole-group
    tasks at parent-entity-proportional key counts."""
    import pyarrow.compute as pc

    counted = preaggregate(ds.select_columns(keys + [value_col]), keys + [value_col], [])

    def n_to_str(t: pa.Table) -> pa.Table:
        return t.append_column("_n_str", pc.cast(pc.cast(t.column("n"), pa.int64()), pa.string()))

    pairs = counted.map_batches(n_to_str, batch_format="pyarrow")
    return sorted_collect(
        pairs, keys, value_col, [(value_col, "labels"), ("_n_str", "counts")], sep=sep
    )


def flag_counts(
    ds: "ray.data.Dataset", keys: list[str], bool_col: str
) -> "ray.data.Dataset":
    """Per-group true/false counts — A8 analog (post-import.cypher:355-361):
    sums over a 0/1 mask pre-combined in map_batches."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + [bool_col]).to_pandas()
        df["n_true"] = df[bool_col].astype("int64")
        df["n_false"] = 1 - df["n_true"]
        g = df.groupby(keys, sort=False, dropna=False)
        return pa_from_pandas(
            g[["n_true", "n_false"]].sum().reset_index()
        )

    from .fastagg import sorted_grouped_agg

    return sorted_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys,
        [("n_true", "sum"), ("n_false", "sum")],
        out_names=["n_true", "n_false"],
    )


def tree_rollup(
    ds: "ray.data.Dataset",
    leaf_key: str,
    closure: pd.DataFrame,
    count_alias: str = "n_leaves",
) -> "ray.data.Dataset":
    """Subtree rollup (A11 analog, post-import.cypher:840-911): per hierarchy
    node, count of leaves in its subtree. ``closure`` is the driver-computed
    ancestry closure (leaf_key → node_id, node_level) of a SMALL tree
    (hierarchies are 10²–10⁴ nodes, SURVEY §2.9) broadcast into a map_batches
    probe; only the leaf fan-out is distributed."""
    from .joins import broadcast_join

    joined = broadcast_join(
        ds.select_columns([leaf_key]), closure, on=[leaf_key], how="inner"
    )
    return preaggregate(
        joined.select_columns(["node_id", "node_level"]),
        keys=["node_id", "node_level"],
        sums=[],
        count_alias=count_alias,
    )


def sorted_collect(
    ds: "ray.data.Dataset",
    keys: list[str],
    order_col: str,
    join_specs: list[tuple[str, str]],
    sep: str = ",",
) -> "ray.data.Dataset":
    """Per-key ordered string-collect WITHOUT whole-group tasks — the
    scale shape behind the A2/A7 collect rollups.

    ``ds`` rows must be UNIQUE on (keys, order_col) (callers distinct /
    pre-count first). One global sort on (keys…, order_col) → per-block
    pandas join of each key's segment (a key interior to a block is
    complete); only each block's first/last key's segment-partials — one
    row per (key, block), already joined strings — flow to a single stitch
    task that concatenates them in order. The per-key Python cost is
    building the output string itself (inherent to the format), distributed
    across blocks, never Ray's per-group reduce."""
    import pyarrow as pa

    out_fields = [(src, out) for src, out in join_specs]
    OUT_SCHEMA = None  # built after first schema peek below

    sch = ds.schema()
    key_types = {n: t for n, t in zip(sch.names, sch.types)}
    OUT_SCHEMA = pa.schema(
        [pa.field(k, key_types[k]) for k in keys]
        + [pa.field(out, pa.string()) for _, out in out_fields]
    )
    MID_SCHEMA = pa.schema(
        list(OUT_SCHEMA)
        + [pa.field("_first_order", key_types[order_col]), pa.field("_edge", pa.bool_())]
    )

    def block_collect(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID_SCHEMA.empty_table()
        df = t.to_pandas()
        first_key = tuple(df.iloc[0][k] for k in keys)
        last_key = tuple(df.iloc[-1][k] for k in keys)
        g = df.groupby(keys, sort=False)
        agg_kw = {out: (src, lambda s: sep.join(str(v) for v in s)) for src, out in out_fields}
        agg_kw["_first_order"] = (order_col, lambda s: s.iloc[0])
        res = g.agg(**agg_kw).reset_index()
        kt = res[keys].apply(tuple, axis=1)
        res["_edge"] = (kt == first_key) | (kt == last_key)
        return pa_from_pandas(res).cast(MID_SCHEMA)

    def interior_fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_columns == 0 or t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        return t.filter(pc.invert(t.column("_edge"))).drop_columns(
            ["_first_order", "_edge"]
        )

    def stitch(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        df = t.drop_columns(["_edge"]).to_pandas()
        df = df.sort_values(keys + ["_first_order"], kind="mergesort")
        g = df.groupby(keys, sort=False)
        agg_kw = {out: (out, lambda s: sep.join(s)) for _, out in out_fields}
        res = g.agg(**agg_kw).reset_index()
        return pa_from_pandas(res).cast(OUT_SCHEMA)

    from .fastagg import drop_empty_blocks

    tagged = (
        ds.sort(keys + [order_col])
        .map_batches(block_collect, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    interior = tagged.map_batches(interior_fn, batch_format="pyarrow")
    edges = (
        tagged.map_batches(
            lambda t: t.filter(t.column("_edge")) if t.num_columns else MID_SCHEMA.empty_table(),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(stitch, batch_format="pyarrow", batch_size=None, concurrency=1)
    )
    return drop_empty_blocks(interior.union(edges), OUT_SCHEMA)


def collect_sorted_distinct(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    out_col: str,
    sep: str = ",",
) -> "ray.data.Dataset":
    """Per-group sorted distinct values joined to a string — the collect_set
    rollup (A2 analog) in a hash-stable representation. Distributed distinct
    first, then the segmented ``sorted_collect`` — no whole-group tasks."""
    from .fastagg import sorted_distinct

    pairs = sorted_distinct(ds.select_columns(keys + [value_col]), keys + [value_col])
    return sorted_collect(pairs, keys, value_col, [(value_col, out_col)], sep=sep)


def rollup_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    sums: list[str],
    count_alias: str = "n",
) -> "ray.data.Dataset":
    """``GROUP BY ROLLUP(keys...)`` — grouping sets (k1..kn), (k1..kn-1), …,
    (): every prefix level plus the grand total, with NULLs in the
    grouped-out key columns (the reference's layered publication→experiment→
    organism rollups, post-import.cypher:186-201/287-309, expressed as one
    operator).

    Scale shape: the DATA-PROPORTIONAL aggregation happens exactly once (the
    finest-level combiner pre-agg + one fastagg shuffle); every coarser level
    re-aggregates the finest-level PARTIAL — group-count-proportional input,
    never the raw table — so an n-level rollup costs one full pass plus n−1
    passes over shrinking aggregate tables. Sums must be pre-quantized ints
    (the cents discipline) so re-aggregation is exact at any level."""
    from .fastagg import sorted_grouped_agg

    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    out_names = keys + [count_alias] + list(sums)

    finest = preaggregate(ds, keys, sums, count_alias).materialize()
    levels = [finest]
    agg_specs = [(count_alias, "sum")] + [(c, "sum") for c in sums]
    agg_out = [count_alias] + list(sums)
    for i in range(len(keys) - 1, -1, -1):
        kept = keys[:i]
        dropped = keys[i:]
        if kept:
            lvl = sorted_grouped_agg(finest, kept, agg_specs, out_names=agg_out)
        else:
            # grand total: one global combine of the finest partials
            import pandas as pd

            tot = finest.select_columns(agg_out).to_pandas().sum()
            lvl = ray.data.from_arrow(
                pa.table({c: pa.array([int(tot[c])], pa.int64()) for c in agg_out})
            )

        OUT_SCHEMA = pa.schema(
            [(k, typ[k]) for k in keys] + [(c, pa.int64()) for c in agg_out]
        )

        def pad(t: pa.Table, _dropped=tuple(dropped)) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return OUT_SCHEMA.empty_table()
            for c in _dropped:
                t = t.append_column(c, pa.nulls(t.num_rows, typ[c]))
            return t.select(out_names)

        levels.append(lvl.map_batches(pad, batch_format="pyarrow"))

    OUT_SCHEMA = pa.schema(
        [(k, typ[k]) for k in keys] + [(c, pa.int64()) for c in agg_out]
    )
    out = levels[0].map_batches(
        lambda t: t.select(out_names)
        if t.num_columns
        else OUT_SCHEMA.empty_table(),
        batch_format="pyarrow",
    )
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def filter_above_group_quantile(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    q: float = 0.99,
) -> "ray.data.Dataset":
    """Per-group outlier filter: keep rows with ``value_col`` strictly above
    the group's discrete ``q``-quantile (inverted_cdf == DuckDB
    ``quantile_disc`` — an actual element, so the comparison is exact on
    quantized ints; no interpolation float ever enters the predicate).

    Scale shape: thresholds come from ``ranked_over`` (global sort; a hot
    group costs its block share) — the rank matching ceil(q·n) is picked
    per block, ONE row per group survives, the group-count-bounded
    threshold table broadcasts once, and the input streams through a
    stateless lookup filter. Two passes over the data, zero per-group
    tasks."""
    ranked = ranked_over(
        ds.select_columns(keys + [value_col]),
        keys,
        [(value_col, True)],
        rank_col="_rnk",
        with_group_size=True,
    )

    def pick(t: pa.Table) -> pa.Table:
        empty_cols = {k: pa.array([], pa.string()) for k in keys}
        empty_cols["_thr"] = pa.array([], pa.int64())
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(empty_cols)
        rnk = t.column("_rnk").to_numpy(zero_copy_only=False)
        n = t.column("_gn").to_numpy(zero_copy_only=False)
        target = np.maximum(np.ceil(q * n).astype(np.int64), 1)
        keep = rnk == target
        idx = pa.array(np.flatnonzero(keep))
        cols = {k: t.column(k).take(idx) for k in keys}
        cols["_thr"] = pc.cast(t.column(value_col).take(idx), pa.int64())
        return pa.table(cols)

    thr_tbl = pa.concat_tables(
        [
            b
            for b in ranked.map_batches(pick, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None
            )
            if b.num_columns
        ]
    ).combine_chunks()

    from ..state.broadcast import broadcast, state_key, task_state

    thr_ref = broadcast(thr_tbl)

    def flt(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        def build():
            tb = ray.get(thr_ref) if not isinstance(thr_ref, pa.Table) else thr_ref
            key_rows = list(zip(*[tb.column(k).to_pylist() for k in keys]))
            return dict(zip(key_rows, tb.column("_thr").to_pylist()))
        index = task_state(state_key("gq_thr", thr_ref), build)
        import pandas as pd

        key_df = t.select(keys).to_pandas()
        thr = np.array(
            [index.get(k, np.iinfo(np.int64).max) for k in key_df.itertuples(index=False, name=None)],
            dtype=np.int64,
        )
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(v > thr))

    return ds.map_batches(flt, batch_format="pyarrow")


def clip_to_group_quantiles(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    q_lo: float = 0.01,
    q_hi: float = 0.99,
    out_col: str = "clipped",
) -> "ray.data.Dataset":
    """Per-group winsorization: append ``out_col`` = ``value_col`` clipped to
    the group's [q_lo, q_hi] DISCRETE quantiles (inverted_cdf — actual group
    elements, so the clamp is exact integer comparison; mirrors DuckDB
    ``quantile_disc`` + ``least``/``greatest``). The standard outlier
    treatment when dropping rows (``filter_above_group_quantile``) would
    bias counts — sensor spikes, price glitches, token-count outliers get
    clamped instead of removed.

    Same two-pass scale shape as the filter: one ``ranked_over`` pass picks
    the TWO boundary elements per group, the group-count-bounded (key, lo,
    hi) table broadcasts once, the input streams through a stateless clamp.
    No group ever occupies one task.
    """
    if not 0.0 <= q_lo <= q_hi <= 1.0:
        raise ValueError("need 0 <= q_lo <= q_hi <= 1")
    ranked = ranked_over(
        ds.select_columns(keys + [value_col]),
        keys,
        [(value_col, True)],
        rank_col="_rnk",
        with_group_size=True,
    )

    def pick(t: pa.Table) -> pa.Table:
        empty_cols = {k: pa.array([], pa.string()) for k in keys}
        empty_cols["_q"] = pa.array([], pa.string())
        empty_cols["_thr"] = pa.array([], pa.int64())
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(empty_cols)
        rnk = t.column("_rnk").to_numpy(zero_copy_only=False)
        n = t.column("_gn").to_numpy(zero_copy_only=False)
        parts = []
        for tag, q in (("lo", q_lo), ("hi", q_hi)):
            target = np.maximum(np.ceil(q * n).astype(np.int64), 1)
            idx = pa.array(np.flatnonzero(rnk == target))
            cols = {k: t.column(k).take(idx) for k in keys}
            cols["_q"] = pa.array([tag] * len(idx), pa.string())
            cols["_thr"] = pc.cast(t.column(value_col).take(idx), pa.int64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    thr_tbl = pa.concat_tables(
        [
            b
            for b in ranked.map_batches(pick, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None
            )
            if b.num_columns
        ]
    ).combine_chunks()

    from ..state.broadcast import broadcast, state_key, task_state

    thr_ref = broadcast(thr_tbl)

    def clamp(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        def build():
            tb = ray.get(thr_ref) if not isinstance(thr_ref, pa.Table) else thr_ref
            lo_d: dict = {}
            hi_d: dict = {}
            key_rows = list(zip(*[tb.column(k).to_pylist() for k in keys]))
            for krow, tag, thr in zip(
                key_rows, tb.column("_q").to_pylist(), tb.column("_thr").to_pylist()
            ):
                (lo_d if tag == "lo" else hi_d)[krow] = thr
            return lo_d, hi_d

        lo_d, hi_d = task_state(state_key("gq_clip", thr_ref), build)
        key_df = t.select(keys).to_pandas()
        ktup = list(key_df.itertuples(index=False, name=None))
        lo = np.array(
            [lo_d.get(k, np.iinfo(np.int64).min) for k in ktup], dtype=np.int64
        )
        hi = np.array(
            [hi_d.get(k, np.iinfo(np.int64).max) for k in ktup], dtype=np.int64
        )
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(out_col, pa.array(np.clip(v, lo, hi), pa.int64()))

    return ds.map_batches(clamp, batch_format="pyarrow")


def key_skew_report(
    ds: "ray.data.Dataset",
    key_col: str,
    top_n: int = 20,
) -> "ray.data.Dataset":
    """Heavy-hitter diagnostic: the ``top_n`` most frequent values of
    ``key_col`` with their counts and integer-ppm share of all rows —
    (key, n, share_ppm), ordered (n DESC, key ASC). This is the first tool
    to reach for before any shuffle at 100 TB: it names the hot keys a
    ``groupby``/join would funnel into one partition (the skew that the
    salting in ``pipelines/checkpoint.py`` and the degree-oriented graph
    kernels exist to absorb).

    Scale shape: per-batch Arrow ``group_by`` combiners shrink the exchange
    to distinct-keys-per-batch; the global merge is one fastagg pass; the
    total is reduced from the counted table's block partials; only the
    top-``n`` rows ever reach the driver-side share computation. share_ppm
    uses integer floor division so the DuckDB twin (``//``) matches exactly.
    """
    from .fastagg import sorted_grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [(key_col, pa.string()), ("n", pa.int64())]
            ).empty_table()
        g = t.group_by([key_col]).aggregate([(key_col, "count")])
        return g.rename_columns([key_col, "n"])

    counted = sorted_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col],
        [("n", "sum")],
        out_names=["n"],
    ).materialize()

    total = 0
    for t in counted.map_batches(
        lambda t: pa.table(
            {"s": pa.array([int(pc.sum(t.column("n")).as_py() or 0)], pa.int64())}
        )
        if t.num_rows
        else pa.table({"s": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        if t.num_rows:
            total += int(pc.sum(t.column("s")).as_py() or 0)
    tot = max(total, 1)

    top = counted.sort(["n", key_col], descending=[True, False]).limit(top_n)

    def share(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        nv = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "share_ppm", pa.array((nv * 1_000_000) // tot, pa.int64())
        )

    return top.map_batches(share, batch_format="pyarrow")


def group_zscore(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    out_col: str = "zscore_ppm",
) -> "ray.data.Dataset":
    """Per-group z-score normalization of an integer column, emitted as the
    micro-quantized ``out_col`` = floor(z·10⁶) — the standard feature-scaling
    transform before training / anomaly thresholds. NULL when the group has
    zero variance.

    Exactness: z = (x − mean)/σ_pop is algebraically rearranged to use ONLY
    the integer group sums — z = (n·x − Σx)/√(n·Σx² − (Σx)²) — so both
    engines derive identical doubles from identical int64 aggregates, and
    because IEEE sqrt/division are correctly rounded (unlike ln), the
    quantized output is bit-exact vs the DuckDB twin with NO last-ulp caveat.

    Scale shape: one fastagg pass computes (n, Σx, Σx²) per group
    (group-count-bounded table, broadcast once), then the input streams
    through a stateless vectorized map — same two-pass shape as
    ``clip_to_group_quantiles``; no group ever occupies one task.
    """
    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import sorted_grouped_agg

    def sq(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [(k, pa.string()) for k in keys]
                + [("_v", pa.int64()), ("_v2", pa.int64())]
            ).empty_table()
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {k: t.column(k) for k in keys}
        cols["_v"] = pa.array(v, pa.int64())
        cols["_v2"] = pa.array(v * v, pa.int64())
        return pa.table(cols)

    stats = sorted_grouped_agg(
        ds.map_batches(sq, batch_format="pyarrow"),
        keys,
        [("_v", "count"), ("_v", "sum"), ("_v2", "sum")],
        out_names=["_n", "_s", "_s2"],
    )
    stats_tbl = pa.concat_tables(
        [
            b
            for b in stats.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns and b.num_rows
        ]
    ).combine_chunks()
    stats_ref = broadcast(stats_tbl)

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        def build():
            tb = ray.get(stats_ref) if not isinstance(stats_ref, pa.Table) else stats_ref
            key_rows = list(zip(*[tb.column(k).to_pylist() for k in keys]))
            return {
                kr: (n, s, s2)
                for kr, n, s, s2 in zip(
                    key_rows,
                    tb.column("_n").to_pylist(),
                    tb.column("_s").to_pylist(),
                    tb.column("_s2").to_pylist(),
                )
            }

        d = task_state(state_key("gz", stats_ref), build)
        key_df = t.select(keys).to_pandas()
        ktup = list(key_df.itertuples(index=False, name=None))
        n = np.array([d[k][0] for k in ktup], dtype=np.int64)
        s = np.array([d[k][1] for k in ktup], dtype=np.int64)
        s2 = np.array([d[k][2] for k in ktup], dtype=np.int64)
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # identical double derivation as the SQL twin (left-assoc * and -)
        var_n2 = n.astype(np.float64) * s2.astype(np.float64) - s.astype(
            np.float64
        ) * s.astype(np.float64)
        num = (n * x - s).astype(np.float64) * 1000000.0
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.floor(num / np.sqrt(var_n2))
        ok = var_n2 > 0
        arr = pa.array(
            np.where(ok, z, 0).astype(np.int64), pa.int64(), mask=~ok
        )
        return t.append_column(out_col, arr)

    return ds.map_batches(score, batch_format="pyarrow")


def group_corr(
    ds: "ray.data.Dataset",
    keys: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "corr_ppm",
) -> "ray.data.Dataset":
    """Per-group Pearson correlation between two integer columns, one row
    per group: ``keys + n + out_col`` where out_col = floor(r·10⁶) and
    r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)) — the
    feature-pair screening rollup (which signals co-move per entity) before
    model training. NULL when either variance is zero.

    Exactness: the five cross-moments are EXACT int64 sums from one fastagg
    pass; the final r is derived from them in doubles with the SAME op
    order as the DuckDB twin (each int sum promoted ::DOUBLE before its
    product, products subtracted, ·10⁶, divided by the product of the two
    sqrts) — multiplication/subtraction/division/sqrt are all IEEE
    correctly-rounded, so the quantized output is bit-exact, same
    discipline as ``group_zscore``.

    Inputs must be pre-quantized int64 (cents/ppm); per-row products x·x,
    y·y, x·y and their group sums must stay within int64 — quantize
    magnitudes accordingly (the same contract ``group_zscore`` documents).

    Scale shape: per-batch squares/products (stateless), one fastagg
    shuffle of 6 int partials per group, then a stateless vectorized
    finalize over the group-count-proportional agg stream — no broadcast,
    no driver state, no per-group Python."""
    from .fastagg import sorted_grouped_agg

    typ = dict(zip(ds.schema().names, ds.schema().types))
    MID = pa.schema(
        [(k, typ[k]) for k in keys]
        + [
            ("_x", pa.int64()),
            ("_y", pa.int64()),
            ("_xx", pa.int64()),
            ("_yy", pa.int64()),
            ("_xy", pa.int64()),
        ]
    )
    OUT = pa.schema(
        [(k, typ[k]) for k in keys] + [("n", pa.int64()), (out_col, pa.int64())]
    )

    def sq(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        arrs = [t.column(k) for k in keys] + [
            pa.array(x, pa.int64()),
            pa.array(y, pa.int64()),
            pa.array(x * x, pa.int64()),
            pa.array(y * y, pa.int64()),
            pa.array(x * y, pa.int64()),
        ]
        return pa.Table.from_arrays(arrs, schema=MID)

    stats = sorted_grouped_agg(
        ds.map_batches(sq, batch_format="pyarrow"),
        keys,
        [
            ("_x", "count"),
            ("_x", "sum"),
            ("_y", "sum"),
            ("_xx", "sum"),
            ("_yy", "sum"),
            ("_xy", "sum"),
        ],
        out_names=["n", "_sx", "_sy", "_sxx", "_syy", "_sxy"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        f = np.float64
        n = t.column("n").to_numpy(zero_copy_only=False).astype(f)
        sx = t.column("_sx").to_numpy(zero_copy_only=False).astype(f)
        sy = t.column("_sy").to_numpy(zero_copy_only=False).astype(f)
        sxx = t.column("_sxx").to_numpy(zero_copy_only=False).astype(f)
        syy = t.column("_syy").to_numpy(zero_copy_only=False).astype(f)
        sxy = t.column("_sxy").to_numpy(zero_copy_only=False).astype(f)
        # identical double derivation as the SQL twin (promote-then-multiply)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        cov = n * sxy - sx * sy
        ok = (vx > 0.0) & (vy > 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.floor((cov * 1000000.0) / (np.sqrt(vx) * np.sqrt(vy)))
        arr = pa.array(np.where(ok, r, 0).astype(np.int64), pa.int64(), mask=~ok)
        arrs = [t.column(k) for k in keys] + [
            pc.cast(t.column("n"), pa.int64()),
            arr,
        ]
        return pa.Table.from_arrays(arrs, schema=OUT)

    return stats.map_batches(finalize, batch_format="pyarrow")


def snapshot_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key: str,
    val_col: str,
) -> "ray.data.Dataset":
    """Snapshot diff: (key, status, old_val, new_val) for every key whose
    value ADDED / REMOVED / CHANGED between two table snapshots (unchanged
    keys are dropped) — the nightly-build regression triage for a KG
    pipeline: diff today's edge table against yesterday's and read WHAT
    moved, not just counts. Both inputs must be unique on ``key``.

    One distributed full-outer hash join (both sides key-proportional, no
    broadcast), then a stateless vectorized classify — no driver state."""
    from .fastagg import drop_empty_blocks
    from ..tuning import default_join_partitions

    def prep(name: str):
        def f(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.schema(
                    [(key, pa.string()), (name, pa.string())]
                ).empty_table()
            return pa.table(
                {
                    key: pc.cast(t.column(key), pa.string()),
                    name: pc.cast(t.column(val_col), pa.string()),
                }
            )

        return f

    o = drop_empty_blocks(old.map_batches(prep("old_val"), batch_format="pyarrow"))
    n = drop_empty_blocks(new.map_batches(prep("new_val"), batch_format="pyarrow"))
    joined = o.join(
        n,
        join_type="full_outer",
        num_partitions=default_join_partitions(),
        on=(key,),
    )

    OUT = pa.schema(
        [
            (key, pa.string()),
            ("status", pa.string()),
            ("old_val", pa.string()),
            ("new_val", pa.string()),
        ]
    )

    def classify(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        ov, nv = t.column("old_val"), t.column("new_val")
        status = pc.if_else(
            pc.is_null(ov),
            pa.scalar("added"),
            pc.if_else(
                pc.is_null(nv),
                pa.scalar("removed"),
                pc.if_else(pc.equal(ov, nv), pa.scalar("same"), pa.scalar("changed")),
            ),
        )
        out = pa.table(
            {key: t.column(key), "status": status, "old_val": ov, "new_val": nv}
        )
        return out.filter(pc.not_equal(out.column("status"), "same")).cast(OUT)

    return joined.map_batches(classify, batch_format="pyarrow")


def psi_drift(
    base: "ray.data.Dataset",
    curr: "ray.data.Dataset",
    value_col: str,
    edges: list[int],
) -> "ray.data.Dataset":
    """Population Stability Index between two snapshots of an integer
    column, per fixed bucket: (bucket, n_base, n_curr, psi_q) with
    psi_q = floor((p − q)·ln(p/q)·10⁶) and Laplace-smoothed proportions
    p = (n+1)/(tot+B) — the standard train/serve drift monitor, applied
    here as corpus-snapshot drift (did today's document/value distribution
    move?). Callers sum psi_q for the headline PSI (>0.2·10⁶ ≈ major
    shift).

    Bucket ``edges`` are fixed integers (np.digitize == the SQL CASE chain
    — classification is exact); proportions derive from exact int64 counts
    with one division each, so ln is the only last-ulp term (the tfidf
    budget). Scale shape: each side streams through per-batch bucket
    combiners into an edges-bounded fastagg; the PSI math runs on ≤ B rows."""
    from .fastagg import sorted_grouped_agg

    B = len(edges) + 1

    def counts(ds: "ray.data.Dataset") -> dict[int, int]:
        def partial(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.schema(
                    [("bucket", pa.int64()), ("n", pa.int64())]
                ).empty_table()
            v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = np.digitize(v, np.asarray(edges, dtype=np.int64))
            u, c = np.unique(b, return_counts=True)
            return pa.table(
                {"bucket": pa.array(u.astype(np.int64)), "n": pa.array(c.astype(np.int64))}
            )

        agg = sorted_grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["bucket"],
            [("n", "sum")],
            out_names=["n"],
        )
        out: dict[int, int] = {}
        for bt in agg.iter_batches(batch_format="pyarrow", batch_size=None):
            if bt.num_rows:
                for k, n in zip(bt.column("bucket").to_pylist(), bt.column("n").to_pylist()):
                    out[int(k)] = int(n)
        return out

    nb, nc = counts(base), counts(curr)
    tot_b, tot_c = sum(nb.values()), sum(nc.values())
    rows_b, rows_c, rows_bk, rows_psi = [], [], [], []
    for bk in range(B):
        b_n, c_n = nb.get(bk, 0), nc.get(bk, 0)
        p = (b_n + 1.0) / (tot_b + B)
        q = (c_n + 1.0) / (tot_c + B)
        psi = float(np.floor((p - q) * np.log(p / q) * 1000000.0))
        rows_bk.append(bk)
        rows_b.append(b_n)
        rows_c.append(c_n)
        rows_psi.append(int(psi))
    return ray.data.from_arrow(
        pa.table(
            {
                "bucket": pa.array(rows_bk, pa.int64()),
                "n_base": pa.array(rows_b, pa.int64()),
                "n_curr": pa.array(rows_c, pa.int64()),
                "psi_q": pa.array(rows_psi, pa.int64()),
            }
        )
    )


def profile_table(
    ds: "ray.data.Dataset",
    int_cols: list[str],
    str_cols: list[str],
    col_field: str = "col_name",
) -> "ray.data.Dataset":
    """Data-profiling rollup: one row per profiled column with
    ``(col_name, n, n_null, n_distinct, min_val, max_val)`` — the schema
    audit a pipeline runs on every new snapshot before trusting it
    (reference analog: ``schema_info`` counts, SURVEY A16, widened to
    column-level stats). ``min_val``/``max_val`` are emitted as strings;
    int columns compare numerically and stringify at the end, so "9" < "10"
    stays correct. Callers pre-cast timestamps to epoch-µs and money to
    cents int64 (the module's quantization convention).

    Scale shape: n/null/min/max ride per-batch O(#cols) partial rows into
    one fastagg (never row-proportional past the first map); exact distinct
    counts melt each column to (col, value-string) rows — column-count ×
    data-proportional, the inherent price of EXACT distincts (use
    ``sampling.distinct_kmv`` for the sketched variant) — through
    ``sorted_distinct`` + one fastagg. The final stitch joins two
    #cols-bounded tables driver-side (constant work).
    """
    from .fastagg import sorted_distinct, sorted_grouped_agg

    cols = list(int_cols) + list(str_cols)
    int_set = set(int_cols)
    PART = pa.schema(
        [
            (col_field, pa.string()),
            ("_n", pa.int64()),
            ("_nn", pa.int64()),
            ("_mini", pa.int64()),
            ("_maxi", pa.int64()),
            ("_mins", pa.string()),
            ("_maxs", pa.string()),
        ]
    )
    MELT = pa.schema([(col_field, pa.string()), ("_val", pa.string())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return PART.empty_table()
        names, ns, nns, minis, maxis, minss, maxss = [], [], [], [], [], [], []
        for c in cols:
            col = t.column(c)
            names.append(c)
            ns.append(len(col))
            nns.append(col.null_count)
            mn = pc.min(col).as_py() if len(col) > col.null_count else None
            mx = pc.max(col).as_py() if len(col) > col.null_count else None
            if c in int_set:
                minis.append(mn), maxis.append(mx)
                minss.append(None), maxss.append(None)
            else:
                minis.append(None), maxis.append(None)
                minss.append(mn), maxss.append(mx)
        return pa.Table.from_arrays(
            [
                pa.array(names, pa.string()),
                pa.array(ns, pa.int64()),
                pa.array(nns, pa.int64()),
                pa.array(minis, pa.int64()),
                pa.array(maxis, pa.int64()),
                pa.array(minss, pa.string()),
                pa.array(maxss, pa.string()),
            ],
            schema=PART,
        )

    stats = sorted_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [col_field],
        [
            ("_n", "sum"),
            ("_nn", "sum"),
            ("_mini", "min"),
            ("_maxi", "max"),
            ("_mins", "min"),
            ("_maxs", "max"),
        ],
        out_names=["n", "n_null", "_mini", "_maxi", "_mins", "_maxs"],
    )

    def melt(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MELT.empty_table()
        parts = []
        for c in cols:
            col = t.column(c).drop_null()
            if len(col) == 0:
                continue
            sv = pc.cast(col, pa.string())
            parts.append(
                pa.Table.from_arrays(
                    [pa.array([c] * len(sv), pa.string()), sv], schema=MELT
                )
            )
        return pa.concat_tables(parts) if parts else MELT.empty_table()

    dcounts = sorted_grouped_agg(
        sorted_distinct(ds.map_batches(melt, batch_format="pyarrow"), [col_field, "_val"]),
        [col_field],
        [("_val", "count")],
        out_names=["n_distinct"],
    )

    def gather(d):
        blocks = [
            b
            for b in d.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns and b.num_rows
        ]
        return pa.concat_tables(blocks).combine_chunks() if blocks else None

    st, dc = gather(stats), gather(dcounts)
    OUT = pa.schema(
        [
            (col_field, pa.string()),
            ("n", pa.int64()),
            ("n_null", pa.int64()),
            ("n_distinct", pa.int64()),
            ("min_val", pa.string()),
            ("max_val", pa.string()),
        ]
    )
    if st is None:
        return ray.data.from_arrow(OUT.empty_table())
    dmap = (
        dict(zip(dc.column(col_field).to_pylist(), dc.column("n_distinct").to_pylist()))
        if dc is not None
        else {}
    )
    names = st.column(col_field).to_pylist()
    mini = st.column("_mini").to_pylist()
    maxi = st.column("_maxi").to_pylist()
    mins = st.column("_mins").to_pylist()
    maxs = st.column("_maxs").to_pylist()
    min_val = [
        (str(mini[i]) if mini[i] is not None else None)
        if names[i] in int_set
        else mins[i]
        for i in range(len(names))
    ]
    max_val = [
        (str(maxi[i]) if maxi[i] is not None else None)
        if names[i] in int_set
        else maxs[i]
        for i in range(len(names))
    ]
    out = pa.Table.from_arrays(
        [
            st.column(col_field),
            pc.cast(st.column("n"), pa.int64()),
            pc.cast(st.column("n_null"), pa.int64()),
            pa.array([dmap.get(c, 0) for c in names], pa.int64()),
            pa.array(min_val, pa.string()),
            pa.array(max_val, pa.string()),
        ],
        schema=OUT,
    )
    return ray.data.from_arrow(out)


def mad_outliers(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    k: int = 3,
) -> "ray.data.Dataset":
    """Per-group robust outlier detection via the median absolute deviation:
    flag rows where ``|v − median| > k·MAD`` with both the median and the
    MAD taken as DISCRETE group quantiles (inverted_cdf == DuckDB
    ``quantile_disc`` — actual elements, so every comparison is exact int64;
    no float enters the predicate). MAD tolerates the very outliers that
    poison mean/stddev gates (``group_zscore``): one 10⁹-cent glitch moves a
    mean arbitrarily but cannot move a median — the robust-statistics
    complement of the winsorize/p99 family.

    Emits the OUTLIER rows only: ``keys + (value_col, med, mad, abs_dev)``.

    Scale shape: two ``ranked_over`` passes (median of v, then median of
    |v − med|), each yielding ONE row per group, broadcast once; between
    them the deviation column is RECOMPUTED from the broadcast median in the
    second pass's prep rather than materializing a derived copy of the
    input — four streaming passes total, zero per-group tasks, no
    mid-pipeline materialization of row-proportional data."""
    from ..state.broadcast import broadcast, state_key, task_state

    def _disc_median_tbl(src: "ray.data.Dataset", vcol: str) -> pa.Table:
        ranked = ranked_over(
            src.select_columns(keys + [vcol]),
            keys,
            [(vcol, True)],
            rank_col="_rnk",
            with_group_size=True,
        )

        def pick(t: pa.Table) -> pa.Table:
            empty_cols = {kk: pa.array([], pa.string()) for kk in keys}
            empty_cols["_thr"] = pa.array([], pa.int64())
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.table(empty_cols)
            rnk = t.column("_rnk").to_numpy(zero_copy_only=False)
            n = t.column("_gn").to_numpy(zero_copy_only=False)
            target = np.maximum(np.ceil(0.5 * n).astype(np.int64), 1)
            idx = pa.array(np.flatnonzero(rnk == target))
            cols = {kk: t.column(kk).take(idx) for kk in keys}
            cols["_thr"] = pc.cast(t.column(vcol).take(idx), pa.int64())
            return pa.table(cols)

        return pa.concat_tables(
            [
                b
                for b in ranked.map_batches(pick, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
                if b.num_columns
            ]
        ).combine_chunks()

    med_ref = broadcast(_disc_median_tbl(ds, value_col))

    def _lookup(t: pa.Table, ref, tag: str) -> np.ndarray:
        def build():
            tb = ray.get(ref) if not isinstance(ref, pa.Table) else ref
            key_rows = list(zip(*[tb.column(kk).to_pylist() for kk in keys]))
            return dict(zip(key_rows, tb.column("_thr").to_pylist()))

        index = task_state(state_key(tag, ref), build)
        key_df = t.select(keys).to_pandas()
        return np.array(
            [index[kk] for kk in key_df.itertuples(index=False, name=None)],
            dtype=np.int64,
        )

    def dev(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        med = _lookup(t, med_ref, "mad_med")
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("abs_dev", pa.array(np.abs(v - med), pa.int64()))

    mad_ref = broadcast(
        _disc_median_tbl(
            ds.map_batches(dev, batch_format="pyarrow"), "abs_dev"
        )
    )

    def flag(t: pa.Table) -> pa.Table:
        # passthrough rows + (med, mad, abs_dev); empty blocks are scrubbed
        # downstream so the no-schema empty case never leaves the operator
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        med = _lookup(t, med_ref, "mad_med")
        mad = _lookup(t, mad_ref, "mad_mad")
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        abs_dev = np.abs(v - med)
        keep = abs_dev > k * mad
        idx = pa.array(np.flatnonzero(keep))
        out = t.take(idx)
        out = out.append_column("med", pa.array(med[keep], pa.int64()))
        out = out.append_column("mad", pa.array(mad[keep], pa.int64()))
        return out.append_column("abs_dev", pa.array(abs_dev[keep], pa.int64()))

    from .fastagg import drop_empty_blocks

    sch = None  # derived from data; keys may be non-string
    return drop_empty_blocks(ds.map_batches(flag, batch_format="pyarrow"), sch)


def pivot_counts(
    ds: "ray.data.Dataset",
    keys: list[str],
    cat_col: str,
    categories: list[str],
    prefix: str = "n_",
    total_col: str = "n_total",
) -> "ray.data.Dataset":
    """Pivot / crosstab: per key group, one int64 count column per listed
    category plus a total — the wide-format census a feature store derives
    from a categorical event log (reference analog: the per-organism ×
    per-datasource count matrices of ``post-import.cypher:287-309``, laid
    out as columns instead of rows).

    The category list is part of the operator SPEC (it fixes the output
    schema, exactly like SQL's conditional-aggregation twin); values outside
    it count toward ``total_col`` only. Scale shape: indicators are pure
    Arrow casts per batch, the shuffle carries per-batch PARTIAL sums
    (distinct keys per batch × a fixed column set), and the final reduce is
    one fastagg sum — key cardinality may be data-proportional."""
    from .fastagg import sorted_grouped_agg

    cols = [f"{prefix}{c}" for c in categories]
    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    OUT = pa.schema(
        [(k, typ[k]) for k in keys] + [(c, pa.int64()) for c in cols + [total_col]]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        cat = t.column(cat_col)
        arrs = [t.column(k) for k in keys]
        for c in categories:
            arrs.append(pc.cast(pc.fill_null(pc.equal(cat, c), False), pa.int64()))
        arrs.append(pa.array(np.ones(t.num_rows, dtype=np.int64), pa.int64()))
        wide = pa.Table.from_arrays(arrs, schema=OUT)
        agg = wide.group_by(keys).aggregate(
            [(c, "sum") for c in cols + [total_col]]
        )
        # pyarrow emits [keys..., <col>_sum...]; restore the spec names
        return agg.rename_columns(keys + cols + [total_col]).cast(OUT)

    return sorted_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys,
        [(c, "sum") for c in cols + [total_col]],
        out_names=cols + [total_col],
    )


def cube_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    sums: list[str],
    count_alias: str = "n",
) -> "ray.data.Dataset":
    """``GROUP BY CUBE(keys...)`` — ALL 2^n grouping sets, with NULLs in the
    grouped-out key columns (``rollup_agg``'s prefix-levels generalized to
    every subset; the cross-tab margins report every BI layer asks of a
    status × priority matrix).

    Scale shape (same argument as ``rollup_agg``): the data-proportional
    aggregation happens exactly once — the finest-level combiner pre-agg +
    one fastagg shuffle; every other subset re-aggregates the finest-level
    PARTIAL (group-count-proportional input, never the raw table), so a
    2-key cube costs one full pass plus three passes over shrinking
    aggregate tables. ``n`` keys means 2^n − 1 re-aggregations — keep the
    key list short (the SQL twin has the identical blow-up). Sums must be
    pre-quantized ints (the cents discipline) so re-aggregation is exact."""
    from itertools import combinations

    from .fastagg import sorted_grouped_agg

    def _pa_type(t):
        # pandas-backed datasets report numpy dtypes; normalize to Arrow
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()  # object dtype → string

    sch = ds.schema()
    typ = {n: _pa_type(t) for n, t in zip(sch.names, sch.types)}
    out_names = keys + [count_alias] + list(sums)

    finest = preaggregate(ds, keys, sums, count_alias).materialize()
    agg_specs = [(count_alias, "sum")] + [(c, "sum") for c in sums]
    agg_out = [count_alias] + list(sums)
    OUT_SCHEMA = pa.schema(
        [(k, typ[k]) for k in keys] + [(c, pa.int64()) for c in agg_out]
    )

    def padded(lvl: "ray.data.Dataset", dropped: tuple) -> "ray.data.Dataset":
        def pad(t: pa.Table, _dropped=dropped) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return OUT_SCHEMA.empty_table()
            for c in _dropped:
                t = t.append_column(c, pa.nulls(t.num_rows, typ[c]))
            return t.select(out_names)

        return lvl.map_batches(pad, batch_format="pyarrow")

    levels = [
        finest.map_batches(
            lambda t: t.select(out_names)
            if t.num_columns
            else OUT_SCHEMA.empty_table(),
            batch_format="pyarrow",
        )
    ]
    subsets = [
        list(c)
        for r in range(len(keys) - 1, 0, -1)
        for c in combinations(keys, r)
    ]
    for kept in subsets:
        dropped = tuple(k for k in keys if k not in kept)
        lvl = sorted_grouped_agg(finest, kept, agg_specs, out_names=agg_out)
        levels.append(padded(lvl, dropped))
    # grand total: one global combine of the finest partials
    import pandas as pd

    tot = finest.select_columns(agg_out).to_pandas().sum()
    levels.append(
        padded(
            ray.data.from_arrow(
                pa.table({c: pa.array([int(tot[c])], pa.int64()) for c in agg_out})
            ),
            tuple(keys),
        )
    )
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def ntile_over(
    ds: "ray.data.Dataset",
    keys: list[str],
    order_by: list[tuple[str, bool]],
    k: int,
    ntile_col: str = "ntile",
    pct_rank_col: str = "pct_rank_ppm",
) -> "ray.data.Dataset":
    """Per-group ``NTILE(k)`` + integer-ppm ``percent_rank()`` — the
    quantile-bucket assignment behind per-segment tiering (gold/silver/…)
    and calibration curves, with SQL's exact tile-size rule: the first
    ``n mod k`` tiles hold ``ceil(n/k)`` rows, the rest ``floor(n/k)``.

    percent_rank rides as ``floor((rank−1)·10⁶ / (n−1))`` ppm (0 for
    single-row groups, matching SQL's 0/0→0 convention) so no float ever
    enters the compared output. Built on ``ranked_over`` (one global
    range-partitioned sort + group-stats join — hot-key safe, no whole-group
    task); the tile arithmetic is one vectorized numpy pass per batch.
    Include unique tie-break columns in ``order_by`` — determinism must come
    from the sort."""
    ranked = ranked_over(
        ds, keys, order_by, rank_col="_rank", with_group_size=True
    )

    def finish(t: pa.Table) -> pa.Table:
        r = t.column("_rank").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("_gn").to_numpy(zero_copy_only=False).astype(np.int64)
        q, rem = n // k, n % k
        big = rem * (q + 1)  # rows covered by the (q+1)-sized tiles
        in_big = (r - 1) < big
        tile = np.where(
            in_big,
            (r - 1) // np.maximum(q + 1, 1) + 1,
            rem + (r - 1 - big) // np.maximum(q, 1) + 1,
        )
        ppm = np.where(n > 1, (r - 1) * 1_000_000 // np.maximum(n - 1, 1), 0)
        out = t.drop_columns(["_rank", "_gn"])
        out = out.append_column(ntile_col, pa.array(tile, pa.int64()))
        return out.append_column(pct_rank_col, pa.array(ppm, pa.int64()))

    return ranked.map_batches(finish, batch_format="pyarrow")


def loo_group_mean(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    n_col: str = "loo_n",
    out_col: str = "loo_mean",
) -> "ray.data.Dataset":
    """Leave-one-out target encoding: append ``n_col`` = (group size − 1)
    and ``out_col`` = floor((Σ_group value − own value) / (group size − 1))
    — the mean of the OTHER rows in the row's group, the leakage-safe
    categorical encoder (a row never sees its own target; reference analog:
    the per-condition baseline normalization of SURVEY §2.5 A1, which
    likewise excludes the measured replicate from its reference mean).
    NULL when the row is its group's only member.

    Exactness: group sums are exact int64 (``value_col`` pre-quantized to
    cents/ppm); the encoding is one integer floor division — bit-identical
    to the DuckDB twin's BIGINT ``//`` at any parallelism (all-positive
    numerators make floor == trunc; callers with signed values get floor
    semantics from numpy, documented here as the contract).

    Scale shape: one fastagg pass to (key → n, sum) — group-count bounded,
    broadcast once like ``filter_above_group_quantile``'s thresholds — then
    a single stateless streaming probe pass. Intended for the bounded-
    cardinality categorical keys target encoding is used on (priorities,
    segments, languages); a key-proportional encoder should join instead."""
    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import sorted_grouped_agg

    agg = sorted_grouped_agg(
        ds.select_columns(keys + [value_col]),
        keys,
        [(value_col, "count"), (value_col, "sum")],
        out_names=["_n", "_s"],
    )
    grp_tbl = pa.concat_tables(
        [
            b
            for b in agg.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns
        ]
    ).combine_chunks()
    grp_ref = broadcast(grp_tbl)

    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    OUT = pa.schema(
        [(n, typ[n]) for n in sch.names]
        + [(n_col, pa.int64()), (out_col, pa.int64())]
    )

    def enc(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()

        def build():
            tb = ray.get(grp_ref) if not isinstance(grp_ref, pa.Table) else grp_ref
            key_rows = list(zip(*[tb.column(k).to_pylist() for k in keys]))
            n = tb.column("_n").to_numpy(zero_copy_only=False).astype(np.int64)
            s = tb.column("_s").to_numpy(zero_copy_only=False).astype(np.int64)
            return {k: (int(a), int(b)) for k, a, b in zip(key_rows, n, s)}

        index = task_state(state_key("loo", grp_ref), build)
        key_df = t.select(keys).to_pandas()
        pairs = [
            index[k] for k in key_df.itertuples(index=False, name=None)
        ]  # every key was aggregated from this same dataset — present by construction
        gn = np.fromiter((p[0] for p in pairs), dtype=np.int64, count=len(pairs))
        gs = np.fromiter((p[1] for p in pairs), dtype=np.int64, count=len(pairs))
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        loo_n = gn - 1
        ok = loo_n > 0
        mean = np.floor_divide(gs - v, np.maximum(loo_n, 1))
        t = t.append_column(n_col, pa.array(loo_n, pa.int64()))
        t = t.append_column(out_col, pa.array(mean, pa.int64(), mask=~ok))
        return t.select(OUT.names)

    from .fastagg import drop_empty_blocks

    return drop_empty_blocks(ds.map_batches(enc, batch_format="pyarrow"), OUT)


def group_slope(
    ds: "ray.data.Dataset",
    keys: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "slope_q",
    scale: int = 1_000_000,
) -> "ray.data.Dataset":
    """Per-group OLS regression slope of y on x, one row per group:
    ``keys + n + out_col`` where out_col = floor(slope·scale) and
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — the per-entity TREND
    detector (is this user's spend rising? is this sensor drifting?), the
    directional sibling of ``group_corr``. NULL when x has zero variance
    (fewer than two distinct x values).

    Exactness: identical cross-moment discipline as ``group_corr`` — four
    exact int64 sums from one fastagg pass, finalized in doubles with the
    twin's promote-then-multiply op order, quantized by one floor.

    Inputs must be pre-quantized int64 with magnitudes sized so per-row
    x·x / x·y and their group sums stay within int64 — for time axes that
    means COARSE units rebased near zero (e.g. days since a fixed epoch:
    |x| ≈ 10³–10⁴ keeps Σx² < 10¹⁴ even at 10⁶ rows per group), NOT raw
    epoch micros (10¹⁵² blows int64 at the first square). Same per-batch
    partials + fastagg + stateless finalize scale shape as ``group_corr``:
    no broadcast, no driver state, no per-group Python."""
    from .fastagg import sorted_grouped_agg

    typ = dict(zip(ds.schema().names, ds.schema().types))
    MID = pa.schema(
        [(k, typ[k]) for k in keys]
        + [
            ("_x", pa.int64()),
            ("_y", pa.int64()),
            ("_xx", pa.int64()),
            ("_xy", pa.int64()),
        ]
    )
    OUT = pa.schema(
        [(k, typ[k]) for k in keys] + [("n", pa.int64()), (out_col, pa.int64())]
    )

    def sq(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        arrs = [t.column(k) for k in keys] + [
            pa.array(x, pa.int64()),
            pa.array(y, pa.int64()),
            pa.array(x * x, pa.int64()),
            pa.array(x * y, pa.int64()),
        ]
        return pa.Table.from_arrays(arrs, schema=MID)

    stats = sorted_grouped_agg(
        ds.map_batches(sq, batch_format="pyarrow"),
        keys,
        [
            ("_x", "count"),
            ("_x", "sum"),
            ("_y", "sum"),
            ("_xx", "sum"),
            ("_xy", "sum"),
        ],
        out_names=["n", "_sx", "_sy", "_sxx", "_sxy"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        f = np.float64
        n = t.column("n").to_numpy(zero_copy_only=False).astype(f)
        sx = t.column("_sx").to_numpy(zero_copy_only=False).astype(f)
        sy = t.column("_sy").to_numpy(zero_copy_only=False).astype(f)
        sxx = t.column("_sxx").to_numpy(zero_copy_only=False).astype(f)
        sxy = t.column("_sxy").to_numpy(zero_copy_only=False).astype(f)
        vx = n * sxx - sx * sx
        ok = vx > 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.floor(((n * sxy - sx * sy) * float(scale)) / vx)
        arr = pa.array(np.where(ok, s, 0).astype(np.int64), pa.int64(), mask=~ok)
        arrs = [t.column(k) for k in keys] + [
            pc.cast(t.column("n"), pa.int64()),
            arr,
        ]
        return pa.Table.from_arrays(arrs, schema=OUT)

    return stats.map_batches(finalize, batch_format="pyarrow")


def median_log_ratio_factors(
    ds: "ray.data.Dataset",
    gene_keys: list[str],
    sample_col: str,
    count_col: str,
    out_col: str = "med_lr_scaled",
) -> "ray.data.Dataset":
    """DESeq-style median-of-log-ratios size factors over a (gene, sample,
    count) table — ONE row per sample: ``(sample, n_genes, out_col)`` where
    out_col is the sample's discrete median of S·ln(count) − Σ_s ln(count)
    in micro-nats (S = number of distinct samples): the per-sample
    normalization offset of bulk-omics count matrices (Anders & Huber 2010;
    reference analog: the replicate/condition baseline normalization of
    SURVEY §2.5 A1/M16 — ``omics_adapter.py``'s per-condition reference
    means). Genes missing from ANY sample are excluded (the DESeq
    all-samples rule, which also makes the scaled log-ratios comparable
    across genes without a division).

    Exactness: each ln quantizes FIRST — floor(ln(count)·10⁶) int64, the
    PSI/entropy quantize-then-integer discipline — so gene sums, the ×S
    scaling and the subtraction are exact integer ops, and the median is a
    DISCRETE rank pick (ceil(n/2), == DuckDB quantile_disc) over int64:
    bit-identical to the twin at any parallelism, one last-ulp ln budget.

    Scale shape: one per-batch quantize pass, one gene-cardinality fastagg
    (k, Σqln), one tiny distinct-sample count, one gene-proportional hash
    join back, then ranked_over's global-sort median pick per sample — no
    broadcast of gene-proportional state, no per-group Python."""
    from .fastagg import drop_empty_blocks, sorted_distinct, sorted_grouped_agg
    from .joins import hash_join

    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    Q = pa.schema(
        [(k, typ[k]) for k in gene_keys]
        + [(sample_col, typ[sample_col]), ("_qln", pa.int64())]
    )

    def quant(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return Q.empty_table()
        c = t.column(count_col).to_numpy(zero_copy_only=False).astype(np.float64)
        qln = np.floor(np.log(c) * 1_000_000.0).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column(k) for k in gene_keys]
            + [t.column(sample_col), pa.array(qln, pa.int64())],
            schema=Q,
        )

    q = ds.map_batches(quant, batch_format="pyarrow").materialize()

    n_samples = sorted_distinct(q.select_columns([sample_col]), [sample_col]).count()

    G = pa.schema([(k, typ[k]) for k in gene_keys] + [("_t", pa.int64())])
    genes = drop_empty_blocks(
        sorted_grouped_agg(
            q, gene_keys, [("_qln", "count"), ("_qln", "sum")], out_names=["_k", "_t"]
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column(k) for k in gene_keys]
                + [pc.cast(t.column("_t"), pa.int64())],
                schema=G,
            ).filter(pc.equal(pc.cast(t.column("_k"), pa.int64()), n_samples))
            if t.num_columns
            else G.empty_table(),
            batch_format="pyarrow",
        ),
        G,
    )
    j = hash_join(drop_empty_blocks(q, Q), genes, on=tuple(gene_keys))

    LR = pa.schema([(sample_col, typ[sample_col]), ("_lr", pa.int64())])

    def to_lr(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return LR.empty_table()
        qln = t.column("_qln").to_numpy(zero_copy_only=False).astype(np.int64)
        tt = t.column("_t").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column(sample_col), pa.array(qln * n_samples - tt, pa.int64())],
            schema=LR,
        )

    lr = drop_empty_blocks(j.map_batches(to_lr, batch_format="pyarrow"), LR)
    ranked = ranked_over(
        lr, [sample_col], [("_lr", True)], rank_col="_rnk", with_group_size=True
    )
    OUT = pa.schema(
        [
            (sample_col, typ[sample_col]),
            ("n_genes", pa.int64()),
            (out_col, pa.int64()),
        ]
    )

    def pick(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        rnk = t.column("_rnk").to_numpy(zero_copy_only=False)
        n = t.column("_gn").to_numpy(zero_copy_only=False)
        target = np.maximum(np.ceil(0.5 * n).astype(np.int64), 1)
        idx = pa.array(np.flatnonzero(rnk == target))
        return pa.Table.from_arrays(
            [
                t.column(sample_col).take(idx),
                pc.cast(t.column("_gn").take(idx), pa.int64()),
                pc.cast(t.column("_lr").take(idx), pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(ranked.map_batches(pick, batch_format="pyarrow"), OUT)


def quantile_normalize(
    ds: "ray.data.Dataset",
    gene_keys: list[str],
    sample_col: str,
    value_col: str,
    out_col: str = "norm_val",
) -> "ray.data.Dataset":
    """Bolstad quantile normalization over a (gene, sample, value) matrix —
    every sample's distribution is replaced by the cross-sample reference:
    row r of each sample's sorted values maps to floor(mean of ALL samples'
    r-th sorted values). THE classic cross-array normalization of omics
    expression matrices (Bolstad et al. 2003; reference analog: the
    cross-replicate comparability step before the per-condition rollups of
    SURVEY §2.5 A1). Genes missing from any sample are excluded first (the
    complete-matrix rule that makes every sample the same length, sibling
    of ``median_log_ratio_factors``'s DESeq filter). Emits one row per
    (gene, sample): ``gene_keys + sample + value + rnk + out_col``.

    Exactness: values stay int64 end to end — per-rank reference means are
    exact integer floor divisions (Σ // S); rank assignment is the global-
    sort ``ranked_over`` with gene keys as tie-breaks, mirrored verbatim in
    the twin's row_number() ORDER BY.

    Scale shape: gene-cardinality completeness fastagg + semi filter, one
    global sort per rank assignment (hot samples cost their block share),
    one rank-cardinality fastagg for the reference, one rank-proportional
    hash join back — no broadcast of gene-proportional state, no per-group
    Python, matrix never lands whole anywhere."""
    from .fastagg import drop_empty_blocks, sorted_distinct, sorted_grouped_agg
    from .joins import hash_join

    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    n_samples = sorted_distinct(
        ds.select_columns([sample_col]), [sample_col]
    ).count()

    G = pa.schema([(k, typ[k]) for k in gene_keys])
    complete = drop_empty_blocks(
        sorted_grouped_agg(
            ds.select_columns(gene_keys + [sample_col]),
            gene_keys,
            [(sample_col, "count")],
            out_names=["_k"],
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column(k) for k in gene_keys], schema=G
            ).filter(pc.equal(pc.cast(t.column("_k"), pa.int64()), n_samples))
            if t.num_columns
            else G.empty_table(),
            batch_format="pyarrow",
        ),
        G,
    )
    F = pa.schema(
        [(k, typ[k]) for k in gene_keys]
        + [(sample_col, typ[sample_col]), (value_col, pa.int64())]
    )
    filtered = drop_empty_blocks(
        hash_join(
            drop_empty_blocks(ds.select_columns(F.names), F),
            complete,
            on=tuple(gene_keys),
            how="left_semi",
        ),
        F,
    )
    ranked = ranked_over(
        filtered,
        [sample_col],
        [(value_col, True)] + [(k, True) for k in gene_keys],
        rank_col="rnk",
    ).materialize()  # consumed twice: reference build + final join

    REF = pa.schema([("rnk", pa.int64()), (out_col, pa.int64())])
    ref = drop_empty_blocks(
        sorted_grouped_agg(
            ranked.select_columns(["rnk", value_col]),
            ["rnk"],
            [(value_col, "sum")],
            out_names=["_s"],
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.cast(t.column("rnk"), pa.int64()),
                    pa.array(
                        t.column("_s").to_numpy(zero_copy_only=False).astype(np.int64)
                        // n_samples,
                        pa.int64(),
                    ),
                ],
                schema=REF,
            )
            if t.num_columns
            else REF.empty_table(),
            batch_format="pyarrow",
        ),
        REF,
    )
    OUT = pa.schema(list(F) + [("rnk", pa.int64()), (out_col, pa.int64())])
    j = hash_join(ranked, ref, on=("rnk",))
    return drop_empty_blocks(
        j.map_batches(
            lambda t: t.select(OUT.names) if t.num_columns else OUT.empty_table(),
            batch_format="pyarrow",
        ),
        OUT,
    )


def anova_f(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
) -> "pa.Table":
    """One-way ANOVA F statistic across ALL groups of ``group_col`` — ONE
    row ``(n_rows, k_groups, f_micro)``: the k-sample generalization of
    ``welch_t`` (equal-variance pooled form), answering "do the group means
    differ at all" before pairwise tests. FULLY integer — no float ever:
    with per-group exact (n_g, S_g, Q_g), A = Σ S_g²//n_g, B = S²//N,
    SSB = A − B, SSW = Q − A, and F_micro = 10⁶·SSB·(N−k) // ((k−1)·SSW) —
    every floor mirrored by the twin's HUGEINT arithmetic, so the statistic
    is bit-identical with zero summation-order risk (a float Σ S_g²/n_g
    would differ between engines at the ulp level). NULL when k < 2 or
    SSW = 0. Contract: values ≥ 0 int64 (cents).

    Scale shape: per-batch moment partials → one group-cardinality fastagg
    → an O(k) driver finalize in arbitrary-precision Python ints (k =
    distinct groups, human-scale). Returns a pa.Table."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    MID = pa.schema(
        [
            ("_g", pa.string()),
            ("_n", pa.int64()),
            ("_s", pa.int64()),
            ("_q", pa.int64()),
        ]
    )

    def moments(t: pa.Table) -> pa.Table:
        import pandas as pd

        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        frame = pd.DataFrame(
            {
                "g": t.column(group_col).to_pandas().astype(str),
                "v": t.column(value_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        frame["q"] = frame["v"] * frame["v"]
        agg = frame.groupby("g", sort=False).agg(
            n=("v", "size"), s=("v", "sum"), q=("q", "sum")
        )
        return pa.Table.from_arrays(
            [
                pa.array(agg.index.to_numpy().astype(str), pa.string()),
                pa.array(agg["n"].to_numpy().astype(np.int64), pa.int64()),
                pa.array(agg["s"].to_numpy().astype(np.int64), pa.int64()),
                pa.array(agg["q"].to_numpy().astype(np.int64), pa.int64()),
            ],
            schema=MID,
        )

    g = sorted_grouped_agg(
        drop_empty_blocks(
            ds.select_columns([group_col, value_col]).map_batches(
                moments, batch_format="pyarrow"
            ),
            MID,
        ),
        ["_g"],
        [("_n", "sum"), ("_s", "sum"), ("_q", "sum")],
        out_names=["n", "s", "q"],
    ).take_all()  # k rows — group cardinality is human-scale by contract
    OUT = pa.schema(
        [
            ("n_rows", pa.int64()),
            ("k_groups", pa.int64()),
            ("f_micro", pa.int64()),
        ]
    )
    if not g:
        return OUT.empty_table()
    ns = [int(r["n"]) for r in g]
    ss = [int(r["s"]) for r in g]
    qs = [int(r["q"]) for r in g]
    N, S, Q, k = sum(ns), sum(ss), sum(qs), len(g)
    f = None
    if k >= 2 and N > k:
        A = sum(si * si // ni for ni, si in zip(ns, ss))
        B = S * S // N
        ssb, ssw = A - B, Q - A
        if ssw > 0:
            f = (1_000_000 * ssb * (N - k)) // ((k - 1) * ssw)
    return pa.Table.from_arrays(
        [
            pa.array([N], pa.int64()),
            pa.array([k], pa.int64()),
            pa.array([f], pa.int64()),
        ],
        schema=OUT,
    )


def weighted_median(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    weight_col: str,
) -> "ray.data.Dataset":
    """Per-group WEIGHTED lower median: the smallest value v whose
    cumulative weight (in value order) reaches half the group's total —
    ``(group, total_weight, wmedian)``. The robust center when rows carry
    unequal mass (quantity-weighted price medians, token-weighted doc
    scores); exact, never a sampled sketch.

    Shape: one (group, value) cell fastagg (weight sums collapse repeats
    before any sort), ONE hot-key-safe segmented ``cumsum_over`` in
    (group, value) order, a broadcast/hash join against group totals, and
    a group fastagg min over qualifying values. 2·cum ≥ W in pure integers
    — no float, no midpoint interpolation (the lower-median convention,
    mirrored in the twin)."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join
    from .window import cumsum_over

    typ = dict(zip(ds.schema().names, ds.schema().types))
    gt = typ[group_col]
    CELL = pa.schema(
        [(group_col, gt), (value_col, pa.int64()), ("_w", pa.int64())]
    )
    cells = drop_empty_blocks(
        sorted_grouped_agg(
            ds.select_columns([group_col, value_col, weight_col]).map_batches(
                lambda t: pa.Table.from_arrays(
                    [
                        t.column(group_col),
                        pc.cast(t.column(value_col), pa.int64()),
                        pc.cast(t.column(weight_col), pa.int64()),
                    ],
                    schema=CELL,
                )
                if t.num_columns
                else CELL.empty_table(),
                batch_format="pyarrow",
            ),
            [group_col, value_col],
            [("_w", "sum")],
            out_names=["_w"],
        ),
        CELL,
    )
    cum = cumsum_over(
        cells, group_col, [value_col], "_w", out_col="_cw", inclusive=True
    )
    totals = sorted_grouped_agg(
        cells, [group_col], [("_w", "sum")], out_names=["total_weight"]
    )
    joined = hash_join(
        drop_empty_blocks(cum),
        drop_empty_blocks(totals),
        on=(group_col,),
    )
    MID = pa.schema(
        [(group_col, gt), ("total_weight", pa.int64()), (value_col, pa.int64())]
    )

    def qualify(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        keep = pc.greater_equal(
            pc.multiply(t.column("_cw"), pa.scalar(2, pa.int64())),
            t.column("total_weight"),
        )
        t = t.filter(keep)
        return pa.Table.from_arrays(
            [t.column(group_col), t.column("total_weight"), t.column(value_col)],
            schema=MID,
        )

    agg = sorted_grouped_agg(
        drop_empty_blocks(joined.map_batches(qualify, batch_format="pyarrow"), MID),
        [group_col],
        [("total_weight", "min"), (value_col, "min")],
        out_names=["total_weight", "wmedian"],
    )
    return agg


def block_jackknife(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    n_blocks: int = 32,
) -> "pa.Table":
    """Delete-one-block jackknife variance of the mean — ONE row
    ``(n_rows, n_blocks, mean_micro, jk_var_micro2)``: rows are assigned to
    ``n_blocks`` pseudo-replicates by the md5 hash of ``key_col`` (so all
    of one key's rows land in one block — the CLUSTER-robust grouping; a
    per-row split would pretend correlated rows are independent), and the
    estimator variance is (B−1)/B · Σ(m₋ᵢ − m̄)² over the leave-one-block-
    out means. The sampling-error readout every corpus-level mean should
    ship with; rank-free and model-free.

    Fully integer after the hash: leave-out means are quantized to micro
    FIRST (qᵢ = 10⁶·(S−sᵢ) // (N−nᵢ)), so the deviation sum of squares is
    exact int64 and bit-identical to the twin regardless of float-summation
    order. Contract: value_col ≥ 0 int64 (floor ≡ truncation both engines)
    and 10⁶·S < 2⁶³.

    Scale shape: per-batch bincount partials → one ≤B-row fastagg → an O(B)
    driver finalize (B is a constant, default 32). Returns a pa.Table."""
    from ..stages.sampling import _buckets
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    MID = pa.schema([("_b", pa.int64()), ("_n", pa.int64()), ("_s", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        b = _buckets(t.column(key_col), "jk") % n_blocks
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.bincount(b, minlength=n_blocks).astype(np.int64)
        # exact int64 block sums (bincount's weights path rounds via float64)
        s = np.zeros(n_blocks, np.int64)
        np.add.at(s, b, v)
        keep = n > 0
        idx = np.nonzero(keep)[0].astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(idx, pa.int64()), pa.array(n[keep]), pa.array(s[keep])],
            schema=MID,
        )

    g = sorted_grouped_agg(
        drop_empty_blocks(
            ds.select_columns([key_col, value_col]).map_batches(
                partial, batch_format="pyarrow"
            ),
            MID,
        ),
        ["_b"],
        [("_n", "sum"), ("_s", "sum")],
        out_names=["n", "s"],
    ).take_all()  # ≤ n_blocks rows — O(1) driver state by construction
    OUT = pa.schema(
        [
            ("n_rows", pa.int64()),
            ("n_blocks", pa.int64()),
            ("mean_micro", pa.int64()),
            ("jk_var_micro2", pa.int64()),
        ]
    )
    if not g:
        return OUT.empty_table()
    ns = [int(r["n"]) for r in g]
    ss = [int(r["s"]) for r in g]
    N, S, B = sum(ns), sum(ss), len(g)
    mean_micro = (1_000_000 * S) // N
    if B < 2:
        var = None
    else:
        qs = [(1_000_000 * (S - si)) // (N - ni) for ni, si in zip(ns, ss)]
        mbar = sum(qs) // B
        sd = sum((q - mbar) * (q - mbar) for q in qs)
        var = ((B - 1) * sd) // B
    return pa.Table.from_arrays(
        [
            pa.array([N], pa.int64()),
            pa.array([B], pa.int64()),
            pa.array([mean_micro], pa.int64()),
            pa.array([var], pa.int64()),
        ],
        schema=OUT,
    )


def quota_allocate(
    ds: "ray.data.Dataset",
    group_col: str,
    weight_col: str,
    total: int,
) -> "ray.data.Dataset":
    """Largest-remainder (Hamilton) apportionment: split an integer budget
    ``total`` across groups proportionally to their summed int64 weights —
    ``(group, weight, quota)`` with Σquota = total exactly. THE deterministic
    way to turn fractional sampling/mixture proportions into integer
    per-group document quotas (a float-rounded allocation neither sums to
    the budget nor is reproducible): base_g = total·w_g // W, then the
    leftover L = Σ(total·w_g mod W) / W (an exact integer by construction)
    goes to the L largest remainders, ties broken by group ascending.

    Scale shape: one group fastagg over raw weight rows, then everything
    runs at GROUP cardinality (allocation targets are human-scale — domains,
    languages, sources): one hot-key-safe ``ranked_over`` by (remainder
    desc, group asc) and two O(1) driver scalars (W, L) from one-row folds.
    int64 contract: total·W < 2⁶³."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    typ = dict(zip(ds.schema().names, ds.schema().types))
    gw = sorted_grouped_agg(
        ds.select_columns([group_col, weight_col]),
        [group_col],
        [(weight_col, "sum")],
        out_names=["weight"],
    ).materialize()  # consumed by the W fold and the allocation pass

    def _scalar_sum(d, col) -> int:
        tot = 0
        for bt in d.map_batches(
            lambda t: pa.table(
                {"s": pa.array([int(t.column(col).to_pandas().sum()) if t.num_rows else 0], pa.int64())}
            )
            if t.num_columns
            else pa.table({"s": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow"):
            tot += int(bt.column("s").to_pandas().sum())
        return tot

    W = _scalar_sum(gw, "weight")
    if W <= 0:
        raise ValueError("total weight must be positive")

    MID = pa.schema(
        [
            (group_col, typ[group_col]),
            ("weight", pa.int64()),
            ("_base", pa.int64()),
            ("_rem", pa.int64()),
            ("_g", pa.int64()),
        ]
    )

    def split(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.int64)
        prod = total * w
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                t.column("weight"),
                pa.array(prod // W, pa.int64()),
                pa.array(prod % W, pa.int64()),
                pa.array(np.zeros(t.num_rows, np.int64)),
            ],
            schema=MID,
        )

    mid = drop_empty_blocks(
        gw.map_batches(split, batch_format="pyarrow"), MID
    )
    L = _scalar_sum(mid, "_rem") // W
    ranked = ranked_over(
        mid, ["_g"], [("_rem", False), (group_col, True)], rank_col="_rnk"
    )
    OUT = pa.schema(
        [
            (group_col, typ[group_col]),
            ("weight", pa.int64()),
            ("quota", pa.int64()),
        ]
    )

    def alloc(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        extra = pc.cast(
            pc.less_equal(t.column("_rnk"), pa.scalar(L, pa.int64())), pa.int64()
        )
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                t.column("weight"),
                pc.add(t.column("_base"), extra),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(
        ranked.map_batches(alloc, batch_format="pyarrow"), OUT
    )


def diff_in_diff(
    ds: "ray.data.Dataset",
    group_col: str,
    treat_val: str,
    ctrl_val: str,
    ts_col: str,
    value_col: str,
) -> "ray.data.Dataset":
    """Difference-in-differences readout — ONE row ``(n_treat_pre,
    n_treat_post, n_ctrl_pre, n_ctrl_post, cutoff_us, did_micro)``: the
    treated group's pre→post mean change minus the control group's, the
    workhorse quasi-experimental estimator. The period cutoff is the data
    midpoint (min_ts + max_ts) // 2 in epoch µs — deterministic and
    mirrored in the twin. did_micro = floor(10⁶·((m_tp − m_t_pre) −
    (m_cp − m_c_pre))) with the four means computed in doubles in the
    twin's exact op order (the ``welch_t`` discipline); NULL when any of
    the four cells is empty.

    Scale shape: one min/max fold for the cutoff (O(1) driver scalars),
    then per-batch conditional moment partials into a 4-cell fastagg —
    two streaming passes over the input, no shuffle beyond the folds."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    prepped = ds.select_columns([group_col, ts_col, value_col]).materialize()

    def ts_fold(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("_k", pa.int64()), ("_mn", pa.int64()), ("_mx", pa.int64())]
            ).empty_table()
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "_k": pa.array([0], pa.int64()),
                "_mn": pa.array([pc.min(us).as_py()], pa.int64()),
                "_mx": pa.array([pc.max(us).as_py()], pa.int64()),
            }
        )

    mm = sorted_grouped_agg(
        prepped.map_batches(ts_fold, batch_format="pyarrow"),
        ["_k"],
        [("_mn", "min"), ("_mx", "max")],
        out_names=["mn", "mx"],
    ).take_all()
    cutoff = (int(mm[0]["mn"]) + int(mm[0]["mx"])) // 2

    MID = pa.schema(
        [("_k", pa.int64())]
        + [
            (f"_{cell}_{m}", pa.int64())
            for cell in ("tp", "tq", "cp", "cq")
            for m in ("n", "s")
        ]
    )
    # cell codes: tp = treat pre, tq = treat post, cp = ctrl pre, cq = ctrl post

    def moments(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        g = t.column(group_col)
        us = pc.cast(
            pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        post = us > cutoff
        treat = pc.equal(g, treat_val).to_numpy(zero_copy_only=False)
        ctrl = pc.equal(g, ctrl_val).to_numpy(zero_copy_only=False)
        cols = [pa.array([0], pa.int64())]
        for mask in (
            treat & ~post,
            treat & post,
            ctrl & ~post,
            ctrl & post,
        ):
            cols.append(pa.array([int(mask.sum())], pa.int64()))
            cols.append(pa.array([int(v[mask].sum())], pa.int64()))
        return pa.Table.from_arrays(cols, schema=MID)

    agg = sorted_grouped_agg(
        drop_empty_blocks(
            prepped.map_batches(moments, batch_format="pyarrow"), MID
        ),
        ["_k"],
        [(f, "sum") for f in MID.names[1:]],
        out_names=list(MID.names[1:]),
    )
    OUT = pa.schema(
        [
            ("n_treat_pre", pa.int64()),
            ("n_treat_post", pa.int64()),
            ("n_ctrl_pre", pa.int64()),
            ("n_ctrl_post", pa.int64()),
            ("cutoff_us", pa.int64()),
            ("did_micro", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()

        def cell(c):
            return (
                int(t.column(f"_{c}_n")[0].as_py()),
                int(t.column(f"_{c}_s")[0].as_py()),
            )

        ntp, stp = cell("tp")
        ntq, stq = cell("tq")
        ncp, scp = cell("cp")
        ncq, scq = cell("cq")
        did = None
        if min(ntp, ntq, ncp, ncq) > 0:
            # EXACT double op order of the SQL twin
            d = (
                np.float64(stq) / np.float64(ntq)
                - np.float64(stp) / np.float64(ntp)
            ) - (
                np.float64(scq) / np.float64(ncq)
                - np.float64(scp) / np.float64(ncp)
            )
            did = int(np.floor(d * np.float64(1000000.0)))
        return pa.Table.from_arrays(
            [
                pa.array([ntp], pa.int64()),
                pa.array([ntq], pa.int64()),
                pa.array([ncp], pa.int64()),
                pa.array([ncq], pa.int64()),
                pa.array([cutoff], pa.int64()),
                pa.array([did], pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(agg.map_batches(finish, batch_format="pyarrow"), OUT)


def rrf_fuse(
    ranked: "list[ray.data.Dataset]",
    id_col: str,
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
) -> "ray.data.Dataset":
    """Reciprocal-rank fusion of several rankers [Cormack et al. 2009] —
    each input is an (id, 1-based rank) table; fused score = Σ_rankers
    10⁶ // (k0 + rank), emitted as top-``k`` ``(id, n_rankers,
    rrf_micro)`` by (rrf_micro DESC, id). THE standard zero-tuning way to
    combine lexical and semantic retrieval (BM25 ∪ embedding top-k) for
    training-data curation — rank-only fusion sidesteps incomparable score
    scales entirely, and the integer reciprocal keeps it bit-stable.

    Scale shape: stateless per-batch reciprocal map on each ranker, one
    union, one id-cardinality fastagg, one global top-k sort over ≤
    Σ ranker sizes rows (rankers are top-N tables, not corpora)."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    if not ranked:
        raise ValueError("need at least one ranker")
    id_type = dict(
        zip(ranked[0].schema().names, ranked[0].schema().types)
    )[id_col]
    MID = pa.schema([(id_col, id_type), ("_one", pa.int64()), ("_s", pa.int64())])

    def recip(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        r = t.column(rank_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t.column(id_col),
                pa.array(np.ones(t.num_rows, np.int64)),
                pa.array(1_000_000 // (k0 + r), pa.int64()),
            ],
            schema=MID,
        )

    parts = ranked[0].map_batches(recip, batch_format="pyarrow")
    for ds in ranked[1:]:
        parts = parts.union(ds.map_batches(recip, batch_format="pyarrow"))
    agg = sorted_grouped_agg(
        drop_empty_blocks(parts, MID),
        [id_col],
        [("_one", "sum"), ("_s", "sum")],
        out_names=["n_rankers", "rrf_micro"],
    )
    return agg.sort(["rrf_micro", id_col], descending=[True, False]).limit(k)


def cohens_kappa(
    ds: "ray.data.Dataset",
    col_a: str,
    col_b: str,
) -> "ray.data.Dataset":
    """Cohen's kappa between two categorical label columns — ONE row
    ``(n_rows, n_agree, kappa_micro)``: the chance-corrected inter-annotator
    agreement [Cohen 1960], THE annotation-QA readout when two labelers (a
    gold column vs a model/heuristic prediction, two extraction rules, two
    pipeline versions) label the same rows. Plain accuracy rewards majority-
    class parroting; kappa subtracts the agreement expected from the two
    marginal label distributions alone.

    Fully integer: with confusion counts n_ij, N = Σn_ij, D = Σn_ii,
    S = Σ_l row_l·col_l, kappa = (N·D − S)/(N² − S), emitted as
    kappa_micro = (10⁶·(N·D − S)) // (N² − S) — floor division on a
    possibly-negative numerator, the same floor semantics in DuckDB.
    NULL when N² = S (both marginals degenerate — chance agreement is 1).
    Contract: 10⁶·N² must fit int64 → N ≲ 3·10⁶ label pairs per audit at
    micro quantization; sample first above that (the audit is a QA readout,
    not a corpus aggregate).

    Scale shape: one confusion-cell fastagg (labels² cells), then label-
    marginal and constant-key folds over the CELL table — nothing after
    the first fastagg is data-proportional.
    """
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    CONF = pa.schema(
        [("_a", pa.string()), ("_b", pa.string()), ("_n", pa.int64())]
    )

    def cells(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return CONF.empty_table()
        g = (
            t.select([col_a, col_b])
            .group_by([col_a, col_b])
            .aggregate([(col_a, "count")])
        )
        return g.rename_columns(["_a", "_b", "_n"])

    conf = sorted_grouped_agg(
        drop_empty_blocks(ds.map_batches(cells, batch_format="pyarrow"), CONF),
        ["_a", "_b"],
        [("_n", "sum")],
        out_names=["_n"],
    ).materialize()  # consumed by both the marginal and the total folds

    MARG = pa.schema(
        [("_l", pa.string()), ("_r", pa.int64()), ("_c", pa.int64())]
    )

    def marg_parts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MARG.empty_table()
        zero = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.concat_tables(
            [
                pa.Table.from_arrays(
                    [t.column("_a"), t.column("_n"), zero], schema=MARG
                ),
                pa.Table.from_arrays(
                    [t.column("_b"), zero, t.column("_n")], schema=MARG
                ),
            ]
        )

    marg = sorted_grouped_agg(
        conf.map_batches(marg_parts, batch_format="pyarrow"),
        ["_l"],
        [("_r", "sum"), ("_c", "sum")],
        out_names=["_r", "_c"],
    )
    MID = pa.schema(
        [
            ("_k", pa.int64()),
            ("_tot", pa.int64()),
            ("_diag", pa.int64()),
            ("_s", pa.int64()),
        ]
    )

    def tot_parts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        n = t.column("_n").to_numpy(zero_copy_only=False).astype(np.int64)
        eq = pc.equal(t.column("_a"), t.column("_b")).to_numpy(
            zero_copy_only=False
        )
        return pa.Table.from_arrays(
            [
                pa.array([0], pa.int64()),
                pa.array([int(n.sum())], pa.int64()),
                pa.array([int(n[eq].sum())], pa.int64()),
                pa.array([0], pa.int64()),
            ],
            schema=MID,
        )

    def s_parts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        r = t.column("_r").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("_c").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array([0], pa.int64()),
                pa.array([0], pa.int64()),
                pa.array([0], pa.int64()),
                pa.array([int((r * c).sum())], pa.int64()),
            ],
            schema=MID,
        )

    folded = sorted_grouped_agg(
        drop_empty_blocks(
            conf.map_batches(tot_parts, batch_format="pyarrow").union(
                marg.map_batches(s_parts, batch_format="pyarrow")
            ),
            MID,
        ),
        ["_k"],
        [("_tot", "sum"), ("_diag", "sum"), ("_s", "sum")],
        out_names=["_tot", "_diag", "_s"],
    )
    OUT = pa.schema(
        [
            ("n_rows", pa.int64()),
            ("n_agree", pa.int64()),
            ("kappa_micro", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        n = int(t.column("_tot")[0].as_py())
        d = int(t.column("_diag")[0].as_py())
        s = int(t.column("_s")[0].as_py())
        denom = n * n - s
        kappa = (1_000_000 * (n * d - s)) // denom if denom != 0 else None
        return pa.Table.from_arrays(
            [
                pa.array([n], pa.int64()),
                pa.array([d], pa.int64()),
                pa.array([kappa], pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(
        folded.map_batches(finish, batch_format="pyarrow"), OUT
    )


def welch_t(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> "ray.data.Dataset":
    """Welch's unequal-variance t-test between ``group_a`` and ``group_b``
    over int64 ``value_col`` — ONE row ``(n_a, n_b, t2_micro, df_milli)``:
    t² (not t — sign-free, so no sqrt enters either engine) quantized to
    micros and the Welch–Satterthwaite degrees of freedom in millis. The
    parametric complement to ``mann_whitney_u``: U answers "which group is
    stochastically larger", Welch answers "how separated are the means
    relative to their (possibly unequal) variances".

    Determinism: per-group moments (n, Σv, Σv²) are EXACT int64 sums at any
    parallelism; the finalize runs once on a single two-group row with a
    fixed double op order mirrored token-for-token by the DuckDB twin
    (the ``group_corr`` discipline) — floor quantization makes the match
    bit-exact. NULL t²/df when either n ≤ 1 or both variances are zero.

    Scale shape: per-batch int64 moment partials → one two-row fastagg →
    a constant-key pivot fold (a + b columns on one row) → stateless
    finalize. Σv² must fit int64 — same contract as ``group_slope``.
    """
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    MID = pa.schema(
        [
            ("_k", pa.int64()),
            ("_na", pa.int64()),
            ("_sa", pa.int64()),
            ("_qa", pa.int64()),
            ("_nb", pa.int64()),
            ("_sb", pa.int64()),
            ("_qb", pa.int64()),
        ]
    )

    def moments(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        g = t.column(group_col)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        isa = pc.equal(g, group_a).to_numpy(zero_copy_only=False)
        isb = pc.equal(g, group_b).to_numpy(zero_copy_only=False)
        va = np.where(isa, v, 0)
        vb = np.where(isb, v, 0)
        return pa.Table.from_arrays(
            [
                pa.array([0], pa.int64()),
                pa.array([int(isa.sum())], pa.int64()),
                pa.array([int(va.sum())], pa.int64()),
                pa.array([int((va * va).sum())], pa.int64()),
                pa.array([int(isb.sum())], pa.int64()),
                pa.array([int(vb.sum())], pa.int64()),
                pa.array([int((vb * vb).sum())], pa.int64()),
            ],
            schema=MID,
        )

    agg = sorted_grouped_agg(
        ds.select_columns([group_col, value_col]).map_batches(
            moments, batch_format="pyarrow"
        ),
        ["_k"],
        [
            ("_na", "sum"),
            ("_sa", "sum"),
            ("_qa", "sum"),
            ("_nb", "sum"),
            ("_sb", "sum"),
            ("_qb", "sum"),
        ],
        out_names=["_na", "_sa", "_qa", "_nb", "_sb", "_qb"],
    )
    OUT = pa.schema(
        [
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("t2_micro", pa.int64()),
            ("df_milli", pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        na = int(t.column("_na")[0].as_py())
        nb = int(t.column("_nb")[0].as_py())
        sa, qa = int(t.column("_sa")[0].as_py()), int(t.column("_qa")[0].as_py())
        sb, qb = int(t.column("_sb")[0].as_py()), int(t.column("_qb")[0].as_py())
        t2 = df = None
        if na > 1 and nb > 1:
            # EXACT double op order of the SQL twin (sql_purchase_click_welch)
            fna, fnb = np.float64(na), np.float64(nb)
            ma = np.float64(sa) / fna
            mb = np.float64(sb) / fnb
            va = (np.float64(qa) - (np.float64(sa) * np.float64(sa)) / fna) / (
                fna - np.float64(1.0)
            )
            vb = (np.float64(qb) - (np.float64(sb) * np.float64(sb)) / fnb) / (
                fnb - np.float64(1.0)
            )
            sea = va / fna
            seb = vb / fnb
            se = sea + seb
            if se > 0.0:
                d = ma - mb
                t2 = int(np.floor((d * d * np.float64(1000000.0)) / se))
                df = int(
                    np.floor(
                        (se * se * np.float64(1000.0))
                        / (
                            (sea * sea) / (fna - np.float64(1.0))
                            + (seb * seb) / (fnb - np.float64(1.0))
                        )
                    )
                )
        return pa.Table.from_arrays(
            [
                pa.array([na], pa.int64()),
                pa.array([nb], pa.int64()),
                pa.array([t2], pa.int64()),
                pa.array([df], pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(
        agg.map_batches(finalize, batch_format="pyarrow"), OUT
    )


def mann_whitney_u(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
) -> "ray.data.Dataset":
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between the groups of
    ``group_col`` over int64 ``value_col`` — one row per group:
    ``(group, n, u2, auc_ppm)`` where u2 = 2·U (doubled so tie midranks
    stay integer) and auc_ppm = floor(U·10⁶ / (n·(N−n))), the
    common-language effect size P(group value > other value) with ties
    counted half. THE nonparametric two-sample location test — the A/B
    readout that, unlike a means test, survives the heavy-tailed value
    distributions (``user_event_skew``) real event data has. No float
    enters anywhere: doubled midranks make every tie-averaged rank an
    integer, so U is exact at any parallelism.

    Midrank identity: for a tied run of c copies of value v with N_less
    smaller values overall, 2·midrank = 2·N_less + c + 1 — so the whole
    statistic needs only the VALUE-cardinality tables (total count and
    per-group count per distinct value), never a ranking of raw rows.

    Scale shape: two fastaggs at value cardinality, one hot-key-safe
    segmented ``cumsum_over`` for the exclusive N_less scan (single
    constant part — exactly the hot-part shape that scan is built for),
    one value-proportional hash join, one group-cardinality fastagg.
    Contract: Σ c_g·(2N+1) per group must fit int64 — fine to ~10⁹ rows;
    quantize values coarser beyond."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join
    from .window import cumsum_over

    typ = dict(zip(ds.schema().names, ds.schema().types))
    CV = pa.schema([(value_col, pa.int64()), ("_c", pa.int64())])
    cv = drop_empty_blocks(
        sorted_grouped_agg(
            ds.select_columns([value_col]), [value_col], [(value_col, "count")],
            out_names=["_c"],
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.cast(t.column(value_col), pa.int64()),
                 pc.cast(t.column("_c"), pa.int64())],
                schema=CV,
            )
            if t.num_columns
            else CV.empty_table(),
            batch_format="pyarrow",
        ),
        CV,
    ).materialize()  # consumed twice: the N_less scan and the total-N scalar
    # exclusive running count of smaller values over the value-sorted
    # aggregate (constant part: the segmented scan's hot-key case)
    withg = cv.map_batches(
        lambda t: t.append_column("_g", pa.array(np.zeros(t.num_rows, np.int64)))
        if t.num_columns
        else pa.schema(list(CV) + [("_g", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    )
    nless = cumsum_over(
        withg, "_g", [value_col], "_c", out_col="_nless", inclusive=False
    )
    MR = pa.schema([(value_col, pa.int64()), ("_mid2", pa.int64())])
    mr = drop_empty_blocks(
        nless.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column(value_col),
                    pc.add(
                        pc.add(
                            pc.multiply(t.column("_nless"), pa.scalar(2, pa.int64())),
                            t.column("_c"),
                        ),
                        pa.scalar(1, pa.int64()),
                    ),
                ],
                schema=MR,
            )
            if t.num_columns
            else MR.empty_table(),
            batch_format="pyarrow",
        ),
        MR,
    )
    GV = pa.schema(
        [(group_col, typ[group_col]), (value_col, pa.int64()), ("_cg", pa.int64())]
    )
    gv = drop_empty_blocks(
        sorted_grouped_agg(
            ds.select_columns([group_col, value_col]),
            [group_col, value_col],
            [(value_col, "count")],
            out_names=["_cg"],
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column(group_col),
                    pc.cast(t.column(value_col), pa.int64()),
                    pc.cast(t.column("_cg"), pa.int64()),
                ],
                schema=GV,
            )
            if t.num_columns
            else GV.empty_table(),
            batch_format="pyarrow",
        ),
        GV,
    )
    j = hash_join(gv, mr, on=(value_col,))
    P = pa.schema(
        [(group_col, typ[group_col]), ("_n", pa.int64()), ("_r2", pa.int64())]
    )
    prod = drop_empty_blocks(
        j.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column(group_col),
                    t.column("_cg"),
                    pc.multiply(t.column("_cg"), t.column("_mid2")),
                ],
                schema=P,
            )
            if t.num_columns
            else P.empty_table(),
            batch_format="pyarrow",
        ),
        P,
    )
    stats = sorted_grouped_agg(
        prod, [group_col], [("_n", "sum"), ("_r2", "sum")], out_names=["n", "_r2"]
    )
    OUT = pa.schema(
        [
            (group_col, typ[group_col]),
            ("n", pa.int64()),
            ("u2", pa.int64()),
            ("auc_ppm", pa.int64()),
        ]
    )

    def fin(t: pa.Table, total: int) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        r2 = t.column("_r2").to_numpy(zero_copy_only=False).astype(np.int64)
        u2 = r2 - n * (n + 1)
        other = total - n
        auc = np.where(
            other > 0, (u2 * 1_000_000) // np.maximum(2 * n * other, 1), 0
        )
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pa.array(n, pa.int64()),
                pa.array(u2, pa.int64()),
                pa.array(auc, pa.int64(), mask=~(other > 0)),
            ],
            schema=OUT,
        )

    total_n = int(
        sum(
            pc.sum(b.column("_c")).as_py() or 0
            for b in cv.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns and b.num_rows
        )
    )
    return drop_empty_blocks(
        stats.map_batches(
            fin, fn_kwargs={"total": total_n}, batch_format="pyarrow"
        ),
        OUT,
    )


def group_spearman(
    ds: "ray.data.Dataset",
    group_col: str,
    x_col: str,
    y_col: str,
    out_col: str = "spearman_ppm",
) -> "ray.data.Dataset":
    """Per-group Spearman rank correlation between two int64 columns, one
    row per group: ``(group, n, out_col)`` with out_col = floor(ρ·10⁶) —
    the monotone-association screen that, unlike ``group_corr``'s Pearson,
    survives outliers and nonlinear (but monotone) value scales. NULL when
    either column is constant within the group.

    ρ = Pearson on tie-averaged ranks; doubled midranks (2·N_less + c + 1,
    the ``mann_whitney_u`` identity) keep every rank integer, and Pearson
    is scale/shift invariant so the doubling cancels. Exactness: the five
    cross-moments over doubled midranks are exact int64 sums; the finalize
    derives ρ in doubles with the identical promote-then-multiply op order
    as ``group_corr``'s twin — bit-exact floor(ρ·10⁶) at any parallelism.

    Never ranks raw rows: (group, x, y) CELL counts from one fastagg carry
    everything. Midranks come from value-cardinality tables (per-group
    exclusive segmented count scans — hot groups are the scan's hot-part
    case), joined back to the CELLS (cell-cardinality, not row-cardinality,
    probes). Moments are c-weighted sums over cells.

    Contract: Σ c·(2N_g+1)² per group must fit int64 → exact to ~1.3M rows
    per group; quantize values coarser (fewer distinct ranks don't help —
    it's N_g that matters) or shard groups beyond. Reference analog: the
    co-expression rank-correlation screens of the reference's experiment
    aggregation layer (SURVEY.md §2.5)."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join
    from .window import cumsum_over

    typ = dict(zip(ds.schema().names, ds.schema().types))
    gt = typ[group_col]
    CELLS = pa.schema(
        [(group_col, gt), ("_x", pa.int64()), ("_y", pa.int64())]
    )

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return CELLS.empty_table()
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pc.cast(t.column(x_col), pa.int64()),
                pc.cast(t.column(y_col), pa.int64()),
            ],
            schema=CELLS,
        )

    cells = drop_empty_blocks(
        sorted_grouped_agg(
            ds.select_columns([group_col, x_col, y_col]).map_batches(
                prep, batch_format="pyarrow"
            ),
            [group_col, "_x", "_y"],
            [("_x", "count")],
            out_names=["_c"],
        ),
        pa.schema(list(CELLS) + [("_c", pa.int64())]),
    ).materialize()  # consumed three times: x-marginal, y-marginal, probe

    def _midranks(axis: str, out: str) -> "ray.data.Dataset":
        # value-cardinality marginal → exclusive per-group count scan →
        # doubled midrank 2·N_less + c + 1 (integer even under ties)
        marg = sorted_grouped_agg(
            cells.select_columns([group_col, axis, "_c"]),
            [group_col, axis],
            [("_c", "sum")],
            out_names=["_c"],
        )
        nless = cumsum_over(
            marg, group_col, [axis], "_c", out_col="_nless", inclusive=False
        )
        MR = pa.schema([(group_col, gt), (axis, pa.int64()), (out, pa.int64())])
        return drop_empty_blocks(
            nless.map_batches(
                lambda t: pa.Table.from_arrays(
                    [
                        t.column(group_col),
                        t.column(axis),
                        pc.add(
                            pc.add(
                                pc.multiply(
                                    t.column("_nless"), pa.scalar(2, pa.int64())
                                ),
                                t.column("_c"),
                            ),
                            pa.scalar(1, pa.int64()),
                        ),
                    ],
                    schema=MR,
                )
                if t.num_columns
                else MR.empty_table(),
                batch_format="pyarrow",
            ),
            MR,
        )

    # a join's own empty output partitions are schema-less — scrub between
    # the nested joins so one-group inputs don't break the second join
    jx = drop_empty_blocks(
        hash_join(cells, _midranks("_x", "_mx"), on=(group_col, "_x")),
        pa.schema(
            [
                (group_col, gt),
                ("_x", pa.int64()),
                ("_y", pa.int64()),
                ("_c", pa.int64()),
                ("_mx", pa.int64()),
            ]
        ),
    )
    j = hash_join(jx, _midranks("_y", "_my"), on=(group_col, "_y"))
    MID = pa.schema(
        [
            (group_col, gt),
            ("_n", pa.int64()),
            ("_sx", pa.int64()),
            ("_sy", pa.int64()),
            ("_sxx", pa.int64()),
            ("_syy", pa.int64()),
            ("_sxy", pa.int64()),
        ]
    )

    def weigh(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        c = t.column("_c").to_numpy(zero_copy_only=False).astype(np.int64)
        mx = t.column("_mx").to_numpy(zero_copy_only=False).astype(np.int64)
        my = t.column("_my").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pa.array(c, pa.int64()),
                pa.array(c * mx, pa.int64()),
                pa.array(c * my, pa.int64()),
                pa.array(c * mx * mx, pa.int64()),
                pa.array(c * my * my, pa.int64()),
                pa.array(c * mx * my, pa.int64()),
            ],
            schema=MID,
        )

    stats = sorted_grouped_agg(
        drop_empty_blocks(j.map_batches(weigh, batch_format="pyarrow"), MID),
        [group_col],
        [
            ("_n", "sum"),
            ("_sx", "sum"),
            ("_sy", "sum"),
            ("_sxx", "sum"),
            ("_syy", "sum"),
            ("_sxy", "sum"),
        ],
        out_names=["n", "_sx", "_sy", "_sxx", "_syy", "_sxy"],
    )
    OUT = pa.schema([(group_col, gt), ("n", pa.int64()), (out_col, pa.int64())])

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        f = np.float64
        n = t.column("n").to_numpy(zero_copy_only=False).astype(f)
        sx = t.column("_sx").to_numpy(zero_copy_only=False).astype(f)
        sy = t.column("_sy").to_numpy(zero_copy_only=False).astype(f)
        sxx = t.column("_sxx").to_numpy(zero_copy_only=False).astype(f)
        syy = t.column("_syy").to_numpy(zero_copy_only=False).astype(f)
        sxy = t.column("_sxy").to_numpy(zero_copy_only=False).astype(f)
        # identical double derivation as the SQL twin (promote-then-multiply)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        cov = n * sxy - sx * sy
        ok = (vx > 0.0) & (vy > 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.floor((cov * 1000000.0) / (np.sqrt(vx) * np.sqrt(vy)))
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pc.cast(t.column("n"), pa.int64()),
                pa.array(np.where(ok, r, 0).astype(np.int64), pa.int64(), mask=~ok),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(
        stats.map_batches(finalize, batch_format="pyarrow"), OUT
    )


def ks_two_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> "ray.data.Dataset":
    """Exact two-sample Kolmogorov-Smirnov statistic between the rows of
    ``group_a`` and ``group_b`` over int64 ``value_col`` — ONE row:
    ``(n_a, n_b, d_num, d_ppm)`` where d_num = max|cumA·n_b − cumB·n_a|
    (exact integer: the sup of |F_a − F_b| over the step functions, scaled
    by n_a·n_b) and d_ppm = floor(d_num·10⁶ / (n_a·n_b)) in the corr
    family's promote-then-divide double order. The distribution-SHAPE
    companion to ``mann_whitney_u``'s location test: detects any
    distributional drift (spread, modality), not just a median shift.

    Step functions attain their sup at data points, so the statistic needs
    only the VALUE-cardinality table: one fastagg of per-value (c_a, c_b)
    indicator counts, two inclusive segmented cumsum scans over the
    value-sorted aggregate (single constant part — the scan's hot-part
    case), a stateless per-row |·| and one global max fastagg. No raw-row
    ranking, no driver state beyond the two O(1) totals.

    Contract: cum·n ≤ N² must fit int64 → exact to ~3·10⁹ total rows."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .window import cumsum_over

    CV = pa.schema(
        [("_v", pa.int64()), ("_ca", pa.int64()), ("_cb", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return CV.empty_table()
        g = t.column(group_col)
        keep = pc.or_(pc.equal(g, group_a), pc.equal(g, group_b))
        t = t.filter(keep)
        isa = pc.cast(pc.equal(t.column(group_col), group_a), pa.int64())
        return pa.Table.from_arrays(
            [
                pc.cast(t.column(value_col), pa.int64()),
                isa,
                pc.subtract(pa.scalar(1, pa.int64()), isa),
            ],
            schema=CV,
        )

    cv = drop_empty_blocks(
        sorted_grouped_agg(
            ds.select_columns([group_col, value_col]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["_v"],
            [("_ca", "sum"), ("_cb", "sum")],
            out_names=["_ca", "_cb"],
        ),
        CV,
    ).materialize()  # consumed twice: the cum scans and the O(1) totals

    na = nb = 0
    for b in cv.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_columns and b.num_rows:
            na += pc.sum(b.column("_ca")).as_py() or 0
            nb += pc.sum(b.column("_cb")).as_py() or 0

    CVG = pa.schema(list(CV) + [("_g", pa.int64())])
    withg = drop_empty_blocks(
        cv.map_batches(
            lambda t: t.append_column(
                "_g", pa.array(np.zeros(t.num_rows, np.int64))
            )
            if t.num_columns
            else CVG.empty_table(),
            batch_format="pyarrow",
        ),
        CVG,
    )
    cum = cumsum_over(
        cumsum_over(withg, "_g", ["_v"], "_ca", out_col="_cuma"),
        "_g",
        ["_v"],
        "_cb",
        out_col="_cumb",
    )
    D = pa.schema([("_g", pa.int64()), ("_d", pa.int64())])

    def diff(t: pa.Table, na: int, nb: int) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return D.empty_table()
        ca = t.column("_cuma").to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t.column("_cumb").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column("_g"), pa.array(np.abs(ca * nb - cb * na), pa.int64())],
            schema=D,
        )

    mx = sorted_grouped_agg(
        drop_empty_blocks(
            cum.map_batches(
                diff, fn_kwargs={"na": na, "nb": nb}, batch_format="pyarrow"
            ),
            D,
        ),
        ["_g"],
        [("_d", "max")],
        out_names=["_d"],
    )
    OUT = pa.schema(
        [
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("d_num", pa.int64()),
            ("d_ppm", pa.int64()),
        ]
    )

    def fin(t: pa.Table, na: int, nb: int) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        d = int(t.column("_d")[0].as_py())
        ok = na > 0 and nb > 0
        ppm = (
            int(np.floor((np.float64(d) * 1000000.0) / (np.float64(na) * np.float64(nb))))
            if ok
            else None
        )
        return pa.Table.from_arrays(
            [
                pa.array([na], pa.int64()),
                pa.array([nb], pa.int64()),
                pa.array([d], pa.int64()),
                pa.array([ppm], pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(
        mx.map_batches(fin, fn_kwargs={"na": na, "nb": nb}, batch_format="pyarrow"),
        OUT,
    )


def _contingency_cells(
    ds: "ray.data.Dataset", row_col: str, col_col: str
) -> list[tuple[object, object, int]]:
    """Distributed (row, col) contingency counts collected to the driver —
    bounded by distinct(row)·distinct(col) BY CONTRACT (the ``psi_drift``
    bounded-collect shape: callers pass low-cardinality categoricals like
    segment × priority or type × hour; the row counting itself is one
    fastagg with per-batch C++ combiners, so the stream that reaches the
    driver is already cell-cardinality)."""
    from .fastagg import sorted_grouped_agg

    agg = sorted_grouped_agg(
        ds.select_columns([row_col, col_col]),
        [row_col, col_col],
        [(row_col, "count")],
        out_names=["_n"],
    )
    cells: list[tuple[object, object, int]] = []
    for bt in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        if bt.num_columns and bt.num_rows:
            cells.extend(
                zip(
                    bt.column(row_col).to_pylist(),
                    bt.column(col_col).to_pylist(),
                    (int(x) for x in bt.column("_n").to_pylist()),
                )
            )
    return cells


def contingency_chi2(
    ds: "ray.data.Dataset", row_col: str, col_col: str
) -> "ray.data.Dataset":
    """Pearson chi-square test of independence between two categorical
    columns — ONE row ``(n, n_rows, n_cols, dof, chi2_micro,
    cramers_v_ppm)``. The are-these-features-independent audit run before
    using one categorical to stratify another (SURVEY §2.5's significance
    readouts, generalized to a two-way table).

    chi2_micro = Σ over the FULL row×col cross product (zero cells
    contribute their expected mass) of floor((O·N − R·C)²·10⁶ / (N·R·C))
    per cell, each term derived in doubles with the exact op order of the
    SQL twin, summed as int64 — deterministic at any parallelism.
    cramers_v_ppm = floor(√((chi2_micro/10⁶)/(N·min(R−1,C−1)))·10⁶) from
    the already-quantized statistic, same both sides.

    Scale shape: one (row,col)-cardinality fastagg; the cross-product
    finalize is O(categories²) on the driver — bounded by contract."""
    cells = _contingency_cells(ds, row_col, col_col)
    obs: dict[tuple[object, object], int] = {(r, c): n for r, c, n in cells}
    rt: dict[object, int] = {}
    ct: dict[object, int] = {}
    for r, c, n in cells:
        rt[r] = rt.get(r, 0) + n
        ct[c] = ct.get(c, 0) + n
    n_tot = sum(rt.values())
    R, C = len(rt), len(ct)
    OUT = pa.schema(
        [
            ("n", pa.int64()),
            ("n_rows", pa.int64()),
            ("n_cols", pa.int64()),
            ("dof", pa.int64()),
            ("chi2_micro", pa.int64()),
            ("cramers_v_ppm", pa.int64()),
        ]
    )
    if n_tot == 0 or R < 2 or C < 2:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "n": [n_tot],
                    "n_rows": [R],
                    "n_cols": [C],
                    "dof": [0],
                    "chi2_micro": [None],
                    "cramers_v_ppm": [None],
                },
                schema=OUT,
            )
        )
    f = np.float64
    chi2 = 0
    for r, rtot in rt.items():
        for c, ctot in ct.items():
            o = obs.get((r, c), 0)
            # identical double op order as the SQL twin
            d = f(o) * f(n_tot) - f(rtot) * f(ctot)
            chi2 += int(np.floor((d * d * 1000000.0) / (f(n_tot) * f(rtot) * f(ctot))))
    k = min(R - 1, C - 1)
    v = int(np.floor(np.sqrt((f(chi2) / 1000000.0) / (f(n_tot) * f(k))) * 1000000.0))
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "n": [n_tot],
                "n_rows": [R],
                "n_cols": [C],
                "dof": [(R - 1) * (C - 1)],
                "chi2_micro": [chi2],
                "cramers_v_ppm": [v],
            },
            schema=OUT,
        )
    )


def contingency_mi(
    ds: "ray.data.Dataset", row_col: str, col_col: str
) -> "ray.data.Dataset":
    """Mutual information between two categorical columns in quantized
    units — ONE row ``(n, n_rows, n_cols, mi_milli_sum)`` where
    mi_milli_sum = Σ over OBSERVED cells of O·floor(ln(O·N/(R·C))·10³):
    the pointwise-MI log quantized to integer milli-nats FIRST (the
    ``corpus_zipf_slope`` discipline — floor(ln·10³) is where numpy and
    DuckDB libm provably agree), then weighted by the exact integer cell
    count and summed as int64. MI = mi_milli_sum/(N·10³) nats up to
    quantization; zero cells contribute exactly 0 (lim x·ln x = 0), so no
    cross product is needed. THE feature-redundancy screen (does hour of
    day carry event-type information?).

    Scale shape: identical to ``contingency_chi2`` — one cell-cardinality
    fastagg, O(cells) driver finalize, bounded by contract."""
    cells = _contingency_cells(ds, row_col, col_col)
    rt: dict[object, int] = {}
    ct: dict[object, int] = {}
    for r, c, n in cells:
        rt[r] = rt.get(r, 0) + n
        ct[c] = ct.get(c, 0) + n
    n_tot = sum(rt.values())
    f = np.float64
    mi = 0
    for r, c, o in cells:
        l = int(
            np.floor(np.log((f(o) * f(n_tot)) / (f(rt[r]) * f(ct[c]))) * 1000.0)
        )
        mi += o * l
    OUT = pa.schema(
        [
            ("n", pa.int64()),
            ("n_rows", pa.int64()),
            ("n_cols", pa.int64()),
            ("mi_milli_sum", pa.int64()),
        ]
    )
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "n": [n_tot],
                "n_rows": [len(rt)],
                "n_cols": [len(ct)],
                "mi_milli_sum": [mi if n_tot else None],
            },
            schema=OUT,
        )
    )


def group_cusum(
    ds: "ray.data.Dataset",
    group_col: str,
    order_col: str,
    count_col: str,
) -> "ray.data.Dataset":
    """Exact integer CUSUM change-point statistic per group — one row
    ``(group, n_steps, total, cusum_max, peak_step)`` over a pre-counted
    (group, step, count) series: cusum_max = max_j |n·C_j − j·S| where C_j
    is the running count through the j-th observed step and S the group
    total — the scaled sup deviation of the empirical arrival curve from a
    constant rate. Large values flag WHERE a rate shifted (``peak_step``,
    ties → earliest step): the drift localizer that complements
    ``event_type_burstiness``'s dispersion test and ``psi_drift``'s
    two-snapshot comparison. Pure int64 throughout (|n·C_j − j·S| ≤ n·S —
    exact past 10⁹ steps × 10⁹ rows); no float anywhere.

    Scale shape: one hot-key-safe ``ranked_over`` for the step index j, one
    segmented ``cumsum_over`` for C_j, a group-cardinality fastagg + join
    for (n, S), then a second ``ranked_over`` on (|T| desc, step asc) picks
    each group's peak without a whole-group task."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join
    from .window import cumsum_over

    typ = dict(zip(ds.schema().names, ds.schema().types))
    gt = typ[group_col]
    ranked = ranked_over(
        ds.select_columns([group_col, order_col, count_col]),
        [group_col],
        [(order_col, True)],
        rank_col="_j",
    )
    cum = cumsum_over(ranked, group_col, [order_col], count_col, out_col="_cum")
    tot = sorted_grouped_agg(
        ds.select_columns([group_col, count_col]),
        [group_col],
        [(count_col, "count"), (count_col, "sum")],
        out_names=["n_steps", "total"],
    )
    j = hash_join(drop_empty_blocks(cum), drop_empty_blocks(tot), on=(group_col,))
    T = pa.schema(
        [
            (group_col, gt),
            (order_col, typ[order_col]),
            ("n_steps", pa.int64()),
            ("total", pa.int64()),
            ("_t", pa.int64()),
        ]
    )

    def stat(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return T.empty_table()
        n = t.column("n_steps").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("total").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("_cum").to_numpy(zero_copy_only=False).astype(np.int64)
        jj = t.column("_j").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                t.column(order_col),
                pa.array(n, pa.int64()),
                pa.array(s, pa.int64()),
                pa.array(np.abs(n * c - jj * s), pa.int64()),
            ],
            schema=T,
        )

    stats = drop_empty_blocks(j.map_batches(stat, batch_format="pyarrow"), T)
    peak = ranked_over(
        stats, [group_col], [("_t", False), (order_col, True)], rank_col="_rn"
    )
    OUT = pa.schema(
        [
            (group_col, gt),
            ("n_steps", pa.int64()),
            ("total", pa.int64()),
            ("cusum_max", pa.int64()),
            ("peak_step", typ[order_col]),
        ]
    )
    return drop_empty_blocks(
        peak.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    (f := t.filter(pc.equal(t.column("_rn"), 1))).column(group_col),
                    f.column("n_steps"),
                    f.column("total"),
                    f.column("_t"),
                    f.column(order_col),
                ],
                schema=OUT,
            )
            if t.num_columns
            else OUT.empty_table(),
            batch_format="pyarrow",
        ),
        OUT,
    )


def benford_digits(
    ds: "ray.data.Dataset", value_col: str
) -> "ray.data.Dataset":
    """Benford first-significant-digit audit over positive int64 values —
    NINE rows ``(digit, n_obs, obs_ppm, expected_ppm, dev_ppm)``: observed
    share vs Benford's log₁₀(1+1/d) law, the classic fabricated-amounts /
    unit-mixup data-quality screen on money columns. Digits extracted by
    pure integer division (repeated //10 until < 10 — no float log near
    power-of-ten boundaries, no string round-trip); rows with value ≤ 0
    are excluded. obs_ppm = n_obs·10⁶ // N (integer floor); expected_ppm =
    floor(ln(1+1/d)/ln(10)·10⁶) — a CONSTANT per digit, identical in the
    twin; dev_ppm = obs_ppm − expected_ppm. All nine digits always
    emitted (zero-filled), so a digit that never appears shows its full
    negative deviation.

    Scale shape: per-batch digit histograms (≤ 9 cells) combine into one
    9-row fastagg; the finalize is O(9) on the driver."""
    from .fastagg import sorted_grouped_agg

    H = pa.schema([("digit", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return H.empty_table()
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = v[v > 0]
        while (v >= 10).any():
            big = v >= 10
            v[big] //= 10
        u, c = np.unique(v, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(np.int64)), pa.array(c.astype(np.int64))],
            schema=H,
        )

    agg = sorted_grouped_agg(
        ds.select_columns([value_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["digit"],
        [("n", "sum")],
        out_names=["n"],
    )
    obs: dict[int, int] = {}
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_columns and b.num_rows:
            for d, n in zip(b.column("digit").to_pylist(), b.column("n").to_pylist()):
                obs[int(d)] = int(n)
    n_tot = sum(obs.values())
    f = np.float64
    digits = list(range(1, 10))
    n_obs = [obs.get(d, 0) for d in digits]
    obs_ppm = [x * 1_000_000 // n_tot if n_tot else 0 for x in n_obs]
    exp_ppm = [
        int(np.floor(np.log(1.0 + 1.0 / f(d)) / np.log(f(10.0)) * 1000000.0))
        for d in digits
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "digit": pa.array(digits, pa.int64()),
                "n_obs": pa.array(n_obs, pa.int64()),
                "obs_ppm": pa.array(obs_ppm, pa.int64()),
                "expected_ppm": pa.array(exp_ppm, pa.int64()),
                "dev_ppm": pa.array(
                    [o - e for o, e in zip(obs_ppm, exp_ppm)], pa.int64()
                ),
            }
        )
    )


def halflife_decayed_sum(
    ds: "ray.data.Dataset",
    group_col: str,
    day_col: str,
    value_col: str,
    halflife_days: int = 7,
    max_shift: int = 40,
) -> "ray.data.Dataset":
    """Recency-weighted value rollup per group — ``(group, n_rows,
    total, decayed)`` where decayed = Σ value >> min((max_day − day) //
    halflife_days, max_shift): each half-life ago HALVES a row's
    contribution, by exact integer shift. The feature-engineering op
    behind recency-weighted LTV / activity scores — and unlike the float
    exp-decay it replaces, bit-identical at any parallelism and in the
    SQL twin (floor-halving loses < 1 unit per half-life step; at cents
    granularity that error is economically zero while the determinism is
    total). ``max_day`` is the global max of ``day_col`` (one O(1)
    scalar); ``max_shift`` caps the shift so 40+ half-lives ago cleanly
    floors to 0 without shift-overflow UB. Values must be non-negative
    int64 (shift == floor-div-by-2^w only holds for non-negatives —
    enforced).

    Scale shape: one O(1) max scalar, one stateless vectorized decay map,
    one group-cardinality fastagg."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    typ = dict(zip(ds.schema().names, ds.schema().types))
    mx = sorted_grouped_agg(
        ds.select_columns([day_col]).map_batches(
            lambda t: t.append_column(
                "_g", pa.array(np.zeros(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
        ),
        ["_g"],
        [(day_col, "max")],
        out_names=["_m"],
    )
    max_day = 0
    for b in mx.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_columns and b.num_rows:
            max_day = int(b.column("_m")[0].as_py())

    MID = pa.schema(
        [
            (group_col, typ[group_col]),
            ("_v", pa.int64()),
            ("_d", pa.int64()),
        ]
    )

    def decay(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if (v < 0).any():
            raise ValueError("halflife_decayed_sum requires non-negative values")
        d = t.column(day_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.minimum((max_day - d) // halflife_days, max_shift)
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pa.array(v, pa.int64()),
                pa.array(v >> w, pa.int64()),
            ],
            schema=MID,
        )

    agg = sorted_grouped_agg(
        drop_empty_blocks(
            ds.select_columns([group_col, day_col, value_col]).map_batches(
                decay, batch_format="pyarrow"
            ),
            MID,
        ),
        [group_col],
        [("_v", "count"), ("_v", "sum"), ("_d", "sum")],
        out_names=["n_rows", "total", "decayed"],
    )
    OUT = pa.schema(
        [
            (group_col, typ[group_col]),
            ("n_rows", pa.int64()),
            ("total", pa.int64()),
            ("decayed", pa.int64()),
        ]
    )
    return drop_empty_blocks(
        agg.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column(group_col),
                    pc.cast(t.column("n_rows"), pa.int64()),
                    pc.cast(t.column("total"), pa.int64()),
                    pc.cast(t.column("decayed"), pa.int64()),
                ],
                schema=OUT,
            )
            if t.num_columns
            else OUT.empty_table(),
            batch_format="pyarrow",
        ),
        OUT,
    )


def group_gini(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    out_col: str = "gini_ppm",
) -> "ray.data.Dataset":
    """Per-group Gini concentration coefficient over a non-negative int64
    value column, one row per group: ``(group, n, total, out_col)`` with
    out_col = floor(G·10⁶) — the inequality screen (how concentrated is
    spend/volume across members of a group) behind Lorenz-curve dashboards
    and Pareto "top x% own y%" audits. NULL when the group total is zero.

    Identity used: with doubled midranks m = 2·N_less + c + 1 (the
    ``group_spearman``/``mann_whitney_u`` integer rank), the classic
    sorted-rank form G = Σ(2i−n−1)·vᵢ / (n·Σv) collapses per VALUE cell to
    G_num = Σ_cells v·c·m − (n+1)·Σv — ties need no tie-break because the
    (2i−n−1) weights summed over a tie block are permutation-invariant.
    G_num is an EXACT int64; the finalize performs ONE promote-then-divide
    double op (G_num::DOUBLE·10⁶ / (n·S)) in the same order as the DuckDB
    twin — bit-exact floor at any parallelism.

    Never ranks raw rows: (group, v) CELL counts from one fastagg carry
    everything; N_less comes from a per-group exclusive segmented count
    scan over the value-cardinality marginal (hot groups are the scan's
    hot-part case), so a group with 10⁹ rows but 10⁴ distinct values costs
    10⁴ cell rows past the first aggregate.

    Contract: values must be ≥ 0 (Gini is undefined below zero — quantize
    and clamp upstream) and Σ v·c·(2n+1) per group must fit int64, i.e.
    2·n·Σv ≲ 9.2·10¹⁸ — cents values up to ~$10M with up to ~10⁸-row
    groups; rescale coarser beyond. Reference analog: the per-experiment
    abundance-concentration summaries of SURVEY.md §2.5."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .window import cumsum_over

    typ = dict(zip(ds.schema().names, ds.schema().types))
    gt = typ[group_col]
    CELLS = pa.schema([(group_col, gt), ("_v", pa.int64())])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return CELLS.empty_table()
        return pa.Table.from_arrays(
            [t.column(group_col), pc.cast(t.column(value_col), pa.int64())],
            schema=CELLS,
        )

    cells = sorted_grouped_agg(
        ds.select_columns([group_col, value_col]).map_batches(
            prep, batch_format="pyarrow"
        ),
        [group_col, "_v"],
        [("_v", "count")],
        out_names=["_c"],
    )
    nless = cumsum_over(
        cells, group_col, ["_v"], "_c", out_col="_nless", inclusive=False
    )
    MID = pa.schema(
        [
            (group_col, gt),
            ("_n", pa.int64()),
            ("_s", pa.int64()),
            ("_vm", pa.int64()),
        ]
    )

    def weigh(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        v = t.column("_v").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("_c").to_numpy(zero_copy_only=False).astype(np.int64)
        nl = t.column("_nless").to_numpy(zero_copy_only=False).astype(np.int64)
        m = 2 * nl + c + 1  # doubled midrank, integer even under ties
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pa.array(c, pa.int64()),
                pa.array(v * c, pa.int64()),
                pa.array(v * c * m, pa.int64()),
            ],
            schema=MID,
        )

    stats = sorted_grouped_agg(
        drop_empty_blocks(nless.map_batches(weigh, batch_format="pyarrow"), MID),
        [group_col],
        [("_n", "sum"), ("_s", "sum"), ("_vm", "sum")],
        out_names=["n", "_s", "_vm"],
    )
    OUT = pa.schema(
        [
            (group_col, gt),
            ("n", pa.int64()),
            ("total", pa.int64()),
            (out_col, pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("_s").to_numpy(zero_copy_only=False).astype(np.int64)
        vm = t.column("_vm").to_numpy(zero_copy_only=False).astype(np.int64)
        gnum = vm - (n + 1) * s  # exact int64, Σ(2i−n−1)·vᵢ
        ok = s > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            # identical promote-then-divide order as the SQL twin
            g = np.floor(
                (gnum.astype(np.float64) * 1000000.0)
                / (n.astype(np.float64) * s.astype(np.float64))
            )
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pc.cast(t.column("n"), pa.int64()),
                pa.array(s, pa.int64()),
                pa.array(np.where(ok, g, 0).astype(np.int64), pa.int64(), mask=~ok),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(
        stats.map_batches(finalize, batch_format="pyarrow"), OUT
    )


def total_variation(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> "ray.data.Dataset":
    """Exact total-variation distance between the value distributions of
    two groups over int64 ``value_col`` — ONE row ``(n_a, n_b, tv_num,
    tv_ppm)`` where tv_num = Σ_values |c_a·n_b − c_b·n_a| (exact integer:
    2·n_a·n_b·TV) and tv_ppm = floor(tv_num·10⁶ / (2·n_a·n_b)) in the
    ``ks_two_sample`` promote-then-divide double order. TV = the largest
    probability mass any event can differ by — the drift gauge that,
    unlike KS (sup of the CDF gap), weighs ALL value cells, and unlike
    PSI, is bounded [0,1] and zero-cell-safe with no smoothing constant.

    Needs only the VALUE-cardinality cell table (one fastagg of per-value
    indicator counts), two O(1) totals, one stateless |·| map and one
    scalar fastagg — no cumsum, no sort, no driver state. Contract:
    c·n ≤ n_a·n_b must fit int64 → exact to ~3·10⁹ rows per side."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    CV = pa.schema(
        [("_v", pa.int64()), ("_ca", pa.int64()), ("_cb", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return CV.empty_table()
        g = t.column(group_col)
        t = t.filter(pc.or_(pc.equal(g, group_a), pc.equal(g, group_b)))
        isa = pc.cast(pc.equal(t.column(group_col), group_a), pa.int64())
        return pa.Table.from_arrays(
            [
                pc.cast(t.column(value_col), pa.int64()),
                isa,
                pc.subtract(pa.scalar(1, pa.int64()), isa),
            ],
            schema=CV,
        )

    cv = drop_empty_blocks(
        sorted_grouped_agg(
            ds.select_columns([group_col, value_col]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["_v"],
            [("_ca", "sum"), ("_cb", "sum")],
            out_names=["_ca", "_cb"],
        ),
        CV,
    ).materialize()  # consumed twice: O(1) totals + the |·| pass

    na = nb = 0
    tot = sorted_grouped_agg(
        cv.map_batches(
            lambda t: t.append_column(
                "_g", pa.array(np.zeros(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
        ),
        ["_g"],
        [("_ca", "sum"), ("_cb", "sum")],
        out_names=["_na", "_nb"],
    )
    for b in tot.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_columns and b.num_rows:
            na = int(b.column("_na")[0].as_py())
            nb = int(b.column("_nb")[0].as_py())

    AD = pa.schema([("_g", pa.int64()), ("_d", pa.int64())])

    def absdiff(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return AD.empty_table()
        ca = t.column("_ca").to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t.column("_cb").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(np.zeros(len(ca), np.int64)),
                pa.array(np.abs(ca * nb - cb * na), pa.int64()),
            ],
            schema=AD,
        )

    num = sorted_grouped_agg(
        drop_empty_blocks(cv.map_batches(absdiff, batch_format="pyarrow"), AD),
        ["_g"],
        [("_d", "sum")],
        out_names=["_num"],
    )
    OUT = pa.schema(
        [
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("tv_num", pa.int64()),
            ("tv_ppm", pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        n = t.column("_num").to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (na > 0) and (nb > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            # identical promote-then-divide order as the SQL twin
            ppm = np.floor(
                (n.astype(np.float64) * 1000000.0)
                / (2.0 * np.float64(na) * np.float64(nb))
            )
        return pa.Table.from_arrays(
            [
                pa.array([na] * len(n), pa.int64()),
                pa.array([nb] * len(n), pa.int64()),
                pa.array(n, pa.int64()),
                pa.array(
                    np.where(ok, ppm, 0).astype(np.int64),
                    pa.int64(),
                    mask=np.full(len(n), not ok),
                ),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(
        num.map_batches(finalize, batch_format="pyarrow"), OUT
    )


def pareto_class(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    thresholds: tuple[int, int] = (80, 95),
) -> "ray.data.Dataset":
    """ABC / Pareto classification over (key, value) rows — ``(key, value,
    cum_value, abc_class)`` where keys are ranked by value DESC (key asc
    tie-break), cum_value is the inclusive running total in that order,
    and abc_class is 'A' while cum·100 ≤ total·t₁, 'B' while ≤ t₂, else
    'C' — the "top customers own 80% of revenue" working-capital segmenter.
    The class boundary test is PURE INTEGER (cum·100 vs total·tᵢ — no
    share division ever happens), so the cut is bit-exact at any
    parallelism and in the SQL twin.

    Input contract: one row per key (pre-aggregate upstream); non-negative
    int64 values with total·100 < 2⁶³ (≲ $9·10¹⁴ in cents). Shape: ONE
    global segmented cumsum in (−value, key) order (single constant part —
    the scan's hot-part case), one O(1) total scalar, one stateless
    vectorized classify. No ranking join, no driver state."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .window import cumsum_over

    typ = dict(zip(ds.schema().names, ds.schema().types))
    kt = typ[key_col]
    MID = pa.schema(
        [
            (key_col, kt),
            ("_v", pa.int64()),
            ("_neg", pa.int64()),
            ("_g", pa.int64()),
        ]
    )

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        v = pc.cast(t.column(value_col), pa.int64())
        return pa.Table.from_arrays(
            [
                t.column(key_col),
                v,
                pc.negate_checked(v),
                pa.array(np.zeros(t.num_rows, np.int64)),
            ],
            schema=MID,
        )

    prepped = drop_empty_blocks(
        ds.select_columns([key_col, value_col]).map_batches(
            prep, batch_format="pyarrow"
        ),
        MID,
    ).materialize()  # consumed twice: O(1) total + the cum scan

    total = 0
    tot = sorted_grouped_agg(
        prepped, ["_g"], [("_v", "sum")], out_names=["_t"]
    )
    for b in tot.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_columns and b.num_rows:
            total = int(b.column("_t")[0].as_py())

    cum = cumsum_over(
        prepped, "_g", ["_neg", key_col], "_v", out_col="_cum"
    )
    OUT = pa.schema(
        [
            (key_col, kt),
            ("value", pa.int64()),
            ("cum_value", pa.int64()),
            ("abc_class", pa.string()),
        ]
    )
    t1, t2 = thresholds

    def classify(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        cumv = t.column("_cum").to_numpy(zero_copy_only=False).astype(np.int64)
        cls = np.where(
            cumv * 100 <= total * t1,
            "A",
            np.where(cumv * 100 <= total * t2, "B", "C"),
        )
        return pa.Table.from_arrays(
            [
                t.column(key_col),
                t.column("_v"),
                pa.array(cumv, pa.int64()),
                pa.array(cls, pa.string()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(cum.map_batches(classify, batch_format="pyarrow"), OUT)


def group_kendall_binned(
    ds: "ray.data.Dataset",
    group_col: str,
    x_col: str,
    y_col: str,
    k: int = 10,
) -> "ray.data.Dataset":
    """Per-group Kendall τ-b between two int64 columns on within-group
    midrank-decile bins — ``(group, n, kendall_ppm)`` with kendall_ppm =
    floor(τ_b·10⁶), NULL when either axis is constant (all mass in one
    bin). The concordance-based rank association: unlike Spearman (which
    squares rank displacements) τ counts pair ORDER inversions, the
    robustness grade forecast evaluation and feature screens ask for.
    Binning is what makes τ scale-feasible (exact τ needs all O(n²) pair
    orders); the bin of a VALUE is its doubled-midrank decile,
    qx = ((2·N_less + c)·k) // (2n) — tie-PRESERVING (equal values always
    share a bin; in [0, k−1] by construction) and the binned statistic is
    exactly τ-b of that deterministic coarsening, mirrored in the twin.

    NEVER ranks raw rows — the lesson of the measured 57× step at 16×
    data for the first cut of this operator (two NTILE passes = two
    full-data global sorts + two full-data shuffle joins once the group
    count passes the broadcast threshold): bins come from per-axis
    VALUE-cell marginals (exclusive segmented count scans, the
    ``group_spearman`` shape), joined back to the (g, x, y) cells at CELL
    cardinality. Concordant/discordant mass then comes from a
    within-group bin-cell self-join — fan-out ≤ k⁴/2 pairs per group
    (≤ 5000 at k=10) REGARDLESS of group row count; tie masses n₁, n₂
    from the bin marginals. All counts exact int64 (contract: n per
    group ≲ 3·10⁹ so n(n−1)/2 fits); the single float step is the final
    promote-then-multiply floor, identical op order to the twin. Groups
    with no cross-bin x pairs surface through the pagerank-style
    zero-row union, so constant groups emit NULL rather than vanish."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join
    from .window import cumsum_over

    typ = dict(zip(ds.schema().names, ds.schema().types))
    gt = typ[group_col]

    XY = pa.schema([(group_col, gt), ("_x", pa.int64()), ("_y", pa.int64())])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return XY.empty_table()
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pc.cast(t.column(x_col), pa.int64()),
                pc.cast(t.column(y_col), pa.int64()),
            ],
            schema=XY,
        )

    vcells = drop_empty_blocks(
        sorted_grouped_agg(
            ds.select_columns([group_col, x_col, y_col]).map_batches(
                prep, batch_format="pyarrow"
            ),
            [group_col, "_x", "_y"],
            [("_x", "count")],
            out_names=["_c"],
        ),
        pa.schema(list(XY) + [("_c", pa.int64())]),
    ).materialize()  # consumed thrice: totals + two bin-marginal paths

    NG = pa.schema([(group_col, gt), ("_n", pa.int64())])
    ngrp = drop_empty_blocks(
        sorted_grouped_agg(
            vcells.select_columns([group_col, "_c"]),
            [group_col],
            [("_c", "sum")],
            out_names=["_n"],
        ),
        NG,
    ).materialize()

    def _bins(axis: str, out: str) -> "ray.data.Dataset":
        # value-cardinality marginal → exclusive count scan → doubled
        # midrank m = 2·N_less + c → bin (m·k) // (2n) ∈ [0, k−1]
        marg = sorted_grouped_agg(
            vcells.select_columns([group_col, axis, "_c"]),
            [group_col, axis],
            [("_c", "sum")],
            out_names=["_cm"],
        )
        nless = cumsum_over(
            marg, group_col, [axis], "_cm", out_col="_nl", inclusive=False
        )
        withn = hash_join(
            drop_empty_blocks(
                nless,
                pa.schema(
                    [
                        (group_col, gt),
                        (axis, pa.int64()),
                        ("_cm", pa.int64()),
                        ("_nl", pa.int64()),
                    ]
                ),
            ),
            ngrp,
            on=(group_col,),
        )
        QB = pa.schema([(group_col, gt), (axis, pa.int64()), (out, pa.int64())])

        def fin(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return QB.empty_table()
            cm = t.column("_cm").to_numpy(zero_copy_only=False).astype(np.int64)
            nl = t.column("_nl").to_numpy(zero_copy_only=False).astype(np.int64)
            n = t.column("_n").to_numpy(zero_copy_only=False).astype(np.int64)
            q = (2 * nl + cm) * k // (2 * n)
            return pa.Table.from_arrays(
                [t.column(group_col), t.column(axis), pa.array(q, pa.int64())],
                schema=QB,
            )

        return drop_empty_blocks(withn.map_batches(fin, batch_format="pyarrow"), QB)

    jx = drop_empty_blocks(
        hash_join(vcells, _bins("_x", "_qx"), on=(group_col, "_x")),
        pa.schema(
            [
                (group_col, gt),
                ("_x", pa.int64()),
                ("_y", pa.int64()),
                ("_c", pa.int64()),
                ("_qx", pa.int64()),
            ]
        ),
    )
    jxy = drop_empty_blocks(
        hash_join(jx, _bins("_y", "_qy"), on=(group_col, "_y")),
        pa.schema(
            [
                (group_col, gt),
                ("_x", pa.int64()),
                ("_y", pa.int64()),
                ("_c", pa.int64()),
                ("_qx", pa.int64()),
                ("_qy", pa.int64()),
            ]
        ),
    )
    CELLS = pa.schema(
        [(group_col, gt), ("_qx", pa.int64()), ("_qy", pa.int64())]
    )
    cells = drop_empty_blocks(
        sorted_grouped_agg(
            jxy.map_batches(
                lambda t: t.select([group_col, "_qx", "_qy", "_c"])
                if t.num_columns
                else pa.schema(list(CELLS) + [("_c", pa.int64())]).empty_table(),
                batch_format="pyarrow",
            ),
            [group_col, "_qx", "_qy"],
            [("_c", "sum")],
            out_names=["_c"],
        ),
        pa.schema(list(CELLS) + [("_c", pa.int64())]),
    ).materialize()  # consumed four times: marginals ×2, pair join ×2

    def _tie_mass(axis: str) -> "ray.data.Dataset":
        marg = sorted_grouped_agg(
            cells.select_columns([group_col, axis, "_c"]),
            [group_col, axis],
            [("_c", "sum")],
            out_names=["_t"],
        )
        TM = pa.schema([(group_col, gt), ("_n", pa.int64()), ("_tp", pa.int64())])

        def pairs(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return TM.empty_table()
            tt = t.column("_t").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.Table.from_arrays(
                [
                    t.column(group_col),
                    pa.array(tt, pa.int64()),
                    pa.array(tt * (tt - 1) // 2, pa.int64()),
                ],
                schema=TM,
            )

        return sorted_grouped_agg(
            drop_empty_blocks(marg.map_batches(pairs, batch_format="pyarrow"), TM),
            [group_col],
            [("_n", "sum"), ("_tp", "sum")],
            out_names=["_n", "_tp"],
        )

    tx = _tie_mass("_qx")
    ty = _tie_mass("_qy").map_batches(
        lambda t: t.rename_columns([group_col, "_n2", "_tp2"])
        if t.num_columns
        else pa.schema(
            [(group_col, gt), ("_n2", pa.int64()), ("_tp2", pa.int64())]
        ).empty_table(),
        batch_format="pyarrow",
    )

    right = cells.map_batches(
        lambda t: t.rename_columns([group_col, "_qx2", "_qy2", "_c2"])
        if t.num_columns
        else pa.schema(
            [
                (group_col, gt),
                ("_qx2", pa.int64()),
                ("_qy2", pa.int64()),
                ("_c2", pa.int64()),
            ]
        ).empty_table(),
        batch_format="pyarrow",
    )
    paired = hash_join(cells, right, on=(group_col,))
    CD = pa.schema([(group_col, gt), ("_C", pa.int64()), ("_D", pa.int64())])

    def cd(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return CD.empty_table()
        keep = pc.less(t.column("_qx"), t.column("_qx2"))
        t = t.filter(keep)
        c = t.column("_c").to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = t.column("_c2").to_numpy(zero_copy_only=False).astype(np.int64)
        qy_ = t.column("_qy").to_numpy(zero_copy_only=False).astype(np.int64)
        qy2 = t.column("_qy2").to_numpy(zero_copy_only=False).astype(np.int64)
        m = c * c2
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pa.array(np.where(qy_ < qy2, m, 0), pa.int64()),
                pa.array(np.where(qy_ > qy2, m, 0), pa.int64()),
            ],
            schema=CD,
        )

    # zero-row union: constant-x groups produce no qualifying cell pair
    # but must still reach the finalize with C = D = 0
    zeros = drop_empty_blocks(
        tx.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column(group_col),
                    pa.array(np.zeros(t.num_rows, np.int64)),
                    pa.array(np.zeros(t.num_rows, np.int64)),
                ],
                schema=CD,
            )
            if t.num_columns
            else CD.empty_table(),
            batch_format="pyarrow",
        ),
        CD,
    )
    cdagg = drop_empty_blocks(
        sorted_grouped_agg(
            drop_empty_blocks(
                paired.map_batches(cd, batch_format="pyarrow"), CD
            ).union(zeros),
            [group_col],
            [("_C", "sum"), ("_D", "sum")],
            out_names=["_C", "_D"],
        ),
        CD,
    )
    # agg outputs can carry 0-row schema-less blocks that break Dataset.join
    tx = drop_empty_blocks(
        tx, pa.schema([(group_col, gt), ("_n", pa.int64()), ("_tp", pa.int64())])
    )
    ty = drop_empty_blocks(
        ty, pa.schema([(group_col, gt), ("_n2", pa.int64()), ("_tp2", pa.int64())])
    )
    # a join's OWN empty output partitions are schema-less too — scrub
    # between the nested joins, not just before the first one
    j1 = drop_empty_blocks(
        hash_join(cdagg, tx, on=(group_col,)),
        pa.schema(
            [
                (group_col, gt),
                ("_C", pa.int64()),
                ("_D", pa.int64()),
                ("_n", pa.int64()),
                ("_tp", pa.int64()),
            ]
        ),
    )
    j = hash_join(j1, ty, on=(group_col,))
    OUT = pa.schema(
        [(group_col, gt), ("n", pa.int64()), ("kendall_ppm", pa.int64())]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        f = np.float64
        n = t.column("_n").to_numpy(zero_copy_only=False).astype(np.int64)
        n1 = t.column("_tp").to_numpy(zero_copy_only=False).astype(np.int64)
        n2 = t.column("_tp2").to_numpy(zero_copy_only=False).astype(np.int64)
        C = t.column("_C").to_numpy(zero_copy_only=False).astype(np.int64)
        D = t.column("_D").to_numpy(zero_copy_only=False).astype(np.int64)
        n0 = n * (n - 1) // 2
        ok = (n0 > n1) & (n0 > n2)
        with np.errstate(divide="ignore", invalid="ignore"):
            # identical promote-then-multiply order as the SQL twin
            tau = np.floor(
                ((C - D).astype(f) * 1000000.0)
                / (np.sqrt((n0 - n1).astype(f)) * np.sqrt((n0 - n2).astype(f)))
            )
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pa.array(n, pa.int64()),
                pa.array(np.where(ok, tau, 0).astype(np.int64), pa.int64(), mask=~ok),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(
        drop_empty_blocks(
            j,
            pa.schema(
                [
                    (group_col, gt),
                    ("_C", pa.int64()),
                    ("_D", pa.int64()),
                    ("_n", pa.int64()),
                    ("_tp", pa.int64()),
                    ("_n2", pa.int64()),
                    ("_tp2", pa.int64()),
                ]
            ),
        ).map_batches(finalize, batch_format="pyarrow"),
        OUT,
    )


def concentration_hhi(
    ds: "ray.data.Dataset",
    group_col: str,
    member_col: str,
    value_col: str,
) -> "ray.data.Dataset":
    """Herfindahl-Hirschman concentration per group — ``(group, n_members,
    total, hhi_e6)`` with hhi_e6 = floor(Σ vᵢ²·10⁶ / S²) over per-MEMBER
    value totals vᵢ (S = Σvᵢ): the squared-share market-concentration
    index (1/n for perfect balance → 10⁶ for a monopoly member), the
    antitrust-style complement to ``group_gini`` — HHI weighs dominant
    members quadratically where Gini integrates the whole Lorenz curve.
    NULL when the group total is zero.

    Shape: one (group, member) fastagg collapses rows to member totals,
    one stateless squares map, one group-cardinality fastagg, one
    mirrored promote-then-divide float floor. Contract: member totals
    must satisfy vᵢ² < 2⁶³ (≲ $3·10⁷ in cents per member cell) — rescale
    coarser above."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    typ = dict(zip(ds.schema().names, ds.schema().types))
    gt = typ[group_col]
    members = sorted_grouped_agg(
        ds.select_columns([group_col, member_col, value_col]),
        [group_col, member_col],
        [(value_col, "sum")],
        out_names=["_v"],
    )
    MID = pa.schema(
        [(group_col, gt), ("_v", pa.int64()), ("_vv", pa.int64())]
    )

    def sq(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        v = t.column("_v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column(group_col), pa.array(v, pa.int64()), pa.array(v * v, pa.int64())],
            schema=MID,
        )

    agg = sorted_grouped_agg(
        drop_empty_blocks(members.map_batches(sq, batch_format="pyarrow"), MID),
        [group_col],
        [("_v", "count"), ("_v", "sum"), ("_vv", "sum")],
        out_names=["n_members", "_s", "_ss"],
    )
    OUT = pa.schema(
        [
            (group_col, gt),
            ("n_members", pa.int64()),
            ("total", pa.int64()),
            ("hhi_e6", pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        s = t.column("_s").to_numpy(zero_copy_only=False).astype(np.int64)
        ss = t.column("_ss").to_numpy(zero_copy_only=False).astype(np.int64)
        ok = s > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            # identical promote-then-divide order as the SQL twin
            h = np.floor(
                (ss.astype(np.float64) * 1000000.0)
                / (s.astype(np.float64) * s.astype(np.float64))
            )
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pc.cast(t.column("n_members"), pa.int64()),
                pa.array(s, pa.int64()),
                pa.array(np.where(ok, h, 0).astype(np.int64), pa.int64(), mask=~ok),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(agg.map_batches(finalize, batch_format="pyarrow"), OUT)


def group_entropy(
    ds: "ray.data.Dataset",
    group_col: str,
    item_col: str,
    quantum: int = 1000,
) -> "ray.data.Dataset":
    """Shannon entropy of the ITEM distribution within each group —
    ``(group, n, n_items, entropy_milli)`` with entropy_milli =
    (n·L(n) − Σ c·L(c)) // n where L(x) = floor(ln(x)·quantum): the
    behavioral-regularity / concentration gauge (a user active in one
    hour bin scores 0; spread uniformly over k bins scores ≈ ln k). The
    ``contingency_mi`` discipline taken fully integer: each pointwise log
    is quantized FIRST, the weighted sums are exact int64, and even the
    final division is integer floor — no float ever reaches the output,
    bit-identical to the twin at any parallelism. The numerator is
    non-negative by L's monotonicity, so // is a true floor.

    Shape: one (group, item) cell fastagg (cell-cardinality stream), one
    stateless quantized-log map, one group fastagg. Contract: Σ c·L(c)
    per group must fit int64 → n·ln(n)·quantum ≲ 9·10¹⁸ (~3·10¹⁴ rows
    per group at quantum 10³)."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    typ = dict(zip(ds.schema().names, ds.schema().types))
    gt = typ[group_col]
    cells = sorted_grouped_agg(
        ds.select_columns([group_col, item_col]),
        [group_col, item_col],
        [(item_col, "count")],
        out_names=["_c"],
    )
    MID = pa.schema(
        [(group_col, gt), ("_c", pa.int64()), ("_i", pa.int64()), ("_s", pa.int64())]
    )

    def qlog(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        c = t.column("_c").to_numpy(zero_copy_only=False).astype(np.int64)
        lc = np.floor(np.log(c.astype(np.float64)) * float(quantum)).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pa.array(c, pa.int64()),
                pa.array(np.ones(len(c), np.int64)),
                pa.array(c * lc, pa.int64()),
            ],
            schema=MID,
        )

    agg = sorted_grouped_agg(
        drop_empty_blocks(cells.map_batches(qlog, batch_format="pyarrow"), MID),
        [group_col],
        [("_c", "sum"), ("_i", "sum"), ("_s", "sum")],
        out_names=["n", "n_items", "_s"],
    )
    OUT = pa.schema(
        [
            (group_col, gt),
            ("n", pa.int64()),
            ("n_items", pa.int64()),
            ("entropy_milli", pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("_s").to_numpy(zero_copy_only=False).astype(np.int64)
        ln = np.floor(np.log(n.astype(np.float64)) * float(quantum)).astype(np.int64)
        ent = (n * ln - s) // n  # non-negative exact integer floor
        return pa.Table.from_arrays(
            [
                t.column(group_col),
                pa.array(n, pa.int64()),
                pc.cast(t.column("n_items"), pa.int64()),
                pa.array(ent, pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(agg.map_batches(finalize, batch_format="pyarrow"), OUT)


def skyline_2d(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
) -> "ray.data.Dataset":
    """2-D skyline (Pareto frontier), both axes MINIMIZED: the rows not
    dominated by any other row (x' ≤ x, y' ≤ y, one strict) — the
    efficient-frontier query (cheapest-vs-freshest, price-vs-latency…).
    Maximize an axis by negating it upstream. Output ``(x, y)`` frontier
    points, one row per distinct x (the minimal y at that x).

    The naive formulation is an O(n²) NOT-EXISTS self-join; the sort
    identity collapses it to value cardinality: dedupe to the minimal y
    per distinct x (one fastagg), then a point survives iff its y is
    strictly below the running minimum of y over all smaller x — ONE
    exclusive segmented scan (running min = −cummax(−y)) over the
    x-sorted distinct stream plus a stateless filter. Pure integers
    end-to-end, bit-exact vs the window twin; a billion input rows cost
    the scan only their distinct-x count."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .window import cummax_over

    XY = pa.schema([("_g", pa.int64()), ("x", pa.int64()), ("_ny", pa.int64())])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return XY.empty_table()
        return pa.Table.from_arrays(
            [
                pa.array(np.zeros(t.num_rows, np.int64)),
                pc.cast(t.column(x_col), pa.int64()),
                pc.negate_checked(pc.cast(t.column(y_col), pa.int64())),
            ],
            schema=XY,
        )

    # minimal y per distinct x == maximal −y
    dist = sorted_grouped_agg(
        ds.select_columns([x_col, y_col]).map_batches(prep, batch_format="pyarrow"),
        ["_g", "x"],
        [("_ny", "max")],
        out_names=["_ny"],
    )
    scanned = cummax_over(dist, "_g", ["x"], "_ny", out_col="_prev")
    OUT = pa.schema([("x", pa.int64()), ("y", pa.int64())])

    def keep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        ny = t.column("_ny").to_numpy(zero_copy_only=False).astype(np.int64)
        prev = t.column("_prev").to_numpy(zero_copy_only=False).astype(np.float64)
        # survives iff no smaller-x point had y ≤ this y (−y ≥ this −y)
        ok = np.isnan(prev) | (ny > prev)
        idx = pa.array(np.flatnonzero(ok))
        return pa.Table.from_arrays(
            [
                t.column("x").take(idx),
                pa.array(-ny[np.flatnonzero(ok)], pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(
        scanned.map_batches(keep, batch_format="pyarrow"), OUT
    )


def kruskal_wallis(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
) -> "pa.Table":
    """Kruskal–Wallis H across ALL groups of ``group_col`` over int64
    ``value_col`` — ONE row ``(n_rows, k_groups, tie_sum, h_milli)``: the
    k-sample generalization of ``mann_whitney_u`` (as ``anova_f`` is of
    ``welch_t``), answering "does ANY group's location differ" without the
    normality assumption the heavy-tailed event values break. Tie-corrected:
    H / (1 − ΣT/(N³−N)), T_v = c_v³ − c_v.

    Numeric discipline: the doubled-midrank identity from ``mann_whitney_u``
    keeps every per-group rank sum R2_g = Σ c_gv·mid2_v an exact int64; the
    one non-integer piece, Σ R_g²/n_g, is floored PER GROUP at micro
    precision (A'_g = 10⁶·R2_g² // n_g = 10⁶·4R_g²/n_g floored, identical on both engines) so
    the final statistic is a single integer expression
    h_milli = 3(N−1)·(ΣA'_g − 10⁶·N(N+1)²)·1000 // (10⁶·(N³−N−ΣT)) — exact
    arbitrary-precision Python ints here, HUGEINT with the true-floor
    negative-division CASE in the twin. NULL when k < 2 or the tie-corrected
    denominator is 0 (all values identical). Contract: the twin is exact to
    N ≈ 10⁷ rows (HUGEINT bound on 10⁶·R2²); per-batch tie partials Σ(c³−c)
    must fit int64 (max value multiplicity ≲ 2·10⁶).

    Scale shape: two fastaggs at value/cell cardinality, one hot-key-safe
    segmented exclusive ``cumsum_over`` for the midranks, one
    value-proportional hash join, then an O(k) driver finalize."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join
    from .window import cumsum_over

    CV = pa.schema([(value_col, pa.int64()), ("_c", pa.int64())])
    cv = drop_empty_blocks(
        sorted_grouped_agg(
            ds.select_columns([value_col]), [value_col], [(value_col, "count")],
            out_names=["_c"],
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.cast(t.column(value_col), pa.int64()),
                 pc.cast(t.column("_c"), pa.int64())],
                schema=CV,
            )
            if t.num_columns
            else CV.empty_table(),
            batch_format="pyarrow",
        ),
        CV,
    ).materialize()  # consumed thrice: midranks, tie partials, total N

    withg = cv.map_batches(
        lambda t: t.append_column("_g", pa.array(np.zeros(t.num_rows, np.int64)))
        if t.num_columns
        else pa.schema(list(CV) + [("_g", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    )
    nless = cumsum_over(
        withg, "_g", [value_col], "_c", out_col="_nless", inclusive=False
    )
    MR = pa.schema([(value_col, pa.int64()), ("_mid2", pa.int64())])
    mr = drop_empty_blocks(
        nless.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column(value_col),
                    pc.add(
                        pc.add(
                            pc.multiply(t.column("_nless"), pa.scalar(2, pa.int64())),
                            t.column("_c"),
                        ),
                        pa.scalar(1, pa.int64()),
                    ),
                ],
                schema=MR,
            )
            if t.num_columns
            else MR.empty_table(),
            batch_format="pyarrow",
        ),
        MR,
    )
    GV = pa.schema(
        [("_grp", pa.string()), (value_col, pa.int64()), ("_cg", pa.int64())]
    )
    gv = drop_empty_blocks(
        sorted_grouped_agg(
            ds.select_columns([group_col, value_col]).map_batches(
                lambda t: pa.table(
                    {
                        "_grp": pc.cast(t.column(group_col), pa.string()),
                        value_col: pc.cast(t.column(value_col), pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["_grp", value_col],
            [(value_col, "count")],
            out_names=["_cg"],
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column("_grp"),
                    pc.cast(t.column(value_col), pa.int64()),
                    pc.cast(t.column("_cg"), pa.int64()),
                ],
                schema=GV,
            )
            if t.num_columns
            else GV.empty_table(),
            batch_format="pyarrow",
        ),
        GV,
    )
    j = hash_join(gv, mr, on=(value_col,))
    P = pa.schema([("_grp", pa.string()), ("_n", pa.int64()), ("_r2", pa.int64())])
    prod = drop_empty_blocks(
        j.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column("_grp"),
                    t.column("_cg"),
                    pc.multiply_checked(t.column("_cg"), t.column("_mid2")),
                ],
                schema=P,
            )
            if t.num_columns
            else P.empty_table(),
            batch_format="pyarrow",
        ),
        P,
    )
    stats = sorted_grouped_agg(
        prod, ["_grp"], [("_n", "sum"), ("_r2", "sum")], out_names=["n", "r2"]
    ).take_all()  # k rows — group cardinality is human-scale by contract

    # tie partials: per-batch exact Python-int fold over the value cells,
    # emitted as one int64 partial per batch (contract above)
    TIE = pa.schema([("_k", pa.int64()), ("_t", pa.int64())])

    def tie_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return TIE.empty_table()
        c = t.column("_c").to_numpy(zero_copy_only=False)
        part = sum(int(x) ** 3 - int(x) for x in c)
        return pa.Table.from_arrays(
            [pa.array([0], pa.int64()), pa.array([part], pa.int64())], schema=TIE
        )

    tie_rows = (
        drop_empty_blocks(
            cv.map_batches(tie_partial, batch_format="pyarrow"), TIE
        )
        .take_all()
    )
    tie = sum(int(r["_t"]) for r in tie_rows)

    n_total = sum(int(r["n"]) for r in stats)
    k = len(stats)
    OUT = pa.schema(
        [
            ("n_rows", pa.int64()),
            ("k_groups", pa.int64()),
            ("tie_sum", pa.int64()),
            ("h_milli", pa.int64()),
        ]
    )
    h_milli = None
    if k >= 2 and n_total >= 2:
        s1 = sum(
            (10**6 * int(r["r2"]) ** 2) // int(r["n"]) for r in stats
        )
        den = 10**6 * ((n_total**3 - n_total) - tie)
        if den > 0:
            num = 3 * (n_total - 1) * (s1 - 10**6 * n_total * (n_total + 1) ** 2) * 1000
            h_milli = num // den  # Python // floors, matching the twin's CASE
    return pa.Table.from_arrays(
        [
            pa.array([n_total], pa.int64()),
            pa.array([k], pa.int64()),
            pa.array([tie], pa.int64()),
            pa.array([h_milli], pa.int64()),
        ],
        schema=OUT,
    )
