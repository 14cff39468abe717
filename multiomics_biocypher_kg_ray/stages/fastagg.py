"""Arrow-native grouped aggregation for DATA-PROPORTIONAL group counts.

Ray's built-in ``Dataset.groupby().aggregate(...)`` pays per-GROUP Python
overhead in its reduce (measured: 26 s for 160K groups vs 4 s for 100 groups
on identical row counts at 16 CPUs) — fine for the small rollup keyspaces in
``relational.py`` (they pre-combine then reduce a few thousand groups), fatal
when the group count scales with the data (one group per graph node, per
turn, per document…).

``sorted_grouped_agg`` computes the same exact result with zero per-group
Python:

1. per-batch partial combine (pyarrow ``Table.group_by`` — C++ hash agg);
2. one range-partitioned ``sort`` on the keys (Ray's sort is sample-based
   and cheap: the same 320K-row input sorts in ~0.2 s);
3. per-BLOCK C++ group_by over the sorted partials. Sorted order means a
   key whose rows sit strictly inside one block is globally complete —
   emitted as-is. Only the first/last key of each block can straddle a
   block boundary;
4. those edge keys (≤ 2 per block, hundreds of rows total at any scale)
   are collapsed exactly in one tiny task.

Supported agg fns are the associative pyarrow hash-agg kernels the partial/
final composition is valid for ("min", "max", "sum"); "count" composes as
partial count + final sum. Null handling matches Ray's default
``ignore_nulls=True`` (pyarrow hash kernels skip nulls).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_FINAL_FN = {"min": "min", "max": "max", "sum": "sum", "count": "sum"}

# combined per-batch partials at or below this row count collapse in ONE
# C++ group_by task instead of the sort + boundary-fixup machinery
SMALL_PARTIALS_ROWS = 200_000


def drop_empty_blocks(
    ds: "ray.data.Dataset", schema: pa.Schema | None = None
) -> "ray.data.Dataset":
    """Materialize and drop 0-row blocks (zero-copy: block refs only).

    Ray (2.49) never invokes a map UDF on a 0-row block — it forwards a
    0-COLUMN empty block instead — and ``Dataset.join`` then fails with
    'No match … for key field' when any such block reaches a partition. Any
    dataset that may carry empty blocks and later feeds a join must pass
    through here. The driver handles only ObjectRefs + metadata, never
    block contents. ``schema`` backs the all-blocks-empty case; when omitted
    it is derived from the materialized dataset's own schema."""
    import ray

    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        if schema is None:
            sch = mat.schema()
            schema = pa.schema(list(zip(sch.names, sch.types))) if sch else pa.schema([])
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(refs)


def _agg_names(keys: list[str], aggs: list[tuple[str, str]]) -> list[str]:
    return list(keys) + [f"{c}_{fn}" for c, fn in aggs]


def sorted_grouped_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str]],
    out_names: list[str] | None = None,
) -> "ray.data.Dataset":
    """Exact grouped aggregation, Arrow-native end to end.

    ``aggs`` is [(column, fn)] with fn ∈ {min, max, sum, count}. Output
    columns are keys + ``out_names`` (default ``<col>_<fn>``). Scale shape:
    one sample-sort shuffle; no task ever iterates groups in Python.
    """
    partial_specs = [(c, fn) for c, fn in aggs]
    inter_names = _agg_names(keys, aggs)
    final_specs = [(n, _FINAL_FN[fn]) for n, (c, fn) in zip(inter_names[len(keys):], aggs)]
    out_cols = list(keys) + (out_names or inter_names[len(keys):])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(partial_specs)
        return g.rename_columns(inter_names)

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if partials.count() <= SMALL_PARTIALS_ROWS:
        # combined partials are CONSTANT-bounded (≤ SMALL_PARTIALS_ROWS, not
        # data-proportional): collapse them in ONE driver-side C++ group_by
        # instead of spinning two more streaming executions (repartition +
        # collapse task, then the drop_empty_blocks materialize) — that
        # fixed cost added ~1-2 s to every small rollup (VERDICT r2 #7)
        sch_obj = partials.schema() or ds.schema()
        if sch_obj is None:
            # fully empty input with no recoverable schema: best-effort
            # empty result (string keys, int64 aggregates) — nothing can
            # consume typed values out of a stream that never had any
            small_schema = pa.schema(
                [pa.field(k, pa.string()) for k in keys]
                + [pa.field(o, pa.int64()) for o in out_cols[len(keys):]]
            )
            return ray.data.from_arrow(small_schema.empty_table())
        sch = {n: t for n, t in zip(sch_obj.names, sch_obj.types)}
        small_schema = pa.schema(
            [pa.field(o, sch.get(n, pa.string())) for o, n in zip(out_cols, inter_names)]
        )
        blocks = [
            b
            for b in partials.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns  # Ray forwards 0-COLUMN blocks for empties
        ]
        if not blocks:
            return ray.data.from_arrow(small_schema.empty_table())
        g = pa.concat_tables(blocks).group_by(keys).aggregate(final_specs)
        return ray.data.from_arrow(g.rename_columns(out_cols))

    def finalize_block(t: pa.Table) -> pa.Table:
        """Per sorted block: C++ group_by, then tag edge keys (first/last
        key tuple of the block) that may straddle a boundary."""
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], t.schema.field(k).type) for k in keys},
                 **{n: pa.array([], t.schema.field(n).type) for n in inter_names[len(keys):]},
                 "_edge": pa.array([], pa.bool_())}
            )
        g = t.group_by(keys).aggregate(final_specs)
        g = g.rename_columns(inter_names)
        mask_first = None
        mask_last = None
        for k in keys:
            col = t.column(k)
            first_v, last_v = col[0], col[len(col) - 1]
            mf = pc.equal(g.column(k), first_v)
            ml = pc.equal(g.column(k), last_v)
            mask_first = mf if mask_first is None else pc.and_(mask_first, mf)
            mask_last = ml if mask_last is None else pc.and_(mask_last, ml)
        edge = pc.or_(mask_first, mask_last)
        return g.append_column("_edge", pc.fill_null(edge, True))

    tagged = (
        partials.sort(keys)
        .map_batches(finalize_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    # authoritative output schema, captured from the materialized stage: any
    # 0-row block LOSES its schema when it passes through a later map op
    # (Ray skips the UDF and emits a 0-column block, which breaks downstream
    # joins), so (a) the renames are FUSED into the branch lambdas — their
    # inputs are the non-empty tagged blocks — and (b) every lambda rebuilds
    # degenerate empties from this schema.
    tag_fields = [
        (n, t) for n, t in zip(tagged.schema().names, tagged.schema().types)
        if n != "_edge"
    ]
    out_schema = pa.schema(
        [pa.field(o, t) for o, (_, t) in zip(out_cols, tag_fields)]
    )

    def interior_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        kept = t.filter(pc.invert(t.column("_edge"))).drop_columns(["_edge"])
        return kept.rename_columns(out_cols)

    def edge_filter(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table().append_column(
                "_edge", pa.array([], pa.bool_())
            ).rename_columns(inter_names + ["_edge"])
        return t.filter(t.column("_edge"))

    def collapse_edges(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        g = t.drop_columns(["_edge"]).group_by(keys).aggregate(final_specs)
        return g.rename_columns(out_cols)

    interior = tagged.map_batches(interior_fn, batch_format="pyarrow")
    edges_fixed = (
        tagged.map_batches(edge_filter, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            collapse_edges,
            batch_format="pyarrow",
            batch_size=None,
            concurrency=1,
        )
    )
    # aggregated outputs are group-count-sized; materialize + prune the
    # 0-row blocks so the result is always safely joinable
    return drop_empty_blocks(interior.union(edges_fixed), out_schema)


def sorted_distinct(ds: "ray.data.Dataset", keys: list[str]) -> "ray.data.Dataset":
    """Exact distinct over data-proportional key spaces, same machinery."""
    def partial(t: pa.Table) -> pa.Table:
        return t.select(keys).group_by(keys).aggregate([])

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if partials.count() <= SMALL_PARTIALS_ROWS:
        # constant-bounded partials → one driver-side C++ group_by (see
        # sorted_grouped_agg: saves two streaming executions per rollup)
        sch_obj = partials.schema() or ds.schema()
        if sch_obj is None:
            small_schema = pa.schema([pa.field(k, pa.string()) for k in keys])
            return ray.data.from_arrow(small_schema.empty_table())
        sch = {n: t for n, t in zip(sch_obj.names, sch_obj.types)}
        small_schema = pa.schema([pa.field(k, sch.get(k, pa.string())) for k in keys])
        blocks = [
            b
            for b in partials.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns
        ]
        if not blocks:
            return ray.data.from_arrow(small_schema.empty_table())
        return ray.data.from_arrow(
            pa.concat_tables(blocks).group_by(keys).aggregate([])
        )

    def finalize_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_edge", pa.array([], pa.bool_()))
        g = t.group_by(keys).aggregate([])
        mask_first = None
        mask_last = None
        for k in keys:
            col = t.column(k)
            mf = pc.equal(g.column(k), col[0])
            ml = pc.equal(g.column(k), col[len(col) - 1])
            mask_first = mf if mask_first is None else pc.and_(mask_first, mf)
            mask_last = ml if mask_last is None else pc.and_(mask_last, ml)
        return g.append_column("_edge", pc.fill_null(pc.or_(mask_first, mask_last), True))

    tagged = (
        partials.sort(keys)
        .map_batches(finalize_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    # see sorted_grouped_agg: 0-row blocks lose their schema through later
    # map ops, so every lambda rebuilds degenerate empties explicitly
    out_schema = pa.schema(
        [
            pa.field(n, t)
            for n, t in zip(tagged.schema().names, tagged.schema().types)
            if n != "_edge"
        ]
    )

    def interior_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        return t.filter(pc.invert(t.column("_edge"))).drop_columns(["_edge"])

    def edge_filter(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table().append_column(
                "_edge", pa.array([], pa.bool_())
            )
        return t.filter(t.column("_edge"))

    def collapse_edges(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        return t.drop_columns(["_edge"]).group_by(keys).aggregate([])

    interior = tagged.map_batches(interior_fn, batch_format="pyarrow")
    edges_fixed = (
        tagged.map_batches(edge_filter, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            collapse_edges,
            batch_format="pyarrow",
            batch_size=None,
            concurrency=1,
        )
    )
    # aggregated outputs are group-count-sized; materialize + prune the
    # 0-row blocks so the result is always safely joinable
    return drop_empty_blocks(interior.union(edges_fixed), out_schema)
