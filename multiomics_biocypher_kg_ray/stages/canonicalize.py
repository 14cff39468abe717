"""Canonicalization — connected components over alias-equivalence edges,
iterated to a fixpoint, then a deterministic sort assigning stable canonical
ids.

Reference analog: ``GeneIdGraph.process_all_rows`` iterates all rows "until no
new ID is added … typically 2–3 passes" and explicitly notes "No Union-Find
needed at these dataset sizes" (``multiomics_kg/download/gene_id_graph.py:
24-29,96-97,172-196``). At 10^12-turn scale we DO need the distributed
version: min-label propagation over the symmetric edge set, one
``groupby(node).min(label)`` round at a time, stopping when no label changes
(O(log n) rounds on typical alias graphs). A driver-side union-find fast path
handles provably small edge sets (the broadcast-dictionary case).

Stable ids: distinct component keys → global ``sort`` → dense rank via
``split_at_indices`` (order-preserving) so every run and every parallelism
level mints identical ids — determinism comes from sorted content, never from
block arrival order (SURVEY.md §7.4).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from ..tuning import default_join_partitions

SMALL_EDGE_THRESHOLD = 1_000_000


# ------------------------------------------------- driver-side fast path

def union_find_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-by-min-id over an edge list that fits on the driver.

    Returns {member → component_key} where component_key is the
    lexicographically smallest member (same contract as the distributed path
    and the recursive-CTE oracle).
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    # second pass: full compression + ensure min-id roots
    comp: dict[str, str] = {}
    members: dict[str, list[str]] = {}
    for x in parent:
        members.setdefault(find(x), []).append(x)
    for root, ms in members.items():
        key = min(ms)
        for m in ms:
            comp[m] = key
    return comp


# ------------------------------------------------- distributed label propagation

def _label_messages(batch: pa.Table) -> pa.Table:
    """(node, label, neighbor) rows → candidate labels for node and neighbor.

    Self rows also carry the CURRENT label in ``self_cand`` (null on neighbor
    rows): the per-node Min over ``self_cand`` recovers the old label in the
    SAME aggregate that computes the new one, so the fixpoint test is an exact
    changed-label count with no extra join and no per-row Python."""
    node = batch.column("node")
    label = batch.column("label")
    neighbor = batch.column("neighbor")
    mask = pa.compute.is_valid(neighbor)
    t_self = pa.Table.from_arrays(
        [node, label, label], names=["node", "cand", "self_cand"]
    )
    nb_n = neighbor.filter(mask)
    t_nb = pa.Table.from_arrays(
        [nb_n, label.filter(mask), pa.nulls(len(nb_n), label.type)],
        names=["node", "cand", "self_cand"],
    )
    msgs = pa.concat_tables([t_self, t_nb])
    # per-batch COMBINER (Arrow C++ hash-agg): the raw message stream is
    # degree-proportional (every adjacency row emits a self + a neighbor
    # candidate); pre-taking the per-node min inside the batch shrinks the
    # keyed shuffle to ≤ distinct-nodes-per-batch rows and absorbs hot-node
    # skew before it ever reaches an aggregator (measured 13.5 s → ~2 s per
    # round on a 1.8M-row adjacency at 16 CPUs). min ignores nulls, so the
    # self_cand partial stays correct.
    g = msgs.group_by("node").aggregate([("cand", "min"), ("self_cand", "min")])
    return g.rename_columns(["node", "cand", "self_cand"])


def connected_components_distributed(
    edges: "ray.data.Dataset", max_rounds: int = 50, stats: dict | None = None
) -> "ray.data.Dataset":
    """Min-label propagation over an edge Dataset with columns (a, b).

    Each round: join current labels onto the symmetric adjacency (hash join on
    node), emit (neighbor, my_label) messages, take the per-node min, and stop
    at the fixpoint (count of changed labels == 0 — checked via a sum of
    changes, not by materializing the label table on the driver).

    Returns Dataset(member, component_key).
    """

    def symmetrize(batch: pa.Table) -> pa.Table:
        fwd = pa.Table.from_arrays(
            [batch.column("a"), batch.column("b")], names=["node", "neighbor"]
        )
        rev = pa.Table.from_arrays(
            [batch.column("b"), batch.column("a")], names=["node", "neighbor"]
        )
        both = pa.concat_tables([fwd, rev])
        # per-batch distinct: mention-derived edge streams are heavy
        # multigraphs (one (tok, anchor) pair recurs across every turn it
        # co-occurs in) — combine before the shuffle
        return both.group_by(["node", "neighbor"]).aggregate([])

    from .fastagg import sorted_distinct, sorted_grouped_agg

    # distinct adjacency, materialized once and reused by every propagation
    # round: the one-time dedup shuffle is far cheaper than dragging the
    # duplicated stream through O(log n) join+aggregate rounds (measured
    # ~10× row shrink on learned mention edges). sorted_distinct, NOT
    # Dataset.aggregate — the group count here is node-proportional and
    # Ray's aggregate pays per-group Python (see stages/fastagg.py).
    adj = sorted_distinct(
        edges.map_batches(symmetrize, batch_format="pyarrow"), ["node", "neighbor"]
    ).materialize()
    n_edges = adj.count() // 2  # distinct undirected edges; counting the
    # lazy `edges` would re-run its whole upstream pipeline a second time
    # initial labels: min(self ∪ neighbors) — the first propagation round
    # computed DURING init as a single grouped min over the adjacency (no
    # join needed because the candidates are the adjacency rows themselves),
    # so the loop below starts one round ahead
    def init_msgs(t: pa.Table) -> pa.Table:
        self_c = pa.Table.from_arrays(
            [t.column("node"), t.column("node")], names=["node", "cand"]
        )
        nb_c = pa.Table.from_arrays(
            [t.column("node"), t.column("neighbor")], names=["node", "cand"]
        )
        return pa.concat_tables([self_c, nb_c])

    labels = sorted_grouped_agg(
        adj.map_batches(init_msgs, batch_format="pyarrow"),
        ["node"],
        [("cand", "min")],
        out_names=["label"],
    ).materialize()

    # partitions sized to the DATA, not just the cluster: a 50-edge
    # dictionary graph through 32 hash-shuffle partitions is pure
    # aggregator-startup overhead, while a 10^9-edge graph gets the full
    # cluster width
    num_partitions = max(2, min(default_join_partitions(), n_edges // 10_000 + 2))

    def _changed_partial(t: pa.Table) -> pa.Table:
        # vectorized per-batch count of nodes whose label strictly changed
        n = pa.compute.sum(
            pa.compute.cast(
                pa.compute.not_equal(t.column("label"), t.column("old_label")),
                pa.int64(),
            )
        ).as_py()
        return pa.table({"n_changed": [n or 0]})

    def _drop_old(t: pa.Table) -> pa.Table:
        return t.select(["node", "label"])

    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        joined = adj.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("node",),
        )
        # every node sends itself one self_cand message, so min(self_cand)
        # (nulls ignored) is exactly the previous label. sorted_grouped_agg:
        # the group count equals the node count, where Ray's aggregate pays
        # per-group Python (measured 8-26 s/round vs ~1-2 s for this path).
        with_old = sorted_grouped_agg(
            joined.map_batches(_label_messages, batch_format="pyarrow"),
            ["node"],
            [("cand", "min"), ("self_cand", "min")],
            out_names=["label", "old_label"],
        ).materialize()
        # exact fixpoint test: count of strictly-changed labels this round —
        # no hash collisions possible (the crc32-sum fingerprint this
        # replaces had a ~2^-32/round silent-early-stop failure mode)
        n_changed = with_old.map_batches(
            _changed_partial, batch_format="pyarrow"
        ).sum("n_changed")
        labels = with_old.map_batches(_drop_old, batch_format="pyarrow")
        if not n_changed:
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["n_edges"] = n_edges
    return labels.map_batches(
        lambda t: t.rename_columns(["member", "component_key"]),
        batch_format="pyarrow",
    )


def connected_components(
    edges: list[tuple[str, str]] | "ray.data.Dataset",
    *,
    force_distributed: bool = False,
) -> "ray.data.Dataset":
    """Unified entry: small in-memory edge lists use driver union-find;
    Datasets (or ``force_distributed``) use label propagation."""
    if isinstance(edges, list) and not force_distributed:
        if len(edges) > SMALL_EDGE_THRESHOLD:
            raise ValueError("edge list too large for driver path; pass a Dataset")
        comp = union_find_components(edges)
        items = sorted(comp.items())
        tbl = pa.table(
            {
                "member": [m for m, _ in items],
                "component_key": [c for _, c in items],
            }
        )
        return ray.data.from_arrow(tbl)
    if isinstance(edges, list):
        tbl = pa.table(
            {"a": [a for a, _ in edges], "b": [b for _, b in edges]}
        )
        edges = ray.data.from_arrow(tbl)
    return connected_components_distributed(edges)


# ------------------------------------- data-derived alias-graph growth


def learned_equiv_edges(
    linked: "ray.data.Dataset", *, materialize_sides: bool = True
) -> "ray.data.Dataset":
    """Mention-co-occurrence candidate-pair stage — the distributed analog of
    the reference's ``GeneIdGraph`` data loop: seed from the config dictionary,
    then LEARN alias→anchor equivalence edges from the mention stream itself
    (``multiomics_kg/download/gene_id_graph.py:118-196`` ``process_row`` /
    ``process_all_rows``; anchoring priority ``_find_anchor`` ``:200-244``).

    Per turn (conv_id, turn_idx):
    - anchor = the MINIMAL resolved entity id among the turn's mention sides
      (deterministic first-hit analog of the tier-1-first anchor search);
      turns with no resolved side have no anchor and learn nothing (the
      reference counts those as unresolved rows).
    - every surface form in an anchored turn contributes a learned edge
      ``tok:<surface> — <anchor>`` (the "add its other IDs" step), and the
      turn itself contributes ``turn:<conv>:<idx> — <anchor>`` (the row →
      canonical-entity assignment), so the label space grows with the DATA,
      not with the config dictionary.

    Output is the raw (a, b) edge stream — duplicated, skewed (hot tokens
    co-occur with many anchors) — exactly what the distributed CC must
    handle; dedup happens inside the CC shuffle, never on the driver.

    The side table is consumed twice (anchor aggregate + the join), so by
    default it is materialized once — it is mention-bounded and NARROW (4
    key columns, no payload), and the object store spills it rather than
    recomputing the upstream extract+link pass twice. Pass
    ``materialize_sides=False`` to trade 2× upstream compute for zero
    pinning when the mention stream itself is the dominant footprint.
    """
    import pyarrow.compute as pc

    from ..tuning import default_join_partitions

    def sides(batch: pa.Table) -> pa.Table:
        parts = []
        for side in ("subj", "obj"):
            parts.append(
                pa.Table.from_arrays(
                    [
                        batch.column("conv_id"),
                        # int64: groupby aggregate keys come back int64, and
                        # the join requires exact key-type agreement
                        pc.cast(batch.column("turn_idx"), pa.int64()),
                        batch.column(f"{side}_text"),
                        batch.column(f"{side}_id"),
                    ],
                    names=["conv_id", "turn_idx", "text", "eid"],
                )
            )
        return pa.concat_tables(parts)

    side_ds = linked.map_batches(sides, batch_format="pyarrow")
    if materialize_sides:
        # prune 0-row blocks (a turn block with zero mentions would emit
        # one): this table is the LEFT side of the anchor join, and Ray's
        # join breaks on empty blocks — see fastagg.drop_empty_blocks
        from .fastagg import drop_empty_blocks

        side_ds = drop_empty_blocks(side_ds)

    def anchored_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column("eid"))).select(
            ["conv_id", "turn_idx", "eid"]
        )

    # turn-count-proportional group space → Arrow-native grouped min
    # (stages/fastagg.py), not Dataset.aggregate
    from .fastagg import sorted_grouped_agg

    anchors = sorted_grouped_agg(
        side_ds.map_batches(anchored_only, batch_format="pyarrow"),
        ["conv_id", "turn_idx"],
        [("eid", "min")],
        out_names=["anchor"],
    )

    joined = side_ds.join(
        anchors,
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=("conv_id", "turn_idx"),
    )

    def emit(batch: pa.Table) -> pa.Table:
        tok = pc.binary_join_element_wise("tok:", batch.column("text"), "")
        turn = pc.binary_join_element_wise(
            "turn:",
            batch.column("conv_id"),
            ":",
            pc.cast(batch.column("turn_idx"), pa.string()),
            "",
        )
        anchor = batch.column("anchor")
        t_tok = pa.Table.from_arrays([tok, anchor], names=["a", "b"])
        t_turn = pa.Table.from_arrays([turn, anchor], names=["a", "b"])
        return pa.concat_tables([t_tok, t_turn])

    return joined.map_batches(emit, batch_format="pyarrow")


def data_canonical_map(
    linked: "ray.data.Dataset",
    seed_edges: list[tuple[str, str]],
    prefix: str = "ent_",
    width: int = 6,
) -> "ray.data.Dataset":
    """Full data-scale canonicalization: config seed edges ∪ learned mention
    edges → distributed connected components → stable canonical ids. This is
    the path that runs CC on a data-proportional, skewed edge set (the
    config-only graph is entity-bounded and exercises nothing)."""
    seed = ray.data.from_arrow(
        pa.table(
            {
                "a": [a for a, _ in seed_edges],
                "b": [b for _, b in seed_edges],
            }
        )
    )
    edges = learned_equiv_edges(linked).union(seed)
    comps = connected_components_distributed(edges)
    return assign_stable_ids(comps, prefix=prefix, width=width)


# ------------------------------------------------- stable id assignment

def zip_with_index(sorted_ds: "ray.data.Dataset", col: str = "rank") -> "ray.data.Dataset":
    """Attach a 0-based global row index to an already-sorted Dataset.

    Order-preserving and fully distributed: ``split_at_indices`` yields ordered
    splits with known offsets; each split numbers its rows locally from its
    offset. No driver materialization of the data itself.
    """
    # materialize ONCE: count(), split_at_indices() and every downstream
    # consumer would otherwise re-execute the whole upstream pipeline
    sorted_ds = sorted_ds.materialize()
    n = sorted_ds.count()
    if n == 0:
        return sorted_ds.map_batches(
            lambda t: t.append_column(col, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    # splits scale with the data up to a 256-task cap (a 10^9-row table gets
    # 256 numbering tasks of ~4M rows; tiny tables stay single-split)
    num_splits = max(1, min(256, n // 65536 or 1))
    bounds = [n * i // num_splits for i in range(1, num_splits)]
    splits = sorted_ds.split_at_indices(bounds) if bounds else [sorted_ds]
    offsets = [0] + bounds
    out = []
    for off, part in zip(offsets, splits):
        def add_idx(batch: pa.Table, _off=off, _state={"seen": 0}) -> pa.Table:
            start = _off + _state["seen"]
            _state["seen"] += batch.num_rows
            idx = pa.array(range(start, start + batch.num_rows), pa.int64())
            return batch.append_column(col, idx)

        # NOTE: per-split sequential numbering requires a single task per split
        out.append(
            part.repartition(1).map_batches(
                add_idx, batch_format="pyarrow", batch_size=None, concurrency=1
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.union(o)
    return res


def assign_stable_ids(
    components: "ray.data.Dataset", prefix: str = "ent_", width: int = 6
) -> "ray.data.Dataset":
    """components(member, component_key) → (member, component_key, canonical_id)
    with canonical_id = prefix + zero-padded 1-based dense rank of
    component_key under lexicographic sort (matches oracle.canon_ctes)."""
    if not components.take(1):  # empty input: joins can't infer schemas
        return ray.data.from_arrow(
            pa.table(
                {
                    "member": pa.array([], pa.string()),
                    "component_key": pa.array([], pa.string()),
                    "canonical_id": pa.array([], pa.string()),
                }
            )
        )
    # distributed distinct (component count can be data-proportional →
    # Arrow-native path, never Dataset.aggregate or a driver value pull)
    from .fastagg import sorted_distinct

    keys_ds = sorted_distinct(
        components.select_columns(["component_key"]), ["component_key"]
    )
    ranked = zip_with_index(keys_ds.sort("component_key"), col="rank0")

    def mint(batch: pa.Table) -> pa.Table:
        ranks = batch.column("rank0").to_pylist()
        ids = [f"{prefix}{r + 1:0{width}d}" for r in ranks]
        return pa.Table.from_arrays(
            [batch.column("component_key"), pa.array(ids, pa.string())],
            names=["component_key", "canonical_id"],
        )

    id_map = ranked.map_batches(mint, batch_format="pyarrow")
    return components.join(
        id_map,
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=("component_key",),
    ).select_columns(["member", "component_key", "canonical_id"])


def canonical_map_table(
    edges: list[tuple[str, str]], prefix: str = "ent_", width: int = 6
) -> pa.Table:
    """Driver-side canonicalization for provably small edge sets (the
    broadcast-dictionary case): union-find + in-memory dense rank. Must stay
    output-identical to the distributed path (asserted in tests)."""
    comp = union_find_components(edges)
    keys = sorted(set(comp.values()))
    rank = {k: i + 1 for i, k in enumerate(keys)}
    members = sorted(comp)
    return pa.table(
        {
            "member": members,
            "component_key": [comp[m] for m in members],
            "canonical_id": [f"{prefix}{rank[comp[m]]:0{width}d}" for m in members],
        }
    )


def canonical_map(
    edges: list[tuple[str, str]] | "ray.data.Dataset",
    *,
    force_distributed: bool = False,
) -> "ray.data.Dataset":
    """edges → (member, component_key, canonical_id) — the full canonicalization.

    Small in-memory edge lists short-circuit to the driver (zero Ray fixed
    costs — a 30-edge graph through distributed joins costs ~15 s of pure
    scheduling); Dataset inputs run label propagation + distributed rank.
    """
    if isinstance(edges, list) and not force_distributed:
        if len(edges) > SMALL_EDGE_THRESHOLD:
            raise ValueError("edge list too large for driver path; pass a Dataset")
        return ray.data.from_arrow(canonical_map_table(edges))
    comps = connected_components(edges, force_distributed=force_distributed)
    return assign_stable_ids(comps)
