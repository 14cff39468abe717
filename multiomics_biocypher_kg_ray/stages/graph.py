"""Iterative / combinatorial graph analytics over the built KG edge table —
PageRank and per-node triangle counting.

Reference analog: the reference's post-import Cypher computes neighborhood
statistics and hub summaries over the imported graph (``post-import.cypher:
840-911`` — per-node fan-out counts, term-ancestor rollups); these two
operators are the standard next steps a KG consumer runs on the same table
(node importance, local clustering) expressed as distributed Ray Data ops.

Determinism contract (shared with the DuckDB oracle twins): all PageRank
arithmetic is int64 FIXED-POINT — scores start at ``scale`` ppm, every
per-edge contribution is ``score // outdeg`` (integer division), every
damping step is ``base + (damping_pct * sum) // 100``. Integer sums are
order-independent, so both engines produce bit-identical scores at any
parallelism; no float ever enters the fixpoint (same trick as
``similarity.label_centroids``'s integer-quantized sums).

Scale shapes:
- ``pagerank``: Pregel-style — the degree-annotated edge table is built once
  and reused every round; each of the (fixed, small) iterations is ONE hash
  join (edges ⋈ scores on src) + ONE data-proportional ``sorted_grouped_agg``
  (contributions by dst). No driver state, no per-group Python; a hot dst
  absorbs its in-degree inside the C++ partial combine.
- ``node_triangles``: degree-ordered orientation (each undirected edge points
  low-(deg,node) → high-(deg,node)), so every oriented out-degree is
  O(sqrt(m)) and wedge fan-out is O(m^1.5) worst case instead of
  sum(deg²) — the classic hub-safe triangle-enumeration bound. Wedges are
  emitted by the segmented sorted-scan pair kernel (``dedup.bucket_pairs``,
  cap=None — capping would change the answer), then one semi-join against the
  undirected edge set closes each wedge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..tuning import default_join_partitions
from .fastagg import drop_empty_blocks, sorted_distinct, sorted_grouped_agg


def _distinct_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct directed (src, dst) pairs, self-loops removed."""

    def clean(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("src", pa.string()), ("dst", pa.string())]
            ).empty_table()
        t = t.select(["src", "dst"])
        return t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst"))))

    return sorted_distinct(
        edges.map_batches(clean, batch_format="pyarrow"), ["src", "dst"]
    )


def _node_column(e: "ray.data.Dataset", a: str, b: str) -> "ray.data.Dataset":
    """Both endpoint columns of an edge table stacked into one ``node`` col."""

    def stack(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([("node", pa.string())]).empty_table()
        return pa.concat_tables(
            [
                t.select([a]).rename_columns(["node"]),
                t.select([b]).rename_columns(["node"]),
            ]
        )

    return e.map_batches(stack, batch_format="pyarrow")


def pagerank(
    edges: "ray.data.Dataset",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    seeds: "list[str] | None" = None,
    weighted: bool = False,
) -> "ray.data.Dataset":
    """Fixed-iteration integer PageRank → (node, pr_score).

    ``pr_score`` is the unnormalized int64 fixed-point score after ``iters``
    synchronous rounds: score₀ = ``scale`` for every node;
    scoreᵢ(n) = base + (damping_pct · Σ_{u→n} scoreᵢ₋₁(u) // outdeg(u)) // 100
    with base = scale·(100−damping_pct)//100. Dangling nodes (no out-edges)
    leak their mass — the simplified variant; the oracle twin
    (``oracle.sql_kg_pagerank``) applies the identical rule, unrolled.

    ``seeds``: PERSONALIZED PageRank — restart mass lands only on the seed
    set: score₀ = scale·[n ∈ seeds] and the per-round base term is
    base·[n ∈ seeds] (twin: ``oracle.sql_kg_ppr``). Non-seed nodes score
    only what random walks from the seeds carry to them, so the result
    ranks nodes by proximity-weighted relevance to the seed entities (the
    seed-neighborhood exploration a KG curator runs around entities of
    interest). ``seeds`` must be broadcast-sized (it ships in the task
    closure and probes via one ``pc.is_in`` per round) — entity seed sets
    are; for corpus-scale seed sets, join a seed table instead.

    ``weighted``: each out-neighbor receives mass proportional to its edge
    ``weight`` instead of 1/outdeg — contribution = score·w // wsum(src),
    parallel edges pre-summed per (src, dst) (twin:
    ``oracle.sql_kg_wpagerank``). The evidence-weighted variant a KG wants:
    a claim seen 40 times pulls more rank than a singleton co-mention.
    int64 contract: max score·max weight < 2⁶³ — scores stay ≈ scale-scale
    (total mass only shrinks), so weights to ~10¹⁰ are safe at scale=10⁶.

    int64 headroom: total mass ≤ n_nodes·scale, so scale=1e6 is safe past
    10¹¹ nodes before the 85·sum product nears 2⁶³.
    """
    base = scale * (100 - damping_pct) // 100
    seed_arr = (
        pa.array(sorted(set(seeds)), pa.string()) if seeds is not None else None
    )

    if weighted:
        W = pa.schema(
            [("src", pa.string()), ("dst", pa.string()), ("w", pa.int64())]
        )

        def wclean(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return W.empty_table()
            keep = pc.invert(pc.equal(t.column("src"), t.column("dst")))
            t = t.filter(keep)
            return pa.Table.from_arrays(
                [
                    t.column("src"),
                    t.column("dst"),
                    pc.cast(t.column("weight"), pa.int64()),
                ],
                schema=W,
            )

        e = drop_empty_blocks(
            sorted_grouped_agg(
                edges.map_batches(wclean, batch_format="pyarrow"),
                ["src", "dst"],
                [("w", "sum")],
                out_names=["w"],
            )
        )
        deg = sorted_grouped_agg(e, ["src"], [("w", "sum")], out_names=["outdeg"])
    else:
        e = drop_empty_blocks(_distinct_edges(edges))
        deg = sorted_grouped_agg(e, ["src"], [("dst", "count")], out_names=["outdeg"])
    # degree-annotated edge table: built once, reused every iteration
    ed_cols = ["src", "dst", "w", "outdeg"] if weighted else ["src", "dst", "outdeg"]
    # drop_empty_blocks between joins: a join's own empty output partitions
    # are schema-less and break the NEXT Dataset.join (fastagg.py footgun)
    ed = drop_empty_blocks(
        e.join(
            drop_empty_blocks(deg),
            join_type="inner",
            on=("src",),
            num_partitions=default_join_partitions(),
        ).select_columns(ed_cols)
    )
    nodes = sorted_distinct(_node_column(e, "src", "dst"), ["node"]).materialize()

    def init_scores(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("node", pa.string()), ("score", pa.int64())]
            ).empty_table()
        if seed_arr is None:
            s = pa.array(np.full(t.num_rows, scale, dtype=np.int64))
        else:
            s = pc.multiply(
                pc.cast(pc.is_in(t.column("node"), value_set=seed_arr), pa.int64()),
                pa.scalar(scale, pa.int64()),
            )
        return t.append_column("score", s)

    def zero_rows(t: pa.Table) -> pa.Table:
        # every node appears with a 0 contribution so nodes without in-edges
        # survive the aggregate (no outer join needed)
        if t.num_columns == 0:
            return pa.schema(
                [("node", pa.string()), ("c", pa.int64())]
            ).empty_table()
        return t.select(["node"]).append_column(
            "c", pa.array(np.zeros(t.num_rows, dtype=np.int64))
        )

    def contribs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("node", pa.string()), ("c", pa.int64())]
            ).empty_table()
        # score // outdeg: both positive int64, Arrow divide truncates = floor
        if weighted:
            c = pc.divide(
                pc.multiply(t.column("score"), t.column("w")), t.column("outdeg")
            )
        else:
            c = pc.divide(t.column("score"), t.column("outdeg"))
        return pa.table({"node": t.column("dst"), "c": c})

    def damp(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("node", pa.string()), ("score", pa.int64())]
            ).empty_table()
        if seed_arr is None:
            b = pa.scalar(base, pa.int64())
        else:
            b = pc.multiply(
                pc.cast(pc.is_in(t.column("node"), value_set=seed_arr), pa.int64()),
                pa.scalar(base, pa.int64()),
            )
        s = pc.add(
            b,
            pc.divide(pc.multiply(pa.scalar(damping_pct, pa.int64()), t.column("in_sum")), pa.scalar(100, pa.int64())),
        )
        return pa.table({"node": t.column("node"), "score": s})

    scores = nodes.map_batches(init_scores, batch_format="pyarrow").materialize()
    zeros = nodes.map_batches(zero_rows, batch_format="pyarrow")
    for _ in range(iters):
        joined = ed.join(
            drop_empty_blocks(scores),
            join_type="inner",
            on=("src",),
            right_on=("node",),
            num_partitions=default_join_partitions(),
        )
        cand = joined.map_batches(contribs, batch_format="pyarrow").union(zeros)
        sums = sorted_grouped_agg(cand, ["node"], [("c", "sum")], out_names=["in_sum"])
        # materialize per round: bounds lineage depth across iterations
        scores = sums.map_batches(damp, batch_format="pyarrow").materialize()

    def rename(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("node", pa.string()), ("pr_score", pa.int64())]
            ).empty_table()
        return t.rename_columns(["node", "pr_score"])

    return scores.map_batches(rename, batch_format="pyarrow")


def _oriented_triangles(edges: "ray.data.Dataset"):
    """Shared degree-ordered triangle enumeration: returns ``(closed, und)``
    where ``closed`` holds one row per triangle (u, va, vb) — u the wedge
    center, va < vb — and ``und`` is the deduped undirected edge list
    (a < b). Each triangle appears EXACTLY once; O(m^1.5) worst case via
    the low-(deg, node) orientation. Consumers: ``node_triangles`` (credit
    corners), ``edge_support`` (credit edges — the k-truss support input).
    """
    from .dedup import bucket_pairs

    def und_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("a", pa.string()), ("b", pa.string())]
            ).empty_table()
        src, dst = t.column("src"), t.column("dst")
        lt = pc.less(src, dst)
        tbl = pa.table(
            {"a": pc.if_else(lt, src, dst), "b": pc.if_else(lt, dst, src)}
        )
        return tbl.filter(pc.invert(pc.equal(tbl.column("a"), tbl.column("b"))))

    und = drop_empty_blocks(
        sorted_distinct(
            edges.map_batches(und_fn, batch_format="pyarrow"), ["a", "b"]
        )
    )
    deg = drop_empty_blocks(
        sorted_grouped_agg(
            _node_column(und, "a", "b"), ["node"], [("node", "count")],
            out_names=["d"],
        )
    )

    def pick_da(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("a", pa.string()), ("b", pa.string()), ("da", pa.int64())]
            ).empty_table()
        return pa.table(
            {"a": t.column("a"), "b": t.column("b"), "da": t.column("d")}
        )

    def orient(t: pa.Table) -> pa.Table:
        # low (deg, node) endpoint → u; ``uc`` duplicates u as a per-row
        # payload so the pair kernel (which drops bucket keys) can still
        # emit the wedge center
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("u", pa.string()), ("v", pa.string()), ("uc", pa.string())]
            ).empty_table()
        a, b, da, db = (t.column(c) for c in ("a", "b", "da", "db"))
        low_a = pc.or_(
            pc.less(da, db), pc.and_(pc.equal(da, db), pc.less(a, b))
        )
        u = pc.if_else(low_a, a, b)
        return pa.table({"u": u, "v": pc.if_else(low_a, b, a), "uc": u})

    with_da = und.join(
        deg,
        join_type="inner",
        on=("a",),
        right_on=("node",),
        num_partitions=default_join_partitions(),
    ).map_batches(pick_da, batch_format="pyarrow")
    ori = (
        drop_empty_blocks(with_da)
        .join(
            deg.rename_columns({"d": "db"}),
            join_type="inner",
            on=("b",),
            right_on=("node",),
            num_partitions=default_join_partitions(),
        )
        .map_batches(orient, batch_format="pyarrow")
    )

    # wedges: all (v1 < v2) pairs sharing a center u; oriented out-degree is
    # O(sqrt(m)) so cap=None is safe (and required for exactness)
    wedges = bucket_pairs(
        drop_empty_blocks(ori), ["u"], id_col="v", payload_cols=("uc",), cap=None
    )

    def wedge_cols(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [("va", pa.string()), ("vb", pa.string()), ("u", pa.string())]
            ).empty_table()
        return pa.table(
            {"va": t.column("doc_a"), "vb": t.column("doc_b"),
             "u": t.column("uc_a")}
        )

    closed = drop_empty_blocks(
        wedges.map_batches(wedge_cols, batch_format="pyarrow")
    ).join(
        und,
        join_type="inner",
        on=("va", "vb"),
        right_on=("a", "b"),
        num_partitions=default_join_partitions(),
    )

    return closed, und


def node_triangles(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-node triangle participation counts → (node, n_triangles).

    Treats the edge table as an UNDIRECTED simple graph (direction and
    multiplicity dropped, self-loops removed). Every triangle is enumerated
    exactly once via degree-ordered orientation (``_oriented_triangles``),
    then credited to all three corners; nodes in zero triangles are omitted
    (the oracle twin mirrors both choices).
    """
    closed, _ = _oriented_triangles(edges)

    def corners(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema([("node", pa.string())]).empty_table()
        return pa.concat_tables(
            [t.select([c]).rename_columns(["node"]) for c in ("u", "va", "vb")]
        )

    return sorted_grouped_agg(
        closed.map_batches(corners, batch_format="pyarrow"),
        ["node"],
        [("node", "count")],
        out_names=["n_triangles"],
    )


def edge_support(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-EDGE triangle support over the undirected simple graph —
    ``(a, b, support)`` for every deduped edge a < b, support = number of
    triangles containing it (0 kept via LEFT join): the input of k-truss
    decomposition and the edge-strength signal tie-breaking entity merges
    (two aliases whose connecting edge closes many triangles are far
    safer to merge than a support-0 bridge). Same enumeration cost as
    ``node_triangles``; one extra edge-cardinality fastagg + LEFT join."""
    closed, und = _oriented_triangles(edges)

    TRI_E = pa.schema([("a", pa.string()), ("b", pa.string())])

    def tri_edges(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return TRI_E.empty_table()
        u, va, vb = t.column("u"), t.column("va"), t.column("vb")
        parts = []
        for x, y in ((u, va), (u, vb), (va, vb)):
            lo = pc.min_element_wise(x, y)
            hi = pc.max_element_wise(x, y)
            parts.append(pa.Table.from_arrays([lo, hi], schema=TRI_E))
        return pa.concat_tables(parts)

    SUP = pa.schema([("a", pa.string()), ("b", pa.string()), ("support", pa.int64())])
    sup = drop_empty_blocks(
        sorted_grouped_agg(
            drop_empty_blocks(
                closed.map_batches(tri_edges, batch_format="pyarrow"), TRI_E
            ),
            ["a", "b"],
            [("a", "count")],
            out_names=["support"],
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("a"), t.column("b"),
                 pc.cast(t.column("support"), pa.int64())],
                schema=SUP,
            )
            if t.num_columns
            else SUP.empty_table(),
            batch_format="pyarrow",
        ),
        SUP,
    )
    j = drop_empty_blocks(und, TRI_E).join(
        sup,
        join_type="left_outer",
        on=("a", "b"),
        num_partitions=default_join_partitions(),
    )
    return drop_empty_blocks(
        j.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column("a"),
                    t.column("b"),
                    pc.fill_null(pc.cast(t.column("support"), pa.int64()), 0),
                ],
                schema=SUP,
            )
            if t.num_columns and t.num_rows
            else SUP.empty_table(),
            batch_format="pyarrow",
        ),
        SUP,
    )


def common_neighbors(
    edges: "ray.data.Dataset",
    cap: int = 200,
    min_common: int = 2,
) -> "ray.data.Dataset":
    """Link-prediction features over the KG: for every unlinked-or-linked
    node pair sharing at least ``min_common`` neighbors, emit
    ``(node_a, node_b, n_common, aa_q)`` where ``aa_q`` is the quantized
    Adamic–Adar score Σ_m floor(10⁶ / ln(deg(m))) over the shared neighbors
    m — the standard "which edges are missing" candidate generator a KG
    curator runs after construction (reference analog: the shared-term /
    co-annotation statistics of ``post-import.cypher``'s neighborhood
    rollups).

    Direction and multiplicity are dropped (undirected simple graph,
    self-loops removed). Degrees for the AA weight are TRUE distinct
    degrees; pair enumeration caps each center at its first ``cap``
    ascending neighbors (hub backstop, mirrored exactly in the SQL twin via
    row_number) — a capped hub contributes pairs from a deterministic
    neighbor subset but keeps its true ln(deg) weight.

    Scale shape: incidence dedupes via ``sorted_distinct``; degree is one
    fastagg; the per-center weight joins back via a distributed hash join
    (node-proportional, no broadcast); pair emission rides the segmented
    ``bucket_pairs`` kernel with the weight as a per-id payload; final
    counts/sums are one fastagg over pair rows. Wedge volume is bounded by
    Σ min(deg, cap)² per center — the cap is the explicit knob.

    Float discipline: the ONLY float is 10⁶/ln(deg) over an exact int64
    degree, floored before the (exact, order-free) integer sum — the same
    last-ulp budget as ``materialize.cooccurrence_pmi``.
    """
    from .dedup import bucket_pairs
    from .joins import hash_join
    from .relational import ranked_over

    UND = pa.schema([("m", pa.string()), ("nb", pa.string())])

    def und_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return UND.empty_table()
        src, dst = t.column("src"), t.column("dst")
        keep = pc.invert(pc.equal(src, dst))
        src, dst = src.filter(keep), dst.filter(keep)
        fwd = pa.Table.from_arrays([src, dst], schema=UND)
        rev = pa.Table.from_arrays([dst, src], schema=UND)
        return pa.concat_tables([fwd, rev])

    und = sorted_distinct(
        edges.map_batches(und_fn, batch_format="pyarrow"), ["m", "nb"]
    ).materialize()  # consumed twice: degrees and capped incidence

    deg = sorted_grouped_agg(und, ["m"], [("nb", "count")], out_names=["d"])

    W = pa.schema([("m", pa.string()), ("w", pa.int64())])

    def weight_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return W.empty_table()
        t = t.filter(pc.greater_equal(t.column("d"), 2))
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.floor(1000000.0 / np.log(d)).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column("m"), pa.array(w, pa.int64())], schema=W
        )

    wds = drop_empty_blocks(deg.map_batches(weight_fn, batch_format="pyarrow"), W)

    capped = ranked_over(und, ["m"], [("nb", True)], rank_col="_rn").map_batches(
        lambda t: t.filter(pc.less_equal(t.column("_rn"), cap)).drop_columns(["_rn"])
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )
    j = hash_join(drop_empty_blocks(capped, UND), wds, on=("m",))

    pairs = bucket_pairs(j, ["m"], id_col="nb", payload_cols=("w",), cap=None)
    agg = sorted_grouped_agg(
        pairs,
        ["doc_a", "doc_b"],
        [("w_a", "count"), ("w_a", "sum")],
        out_names=["n_common", "aa_q"],
    )
    OUT = pa.schema(
        [
            ("node_a", pa.string()),
            ("node_b", pa.string()),
            ("n_common", pa.int64()),
            ("aa_q", pa.int64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        t = t.filter(pc.greater_equal(t.column("n_common"), min_common))
        return t.rename_columns(["node_a", "node_b", "n_common", "aa_q"])

    return drop_empty_blocks(agg.map_batches(final, batch_format="pyarrow"), OUT)


def kcore_peel(
    edges: "ray.data.Dataset", k: int = 2, rounds: int = 4
) -> "ray.data.Dataset":
    """Bounded k-core peel → (node, deg): repeatedly drop nodes of degree
    < ``k`` (and their incident edges) for a FIXED number of rounds, then
    emit the surviving nodes with their residual degree — the dense-core
    extraction a KG curator runs to separate the connected backbone from
    peripheral leaf chatter (reference analog: the hub/fan-out summaries of
    ``post-import.cypher:840-911``).

    Fixed-round contract (same discipline as ``pagerank``'s iters): the
    result equals the EXACT k-core whenever the peel converges within
    ``rounds`` — every round strictly removes nodes, so convergence is
    detectable as an unchanged edge count — and both engines run the same
    ``rounds`` regardless, so the DuckDB unrolled-CTE twin matches
    bit-for-bit even when not yet converged. Pure integer degrees; no
    floats anywhere.

    Scale shape per round: one fastagg degree count (per-batch C++ combine
    absorbs hub skew) + two distributed left_semi joins against the
    survivor set (node-proportional — never broadcast). The edge set
    shrinks monotonically, so later rounds cost less; peeling is inherently
    iterative and each round is one shuffle wave.
    """
    from ..tuning import default_join_partitions

    UND = pa.schema([("a", pa.string()), ("b", pa.string())])

    def und_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return UND.empty_table()
        src, dst = t.column("src"), t.column("dst")
        lt = pc.less(src, dst)
        tbl = pa.table(
            {"a": pc.if_else(lt, src, dst), "b": pc.if_else(lt, dst, src)}
        )
        return tbl.filter(pc.invert(pc.equal(tbl.column("a"), tbl.column("b"))))

    e = drop_empty_blocks(
        sorted_distinct(
            edges.map_batches(und_fn, batch_format="pyarrow"), ["a", "b"]
        ),
        UND,
    ).materialize()

    SURV = pa.schema([("node", pa.string())])
    for _ in range(rounds):
        deg = sorted_grouped_agg(
            _node_column(e, "a", "b"), ["node"], [("node", "count")], out_names=["c"]
        )
        surv = drop_empty_blocks(
            deg.map_batches(
                lambda t: t.filter(pc.greater_equal(t.column("c"), k)).select(
                    ["node"]
                )
                if t.num_columns
                else t,
                batch_format="pyarrow",
            ),
            SURV,
        )
        e = e.join(
            surv,
            join_type="left_semi",
            num_partitions=default_join_partitions(),
            on=("a",),
            right_on=("node",),
        )
        e = drop_empty_blocks(e, UND).join(
            surv,
            join_type="left_semi",
            num_partitions=default_join_partitions(),
            on=("b",),
            right_on=("node",),
        )
        e = drop_empty_blocks(e, UND).materialize()

    deg = sorted_grouped_agg(
        _node_column(e, "a", "b"), ["node"], [("node", "count")], out_names=["deg"]
    )
    OUT = pa.schema([("node", pa.string()), ("deg", pa.int64())])
    return drop_empty_blocks(
        deg.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.filter(pc.greater_equal(t.column("deg"), k)).column("node"),
                    pc.cast(
                        t.filter(pc.greater_equal(t.column("deg"), k)).column("deg"),
                        pa.int64(),
                    ),
                ],
                schema=OUT,
            )
            if t.num_columns
            else OUT.empty_table(),
            batch_format="pyarrow",
        ),
        OUT,
    )


def neighbor_jaccard(
    edges: "ray.data.Dataset",
    cap: int = 200,
    min_common: int = 2,
    min_jaccard_ppm: int = 0,
) -> "ray.data.Dataset":
    """Structural entity-merge candidates over the KG: for node pairs
    sharing at least ``min_common`` neighbors, emit ``(node_a, node_b,
    n_common, d_a, d_b, jaccard_ppm)`` where ``jaccard_ppm`` is the
    neighbor-set Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| as exact integer ppm
    (``n_common·10⁶ // (d_a + d_b − n_common)``). Two entities whose
    neighborhoods nearly coincide are alias candidates the string-level
    linker missed — the structural complement of ``text.term_fuzzy_pairs``
    (reference analog: the alias/synonym reconciliation of SURVEY §2.3 ST1
    and ``post-import.cypher``'s shared-neighborhood rollups).

    Same undirected-distinct-incidence + true-degree + row_number-capped
    enumeration contract as ``common_neighbors`` (capped pairs, exact
    degrees — mirrored in the SQL twin); the union size uses TRUE degrees,
    so a capped hub's jaccard is computed against its full neighborhood.
    Scale shape: one incidence dedup, one degree fastagg, the segmented
    ``bucket_pairs`` kernel, one pair fastagg, then two node-proportional
    hash joins to attach d_a/d_b. Pure int64 after the degree count — no
    float anywhere."""
    from .dedup import bucket_pairs
    from .joins import hash_join
    from .relational import ranked_over

    UND = pa.schema([("m", pa.string()), ("nb", pa.string())])

    def und_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return UND.empty_table()
        src, dst = t.column("src"), t.column("dst")
        keep = pc.invert(pc.equal(src, dst))
        src, dst = src.filter(keep), dst.filter(keep)
        fwd = pa.Table.from_arrays([src, dst], schema=UND)
        rev = pa.Table.from_arrays([dst, src], schema=UND)
        return pa.concat_tables([fwd, rev])

    und = sorted_distinct(
        edges.map_batches(und_fn, batch_format="pyarrow"), ["m", "nb"]
    ).materialize()  # consumed twice: degrees and capped incidence

    DEG = pa.schema([("m", pa.string()), ("d", pa.int64())])
    deg = drop_empty_blocks(
        sorted_grouped_agg(und, ["m"], [("nb", "count")], out_names=["d"]).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("m"), pc.cast(t.column("d"), pa.int64())], schema=DEG
            )
            if t.num_columns
            else DEG.empty_table(),
            batch_format="pyarrow",
        ),
        DEG,
    ).materialize()  # consumed twice: d_a and d_b probes

    capped = ranked_over(und, ["m"], [("nb", True)], rank_col="_rn").map_batches(
        lambda t: t.filter(pc.less_equal(t.column("_rn"), cap)).drop_columns(["_rn"])
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )

    pairs = bucket_pairs(drop_empty_blocks(capped, UND), ["m"], id_col="nb", cap=None)
    agg = sorted_grouped_agg(
        pairs, ["doc_a", "doc_b"], [("doc_a", "count")], out_names=["n_common"]
    )

    CNT = pa.schema(
        [("node_a", pa.string()), ("node_b", pa.string()), ("n_common", pa.int64())]
    )

    def thresh(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return CNT.empty_table()
        t = t.rename_columns(["node_a", "node_b", "n_common"])
        t = t.set_column(2, "n_common", pc.cast(t.column("n_common"), pa.int64()))
        return t.filter(pc.greater_equal(t.column("n_common"), min_common))

    cnt = drop_empty_blocks(agg.map_batches(thresh, batch_format="pyarrow"), CNT)

    def ren(name_m: str, name_d: str):
        def f(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.schema(
                    [(name_m, pa.string()), (name_d, pa.int64())]
                ).empty_table()
            return t.rename_columns([name_m, name_d])

        return f

    da = deg.map_batches(ren("node_a", "d_a"), batch_format="pyarrow")
    db = deg.map_batches(ren("node_b", "d_b"), batch_format="pyarrow")
    J1 = pa.schema(
        [
            ("node_a", pa.string()),
            ("node_b", pa.string()),
            ("n_common", pa.int64()),
            ("d_a", pa.int64()),
        ]
    )
    # a join's own output can carry schema-less empty blocks that break the
    # NEXT join (fastagg.drop_empty_blocks contract) — scrub between joins
    j = hash_join(
        drop_empty_blocks(hash_join(cnt, da, on=("node_a",)), J1),
        db,
        on=("node_b",),
    )

    OUT = pa.schema(
        [
            ("node_a", pa.string()),
            ("node_b", pa.string()),
            ("n_common", pa.int64()),
            ("d_a", pa.int64()),
            ("d_b", pa.int64()),
            ("jaccard_ppm", pa.int64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        n = t.column("n_common").to_numpy(zero_copy_only=False).astype(np.int64)
        da_ = t.column("d_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db_ = t.column("d_b").to_numpy(zero_copy_only=False).astype(np.int64)
        ppm = (n * 1_000_000) // np.maximum(da_ + db_ - n, 1)
        out = pa.Table.from_arrays(
            [
                t.column("node_a"),
                t.column("node_b"),
                pa.array(n, pa.int64()),
                pa.array(da_, pa.int64()),
                pa.array(db_, pa.int64()),
                pa.array(ppm, pa.int64()),
            ],
            schema=OUT,
        )
        return out.filter(
            pc.greater_equal(out.column("jaccard_ppm"), min_jaccard_ppm)
        )

    return drop_empty_blocks(j.map_batches(score, batch_format="pyarrow"), OUT)


def hub_domains(
    edges: "ray.data.Dataset",
    min_hub_deg: int = 8,
    rounds: int = 3,
) -> "ray.data.Dataset":
    """Nearest-hub assignment (multi-source BFS Voronoi over the KG): every
    node within ``rounds`` hops of a hub (degree ≥ ``min_hub_deg``) gets
    ``(node, hub, hops)`` — its closest hub, ties at equal distance broken
    by min hub id. The head-entity neighborhood map a KG curator reads, and
    a principled locality-aware partition key: co-locating each hub's
    domain keeps most edges intra-partition (reference analog: the
    hub/fan-out summaries of ``post-import.cypher:840-911``).

    Determinism: synchronous BFS — a node is labeled in the first round
    that reaches it, min hub id within that round; unreachable-in-``rounds``
    nodes are omitted. Mirrored by the unrolled AS MATERIALIZED CTE twin.

    Scale shape: undirected incidence deduped ONCE and reused per round;
    each round is one frontier⋈incidence hash join + one node-cardinality
    fastagg (min hub) + one left-anti join against the assigned set — all
    distributed, no driver state; hot hubs' fan-outs combine inside the
    fastagg partials. Frontier volume is the natural BFS wave."""
    from .joins import hash_join

    UND = pa.schema([("m", pa.string()), ("nb", pa.string())])

    def und_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return UND.empty_table()
        src, dst = t.column("src"), t.column("dst")
        keep = pc.invert(pc.equal(src, dst))
        src, dst = src.filter(keep), dst.filter(keep)
        return pa.concat_tables(
            [
                pa.Table.from_arrays([src, dst], schema=UND),
                pa.Table.from_arrays([dst, src], schema=UND),
            ]
        )

    und = drop_empty_blocks(
        sorted_distinct(edges.map_batches(und_fn, batch_format="pyarrow"), ["m", "nb"]),
        UND,
    ).materialize()

    deg = sorted_grouped_agg(und, ["m"], [("nb", "count")], out_names=["d"])
    ASG = pa.schema(
        [("node", pa.string()), ("hub", pa.string()), ("hops", pa.int64())]
    )

    def seed_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return ASG.empty_table()
        t = t.filter(pc.greater_equal(t.column("d"), min_hub_deg))
        return pa.Table.from_arrays(
            [
                t.column("m"),
                t.column("m"),
                pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            ],
            schema=ASG,
        )

    assigned = drop_empty_blocks(
        deg.map_batches(seed_fn, batch_format="pyarrow"), ASG
    ).materialize()
    frontier = assigned

    FR = pa.schema([("node", pa.string()), ("hub", pa.string())])
    for r in range(1, rounds + 1):
        # a dead wave (no hubs, or BFS exhausted before the round budget)
        # would feed an all-empty dataset into the shuffle join, whose
        # partition finalizer chokes on schema-less empty partitions —
        # and there is genuinely nothing left to do
        if frontier.count() == 0:
            break
        fr = drop_empty_blocks(
            frontier.map_batches(
                lambda t: t.select(["node", "hub"]) if t.num_columns else FR.empty_table(),
                batch_format="pyarrow",
            ),
            FR,
        )
        cand = hash_join(
            fr,
            und.map_batches(
                lambda t: t.rename_columns(["node", "nb"])
                if t.num_columns
                else pa.schema(
                    [("node", pa.string()), ("nb", pa.string())]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            on=("node",),
        )
        CAND = pa.schema(
            [("node", pa.string()), ("hub", pa.string()), ("nb", pa.string())]
        )
        reach = drop_empty_blocks(cand, CAND).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("nb"), t.column("hub")], schema=FR
            )
            if t.num_columns
            else FR.empty_table(),
            batch_format="pyarrow",
        )
        best = sorted_grouped_agg(
            drop_empty_blocks(reach, FR), ["node"], [("hub", "min")], out_names=["hub"]
        )
        new = drop_empty_blocks(best, FR).join(
            drop_empty_blocks(
                assigned.select_columns(["node"]),
                pa.schema([("node", pa.string())]),
            ),
            join_type="left_anti",
            num_partitions=default_join_partitions(),
            on=("node",),
        )

        def stamp(t: pa.Table, hops: int = r) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return ASG.empty_table()
            return pa.Table.from_arrays(
                [
                    t.column("node"),
                    t.column("hub"),
                    pa.array(np.full(t.num_rows, hops, dtype=np.int64)),
                ],
                schema=ASG,
            )

        new = drop_empty_blocks(
            new.map_batches(stamp, batch_format="pyarrow"), ASG
        ).materialize()
        assigned = assigned.union(new).materialize()
        frontier = new

    return assigned


def label_propagation(
    edges: "ray.data.Dataset", rounds: int = 3
) -> "ray.data.Dataset":
    """Deterministic synchronous label propagation → (node, label, n_votes):
    labels start as each node's own id; every round each node adopts the most
    frequent label among its NEIGHBORS, ties broken by smallest label — the
    cheap community detector a KG curator runs before eyeballing clusters
    (reference analog: the neighborhood/cluster summaries of
    ``post-import.cypher:840-911``; classic LPA per Raghavan et al. 2007,
    made deterministic by the (count desc, label asc) argmax).

    Fixed-round contract (same discipline as ``pagerank`` / ``kcore_peel``):
    both engines run exactly ``rounds`` synchronous updates, so the DuckDB
    unrolled-CTE twin matches row-for-row even before convergence — no RNG,
    no asynchronous visit order.

    Scale shape per round: ONE hash join shipping (node, label) against the
    directed message table (2·|E| rows, label payload only) + ONE
    ``majority_vote`` (per-batch combiner shrinks messages to distinct
    (node, label) pairs before the fastagg argmax) — node- and
    edge-proportional throughout, zero per-group Python, no driver state.
    Isolated nodes cannot occur (every node comes from an edge endpoint)."""
    from .relational import majority_vote

    UND = pa.schema([("a", pa.string()), ("b", pa.string())])

    def und_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return UND.empty_table()
        src, dst = t.column("src"), t.column("dst")
        lt = pc.less(src, dst)
        tbl = pa.table(
            {"a": pc.if_else(lt, src, dst), "b": pc.if_else(lt, dst, src)}
        )
        return tbl.filter(pc.invert(pc.equal(tbl.column("a"), tbl.column("b"))))

    e = drop_empty_blocks(
        sorted_distinct(
            edges.map_batches(und_fn, batch_format="pyarrow"), ["a", "b"]
        ),
        UND,
    ).materialize()

    DIR = pa.schema([("u", pa.string()), ("v", pa.string())])

    def both_ways(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return DIR.empty_table()
        return pa.concat_tables(
            [
                t.select(["a", "b"]).rename_columns(["u", "v"]),
                t.select(["b", "a"]).rename_columns(["u", "v"]),
            ]
        )

    d = drop_empty_blocks(
        e.map_batches(both_ways, batch_format="pyarrow"), DIR
    ).materialize()

    LBL = pa.schema([("u", pa.string()), ("label", pa.string())])
    labels = drop_empty_blocks(
        sorted_distinct(d.select_columns(["u"]), ["u"]).map_batches(
            lambda t: pa.Table.from_arrays([t.column("u"), t.column("u")], schema=LBL)
            if t.num_columns
            else LBL.empty_table(),
            batch_format="pyarrow",
        ),
        LBL,
    )

    out = None
    for _ in range(rounds):
        msgs = d.join(
            labels,
            join_type="inner",
            num_partitions=default_join_partitions(),
            on=("u",),
        ).select_columns(["v", "label"])
        msgs = msgs.map_batches(
            lambda t: t.rename_columns(["node", "label"])
            if t.num_columns
            else pa.schema([("node", pa.string()), ("label", pa.string())]).empty_table(),
            batch_format="pyarrow",
        )
        out = majority_vote(msgs, ["node"], "label", out_col="label").materialize()
        labels = drop_empty_blocks(
            out.map_batches(
                lambda t: pa.Table.from_arrays(
                    [t.column("node"), t.column("label")], schema=LBL
                )
                if t.num_columns
                else LBL.empty_table(),
                batch_format="pyarrow",
            ),
            LBL,
        )
    return out


def degree_assortativity(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Degree assortativity coefficient of the undirected simple graph —
    ONE row ``(n, assort_ppm)``: the Pearson correlation between the degrees
    at the two ends of every edge, each undirected edge counted in both
    orientations (Newman 2002's standard r). Hub-attracts-hub graphs score
    positive; hub-and-spoke KGs (every leaf hangs off a high-degree entity)
    score negative — the one-number topology summary a KG builder checks
    after a schema change (reference analog: the hub/fan-out audit rollups
    of ``post-import.cypher:840-911``).

    Exactness: degrees are exact int64 counts; the correlation reduces to
    the five int64 cross-moments of ``relational.group_corr`` under a single
    constant group and finalizes in doubles with the oracle's exact op
    order — bit-exact floor(r·10⁶), NULL when degree variance is zero
    (regular graphs).

    Scale shape: one symmetric-incidence dedup (``sorted_distinct``), one
    degree fastagg, two node-proportional distributed hash joins to attach
    the degree at each endpoint, then 1-row-per-block corr partials — no
    broadcast of node-proportional state, no driver loops, hot hubs cost
    their incidence share only."""
    from .joins import hash_join
    from .relational import group_corr

    UND = pa.schema([("m", pa.string()), ("nb", pa.string())])

    def und_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return UND.empty_table()
        src, dst = t.column("src"), t.column("dst")
        keep = pc.invert(pc.equal(src, dst))
        src, dst = src.filter(keep), dst.filter(keep)
        fwd = pa.Table.from_arrays([src, dst], schema=UND)
        rev = pa.Table.from_arrays([dst, src], schema=UND)
        return pa.concat_tables([fwd, rev])

    und = sorted_distinct(
        edges.map_batches(und_fn, batch_format="pyarrow"), ["m", "nb"]
    ).materialize()  # consumed twice: degrees + the oriented endpoint list

    DEG = pa.schema([("m", pa.string()), ("d", pa.int64())])
    deg = drop_empty_blocks(
        sorted_grouped_agg(und, ["m"], [("nb", "count")], out_names=["d"]).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("m"), pc.cast(t.column("d"), pa.int64())], schema=DEG
            )
            if t.num_columns
            else DEG.empty_table(),
            batch_format="pyarrow",
        ),
        DEG,
    ).materialize()  # probed twice: the u side and the v side

    DV = pa.schema([("nb", pa.string()), ("d_v", pa.int64())])
    dv = drop_empty_blocks(
        deg.map_batches(
            lambda t: t.rename_columns(["nb", "d_v"])
            if t.num_columns
            else DV.empty_table(),
            batch_format="pyarrow",
        ),
        DV,
    )
    J1 = pa.schema([("m", pa.string()), ("nb", pa.string()), ("d", pa.int64())])
    # scrub schema-less empty blocks between the two joins (same contract
    # note as neighbor_jaccard)
    j = hash_join(drop_empty_blocks(hash_join(und, deg, on=("m",)), J1), dv, on=("nb",))

    MID = pa.schema([("_g", pa.int64()), ("d_u", pa.int64()), ("d_v", pa.int64())])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                pc.cast(t.column("d"), pa.int64()),
                pc.cast(t.column("d_v"), pa.int64()),
            ],
            schema=MID,
        )

    corr = group_corr(
        drop_empty_blocks(j.map_batches(prep, batch_format="pyarrow"), MID),
        ["_g"],
        "d_u",
        "d_v",
        out_col="assort_ppm",
    )
    OUT = pa.schema([("n", pa.int64()), ("assort_ppm", pa.int64())])
    return drop_empty_blocks(
        corr.map_batches(
            lambda t: t.drop_columns(["_g"]) if t.num_columns else OUT.empty_table(),
            batch_format="pyarrow",
        ),
        OUT,
    )


def clustering_coefficient(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-node LOCAL clustering coefficient over the undirected simple
    graph — ``(node, d, n_triangles, cc_ppm)`` for every node with degree
    ≥ 2, where cc_ppm = floor(2·T·10⁶ / (d·(d−1))): the fraction of a
    node's neighbor pairs that are themselves connected, as exact integer
    ppm. The per-node companion of ``degree_assortativity`` (how clustered
    is each entity's neighborhood vs how hubs mix) and the second standard
    output of the triangle kernel (reference analog: the neighborhood-
    statistics rollups of ``post-import.cypher:840-911``).

    Pure composition of existing scale shapes: ``node_triangles``'s
    degree-ordered oriented enumeration (O(m^1.5) worst case), one
    incidence-degree fastagg, one node-proportional LEFT hash join
    (triangle-free nodes keep T=0), one stateless integer finalize. No
    floats anywhere."""
    from .joins import hash_join

    UND = pa.schema([("a", pa.string()), ("b", pa.string())])

    def und_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return UND.empty_table()
        src, dst = t.column("src"), t.column("dst")
        lt = pc.less(src, dst)
        tbl = pa.Table.from_arrays(
            [pc.if_else(lt, src, dst), pc.if_else(lt, dst, src)], schema=UND
        )
        return tbl.filter(pc.invert(pc.equal(tbl.column("a"), tbl.column("b"))))

    und = drop_empty_blocks(
        sorted_distinct(edges.map_batches(und_fn, batch_format="pyarrow"), ["a", "b"])
    )
    DEG = pa.schema([("node", pa.string()), ("d", pa.int64())])
    deg = drop_empty_blocks(
        sorted_grouped_agg(
            _node_column(und, "a", "b"), ["node"], [("node", "count")],
            out_names=["d"],
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node"), pc.cast(t.column("d"), pa.int64())], schema=DEG
            ).filter(pc.greater_equal(pc.cast(t.column("d"), pa.int64()), 2))
            if t.num_columns
            else DEG.empty_table(),
            batch_format="pyarrow",
        ),
        DEG,
    )
    TRI = pa.schema([("node", pa.string()), ("n_triangles", pa.int64())])
    tri = drop_empty_blocks(
        node_triangles(edges).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node"), pc.cast(t.column("n_triangles"), pa.int64())],
                schema=TRI,
            )
            if t.num_columns
            else TRI.empty_table(),
            batch_format="pyarrow",
        ),
        TRI,
    )
    j = hash_join(deg, tri, on=("node",), how="left_outer")
    OUT = pa.schema(
        [
            ("node", pa.string()),
            ("d", pa.int64()),
            ("n_triangles", pa.int64()),
            ("cc_ppm", pa.int64()),
        ]
    )

    def fin(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        tr = pc.fill_null(t.column("n_triangles"), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ppm = (2 * tr * 1_000_000) // (d * (d - 1))
        return pa.Table.from_arrays(
            [
                t.column("node"),
                pa.array(d, pa.int64()),
                pa.array(tr, pa.int64()),
                pa.array(ppm, pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(j.map_batches(fin, batch_format="pyarrow"), OUT)


def truss_peel(
    edges: "ray.data.Dataset", k: int = 3, rounds: int = 3
) -> "ray.data.Dataset":
    """Bounded k-truss peel → ``(a, b, support)``: repeatedly recompute
    per-edge triangle support over the surviving edge set and drop edges
    with support < k−2, for a FIXED number of rounds — the cohesive-core
    refinement one level above ``kcore_peel`` (a k-truss edge needs k−2
    common neighbors, not just k−2 neighbors; bridges and tree chatter die
    in round one). The KG-curation read: surviving edges are the claims
    corroborated by multiple closed co-mention paths.

    Fixed-round contract (the ``kcore_peel``/``pagerank`` discipline):
    equals the exact k-truss whenever the peel converges within ``rounds``;
    both engines run the same count regardless, so the unrolled-CTE twin
    matches bit-for-bit even mid-convergence. ``support`` on each output
    row is the count from the FINAL recount, i.e. the filter that admitted
    it. Requires k ≥ 3: the twin's per-round inner join against the
    triangle-edge aggregate drops support-0 edges, which coincides with
    the engine's ≥ k−2 filter only when the threshold is positive.

    Scale shape per round: one full degree-ordered triangle enumeration
    (``edge_support`` — O(m^1.5) via orientation, hub-safe) + a stateless
    filter. The edge set shrinks monotonically, so later rounds cost less;
    truss is inherently recount-iterative (support changes as edges die).
    """
    if k < 3:
        raise ValueError("truss_peel requires k >= 3 (support threshold > 0)")
    SUP = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("support", pa.int64())]
    )
    ED = pa.schema([("src", pa.string()), ("dst", pa.string())])
    cur = edges
    keep = None
    for _ in range(rounds):
        sup = edge_support(cur)
        keep = drop_empty_blocks(
            sup.map_batches(
                lambda t: t.filter(
                    pc.greater_equal(t.column("support"), k - 2)
                )
                if t.num_columns
                else SUP.empty_table(),
                batch_format="pyarrow",
            ),
            SUP,
        ).materialize()  # bounds lineage depth; consumed as next round's input
        cur = drop_empty_blocks(
            keep.map_batches(
                lambda t: pa.Table.from_arrays(
                    [t.column("a"), t.column("b")], schema=ED
                )
                if t.num_columns
                else ED.empty_table(),
                batch_format="pyarrow",
            ),
            ED,
        )
    return keep


def hits(
    edges: "ray.data.Dataset", iters: int = 2, scale: int = 1_000_000
) -> "ray.data.Dataset":
    """Fixed-iteration integer HITS → ``(node, auth_q, hub_q)`` over the
    DIRECTED deduped edge table: authorities are pointed AT by good hubs,
    hubs point AT good authorities — the directed complement to
    ``pagerank`` (a node heavily cited by broad aggregator nodes ranks as
    authority even with modest raw in-degree). hub₀ = ``scale`` for every
    node; each iteration: auth_raw(v) = Σ_{u→v} hub(u), hub_raw(u) =
    Σ_{u→v} auth(v), each rescaled by INTEGER division with
    d = max(max_raw // scale, 1) so scores stay in ~[0, 2·scale] —
    deterministic order-free arithmetic both engines replicate exactly
    (the max is one O(1) scalar per half-iteration; no float ever enters).

    int64 headroom: normalized scores ≤ 2·scale, so raw sums are bounded by
    2·scale·deg ≤ 2·10⁶·n — safe past 10¹² edges.

    Scale shape: the deduped edge table is built once and reused; each
    half-iteration is one hash join (edges ⋈ scores) + one fastagg (hot
    nodes absorb their degree in the C++ partial combine) + one O(1) max.
    Nodes with no in-edges (auth 0) / no out-edges (hub 0) survive via the
    zero-row union, exactly like ``pagerank``."""
    e = drop_empty_blocks(_distinct_edges(edges)).materialize()
    nodes = sorted_distinct(_node_column(e, "src", "dst"), ["node"]).materialize()

    SC = pa.schema([("node", pa.string()), ("score", pa.int64())])

    def init_scores(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return SC.empty_table()
        return t.append_column(
            "score", pa.array(np.full(t.num_rows, scale, dtype=np.int64))
        )

    def zero_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([("node", pa.string()), ("c", pa.int64())]).empty_table()
        return t.select(["node"]).append_column(
            "c", pa.array(np.zeros(t.num_rows, dtype=np.int64))
        )

    zeros = nodes.map_batches(zero_rows, batch_format="pyarrow")

    def _half(scores: "ray.data.Dataset", join_on: str, emit: str):
        """One HITS half-step: propagate ``scores`` across edges from the
        ``join_on`` endpoint to the ``emit`` endpoint, sum, rescale."""
        joined = e.join(
            drop_empty_blocks(scores, SC),
            join_type="inner",
            on=(join_on,),
            right_on=("node",),
            num_partitions=default_join_partitions(),
        )
        C = pa.schema([("node", pa.string()), ("c", pa.int64())])
        cand = drop_empty_blocks(
            joined.map_batches(
                lambda t: pa.table(
                    {"node": t.column(emit), "c": t.column("score")}
                )
                if t.num_columns and t.num_rows
                else C.empty_table(),
                batch_format="pyarrow",
            ),
            C,
        ).union(zeros)
        sums = sorted_grouped_agg(
            cand, ["node"], [("c", "sum")], out_names=["s"]
        ).materialize()  # consumed twice: the O(1) max and the rescale
        m = 0
        for b in sums.iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_columns and b.num_rows:
                m = max(m, pc.max(b.column("s")).as_py() or 0)
        d = max(m // scale, 1)
        return drop_empty_blocks(
            sums.map_batches(
                lambda t, _d=d: pa.Table.from_arrays(
                    [
                        t.column("node"),
                        pc.divide(pc.cast(t.column("s"), pa.int64()),
                                  pa.scalar(_d, pa.int64())),
                    ],
                    schema=SC,
                )
                if t.num_columns
                else SC.empty_table(),
                batch_format="pyarrow",
            ),
            SC,
        ).materialize()

    hub = nodes.map_batches(init_scores, batch_format="pyarrow").materialize()
    auth = None
    for _ in range(iters):
        auth = _half(hub, "src", "dst")   # authorities gather hub mass
        hub = _half(auth, "dst", "src")   # hubs gather authority mass
    OUT = pa.schema(
        [("node", pa.string()), ("auth_q", pa.int64()), ("hub_q", pa.int64())]
    )
    j = auth.join(
        hub.rename_columns({"score": "hub_q"}),
        join_type="inner",  # both sides carry every node via the zero union
        on=("node",),
        num_partitions=default_join_partitions(),
    )
    return drop_empty_blocks(
        j.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node"), t.column("score"), t.column("hub_q")],
                schema=OUT,
            )
            if t.num_columns and t.num_rows
            else OUT.empty_table(),
            batch_format="pyarrow",
        ),
        OUT,
    )


def harmonic_closeness(
    edges: "ray.data.Dataset",
    min_seed_deg: int = 8,
    rounds: int = 3,
) -> "ray.data.Dataset":
    """Bounded harmonic closeness centrality for a degree-selected seed
    set: ``(seed, n_reached, harmonic_e6)`` where harmonic_e6 =
    Σ_{v reached, v≠seed} 10⁶ // d(seed, v) over BFS distances ≤
    ``rounds`` on the undirected deduped graph — the "how near is this
    hub to everything" ranking that degree/PageRank miss (a mid-degree
    bridge node can out-rank a leaf-heavy hub). Harmonic (not classic
    1/Σd) closeness is the disconnected-graph-safe variant, and the
    per-node 10⁶ // d weights keep the WHOLE computation in exact
    integer arithmetic — no float enters, bit-identical to the unrolled
    CTE twin at any parallelism. Seeds with nothing within ``rounds``
    hops emit (seed, 0, 0).

    Scale shape: per-(node, seed) BFS — each round is one
    frontier⋈incidence hash join, one (node, seed) sorted-distinct, one
    two-key left-anti join against the visited pairs, and one
    seed-cardinality contribution fastagg. State and traffic are
    Σ_seed |ball(seed, rounds)| pairs — bounded by the ``min_seed_deg``
    seed cap and the round budget, the documented price of EXACT
    per-seed distances (cf. ``hub_domains``, which keeps only the
    nearest seed per node and is the cheap alternative when per-seed
    balls overlap heavily). All distributed; no driver state beyond the
    fixed round loop."""
    from .joins import hash_join

    UND = pa.schema([("m", pa.string()), ("nb", pa.string())])

    def und_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return UND.empty_table()
        src, dst = t.column("src"), t.column("dst")
        keep = pc.invert(pc.equal(src, dst))
        src, dst = src.filter(keep), dst.filter(keep)
        return pa.concat_tables(
            [
                pa.Table.from_arrays([src, dst], schema=UND),
                pa.Table.from_arrays([dst, src], schema=UND),
            ]
        )

    und = drop_empty_blocks(
        sorted_distinct(
            edges.map_batches(und_fn, batch_format="pyarrow"), ["m", "nb"]
        ),
        UND,
    ).materialize()

    deg = sorted_grouped_agg(und, ["m"], [("nb", "count")], out_names=["d"])
    VP = pa.schema([("node", pa.string()), ("seed", pa.string())])

    def seed_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return VP.empty_table()
        t = t.filter(pc.greater_equal(t.column("d"), min_seed_deg))
        return pa.Table.from_arrays([t.column("m"), t.column("m")], schema=VP)

    visited = drop_empty_blocks(
        deg.map_batches(seed_fn, batch_format="pyarrow"), VP
    ).materialize()
    frontier = visited

    CONTRIB = pa.schema(
        [("seed", pa.string()), ("_n", pa.int64()), ("_h", pa.int64())]
    )
    zero = drop_empty_blocks(
        visited.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column("seed"),
                    pa.array(np.zeros(t.num_rows, np.int64)),
                    pa.array(np.zeros(t.num_rows, np.int64)),
                ],
                schema=CONTRIB,
            )
            if t.num_columns
            else CONTRIB.empty_table(),
            batch_format="pyarrow",
        ),
        CONTRIB,
    )
    contribs = [zero]

    FR = pa.schema([("m", pa.string()), ("seed", pa.string())])
    for r in range(1, rounds + 1):
        if frontier.count() == 0:
            break
        fr = drop_empty_blocks(
            frontier.map_batches(
                lambda t: t.rename_columns(["m", "seed"])
                if t.num_columns
                else FR.empty_table(),
                batch_format="pyarrow",
            ),
            FR,
        )
        cand = hash_join(fr, und, on=("m",))
        reach = sorted_distinct(
            drop_empty_blocks(
                cand,
                pa.schema(
                    [("m", pa.string()), ("seed", pa.string()), ("nb", pa.string())]
                ),
            ).map_batches(
                lambda t: pa.Table.from_arrays(
                    [t.column("nb"), t.column("seed")], schema=VP
                )
                if t.num_columns
                else VP.empty_table(),
                batch_format="pyarrow",
            ),
            ["node", "seed"],
        )
        new = drop_empty_blocks(
            drop_empty_blocks(reach, VP).join(
                visited,
                join_type="left_anti",
                num_partitions=default_join_partitions(),
                on=("node", "seed"),
            ),
            VP,
        ).materialize()
        w = 1_000_000 // r  # exact integer harmonic weight, mirrors the twin

        def contrib_fn(t: pa.Table, w: int = w) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return CONTRIB.empty_table()
            return pa.Table.from_arrays(
                [
                    t.column("seed"),
                    pa.array(np.ones(t.num_rows, np.int64)),
                    pa.array(np.full(t.num_rows, w, np.int64)),
                ],
                schema=CONTRIB,
            )

        contribs.append(
            drop_empty_blocks(
                new.map_batches(contrib_fn, batch_format="pyarrow"), CONTRIB
            )
        )
        visited = visited.union(new).materialize()
        frontier = new

    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.union(c)
    out = sorted_grouped_agg(
        allc, ["seed"], [("_n", "sum"), ("_h", "sum")],
        out_names=["n_reached", "harmonic_e6"],
    )
    OUT = pa.schema(
        [
            ("seed", pa.string()),
            ("n_reached", pa.int64()),
            ("harmonic_e6", pa.int64()),
        ]
    )
    return drop_empty_blocks(
        out.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column("seed"),
                    pc.cast(t.column("n_reached"), pa.int64()),
                    pc.cast(t.column("harmonic_e6"), pa.int64()),
                ],
                schema=OUT,
            )
            if t.num_columns
            else OUT.empty_table(),
            batch_format="pyarrow",
        ),
        OUT,
    )


def weighted_walk(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    steps: int = 3,
    scale: int = 1_000_000,
) -> "ray.data.Dataset":
    """K-step synchronous random walk over a WEIGHTED directed edge table:
    start every state at ``scale`` integer mass, each step routes a state's
    mass along its out-edges proportionally — contribution = (m·w) // W_src,
    pure integer division, so the walk is bit-identical to the unrolled CTE
    twin at any parallelism (the ``pagerank`` fixed-point discipline, minus
    damping). Output ``(state, mass_e6)`` after ``steps`` steps — one row
    per state that RECEIVES mass at the final step. Mass at sinks (states
    with no out-edges) is dropped, not held — this is the k-step transition
    census ("where does behavior concentrate after k moves"), not a
    stationary solver; document the absorbing convention when comparing.

    Scale shape: out-strength fastagg once, then per step ONE hash join
    (mass ⋈ weighted edges on src) + one state-cardinality fastagg by dst.
    Contract: m·w must fit int64 — scale·max_W ≲ 9·10¹⁸."""
    from .joins import hash_join

    E = pa.schema(
        [("_s", pa.string()), ("_d", pa.string()), ("_w", pa.int64())]
    )

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return E.empty_table()
        return pa.Table.from_arrays(
            [
                t.column(src_col),
                t.column(dst_col),
                pc.cast(t.column(weight_col), pa.int64()),
            ],
            schema=E,
        )

    e = drop_empty_blocks(
        edges.select_columns([src_col, dst_col, weight_col]).map_batches(
            prep, batch_format="pyarrow"
        ),
        E,
    ).materialize()
    wsum = drop_empty_blocks(
        sorted_grouped_agg(e, ["_s"], [("_w", "sum")], out_names=["_W"]),
        pa.schema([("_s", pa.string()), ("_W", pa.int64())]),
    )
    ew = drop_empty_blocks(
        hash_join(e, wsum, on=("_s",)),
        pa.schema(list(E) + [("_W", pa.int64())]),
    ).materialize()  # reused every step

    ST = pa.schema([("_s", pa.string()), ("_m", pa.int64())])
    states = sorted_distinct(
        e.map_batches(
            lambda t: pa.table(
                {"_s": pa.concat_arrays(
                    [t.column("_s").combine_chunks(), t.column("_d").combine_chunks()]
                )}
            )
            if t.num_columns
            else pa.schema([("_s", pa.string())]).empty_table(),
            batch_format="pyarrow",
        ),
        ["_s"],
    )
    p = drop_empty_blocks(
        states.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("_s"), pa.array(np.full(t.num_rows, scale, np.int64))],
                schema=ST,
            )
            if t.num_columns
            else ST.empty_table(),
            batch_format="pyarrow",
        ),
        ST,
    )
    for _ in range(steps):
        j = hash_join(p, ew, on=("_s",))
        CONTRIB = pa.schema([("_d", pa.string()), ("_c", pa.int64())])

        def contrib(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return CONTRIB.empty_table()
            m = t.column("_m").to_numpy(zero_copy_only=False).astype(np.int64)
            w = t.column("_w").to_numpy(zero_copy_only=False).astype(np.int64)
            W = t.column("_W").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.Table.from_arrays(
                [t.column("_d"), pa.array(m * w // W, pa.int64())],
                schema=CONTRIB,
            )

        nxt = sorted_grouped_agg(
            drop_empty_blocks(
                drop_empty_blocks(
                    j, pa.schema(list(ST) + [("_d", pa.string()), ("_w", pa.int64()), ("_W", pa.int64())])
                ).map_batches(contrib, batch_format="pyarrow"),
                CONTRIB,
            ),
            ["_d"],
            [("_c", "sum")],
            out_names=["_m"],
        )
        p = drop_empty_blocks(
            nxt.map_batches(
                lambda t: t.rename_columns(["_s", "_m"])
                if t.num_columns
                else ST.empty_table(),
                batch_format="pyarrow",
            ),
            ST,
        ).materialize()

    OUT = pa.schema([("state", pa.string()), ("mass_e6", pa.int64())])
    return drop_empty_blocks(
        p.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("_s"), t.column("_m")], schema=OUT
            )
            if t.num_columns
            else OUT.empty_table(),
            batch_format="pyarrow",
        ),
        OUT,
    )


def negative_samples(
    edges: "ray.data.Dataset",
    salt: str = "neg",
) -> "ray.data.Dataset":
    """Filtered uniform corruption for link-prediction training: ONE
    candidate negative per distinct directed edge — the tail is replaced by
    ``nodes[md5(src|dst) % n_nodes]`` over the sorted node vocabulary, and
    candidates that collide with an EXISTING edge, the original tail, or
    the head itself are DROPPED (filtered Bernoulli corruption — the
    standard KG-embedding negative sampler [Bordes et al. 2013]; a
    resample-until-clean loop is sequential and non-deterministic under
    retries, so collisions cost a sample instead). Emits distinct
    ``(src, dst_neg)``.

    Determinism / oracle parity: the pick is the md5-derived ``_hash60`` of
    'src|dst', index = hash % n over row_number-ordered nodes — the DuckDB
    twin computes the identical picks.

    Scale contract: the node VOCABULARY is broadcast once (sorted list in
    the task closure) — entity vocabularies are dictionary-bounded here;
    for corpus-scale node sets pass a sampled vocabulary instead. The
    positive-collision screen is a distributed left-anti join; nothing
    else shuffles."""
    import pyarrow.compute as pc

    from ..stages.sampling import _hash60
    from .fastagg import drop_empty_blocks, sorted_distinct

    e = drop_empty_blocks(_distinct_edges(edges)).materialize()
    nodes = sorted(
        r["node"]
        for r in sorted_distinct(
            _node_column(e, "src", "dst"), ["node"]
        ).take_all()
    )
    n = len(nodes)
    node_arr = pa.array(nodes, pa.string())

    CAND = pa.schema([("src", pa.string()), ("dst_neg", pa.string())])

    def corrupt(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0 or n == 0:
            return CAND.empty_table()
        key = pc.binary_join_element_wise(t.column("src"), t.column("dst"), "|")
        idx = _hash60(key, salt) % n
        dst_neg = pc.take(node_arr, pa.array(idx, pa.int64()))
        out = pa.Table.from_arrays([t.column("src"), dst_neg], schema=CAND)
        keep = pc.and_(
            pc.invert(pc.equal(out.column("dst_neg"), t.column("src"))),
            pc.invert(pc.equal(out.column("dst_neg"), t.column("dst"))),
        )
        return out.filter(keep)

    cand = drop_empty_blocks(
        e.map_batches(corrupt, batch_format="pyarrow"), CAND
    )
    if cand.count() == 0:
        return ray.data.from_arrow(CAND.empty_table())
    neg = cand.join(
        e,
        join_type="left_anti",
        on=("src", "dst_neg"),
        right_on=("src", "dst"),
        num_partitions=default_join_partitions(),
    )
    return sorted_distinct(
        drop_empty_blocks(neg.select_columns(["src", "dst_neg"]), CAND),
        ["src", "dst_neg"],
    )


def modularity_by_label(
    edges: "ray.data.Dataset",
    rounds: int = 3,
    labels: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Partition quality of the ``label_propagation`` communities — per
    community, the EXACT integer modularity contribution: q_num =
    4·m·e_c − d_c² over the common denominator 4m² (Newman modularity
    Q = Σ_c (e_c/m − (d_c/2m)²) cleared of fractions), where e_c =
    intra-community edges, d_c = the community's degree sum, m = |und
    edges|. The did-the-clustering-find-anything audit a curator runs
    after LPA: Σ q_num ≤ 0 means the partition is no better than random.
    Zero floats anywhere — pure int64 (documented range: overflows only if
    a community's degree sum exceeds ~3·10⁹; at that scale switch the
    final map to object ints).

    Scale shape: one undirected-distinct dedup, the fixed-round LPA
    (edge-proportional joins + majority_vote), two label joins against the
    node-proportional label table, one degree fastagg, two
    community-cardinality fastaggs and a left join of intra counts onto
    degree sums (communities with zero intra edges still appear)."""
    from ..tuning import default_join_partitions
    from .fastagg import drop_empty_blocks, sorted_distinct, sorted_grouped_agg

    UND = pa.schema([("a", pa.string()), ("b", pa.string())])

    def und_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return UND.empty_table()
        src, dst = t.column("src"), t.column("dst")
        lt = pc.less(src, dst)
        tbl = pa.table(
            {"a": pc.if_else(lt, src, dst), "b": pc.if_else(lt, dst, src)}
        )
        return tbl.filter(pc.invert(pc.equal(tbl.column("a"), tbl.column("b"))))

    edges = edges.materialize()  # consumed by LPA and the und dedup
    e0 = drop_empty_blocks(
        sorted_distinct(
            edges.map_batches(und_fn, batch_format="pyarrow"), ["a", "b"]
        ),
        UND,
    ).materialize()  # consumed three times: m, intra joins, degrees
    m = e0.count()

    # ``labels``: accept a precomputed LPA label table (node, label) when the
    # caller already ran label_propagation in the same pass (kg_labelprop +
    # kg_modularity share it in the bench) — identical rows either way.
    labels = drop_empty_blocks(
        (labels if labels is not None else label_propagation(edges, rounds=rounds))
        .select_columns(["node", "label"])
    ).materialize()  # probed three times (a-side, b-side, degree side)

    np_ = default_join_partitions()
    ja = drop_empty_blocks(
        e0.join(
            labels, join_type="inner", num_partitions=np_,
            on=("a",), right_on=("node",),
        ).map_batches(
            lambda t: t.rename_columns(["a", "b", "la"]) if t.num_columns else t,
            batch_format="pyarrow",
        )
    )
    jb = drop_empty_blocks(
        ja.join(
            labels, join_type="inner", num_partitions=np_,
            on=("b",), right_on=("node",),
        ).map_batches(
            lambda t: t.rename_columns(["a", "b", "la", "lb"])
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
    )

    INTRA = pa.schema([("community", pa.string()), ("_one", pa.int64())])

    def intra_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return INTRA.empty_table()
        t = t.filter(pc.equal(t.column("la"), t.column("lb")))
        return pa.Table.from_arrays(
            [t.column("la"), pa.array(np.ones(t.num_rows, np.int64))],
            schema=INTRA,
        )

    intra = sorted_grouped_agg(
        drop_empty_blocks(jb.map_batches(intra_fn, batch_format="pyarrow"), INTRA),
        ["community"],
        [("_one", "sum")],
        out_names=["n_intra"],
    )

    deg = sorted_grouped_agg(
        _node_column(e0, "a", "b"), ["node"], [("node", "count")], out_names=["d"]
    )
    dj = drop_empty_blocks(
        drop_empty_blocks(deg).join(
            labels, join_type="inner", num_partitions=np_,
            on=("node",), right_on=("node",),
        )
    )
    dsum = sorted_grouped_agg(
        dj.map_batches(
            lambda t: pa.table(
                {"community": t.column("label"), "d": pc.cast(t.column("d"), pa.int64())}
            )
            if t.num_columns and t.num_rows
            else pa.schema(
                [("community", pa.string()), ("d", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        ),
        ["community"],
        [("d", "sum")],
        out_names=["deg_sum"],
    )

    j = drop_empty_blocks(dsum).join(
        drop_empty_blocks(intra),
        join_type="left_outer",
        num_partitions=np_,
        on=("community",),
    )

    OUT = pa.schema(
        [
            ("community", pa.string()),
            ("n_intra", pa.int64()),
            ("deg_sum", pa.int64()),
            ("q_num", pa.int64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        ni = pc.fill_null(pc.cast(t.column("n_intra"), pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        ds_ = t.column("deg_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        q = 4 * np.int64(m) * ni - ds_ * ds_
        return pa.Table.from_arrays(
            [
                t.column("community"),
                pa.array(ni, pa.int64()),
                pa.array(ds_, pa.int64()),
                pa.array(q, pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(j.map_batches(final, batch_format="pyarrow"), OUT)


def walk_corpus(
    edges: "ray.data.Dataset", steps: int = 3
) -> "ray.data.Dataset":
    """Deterministic DeepWalk corpus over the KG: one walk per node, each
    step following the out-edge with the smallest md5 hash of
    'walk:src:step:dst' (ties → dst asc) — the node-sequence training data
    a KG-embedding run (DeepWalk/node2vec) consumes, with ZERO RNG so the
    corpus is bit-identical across engines, partitionings and reruns
    (hash-seeded per (node, step), so consecutive steps at the same node
    still diversify). Walkers at sink nodes stop early. Emits
    (start, step 0..steps, node).

    Scale shape per step: the next-hop choice depends only on (node, step)
    — computed ONCE per node via the hot-key-safe ``ranked_over`` (never
    per walker), then one node-proportional hash join advances every
    walker; per-step materialize bounds lineage depth. The md5 ranking
    hash is the embedded-DuckDB ``_hash60`` kernel (bit-identical twin
    expression)."""
    from ..tuning import default_join_partitions
    from .fastagg import drop_empty_blocks, sorted_distinct
    from .relational import ranked_over
    from .sampling import _hash60

    E = pa.schema([("src", pa.string()), ("dst", pa.string())])
    e = drop_empty_blocks(
        sorted_distinct(
            edges.map_batches(
                lambda t: t.select(["src", "dst"]) if t.num_columns else t,
                batch_format="pyarrow",
            ),
            ["src", "dst"],
        ),
        E,
    ).materialize()  # consumed once per step + the node universe

    W = pa.schema([("start", pa.string()), ("step", pa.int64()), ("node", pa.string())])

    nodes = sorted_distinct(_node_column(e, "src", "dst"), ["node"])
    state = drop_empty_blocks(
        nodes.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node"), pa.array(np.zeros(t.num_rows, np.int64)), t.column("node")],
                schema=W,
            )
            if t.num_columns and t.num_rows
            else W.empty_table(),
            batch_format="pyarrow",
        ),
        W,
    ).materialize()
    out_parts = [state]

    np_ = default_join_partitions()
    for r in range(1, steps + 1):
        def hashed(t: pa.Table, _r=r) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.schema(
                    [("src", pa.string()), ("dst", pa.string()), ("h", pa.int64())]
                ).empty_table()
            key = pc.binary_join_element_wise(
                t.column("src"), str(_r), t.column("dst"), ":"
            )
            h = _hash60(key, "walk")
            return t.append_column("h", pa.array(h, pa.int64()))

        nxt = ranked_over(
            drop_empty_blocks(e.map_batches(hashed, batch_format="pyarrow")),
            ["src"],
            [("h", True), ("dst", True)],
            rank_col="_rk",
        ).map_batches(
            lambda t: t.filter(pc.equal(t.column("_rk"), 1)).select(["src", "dst"])
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        adv = drop_empty_blocks(state.select_columns(["start", "node"])).join(
            drop_empty_blocks(nxt),
            join_type="inner",
            num_partitions=np_,
            on=("node",),
            right_on=("src",),
        )
        state = drop_empty_blocks(
            adv.map_batches(
                lambda t, _r=r: pa.Table.from_arrays(
                    [
                        t.column("start"),
                        pa.array(np.full(t.num_rows, _r, np.int64)),
                        t.column("dst"),
                    ],
                    schema=W,
                )
                if t.num_columns and t.num_rows
                else W.empty_table(),
                batch_format="pyarrow",
            ),
            W,
        ).materialize()
        out_parts.append(state)

    res = out_parts[0]
    for p in out_parts[1:]:
        res = res.union(p)
    return res
