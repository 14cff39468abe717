"""PageRank and per-node triangle counting vs independent single-process
references (pure-python fixpoint / brute-force triangle enumeration) and the
DuckDB twin arithmetic, on a random directed multigraph with hubs and
self-loops."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.graph import node_triangles, pagerank

SCALE = 1_000_000


def _random_edges(seed: int, n_nodes: int = 60, n_edges: int = 400):
    rng = np.random.RandomState(seed)
    # skewed: node 0 is a hub; include self-loops + duplicate edges
    src = np.where(
        rng.rand(n_edges) < 0.2, 0, rng.randint(0, n_nodes, n_edges)
    )
    dst = np.where(
        rng.rand(n_edges) < 0.2, 1, rng.randint(0, n_nodes, n_edges)
    )
    return [(f"n{a:03d}", f"n{b:03d}") for a, b in zip(src, dst)]


def _ref_pagerank(edges, iters=3, damping_pct=85, scale=SCALE):
    base = scale * (100 - damping_pct) // 100
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({x for ab in e for x in ab})
    outdeg: dict[str, int] = {}
    for a, _ in e:
        outdeg[a] = outdeg.get(a, 0) + 1
    score = {n: scale for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for a, b in e:
            inc[b] += score[a] // outdeg[a]
        score = {n: base + (damping_pct * inc[n]) // 100 for n in nodes}
    return score


def _ref_triangles(edges):
    und = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    und_set = set(und)
    nodes = sorted({x for ab in und for x in ab})
    counts = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if (
            (x, y) in und_set and (x, z) in und_set and (y, z) in und_set
        ):
            counts[x] += 1
            counts[y] += 1
            counts[z] += 1
    return {n: c for n, c in counts.items() if c > 0}


def _edges_ds(edges, parts=7):
    t = pa.table(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
    )
    return ray.data.from_arrow(t).repartition(parts)


def test_pagerank_matches_pure_python_fixpoint():
    edges = _random_edges(11)
    out = pagerank(_edges_ds(edges), iters=3).to_pandas()
    ref = _ref_pagerank(edges, iters=3)
    got = dict(zip(out["node"], out["pr_score"]))
    assert got == ref
    # the hub's in-neighbor mass should make node n001 top-ranked
    assert max(ref, key=ref.get) == "n001"
    # int64 fixed point: all scores ≥ base, exact integers
    assert out["pr_score"].min() >= SCALE * 15 // 100


def test_pagerank_independent_of_parallelism():
    edges = _random_edges(12, n_nodes=30, n_edges=150)
    a = pagerank(_edges_ds(edges, parts=1), iters=2).to_pandas()
    b = pagerank(_edges_ds(edges, parts=13), iters=2).to_pandas()
    ga = dict(zip(a["node"], a["pr_score"]))
    gb = dict(zip(b["node"], b["pr_score"]))
    assert ga == gb


def test_node_triangles_matches_bruteforce():
    edges = _random_edges(13, n_nodes=40, n_edges=300)
    out = node_triangles(_edges_ds(edges)).to_pandas()
    ref = _ref_triangles(edges)
    got = dict(zip(out["node"], out["n_triangles"]))
    assert got == ref
    assert len(ref) > 5  # fixture actually contains triangles


def test_node_triangles_clique_exact():
    # K5 plus a pendant edge: every clique node is in C(4,2)=6 triangles
    nodes = [f"k{i}" for i in range(5)]
    edges = [(a, b) for a in nodes for b in nodes if a < b]
    edges.append(("k0", "pendant"))
    out = node_triangles(_edges_ds(edges, parts=3)).to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    assert got == {n: 6 for n in nodes}


def test_degree_histogram_and_reciprocity_small():
    import pyarrow as pa
    import ray.data

    from multiomics_biocypher_kg_ray.stages.materialize import (
        degree_histogram,
        reciprocity_by_pred,
    )

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(["a", "b", "a", "c"]),
                "pred": pa.array(["p", "p", "q", "p"]),
                "dst": pa.array(["b", "a", "c", "d"]),
                "weight": pa.array([1, 2, 1, 1], pa.int64()),
                "evidence": pa.array(["r1", "r2", "", "r1"]),
            }
        )
    ).repartition(3)
    hist = degree_histogram(edges).to_pandas().set_index("degree")["n_nodes"]
    # degrees: a=3, b=2, c=2, d=1
    assert hist.to_dict() == {3: 1, 2: 2, 1: 1}
    rec = reciprocity_by_pred(edges).to_pandas().set_index("pred")
    assert rec.loc["p", "n_edges"] == 3 and rec.loc["p", "n_reciprocal"] == 2
    assert rec.loc["q", "n_edges"] == 1 and rec.loc["q", "n_reciprocal"] == 0


def test_cooccurrence_pmi_small_vs_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from multiomics_biocypher_kg_ray.stages.materialize import cooccurrence_pmi

    rng = np.random.RandomState(23)
    ents = np.array(["E1", "E2", "E3", "E4", None], dtype=object)
    df = pd.DataFrame(
        {
            "conv_id": [f"c{i % 40}" for i in range(600)],
            "subj_id": rng.choice(ents, size=600),
            "obj_id": rng.choice(ents, size=600),
        }
    )
    out = (
        cooccurrence_pmi(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(5),
            cap=3,
            min_pairs=2,
        )
        .to_pandas()
        .sort_values(["ent_a", "ent_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("linked", df)
    ref = con.sql(
        """
WITH occ AS (
  SELECT DISTINCT conv_id, entity FROM (
    SELECT conv_id, subj_id AS entity FROM linked WHERE subj_id IS NOT NULL
    UNION ALL SELECT conv_id, obj_id FROM linked WHERE obj_id IS NOT NULL)
),
r AS (SELECT conv_id, entity,
             row_number() OVER (PARTITION BY conv_id ORDER BY entity) rn FROM occ),
capped AS (SELECT conv_id, entity FROM r WHERE rn <= 3),
p AS (SELECT a.entity ent_a, b.entity ent_b, count(*)::BIGINT n_ab
      FROM capped a JOIN capped b
        ON a.conv_id = b.conv_id AND a.entity < b.entity GROUP BY 1,2),
cnt AS (SELECT entity, count(*)::BIGINT n FROM capped GROUP BY 1),
tot AS (SELECT count(DISTINCT conv_id)::BIGINT nconv FROM capped)
SELECT ent_a, ent_b, n_ab,
       floor(ln((n_ab * nconv)::DOUBLE / (na.n * nb.n)) * 1000000.0::DOUBLE)::BIGINT pmi_q
FROM p JOIN cnt na ON na.entity = ent_a JOIN cnt nb ON nb.entity = ent_b
CROSS JOIN tot WHERE n_ab >= 2 ORDER BY ent_a, ent_b
"""
    ).df()
    assert (out["ent_a"].to_numpy() == ref["ent_a"].to_numpy()).all()
    assert (out["n_ab"].to_numpy() == ref["n_ab"].to_numpy()).all()
    assert (out["pmi_q"].to_numpy() == ref["pmi_q"].to_numpy()).all()


def test_skew_join_routes_hot_keys_and_matches_plain_join():
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from multiomics_biocypher_kg_ray.stages.joins import skew_join

    rng = np.random.RandomState(41)
    # one key holds 40% of the left side — the classic funnel case
    keys = np.concatenate([np.full(4000, 7), rng.randint(0, 200, size=6000)])
    left = pd.DataFrame(
        {"k": keys.astype("int64"), "lv": np.arange(10000, dtype="int64")}
    )
    right = pd.DataFrame(
        {"k": np.arange(200, dtype="int64"), "rv": np.arange(200, dtype="int64") * 10}
    )
    out = (
        skew_join(
            ray.data.from_arrow(pa.Table.from_pandas(left, preserve_index=False)).repartition(6),
            ray.data.from_arrow(pa.Table.from_pandas(right, preserve_index=False)).repartition(3),
            on="k",
            hot_top_n=4,
            hot_min_share_ppm=100_000,  # 10% → only key 7 qualifies
        )
        .to_pandas()
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    ref = (
        con.sql("SELECT l.k, l.lv, r.rv FROM l JOIN r USING (k) ORDER BY lv")
        .df()
        .reset_index(drop=True)
    )
    assert len(out) == len(ref) == 10000
    assert (out["lv"].to_numpy() == ref["lv"].to_numpy()).all()
    assert (out["rv"].to_numpy() == ref["rv"].to_numpy()).all()


def test_common_neighbors_matches_bruteforce():
    from collections import defaultdict

    from multiomics_biocypher_kg_ray.stages.graph import common_neighbors

    edges = _random_edges(5)
    ds = ray.data.from_arrow(
        pa.table(
            {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
        )
    ).repartition(5)
    out = (
        common_neighbors(ds, cap=200, min_common=2)
        .to_pandas()
        .sort_values(["node_a", "node_b"])
        .reset_index(drop=True)
    )

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    ref = {}
    nodes = sorted(adj)
    for m in nodes:
        nbs = sorted(adj[m])
        if len(nbs) < 2:
            continue
        w = int(np.floor(1_000_000.0 / np.log(float(len(nbs)))))
        for a, b in itertools.combinations(nbs, 2):
            n, s = ref.get((a, b), (0, 0))
            ref[(a, b)] = (n + 1, s + w)
    ref = {k: v for k, v in ref.items() if v[0] >= 2}
    got = {
        (r.node_a, r.node_b): (r.n_common, r.aa_q) for r in out.itertuples()
    }
    assert got == ref


def test_common_neighbors_cap_bounds_hub():
    """A hub over the cap enumerates pairs from its first `cap` ascending
    neighbors but keeps its TRUE-degree AA weight."""
    from multiomics_biocypher_kg_ray.stages.graph import common_neighbors

    hub_edges = [("hub", f"x{i:03d}") for i in range(10)]
    ds = ray.data.from_arrow(
        pa.table(
            {"src": [a for a, _ in hub_edges], "dst": [b for _, b in hub_edges]}
        )
    )
    out = common_neighbors(ds, cap=4, min_common=1).to_pandas()
    # pairs only among the 4 ascending neighbors: C(4,2) = 6
    assert len(out) == 6
    members = set(out["node_a"]) | set(out["node_b"])
    assert members == {f"x{i:03d}" for i in range(4)}
    w_true = int(np.floor(1_000_000.0 / np.log(10.0)))
    assert (out["aa_q"] == w_true).all()


def test_kcore_peel_clique_survives_chain_peels():
    from multiomics_biocypher_kg_ray.stages.graph import kcore_peel

    # 4-clique (2-core) + a chain of 4 hanging off it + an isolated edge
    clique = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    chain = [("d", "e"), ("e", "f"), ("f", "g"), ("g", "h")]
    extra = [("x", "y")]
    edges = clique + chain + extra
    ds = ray.data.from_arrow(
        pa.table(
            {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
        )
    ).repartition(3)
    out = (
        kcore_peel(ds, k=2, rounds=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # the chain peels one node per round from the free end; 4 rounds fully
    # strip e..h and x,y; the clique keeps degree 3
    assert out["node"].tolist() == ["a", "b", "c", "d"]
    assert (out["deg"] == 3).all()


def test_kcore_peel_matches_networkx_free_reference():
    from collections import defaultdict

    from multiomics_biocypher_kg_ray.stages.graph import kcore_peel

    edges = _random_edges(9, n_nodes=40, n_edges=150)
    ds = ray.data.from_arrow(
        pa.table(
            {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
        )
    )
    k, rounds = 3, 4
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    # bounded peel reference
    for _ in range(rounds):
        doomed = {n for n, nb in adj.items() if len(nb) < k}
        if not doomed:
            break
        for n in doomed:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    ref = {n: len(nb) for n, nb in adj.items() if len(nb) >= k}
    out = kcore_peel(ds, k=k, rounds=rounds).to_pandas()
    assert dict(zip(out["node"], out["deg"])) == ref


def test_neighbor_jaccard_exact_small():
    from multiomics_biocypher_kg_ray.stages.graph import neighbor_jaccard

    # N(x)={a,b,c}, N(y)={a,b,c,d}: common=3, union=4 -> 750000 ppm
    edges = [("x", "a"), ("x", "b"), ("x", "c"),
             ("y", "a"), ("y", "b"), ("y", "c"), ("y", "d")]
    ds = ray.data.from_arrow(
        pa.table({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})
    )
    out = neighbor_jaccard(ds, min_common=2).to_pandas()
    rows = {(r.node_a, r.node_b): r for r in out.itertuples()}
    xy = rows[("x", "y")]
    assert xy.n_common == 3 and xy.d_a == 3 and xy.d_b == 4
    assert xy.jaccard_ppm == 750_000
    # a,b,c pairwise share neighbors {x,y}: degree 2 each -> jaccard 1.0
    ab = rows[("a", "b")]
    assert ab.n_common == 2 and ab.jaccard_ppm == 1_000_000
    # threshold filter keeps only perfect overlaps
    strict = neighbor_jaccard(ds, min_common=2, min_jaccard_ppm=1_000_000).to_pandas()
    assert set(zip(strict["node_a"], strict["node_b"])) == {
        ("a", "b"), ("a", "c"), ("b", "c")
    }


def test_hub_domains_bfs_and_ties():
    from multiomics_biocypher_kg_ray.stages.graph import hub_domains

    edges = [
        ("h1", "a"), ("h1", "b"), ("h1", "c"),      # hub h1, deg 3
        ("h2", "b"), ("h2", "c"), ("h2", "d"),      # hub h2, deg 3
        ("a", "x"), ("x", "w"), ("w", "v"),         # chain off a
    ]
    ds = ray.data.from_arrow(
        pa.table({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})
    )
    out = hub_domains(ds, min_hub_deg=3, rounds=3).to_pandas()
    got = {r.node: (r.hub, r.hops) for r in out.itertuples()}
    assert got["h1"] == ("h1", 0) and got["h2"] == ("h2", 0)
    # tie at distance 1 -> min hub id
    assert got["b"] == ("h1", 1) and got["c"] == ("h1", 1)
    assert got["a"] == ("h1", 1) and got["d"] == ("h2", 1)
    assert got["x"] == ("h1", 2) and got["w"] == ("h1", 3)
    assert "v" not in got  # beyond the round budget


def test_hub_domains_no_hubs_returns_empty():
    from multiomics_biocypher_kg_ray.stages.graph import hub_domains

    ds = ray.data.from_arrow(pa.table({"src": ["a"], "dst": ["b"]}))
    out = hub_domains(ds, min_hub_deg=5, rounds=2).to_pandas()
    assert len(out) == 0


def _ref_truss(edges, k=3, rounds=3):
    """Pure-python bounded truss peel: recount support, filter, repeat."""
    e = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    kept = {}
    for _ in range(rounds):
        adj: dict[str, set] = {}
        for a, b in e:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {}
        for a, b in e:
            common = adj[a] & adj[b]
            sup[(a, b)] = len(common)
        kept = {ab: s for ab, s in sup.items() if s >= k - 2}
        e = sorted(kept)
    return kept


def test_truss_peel_matches_bruteforce_recount():
    from multiomics_biocypher_kg_ray.stages.graph import truss_peel

    edges = _random_edges(3, n_nodes=25, n_edges=160)
    ds = ray.data.from_arrow(
        pa.table(
            {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
        )
    ).repartition(4)
    out = truss_peel(ds, k=3, rounds=3).to_pandas()
    got = {
        (r.a, r.b): int(r.support) for r in out.itertuples(index=False)
    }
    assert got == _ref_truss(edges, k=3, rounds=3)


def test_truss_triangle_plus_tail():
    from multiomics_biocypher_kg_ray.stages.graph import truss_peel

    # triangle a-b-c plus a pendant edge c-d: the tail dies in round 1,
    # the triangle survives with support exactly 1 per edge
    ds = ray.data.from_arrow(
        pa.table(
            {"src": ["a", "b", "a", "c"], "dst": ["b", "c", "c", "d"]}
        )
    )
    out = truss_peel(ds, k=3, rounds=2).to_pandas().sort_values(["a", "b"])
    assert [tuple(r) for r in out.to_numpy()] == [
        ("a", "b", 1),
        ("a", "c", 1),
        ("b", "c", 1),
    ]


def _ref_hits(edges, iters=2, scale=SCALE):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({x for ab in e for x in ab})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(iters):
        raw = {n: 0 for n in nodes}
        for a, b in e:
            raw[b] += hub[a]
        d = max(max(raw.values()) // scale, 1)
        auth = {n: v // d for n, v in raw.items()}
        raw = {n: 0 for n in nodes}
        for a, b in e:
            raw[a] += auth[b]
        d = max(max(raw.values()) // scale, 1)
        hub = {n: v // d for n, v in raw.items()}
    return auth, hub


def test_hits_matches_pure_python_fixpoint():
    from multiomics_biocypher_kg_ray.stages.graph import hits

    edges = _random_edges(9, n_nodes=40, n_edges=300)
    ds = ray.data.from_arrow(
        pa.table(
            {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
        )
    ).repartition(5)
    out = hits(ds, iters=2).to_pandas().set_index("node")
    auth, hub = _ref_hits(edges, iters=2)
    assert len(out) == len(auth)
    for n in auth:
        assert int(out.loc[n, "auth_q"]) == auth[n], n
        assert int(out.loc[n, "hub_q"]) == hub[n], n


def test_hits_star_graph_directions():
    from multiomics_biocypher_kg_ray.stages.graph import hits

    # star: h -> {x1..x4}: h is the pure hub, leaves are pure authorities
    ds = ray.data.from_arrow(
        pa.table(
            {"src": ["h"] * 4, "dst": ["x1", "x2", "x3", "x4"]}
        )
    )
    out = hits(ds, iters=2).to_pandas().set_index("node")
    assert out.loc["h", "auth_q"] == 0 and out.loc["h", "hub_q"] > 0
    assert (out.loc[["x1", "x2", "x3", "x4"], "auth_q"] > 0).all()
    assert (out.loc[["x1", "x2", "x3", "x4"], "hub_q"] == 0).all()


def test_modularity_shared_labels_identical(sf_small):
    """kg_modularity with a precomputed kg_labelprop label table (the bench's
    shared-LPA pass) must produce identical rows to the self-computed path."""
    import pandas as pd

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_kg_labelprop,
        q_kg_modularity,
    )

    a = q_kg_modularity(sf_small).to_pandas()
    key = a.columns.tolist()
    a = a.sort_values(key).reset_index(drop=True)
    labels = q_kg_labelprop(sf_small).materialize()
    b = (
        q_kg_modularity(sf_small, labels=labels)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
