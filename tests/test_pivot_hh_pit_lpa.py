"""Unit tests for the r4 late wave: pivot_counts, term_heavy_hitters,
point_in_time_join, label_propagation — each checked against an independent
in-memory brute force (pandas / pure python), not the DuckDB twin (the
registry sweep covers that)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.stages import events, relational, text


def test_pivot_counts_matches_crosstab_with_unknown_and_null():
    rng = np.random.RandomState(7)
    cats = ["click", "view", "purchase"]
    # include an out-of-spec category and nulls: both count to total only
    raw = rng.choice(cats + ["other"], 997).astype(object)
    raw[rng.choice(997, 31, replace=False)] = None
    df = pd.DataFrame({"u": rng.randint(0, 37, 997), "c": raw})
    ds = ray.data.from_pandas(df).repartition(9)
    out = (
        relational.pivot_counts(ds, ["u"], "c", cats)
        .to_pandas()
        .set_index("u")
        .sort_index()
    )
    assert list(out.columns) == ["n_click", "n_view", "n_purchase", "n_total"]
    for u, grp in df.groupby("u"):
        for c in cats:
            assert out.loc[u, f"n_{c}"] == int((grp["c"] == c).sum())
        assert out.loc[u, "n_total"] == len(grp)
    assert out["n_total"].sum() == 997


def _brute_hh(texts: list[str], k: int) -> pd.Series:
    toks = pd.Series(texts).str.split(" ").explode()
    toks = toks[toks != ""].dropna()
    counts = toks.value_counts()
    return counts[counts * k > counts.sum()].sort_index()


def test_term_heavy_hitters_both_paths_match_brute_force():
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(50)]
    # Zipf-ish: w0/w1 dominate, long tail of rares
    weights = np.array([1.0 / (i + 1) ** 1.5 for i in range(50)])
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(5, 40), p=weights))
        for _ in range(400)
    ]
    docs = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(11)
    expected = _brute_hh(texts, k=20)
    got_bc = (
        text.term_heavy_hitters(docs, k=20)
        .to_pandas()
        .set_index("term")["n"]
        .sort_index()
    )
    assert got_bc.to_dict() == expected.to_dict()
    # semi-join tier (broadcast_cap=0 forces it) must be row-identical
    got_sj = (
        text.term_heavy_hitters(docs, k=20, broadcast_cap=0)
        .to_pandas()
        .set_index("term")["n"]
        .sort_index()
    )
    assert got_sj.to_dict() == expected.to_dict()
    assert len(expected) > 0  # the test must actually exercise the gate


def _brute_pit(points: pd.DataFrame, versions: pd.DataFrame) -> pd.Series:
    out = {}
    for _, p in points.iterrows():
        vs = versions[
            (versions["k"] == p["k"]) & (versions["ts"] <= p["ts"])
        ].sort_values("ts")
        out[p["id"]] = vs.iloc[-1]["val"] if len(vs) else None
    return pd.Series(out)


def test_point_in_time_join_exact_semantics_and_null_before_first():
    versions = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "ts": pd.to_datetime(["2024-01-10", "2024-01-20", "2024-01-15"]),
            "val": ["a1", "a2", "b1"],
        }
    )
    points = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b", "b"],
            "ts": pd.to_datetime(
                [
                    "2024-01-05",  # before first version -> NULL
                    "2024-01-10",  # exactly AT valid_from -> a1
                    "2024-01-19",  # inside [a1, a2) -> a1
                    "2024-01-20",  # exactly at the change -> a2
                    "2024-01-14",  # before b's first -> NULL
                    "2024-02-01",  # open interval -> b1
                ]
            ),
            "id": [1, 2, 3, 4, 5, 6],
        }
    )
    out = (
        events.point_in_time_join(
            ray.data.from_pandas(points),
            ray.data.from_pandas(versions),
            "k",
            "ts",
            "id",
            "val",
        )
        .to_pandas()
        .set_index("id")["val_at_ts"]
    )
    assert out.to_dict() == {
        1: None, 2: "a1", 3: "a1", 4: "a2", 5: None, 6: "b1"
    }


def test_point_in_time_join_hot_key_many_blocks():
    """One key holds ~90% of points across many sorted blocks; versions are
    sparse, so most blocks have NO in-block version and every such block's
    edge rows resolve via broadcast summaries — no single-task funnel."""
    rng = np.random.RandomState(11)
    n = 6000
    pts = pd.DataFrame(
        {
            "k": np.where(rng.rand(n) < 0.9, "hot", "cold"),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
            "id": np.arange(n),
        }
    )
    vers = pd.DataFrame(
        {
            "k": ["hot", "hot", "hot", "cold"],
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([10_000, 400_000, 800_000, 500_000], unit="s"),
            "val": ["h1", "h2", "h3", "c1"],
        }
    )
    out = (
        events.point_in_time_join(
            ray.data.from_pandas(pts).repartition(16),
            ray.data.from_pandas(vers),
            "k",
            "ts",
            "id",
            "val",
        )
        .to_pandas()
        .set_index("id")["val_at_ts"]
        .sort_index()
    )
    expected = _brute_pit(pts, vers).sort_index()
    assert out.to_dict() == expected.to_dict()


def _brute_lpa(edges: list[tuple[str, str]], rounds: int) -> dict[str, str]:
    from collections import Counter, defaultdict

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    labels = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v in nbrs:
            c = Counter(labels[u] for u in nbrs[v])
            new[v] = min(
                c, key=lambda lbl: (-c[lbl], lbl)
            )  # count desc, label asc
        labels = new
    return labels


def test_label_propagation_two_communities():
    # two triangles joined by one bridge edge: LPA should settle each
    # triangle on its own min label
    e = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a3", "b1"),
    ]
    from multiomics_biocypher_kg_ray.stages import graph

    ds = ray.data.from_pandas(
        pd.DataFrame({"src": [x for x, _ in e], "dst": [y for _, y in e]})
    ).repartition(3)
    out = (
        graph.label_propagation(ds, rounds=3)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    assert out == _brute_lpa(e, rounds=3)
    # and it actually split the graph into the two triangles
    assert len({v for k, v in out.items() if k.startswith("a")}) == 1
    assert len({v for k, v in out.items() if k.startswith("b")}) == 1


def test_cube_agg_matches_pandas_margins():
    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y"], 500),
            "b": rng.choice(["p", "q", "r"], 500),
            "v": rng.randint(0, 1000, 500).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    out = relational.cube_agg(ds, ["a", "b"], ["v"]).to_pandas()
    assert len(out) == (
        df.groupby(["a", "b"]).ngroups
        + df["a"].nunique()
        + df["b"].nunique()
        + 1
    )
    # finest
    fin = out.dropna(subset=["a", "b"]).set_index(["a", "b"])
    exp = df.groupby(["a", "b"])["v"].agg(["size", "sum"])
    for idx, row in exp.iterrows():
        assert fin.loc[idx, "n"] == row["size"]
        assert fin.loc[idx, "v"] == row["sum"]
    # margin over b (a kept), margin over a (b kept), grand total
    ma = out[out["b"].isna() & out["a"].notna()].set_index("a")
    for a, grp in df.groupby("a"):
        assert ma.loc[a, "v"] == grp["v"].sum() and ma.loc[a, "n"] == len(grp)
    mb = out[out["a"].isna() & out["b"].notna()].set_index("b")
    for b, grp in df.groupby("b"):
        assert mb.loc[b, "v"] == grp["v"].sum() and mb.loc[b, "n"] == len(grp)
    gt = out[out["a"].isna() & out["b"].isna()]
    assert len(gt) == 1
    assert gt["n"].iloc[0] == 500 and gt["v"].iloc[0] == df["v"].sum()


def test_hopping_distinct_count_brute_force():
    rng = np.random.RandomState(9)
    n = 2000
    df = pd.DataFrame(
        {
            "t": rng.choice(["a", "b"], n),
            "u": rng.randint(0, 40, n).astype("int64"),
            "ts": pd.to_datetime("2024-03-01")
            + pd.to_timedelta(rng.randint(0, 86_400, n), unit="s"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    out = (
        events.hopping_distinct_count(
            ds, ["t"], "u", ts_col="ts", window_s=3600, hop_s=900, out_col="nu"
        )
        .to_pandas()
        .set_index(["t", "window_start"])["nu"]
        .sort_index()
    )
    hop = pd.Timedelta(seconds=900)
    rows = {}
    for j in range(4):
        w = df["ts"].dt.floor("900s") - j * hop
        for (t, ws), grp in df.groupby([df["t"], w]):
            rows[(t, ws)] = rows.get((t, ws), set()) | set(grp["u"])
    expected = pd.Series({k: len(v) for k, v in rows.items()}).sort_index()
    assert out.to_dict() == expected.to_dict()


def test_ntile_over_matches_sql_rule_including_remainders():
    # group sizes 7 and 4 with k=3: tiles of (3,2,2) and (2,1,1)
    df = pd.DataFrame(
        {
            "g": ["a"] * 7 + ["b"] * 4,
            "v": list(range(7)) + list(range(4)),
            "id": list(range(11)),
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = (
        relational.ntile_over(ds, ["g"], [("v", True), ("id", True)], k=3)
        .to_pandas()
        .sort_values(["g", "v"])
    )
    assert out[out["g"] == "a"]["ntile"].tolist() == [1, 1, 1, 2, 2, 3, 3]
    assert out[out["g"] == "b"]["ntile"].tolist() == [1, 1, 2, 3]
    # percent_rank ppm: (rank-1)*1e6 // (n-1)
    a = out[out["g"] == "a"]["pct_rank_ppm"].tolist()
    assert a == [(r * 1_000_000) // 6 for r in range(7)]
    # single-row group -> ppm 0
    one = ray.data.from_pandas(
        pd.DataFrame({"g": ["z"], "v": [5], "id": [0]})
    )
    o1 = relational.ntile_over(one, ["g"], [("v", True)], k=4).to_pandas()
    assert o1["ntile"].tolist() == [1] and o1["pct_rank_ppm"].tolist() == [0]


def test_interval_overlap_join_brute_force_with_ownership_dedup():
    from multiomics_biocypher_kg_ray.stages.joins import interval_overlap_join

    rng = np.random.RandomState(13)
    nl, nr = 300, 80
    # long left intervals spanning many buckets; short right intervals
    ls = rng.randint(0, 50_000, nl).astype("int64")
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], nl),
            "lid": np.arange(nl),
            "ls": ls * 1_000_000,
            "le": (ls + rng.randint(1, 5000, nl)) * 1_000_000,
        }
    )
    rs = rng.randint(0, 50_000, nr).astype("int64")
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], nr),
            "rid": np.arange(nr),
            "rs": rs * 1_000_000,
            "re": (rs + rng.randint(0, 300, nr)) * 1_000_000,  # incl. empty
        }
    )
    out = (
        interval_overlap_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(3),
            ["k"],
            "ls",
            "le",
            "rs",
            "re",
            bucket_s=600,  # left spans many buckets
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    m = left.merge(right, on="k")
    m = m[(m["ls"] < m["re"]) & (m["rs"] < m["le"])]
    exp = m.assign(
        overlap_us=np.minimum(m["le"], m["re"]) - np.maximum(m["ls"], m["rs"])
    ).sort_values(["lid", "rid"]).reset_index(drop=True)
    assert len(out) == len(exp), (len(out), len(exp))
    # exactly once per pair (ownership dedup) and exact overlap lengths
    assert out[["lid", "rid", "overlap_us"]].values.tolist() == exp[
        ["lid", "rid", "overlap_us"]
    ].values.tolist()
    assert len(exp) > 50  # non-trivial


def test_sorted_neighborhood_pairs_brute_force():
    from multiomics_biocypher_kg_ray.stages import dedup

    rng = np.random.RandomState(17)
    n = 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "g": rng.choice(["en", "fr"], n),
            "sz": rng.randint(0, 30, n).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    w = 5
    out = (
        dedup.sorted_neighborhood_pairs(ds, ["g", "sz"], id_col="doc_id", w=w)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    r = df.sort_values(["g", "sz", "doc_id"]).reset_index(drop=True)
    exp = []
    for i in range(n):
        for j in range(i + 1, min(i + w, n)):
            a, b = int(r.loc[i, "doc_id"]), int(r.loc[j, "doc_id"])
            exp.append((min(a, b), max(a, b), j - i))
    exp = pd.DataFrame(exp, columns=["doc_a", "doc_b", "idx_dist"]).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)
    assert out.values.tolist() == exp.values.tolist()


def test_bloom_prefilter_join_identical_to_plain_join():
    from multiomics_biocypher_kg_ray.stages.joins import bloom_prefilter_join

    rng = np.random.RandomState(23)
    big = pd.DataFrame(
        {"k": rng.randint(0, 10_000, 5000).astype("int64"), "x": np.arange(5000)}
    )
    small = pd.DataFrame(
        {"k": rng.choice(10_000, 200, replace=False).astype("int64"),
         "tag": [f"t{i}" for i in range(200)]}
    )
    out = (
        bloom_prefilter_join(
            ray.data.from_pandas(big).repartition(8),
            ray.data.from_pandas(small).repartition(2),
            on="k",
        )
        .to_pandas()
        .sort_values(["x"])
        .reset_index(drop=True)
    )
    exp = big.merge(small, on="k").sort_values(["x"]).reset_index(drop=True)
    assert len(out) == len(exp)
    assert out[["k", "x", "tag"]].values.tolist() == exp[
        ["k", "x", "tag"]
    ].values.tolist()
