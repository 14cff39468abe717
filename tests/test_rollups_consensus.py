"""Unit tests for the A7/A8/A11/A13/M16 rollup operators and the
embedding-cosine near-dup / IVF similarity variants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.stages.relational import (
    categorical_distribution,
    flag_counts,
    majority_vote,
    replicate_stats,
    tree_rollup,
)
from multiomics_biocypher_kg_ray.stages.similarity import (
    embedding_near_dup_pairs,
    knn_bruteforce,
    knn_ivf,
)


def test_majority_vote_counts_and_tiebreak():
    ds = ray.data.from_items(
        [{"g": "a", "v": "x"}] * 3
        + [{"g": "a", "v": "y"}] * 2
        + [{"g": "b", "v": "q"}]
        + [{"g": "b", "v": "p"}]  # tie in b → lexicographically smaller wins
    )
    out = (
        majority_vote(ds, ["g"], "v", "consensus")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert list(out["consensus"]) == ["x", "p"]
    assert list(out["n_votes"]) == [3, 1]


def test_replicate_stats_statuses_and_moments():
    ds = ray.data.from_items(
        [{"g": "det", "c": v} for v in (10, 20, 30)]
        + [{"g": "spor", "c": v} for v in (0, 5, 0)]
        + [{"g": "none", "c": 0}, {"g": "none", "c": 0}]
        + [{"g": "single", "c": 7}]
    )
    out = replicate_stats(ds, ["g"], "c").to_pandas().set_index("g")
    assert out.loc["det", "detection_status"] == "detected"
    assert out.loc["spor", "detection_status"] == "sporadic"
    assert out.loc["none", "detection_status"] == "not_detected"
    assert out.loc["det", "mean_v"] == 20.0
    assert out.loc["det", "sd_v"] == 10.0  # sample sd of (10,20,30)
    assert out.loc["single", "sd_v"] == 0.0  # n == 1 sentinel, not NaN
    assert out.loc["spor", "n_non_zero"] == 1 and out.loc["spor", "n"] == 3


def test_categorical_distribution_parallel_sorted_arrays():
    ds = ray.data.from_items(
        [{"g": 1, "v": "b"}, {"g": 1, "v": "a"}, {"g": 1, "v": "b"}, {"g": 2, "v": "z"}]
    )
    out = categorical_distribution(ds, ["g"], "v").to_pandas().set_index("g")
    assert out.loc[1, "labels"] == "a,b" and out.loc[1, "counts"] == "1,2"
    assert out.loc[2, "labels"] == "z" and out.loc[2, "counts"] == "1"


def test_flag_counts():
    ds = ray.data.from_items(
        [{"g": "u", "f": True}] * 3 + [{"g": "u", "f": False}] + [{"g": "w", "f": False}]
    )
    out = flag_counts(ds, ["g"], "f").to_pandas().set_index("g")
    assert out.loc["u", "n_true"] == 3 and out.loc["u", "n_false"] == 1
    assert out.loc["w", "n_true"] == 0 and out.loc["w", "n_false"] == 1


def test_tree_rollup_counts_leaves_per_ancestor():
    # tree: root → {left, right}; leaves keyed 1..3 under left, 4 under right
    closure = pd.DataFrame(
        {
            "leaf": [1, 2, 3, 4] + [1, 2, 3, 4],
            "node_id": ["left"] * 3 + ["right"] + ["root"] * 4,
            "node_level": [1] * 4 + [0] * 4,
        }
    )
    ds = ray.data.from_items([{"leaf": i} for i in (1, 1, 2, 3, 4)])
    out = tree_rollup(ds, "leaf", closure).to_pandas().set_index("node_id")
    assert out.loc["left", "n_leaves"] == 4  # leaf 1 counted twice
    assert out.loc["right", "n_leaves"] == 1
    assert out.loc["root", "n_leaves"] == 5


def _embeddings(n=80, dim=16, seed=11):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [rng.normal(size=dim).astype(np.float64) for _ in range(n)],
        }
    )


def test_embedding_near_dups_match_numpy_and_emit_each_pair_once():
    df = _embeddings()
    # plant one true near-duplicate pair
    df.at[1, "embedding"] = df.at[0, "embedding"] + 0.01
    ds = ray.data.from_pandas(df)
    out = embedding_near_dup_pairs(ds, df, threshold=0.9).to_pandas()
    assert ((0, 1) in set(zip(out["id_a"], out["id_b"])))
    assert (out["id_a"] < out["id_b"]).all()
    assert not out.duplicated(["id_a", "id_b"]).any()
    # exact parity with a direct numpy all-pairs computation
    m = np.stack(df["embedding"].to_numpy())
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = mn @ mn.T
    iu = np.triu_indices(len(df), 1)
    expected = {(int(a), int(b)) for a, b in zip(*iu) if s[a, b] >= 0.9}
    assert set(zip(out["id_a"], out["id_b"])) == expected


def test_knn_ivf_recall_and_determinism():
    df = _embeddings(n=200)
    qdf = df[df["vec_id"] < 5]
    cands = ray.data.from_pandas(df[df["vec_id"] >= 5])
    exact = knn_bruteforce(cands, qdf, k=5).to_pandas()
    approx = knn_ivf(cands, qdf, k=5, n_clusters=4, n_probe=2).to_pandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    assert len(e & a) / len(e) >= 0.3  # probes half the lists
    approx2 = knn_ivf(cands, qdf, k=5, n_clusters=4, n_probe=2).to_pandas()
    pd.testing.assert_frame_equal(
        approx.sort_values(["query_id", "rank"]).reset_index(drop=True),
        approx2.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_top_k_per_group_presalt_identical_to_unsalted():
    import numpy as np
    from multiomics_biocypher_kg_ray.stages.relational import top_k_per_group

    rng = np.random.RandomState(5)
    rows = [
        {"g": f"g{int(i % 3)}", "v": float(rng.randint(0, 1000)), "id": int(i)}
        for i in range(500)
    ]
    ds = ray.data.from_items(rows)
    plain = (
        top_k_per_group(ds, ["g"], [("v", False), ("id", True)], k=7)
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    ds2 = ray.data.from_items(rows)
    salted = (
        top_k_per_group(ds2, ["g"], [("v", False), ("id", True)], k=7, presalt=8)
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted[plain.columns])


def test_ranked_over_hot_key_matches_pandas_reference():
    """One group ≫ one block: ranks must come from the sort+split-numbering
    path (no whole-group task materialization) and still equal the pandas
    window-function reference, including cross-block tie runs."""
    import pyarrow as pa

    from multiomics_biocypher_kg_ray.stages.relational import ranked_over

    rng = np.random.RandomState(11)
    n_hot = 50_000  # hot key: far larger than the 4096-row blocks below
    df = pd.DataFrame(
        {
            "k": ["hot"] * n_hot + ["cold"] * 64,
            # heavy ties (only 50 distinct values) exercise the tie-break
            "v": np.concatenate(
                [rng.randint(0, 50, size=n_hot), rng.randint(0, 5, size=64)]
            ),
            "id": np.arange(n_hot + 64),
        }
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    ).map_batches(lambda t: t, batch_size=4096, batch_format="pyarrow")

    out = (
        ranked_over(ds, ["k"], [("v", False), ("id", True)], rank_col="rank")
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    expect = df.copy()
    expect["rank"] = (
        expect.sort_values(["v", "id"], ascending=[False, True])
        .groupby("k")
        .cumcount()
        .add(1)
    )
    # align: groupby.cumcount follows the sorted order; re-sort both
    expect = expect.sort_values(["k", "id"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        out["rank"].astype("int64"), expect["rank"].astype("int64"), check_names=False
    )


def test_edge_rank_and_percentiles_on_skewed_groups():
    """edge_rank / percentile_buckets through the scale-safe path on a
    deliberately skewed predicate distribution."""
    from multiomics_biocypher_kg_ray.stages.materialize import edge_rank
    from multiomics_biocypher_kg_ray.stages.relational import percentile_buckets

    rows = []
    for i in range(3000):  # hot predicate
        rows.append({"src": f"s{i:05d}", "pred": "hot", "dst": f"d{i % 7}", "weight": i % 13})
    for i in range(5):
        rows.append({"src": f"s{i}", "pred": "rare", "dst": "d0", "weight": i})
    ds = ray.data.from_items(rows).map_batches(
        lambda t: t, batch_size=256, batch_format="pyarrow"
    )
    out = edge_rank(ds).to_pandas()
    df = pd.DataFrame(rows)
    expect = df.sort_values(
        ["pred", "weight", "src", "dst"], ascending=[True, False, True, True]
    )
    expect["rank"] = expect.groupby("pred").cumcount() + 1
    merged = out.merge(expect, on=["src", "pred", "dst", "weight"], suffixes=("", "_e"))
    assert (merged["rank"] == merged["rank_e"]).all()
    assert len(merged) == len(df)

    ev = ray.data.from_items(
        [{"event_id": i, "event_type": "hot" if i < 2900 else "cold", "value": float(i % 97)}
         for i in range(3000)]
    ).map_batches(lambda t: t, batch_size=128, batch_format="pyarrow")
    pb = percentile_buckets(ev, ["event_type"], "value", "event_id").to_pandas()
    assert len(pb) == 3000
    hot = pb[pb["event_type"] == "hot"]
    assert hot["rnk"].max() == 2900 and hot["rnk"].min() == 1
    assert set(pb["bucket"]) <= {"top10", "top25", "mid", "low"}
    # percentile integer math: top-ranked row of each group has pct 100
    assert (pb.loc[pb["rnk"] == 1, "pct"] == 100).all()
