import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.stages import sampling


def _docs(n=500):
    return pa.table({"k": pa.array(np.arange(n, dtype="int64")),
                     "grp": pa.array((np.arange(n) % 3).astype("str"))})


def test_hash_split_deterministic_across_partitioning():
    t = _docs()
    a = (
        sampling.hash_split(ray.data.from_arrow(t), "k", [("tr", 0.8), ("te", 0.2)])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    b = (
        sampling.hash_split(
            ray.data.from_arrow(t).repartition(7), "k", [("tr", 0.8), ("te", 0.2)]
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    frac = (a["split"] == "tr").mean()
    assert 0.7 < frac < 0.9  # ~0.8 modulo hash noise


def test_hash_split_key_stable_and_weights_normalized():
    # repeated keys land in one split; weights 8/2 == 0.8/0.2
    t = pa.table({"k": pa.array([1, 1, 1, 2, 2, 3] * 50, pa.int64())})
    out = sampling.hash_split(
        ray.data.from_arrow(t).repartition(5), "k", [("a", 8), ("b", 2)]
    ).to_pandas()
    per_key = out.groupby("k")["split"].nunique()
    assert (per_key == 1).all()


def test_deterministic_sample_is_subset_and_stable():
    ds = ray.data.from_arrow(_docs())
    s1 = set(sampling.deterministic_sample(ds, "k", 0.3).to_pandas()["k"])
    s2 = set(
        sampling.deterministic_sample(
            ray.data.from_arrow(_docs()).repartition(9), "k", 0.3
        ).to_pandas()["k"]
    )
    assert s1 == s2
    assert 0.2 < len(s1) / 500 < 0.4
    full = set(sampling.deterministic_sample(ds, "k", 1.0).to_pandas()["k"])
    assert full == set(range(500))
    assert sampling.deterministic_sample(ds, "k", 0.0).count() == 0


def test_stratified_sample_rates_per_stratum():
    out = sampling.stratified_sample(
        ray.data.from_arrow(_docs(3000)).repartition(4),
        "grp",
        "k",
        {"0": 1.0, "1": 0.0},
        default_rate=0.5,
    ).to_pandas()
    by = out.groupby("grp")["k"].count()
    assert by.get("0", 0) == 1000
    assert "1" not in by.index
    assert 350 < by.get("2", 0) < 650


def test_split_counts_rows_vs_keys():
    t = pa.table({"k": pa.array(np.repeat(np.arange(100, dtype="int64"), 3))})
    out = (
        sampling.split_counts(
            ray.data.from_arrow(t).repartition(6), "k", [("x", 0.5), ("y", 0.5)]
        )
        .to_pandas().set_index("split")
    )
    assert out["n_rows"].sum() == 300
    assert out["n_keys"].sum() == 100
    assert (out["n_rows"] == 3 * out["n_keys"]).all()


def test_near_dup_split_no_cluster_straddles_splits():
    from multiomics_biocypher_kg_ray.stages import dedup

    docs = ray.data.from_arrow(pa.table({"doc_id": np.arange(200, dtype="int64")}))
    # pair up (2i, 2i+1) -> 100 two-doc clusters
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": np.arange(0, 200, 2, dtype="int64"),
                "doc_b": np.arange(1, 200, 2, dtype="int64"),
            }
        )
    )
    clusters = dedup.near_dup_clusters(docs, pairs)
    out = sampling.hash_split(
        clusters.select_columns(["doc_id", "cluster_id"]),
        "cluster_id",
        [("train", 0.8), ("val", 0.2)],
    ).to_pandas()
    assert len(out) == 200
    # the leakage property: every cluster lands in exactly one split
    assert (out.groupby("cluster_id")["split"].nunique() == 1).all()
    assert out["split"].nunique() == 2


def test_hash_split_rejects_null_keys():
    # ADVICE r3: a NULL key would hash str(None) in the engine but fall to
    # the CASE ELSE in the SQL twin — reject instead of silently diverging.
    import pytest

    t = pa.table({"k": pa.array([1, None, 3], pa.int64())})
    with pytest.raises(Exception, match="null"):
        sampling.hash_split(
            ray.data.from_arrow(t), "k", [("a", 0.5), ("b", 0.5)]
        ).materialize()


def test_hash_split_rejects_unhashable_key_types():
    import pytest

    t = pa.table({"k": pa.array([1.5, 2.5])})
    with pytest.raises(Exception, match="integer and"):
        sampling.hash_split(
            ray.data.from_arrow(t), "k", [("a", 0.5), ("b", 0.5)]
        ).materialize()


def test_deterministic_sample_rejects_null_keys():
    import pytest

    t = pa.table({"k": pa.array(["a", None])})
    with pytest.raises(Exception, match="null"):
        sampling.deterministic_sample(ray.data.from_arrow(t), "k", 0.5).materialize()


def test_buckets_duckdb_matches_python_twin():
    """The DuckDB-vectorized bucket kernel must match the per-key Python md5
    reference bit-for-bit on int and string keys (incl. negatives, unicode,
    salt quoting)."""
    ints = pa.chunked_array(
        [pa.array([-5, -1, 0, 1, 7, 10**12], pa.int64()),
         pa.array(np.arange(1000, dtype="int64") * 37 - 500)]
    )
    got = sampling._buckets(ints, "sa'lt")
    ref = sampling._buckets_py(ints.to_pylist(), "sa'lt")
    assert np.array_equal(got, ref)

    strs = pa.array(["", "a", "doc-42", "naïve café", "tab\there", "a:b:c"])
    assert np.array_equal(
        sampling._buckets(strs, "split"),
        sampling._buckets_py(strs.to_pylist(), "split"),
    )


def test_hash_split_property_engine_matches_oracle():
    """Hypothesis sweep of the engine↔oracle row identity across weight
    vectors that do NOT sum to 1, PRECISION-boundary weights, and int/str
    keys (ADVICE r3: integer threshold edges)."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    from multiomics_biocypher_kg_ray.oracle_rel import _split_case

    keys = pa.table(
        {"k": pa.array(np.arange(-200, 800, dtype="int64") * 9176 + 13)}
    )

    @settings(max_examples=25, deadline=None)
    @given(
        weights=st.lists(
            st.one_of(
                st.floats(min_value=1e-7, max_value=10.0, allow_nan=False),
                st.sampled_from([1e-7, 0.5, 1.0, 1.0 - 1e-7, 3.0]),
            ),
            min_size=1,
            max_size=5,
        ),
        salt=st.sampled_from(["split", "s2", "x:y"]),
    )
    def check(weights, salt):
        splits = [(f"s{i}", w) for i, w in enumerate(weights)]
        cuts = sampling._thresholds(splits)
        his = np.array([hi for _, hi in cuts], dtype=np.int64)
        b = sampling._buckets(keys["k"], salt)
        got = np.array([cuts[i][0] for i in np.searchsorted(his, b, side="right")])
        con = duckdb.connect()
        con.register("t", keys)
        ora = (
            con.execute(f"SELECT {_split_case('k', splits, salt)} AS s FROM t")
            .arrow()["s"]
            .to_pylist()
        )
        assert list(got) == ora

    check()


def test_group_cap_caps_hot_group_and_is_deterministic():
    """One hot group (800 rows) plus small groups; survivors per group <=
    cap, small groups pass through whole, and the kept set is identical
    across different partitionings (priority is a pure key function)."""
    n_hot, cap = 800, 5
    ids = np.arange(n_hot + 12, dtype="int64")
    grp = np.where(ids < n_hot, "hot", "cold")
    tbl = pa.table({"doc_id": ids, "grp": pa.array(grp.tolist())})

    def run(parallelism):
        ds = ray.data.from_arrow(tbl).repartition(parallelism)
        out = sampling.group_cap(ds, ["grp"], "doc_id", cap).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    counts = a.groupby("grp").size()
    assert counts["hot"] == cap  # hot domain capped
    assert counts["cold"] == cap  # 12 cold rows also capped to 5
    # survivors are the cap lowest md5-priority keys, ties by key
    pr = sampling._buckets(tbl["doc_id"], "cap")
    order = np.lexsort((ids, pr))
    want_hot = sorted(ids[order][grp[order] == "hot"][:cap])
    assert sorted(a[a.grp == "hot"].doc_id) == want_hot


def test_group_cap_rejects_bad_cap():
    import pytest

    ds = ray.data.from_arrow(pa.table({"k": [1], "g": ["a"]}))
    with pytest.raises(ValueError):
        sampling.group_cap(ds, ["g"], "k", 0)


def test_mixture_sample_hits_target_shares_and_is_deterministic():
    """Skewed input (70/20/10) resampled toward 1:1:2 — the binding stratum
    keeps all rows, others downsample, output mixture ≈ target, and the kept
    set is identical across partitionings."""
    rng = np.random.RandomState(7)
    langs = np.concatenate([["en"] * 7000, ["de"] * 2000, ["fr"] * 1000])
    ids = np.arange(len(langs), dtype="int64")
    tbl = pa.table({"doc_id": ids, "lang": pa.array(langs.tolist())})
    shares = {"en": 1.0, "de": 1.0, "fr": 2.0}
    # T = min(7000/1, 2000/1, 1000/2) = 500 → en keeps 500, de 500, fr 1000

    def run(parallelism):
        ds = ray.data.from_arrow(tbl).repartition(parallelism)
        out = sampling.mixture_sample(ds, "lang", "doc_id", shares).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    a, b = run(1), run(6)
    pd.testing.assert_frame_equal(a, b)
    got = a.groupby("lang").size()
    assert got["fr"] == 1000  # binding stratum: kept whole
    # md5 buckets are uniform-ish; 500-row targets land within ±12%
    assert abs(got["en"] - 500) < 60 and abs(got["de"] - 500) < 60
    # absent-strata drop: nothing outside the share map survives
    assert set(got.index) == {"en", "de", "fr"}


def test_mixture_sample_drops_unlisted_strata_and_rejects_empty():
    import pytest

    tbl = pa.table({"k": [1, 2, 3], "s": ["a", "a", "b"]})
    ds = ray.data.from_arrow(tbl)
    out = sampling.mixture_sample(ds, "s", "k", {"a": 1.0}).to_pandas()
    assert set(out["s"]) <= {"a"} and len(out) == 2
    with pytest.raises(ValueError):
        sampling.mixture_sample(ds, "s", "k", {"zz": 1.0}).to_pandas()


def test_shuffle_positions_is_a_permutation_and_parallelism_stable():
    ids = np.arange(4000, dtype="int64") * 7 + 3
    tbl = pa.table({"doc_id": ids})

    def run(parallelism):
        ds = ray.data.from_arrow(tbl).repartition(parallelism)
        out = sampling.shuffle_positions(ds, "doc_id").to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    a, b = run(1), run(9)
    pd.testing.assert_frame_equal(a, b)
    assert sorted(a["shuffle_pos"]) == list(range(len(ids)))
    # the order is a genuine shuffle, not key order (astronomically unlikely
    # to hold for md5 order): positions decorrelate from the sorted-key rank
    disp = np.abs(a["shuffle_pos"].to_numpy() - np.arange(len(ids)))
    assert np.median(disp) > len(ids) // 10
    # different salt = different epoch order
    c = (
        sampling.shuffle_positions(ray.data.from_arrow(tbl), "doc_id", salt="ep2")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (c["shuffle_pos"] != a["shuffle_pos"]).mean() > 0.99


def test_hash60_duckdb_matches_python_twin():
    keys = pa.chunked_array([pa.array([1, 2, 3, 10**12, -5]), pa.array([7, 8])])
    got = sampling._hash60(keys, "s")
    want = sampling._hash60_py(keys.to_pylist(), "s")
    assert (got == want).all()
    assert (got >= 0).all()


def test_distinct_kmv_exact_below_k_and_accurate_above():
    rng = np.random.RandomState(7)
    # group "small": 40 distinct values (< k=64) -> exact count
    # group "big": 5000 distinct values -> estimate within ~3/sqrt(k)
    vals = np.concatenate(
        [rng.randint(0, 40, size=300), 100 + rng.randint(0, 5000, size=20000)]
    ).astype("int64")
    grps = np.array(["small"] * 300 + ["big"] * 20000)
    t = pa.table({"g": pa.array(grps), "v": pa.array(vals)})
    out = (
        sampling.distinct_kmv(
            ray.data.from_arrow(t).repartition(5), ["g"], "v", k=64
        )
        .to_pandas()
        .set_index("g")
    )
    true_small = len(np.unique(vals[:300]))
    true_big = len(np.unique(vals[300:]))
    assert out.loc["small", "distinct_est"] == true_small
    assert out.loc["small", "n_kept"] == true_small
    assert out.loc["big", "n_kept"] == 64
    rel_err = abs(out.loc["big", "distinct_est"] - true_big) / true_big
    assert rel_err < 3.0 / np.sqrt(64)


def test_distinct_kmv_partition_invariant():
    rng = np.random.RandomState(11)
    t = pa.table(
        {
            "g": pa.array(rng.choice(["a", "b"], size=3000)),
            "v": pa.array(rng.randint(0, 900, size=3000).astype("int64")),
        }
    )
    a = (
        sampling.distinct_kmv(ray.data.from_arrow(t), ["g"], "v", k=32)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    b = (
        sampling.distinct_kmv(ray.data.from_arrow(t).repartition(9), ["g"], "v", k=32)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_importance_sample_rate_tracks_weight_and_is_partition_invariant():
    n = 20000
    keys = np.arange(n, dtype="int64")
    # half the rows get 10% acceptance, half get 90%
    w = np.where(keys % 2 == 0, 100_000, 900_000).astype("int64")
    t = pa.table({"k": pa.array(keys), "w_ppm": pa.array(w)})
    a = (
        sampling.importance_sample(ray.data.from_arrow(t), "k", "w_ppm")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    b = (
        sampling.importance_sample(
            ray.data.from_arrow(t).repartition(9), "k", "w_ppm"
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    lo = (a["w_ppm"] == 100_000).sum() / (n / 2)
    hi = (a["w_ppm"] == 900_000).sum() / (n / 2)
    assert 0.08 < lo < 0.12 and 0.87 < hi < 0.93


def test_split_balance_audit_shares_sum_and_targets():
    from multiomics_biocypher_kg_ray.stages.sampling import (
        split_balance_audit,
        split_target_ppm,
    )

    t = pa.table(
        {
            "doc_id": pa.array(range(400), pa.int64()),
            "lang": pa.array(["en" if i % 4 else "fr" for i in range(400)]),
        }
    )
    splits = [("train", 0.8), ("val", 0.2)]
    out = split_balance_audit(
        ray.data.from_arrow(t).repartition(4), "doc_id", ["lang"], splits
    ).to_pandas()
    tgt = split_target_ppm(splits)
    assert tgt == {"train": 800_000, "val": 200_000}
    # every (lang, split) row is consistent: share = n*1e6 // total
    for _, r in out.iterrows():
        assert r["share_ppm"] == r["n"] * 1_000_000 // r["stratum_total"]
        assert r["dev_ppm"] == r["share_ppm"] - tgt[r["split"]]
    # per-lang totals match the lang cardinalities
    per = out.groupby("lang")["n"].sum()
    assert per["en"] == 300 and per["fr"] == 100
