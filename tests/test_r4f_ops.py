"""Edge cases for the session-5 round-4 operators — LOO encoding singleton
groups, zero-variance slopes, assortativity/clustering on known graphs, the
DESeq complete-matrix filter, and quantile normalization vs a brute-force
numpy reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.graph import (
    clustering_coefficient,
    degree_assortativity,
)
from multiomics_biocypher_kg_ray.stages.relational import (
    group_slope,
    loo_group_mean,
    median_log_ratio_factors,
    quantile_normalize,
)


def _ds(df: pd.DataFrame, blocks: int = 4):
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(blocks)


def _edges(pairs):
    return ray.data.from_arrow(
        pa.table(
            {"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]}
        )
    ).repartition(3)


def test_loo_singleton_group_is_null():
    df = pd.DataFrame({"k": ["a", "a", "a", "b"], "v": [10, 20, 33, 7]})
    out = (
        loo_group_mean(_ds(df), ["k"], "v", out_col="loo")
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    # group a: loo mean of the OTHER two, floored
    assert out.loc[0, "loo"] == (20 + 33) // 2
    assert out.loc[1, "loo"] == (10 + 33) // 2
    assert out.loc[2, "loo"] == (10 + 20) // 2
    assert out.loc[3, "loo_n"] == 0 and pd.isna(out.loc[3, "loo"])


def test_group_slope_zero_variance_null_and_known_line():
    # key 'flat': all x equal -> NULL; key 'line': y = 3x + 1 exactly
    df = pd.DataFrame(
        {
            "k": ["flat"] * 3 + ["line"] * 4,
            "x": [5, 5, 5, 0, 1, 2, 3],
            "y": [1, 2, 3, 1, 4, 7, 10],
        }
    )
    out = group_slope(_ds(df), ["k"], "x", "y").to_pandas().set_index("k")
    assert pd.isna(out.loc["flat", "slope_q"])
    assert out.loc["line", "slope_q"] == 3_000_000


def test_assortativity_star_is_minus_one_and_regular_is_null():
    star = _edges([("h", "a"), ("h", "b"), ("h", "c")])
    out = degree_assortativity(star).to_pandas()
    assert len(out) == 1 and out.loc[0, "n"] == 6
    assert out.loc[0, "assort_ppm"] == -1_000_000
    tri = _edges([("a", "b"), ("b", "c"), ("c", "a")])
    out2 = degree_assortativity(tri).to_pandas()
    assert len(out2) == 1 and pd.isna(out2.loc[0, "assort_ppm"])


def test_clustering_coefficient_triangle_and_path():
    tri = _edges([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    out = clustering_coefficient(tri).to_pandas().set_index("node")
    # a, b: degree 2, one triangle -> cc = 1
    assert out.loc["a", "cc_ppm"] == 1_000_000
    assert out.loc["b", "cc_ppm"] == 1_000_000
    # c: degree 3, one triangle of 3 possible pairs -> 1/3
    assert out.loc["c", "cc_ppm"] == 2_000_000 // 6
    assert "d" not in out.index  # degree 1 excluded


def test_size_factors_excludes_incomplete_genes():
    # gene g2 missing from sample s2 -> only g1, g3 participate
    df = pd.DataFrame(
        {
            "gene": ["g1", "g1", "g2", "g3", "g3"],
            "sample": ["s1", "s2", "s1", "s1", "s2"],
            "cnt": [4, 8, 100, 9, 3],
        }
    )
    out = (
        median_log_ratio_factors(_ds(df), ["gene"], "sample", "cnt")
        .to_pandas()
        .set_index("sample")
    )
    assert (out["n_genes"] == 2).all()
    q = lambda c: int(np.floor(np.log(float(c)) * 1e6))
    # scaled log ratios: qln*2 - (qln_s1 + qln_s2) per gene; median of 2 = lower
    lr_s1 = sorted([q(4) * 2 - (q(4) + q(8)), q(9) * 2 - (q(9) + q(3))])
    assert out.loc["s1", "med_lr_scaled"] == lr_s1[0]


def test_quantile_normalize_matches_bruteforce():
    rng = np.random.RandomState(7)
    genes = [f"g{i}" for i in range(30)]
    rows = []
    for s in ["s1", "s2", "s3"]:
        for g in genes:
            rows.append((g, s, int(rng.randint(1, 50))))
    # an incomplete gene that must be dropped
    rows.append(("gX", "s1", 5))
    df = pd.DataFrame(rows, columns=["gene", "sample", "v"])
    out = (
        quantile_normalize(_ds(df, 5), ["gene"], "sample", "v", out_col="nv")
        .to_pandas()
        .sort_values(["sample", "gene"])
        .reset_index(drop=True)
    )
    assert "gX" not in set(out["gene"])
    f = df[df["gene"] != "gX"].copy()
    f = f.sort_values(["sample", "v", "gene"]).reset_index(drop=True)
    f["rnk"] = f.groupby("sample").cumcount() + 1
    ref = f.groupby("rnk")["v"].sum() // 3
    f["nv"] = f["rnk"].map(ref)
    f = f.sort_values(["sample", "gene"]).reset_index(drop=True)
    assert (out["nv"].to_numpy() == f["nv"].to_numpy()).all()
    assert (out["rnk"].to_numpy() == f["rnk"].to_numpy()).all()


def test_mann_whitney_known_case_and_complement():
    from multiomics_biocypher_kg_ray.stages.relational import mann_whitney_u

    # A = [1, 2, 2], B = [2, 3]: with ties counted half,
    # U_A = #(a>b) + ties/2 = 0 + 1 = 1  ->  u2 = 2
    df = pd.DataFrame(
        {"g": ["A", "A", "A", "B", "B"], "v": [1, 2, 2, 2, 3]}
    )
    out = mann_whitney_u(_ds(df, 3), "g", "v").to_pandas().set_index("g")
    assert out.loc["A", "u2"] == 2
    assert out.loc["B", "u2"] == 2 * 3 * 2 - 2  # complement: u2A + u2B = 2 n1 n2
    assert out.loc["A", "auc_ppm"] == (2 * 1_000_000) // (2 * 3 * 2)
