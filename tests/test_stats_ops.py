"""Round-4 session-6 statistics operators — Spearman rank correlation vs a
pandas-rank reference (ties, perfect monotone, anti-monotone, constant
column) and the exact two-sample KS statistic vs a brute-force ECDF sweep."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.relational import (
    group_spearman,
    ks_two_sample,
)


def _ds(df: pd.DataFrame, blocks: int = 4):
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(blocks)


def _spearman_ref(x: np.ndarray, y: np.ndarray) -> int | None:
    # doubled pandas midranks + the engine/oracle's exact moment-form and
    # promote-then-multiply double op order (incl. its floor quantization)
    mx = (2 * pd.Series(x).rank(method="average").to_numpy()).astype(np.int64)
    my = (2 * pd.Series(y).rank(method="average").to_numpy()).astype(np.int64)
    n = np.float64(len(mx))
    sx, sy = np.float64(mx.sum()), np.float64(my.sum())
    sxx = np.float64((mx * mx).sum())
    syy = np.float64((my * my).sum())
    sxy = np.float64((mx * my).sum())
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if not (vx > 0.0 and vy > 0.0):
        return None
    return int(np.floor(((n * sxy - sx * sy) * 1e6) / (np.sqrt(vx) * np.sqrt(vy))))


def test_spearman_perfect_monotone_and_inverse():
    # nonlinear but strictly monotone -> rho exactly +1 / -1
    x = np.array([1, 2, 3, 4, 5, 6], np.int64)
    df = pd.DataFrame(
        {
            "g": ["up"] * 6 + ["down"] * 6,
            "x": np.concatenate([x, x]),
            "y": np.concatenate([x**3, (100 - x) ** 2]),
        }
    )
    out = group_spearman(_ds(df, 3), "g", "x", "y").to_pandas().set_index("g")
    # floor quantization of the double ratio: exact +1 floors to 10⁶, exact
    # −1 may floor to −10⁶−1 when sqrt(vx)·sqrt(vy) rounds below |cov|
    assert out.loc["up", "spearman_ppm"] == 1_000_000
    assert out.loc["down", "spearman_ppm"] in (-1_000_000, -1_000_001)
    assert out.loc["down", "spearman_ppm"] == _spearman_ref(
        x, (100 - x) ** 2
    )
    assert (out["n"] == 6).all()


def test_spearman_ties_match_pandas_midrank_reference():
    rng = np.random.default_rng(7)
    rows = []
    for g in ["a", "b", "c"]:
        x = rng.integers(0, 8, 40)  # heavy ties
        y = x * 2 + rng.integers(0, 5, 40)
        rows.append(pd.DataFrame({"g": g, "x": x, "y": y}))
    df = pd.concat(rows, ignore_index=True)
    out = group_spearman(_ds(df, 5), "g", "x", "y").to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        ref = _spearman_ref(sub["x"].to_numpy(), sub["y"].to_numpy())
        assert int(out.loc[g, "spearman_ppm"]) == ref, g


def test_spearman_constant_column_is_null():
    df = pd.DataFrame({"g": ["k"] * 5, "x": [1, 2, 3, 4, 5], "y": [9] * 5})
    out = group_spearman(_ds(df, 2), "g", "x", "y").to_pandas()
    assert len(out) == 1 and pd.isna(out.loc[0, "spearman_ppm"])


def _ks_ref(a: np.ndarray, b: np.ndarray) -> tuple[int, int]:
    vals = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), vals, side="right")
    cb = np.searchsorted(np.sort(b), vals, side="right")
    d = np.max(np.abs(ca * len(b) - cb * len(a)))
    ppm = int(np.floor(float(d) * 1e6 / (len(a) * len(b))))
    return int(d), ppm


def test_ks_identical_and_disjoint_distributions():
    a = np.array([1, 2, 3, 4], np.int64)
    df_same = pd.DataFrame(
        {"g": ["A"] * 4 + ["B"] * 4, "v": np.concatenate([a, a])}
    )
    out = ks_two_sample(_ds(df_same, 3), "g", "v", "A", "B").to_pandas()
    assert out.loc[0, "d_num"] == 0 and out.loc[0, "d_ppm"] == 0

    df_disj = pd.DataFrame(
        {"g": ["A"] * 4 + ["B"] * 4, "v": [1, 2, 3, 4, 10, 11, 12, 13]}
    )
    out = ks_two_sample(_ds(df_disj, 3), "g", "v", "A", "B").to_pandas()
    # fully separated -> D = 1 -> d_num = n_a * n_b
    assert out.loc[0, "d_num"] == 16 and out.loc[0, "d_ppm"] == 1_000_000


def test_ks_ties_and_unequal_sizes_match_bruteforce():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 20, 57)
    b = rng.integers(5, 25, 143)
    df = pd.DataFrame(
        {
            "g": ["A"] * len(a) + ["B"] * len(b) + ["other"] * 10,
            "v": np.concatenate([a, b, rng.integers(0, 9, 10)]),
        }
    )
    out = ks_two_sample(_ds(df, 6), "g", "v", "A", "B").to_pandas()
    d_ref, ppm_ref = _ks_ref(a, b)
    assert out.loc[0, "n_a"] == 57 and out.loc[0, "n_b"] == 143
    assert out.loc[0, "d_num"] == d_ref
    assert out.loc[0, "d_ppm"] == ppm_ref


def test_chi2_known_2x2_and_zero_cell():
    from multiomics_biocypher_kg_ray.stages.relational import contingency_chi2

    # 2x2: [[10, 0], [0, 10]] -> perfect association, chi2 = N = 20,
    # Cramér's V = 1; the two zero cells MUST contribute their expected mass
    df = pd.DataFrame(
        {"r": ["a"] * 10 + ["b"] * 10, "c": ["x"] * 10 + ["y"] * 10}
    )
    out = contingency_chi2(_ds(df, 3), "r", "c").to_pandas()
    assert out.loc[0, "n"] == 20 and out.loc[0, "dof"] == 1
    assert out.loc[0, "chi2_micro"] == 20 * 1_000_000
    assert out.loc[0, "cramers_v_ppm"] in (1_000_000, 999_999)


def test_chi2_independent_is_zero():
    from multiomics_biocypher_kg_ray.stages.relational import contingency_chi2

    # perfectly proportional table -> chi2 exactly 0
    rows = []
    for r, mult in [("a", 1), ("b", 3)]:
        for c, base in [("x", 4), ("y", 6)]:
            rows.extend([{"r": r, "c": c}] * (mult * base))
    out = contingency_chi2(_ds(pd.DataFrame(rows), 4), "r", "c").to_pandas()
    assert out.loc[0, "chi2_micro"] == 0 and out.loc[0, "cramers_v_ppm"] == 0


def test_mi_independent_vs_dependent():
    from multiomics_biocypher_kg_ray.stages.relational import contingency_mi

    # independent uniform 2x2 -> every pointwise log is ln(1) = 0
    rows = [{"r": r, "c": c} for r in "ab" for c in "xy" for _ in range(5)]
    out = contingency_mi(_ds(pd.DataFrame(rows), 3), "r", "c").to_pandas()
    assert out.loc[0, "mi_milli_sum"] == 0

    # perfectly dependent: MI = ln 2 per row -> sum = N * floor(1000 ln 2)
    df = pd.DataFrame({"r": ["a"] * 8 + ["b"] * 8, "c": ["x"] * 8 + ["y"] * 8})
    out = contingency_mi(_ds(df, 3), "r", "c").to_pandas()
    assert out.loc[0, "mi_milli_sum"] == 16 * int(np.floor(np.log(2.0) * 1000))


def test_cusum_flat_vs_step_change():
    from multiomics_biocypher_kg_ray.stages.relational import group_cusum

    # flat: c = 5 each step -> n·C_j = j·S exactly -> cusum 0
    # step: rate jumps 1 -> 9 halfway -> peak at the change point (step 5)
    flat = [("flat", d, 5) for d in range(10)]
    step = [("step", d, 1 if d < 5 else 9) for d in range(10)]
    df = pd.DataFrame(flat + step, columns=["g", "day", "c"])
    out = (
        group_cusum(_ds(df, 4), "g", "day", "c").to_pandas().set_index("g")
    )
    assert out.loc["flat", "cusum_max"] == 0
    # flat peak: all tj equal 0 -> earliest step wins
    assert out.loc["flat", "peak_step"] == 0
    n, s = 10, 5 * 1 + 5 * 9
    cum = np.cumsum([1 if d < 5 else 9 for d in range(10)])
    tj = np.abs(n * cum - np.arange(1, 11) * s)
    assert out.loc["step", "cusum_max"] == tj.max()
    assert out.loc["step", "peak_step"] == int(np.argmax(tj))  # day index
    assert out.loc["step", "total"] == s and out.loc["step", "n_steps"] == n


def test_benford_exact_law_and_zero_fill():
    from multiomics_biocypher_kg_ray.stages.relational import benford_digits

    # values engineered: digit d appears exactly d times; 0/negatives dropped
    vals = [d * 10 ** (i % 3) for d in range(1, 9) for i in range(d)]
    vals += [0, -7]
    df = pd.DataFrame({"v": vals})
    out = benford_digits(_ds(df, 3), "v").to_pandas().set_index("digit")
    n = sum(range(1, 9))
    assert list(out.index) == list(range(1, 10))
    for d in range(1, 9):
        assert out.loc[d, "n_obs"] == d
        assert out.loc[d, "obs_ppm"] == d * 1_000_000 // n
    assert out.loc[9, "n_obs"] == 0 and out.loc[9, "obs_ppm"] == 0
    exp9 = int(np.floor(np.log(1 + 1 / 9) / np.log(10.0) * 1e6))
    assert out.loc[9, "expected_ppm"] == exp9
    assert out.loc[9, "dev_ppm"] == -exp9


def test_halflife_decay_exact_shifts():
    from multiomics_biocypher_kg_ray.stages.relational import (
        halflife_decayed_sum,
    )

    # max day = 21; values at 0/1/2/3 half-lives (hl=7) and a mid-window
    # day 20 (w = 0: 1//7 floors to 0)
    df = pd.DataFrame(
        {
            "u": ["a", "a", "a", "a", "b"],
            "day": [21, 14, 7, 0, 20],
            "v": [100, 100, 100, 101, 64],
        }
    )
    out = (
        halflife_decayed_sum(_ds(df, 3), "u", "day", "v", halflife_days=7)
        .to_pandas()
        .set_index("u")
    )
    assert out.loc["a", "decayed"] == 100 + 50 + 25 + (101 >> 3)
    assert out.loc["a", "total"] == 401 and out.loc["a", "n_rows"] == 4
    assert out.loc["b", "decayed"] == 64  # (21-20)//7 == 0 -> no halving


def test_halflife_decay_rejects_negative():
    import pytest

    from multiomics_biocypher_kg_ray.stages.relational import (
        halflife_decayed_sum,
    )

    df = pd.DataFrame({"u": ["a"], "day": [0], "v": [-5]})
    with pytest.raises(Exception):
        halflife_decayed_sum(_ds(df, 1), "u", "day", "v").to_pandas()
