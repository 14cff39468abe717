"""Window-scan operators (stages/window.py) vs single-process pandas
references — lag / running sum per key under multi-column ordering, including
a hot key spanning many blocks (the no-single-task-funnel contract)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from multiomics_biocypher_kg_ray.stages.window import cumsum_over, lag_over


def _mk(n_keys: int, rows_per_key: list[int], seed: int) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    parts, orders, ids, vals = [], [], [], []
    next_id = 0
    for k in range(n_keys):
        n = rows_per_key[k % len(rows_per_key)]
        parts += [f"k{k:04d}"] * n
        # duplicate primary order values to exercise the id tie-break
        orders += list(rng.randint(0, max(2, n // 3), size=n))
        ids += list(range(next_id, next_id + n))
        next_id += n
        vals += list(rng.randint(-50, 50, size=n))
    df = pd.DataFrame({"part": parts, "o": orders, "id": ids, "v": vals})
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def _ds(df: pd.DataFrame, blocks: int) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        blocks
    )


@pytest.mark.parametrize("blocks", [1, 7])
def test_cumsum_over_matches_pandas(blocks):
    df = _mk(12, [1, 5, 40], seed=3)
    out = (
        cumsum_over(_ds(df, blocks), "part", ["o", "id"], "v", out_col="cum")
        .to_pandas()
        .sort_values(["part", "o", "id"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["part", "o", "id"]).reset_index(drop=True)
    ref["cum"] = ref.groupby("part")["v"].cumsum()
    pd.testing.assert_series_equal(
        out["cum"].astype("int64"), ref["cum"].astype("int64"), check_names=False
    )


def test_cumsum_exclusive_variant():
    df = _mk(5, [8], seed=11)
    out = (
        cumsum_over(_ds(df, 3), "part", ["o", "id"], "v", out_col="c", inclusive=False)
        .to_pandas()
        .sort_values(["part", "o", "id"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["part", "o", "id"]).reset_index(drop=True)
    ref["c"] = ref.groupby("part")["v"].cumsum() - ref["v"]
    assert (out["c"].to_numpy() == ref["c"].to_numpy()).all()


@pytest.mark.parametrize("blocks", [1, 7])
def test_lag_over_matches_pandas(blocks):
    df = _mk(12, [1, 3, 40], seed=5)
    out = (
        lag_over(_ds(df, blocks), "part", ["o", "id"], "v", out_col="prev")
        .to_pandas()
        .sort_values(["part", "o", "id"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["part", "o", "id"]).reset_index(drop=True)
    ref["prev"] = ref.groupby("part")["v"].shift(1)
    got = out["prev"].to_numpy(dtype="float64", na_value=np.nan)
    want = ref["prev"].to_numpy(dtype="float64", na_value=np.nan)
    assert ((got == want) | (np.isnan(got) & np.isnan(want))).all()


def test_hot_key_spans_many_blocks():
    # ONE key with 20k rows across 16 blocks: every block contributes a
    # bounded segment; results must still be the exact per-key scan
    n = 20_000
    df = pd.DataFrame(
        {
            "part": ["hot"] * n + ["cold"],
            "o": list(range(n)) + [0],
            "id": list(range(n + 1)),
            "v": [1] * (n + 1),
        }
    )
    ds = _ds(df.sample(frac=1.0, random_state=0), 16)
    out = (
        cumsum_over(ds, "part", ["o", "id"], "v", out_col="cum")
        .to_pandas()
        .sort_values(["part", "o"])
        .reset_index(drop=True)
    )
    hot = out[out["part"] == "hot"]
    assert (hot["cum"].to_numpy() == np.arange(1, n + 1)).all()
    lagged = (
        lag_over(ds, "part", ["o", "id"], "o", out_col="prev_o")
        .to_pandas()
        .sort_values(["part", "o"])
        .reset_index(drop=True)
    )
    hotl = lagged[lagged["part"] == "hot"]
    assert pd.isna(hotl["prev_o"].iloc[0])
    assert (hotl["prev_o"].to_numpy()[1:] == np.arange(0, n - 1)).all()


def test_single_row_parts_and_empty_carry():
    df = pd.DataFrame(
        {"part": ["a", "b", "c"], "o": [1, 1, 1], "id": [1, 2, 3], "v": [7, 8, 9]}
    )
    out = (
        lag_over(_ds(df, 3), "part", ["o", "id"], "v", out_col="prev")
        .to_pandas()
        .sort_values("part")
    )
    assert out["prev"].isna().all()


@pytest.mark.parametrize("blocks,window", [(1, 5), (9, 5), (9, 1), (9, 64)])
def test_rolling_sum_over_matches_pandas(blocks, window):
    from multiomics_biocypher_kg_ray.stages.window import rolling_sum_over

    df = _mk(25, [1, 2, 3, 60, 17], seed=3)
    out = (
        rolling_sum_over(
            _ds(df, blocks), "part", ["o", "id"], "v", window,
            sum_col="ws", cnt_col="wn",
        )
        .to_pandas()
        .sort_values(["part", "o", "id"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["part", "o", "id"]).reset_index(drop=True)
    g = ref.groupby("part")["v"]
    want_sum = g.rolling(window, min_periods=1).sum().reset_index(drop=True)
    want_cnt = g.rolling(window, min_periods=1).count().reset_index(drop=True)
    assert (out["ws"].to_numpy() == want_sum.to_numpy().astype(np.int64)).all()
    assert (out["wn"].to_numpy() == want_cnt.to_numpy().astype(np.int64)).all()


def test_rolling_hot_key_window_spans_block_boundaries():
    # one hot key across 16 blocks with a window (200) far wider than the
    # per-block segment tails — carries must chain across multiple earlier
    # segments via the truncated tail concat
    from multiomics_biocypher_kg_ray.stages.window import rolling_sum_over

    n, W = 20_000, 200
    df = pd.DataFrame(
        {"part": ["hot"] * n, "o": range(n), "id": range(n), "v": [1] * n}
    )
    out = (
        rolling_sum_over(
            _ds(df.sample(frac=1.0, random_state=1), 16),
            "part", ["o", "id"], "v", W, sum_col="ws", cnt_col="wn",
        )
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    want = np.minimum(np.arange(1, n + 1), W)
    assert (out["ws"].to_numpy() == want).all()
    assert (out["wn"].to_numpy() == want).all()


@pytest.mark.parametrize("blocks", [1, 7])
def test_lead_over_matches_pandas(blocks):
    from multiomics_biocypher_kg_ray.stages.window import lead_over

    df = _mk(20, [1, 2, 40, 9], seed=5)
    out = (
        lead_over(_ds(df, blocks), "part", ["o", "id"], "v", out_col="nxt")
        .to_pandas()
        .sort_values(["part", "o", "id"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["part", "o", "id"]).reset_index(drop=True)
    want = ref.groupby("part")["v"].shift(-1)
    got = out["nxt"].astype("float64")
    assert ((got == want) | (got.isna() & want.isna())).all()


def test_lead_over_rejects_non_integer_order():
    from multiomics_biocypher_kg_ray.stages.window import lead_over

    df = pd.DataFrame({"part": ["a"], "o": ["x"], "v": [1]})
    with pytest.raises(TypeError):
        lead_over(_ds(df, 1), "part", ["o"], "v")


@pytest.mark.parametrize("blocks", [1, 7])
def test_cummax_over_matches_pandas(blocks):
    from multiomics_biocypher_kg_ray.stages.window import cummax_over

    df = _mk(12, [1, 5, 40], seed=7)
    out = (
        cummax_over(_ds(df, blocks), "part", ["o", "id"], "v", out_col="m")
        .to_pandas()
        .sort_values(["part", "o", "id"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["part", "o", "id"]).reset_index(drop=True)
    # exclusive running max: shift the inclusive cummax down one within part
    ref["m"] = ref.groupby("part")["v"].cummax().groupby(ref["part"]).shift(1)
    assert out["m"].isna().equals(ref["m"].isna())
    got = out["m"].dropna().astype("int64").reset_index(drop=True)
    exp = ref["m"].dropna().astype("int64").reset_index(drop=True)
    pd.testing.assert_series_equal(got, exp, check_names=False)


def test_cummax_hot_key_many_blocks():
    """One key spanning every block: the carry must chain across segments."""
    from multiomics_biocypher_kg_ray.stages.window import cummax_over

    n = 5000
    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {"part": ["hot"] * n, "o": np.arange(n), "id": np.arange(n),
         "v": rng.randint(-(10**6), 10**6, size=n)}
    )
    out = (
        cummax_over(_ds(df, 16), "part", ["o", "id"], "v", out_col="m")
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    exp = pd.Series(df["v"]).cummax().shift(1)
    assert pd.isna(out["m"].iloc[0]) and pd.isna(exp.iloc[0])
    assert (out["m"].iloc[1:].astype("int64").to_numpy()
            == exp.iloc[1:].astype("int64").to_numpy()).all()


def test_coalesce_intervals_matches_bruteforce():
    from multiomics_biocypher_kg_ray.stages.events import coalesce_intervals

    rng = np.random.RandomState(42)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 40, size=n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    df["s"] = rng.randint(0, 10**6, size=n).astype(np.int64)
    df["e"] = df["s"] + rng.randint(1, 5000, size=n).astype(np.int64)
    out = (
        coalesce_intervals(_ds(df, 9), "k", "s", "e", "id")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    def brute(g: pd.DataFrame):
        ivs = sorted(zip(g["s"], g["e"]))
        islands, cov, cur_s, cur_e = 0, 0, None, None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    cov += cur_e - cur_s
                islands, cur_s, cur_e = islands + 1, s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            cov += cur_e - cur_s
        return pd.Series({"n_islands": islands, "covered_us": cov, "n_intervals": len(g)})

    ref = df.groupby("k").apply(brute, include_groups=False).reset_index().sort_values("k")
    for c in ("n_islands", "covered_us", "n_intervals"):
        assert (out[c].to_numpy() == ref[c].to_numpy()).all(), c


def test_lag_over_exact_above_2_53():
    """Nullable-int extraction must stay exact past float64's 2^53 (the
    60-bit hash regression behind scd2_intervals)."""
    big = np.array(
        [(1 << 59) + 1, (1 << 59) + 1, (1 << 60) - 7], dtype=np.int64
    )
    df = pd.DataFrame(
        {"part": ["p", "p", "p"], "o": [1, 2, 3], "id": [1, 2, 3], "v": big}
    )
    # compare in Arrow: a pandas round-trip would itself degrade the
    # nullable column to float64 and mask the regression
    tbl = pa.concat_tables(
        lag_over(_ds(df, 2), "part", ["o", "id"], "v", out_col="pv")
        .sort("o")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    pv = tbl.column("pv").to_pylist()
    assert pv[0] is None
    assert pv[1] == int(big[0])
    assert pv[2] == int(big[1])


def _range_ref(df: pd.DataFrame, h: int) -> pd.DataFrame:
    """Brute-force SQL RANGE frame: for each row, sum/count of same-part
    rows with ts in [ts_r - h, ts_r] — peers included on both sides."""
    out_s, out_n = [], []
    for _, r in df.iterrows():
        g = df[df["part"] == r["part"]]
        m = (g["ts"] >= r["ts"] - h) & (g["ts"] <= r["ts"])
        out_s.append(int(g.loc[m, "v"].sum()))
        out_n.append(int(m.sum()))
    res = df.copy()
    res["win_sum"], res["win_n"] = out_s, out_n
    return res


def _mk_range(seed: int, n_keys: int = 6, hot_runs: bool = True) -> pd.DataFrame:
    """Adversarial: one hot key with LONG runs of identical ts (peer runs
    that straddle many blocks), sparse keys, singleton keys, negative vals."""
    rng = np.random.RandomState(seed)
    parts, ts, ids, vals = [], [], [], []
    nid = 0
    for k in range(n_keys):
        if k == 0 and hot_runs:
            # hot key: 120 rows over few distinct ts values -> giant peer runs
            t = np.sort(rng.choice([0, 10, 10, 10, 25, 60, 61, 200], size=120))
        elif k == 1:
            t = np.array([5])  # singleton
        else:
            t = np.sort(rng.randint(0, 300, size=rng.randint(3, 30)))
        parts += [f"k{k}"] * len(t)
        ts += list(t)
        ids += list(range(nid, nid + len(t)))
        nid += len(t)
        vals += list(rng.randint(-9, 9, size=len(t)))
    df = pd.DataFrame({"part": parts, "ts": np.array(ts, dtype="int64"),
                       "id": ids, "v": vals})
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


@pytest.mark.parametrize("blocks,h", [(1, 50), (9, 50), (31, 15), (31, 0)])
def test_rolling_range_sum_matches_bruteforce(blocks, h):
    from multiomics_biocypher_kg_ray.stages.window import rolling_range_sum_over

    df = _mk_range(seed=blocks + h)
    out = (
        rolling_range_sum_over(
            _ds(df, blocks), "part", "ts", ["ts", "id"], "v", h
        )
        .to_pandas()
        .sort_values(["part", "ts", "id"])
        .reset_index(drop=True)
    )
    ref = (
        _range_ref(df, h)
        .sort_values(["part", "ts", "id"])
        .reset_index(drop=True)
    )
    assert (out["win_sum"].to_numpy() == ref["win_sum"].to_numpy()).all()
    assert (out["win_n"].to_numpy() == ref["win_n"].to_numpy()).all()


def test_rolling_range_hot_peer_run_across_blocks():
    """A single part whose rows ALL share one ts, split across many blocks:
    every row's frame is the whole part (pure peer frame) — exercises the
    forward peer-run chain through >2 consecutive segments."""
    from multiomics_biocypher_kg_ray.stages.window import rolling_range_sum_over

    n = 200
    df = pd.DataFrame(
        {
            "part": ["hot"] * n,
            "ts": np.full(n, 42, dtype="int64"),
            "id": np.arange(n),
            "v": np.arange(n, dtype="int64") - 100,
        }
    )
    out = rolling_range_sum_over(
        _ds(df, 23), "part", "ts", ["ts", "id"], "v", 5
    ).to_pandas()
    assert (out["win_sum"] == int(df["v"].sum())).all()
    assert (out["win_n"] == n).all()


def _range_max_ref(df: pd.DataFrame, h: int) -> pd.DataFrame:
    out_m, out_n = [], []
    for _, r in df.iterrows():
        g = df[df["part"] == r["part"]]
        m = (g["ts"] >= r["ts"] - h) & (g["ts"] <= r["ts"])
        out_m.append(int(g.loc[m, "v"].max()))
        out_n.append(int(m.sum()))
    res = df.copy()
    res["win_max"], res["win_n"] = out_m, out_n
    return res


@pytest.mark.parametrize("blocks,h", [(1, 50), (9, 50), (31, 15), (31, 0)])
def test_rolling_range_max_matches_bruteforce(blocks, h):
    from multiomics_biocypher_kg_ray.stages.window import rolling_range_max_over

    df = _mk_range(seed=100 + blocks + h)
    out = (
        rolling_range_max_over(
            _ds(df, blocks), "part", "ts", ["ts", "id"], "v", h
        )
        .to_pandas()
        .sort_values(["part", "ts", "id"])
        .reset_index(drop=True)
    )
    ref = (
        _range_max_ref(df, h)
        .sort_values(["part", "ts", "id"])
        .reset_index(drop=True)
    )
    assert (out["win_max"].to_numpy() == ref["win_max"].to_numpy()).all()
    assert (out["win_n"].to_numpy() == ref["win_n"].to_numpy()).all()


def test_rolling_range_max_hot_peer_run_across_blocks():
    from multiomics_biocypher_kg_ray.stages.window import rolling_range_max_over

    n = 200
    df = pd.DataFrame(
        {
            "part": ["hot"] * n,
            "ts": np.full(n, 42, dtype="int64"),
            "id": np.arange(n),
            "v": np.arange(n, dtype="int64") - 100,
        }
    )
    out = rolling_range_max_over(
        _ds(df, 23), "part", "ts", ["ts", "id"], "v", 5
    ).to_pandas()
    assert (out["win_max"] == int(df["v"].max())).all()
    assert (out["win_n"] == n).all()
