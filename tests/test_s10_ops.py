"""Round-4 session-10 operators — binned Kendall τ-b (permutation brute
force, monotone big-group binning, constant-axis NULL), HHI concentration
(monopoly / balanced / hand case), per-user session census, conversation
mention density (all-convs coverage)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.relational import (
    concentration_hhi,
    group_kendall_binned,
)


def _ds(df: pd.DataFrame, blocks: int = 3):
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(blocks)


def _kendall_df(g, xs, ys):
    return pd.DataFrame(
        {
            "g": [g] * len(xs),
            "x": np.asarray(xs, np.int64),
            "y": np.asarray(ys, np.int64),
            "i": np.arange(len(xs), dtype=np.int64),
        }
    )


def _tau_ref(C, D, n0, n1, n2):
    return int(
        np.floor(
            ((C - D) * 1e6)
            / (np.sqrt(np.float64(n0 - n1)) * np.sqrt(np.float64(n0 - n2)))
        )
    )


def test_kendall_permutation_brute_force():
    # n=6 <= k: every row its own tile -> plain Kendall on the permutation
    ys = [2, 1, 4, 3, 6, 5]  # 3 inversions
    df = _kendall_df("p", [1, 2, 3, 4, 5, 6], ys)
    out = (
        group_kendall_binned(_ds(df), "g", "x", "y", k=10)
        .to_pandas()
        .iloc[0]
    )
    assert out["n"] == 6
    assert out["kendall_ppm"] == _tau_ref(12, 3, 15, 0, 0)


def test_kendall_monotone_survives_binning():
    # 100 rows > k: equal tiles on both axes; ties inside tiles cancel in
    # tau-b and cross-tile pairs are all concordant -> tau == 1
    n = 100
    df = _kendall_df("m", np.arange(n), np.arange(n) * 7)
    out = (
        group_kendall_binned(_ds(df), "g", "x", "y", k=10)
        .to_pandas()
        .iloc[0]
    )
    assert out["n"] == n
    assert out["kendall_ppm"] in (1_000_000, 999_999)


def test_kendall_constant_axis_null():
    df = _kendall_df("c", [5, 5, 5, 5], [1, 2, 3, 4])
    out = (
        group_kendall_binned(_ds(df), "g", "x", "y", k=10)
        .to_pandas()
        .iloc[0]
    )
    # x constant -> the tie-preserving midrank bin puts ALL rows in one
    # x-bin, so every pair is x-tied (n1 == n0) and tau-b is undefined
    assert out["n"] == 4
    assert pd.isna(out["kendall_ppm"])


def test_hhi_monopoly_balanced_and_hand():
    df = pd.DataFrame(
        {
            "g": ["mono"] * 2 + ["bal"] * 2 + ["hand"] * 2,
            "m": [1, 1, 1, 2, 1, 2],
            "v": [7, 3, 5, 5, 3, 1],
        }
    )
    out = concentration_hhi(_ds(df), "g", "m", "v").to_pandas().set_index("g")
    assert out.loc["mono", "n_members"] == 1
    assert out.loc["mono", "hhi_e6"] == 1_000_000
    assert out.loc["bal", "hhi_e6"] == 500_000
    # shares 3/4, 1/4 -> (9+1)/16
    assert out.loc["hand", "hhi_e6"] == 625_000
    assert out.loc["hand", "total"] == 4


def test_hhi_zero_total_null():
    df = pd.DataFrame({"g": ["z"], "m": [1], "v": [0]})
    out = concentration_hhi(_ds(df, 1), "g", "m", "v").to_pandas()
    assert pd.isna(out["hhi_e6"]).all()


def test_session_stats_known_sessions():
    import os
    import tempfile

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_user_session_stats,
    )

    # user 1: 3 events within 30min, then one 100min later -> 2 sessions
    ts = [0, 60, 120, 100 * 60]
    df = pd.DataFrame(
        {
            "event_id": range(4),
            "user_id": 1,
            "ts": pd.to_datetime(ts, unit="s"),
            "event_type": "click",
            "value": 0.0,
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q_user_session_stats(d).to_pandas().iloc[0]
    assert out["n_sessions"] == 2
    assert out["n_events"] == 4
    assert out["max_session_events"] == 3
    assert out["mean_len_milli"] == 2000


def test_mention_density_covers_all_convs():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_conv_mention_density,
    )

    out = q_conv_mention_density("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500  # every conversation, mentions or not
    assert (out["n_chars"] > 0).all()
    assert (out["density_e6"] >= 0).all()
    assert (
        out["density_e6"]
        == out["n_mentions"] * 1_000_000 // out["n_chars"]
    ).all()
