"""Round-4 session-8 operators — exact total-variation distance (identical /
disjoint / hand case), longest active-day streaks (gaps-and-islands), harmonic
closeness on known graphs (star, path, overlapping seeds), monthly growth and
weekday profile on hand-built parquet fixtures."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.events import longest_streak
from multiomics_biocypher_kg_ray.stages.graph import harmonic_closeness
from multiomics_biocypher_kg_ray.stages.relational import total_variation


def _ds(df: pd.DataFrame, blocks: int = 3):
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(blocks)


def test_tv_identical_and_disjoint():
    same = pd.DataFrame(
        {"g": ["a"] * 3 + ["b"] * 3, "v": [1, 2, 3, 1, 2, 3]}
    )
    out = total_variation(_ds(same), "g", "v", "a", "b").to_pandas().iloc[0]
    assert out["tv_num"] == 0 and out["tv_ppm"] == 0
    disj = pd.DataFrame(
        {"g": ["a"] * 2 + ["b"] * 3, "v": [1, 2, 10, 11, 12]}
    )
    out = total_variation(_ds(disj), "g", "v", "a", "b").to_pandas().iloc[0]
    assert out["n_a"] == 2 and out["n_b"] == 3
    # fully disjoint supports: TV = 1 exactly
    assert out["tv_num"] == 2 * 2 * 3 and out["tv_ppm"] == 1_000_000


def test_tv_hand_case_unequal_sizes():
    # a: {1:2, 2:1} (n=3), b: {1:1, 3:1} (n=2)
    df = pd.DataFrame(
        {"g": ["a", "a", "a", "b", "b"], "v": [1, 1, 2, 1, 3]}
    )
    out = total_variation(_ds(df), "g", "v", "a", "b").to_pandas().iloc[0]
    # cells: v=1 |2*2-1*3|=1, v=2 |1*2-0|=2, v=3 |0-1*3|=3 -> num 6
    assert out["tv_num"] == 6
    assert out["tv_ppm"] == int(np.floor(6e6 / 12.0))  # TV = 0.5


DAY = 86_400_000_000


def _events_days(user_days):
    rows = [
        (u, d * DAY + 5) for u, days in user_days.items() for d in days
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
    ).repartition(3)


def test_longest_streak_islands_and_day_dedup():
    ev = _events_days({1: [0, 1, 2, 5, 6, 10], 2: [3, 3, 3], 3: [7]})
    out = longest_streak(ev).to_pandas().set_index("user_id")
    assert out.loc[1, "n_active_days"] == 6
    assert out.loc[1, "longest_streak"] == 3  # days 0-1-2
    # duplicate events in one day collapse to a single active day
    assert out.loc[2, "n_active_days"] == 1 and out.loc[2, "longest_streak"] == 1
    assert out.loc[3, "longest_streak"] == 1


def _edges(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.string()),
                "dst": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    ).repartition(2)


def test_closeness_star_center():
    e = _edges([("c", "l1"), ("c", "l2"), ("c", "l3"), ("c", "l4")])
    out = (
        harmonic_closeness(e, min_seed_deg=3, rounds=3)
        .to_pandas()
        .set_index("seed")
    )
    assert list(out.index) == ["c"]  # leaves have degree 1
    assert out.loc["c", "n_reached"] == 4
    assert out.loc["c", "harmonic_e6"] == 4 * 1_000_000


def test_closeness_path_distances():
    # path a-b-c-d-e, seed = every node with deg >= 2 (b, c, d)
    e = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = (
        harmonic_closeness(e, min_seed_deg=2, rounds=3)
        .to_pandas()
        .set_index("seed")
    )
    assert sorted(out.index) == ["b", "c", "d"]
    # from b: a,c at 1; d at 2; e at 3
    assert out.loc["b", "n_reached"] == 4
    assert (
        out.loc["b", "harmonic_e6"]
        == 2 * 1_000_000 + 1_000_000 // 2 + 1_000_000 // 3
    )
    # from c (middle): b,d at 1; a,e at 2
    assert out.loc["c", "harmonic_e6"] == 2 * 1_000_000 + 2 * (1_000_000 // 2)


def test_closeness_unreachable_seed_zero_row():
    # two components; the isolated triangle's nodes have degree 2
    e = _edges([("x", "y"), ("y", "z"), ("z", "x"), ("p", "q")])
    out = (
        harmonic_closeness(e, min_seed_deg=2, rounds=3)
        .to_pandas()
        .set_index("seed")
    )
    # x,y,z are seeds; each reaches the other two at distance 1
    assert (out["n_reached"] == 2).all()
    assert (out["harmonic_e6"] == 2_000_000).all()


def test_monthly_growth_hand_fixture():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_nation_monthly_growth,
    )

    orders = pd.DataFrame(
        {
            "o_orderkey": range(4),
            "o_custkey": [1, 1, 2, 1],
            "o_orderstatus": "F",
            "o_totalprice": [10.0, 20.0, 5.0, 40.0],
            "o_orderdate": pd.to_datetime(
                ["2024-01-15", "2024-02-10", "2024-01-20", "2024-03-01"]
            ),
            "o_orderpriority": "1-URGENT",
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": [1, 2],
            "c_name": ["a", "b"],
            "c_nationkey": pd.array([7, 9], dtype="int32"),
            "c_acctbal": 0.0,
            "c_mktsegment": "BUILDING",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        orders.to_parquet(os.path.join(d, "orders.parquet"))
        cust.to_parquet(os.path.join(d, "customer.parquet"))
        out = (
            q_nation_monthly_growth(d)
            .to_pandas()
            .set_index(["c_nationkey", "ym"])
            .sort_index()
        )
    assert pd.isna(out.loc[(7, 202401), "growth_ppm"])  # first month
    assert out.loc[(7, 202402), "growth_ppm"] == 1_000_000  # 1000 -> 2000 cents
    assert out.loc[(7, 202403), "growth_ppm"] == 1_000_000  # 2000 -> 4000
    assert pd.isna(out.loc[(9, 202401), "growth_ppm"])


def test_weekday_profile_isodow_and_share():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_orders_weekday_profile,
    )

    # 2026-08-17 is a Monday
    orders = pd.DataFrame(
        {
            "o_orderkey": range(4),
            "o_custkey": 1,
            "o_orderstatus": "F",
            "o_totalprice": [1.0, 2.0, 3.0, 4.0],
            "o_orderdate": pd.to_datetime(
                ["2026-08-17", "2026-08-17", "2026-08-18", "2026-08-23"]
            ),
            "o_orderpriority": "1-URGENT",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        orders.to_parquet(os.path.join(d, "orders.parquet"))
        out = (
            q_orders_weekday_profile(d).to_pandas().set_index("dow_iso")
        )
    assert sorted(out.index) == [1, 2, 7]  # Mon, Tue, Sun
    assert out.loc[1, "n"] == 2 and out.loc[1, "sum_cents"] == 300
    assert out.loc[1, "share_ppm"] == 2 * 1_000_000 // 4
    assert out.loc[7, "n"] == 1
