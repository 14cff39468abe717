"""Round-4 session-44 — time-weighted average, Wald–Wolfowitz runs test,
discrete interarrival hazard (hand-computed plants)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def _events(rows):
    # rows: (user_id, ts_iso, value)
    return pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [r[0] for r in rows],
            "event_type": "click",
            "ts": pd.to_datetime([r[1] for r in rows]),
            "value": [r[2] for r in rows],
            "props": "",
        }
    )


def test_user_twap_hand_values():
    from multiomics_biocypher_kg_ray.pipelines.queries import q_user_twap

    df = _events(
        [
            # user 1: 1.00 held 10 s, then 3.00 held 10 s -> twap 2.00
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:00:10", 3.0),
            (1, "2024-01-01 00:00:20", 99.0),
            # user 2: single event -> no interval, dropped
            (2, "2024-01-01 00:00:00", 5.0),
            # user 3: two events at the SAME ts -> span 0, dropped
            (3, "2024-01-01 00:00:00", 5.0),
            (3, "2024-01-01 00:00:00", 7.0),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q_user_twap(d).to_pandas()
    assert out["user_id"].tolist() == [1]
    row = out.iloc[0]
    assert row["n_intervals"] == 2
    assert row["span_ms"] == 20_000
    assert row["twap_cents"] == 200


def test_daily_revenue_runs_hand_values():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_daily_revenue_runs,
    )

    # daily revenue 1, 2, 1, 2, 3 -> deltas +,-,+,+ -> runs 3 (n+=3, n-=1)
    # mu = 2*3*1/4 + 1 = 2.5; var = 6*(6-4)/(16*3) = 0.25; z = (3-2.5)/0.5 = 1
    days = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"]
    rev = [1.0, 2.0, 1.0, 2.0, 3.0]
    df = pd.DataFrame(
        {
            "o_orderkey": range(5),
            "o_orderdate": pd.to_datetime(days),
            "o_totalprice": rev,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "orders.parquet"))
        out = q_daily_revenue_runs(d).to_pandas()
    row = out.iloc[0]
    assert row["n_signs"] == 4
    assert row["n_plus"] == 3
    assert row["n_minus"] == 1
    assert row["runs"] == 3
    assert row["z_milli"] == 1000


def test_daily_revenue_runs_drops_zero_deltas():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_daily_revenue_runs,
    )

    # revenue 1, 1, 2: first delta is zero (dropped), one + sign remains
    df = pd.DataFrame(
        {
            "o_orderkey": range(3),
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03"]
            ),
            "o_totalprice": [1.0, 1.0, 2.0],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "orders.parquet"))
        out = q_daily_revenue_runs(d).to_pandas()
    row = out.iloc[0]
    assert row["n_signs"] == 1
    assert row["n_plus"] == 1
    assert row["n_minus"] == 0
    assert row["runs"] == 1
    assert row["z_milli"] == 0  # zero variance guard


def test_event_hazard_rate_hand_values():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_event_hazard_rate,
    )

    df = _events(
        [
            # user 1: gaps 0.5 h (bucket 0) and 2.5 h (bucket 2)
            (1, "2024-01-01 00:00:00", 0.0),
            (1, "2024-01-01 00:30:00", 0.0),
            (1, "2024-01-01 03:00:00", 0.0),
            # user 2: gap 100 h -> capped terminal bucket 48
            (2, "2024-01-01 00:00:00", 0.0),
            (2, "2024-01-05 04:00:00", 0.0),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = (
            q_event_hazard_rate(d)
            .to_pandas()
            .set_index("bucket_h")
            .sort_index()
        )
    assert out.index.tolist() == [0, 2, 48]
    assert out.loc[0, "n_gaps"] == 1 and out.loc[0, "at_risk"] == 3
    assert out.loc[2, "n_gaps"] == 1 and out.loc[2, "at_risk"] == 2
    assert out.loc[48, "n_gaps"] == 1 and out.loc[48, "at_risk"] == 1
    assert out.loc[0, "hazard_ppm"] == 333_333
    assert out.loc[2, "hazard_ppm"] == 500_000
    assert out.loc[48, "hazard_ppm"] == 1_000_000
