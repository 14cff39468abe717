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


def test_event_type_kruskal_hand_values():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_event_type_kruskal,
    )

    # a: 1,2,3  b: 4,5,6 (cents 100..600, no ties)
    # ranks 1..6 -> R_a=6, R_b=15; H = 12/(6*7)*(36/3+225/3) - 3*7 = 27/7
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": 1,
            "event_type": [r[0] for r in rows],
            "ts": pd.to_datetime("2024-01-01"),
            "value": [r[1] for r in rows],
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q_event_type_kruskal(d).to_pandas()
    row = out.iloc[0]
    assert row["n_rows"] == 6
    assert row["k_groups"] == 2
    assert row["tie_sum"] == 0
    assert row["h_milli"] == 3857  # floor(27/7 * 1000)


def test_event_type_kruskal_ties():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_event_type_kruskal,
    )

    # a: 1,1  b: 2,2 -> midranks 1.5,1.5,3.5,3.5; R_a=3, R_b=7; N=4
    # H = 12/20*(9/2+49/2) - 15 = 2.4; ties T = 2*(8-2) = 12
    # H_c = 2.4 / (1 - 12/60) = 3.0
    rows = [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)]
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": 1,
            "event_type": [r[0] for r in rows],
            "ts": pd.to_datetime("2024-01-01"),
            "value": [r[1] for r in rows],
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q_event_type_kruskal(d).to_pandas()
    row = out.iloc[0]
    assert row["tie_sum"] == 12
    assert row["h_milli"] == 3000


def test_neyman_allocation_hand_values():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_neyman_allocation,
    )

    # stratum a: cents 100,300 -> n=2, s=400, q=100^2+300^2=100000
    #   w = floor(sqrt(2*100000 - 160000)) = floor(sqrt(40000)) = 200
    # stratum b: cents 100,100 -> zero variance, w = 0
    rows = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 1.0)]
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": 1,
            "event_type": [r[0] for r in rows],
            "ts": pd.to_datetime("2024-01-01"),
            "value": [r[1] for r in rows],
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = (
            q_neyman_allocation(d).to_pandas().set_index("stratum").sort_index()
        )
    assert out.loc["a", "weight"] == 200
    assert out.loc["b", "weight"] == 0
    assert out.loc["a", "alloc"] == 10_000
    assert out.loc["b", "alloc"] == 0
    assert out["alloc"].sum() == 10_000


def test_part_theil_sen_hand_values():
    from multiomics_biocypher_kg_ray.pipelines.queries import q_part_theil_sen

    # sizes 1,2,3 with per-size medians 100c, 300c, 400c
    # (size 2 has values [2,3,4] -> lower median 300c)
    rows = [(1, 1.0), (2, 2.0), (2, 3.0), (2, 4.0), (3, 4.0)]
    df = pd.DataFrame(
        {
            "p_partkey": range(len(rows)),
            "p_size": [r[0] for r in rows],
            "p_retailprice": [r[1] for r in rows],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "part.parquet"))
        out = q_part_theil_sen(d).to_pandas()
    row = out.iloc[0]
    # slopes: (300-100)/1=200, (400-100)/2=150, (400-300)/1=100 (ppm*1e6/c)
    # sorted [100, 150, 200] ppm*1e6 -> lower median 150 c/size
    assert row["n_sizes"] == 3
    assert row["n_pairs"] == 3
    assert row["ts_slope_ppm"] == 150_000_000


def test_minhash_estimate_audit_exact_dups():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_minhash_estimate_audit,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta " * 3
    uniq = " ".join(f"tok{i}" for i in range(30))
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [dup, dup, dup, uniq],
            "lang": "en",
            "source": "a",
            "n_chars": 1,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = q_minhash_estimate_audit(d).to_pandas()
    # the three identical docs form 3 candidate pairs; the unique doc none
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert pairs == {(1, 2), (1, 3), (2, 3)}
    assert (out["est_ppm"] == 1_000_000).all()
    assert (out["exact_ppm"] == 1_000_000).all()
    assert (out["err_ppm"] == 0).all()


def test_embedding_rp_distortion_single_axis():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_embedding_rp_distortion,
    )

    # pair (0,1): differs by 1.0 in ONE dim -> d = (1000,0,0,0);
    # every projected coordinate is (1000·s)² = 10⁶, so d2_proj = 8·10⁶
    # and ratio_ppm = 10⁶ exactly, independent of the sign draws.
    # pair (2,3): identical vectors -> d2_orig = 0, ratio NULL.
    df = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [
                [1.0, 0.0, 0.0, 0.0],
                [0.0, 0.0, 0.0, 0.0],
                [0.5, 0.5, 0.5, 0.5],
                [0.5, 0.5, 0.5, 0.5],
            ],
            "label": 0,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "embeddings.parquet"))
        out = (
            q_embedding_rp_distortion(d)
            .to_pandas()
            .set_index("vec_a")
            .sort_index()
        )
    assert out.index.tolist() == [0, 2]
    assert out.loc[0, "d2_orig"] == 1_000_000
    assert out.loc[0, "d2_proj"] == 8_000_000
    assert out.loc[0, "ratio_ppm"] == 1_000_000
    assert out.loc[2, "d2_orig"] == 0
    assert pd.isna(out.loc[2, "ratio_ppm"])


def test_orders_seasonal_strength_pure_weekday_signal():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_orders_seasonal_strength,
    )

    # 14 days, two weeks: revenue depends ONLY on weekday -> eta2 = 1
    days = pd.date_range("2024-01-01", periods=14, freq="D")
    rev = [float(d.dayofweek + 1) for d in days]
    df = pd.DataFrame(
        {
            "o_orderkey": range(14),
            "o_orderdate": days,
            "o_totalprice": rev,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "orders.parquet"))
        out = q_orders_seasonal_strength(d).to_pandas()
    row = out.iloc[0]
    assert row["n_days"] == 14
    assert row["k_weekdays"] == 7
    assert row["eta2_ppm"] == 1_000_000


def test_near_dup_threshold_curve_exact_dups():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_near_dup_threshold_curve,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta " * 3
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [dup, dup, dup],
            "lang": "en",
            "source": "a",
            "n_chars": 1,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = q_near_dup_threshold_curve(d).to_pandas()
    # all three pairs are exact dups: decile 10 (ppm 1e6), zero error
    assert out["decile"].tolist() == [10]
    assert out.iloc[0]["n_pairs"] == 3
    assert out.iloc[0]["mean_abs_err_ppm"] == 0
