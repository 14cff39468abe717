import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.stages import events, relational


def test_to_cents_exact():
    t = pa.table({"v": [1.1, 185.22, 0.01, 99.999999999]})
    out = relational.to_cents(t, {"v": "cents"})
    assert out.column("cents").to_pylist() == [110, 18522, 1, 10000]


def test_preaggregate_matches_plain_groupby():
    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 1000),
            "v": rng.randint(0, 100, 1000).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    out = relational.preaggregate(ds, ["k"], ["v"]).to_pandas().set_index("k")
    expected = df.groupby("k").agg(n=("v", "size"), v=("v", "sum"))
    for k in "abc":
        assert out.loc[k, "v"] == expected.loc[k, "v"]
        assert out.loc[k, "n"] == expected.loc[k, "n"]


def test_top_k_per_group_deterministic_ties():
    df = pd.DataFrame(
        {"g": ["x"] * 4, "score": [5, 5, 3, 9], "id": [4, 2, 7, 1]}
    )
    ds = ray.data.from_pandas(df)
    out = (
        relational.top_k_per_group(ds, ["g"], [("score", False), ("id", True)], 3)
        .to_pandas()
        .sort_values("rank")
    )
    assert list(out["id"]) == [1, 2, 4]  # tie on score=5 broken by id asc


def test_percentile_buckets_integer_math():
    df = pd.DataFrame(
        {"g": ["a"] * 5, "v": [10.0, 20.0, 30.0, 40.0, 50.0], "id": [1, 2, 3, 4, 5]}
    )
    out = (
        relational.percentile_buckets(ray.data.from_pandas(df), ["g"], "v", "id")
        .to_pandas()
        .sort_values("rnk")
    )
    assert list(out["id"]) == [5, 4, 3, 2, 1]
    assert list(out["pct"]) == [100, 75, 50, 25, 0]
    assert list(out["bucket"]) == ["top10", "top25", "mid", "mid", "low"]


def test_distribution_stats_quantiles():
    df = pd.DataFrame({"g": ["a"] * 5, "v": [1.0, 2.0, 3.0, 4.0, 100.0]})
    out = relational.distribution_stats(
        ray.data.from_pandas(df), ["g"], "v"
    ).to_pandas()
    r = out.iloc[0]
    assert r["n"] == 5 and r["min_v"] == 1.0 and r["max_v"] == 100.0
    assert r["median"] == 3.0 and r["q1"] == 2.0 and r["q3"] == 4.0


def test_sessionize_gap():
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "event_id": [1, 2, 3, 4],
            "ts": [
                base,
                base + pd.Timedelta(minutes=10),
                base + pd.Timedelta(minutes=90),  # > 30min gap → new session
                base + pd.Timedelta(minutes=95),
            ],
        }
    )
    out = (
        events.sessionize(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("session_idx")
    )
    assert list(out["session_idx"]) == [0, 1]
    assert list(out["n_events"]) == [2, 2]


def test_asof_last_marker():
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "event_id": [1, 2, 3, 4],
            "event_type": ["purchase", "signup", "purchase", "purchase"],
            "ts": [base + pd.Timedelta(minutes=m) for m in (0, 5, 10, 20)],
        }
    )
    out = (
        events.asof_last_marker(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
    )
    assert list(out["event_id"]) == [1, 3, 4]
    assert pd.isna(out.iloc[0]["last_marker_ts"])  # purchase before any signup
    assert out.iloc[1]["last_marker_ts"] == base + pd.Timedelta(minutes=5)
