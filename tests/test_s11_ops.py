"""Round-4 session-11 operators — per-dimension embedding stats (hand
vectors, dead dimension), IQR fence outliers (hand distribution), packed
first/last value (order and tie-break by event id)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.similarity import embedding_dim_stats


def test_embedding_dim_stats_hand_vectors():
    vecs = [[1.0, 0.0], [3.0, 0.0]]
    ds = ray.data.from_arrow(
        pa.table({"embedding": pa.array(vecs, pa.list_(pa.float32()))})
    ).repartition(2)
    out = embedding_dim_stats(ds).to_pandas().set_index("dim")
    assert out.loc[0, "n_vecs"] == 2
    assert out.loc[0, "mean_ppm"] == 2_000_000.0
    # var of {1e6, 3e6} (population) = 1e12
    assert out.loc[0, "var_ppm2"] == 1e12
    # dimension 1 is dead: zero mean, zero variance
    assert out.loc[1, "mean_ppm"] == 0.0 and out.loc[1, "var_ppm2"] == 0.0


def _events_parquet(d, values, ts=None):
    n = len(values)
    df = pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": 1,
            "ts": pd.to_datetime(ts if ts is not None else range(n), unit="s"),
            "event_type": "click",
            "value": values,
            "props": "",
        }
    )
    df.to_parquet(os.path.join(d, "events.parquet"))


def test_iqr_fence_hand_distribution():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_events_outlier_iqr,
    )

    # values (cents): 8 values 1..8 dollars plus one 100-dollar spike.
    # disc quantiles of n=9: q1 = 3rd value (300), q3 = 7th (700), IQR 400
    # fences: [300-600, 700+600] = [-300, 1300] -> only 10000 is high
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0]
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, vals)
        out = q_events_outlier_iqr(d).to_pandas().iloc[0]
    assert out["n"] == 9
    assert out["n_low"] == 0 and out["n_high"] == 1 and out["n_outliers"] == 1


def test_first_last_value_order_and_tie():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_user_first_last_value,
    )

    # same ts for the first two events: event_id breaks the tie
    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, [5.0, 7.0, 9.0], ts=[10, 10, 20])
        out = q_user_first_last_value(d).to_pandas().iloc[0]
    assert out["first_value"] == 500
    assert out["last_value"] == 900
    assert out["delta_cents"] == 400


def test_first_last_value_negative_values():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_user_first_last_value,
    )

    with tempfile.TemporaryDirectory() as d:
        _events_parquet(d, [-2.5, 1.0], ts=[1, 2])
        out = q_user_first_last_value(d).to_pandas().iloc[0]
    assert out["first_value"] == -250
    assert out["last_value"] == 100
    assert out["delta_cents"] == 350
