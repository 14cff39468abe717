"""Round-4 session-32 — last-touch attribution (hand timeline: window
expiry, tie-at-same-µs code resolution, unattributed bucket) and the
deterministic per-group hash sample (size, stability, membership-only
sensitivity)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa

import ray.data


def _events_dir(d, rows):
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
            "ts": pd.to_datetime([r[3] for r in rows]),
            "value": [r[4] for r in rows],
            "props": "",
        }
    ).to_parquet(os.path.join(d, "events.parquet"))


def test_last_touch_attribution_hand_timeline():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_last_touch_attribution,
    )

    rows = [
        # u1: click then purchase 1h later -> click credited 10.00
        (0, 1, "click", "2024-01-01 00:00:00", 0.0),
        (1, 1, "purchase", "2024-01-01 01:00:00", 10.0),
        # u1: second purchase 30h after the click -> outside 24h -> (none)
        (2, 1, "purchase", "2024-01-02 06:00:00", 5.0),
        # u2: view, then click at the SAME µs -> click wins (higher code)
        (3, 2, "view", "2024-01-03 00:00:00", 0.0),
        (4, 2, "click", "2024-01-03 00:00:00", 0.0),
        (5, 2, "purchase", "2024-01-03 00:10:00", 7.0),
        # u3: purchase with no prior events -> (none)
        (6, 3, "purchase", "2024-01-04 00:00:00", 3.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(d, rows)
        out = q_last_touch_attribution(d).to_pandas().set_index(
            "attributed_type"
        )
    # alphabetical codes over {click, view}: click=0, view=1 -> at equal ts
    # the HIGHER code wins the encoded max -> view, not click
    assert out.loc["view", "n_purchases"] == 1
    assert out.loc["view", "value_cents"] == 700
    assert out.loc["click", "n_purchases"] == 1
    assert out.loc["click", "value_cents"] == 1000
    assert out.loc["(none)", "n_purchases"] == 2
    assert out.loc["(none)", "value_cents"] == 800


def test_group_sample_k_deterministic_and_stable():
    from multiomics_biocypher_kg_ray.stages.sampling import group_sample_k

    t = pa.table(
        {
            "doc_id": pa.array(list(range(100)), pa.int64()),
            "source": pa.array(
                ["a" if i % 2 == 0 else "b" for i in range(100)], pa.string()
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    out1 = group_sample_k(ds, "source", "doc_id", k=5).to_pandas()
    out2 = group_sample_k(
        ray.data.from_arrow(t).repartition(7), "source", "doc_id", k=5
    ).to_pandas()
    # exactly k per group; identical at any partitioning
    assert out1.groupby("source").size().to_dict() == {"a": 5, "b": 5}
    a = out1.sort_values(["source", "doc_id"]).reset_index(drop=True)
    b = out2.sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # key-stability: removing NON-sampled members leaves the sample intact
    sampled = set(out1[out1["source"] == "a"]["doc_id"])
    keep = sampled | {i for i in range(100) if i % 2 == 1} | {0, 2, 4}
    t2 = t.filter(
        pa.compute.is_in(t.column("doc_id"), value_set=pa.array(sorted(keep)))
    )
    out3 = group_sample_k(
        ray.data.from_arrow(t2), "source", "doc_id", k=5
    ).to_pandas()
    assert set(out3[out3["source"] == "a"]["doc_id"]) == sampled
