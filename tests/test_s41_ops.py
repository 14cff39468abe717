"""Round-4 session-41 — mention context windows (boundary NULLs, correct
neighbors) and daily volume anomaly z-scores (hand counts)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd


def test_kg_mention_contexts_neighbors_and_boundaries():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_kg_mention_contexts,
        q_kg_transcripts,
    )

    sf = "/root/testdata/sf0.001"
    out = q_kg_mention_contexts(sf).to_pandas()
    tx = q_kg_transcripts(sf).to_pandas().set_index(["conv_id", "turn_idx"])[
        "text"
    ]
    assert len(out) > 0
    # first-turn mentions have NULL prev context
    first = out[out["turn_idx"] == 0]
    assert len(first) and first["prev_text"].isna().all()
    # spot-check 20 rows: prev/cur/next equal the transcript table
    for r in out.head(20).itertuples():
        assert tx[(r.conv_id, r.turn_idx)] == r.text
        if r.turn_idx > 0:
            assert tx[(r.conv_id, r.turn_idx - 1)] == r.prev_text
        if (r.conv_id, r.turn_idx + 1) in tx.index:
            assert tx[(r.conv_id, r.turn_idx + 1)] == r.next_text
        else:
            assert pd.isna(r.next_text)


def test_event_daily_anomaly_hand_zscore():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_event_daily_anomaly,
    )

    # type A: daily counts 1, 3, 2 across 3 days; type B constant -> NULL z
    rows = (
        [("a", "2024-01-01")]
        + [("a", "2024-01-02")] * 3
        + [("a", "2024-01-03")] * 2
        + [("b", "2024-01-01"), ("b", "2024-01-02")]
    )
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": 1,
            "event_type": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "value": 1.0,
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q_event_daily_anomaly(d).to_pandas()
    a = out[out["event_type"] == "a"].set_index("day")["zscore_ppm"]
    # z for count 3 among [1, 3, 2]: (cnt*x - s)/sqrt(cnt*s2 - s^2)
    cnt, s, s2 = 3, 6, 14
    want = int(np.floor((cnt * 3 - s) * 1e6 / np.sqrt(cnt * s2 - s * s)))
    day2 = pd.Timestamp("2024-01-02").value // 1000 // 86_400_000_000
    assert a[day2] == want
    b = out[out["event_type"] == "b"]
    assert b["zscore_ppm"].isna().all()  # zero variance -> NULL
