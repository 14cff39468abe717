"""Round-4 session-38 — stream-ordering audit (hand inversions) and the KG
degree-Gini (hand distribution identity)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd


def test_events_order_audit_hand_inversions():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_events_order_audit,
    )

    # u1 arrival order 0,1,2,3 with ts 10, 5, 7, 20 -> inversions at
    # event 1 (5 < 10); event 2 (7 > 5 ok); event 3 ok -> 1 inversion / 4
    # u2 perfectly ordered -> 0
    rows = [
        (0, 1, 10),
        (1, 1, 5),
        (2, 1, 7),
        (3, 1, 20),
        (4, 2, 1),
        (5, 2, 2),
    ]
    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "event_type": "click",
            "ts": pd.to_datetime([r[2] for r in rows], unit="s"),
            "value": 1.0,
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q_events_order_audit(d).to_pandas().set_index("user_id")
    assert out.loc[1, "n_events"] == 4
    assert out.loc[1, "n_inversions"] == 1
    assert out.loc[1, "inversion_ppm"] == 250000
    assert out.loc[2, "n_inversions"] == 0


def test_kg_degree_gini_matches_hand_formula():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_kg_degree_gini,
        q_kg_node_degree,
    )

    sf = "/root/testdata/sf0.001"
    out = q_kg_degree_gini(sf).to_pandas()
    assert len(out) == 1
    deg = np.sort(q_kg_node_degree(sf).to_pandas()["degree"].to_numpy())
    n, s = len(deg), deg.sum()
    i = np.arange(1, n + 1)
    g_num = float(((2 * i - n - 1) * deg).sum())
    want = int(np.floor(g_num * 1_000_000.0 / (n * s)))
    assert int(out["gini_ppm"].iloc[0]) == want
    assert int(out["n"].iloc[0]) == n and int(out["total"].iloc[0]) == s
