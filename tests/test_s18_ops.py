"""Round-4 session-18 operators — k-step ordered funnel (hand event
streams, gap windows, greedy-anchor semantics) and reciprocal-rank fusion
(hand rankings)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _events(rows):
    # rows: (user_id, event_type, ts_seconds)
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    pd.to_datetime(
                        [r[2] for r in rows], unit="s", origin="2024-01-01"
                    ),
                    pa.timestamp("us"),
                ),
            }
        )
    ).repartition(3)


def test_funnel_ksteps_hand_streams():
    from multiomics_biocypher_kg_ray.stages.events import funnel_ksteps

    rows = [
        # u1 completes all three steps in order
        (1, "signup", 0),
        (1, "click", 10),
        (1, "purchase", 20),
        # u2: click BEFORE signup only -> stops after step 0
        (2, "click", 5),
        (2, "signup", 50),
        # u3: signup then click, no purchase
        (3, "signup", 0),
        (3, "click", 100),
        # u4 never signs up
        (4, "purchase", 7),
    ]
    out = (
        funnel_ksteps(_events(rows), ["signup", "click", "purchase"])
        .to_pandas()
        .set_index("step_idx")
    )
    assert list(out["step_type"]) == ["signup", "click", "purchase"]
    assert out.loc[0, "n_users"] == 3  # u1, u2, u3
    assert out.loc[1, "n_users"] == 2  # u1, u3
    assert out.loc[2, "n_users"] == 1  # u1


def test_funnel_ksteps_gap_window_and_greedy_anchor():
    from multiomics_biocypher_kg_ray.stages.events import funnel_ksteps

    rows = [
        # u1: click arrives 100s after signup -> outside a 50s window
        (1, "signup", 0),
        (1, "click", 100),
        # u2: first click at 30s anchors the purchase window; purchase at
        # 70s is within 50s of THAT anchor (greedy-earliest anchor)
        (2, "signup", 0),
        (2, "click", 30),
        (2, "click", 49),
        (2, "purchase", 70),
    ]
    out = (
        funnel_ksteps(
            _events(rows), ["signup", "click", "purchase"], max_gap_s=50
        )
        .to_pandas()
        .set_index("step_idx")
    )
    assert out.loc[0, "n_users"] == 2
    assert out.loc[1, "n_users"] == 1  # only u2's click is inside the window
    assert out.loc[2, "n_users"] == 1


def test_rrf_fuse_hand_rankings():
    from multiomics_biocypher_kg_ray.stages.relational import rrf_fuse

    def ranked(ids):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "rank": pa.array(
                        np.arange(1, len(ids) + 1, dtype=np.int64), pa.int64()
                    ),
                }
            )
        )

    a = ranked([10, 20, 30])  # ranker A: 10 first
    b = ranked([20, 10, 40])  # ranker B: 20 first
    out = rrf_fuse([a, b], "doc_id", k0=60, k=4).to_pandas()
    exp = {
        10: 1_000_000 // 61 + 1_000_000 // 62,
        20: 1_000_000 // 62 + 1_000_000 // 61,
        30: 1_000_000 // 63,
        40: 1_000_000 // 63,
    }
    got = dict(zip(out["doc_id"], out["rrf_micro"]))
    assert got == exp
    # 10 and 20 tie exactly -> doc_id ascending breaks the tie
    assert list(out["doc_id"])[:2] == [10, 20]
    assert dict(zip(out["doc_id"], out["n_rankers"]))[10] == 2
    assert dict(zip(out["doc_id"], out["n_rankers"]))[30] == 1
