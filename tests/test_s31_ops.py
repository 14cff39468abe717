"""Round-4 session-31 — embedding label margin (hand geometry, mislabeled
point detection), session-basket association rules (hand sessions with
confidence/lift), KG growth curve (week bucketing identity)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _emb_table(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "label": pa.array([r[1] for r in rows], pa.int32()),
                "embedding": pa.array(
                    [r[2] for r in rows], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(2)


def test_embedding_label_margin_separated_clusters():
    from multiomics_biocypher_kg_ray.stages.similarity import (
        embedding_label_margin,
    )

    # label 0 near (1, 0), label 1 near (-1, 0); v5 is mislabeled
    rows = [
        (1, 0, [1.0, 0.1]),
        (2, 0, [1.0, -0.1]),
        (3, 1, [-1.0, 0.1]),
        (4, 1, [-1.0, -0.1]),
        (5, 0, [-1.0, 0.0]),  # labeled 0 but sits in cluster 1
    ]
    out = embedding_label_margin(_emb_table(rows)).to_pandas().set_index("vec_id")
    # well-placed points have positive margin
    assert out.loc[1, "margin"] > 0
    assert out.loc[3, "margin"] > 0
    # the mislabeled point is closer to the other centroid
    assert out.loc[5, "margin"] < 0
    assert out.loc[5, "other_label"] == 1
    # exact integer identity: d2 equals the hand-computed quantized formula
    # quantization sees the float32-STORED values (list<float32> column), so
    # the hand twin must round-trip through float32 first
    def quant(v):
        return np.floor(
            np.array(v, dtype=np.float32).astype(np.float64) * 1e6
        ).astype(np.int64)

    q = quant([1.0, 0.1])
    # centroid of label 0 = floor-div mean of quantized members (ids 1,2,5)
    members = [quant(v) for _, lbl, v in rows if lbl == 0]
    c0 = np.sum(members, axis=0) // 3
    assert out.loc[1, "d2_own"] == int(((q - c0) ** 2).sum())


def test_session_type_rules_hand_baskets():
    from multiomics_biocypher_kg_ray.stages.events import session_type_rules

    base = pd.Timestamp("2024-01-01")
    # u1 session A: {view, click}; u1 session B (2h later): {view}
    # u2 session C: {view, click, purchase}
    rows = [
        (1, 0, "view", 0),
        (1, 1, "click", 60),
        (1, 2, "view", 7200),
        (2, 3, "view", 0),
        (2, 4, "click", 30),
        (2, 5, "purchase", 90),
    ]
    df = pd.DataFrame(
        {
            "event_id": [r[1] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": [r[2] for r in rows],
            "ts": [base + pd.Timedelta(seconds=r[3]) for r in rows],
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(2)
    out = session_type_rules(ds, gap_minutes=30).to_pandas()
    g = out.set_index(["type_a", "type_b"])
    # 3 sessions total; view in 3, click in 2, purchase in 1
    assert g.loc[("view", "click"), "n_ab"] == 2
    # conf(view -> click) = 2/3; conf(click -> view) = 2/2
    assert g.loc[("view", "click"), "conf_ppm"] == 2 * 1_000_000 // 3
    assert g.loc[("click", "view"), "conf_ppm"] == 1_000_000
    # lift(view, click) = 2*3*1e6 // (3*2) = 1e6 (independent-ish)
    assert g.loc[("view", "click"), "lift_ppm"] == 1_000_000
    assert g.loc[("click", "purchase"), "n_ab"] == 1
    # lift(click, purchase) = 1*3*1e6 // (2*1) = 1.5e6
    assert g.loc[("click", "purchase"), "lift_ppm"] == 1_500_000
    # symmetric support
    assert g.loc[("purchase", "click"), "n_ab"] == 1


def test_kg_growth_curve_week_buckets():
    from multiomics_biocypher_kg_ray.pipelines.queries import q_kg_growth_curve

    out = q_kg_growth_curve("/root/testdata/sf0.001").to_pandas()
    assert set(out["kind"]) <= {"edge", "node"}
    assert (out["n_new"] > 0).all()
    # every first-seen falls in epoch-week buckets >= 2024-01-01's week
    wk_2024 = pd.Timestamp("2024-01-01").value // 1000 // 604_800_000_000
    assert (out["week"] >= wk_2024 - 1).all()
    # node + edge totals match the lifespan tables' row counts
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_kg_edge_lifespan,
        q_kg_node_lifespan,
    )

    n_edges = q_kg_edge_lifespan("/root/testdata/sf0.001").count()
    n_nodes = q_kg_node_lifespan("/root/testdata/sf0.001").count()
    assert out[out["kind"] == "edge"]["n_new"].sum() == n_edges
    assert out[out["kind"] == "node"]["n_new"].sum() == n_nodes
