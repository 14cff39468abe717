"""Round-4 session-30 — integer modularity contributions (two-clique hand
graph), node lifespan (endpoint union), cohort LTV curve (multi-month hand
timeline with running cumulative)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa

import ray.data


def test_modularity_two_cliques():
    from multiomics_biocypher_kg_ray.stages.graph import modularity_by_label

    # two triangles joined by one bridge: LPA(3) finds... whatever it finds
    # deterministically; modularity identities must hold regardless:
    # sum(n_intra) <= m, sum(deg_sum) == 2m, and q_num == 4*m*e_c - d_c^2
    tri1 = [("a1", "a2"), ("a2", "a3"), ("a1", "a3")]
    tri2 = [("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
    bridge = [("a1", "b1")]
    e = tri1 + tri2 + bridge
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": [x for x, _ in e],
                "pred": ["p"] * len(e),
                "dst": [y for _, y in e],
            }
        )
    ).repartition(2)
    out = modularity_by_label(edges, rounds=3).to_pandas()
    m = len(e)  # already distinct, no self loops
    assert out["n_intra"].sum() <= m
    assert out["deg_sum"].sum() == 2 * m
    for r in out.itertuples():
        assert r.q_num == 4 * m * r.n_intra - r.deg_sum**2
    # a perfect 2-community split of this graph would give each community
    # e_c = 3, d_c = 7 -> q_num = 4*7*3 - 49 = 35 > 0; LPA labels both
    # triangles into communities with non-random structure, so total
    # modularity numerator over 4m^2 must be > the single-community value 0
    # OR the partition collapsed to one community (q_num = 4m*m - (2m)^2 = 0)
    total = out["q_num"].sum()
    assert total >= 0


def test_modularity_single_community_is_zero():
    from multiomics_biocypher_kg_ray.stages.graph import modularity_by_label

    # a triangle: LPA collapses to one label; q_num = 4*3*3 - 6^2 = 0
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": ["x", "y", "x"],
                "pred": ["p"] * 3,
                "dst": ["y", "z", "z"],
            }
        )
    )
    out = modularity_by_label(edges, rounds=3).to_pandas()
    if len(out) == 1:
        assert out["q_num"].iloc[0] == 0
        assert out["n_intra"].iloc[0] == 3
        assert out["deg_sum"].iloc[0] == 6
    else:  # partition didn't collapse: identities still hold
        assert out["deg_sum"].sum() == 6


def test_node_lifespan_endpoint_union():
    from multiomics_biocypher_kg_ray.stages.materialize import node_lifespan

    base = pd.Timestamp("2024-03-01")
    linked = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c2"],
                "turn_idx": [0, 0],
                "subj_id": ["e1", "e2"],
                "pred": ["joins", "joins"],
                "obj_id": ["e2", "e3"],
            }
        )
    )
    canon = pa.table(
        {
            "member": ["e1", "e2", "e3"],
            "canonical_id": ["E1", "E2", "E3"],
        }
    )
    transcripts = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c2"],
                "turn_idx": [0, 0],
                "ts": pa.array(
                    [base, base + pd.Timedelta(days=1)], pa.timestamp("us")
                ),
            }
        )
    )
    out = node_lifespan(linked, canon, transcripts).to_pandas().set_index("id")
    # E2 appears in both mentions (obj of first, subj of second)
    assert out.loc["E2", "n_mentions"] == 2
    assert out.loc["E2", "first_seen"] == base
    assert out.loc["E2", "last_seen"] == base + pd.Timedelta(days=1)
    assert out.loc["E1", "n_mentions"] == 1
    assert out.loc["E3", "n_mentions"] == 1


def test_cohort_ltv_multi_month_curve():
    from multiomics_biocypher_kg_ray.pipelines.queries import q_cohort_ltv

    rows = [
        # u1: cohort Jan, spends 10 in Jan, 20 in Feb, 30 in Apr
        (1, "2024-01-05", 10.0),
        (1, "2024-02-10", 20.0),
        (1, "2024-04-01", 30.0),
        # u2: cohort Jan, spends 5 in Jan only
        (2, "2024-01-20", 5.0),
        # u3: cohort Feb, spends 7 in Feb, 1 in Mar
        (3, "2024-02-02", 7.0),
        (3, "2024-03-02", 1.0),
    ]
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "event_type": "purchase",
            "value": [r[2] for r in rows],
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q_cohort_ltv(d).to_pandas()
    jan = 2024 * 12 + 1
    feb = jan + 1
    g = out.set_index(["cohort_ym", "month_offset"])
    assert g.loc[(jan, 0), "n_users"] == 2
    assert g.loc[(jan, 0), "ltv_cents"] == 1500
    assert g.loc[(jan, 1), "ltv_cents"] == 2000
    assert g.loc[(jan, 1), "cum_cents"] == 3500
    # the gap month (offset 2 has no activity) is absent; offset 3 cumsum
    # still accumulates over PRESENT offsets only
    assert (jan, 2) not in g.index
    assert g.loc[(jan, 3), "cum_cents"] == 6500
    assert g.loc[(feb, 0), "ltv_cents"] == 700
    assert g.loc[(feb, 1), "cum_cents"] == 800
