"""Round-4 session-27 — churn feature/label table (leakage boundaries) and
hashing-trick featurizer (conservation + determinism)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd


def test_user_churn_labels_leakage_boundaries():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_user_churn_labels,
    )

    # timeline 0..99s; cutoff = 49.5s ((0 + 99e6) // 2 µs)
    # u1: clicks before cutoff, purchase INSIDE the label window -> label 1
    # u2: view before cutoff, purchase at 99s also inside the 7d window -> 1
    # u3: only post-cutoff activity -> excluded (no feature-window events)
    # u4: purchase at 49s is BEFORE the cutoff: a feature, not a label
    rows = [
        (1, "click", 10),
        (1, "click", 20),
        (1, "purchase", 52),
        (2, "view", 0),
        (2, "purchase", 99),  # label window = (49, 49 + 7d] covers it...
        (3, "error", 80),
        (4, "purchase", 49),
    ]
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime(
                [r[2] for r in rows], unit="s", origin="2024-01-01"
            ),
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "value": 1.0,
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = (
            q_user_churn_labels(d).to_pandas().set_index("user_id")
        )
    assert 3 not in out.index  # no feature-window activity
    assert out.loc[1, "n_click"] == 2 and out.loc[1, "label"] == 1
    # 99s is within 7 days of the 49.5s cutoff -> label 1 for u2 as well
    assert out.loc[2, "n_view"] == 1 and out.loc[2, "label"] == 1
    # purchase at the cutoff is a feature (<= cutoff), not a label (> cutoff)
    assert out.loc[4, "n_purchase"] == 1 and out.loc[4, "label"] == 0


def test_doc_hashed_features_conservation_and_determinism():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_doc_hashed_features,
    )

    texts = ["a b c a", "d e", "", "f f f f f"]
    df = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": 1,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = q_doc_hashed_features(d).to_pandas()
        out2 = q_doc_hashed_features(d).to_pandas()
    # token-count conservation per doc
    per_doc = out.groupby("doc_id")["n"].sum().to_dict()
    assert per_doc == {0: 4, 1: 2, 3: 5}
    assert 2 not in per_doc  # empty doc contributes nothing
    # all buckets within range; deterministic across runs
    assert out["feature_idx"].between(0, 255).all()
    a = out.sort_values(["doc_id", "feature_idx"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "feature_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # identical tokens land in the same bucket -> doc 3 has exactly one row
    assert len(out[out["doc_id"] == 3]) == 1
    assert int(out[out["doc_id"] == 3]["n"].iloc[0]) == 5


def test_embedding_top_pc_finds_dominant_axis():
    import pyarrow as pa

    import ray.data
    from multiomics_biocypher_kg_ray.stages.similarity import embedding_top_pc

    # dim 1 carries 100x the variance of the others: the power iteration
    # must converge onto it
    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 4).astype(np.float64) * 0.01
    vecs[:, 1] += rng.randn(200) * 1.0
    ds = ray.data.from_arrow(
        pa.table(
            {
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                )
            }
        )
    ).repartition(3)
    out = embedding_top_pc(ds).to_pandas().set_index("dim")["v_micro"]
    assert abs(out.loc[1]) == out.abs().max()
    assert out.abs().max() == 1_000_000  # renormalized each round
    assert out.loc[1] ** 2 > 100 * max(
        out.loc[d] ** 2 for d in (0, 2, 3)
    )
