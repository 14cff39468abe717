"""Round-4 session-14 compositions — predicate-diversity entropy per KG
node (built graph smoke + hand value) and per-doc token HHI (repetition
extremes)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)


def test_doc_token_hhi_extremes():
    import os
    import tempfile

    from multiomics_biocypher_kg_ray.pipelines.queries import q_doc_token_hhi

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["spam spam spam spam", "a b c d", "a a b b"],
            "lang": "en",
            "source": "t",
            "n_chars": 1,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = q_doc_token_hhi(d).to_pandas().set_index("doc_id")
    assert out.loc[0, "hhi_e6"] == 1_000_000  # one token repeated
    assert out.loc[0, "n_members"] == 1 and out.loc[0, "total"] == 4
    assert out.loc[1, "hhi_e6"] == 250_000  # 4 distinct, uniform
    assert out.loc[2, "hhi_e6"] == 500_000  # two tokens, 2+2


def test_pred_entropy_on_hand_edges():
    from multiomics_biocypher_kg_ray.stages.relational import group_entropy

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(["n1"] * 4 + ["n2"] * 3, pa.string()),
                "pred": pa.array(
                    ["uses", "calls", "uses", "calls", "spam", "spam", "spam"],
                    pa.string(),
                ),
            }
        )
    ).repartition(2)
    out = (
        group_entropy(edges, "src", "pred").to_pandas().set_index("src")
    )
    # n1: 2+2 uniform over two predicates -> quantized ln 2
    L4 = int(np.floor(np.log(4.0) * 1000))
    L2 = int(np.floor(np.log(2.0) * 1000))
    assert out.loc["n1", "entropy_milli"] == (4 * L4 - 4 * L2) // 4
    # n2: single predicate -> 0 (the template-noise hub signature)
    assert out.loc["n2", "entropy_milli"] == 0


def test_skyline_2d_hand_dominance():
    from multiomics_biocypher_kg_ray.stages.relational import skyline_2d

    # minimize both axes. points: (1,5) frontier; (2,5) dominated by (1,5)
    # (x strict, y tied); (2,3) frontier; (3,3) dominated; (4,1) frontier;
    # (5,2) dominated; duplicate x keeps only min y: (2,9) collapses
    pts = [(1, 5), (2, 5), (2, 3), (2, 9), (3, 3), (4, 1), (5, 2)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "x": pa.array([p[0] for p in pts], pa.int64()),
                "y": pa.array([p[1] for p in pts], pa.int64()),
            }
        )
    ).repartition(3)
    out = (
        skyline_2d(ds, "x", "y")
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.values)) == [(1, 5), (2, 3), (4, 1)]
