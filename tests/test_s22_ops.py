"""Round-4 session-22 operators — instruction-pair extraction (hand
conversations, adjacency strictness) and exact integer embedding
covariance (hand vectors vs numpy reference)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def test_qa_pairs_adjacency_strictness():
    from multiomics_biocypher_kg_ray.stages.convo import qa_pairs

    rows = [
        # a: u0 -> a1 pairs; a2 (self-continuation after assistant) does not
        ("a", 0, "user", "ask one"),
        ("a", 1, "assistant", "answer one"),
        ("a", 2, "assistant", "continuation"),
        # b: tool turn between user and assistant breaks adjacency
        ("b", 0, "user", "ask two"),
        ("b", 1, "tool", "tool output"),
        ("b", 2, "assistant", "late answer"),
        # c: plain pair
        ("c", 5, "user", "q"),
        ("c", 6, "assistant", "r"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows]),
                "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
                "role": pa.array([r[2] for r in rows]),
                "text": pa.array([r[3] for r in rows]),
            }
        )
    ).repartition(3)
    out = qa_pairs(ds).to_pandas().set_index(["conv_id", "turn_idx"])
    assert len(out) == 2
    assert out.loc[("a", 1), "prompt"] == "ask one"
    assert out.loc[("a", 1), "response"] == "answer one"
    assert out.loc[("c", 6), "prompt"] == "q"
    assert out.loc[("c", 6), "prompt_chars"] == 1
    assert ("b", 2) not in out.index  # tool turn breaks the pair


def test_embedding_covariance_vs_numpy():
    from multiomics_biocypher_kg_ray.stages.similarity import (
        embedding_covariance,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 4).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                )
            }
        )
    ).repartition(4)
    out = (
        embedding_covariance(ds, scale=1000.0)
        .to_pandas()
        .set_index(["dim_i", "dim_j"])
    )
    assert len(out) == 4 * 5 // 2
    q = np.floor(vecs.astype(np.float64) * 1000.0).astype(np.int64)
    n = q.shape[0]
    for i in range(4):
        for j in range(i, 4):
            sxy = int((q[:, i] * q[:, j]).sum())
            exp = (n * sxy - int(q[:, i].sum()) * int(q[:, j].sum())) // n
            assert out.loc[(i, j), "cov_m2"] == exp
    # diagonal entries are (scaled) variances: strictly positive
    assert all(out.loc[(i, i), "cov_m2"] > 0 for i in range(4))
    # partition-independence
    out2 = (
        embedding_covariance(ds.repartition(9), scale=1000.0)
        .to_pandas()
        .set_index(["dim_i", "dim_j"])
    )
    assert (out2["cov_m2"] == out["cov_m2"]).all()
