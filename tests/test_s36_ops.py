"""Round-4 session-36 — semantic dedup clusters (hand-planted embedding
clusters with transitive chains and singletons)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def test_embedding_dedup_clusters_hand_clusters():
    from multiomics_biocypher_kg_ray.stages import dedup, similarity

    # cluster A: ids 1,2,3 nearly parallel; B: 10,11; singleton: 20
    def v(base, eps):
        x = np.array(base, dtype=np.float64)
        x[0] += eps
        return [float(t) for t in x]

    rows = [
        (1, v([1, 0, 0, 0], 0.0)),
        (2, v([1, 0, 0, 0], 0.01)),
        (3, v([1, 0, 0, 0], 0.02)),
        (10, v([0, 1, 0, 0], 0.0)),
        (11, v([0, 1, 0, 0], 0.01)),
        (20, v([0, 0, 1, 0], 0.0)),
    ]
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    pairs = similarity.embedding_near_dup_pairs_blocked(ds, threshold=0.95)
    out = (
        dedup.near_dup_clusters(
            ray.data.from_arrow(t.select(["vec_id"])),
            pairs,
            id_col="vec_id",
            pair_cols=("id_a", "id_b"),
        )
        .to_pandas()
        .set_index("vec_id")
    )
    assert out.loc[1, "cluster_id"] == 1 and out.loc[3, "cluster_id"] == 1
    assert out.loc[1, "cluster_size"] == 3
    assert bool(out.loc[1, "is_canonical"]) and not bool(out.loc[2, "is_canonical"])
    assert out.loc[10, "cluster_id"] == 10 and out.loc[11, "cluster_id"] == 10
    assert out.loc[20, "cluster_size"] == 1 and bool(out.loc[20, "is_canonical"])
    # exactly 3 canonical rows -> the deduped corpus size
    assert int(out["is_canonical"].sum()) == 3
