"""Round-4 session-20 operators — Count-Min-Sketch audit (one-sided error,
exact-on-unique) and block jackknife (hand blocks, cluster assignment)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def test_cms_estimate_one_sided_and_order():
    from multiomics_biocypher_kg_ray.stages.sampling import cms_estimate

    vals = ["a"] * 100 + ["b"] * 50 + ["c"] * 10 + [f"x{i}" for i in range(200)]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(4)
    out = cms_estimate(ds, "v", k=3).to_pandas()
    assert list(out["v"]) == ["a", "b", "c"]
    assert list(out["true_n"]) == [100, 50, 10]
    # CMS never underestimates
    assert (out["cms_est"] >= out["true_n"]).all()
    # 360 values in a 4x1024 sketch: collisions add at most the tail mass
    assert (out["cms_est"] - out["true_n"]).max() <= 200


def test_cms_estimate_exact_when_sparse():
    from multiomics_biocypher_kg_ray.stages.sampling import cms_estimate

    # 3 values in 4096 cells: collision probability ~ 0 per row, and the
    # min over 4 independent rows makes a collision in ALL rows implausible
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(["p"] * 7 + ["q"] * 3 + ["r"] * 1)})
    )
    out = cms_estimate(ds, "v", k=3).to_pandas().set_index("v")
    assert out.loc["p", "cms_est"] == 7
    assert out.loc["q", "cms_est"] == 3
    assert out.loc["r", "cms_est"] == 1


def test_block_jackknife_hand_values():
    from multiomics_biocypher_kg_ray.stages.relational import block_jackknife
    from multiomics_biocypher_kg_ray.stages.sampling import _buckets_py

    # keys 0..19, 5 rows each, value = key (so block means differ)
    keys = np.repeat(np.arange(20, dtype=np.int64), 5)
    vals = keys.copy()
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ).repartition(3)
    out = block_jackknife(ds, "k", "v", n_blocks=8).to_pandas().iloc[0]
    N, S = 100, int(vals.sum())
    assert out["n_rows"] == N
    assert out["mean_micro"] == (1_000_000 * S) // N
    # plain-python replication with the md5 bucket twin
    blocks: dict[int, list[int]] = {}
    b = _buckets_py(list(keys), "jk") % 8
    for bi, vi in zip(b, vals):
        blocks.setdefault(int(bi), []).append(int(vi))
    B = len(blocks)
    assert out["n_blocks"] == B
    qs = [
        (1_000_000 * (S - sum(v))) // (N - len(v)) for v in blocks.values()
    ]
    mbar = sum(qs) // B
    sd = sum((q - mbar) ** 2 for q in qs)
    assert out["jk_var_micro2"] == ((B - 1) * sd) // B
    assert out["jk_var_micro2"] > 0


def test_block_jackknife_clusters_stay_together():
    from multiomics_biocypher_kg_ray.stages.relational import block_jackknife

    # a single key -> one block -> variance undefined (NULL), mean exact
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(np.zeros(10, np.int64)),
                "v": pa.array(np.arange(10, dtype=np.int64)),
            }
        )
    )
    out = block_jackknife(ds, "k", "v", n_blocks=8).to_pandas().iloc[0]
    assert out["n_blocks"] == 1
    assert out["mean_micro"] == (1_000_000 * 45) // 10
    assert out.isna()["jk_var_micro2"]
