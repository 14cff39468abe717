"""Round-4 session-24 — filtered negative sampling for link prediction
(hand graph: collision filters, determinism, no positives leak)."""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _edges(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array(["p"] * len(rows), pa.string()),
                "dst": pa.array([r[1] for r in rows], pa.string()),
                "weight": pa.array([1] * len(rows), pa.int64()),
                "evidence": pa.array(["e"] * len(rows), pa.string()),
            }
        )
    ).repartition(2)


def test_negative_samples_no_positive_leak_and_determinism():
    from multiomics_biocypher_kg_ray.stages.graph import negative_samples
    from multiomics_biocypher_kg_ray.stages.sampling import _hash60_py

    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "b")]
    out = negative_samples(_edges(rows)).to_pandas()
    pos = set(rows)
    for r in out.itertuples():
        assert (r.src, r.dst_neg) not in pos  # never an existing edge
        assert r.src != r.dst_neg  # never a self-loop
    # deterministic replication of the pick + filters
    nodes = sorted({n for p in rows for n in p})
    exp = set()
    for s, d in sorted(set(rows)):
        h = int(_hash60_py([f"{s}|{d}"], "neg")[0]) % len(nodes)
        cand = nodes[h]
        if cand != s and cand != d and (s, cand) not in pos:
            exp.add((s, cand))
    got = {(r.src, r.dst_neg) for r in out.itertuples()}
    assert got == exp
    # different partitioning, identical output
    out2 = negative_samples(_edges(rows * 2)).to_pandas()  # dup edges collapse
    got2 = {(r.src, r.dst_neg) for r in out2.itertuples()}
    assert got2 == exp
