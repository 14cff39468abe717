"""Round-4 session-17 operators — Cohen's kappa (hand confusion matrix),
weighted PageRank (hand recurrence), Markov entropy rate (deterministic vs
uniform chains)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data


def test_cohens_kappa_hand_matrix():
    from multiomics_biocypher_kg_ray.stages.relational import cohens_kappa

    # classic 2x2: a=[y,y,y,n...] — confusion yy=20, yn=5, ny=10, nn=15
    a = ["y"] * 25 + ["n"] * 25
    b = ["y"] * 20 + ["n"] * 5 + ["y"] * 10 + ["n"] * 15
    ds = ray.data.from_arrow(
        pa.table({"a": pa.array(a), "b": pa.array(b)})
    ).repartition(4)
    out = cohens_kappa(ds, "a", "b").to_pandas().iloc[0]
    n, d = 50, 35
    s = 25 * 30 + 25 * 20  # row_y*col_y + row_n*col_n
    exp = (1_000_000 * (n * d - s)) // (n * n - s)
    assert out["n_rows"] == n and out["n_agree"] == d
    assert out["kappa_micro"] == exp  # = 400000 (kappa 0.4)
    assert exp == 400_000


def test_cohens_kappa_perfect_and_chance():
    from multiomics_biocypher_kg_ray.stages.relational import cohens_kappa

    labs = ["x", "y", "z"] * 10
    ds = ray.data.from_arrow(
        pa.table({"a": pa.array(labs), "b": pa.array(labs)})
    )
    assert cohens_kappa(ds, "a", "b").to_pandas().iloc[0]["kappa_micro"] == 1_000_000
    # independent marginals -> kappa ~ 0 (exactly 0 for this balanced design)
    a2 = ["x"] * 10 + ["y"] * 10
    b2 = (["x"] * 5 + ["y"] * 5) * 2
    ds2 = ray.data.from_arrow(pa.table({"a": pa.array(a2), "b": pa.array(b2)}))
    assert cohens_kappa(ds2, "a", "b").to_pandas().iloc[0]["kappa_micro"] == 0


def _edges(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array(["p"] * len(rows), pa.string()),
                "dst": pa.array([r[1] for r in rows], pa.string()),
                "weight": pa.array([r[2] for r in rows], pa.int64()),
                "evidence": pa.array(["e"] * len(rows), pa.string()),
            }
        )
    ).repartition(2)


def _wpr_reference(rows, iters=2, damping=85, scale=1_000_000):
    agg: dict = {}
    for s, d, w in rows:
        if s != d:
            agg[(s, d)] = agg.get((s, d), 0) + w
    wsum: dict = {}
    for (s, _), w in agg.items():
        wsum[s] = wsum.get(s, 0) + w
    nodes = sorted({n for p in agg for n in p})
    base = scale * (100 - damping) // 100
    score = {n: scale for n in nodes}
    for _ in range(iters):
        score = {
            n: base
            + damping
            * sum(
                score[s] * w // wsum[s] for (s, d), w in agg.items() if d == n
            )
            // 100
            for n in nodes
        }
    return score


def test_weighted_pagerank_hand_graph():
    from multiomics_biocypher_kg_ray.stages.graph import pagerank

    rows = [
        ("a", "b", 9),  # a sends 90% of its mass to b...
        ("a", "c", 1),  # ...and 10% to c
        ("b", "a", 1),
        ("c", "a", 1),
        ("a", "b", 3),  # parallel edge: must pre-sum to w=12
    ]
    out = (
        pagerank(_edges(rows), iters=2, weighted=True)
        .to_pandas()
        .set_index("node")["pr_score"]
        .to_dict()
    )
    assert out == _wpr_reference(rows)
    # b receives the lion's share of a's mass
    assert out["b"] > out["c"]


def test_markov_entropy_rate_extremes():
    import os
    import tempfile

    import pandas as pd

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_event_markov_entropy,
    )

    def run(types):
        df = pd.DataFrame(
            {
                "event_id": range(len(types)),
                "ts": pd.to_datetime(
                    np.arange(len(types)), unit="s", origin="2024-01-01"
                ),
                "user_id": 1,
                "event_type": types,
                "value": 1.0,
                "props": "",
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            return q_event_markov_entropy(d).to_pandas().iloc[0]

    # deterministic cycle a->b->a->b: every state fixes its successor
    det = run(["a", "b"] * 20)
    assert det["entropy_rate_milli"] == 0
    # from state a, successors split evenly between b and c; only 20 of the
    # 39 transitions leave state a -> rate = (20/39)*ln 2, via the same
    # single-floor quantized identity in plain python
    mixed = run(["a", "b", "a", "c"] * 10)
    cells = {("a", "b"): 10, ("a", "c"): 10, ("b", "a"): 10, ("c", "a"): 9}
    ni = {"a": 20, "b": 10, "c": 9}

    def L(x):
        return math.floor(math.log(x) * 1000)

    hi = sum(v * L(v) for v in ni.values())
    lo = sum(v * L(v) for v in cells.values())
    exp = (hi - lo) // sum(cells.values())
    assert int(mixed["entropy_rate_milli"]) == exp
    assert abs(exp - int(20 / 39 * math.log(2) * 1000)) <= 5
