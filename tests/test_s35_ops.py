"""Round-4 session-35 — predicate synonym candidates (hand edge sets with
known jaccard) and the functional-property violation audit."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data


def test_kg_pred_synonyms_hand_jaccard(monkeypatch):
    # drive the query body directly over a synthetic edge table by stubbing
    # the build: easier to reuse the op via its components
    from multiomics_biocypher_kg_ray.stages.dedup import bucket_pairs
    from multiomics_biocypher_kg_ray.stages.fastagg import (
        sorted_distinct,
        sorted_grouped_agg,
    )

    # p and q share 2 of p's 3 and q's 2 pairs -> jaccard 2/3
    rows = [
        ("a", "b", "p"),
        ("b", "c", "p"),
        ("c", "d", "p"),
        ("a", "b", "q"),
        ("b", "c", "q"),
        ("x", "y", "r"),
    ]
    trip = ray.data.from_arrow(
        pa.table(
            {
                "src": [r[0] for r in rows],
                "dst": [r[1] for r in rows],
                "pred": [r[2] for r in rows],
            }
        )
    ).repartition(2)
    trip = sorted_distinct(trip, ["src", "dst", "pred"]).materialize()
    pairs = bucket_pairs(trip, ["src", "dst"], id_col="pred", cap=None)
    nab = sorted_grouped_agg(
        pairs, ["doc_a", "doc_b"], [("doc_a", "count")], out_names=["n_shared"]
    ).to_pandas()
    got = nab.set_index(["doc_a", "doc_b"])["n_shared"].to_dict()
    assert got == {("p", "q"): 2}
    # jaccard = 2 / (3 + 2 - 2)
    assert 2 * 1_000_000 // 3 == 666666


def test_kg_functional_audit_on_testdata():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_kg_edges,
        q_kg_functional_audit,
    )

    sf = "/root/testdata/sf0.001"
    out = q_kg_functional_audit(sf).to_pandas().set_index("pred")
    edges = q_kg_edges(sf).to_pandas()
    # hand-roll the audit from the edge table
    trip = edges[["pred", "src", "dst"]].drop_duplicates()
    per = trip.groupby(["pred", "src"]).size()
    for pred, g in per.groupby(level=0):
        assert out.loc[pred, "n_subjects"] == len(g)
        nv = int((g > 1).sum())
        assert out.loc[pred, "n_violating"] == nv
        assert (
            out.loc[pred, "violation_ppm"]
            == nv * 1_000_000 // max(len(g), 1)
        )


def test_kg_pred_synonyms_on_testdata():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_kg_edges,
        q_kg_pred_synonyms,
    )

    sf = "/root/testdata/sf0.001"
    out = q_kg_pred_synonyms(sf).to_pandas()
    edges = q_kg_edges(sf).to_pandas()[["src", "dst", "pred"]].drop_duplicates()
    sets = {p: set(map(tuple, g[["src", "dst"]].to_numpy())) for p, g in edges.groupby("pred")}
    for r in out.itertuples():
        inter = len(sets[r.pred_a] & sets[r.pred_b])
        assert r.n_shared == inter
        assert r.n_a == len(sets[r.pred_a]) and r.n_b == len(sets[r.pred_b])
        assert r.jaccard_ppm == inter * 1_000_000 // (r.n_a + r.n_b - inter)
