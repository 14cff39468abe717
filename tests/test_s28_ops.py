"""Round-4 session-28 — typed 2-hop meta-path census (factorized per-mid
profile product vs hand-enumerated paths), NB source-classifier confusion
(separable vocabularies, prior-only tie-break), source-KL (identity zero,
hand-computed asymmetry)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def test_metapath_census_hand_counts():
    from multiomics_biocypher_kg_ray.pipelines.queries import metapath_census

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": ["ent_1", "doc_2", "doc_2", "ent_5"],
                "pred": ["p", "q", "q", "p"],
                "dst": ["doc_2", "ent_3", "doc_4", "doc_2"],
            }
        )
    ).repartition(2)
    out = metapath_census(edges).to_pandas()
    got = {
        (r.src_type, r.pred1, r.mid_type, r.pred2, r.dst_type): r.n_paths
        for r in out.itertuples()
    }
    # mid doc_2: 2 in-edges (ent,p) x out-edges {(q,ent), (q,doc)}
    assert got == {
        ("ent", "p", "doc", "q", "ent"): 2,
        ("ent", "p", "doc", "q", "doc"): 2,
    }


def test_metapath_census_matches_self_join_definition():
    """Factorized profile product == naive pandas edge self-join count."""
    from multiomics_biocypher_kg_ray.pipelines.queries import metapath_census

    rng = np.random.RandomState(7)
    types = ["ent", "doc", "term"]
    n = 120
    src = [f"{types[rng.randint(3)]}_{rng.randint(12)}" for _ in range(n)]
    dst = [f"{types[rng.randint(3)]}_{rng.randint(12)}" for _ in range(n)]
    pred = [rng.choice(["p", "q"]) for _ in range(n)]
    df = pd.DataFrame({"src": src, "pred": pred, "dst": dst}).drop_duplicates()
    e1 = df.rename(columns={"src": "s1", "pred": "p1", "dst": "m"})
    e2 = df.rename(columns={"src": "m", "pred": "p2", "dst": "d2"})
    j = e1.merge(e2, on="m")
    j["src_type"] = j["s1"].str.split("_").str[0]
    j["mid_type"] = j["m"].str.split("_").str[0]
    j["dst_type"] = j["d2"].str.split("_").str[0]
    want = (
        j.groupby(["src_type", "p1", "mid_type", "p2", "dst_type"])
        .size()
        .sort_index()
    )
    out = metapath_census(
        ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    ).to_pandas()
    got = out.set_index(
        ["src_type", "pred1", "mid_type", "pred2", "dst_type"]
    )["n_paths"].sort_index()
    assert (got.to_numpy() == want.to_numpy()).all()
    assert list(got.index) == list(want.index)


def _docs_dir(d: str, rows: list[tuple[int, str, str]]) -> None:
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "source": [r[2] for r in rows],
            "lang": "en",
            "n_chars": 1,
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))


def test_nb_source_confusion_separable_and_prior_tiebreak():
    from multiomics_biocypher_kg_ray.pipelines.queries import q_doc_nb_source

    rows = [
        (1, "x x", "a"),
        (2, "x y", "a"),
        (3, "", "a"),  # no feature tokens -> argmax over priors (a: 3 docs)
        (4, "z z", "b"),
        (5, "z y", "b"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(d, rows)
        out = q_doc_nb_source(d).to_pandas()
    got = {
        (r.source, r.pred_source): r.n_docs for r in out.itertuples()
    }
    # separable vocab -> perfect diagonal; the empty doc follows the prior
    assert got == {("a", "a"): 3, ("b", "b"): 2}


def test_nb_weights_match_hand_formula():
    """One doc 'x y' under the a/b corpus above: verify the engine's argmax
    agrees with the hand-quantized floor(ln(..)*1e6) weights."""
    from multiomics_biocypher_kg_ray.pipelines.queries import q_doc_nb_source

    rows = [
        (1, "x x", "a"),
        (2, "x y", "a"),
        (4, "z z", "b"),
        (5, "z y", "b"),
    ]
    # counts: a: x=3,y=1,z=0 tot=4 | b: z=3,y=1,x=0 tot=4 ; K=3 feats
    def w(c, tot):
        return int(np.floor(np.log((c + 1.0) / (tot + 3.0)) * 1e6))

    s_a = w(3, 4) + w(1, 4)  # doc 'x y' under a
    s_b = w(0, 4) + w(1, 4)  # under b
    assert s_a > s_b  # equal priors (2 docs each) -> 'a' wins
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(d, rows)
        out = q_doc_nb_source(d).to_pandas()
    got = {(r.source, r.pred_source): r.n_docs for r in out.itertuples()}
    assert got == {("a", "a"): 2, ("b", "b"): 2}


def test_source_token_kl_identity_zero_and_asymmetry():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_source_token_kl,
    )

    rows = [
        (1, "x x x x", "a"),
        (2, "x y", "b"),
        (3, "x x x x", "c"),  # identical distribution to a
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(d, rows)
        out = q_source_token_kl(d).to_pandas()
    got = out.set_index(["source_a", "source_b"])["kl_q"].to_dict()
    assert got[("a", "c")] == 0 and got[("c", "a")] == 0
    # hand: feats {x, y} K=2; a: x=4,y=0 tot=4 -> p=(5/6, 1/6);
    #       b: x=1,y=1 tot=2 -> p=(2/4, 2/4)
    pa_ = np.array([5 / 6, 1 / 6])
    pb_ = np.array([(1 + 1.0) / 4, (1 + 1.0) / 4])
    kl_ab = int(np.floor(pa_ * np.log(pa_ / pb_) * 1e9).sum())
    kl_ba = int(np.floor(pb_ * np.log(pb_ / pa_) * 1e9).sum())
    assert got[("a", "b")] == kl_ab and got[("b", "a")] == kl_ba
    assert kl_ab != kl_ba  # KL is asymmetric
    assert (out["n_terms"] == 2).all()
