"""Round-4 session-12 operators — n-gram novelty (first-owner attribution,
full re-paste, short-doc absence) and event-type affinity lift (hand-built
co-occurrence with known independence baseline)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.dedup import doc_ngram_novelty


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)


def test_novelty_first_owner_and_repaste():
    # doc0 introduces everything; doc1 is a verbatim re-paste (novelty 0);
    # doc2 shares a prefix shingle run with doc0 but adds new material
    d0 = "alpha beta gamma delta"
    d2 = "alpha beta gamma epsilon zeta"
    out = (
        doc_ngram_novelty(_docs([d0, d0, d2]))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "novelty_ppm"] == 1_000_000
    assert out.loc[1, "n_novel"] == 0 and out.loc[1, "novelty_ppm"] == 0
    # doc2 shingles: (alpha beta gamma)=old, (beta gamma epsilon),
    # (gamma epsilon zeta) = new -> 2/3
    assert out.loc[2, "n_shingles"] == 3
    assert out.loc[2, "n_novel"] == 2
    assert out.loc[2, "novelty_ppm"] == 2 * 1_000_000 // 3


def test_novelty_short_docs_absent():
    out = doc_ngram_novelty(_docs(["one two", "a b c"])).to_pandas()
    # doc0 has < 3 tokens -> no shingles -> absent
    assert out["doc_id"].tolist() == [1]


def test_type_lift_hand_cooccurrence():
    from multiomics_biocypher_kg_ray.pipelines.queries import q_user_type_lift

    # 4 users: a+b together twice, a alone once, b alone once
    # n_a = 3, n_b = 3, n_ab = 2, N = 4 -> lift = 2*4/(3*3) = 8/9
    rows = []
    for u, types in enumerate([["a", "b"], ["a", "b"], ["a"], ["b"]]):
        for t in types:
            rows.append((len(rows), u, t))
    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "ts": pd.to_datetime([r[0] for r in rows], unit="s"),
            "event_type": [r[2] for r in rows],
            "value": 0.0,
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q_user_type_lift(d).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["type_a"], row["type_b"], row["n_ab"]) == ("a", "b", 2)
    import numpy as np

    assert row["lift_ppm"] == int(np.floor((2.0 * 4.0 * 1e6) / (3.0 * 3.0)))
