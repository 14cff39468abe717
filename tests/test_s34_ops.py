"""Round-4 session-34 — KG snapshot diff (base ⊆ full invariants) and the
vocab OOV-rate audit (hand corpus with a known tail)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_kg_snapshot_diff_invariants():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_kg_edges,
        q_kg_snapshot_diff,
    )

    sf = "/root/testdata/sf0.001"
    out = q_kg_snapshot_diff(sf).to_pandas()
    assert set(out["status"]) <= {"added", "weight_changed"}
    # base is a subset of the full build: w_new strictly exceeds w_base on
    # every changed row, and added rows have no base weight
    ch = out[out["status"] == "weight_changed"]
    assert (ch["w_new"] > ch["w_base"]).all()
    assert out[out["status"] == "added"]["w_base"].isna().all()
    # sanity: the diff covers at most the full edge set
    n_full = q_kg_edges(sf).count()
    assert 0 < len(out) <= n_full


def test_vocab_oov_rate_hand_corpus():
    from multiomics_biocypher_kg_ray.pipelines.queries import q_vocab_oov_rate

    rows = [
        # source a: 4 tokens of 'x' (in a k=2 vocab) + 1 rare token
        (1, "x x x x rare1", "a"),
        # source b: all common
        (2, "x y x y", "b"),
        # source c: all rare singletons
        (3, "zz1 zz2 zz3", "c"),
    ]
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "source": [r[2] for r in rows],
            "lang": "en",
            "n_chars": 1,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = q_vocab_oov_rate(d, k=2).to_pandas().set_index("source")
    # top-2 vocab by count: x (6), y (2) — ties impossible here
    assert out.loc["a", "n_tokens"] == 5
    assert out.loc["a", "n_in_vocab"] == 4
    assert out.loc["a", "oov_ppm"] == 1_000_000 // 5
    assert out.loc["b", "oov_ppm"] == 0
    assert out.loc["c", "n_in_vocab"] == 0
    assert out.loc["c", "oov_ppm"] == 1_000_000
