"""Round-4 session-26 — calibration deciles (hand monotone score) and
per-source hapax ratio (hand vocab)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_doc_length_calibration_monotone_score():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_doc_length_calibration,
    )

    # 20 docs, scores 1..20; label = score > 10 -> deciles 1-5 rate 0,
    # deciles 6-10 rate 1e6 (2 docs per decile, perfectly separable)
    df = pd.DataFrame(
        {
            "doc_id": range(20),
            "text": "t",
            "lang": ["de"] * 10 + ["en"] * 10,
            "source": "s",
            "n_chars": range(1, 21),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = (
            q_doc_length_calibration(d).to_pandas().set_index("decile")
        )
    assert len(out) == 10
    assert (out["n_docs"] == 2).all()
    for dec in range(1, 6):
        assert out.loc[dec, "pos_rate_ppm"] == 0
    for dec in range(6, 11):
        assert out.loc[dec, "pos_rate_ppm"] == 1_000_000


def test_source_hapax_ratio_hand_vocab():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_source_hapax_ratio,
    )

    df = pd.DataFrame(
        {
            "doc_id": range(3),
            "text": [
                "a a b c",  # srcX: a twice; b, c hapax -> 2/3
                "d d d d",  # srcY doc 1
                "d e",  # srcY doc 2: d 5x, e hapax -> 1/2
            ],
            "lang": "en",
            "source": ["srcX", "srcY", "srcY"],
            "n_chars": 1,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = q_source_hapax_ratio(d).to_pandas().set_index("source")
    assert out.loc["srcX", "n_terms"] == 3 and out.loc["srcX", "n_hapax"] == 2
    assert out.loc["srcX", "hapax_ppm"] == 2 * 1_000_000 // 3
    assert out.loc["srcY", "n_terms"] == 2 and out.loc["srcY", "n_hapax"] == 1
    assert out.loc["srcY", "hapax_ppm"] == 500_000
