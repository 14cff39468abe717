"""Round-4 session-23 operators — transition-model train/eval (temporal
split, majority fit, top-1 scoring) and best-F1 threshold sweep (hand PR
curve)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd


def _events_dir(d, types, user_id=1):
    df = pd.DataFrame(
        {
            "event_id": range(len(types)),
            "ts": pd.to_datetime(
                np.arange(len(types)), unit="s", origin="2024-01-01"
            ),
            "user_id": user_id,
            "event_type": types,
            "value": 1.0,
            "props": "",
        }
    )
    df.to_parquet(os.path.join(d, "events.parquet"))


def test_transition_model_eval_learns_deterministic_chain():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_transition_model_eval,
    )

    # a->b->a->b throughout: the majority model is exact on the holdout
    with tempfile.TemporaryDirectory() as d:
        _events_dir(d, ["a", "b"] * 40)
        out = q_transition_model_eval(d).to_pandas().iloc[0]
    assert out["n_train"] + out["n_eval"] == 79
    assert out["n_eval"] > 0
    assert out["accuracy_ppm"] == 1_000_000


def test_transition_model_eval_distribution_shift():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_transition_model_eval,
    )

    # first half a->b, second half a->c: the model trained pre-cutoff
    # predicts b and is wrong on every post-cutoff a-transition
    types = ["a", "b"] * 20 + ["a", "c"] * 20
    with tempfile.TemporaryDirectory() as d:
        _events_dir(d, types)
        out = q_transition_model_eval(d).to_pandas().iloc[0]
    assert out["n_eval"] > 0
    # everything after the cutoff is either a->c (model says b: wrong) or
    # c->a (state c unseen in training: wrong) -> near-zero accuracy
    assert out["accuracy_ppm"] < 100_000


def test_doc_length_f1_hand_curve():
    from multiomics_biocypher_kg_ray.pipelines.queries import q_doc_length_f1

    # scores 10/9/8/7, labels: en at 10 and 9, not-en at 8 and 7
    # threshold 9 -> tp=2 fp=0 fn=0 -> perfect F1
    df = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": "t",
            "lang": ["en", "en", "de", "fr"],
            "source": "s",
            "n_chars": [10, 9, 8, 7],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = q_doc_length_f1(d).to_pandas().iloc[0]
    assert out["threshold"] == 9
    assert out["tp"] == 2 and out["fp"] == 0 and out["fn"] == 0
    assert out["f1_micro"] == 1_000_000


def test_doc_length_f1_imperfect_separation():
    from multiomics_biocypher_kg_ray.pipelines.queries import q_doc_length_f1

    # interleaved labels: best F1 < 1 and integer-consistent
    df = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": "t",
            "lang": ["en", "de", "en", "de", "en", "de"],
            "source": "s",
            "n_chars": [10, 9, 8, 7, 6, 5],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = q_doc_length_f1(d).to_pandas().iloc[0]
    # F1 at each threshold t in {10..5}: tp/(pp+P): best is t=6 or t=8
    # t=8: tp=2 pp=3 P=3 -> 2*2/(3+3)=0.666; t=6: tp=3 pp=5 -> 6/8=0.75
    assert out["threshold"] == 6
    assert out["f1_micro"] == 2 * 3 * 1_000_000 // (5 + 3)
