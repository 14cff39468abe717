"""Round-4 session-33 — deterministic walk corpus (structure + determinism
+ hash-greedy identity on a hand graph) and the per-source retention funnel
(hand-planted duplicates/quality failures)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _h60(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 4


def test_walk_corpus_hand_graph():
    from multiomics_biocypher_kg_ray.stages.graph import walk_corpus

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": ["a", "a", "b", "c"],
                "pred": ["p"] * 4,
                "dst": ["b", "c", "c", "a"],
            }
        )
    ).repartition(2)
    out = walk_corpus(edges, steps=2).to_pandas()
    byw = {
        (r.start, r.step): r.node for r in out.itertuples()
    }
    # step 0: every node walks from itself
    for n in ("a", "b", "c"):
        assert byw[(n, 0)] == n
    # a's step-1 hop: argmin md5('walk:a:1:b') vs md5('walk:a:1:c')
    pick = min(["b", "c"], key=lambda d: (_h60(f"walk:a:1:{d}"), d))
    assert byw[("a", 1)] == pick
    # b and c have single out-edges
    assert byw[("b", 1)] == "c"
    assert byw[("c", 1)] == "a"
    # chains are consistent: step 2 continues from step 1 with the step-2
    # next-hop table
    pick2_from_c = "a"  # c's only out-edge
    if pick == "c":
        assert byw[("a", 2)] == pick2_from_c
    # determinism across partitioning
    out2 = walk_corpus(
        ray.data.from_arrow(
            pa.table(
                {
                    "src": ["a", "a", "b", "c"],
                    "pred": ["p"] * 4,
                    "dst": ["b", "c", "c", "a"],
                }
            )
        ).repartition(4),
        steps=2,
    ).to_pandas()
    a = out.sort_values(["start", "step"]).reset_index(drop=True)
    b = out2.sort_values(["start", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_source_retention_funnel_hand_corpus(tmp_path):
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_source_retention_funnel,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then the small "
        "cat walks by the river with a very long tail that keeps going "
        "for many more words to pass the minimum token and char gates "
        "while staying quite ordinary prose with enough stopwords in it"
    )
    rows = [
        (1, good + " one", "a"),
        (2, good + " one", "a"),  # exact dup of 1 -> not an exact keeper
        (3, "tiny", "a"),  # fails quality (short)
        # genuinely distinct text (no shared prefix — a shared long prefix
        # would pull jaccard over 0.5 and fold doc 4 into doc 1's cluster)
        (
            4,
            "completely unrelated content about machine learning systems "
            "where distributed executors stream arrow batches through "
            "object stores under backpressure until every stage finishes "
            "and nothing here repeats any earlier sentence at all because "
            "this document stands alone in shingle space forever",
            "b",
        ),
    ]
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "source": [r[2] for r in rows],
            "lang": "en",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = (
        q_source_retention_funnel(str(tmp_path))
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["a", "n_docs"] == 3
    # doc 3 fails quality; 1 and 2 pass
    assert out.loc["a", "n_quality"] == 2
    # exact keepers in source a: doc 1 (min of the dup group) + doc 3
    assert out.loc["a", "n_exact_keep"] == 2
    # near-dup: docs 1/2 share all shingles -> one canonical (doc 1);
    # doc 3 is its own singleton cluster
    assert out.loc["a", "n_neardup_keep"] == 2
    assert out.loc["b", "n_docs"] == 1
    assert out.loc["b", "n_quality"] == 1
    assert out.loc["b", "n_exact_keep"] == 1
    assert out.loc["b", "n_neardup_keep"] == 1
