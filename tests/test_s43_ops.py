"""Round-4 session-43 — cross-source duplication matrix (hand-planted
within- and cross-source near-dups)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_dup_source_matrix_hand_plants():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_dup_source_matrix,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta " * 4
    uniq1 = " ".join(f"u1tok{i}" for i in range(30))
    uniq2 = " ".join(f"u2tok{i}" for i in range(30))
    rows = [
        (1, dup, "a"),
        (2, dup, "a"),  # within-a pair
        (3, dup, "b"),  # cross pairs with 1 and 2
        (4, uniq1, "a"),
        (5, uniq2, "b"),
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
        out = q_dup_source_matrix(d).to_pandas()
    got = out.set_index(["source_a", "source_b"])["n_pairs"].to_dict()
    # pairs: (1,2) within a; (1,3), (2,3) cross a-b
    assert got == {("a", "a"): 1, ("a", "b"): 2}
