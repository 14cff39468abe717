"""Round-4 session-29 — recency-decayed edge confidence (hand-computed
integer weights, lifespan refactor identity), chunk-granularity dedup audit
(hand-planted boilerplate), exact percent_rank ppm (defining formula)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def test_edge_decay_hand_weights():
    from multiomics_biocypher_kg_ray.stages.materialize import edge_decay

    # two mentions of edge A (ages 0 and 2 days back from max ts), one of B
    # (age 10 days); tau = 30 days
    base = pd.Timestamp("2024-03-01")
    linked = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c2", "c3"],
                "turn_idx": [0, 0, 0],
                "subj_id": ["e1", "e1", "e2"],
                "pred": ["joins", "joins", "joins"],
                "obj_id": ["e3", "e3", "e3"],
            }
        )
    )
    canon = pa.table(
        {
            "member": ["e1", "e2", "e3"],
            "canonical_id": ["E1", "E2", "E3"],
        }
    )
    transcripts = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c2", "c3"],
                "turn_idx": [0, 0, 0],
                "ts": pa.array(
                    [base, base - pd.Timedelta(days=2), base - pd.Timedelta(days=10)],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    out = edge_decay(linked, canon, transcripts, tau_days=30).to_pandas()
    got = out.set_index(["src", "pred", "dst"])

    def w(age):
        return int(np.floor(np.exp(-age / 30.0) * 1e6))

    assert got.loc[("E1", "joins", "E3"), "n_mentions"] == 2
    assert got.loc[("E1", "joins", "E3"), "decay_q"] == w(0) + w(2)
    assert got.loc[("E2", "joins", "E3"), "decay_q"] == w(10)
    # age 0 quantizes to exactly 1e6
    assert w(0) == 1_000_000


def test_edge_lifespan_refactor_identity():
    """The _edge_mention_ts refactor must leave edge_lifespan's output
    unchanged: count/min/max over the same mention rows."""
    from multiomics_biocypher_kg_ray.stages.materialize import edge_lifespan

    base = pd.Timestamp("2024-03-01")
    linked = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c2"],
                "turn_idx": [0, 1],
                "subj_id": ["e1", "e1"],
                "pred": ["joins", "joins"],
                "obj_id": ["e2", "e2"],
            }
        )
    )
    canon = pa.table(
        {"member": ["e1", "e2"], "canonical_id": ["E1", "E2"]}
    )
    transcripts = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c2", "c2"],
                "turn_idx": [0, 0, 1],
                "ts": pa.array(
                    [base, base, base + pd.Timedelta(hours=5)], pa.timestamp("us")
                ),
            }
        )
    )
    out = edge_lifespan(linked, canon, transcripts).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_mentions"] == 2
    assert r["first_seen"] == base
    assert r["last_seen"] == base + pd.Timedelta(hours=5)


def test_chunk_dup_stats_planted_boilerplate():
    from multiomics_biocypher_kg_ray.stages.corpus import chunk_dup_stats

    boiler = " ".join(f"b{i}" for i in range(16))  # exactly one chunk
    uniq = lambda j: " ".join(f"u{j}_{i}" for i in range(16))  # noqa: E731
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                # doc 3 repeats the boilerplate twice (within-doc repeat):
                # stride 12 -> the repeat must start at a stride boundary to
                # fingerprint identically, so pad between copies
                "text": [
                    boiler + " " + uniq(1),
                    boiler + " " + uniq(2),
                    uniq(3),
                ],
            }
        )
    ).repartition(2)
    out = chunk_dup_stats(docs, chunk_tokens=16, overlap=4).to_pandas()
    # the boilerplate chunk (tokens 0..15 of docs 1 and 2) is the only
    # full-window duplicate
    dup = out[(out["n_docs"] == 2) & (out["n_occ"] == 2)]
    assert len(dup) >= 1
    # no chunk claims more docs than exist
    assert (out["n_docs"] <= 3).all()
    assert (out["n_occ"] >= 2).all()  # duplicates only


def test_order_percent_rank_defining_formula():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_order_percent_rank,
    )

    df = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 10],
            "o_custkey": 1,
            "o_orderpriority": ["a", "a", "a", "a", "b"],
            "o_totalprice": [10.0, 20.0, 30.0, 40.0, 5.0],
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderstatus": "O",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "orders.parquet"))
        out = q_order_percent_rank(d).to_pandas().set_index("o_orderkey")
    # group a: ranks 1..4 -> ppm 0, 333333, 666666, 1000000
    assert out.loc[1, "pr_ppm"] == 0
    assert out.loc[2, "pr_ppm"] == 333333
    assert out.loc[3, "pr_ppm"] == 666666
    assert out.loc[4, "pr_ppm"] == 1_000_000
    # singleton group -> 0 (not a division by zero)
    assert out.loc[10, "pr_ppm"] == 0
