"""Round-4 session-9 operators — ABC/Pareto classification (hand-built
spend ladder, integer boundary cuts), conversation lexical echo (hand
fixtures incl. no-user-turn NULL), weighted k-step random walk (cycle
conservation, proportional split, sink mass drop)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.convo import conv_echo_rate
from multiomics_biocypher_kg_ray.stages.graph import weighted_walk
from multiomics_biocypher_kg_ray.stages.relational import pareto_class


def _ds(tbl: pa.Table, blocks: int = 3):
    return ray.data.from_arrow(tbl).repartition(blocks)


def test_pareto_class_boundaries():
    # values 50, 30, 15, 5 (total 100): cum 50(A), 80(A), 95(B), 100(C)
    t = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array([50, 30, 15, 5], pa.int64()),
        }
    )
    out = pareto_class(_ds(t), "k", "v").to_pandas().set_index("k")
    assert out.loc[1, "abc_class"] == "A" and out.loc[1, "cum_value"] == 50
    assert out.loc[2, "abc_class"] == "A" and out.loc[2, "cum_value"] == 80
    assert out.loc[3, "abc_class"] == "B" and out.loc[3, "cum_value"] == 95
    assert out.loc[4, "abc_class"] == "C" and out.loc[4, "cum_value"] == 100


def test_pareto_class_tie_break_by_key():
    # equal values: cum order must follow key asc among ties
    t = pa.table(
        {
            "k": pa.array([7, 3], pa.int64()),
            "v": pa.array([10, 10], pa.int64()),
        }
    )
    out = pareto_class(_ds(t, 2), "k", "v").to_pandas().set_index("k")
    assert out.loc[3, "cum_value"] == 10 and out.loc[7, "cum_value"] == 20


def _transcripts(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "role": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    ).repartition(2)


def test_echo_rate_hand_fixture():
    tr = _transcripts(
        [
            ("c1", "user", "a b c"),
            ("c1", "assistant", "b c d"),
            ("c2", "user", "x y"),
            ("c2", "assistant", "z"),
            ("c3", "assistant", "hello"),  # no user turn -> NULL ppm
        ]
    )
    out = conv_echo_rate(tr).to_pandas().set_index("conv_id")
    assert out.loc["c1", "n_user_terms"] == 3
    assert out.loc["c1", "n_echoed"] == 2
    assert out.loc["c1", "echo_ppm"] == 2 * 1_000_000 // 3
    assert out.loc["c2", "n_echoed"] == 0 and out.loc["c2", "echo_ppm"] == 0
    assert out.loc["c3", "n_user_terms"] == 0
    assert pd.isna(out.loc["c3", "echo_ppm"])


def test_echo_rate_dedups_repeated_terms():
    tr = _transcripts(
        [
            ("c1", "user", "a a a b"),
            ("c1", "user", "a"),
            ("c1", "assistant", "a a"),
        ]
    )
    out = conv_echo_rate(tr).to_pandas().iloc[0]
    assert out["n_user_terms"] == 2  # {a, b}
    assert out["n_echoed"] == 1  # {a}


def _edges(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.string()),
                "dst": pa.array([r[1] for r in rows], pa.string()),
                "w": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(2)


def test_walk_two_cycle_conserves_mass():
    e = _edges([("a", "b", 1), ("b", "a", 1)])
    out = (
        weighted_walk(e, steps=3).to_pandas().set_index("state").sort_index()
    )
    assert out["mass_e6"].tolist() == [1_000_000, 1_000_000]


def test_walk_proportional_split_one_step():
    e = _edges([("a", "b", 3), ("a", "c", 1)])
    out = weighted_walk(e, steps=1).to_pandas().set_index("state")
    assert out.loc["b", "mass_e6"] == 750_000
    assert out.loc["c", "mass_e6"] == 250_000


def test_walk_sink_drops_mass():
    # chain a->b->c; c is a sink. step2: only c receives (from b's step-1
    # mass); a/b receive nothing and are absent
    e = _edges([("a", "b", 1), ("b", "c", 1)])
    out = weighted_walk(e, steps=2).to_pandas().set_index("state")
    assert list(out.index) == ["c"]
    assert out.loc["c", "mass_e6"] == 1_000_000
