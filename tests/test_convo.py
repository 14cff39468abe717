"""Conversation rollups: role census, turn templates, tool sequences."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.stages import convo


def _ts():
    rows = []
    for c, seq in [("c1", ["a", "b"]), ("c2", ["a", "b"]), ("c3", ["b"])]:
        for i, tool in enumerate(seq + [""]):
            rows.append(
                (c, i, "user" if i % 2 == 0 else "assistant", "hello world", tool)
            )
    rows.append(("c3", 9, "user", "unique text", ""))
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
            "tool": pa.array([r[4] for r in rows]),
        }
    )
    return ray.data.from_arrow(t).repartition(3)


def test_conv_role_stats():
    out = convo.conv_role_stats(_ts()).to_pandas().set_index("conv_id")
    assert out.loc["c1", "n_turns"] == 3
    assert out.loc["c1", "n_user"] == 2
    assert out.loc["c1", "n_tool"] == 2
    assert out.loc["c3", "n_turns"] == 3
    assert out.loc["c3", "n_chars"] == 2 * len("hello world") + len("unique text")


def test_turn_templates():
    out = convo.turn_templates(_ts(), min_convs=2, k=5).to_pandas()
    assert len(out) == 1
    assert out["text"].iloc[0] == "hello world"
    assert out["n_convs"].iloc[0] == 3 and out["n_turns"].iloc[0] == 8


def test_tool_sequences():
    out = convo.tool_sequences(_ts(), k=5).to_pandas()
    assert list(out["seq"]) == ["a,b", "b"]
    assert list(out["n_convs"]) == [2, 1]


def test_response_latency_user_assistant_adjacency_only():
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    rows = [
        # c1: user -> assistant (5s), assistant -> assistant (ignored),
        #     user -> user (ignored), user -> assistant (7s)
        ("c1", 0, "user", base),
        ("c1", 1, "assistant", base + pd.Timedelta(seconds=5)),
        ("c1", 2, "assistant", base + pd.Timedelta(seconds=9)),
        ("c1", 3, "user", base + pd.Timedelta(seconds=20)),
        ("c1", 4, "user", base + pd.Timedelta(seconds=30)),
        ("c1", 5, "assistant", base + pd.Timedelta(seconds=37)),
        # c2: assistant first (no prev), then user -> tool-ish role ignored
        ("c2", 0, "assistant", base),
        ("c2", 1, "user", base + pd.Timedelta(seconds=1)),
    ]
    t = pa.table(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": [r[1] for r in rows],
            "role": [r[2] for r in rows],
            "text": ["x"] * len(rows),
            "tool": [""] * len(rows),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        }
    )
    out = (
        convo.response_latency(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("conv_id")
    )
    assert list(out.index) == ["c1"]
    assert out.loc["c1", "n_responses"] == 2
    assert out.loc["c1", "total_latency_us"] == 12_000_000
    assert out.loc["c1", "min_latency_us"] == 5_000_000
    assert out.loc["c1", "max_latency_us"] == 7_000_000
