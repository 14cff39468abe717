"""Round-4 session-21 operators — integer one-way ANOVA (hand groups vs
scipy-free reference), weighted median (hand weights, tie conventions),
mixture planner (budget arithmetic)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def test_anova_f_hand_groups():
    from multiomics_biocypher_kg_ray.stages.relational import anova_f

    a, b, c = [10, 12, 14], [20, 22, 24], [30, 32, 34]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["a"] * 3 + ["b"] * 3 + ["c"] * 3),
                "v": pa.array(a + b + c, pa.int64()),
            }
        )
    ).repartition(3)
    out = anova_f(ds, "g", "v").to_pandas().iloc[0]
    assert out["n_rows"] == 9 and out["k_groups"] == 3
    # integer reference with the same floor chain
    ns = [3, 3, 3]
    ss = [sum(a), sum(b), sum(c)]
    N, S = 9, sum(ss)
    Q = sum(v * v for v in a + b + c)
    A = sum(s * s // n for s, n in zip(ss, ns))
    B = S * S // N
    exp = (1_000_000 * (A - B) * (N - 3)) // (2 * (Q - A))
    assert out["f_micro"] == exp
    # strongly separated means -> huge F (float reference ~ 75)
    assert out["f_micro"] > 50_000_000


def test_anova_f_identical_groups_small():
    from multiomics_biocypher_kg_ray.stages.relational import anova_f

    # identical distributions -> SSB ~ 0 -> tiny F
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["x", "x", "y", "y"]),
                "v": pa.array([5, 7, 5, 7], pa.int64()),
            }
        )
    )
    out = anova_f(ds, "g", "v").to_pandas().iloc[0]
    assert out["f_micro"] == 0


def test_weighted_median_hand_weights():
    from multiomics_biocypher_kg_ray.stages.relational import weighted_median

    # group a: values 1(w9), 100(w1) -> half of 10 is 5, cum at v=1 is 9 >= 5
    # group b: values 1(w1), 100(w9) -> cum at 1 is 1 < 5; at 100 is 10
    rows = [("a", 1, 9), ("a", 100, 1), ("b", 1, 1), ("b", 100, 9)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array([r[0] for r in rows]),
                "v": pa.array([r[1] for r in rows], pa.int64()),
                "w": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(2)
    out = weighted_median(ds, "g", "v", "w").to_pandas().set_index("g")
    assert out.loc["a", "wmedian"] == 1
    assert out.loc["b", "wmedian"] == 100
    assert out.loc["a", "total_weight"] == 10
    # lower-median convention: exact half reaches the boundary value
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["c"] * 2),
                "v": pa.array([10, 20], pa.int64()),
                "w": pa.array([5, 5], pa.int64()),
            }
        )
    )
    out2 = weighted_median(ds2, "g", "v", "w").to_pandas().iloc[0]
    assert out2["wmedian"] == 10  # 2*5 >= 10 already at the lower value


def test_mixture_plan_budget_arithmetic():
    import os
    import tempfile

    import pandas as pd

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_source_mixture_plan,
    )

    df = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": ["t " * 99 + "t", "u " * 49 + "u", "v", "w w"],
            "lang": "en",
            "source": ["src0", "src1", "src0", "src3"],
            "n_chars": 1,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = (
            q_source_mixture_plan(d, budget_tokens=60)
            .to_pandas()
            .set_index("source")
        )
    # tokens: src0 = 100 + 1, src1 = 50, src3 = 2; weights 1, 2, 4 (W=7)
    assert out.loc["src0", "tokens"] == 101
    assert out.loc["src0", "weight"] == 1
    assert int(out["need_tokens"].sum()) <= 60
    assert out.loc["src0", "need_tokens"] == 60 * 1 // 7
    # src3 needs 60*4//7 = 34 tokens from a 2-token supply -> 17x epochs
    assert out.loc["src3", "epochs_milli"] == (60 * 4 // 7) * 1000 // 2
    assert out.loc["src3", "rate_ppm"] == 1_000_000  # capped
    assert out.loc["src0", "rate_ppm"] == (60 // 7) * 1_000_000 // 101
