"""Round-4 session-13 operators — integer quantized-log entropy (single-bin
zero, uniform ln k, hand sums) and Wilson lower-bound ranking (small-sample
demotion, hand formula)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.relational import group_entropy


def _ds(df: pd.DataFrame, blocks: int = 3):
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(blocks)


def test_entropy_single_bin_zero_and_uniform_ln_k():
    df = pd.DataFrame(
        {
            "g": ["one"] * 5 + ["two"] * 4,
            "item": [7] * 5 + [1, 1, 2, 2],
        }
    )
    out = group_entropy(_ds(df), "g", "item").to_pandas().set_index("g")
    assert out.loc["one", "entropy_milli"] == 0
    assert out.loc["one", "n_items"] == 1
    # uniform over 2 bins: (4*L(4) - 4*L(2)) // 4 with L quantized-floor
    L4 = int(np.floor(np.log(4.0) * 1000))
    L2 = int(np.floor(np.log(2.0) * 1000))
    assert out.loc["two", "entropy_milli"] == (4 * L4 - 4 * L2) // 4
    assert out.loc["two", "n"] == 4 and out.loc["two", "n_items"] == 2


def _wilson_ref(k, n):
    n, k = float(n), float(k)
    p = k / n
    low = ((p + 2.0 / n) - 2.0 * np.sqrt(p * (1.0 - p) / n + 1.0 / (n * n))) / (
        1.0 + 4.0 / n
    )
    return int(np.floor(low * 1e6))


def test_wilson_small_sample_demoted():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_part_return_wilson,
    )

    # part 1: 2/2 returned; part 2: 40/50 returned
    rows = [(1, "R"), (1, "R")] + [(2, "R")] * 40 + [(2, "N")] * 10
    df = pd.DataFrame(
        {
            "l_orderkey": range(len(rows)),
            "l_partkey": [r[0] for r in rows],
            "l_suppkey": 1,
            "l_linenumber": 1,
            "l_quantity": 1.0,
            "l_extendedprice": 1.0,
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": [r[1] for r in rows],
            "l_linestatus": "F",
            "l_shipdate": pd.to_datetime(["2024-01-01"] * len(rows)),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "lineitem.parquet"))
        out = q_part_return_wilson(d).to_pandas().set_index("l_partkey")
    assert out.loc[1, "wilson_low_ppm"] == _wilson_ref(2, 2)
    assert out.loc[2, "wilson_low_ppm"] == _wilson_ref(40, 50)
    # the classic inversion: 100% of 2 ranks BELOW 80% of 50
    assert out.loc[1, "wilson_low_ppm"] < out.loc[2, "wilson_low_ppm"]
