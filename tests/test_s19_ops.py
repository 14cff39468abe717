"""Round-4 session-19 operators — largest-remainder quota allocation
(exact-sum + tie-break), difference-in-differences (hand cells), PK
duplicate audit (injected duplicates)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def test_quota_allocate_exact_sum_and_remainders():
    from multiomics_biocypher_kg_ray.stages.relational import quota_allocate

    # weights 5 / 3 / 2 over total 7: base = 3 / 2 / 1 (floor 3.5/2.1/1.4),
    # leftover 1 goes to the largest remainder (a: rem 5, b: rem 1, c: rem 4)
    rows = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(rows),
                "w": pa.array(np.ones(len(rows), np.int64)),
            }
        )
    ).repartition(3)
    out = quota_allocate(ds, "g", "w", 7).to_pandas().set_index("g")
    assert int(out["quota"].sum()) == 7
    assert out.loc["a", "quota"] == 4  # 3 + the leftover unit
    assert out.loc["b", "quota"] == 2
    assert out.loc["c", "quota"] == 1

    # tie on remainders -> group ascending wins
    rows2 = ["x"] * 1 + ["y"] * 1 + ["z"] * 2
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(rows2),
                "w": pa.array(np.ones(len(rows2), np.int64)),
            }
        )
    )
    # total 5 over weights 1/1/2: bases 1/1/2 (5*1//4, 5*2//4), rems 1/1/2
    # leftover = (1+1+2)/4 = 1 -> z has the largest remainder
    out2 = quota_allocate(ds2, "g", "w", 5).to_pandas().set_index("g")
    assert int(out2["quota"].sum()) == 5
    assert out2.loc["z", "quota"] == 3
    assert out2.loc["x", "quota"] == 1 and out2.loc["y", "quota"] == 1


def test_diff_in_diff_hand_cells():
    from multiomics_biocypher_kg_ray.stages.relational import diff_in_diff

    # timeline 0..39s, cutoff = (0+39)//2 us; treat jumps +100 post,
    # control stays flat -> DiD = +100 cents = 1e8 micro
    rows = []
    for t in range(40):
        pre = t < 20
        rows.append(("treat", t, 50 if pre else 150))
        rows.append(("ctrl", t, 30))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    pd.to_datetime(
                        [r[1] for r in rows], unit="s", origin="2024-01-01"
                    ),
                    pa.timestamp("us"),
                ),
                "v": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(4)
    out = diff_in_diff(ds, "g", "treat", "ctrl", "ts", "v").to_pandas().iloc[0]
    assert out["n_treat_pre"] == 20 and out["n_treat_post"] == 20
    assert out["n_ctrl_pre"] == 20 and out["n_ctrl_post"] == 20
    assert out["did_micro"] == 100 * 1_000_000


def test_pk_duplicate_audit_injected_dups():
    import os
    import tempfile

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        _PK_KEYS,
        q_pk_duplicate_audit,
    )

    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame({"o_orderkey": [1, 2, 2, 3], "o_x": 0}).to_parquet(
            os.path.join(d, "orders.parquet")
        )
        pd.DataFrame({"c_custkey": [1, 2, 3]}).to_parquet(
            os.path.join(d, "customer.parquet")
        )
        pd.DataFrame({"p_partkey": [1, 1, 1]}).to_parquet(
            os.path.join(d, "part.parquet")
        )
        pd.DataFrame({"event_id": [1, 2]}).to_parquet(
            os.path.join(d, "events.parquet")
        )
        pd.DataFrame({"doc_id": [7]}).to_parquet(
            os.path.join(d, "documents.parquet")
        )
        pd.DataFrame(
            {"l_orderkey": [1, 1, 1], "l_linenumber": [1, 2, 1]}
        ).to_parquet(os.path.join(d, "lineitem.parquet"))
        out = q_pk_duplicate_audit(d).to_pandas().set_index("tbl")
    assert len(out) == len(_PK_KEYS)
    assert out.loc["orders", "n_dup_rows"] == 1
    assert out.loc["part", "n_dup_rows"] == 2
    assert out.loc["customer", "n_dup_rows"] == 0
    # composite key: (1,1) duplicated once
    assert out.loc["lineitem", "n_distinct"] == 2
    assert out.loc["lineitem", "n_dup_rows"] == 1
