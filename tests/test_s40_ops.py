"""Round-4 session-40 — provenance-mix classification (testdata invariants)
and supplier slow-ship Wilson ranking (hand timeline)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd


def test_kg_provenance_mix_partitions_edge_count():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_kg_multisource,
        q_kg_provenance_mix,
    )

    sf = "/root/testdata/sf0.001"
    mix = q_kg_provenance_mix(sf).to_pandas()
    assert set(mix["provenance"]) <= {
        "both",
        "doc_only",
        "transcript_only",
        "other",
    }
    # the classification partitions the multisource edge table exactly
    n_edges = q_kg_multisource(sf).count()
    assert mix["n_edges"].sum() == n_edges
    # near_dup_of edges carry no doc:/transcript: evidence tags -> 'other'
    nd = mix[mix["pred"] == "near_dup_of"]
    if len(nd):
        assert set(nd["provenance"]) == {"other"}


def test_supplier_slow_ship_hand_timeline():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_supplier_slow_ship,
    )

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": 1,
            "o_orderstatus": "O",
            "o_orderpriority": "1-URGENT",
            "o_totalprice": 1.0,
            "o_orderdate": pd.to_datetime(["2024-01-01", "2024-01-01"]),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2],
            "l_partkey": 1,
            "l_suppkey": [7, 7, 8],
            "l_linenumber": [1, 2, 1],
            "l_quantity": 1.0,
            "l_extendedprice": 1.0,
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "O",
            # supplier 7: one on-time (+10d), one late (+90d); supplier 8 on-time
            "l_shipdate": pd.to_datetime(
                ["2024-01-11", "2024-03-31", "2024-02-15"]
            ),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        orders.to_parquet(os.path.join(d, "orders.parquet"))
        li.to_parquet(os.path.join(d, "lineitem.parquet"))
        out = q_supplier_slow_ship(d).to_pandas().set_index("l_suppkey")
    assert out.loc[7, "n"] == 2 and out.loc[7, "k"] == 1
    assert out.loc[8, "k"] == 0
    # Wilson identity for supplier 7 (k=1, n=2, z=2)
    p, n = 0.5, 2.0
    low = ((p + 2.0 / n) - 2.0 * np.sqrt(p * (1 - p) / n + 1.0 / (n * n))) / (
        1.0 + 4.0 / n
    )
    assert out.loc[7, "wilson_low_ppm"] == int(np.floor(low * 1e6))
    # ranking: the supplier with a late shipment bounds above the clean one
    assert out.loc[7, "wilson_low_ppm"] >= out.loc[8, "wilson_low_ppm"]
