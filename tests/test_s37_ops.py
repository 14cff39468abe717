"""Round-4 session-37 — entity profile card: cross-checks every column
against the standalone component queries on the same build."""

from __future__ import annotations

import pandas as pd


def test_kg_entity_profile_cross_component_identity():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_kg_edges,
        q_kg_entity_profile,
        q_kg_node_degree,
        q_kg_node_lifespan,
        q_kg_node_pred_entropy,
    )

    sf = "/root/testdata/sf0.001"
    prof = q_kg_entity_profile(sf).to_pandas().set_index("id")
    deg = q_kg_node_degree(sf).to_pandas().set_index("id")
    pe = q_kg_node_pred_entropy(sf).to_pandas().set_index("src")
    nl = q_kg_node_lifespan(sf).to_pandas().set_index("id")
    edges = q_kg_edges(sf).to_pandas()

    assert set(prof.index) == set(deg.index)
    for nid in prof.index:
        assert prof.loc[nid, "degree"] == deg.loc[nid, "degree"]
        assert (
            prof.loc[nid, "weighted_degree"] == deg.loc[nid, "weighted_degree"]
        )
        if nid in pe.index:
            assert prof.loc[nid, "pred_entropy_milli"] == pe.loc[nid, "entropy_milli"]
            assert prof.loc[nid, "n_preds"] == pe.loc[nid, "n_items"]
        else:
            assert pd.isna(prof.loc[nid, "pred_entropy_milli"])
        assert prof.loc[nid, "n_mentions"] == nl.loc[nid, "n_mentions"]
        assert prof.loc[nid, "first_seen"] == nl.loc[nid, "first_seen"]
        # top neighbor: max weight, ties -> dst asc
        g = edges[edges["src"] == nid]
        if len(g):
            best = g.sort_values(
                ["weight", "dst"], ascending=[False, True], kind="mergesort"
            ).iloc[0]
            assert prof.loc[nid, "top_neighbor"] == best["dst"]
            assert prof.loc[nid, "top_w"] == best["weight"]
        else:
            assert pd.isna(prof.loc[nid, "top_neighbor"])
