"""Round-4 session-42 — rule-yield dashboard (cross-check vs linked stream)
and packing-efficiency audit (token conservation, fill identity)."""

from __future__ import annotations

import pandas as pd


def test_kg_rule_yield_cross_check():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_kg_linked,
        q_kg_rule_yield,
    )

    sf = "/root/testdata/sf0.001"
    out = q_kg_rule_yield(sf).to_pandas().set_index("rule_id")
    linked = q_kg_linked(sf).to_pandas()
    g = linked.groupby("rule_id")
    for rule, grp in g:
        assert out.loc[rule, "n_mentions"] == len(grp)
        nk = int((grp["subj_id"].notna() & grp["obj_id"].notna()).sum())
        assert out.loc[rule, "n_linked"] == nk
        assert out.loc[rule, "linked_ppm"] == nk * 1_000_000 // len(grp)


def test_pack_efficiency_token_conservation():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_doc_pack_assign,
        q_pack_efficiency,
    )

    sf = "/root/testdata/sf0.001"
    eff = q_pack_efficiency(sf).to_pandas()
    packed = q_doc_pack_assign(sf).to_pandas()
    # token conservation: bin sums equal the assignment totals
    assert eff["used_tokens"].sum() == packed["n_tokens"].sum()
    assert eff["n_docs"].sum() == len(packed)
    # fill identity and sanity: most bins near or above budget except each
    # shard's LAST bin (underfilled tail)
    assert (eff["fill_ppm"] == eff["used_tokens"] * 1_000_000 // 512).all()
    last_bins = eff.groupby("shard")["pack_idx"].max().reset_index()
    non_tail = eff.merge(
        last_bins, on=["shard"], suffixes=("", "_max")
    ).query("pack_idx < pack_idx_max")
    # a non-tail bin closed because the NEXT doc crossed the budget: its
    # fill plus that doc's start offset covers the budget -> fill > 0 and
    # bounded above by budget + max doc size; check the weak invariant
    assert (non_tail["used_tokens"] > 0).all()
