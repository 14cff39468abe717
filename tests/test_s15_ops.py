"""Round-4 session-15 operators — turn-taking dynamics (hand conversations),
Welch t² (hand groups vs an independent float computation), personalized
PageRank (seed masking + hand recurrence), and the multi-source schema
census/audit (hand edge tables)."""

from __future__ import annotations

import statistics

import numpy as np
import pyarrow as pa

import ray.data


def _transcripts(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    ).repartition(3)


def test_turn_taking_hand_values():
    from multiomics_biocypher_kg_ray.stages.convo import turn_taking

    rows = [
        # conv a: user,user,assistant — 2 pairs, 1 switch; lens 2,5,3
        ("a", 0, "user", "hi"),
        ("a", 1, "user", "again"),
        ("a", 2, "assistant", "yes"),
        # conv b: single turn — drops out (no pairs)
        ("b", 0, "user", "solo"),
        # conv c: strict alternation — 3 pairs, 3 switches; lens 1,3,2,4
        ("c", 0, "user", "x"),
        ("c", 1, "assistant", "yyy"),
        ("c", 2, "user", "zz"),
        ("c", 3, "assistant", "wwww"),
    ]
    out = turn_taking(_transcripts(rows)).to_pandas().set_index("conv_id")
    assert "b" not in out.index
    assert out.loc["a", "n_pairs"] == 2 and out.loc["a", "n_switches"] == 1
    assert out.loc["a", "switch_ppm"] == 500_000
    assert out.loc["a", "sum_abs_len_delta"] == abs(5 - 2) + abs(3 - 5)
    assert out.loc["c", "n_pairs"] == 3 and out.loc["c", "n_switches"] == 3
    assert out.loc["c", "switch_ppm"] == 1_000_000
    assert out.loc["c", "sum_abs_len_delta"] == 2 + 1 + 2


def test_welch_t_hand_groups():
    from multiomics_biocypher_kg_ray.stages.relational import welch_t

    a = [100, 220, 310, 450, 380]
    b = [900, 1100, 950, 1020]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "grp": pa.array(["a"] * len(a) + ["b"] * len(b), pa.string()),
                "v": pa.array(a + b, pa.int64()),
            }
        )
    ).repartition(4)
    out = welch_t(ds, "grp", "v", "a", "b").to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    # independent float computation (statistics module, not the engine path)
    ma, mb = statistics.fmean(a), statistics.fmean(b)
    sea = statistics.variance(a) / len(a)
    seb = statistics.variance(b) / len(b)
    t2 = (ma - mb) ** 2 / (sea + seb)
    df = (sea + seb) ** 2 / (
        sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1)
    )
    assert abs(r["t2_micro"] - int(np.floor(t2 * 1e6))) <= 1
    assert abs(r["df_milli"] - int(np.floor(df * 1e3))) <= 1


def test_welch_t_degenerate_group():
    from multiomics_biocypher_kg_ray.stages.relational import welch_t

    ds = ray.data.from_arrow(
        pa.table(
            {
                "grp": pa.array(["a", "b", "b"], pa.string()),
                "v": pa.array([5, 7, 9], pa.int64()),
            }
        )
    )
    r = welch_t(ds, "grp", "v", "a", "b").to_pandas().iloc[0]
    assert r["n_a"] == 1 and r["n_b"] == 2
    assert r.isna()["t2_micro"] and r.isna()["df_milli"]


def _edges(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "dst": pa.array([r[2] for r in rows], pa.string()),
                "weight": pa.array([r[3] for r in rows], pa.int64()),
                "evidence": pa.array(["e"] * len(rows), pa.string()),
            }
        )
    ).repartition(2)


def test_type_rollup_and_schema_audit():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        schema_audit,
        type_rollup,
    )

    rows = [
        ("ent_000001", "joins", "ent_000002", 3),
        ("ent_000002", "joins", "ent_000001", 1),
        ("ent_000001", "joins", "ent_000001", 2),  # self-loop (declared pred)
        ("doc_00000001", "near_dup_of", "doc_00000002", 1),  # undeclared
        ("ent_000001", "cites", "doc_00000001", 1),  # undeclared cross-type
    ]
    roll = (
        type_rollup(_edges(rows))
        .to_pandas()
        .set_index(["src_type", "pred", "dst_type"])
    )
    assert roll.loc[("ent", "joins", "ent"), "n_edges"] == 3
    assert roll.loc[("ent", "joins", "ent"), "total_weight"] == 6
    assert roll.loc[("doc", "near_dup_of", "doc"), "n_edges"] == 1
    assert roll.loc[("ent", "cites", "doc"), "n_edges"] == 1

    audit = (
        schema_audit(_edges(rows))
        .to_pandas()
        .set_index(["src_type", "pred", "dst_type", "reason"])
    )
    assert audit.loc[("ent", "joins", "ent", "self_loop"), "n_edges"] == 1
    assert (
        audit.loc[("doc", "near_dup_of", "doc", "undeclared_triple"), "n_edges"]
        == 1
    )
    assert audit.loc[("ent", "cites", "doc", "undeclared_triple"), "n_edges"] == 1
    # declared non-self-loop triples never appear
    assert ("ent", "joins", "ent", "undeclared_triple") not in audit.index


def _ppr_reference(edges, seeds, iters=3, damping=85, scale=1_000_000):
    """Plain-dict twin of the integer PPR recurrence."""
    e = sorted({(s, d) for s, d in edges if s != d})
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = sorted({n for p in e for n in p})
    base = scale * (100 - damping) // 100
    score = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        nxt = {}
        for n in nodes:
            inc = sum(score[s] // outdeg[s] for s, d in e if d == n)
            nxt[n] = (base if n in seeds else 0) + damping * inc // 100
        score = nxt
    return score


def test_personalized_pagerank_hand_graph():
    from multiomics_biocypher_kg_ray.stages.graph import pagerank

    rows = [
        ("s1", "p", "x", 1),
        ("x", "p", "y", 1),
        ("y", "p", "s1", 1),
        ("z", "p", "x", 1),
        ("iso_a", "p", "iso_b", 1),  # unreachable from seeds
    ]
    seeds = ["s1"]
    out = (
        pagerank(_edges(rows), iters=3, seeds=seeds)
        .to_pandas()
        .set_index("node")["pr_score"]
        .to_dict()
    )
    ref = _ppr_reference([(r[0], r[2]) for r in rows], set(seeds))
    assert out == ref
    # structure: seeds hold restart mass, disconnected nodes decay to zero
    assert out["s1"] >= 150_000
    assert out["iso_a"] == 0 and out["iso_b"] == 0
    # unpersonalized path unchanged: every node starts with mass
    full = (
        pagerank(_edges(rows), iters=1)
        .to_pandas()
        .set_index("node")["pr_score"]
        .to_dict()
    )
    assert all(v >= 150_000 for v in full.values())
