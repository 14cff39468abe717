import pandas as pd
import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.stages.materialize import (
    build_edges,
    build_nodes,
    dangling_edges,
    edge_rank,
    node_degree,
)

LINKED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("rule_id", pa.string()),
        ("pred", pa.string()),
        ("subj_text", pa.string()),
        ("obj_text", pa.string()),
        ("subj_id", pa.string()),
        ("subj_method", pa.string()),
        ("obj_id", pa.string()),
        ("obj_method", pa.string()),
    ]
)


def _linked_ds():
    rows = [
        # two identical edges from different rules → dedup + evidence union
        ("c1", 0, "r1", "joins", "a", "b", "t:a", "tier1_exact", "t:b", "tier1_exact"),
        ("c1", 1, "r2", "joins", "a", "b", "t:a", "tier1_exact", "t:b", "tier1_exact"),
        ("c2", 0, "r1", "joins", "a", "c", "t:a", "tier1_exact", "t:c", "tier1_exact"),
        # unresolved side → contributes no edge
        ("c2", 1, "r1", "joins", "zz", "b", None, "unresolved", "t:b", "tier1_exact"),
    ]
    tbl = pa.Table.from_pylist(
        [dict(zip(LINKED_SCHEMA.names, r)) for r in rows], schema=LINKED_SCHEMA
    )
    return ray.data.from_arrow(tbl).repartition(2)


CANON = pd.DataFrame(
    {
        "member": ["t:a", "t:b", "t:c"],
        "component_key": ["a", "b", "c"],
        "canonical_id": ["ent_1", "ent_2", "ent_3"],
    }
)


def test_build_edges_dedup_and_evidence_union():
    edges = build_edges(_linked_ds(), CANON).to_pandas()
    edges = edges.sort_values(["src", "dst"]).reset_index(drop=True)
    assert len(edges) == 2
    ab = edges[(edges["src"] == "ent_1") & (edges["dst"] == "ent_2")].iloc[0]
    assert ab["weight"] == 2
    assert ab["evidence"] == "r1|r2"
    ac = edges[(edges["src"] == "ent_1") & (edges["dst"] == "ent_3")].iloc[0]
    assert ac["weight"] == 1 and ac["evidence"] == "r1"


def test_build_nodes_counts():
    nodes = build_nodes(_linked_ds(), CANON).to_pandas().set_index("id")
    # t:a appears 3× as subj; t:b 3× as obj; t:c once
    assert nodes.loc["ent_1", "mention_count"] == 3
    assert nodes.loc["ent_2", "mention_count"] == 3
    assert nodes.loc["ent_3", "mention_count"] == 1
    assert set(nodes["label"]) == {"term"}


def test_node_degree_and_rank():
    edges = build_edges(_linked_ds(), CANON)
    deg = node_degree(edges).to_pandas().set_index("id")
    assert deg.loc["ent_1", "degree"] == 2
    assert deg.loc["ent_1", "weighted_degree"] == 3
    rk = edge_rank(edges).to_pandas().sort_values("rank")
    assert list(rk["rank"]) == [1, 2]
    assert rk.iloc[0]["weight"] == 2  # heaviest edge first


def test_dangling_edges_anti_join():
    edges = ray.data.from_items(
        [
            {"src": "ent_1", "pred": "p", "dst": "ent_2", "weight": 1, "evidence": "r"},
            {"src": "ent_1", "pred": "p", "dst": "ghost", "weight": 1, "evidence": "r"},
        ]
    )
    nodes = ray.data.from_items(
        [{"id": "ent_1", "label": "term"}, {"id": "ent_2", "label": "term"}]
    )
    bad = dangling_edges(edges, nodes).to_pandas()
    assert len(bad) == 1
    assert bad.iloc[0]["dst"] == "ghost"


def test_determinism_two_runs():
    e1 = build_edges(_linked_ds(), CANON).to_pandas().sort_values(["src", "dst"])
    e2 = build_edges(_linked_ds(), CANON).to_pandas().sort_values(["src", "dst"])
    pd.testing.assert_frame_equal(e1.reset_index(drop=True), e2.reset_index(drop=True))


def test_build_graph_tables_matches_standalone_builders():
    from multiomics_biocypher_kg_ray.stages.materialize import build_graph_tables

    nodes, edges = build_graph_tables(_linked_ds(), CANON)
    n1 = nodes.to_pandas().sort_values("id").reset_index(drop=True)
    n2 = (
        build_nodes(_linked_ds(), CANON)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(n1[n2.columns], n2)
    e1 = edges.to_pandas().sort_values(["src", "pred", "dst"]).reset_index(drop=True)
    e2 = (
        build_edges(_linked_ds(), CANON)
        .to_pandas()
        .sort_values(["src", "pred", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(e1[e2.columns], e2)


def test_run_kg_to_parquet_emits_canonicalization_report(tmp_path):
    """The diagnostics report (gene_id_graph.py:345-409 analog) is a
    first-class output: per-method stats parquet, conflict table, warnings
    and full manifest keys on disk."""
    import json
    import os

    import pyarrow.parquet as pq

    from multiomics_biocypher_kg_ray.pipelines.kg import run_kg_to_parquet
    from multiomics_biocypher_kg_ray.sources.transcripts import transcripts_dataset

    out = str(tmp_path / "kg")
    m = run_kg_to_parquet(transcripts_dataset("/root/testdata/sf0.001"), out)
    assert m["link_methods"] >= 3  # tier1_exact / tier2_singleton / unresolved…
    assert m["conflict_aliases"] == 1  # 'value' is the configured conflict
    stats = pq.read_table(f"{out}/reports/link_method_stats").to_pandas()
    assert set(stats.columns) == {"method", "n_mentions", "n_distinct_aliases"}
    assert "tier1_exact" in set(stats["method"])
    assert (stats["n_mentions"] >= stats["n_distinct_aliases"]).all()
    conf = pq.read_table(f"{out}/reports/conflicts.parquet").to_pandas()
    assert list(conf["alias"]) == ["value"]
    assert conf["candidates"].iloc[0] == "term:value_a|term:value_b"
    # manifest on disk carries the FULL key set, including report keys
    disk = json.load(open(f"{out}/manifest.json"))
    for k in ("nodes", "edges", "unresolved", "link_methods", "warnings"):
        assert k in disk
    assert os.path.isdir(f"{out}/rollups/edge_rank")


def test_build_graph_tables_joined_matches_broadcast_path():
    """The fully-distributed join path (used when the canonical map outgrows
    broadcast) must be output-identical to the broadcast dict path."""
    import ray

    from multiomics_biocypher_kg_ray.config import default_alias_dictionary
    from multiomics_biocypher_kg_ray.pipelines.kg import _fused_extract_link, KGConfig
    from multiomics_biocypher_kg_ray.sources.transcripts import transcripts_dataset
    from multiomics_biocypher_kg_ray.stages.canonicalize import canonical_map_table
    from multiomics_biocypher_kg_ray.stages.link import AliasIndex
    from multiomics_biocypher_kg_ray.stages.materialize import (
        build_graph_tables,
        build_graph_tables_joined,
    )

    ts = transcripts_dataset("/root/testdata/sf0.001")
    idx_ref = ray.put(AliasIndex(default_alias_dictionary()))
    linked = ts.map_batches(
        _fused_extract_link,
        fn_kwargs={"rules": KGConfig().rules, "index_ref": idx_ref},
        batch_format="pyarrow",
    ).materialize()
    canon = canonical_map_table(default_alias_dictionary().all_equiv_edges())

    n1, e1 = build_graph_tables(linked, canon)
    n2, e2 = build_graph_tables_joined(linked, ray.data.from_arrow(canon))
    for a, b, keys in ((n1, n2, ["id"]), (e1, e2, ["src", "pred", "dst"])):
        da = a.to_pandas().sort_values(keys).reset_index(drop=True)
        db = b.to_pandas().sort_values(keys).reset_index(drop=True)[da.columns]
        pd.testing.assert_frame_equal(da, db.astype(da.dtypes.to_dict()))


def test_kg_multisource_cross_source_union():
    """Composed three-source build: edges carry source-tagged evidence; an
    edge mentioned in both textual sources unions both tags and sums both
    weights; the embedding source contributes near_dup_of document edges."""
    import pandas as pd

    from multiomics_biocypher_kg_ray.pipelines.queries import q_kg_multisource

    edges = q_kg_multisource("/root/testdata/sf0.001").to_pandas()
    assert len(edges) > 0
    tags = set()
    for ev in edges["evidence"]:
        tags.update(p.split(":")[0] for p in ev.split("|"))
    assert tags == {"doc", "transcript", "emb"}
    nd = edges[edges["pred"] == "near_dup_of"]
    assert len(nd) > 0
    assert (nd["evidence"] == "emb:cosine").all()
    assert nd["src"].str.startswith("doc_").all()
    assert (nd["src"] < nd["dst"]).all()  # each unordered pair exactly once
    both = edges[
        edges["evidence"].str.contains("doc:")
        & edges["evidence"].str.contains("transcript:")
    ]
    assert len(both) > 0  # cross-source evidence union actually fires
    # evidence entries are sorted and distinct per edge
    for ev in edges["evidence"].head(50):
        parts = ev.split("|")
        assert parts == sorted(set(parts))


def test_edge_lifespan_intervals():
    import pandas as pd

    from multiomics_biocypher_kg_ray.stages.materialize import edge_lifespan

    canon = pa.table(
        {
            "member": ["x", "y", "z"],
            "canonical_id": ["ent_1", "ent_2", "ent_2"],
            "component_key": ["x", "y", "y"],
        }
    )
    base = pd.Timestamp("2024-03-01")
    linked = pa.table(
        {
            "conv_id": ["c1", "c1", "c2", "c2"],
            "turn_idx": pa.array([0, 1, 0, 1], pa.int64()),
            "pred": ["rel", "rel", "rel", "other"],
            "subj_id": ["x", "x", "x", None],
            "obj_id": ["y", "z", "y", "y"],
        }
    )
    ts = pa.table(
        {
            "conv_id": ["c1", "c1", "c2", "c2"],
            "turn_idx": pa.array([0, 1, 0, 1], pa.int64()),
            "role": ["user"] * 4,
            "text": ["t"] * 4,
            "tool": [""] * 4,
            "ts": pa.array(
                [base, base + pd.Timedelta(hours=2), base + pd.Timedelta(days=1),
                 base + pd.Timedelta(days=2)],
                pa.timestamp("us"),
            ),
        }
    )
    out = edge_lifespan(
        ray.data.from_arrow(linked), canon, ray.data.from_arrow(ts)
    ).to_pandas()
    # x->y and x->z collapse onto (ent_1, rel, ent_2); null subj drops
    assert len(out) == 1
    r = out.iloc[0]
    assert r["src"] == "ent_1" and r["dst"] == "ent_2" and r["n_mentions"] == 3
    assert r["first_seen"] == base
    assert r["last_seen"] == base + pd.Timedelta(days=1)
