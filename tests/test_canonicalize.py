import pandas as pd
import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.stages.canonicalize import (
    assign_stable_ids,
    canonical_map,
    connected_components,
    union_find_components,
    zip_with_index,
)

# A chain a-b-c-d-e needs ≥3 min-label propagation rounds to converge
# (gene_id_graph.py:172-196 convergence analog), plus a separate pair and a
# singleton-free second component.
CHAIN = [("d", "e"), ("c", "d"), ("b", "c"), ("a", "b"), ("x", "y"), ("y", "z")]


def test_union_find_min_key():
    comp = union_find_components(CHAIN)
    assert comp == {
        "a": "a",
        "b": "a",
        "c": "a",
        "d": "a",
        "e": "a",
        "x": "x",
        "y": "x",
        "z": "x",
    }


def test_distributed_matches_union_find():
    small = connected_components(CHAIN).to_pandas()
    dist = connected_components(CHAIN, force_distributed=True).to_pandas()
    a = small.sort_values("member").reset_index(drop=True)
    b = dist.sort_values("member").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_canonical_map_table_matches_distributed():
    from multiomics_biocypher_kg_ray.stages.canonicalize import canonical_map_table

    small = canonical_map_table(CHAIN).to_pandas()
    dist = (
        canonical_map(CHAIN, force_distributed=True)
        .to_pandas()
        .sort_values("member")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(small, dist)


def test_stable_ids_deterministic_across_runs():
    m1 = canonical_map(CHAIN).to_pandas().sort_values("member").reset_index(drop=True)
    m2 = canonical_map(CHAIN).to_pandas().sort_values("member").reset_index(drop=True)
    pd.testing.assert_frame_equal(m1, m2)
    # ids are dense ranks of sorted component keys: 'a' < 'x'
    assert m1.loc[m1["member"] == "a", "canonical_id"].iloc[0] == "ent_000001"
    assert m1.loc[m1["member"] == "z", "canonical_id"].iloc[0] == "ent_000002"


def test_zip_with_index_preserves_sort_order():
    tbl = pa.table({"k": [f"{i:04d}" for i in range(1000)]})
    ds = ray.data.from_arrow(tbl).repartition(7).sort("k")
    out = zip_with_index(ds, col="idx").to_pandas().sort_values("idx")
    assert list(out["idx"]) == list(range(1000))
    assert list(out["k"]) == sorted(out["k"])


def test_assign_stable_ids_empty():
    comps = ray.data.from_arrow(
        pa.table({"member": pa.array([], pa.string()), "component_key": pa.array([], pa.string())})
    )
    out = assign_stable_ids(comps).to_pandas()
    assert len(out) == 0


def test_learned_equiv_edges_and_data_canonical_map():
    """The GeneIdGraph data-loop analog: per-turn min-entity anchors, learned
    tok:/turn: edges, and component parity with a driver union-find over the
    same edge set."""
    from multiomics_biocypher_kg_ray.stages.canonicalize import (
        data_canonical_map,
        learned_equiv_edges,
        union_find_components,
    )

    linked = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c1", "c2", "c3"],
                "turn_idx": pa.array([0, 1, 0, 0], pa.int32()),
                "subj_text": ["foo", "bar", "baz", "qux"],
                "obj_text": ["x", "y", "x", "z"],
                "subj_id": ["term:b", None, "term:a", None],
                "obj_id": [None, "term:c", "term:a", None],
            }
        )
    )
    edges = learned_equiv_edges(linked).to_pandas()
    got = set(map(tuple, edges[["a", "b"]].itertuples(index=False)))
    # c1 turn0: anchor term:b → tok:foo, tok:x, turn edge
    # c1 turn1: anchor term:c → tok:bar, tok:y, turn edge
    # c2 turn0: anchor term:a (min of subj/obj both term:a) → tok:baz, tok:x
    # c3 turn0: no resolved side → NO anchor, learns nothing
    assert ("tok:foo", "term:b") in got
    assert ("tok:x", "term:b") in got and ("tok:x", "term:a") in got
    assert ("turn:c1:0", "term:b") in got and ("turn:c1:1", "term:c") in got
    assert not any(a.startswith("tok:qux") or a == "turn:c3:0" for a, _ in got)

    seed = [("term:b", "term:bb")]
    out = data_canonical_map(linked, seed).to_pandas()
    ref = union_find_components(list(got) + seed)
    comp = dict(zip(out["member"], out["component_key"]))
    assert comp == ref
    # tok:x bridges term:a and term:b ⇒ same canonical id
    ids = dict(zip(out["member"], out["canonical_id"]))
    assert ids["term:a"] == ids["term:b"] == ids["term:bb"]
    assert ids["term:c"] != ids["term:a"]
