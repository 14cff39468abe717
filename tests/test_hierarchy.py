"""Hierarchy-operator tests: ancestry closure, min/max-depth levels with
best-effort flag, dot-segment ancestor truncation, bidirectional prune."""

import pytest

from multiomics_biocypher_kg_ray.stages.hierarchy import (
    dag_closure,
    dag_levels,
    find_ancestor,
    tree_prune,
)

#      r
#     / \
#    a   b
#     \ / \
#      c   d
PARENTS = {"a": ["r"], "b": ["r"], "c": ["a", "b"], "d": ["b"]}


def test_dag_closure_includes_self_and_all_ancestors():
    t = dag_closure(PARENTS).to_pandas()
    got = {(r.node, r.ancestor) for r in t.itertuples()}
    assert ("c", "c") in got and ("c", "a") in got and ("c", "b") in got
    assert ("c", "r") in got
    assert ("r", "r") in got and ("r", "a") not in got
    # seed restriction: closure of {d} only
    t2 = dag_closure(PARENTS, seeds={"d"}).to_pandas()
    assert set(t2["node"]) == {"d"}
    assert set(t2["ancestor"]) == {"d", "b", "r"}


def test_dag_levels_min_max_and_best_effort():
    # c: via a = depth 2, via b = depth 2 → equal; add a long route
    parents = dict(PARENTS)
    parents["e"] = ["c"]
    parents["c"] = ["a", "b", "r"]  # c now reachable at depth 1 AND 2
    t = dag_levels(parents).to_pandas().set_index("node")
    assert t.loc["r", "min_depth"] == 0 and t.loc["r", "max_depth"] == 0
    assert t.loc["c", "min_depth"] == 1 and t.loc["c", "max_depth"] == 2
    assert bool(t.loc["c", "is_best_effort"]) is True
    assert bool(t.loc["a", "is_best_effort"]) is False
    assert t.loc["e", "min_depth"] == 2 and t.loc["e", "max_depth"] == 3


def test_dag_levels_cycle_detection():
    # reachable cycle → error; UNREACHABLE cycles are orphans and simply
    # omitted (reference orphan semantics)
    with pytest.raises(ValueError, match="cycle"):
        dag_levels({"a": ["r", "b"], "b": ["a"], "r": []})
    t = dag_levels({"a": ["b"], "b": ["a"], "r": [], "a2": ["r"]}).to_pandas()
    assert set(t["node"]) == {"r", "a2"}


def test_find_ancestor_longest_prefix_first():
    hier = {"3", "3.A", "3.A.1"}
    assert find_ancestor("3.A.1.35", hier) == "3.A.1"
    assert find_ancestor("3.B.9", hier) == "3"
    assert find_ancestor("9.Z.1", hier) is None
    assert find_ancestor("3", hier) is None  # strict ancestors only


def test_tree_prune_bidirectional_and_aliases():
    hier = {
        "1", "1.A", "1.A.1", "1.A.1.1", "1.A.1.2", "1.A.2",
        "2", "2.B", "2.B.5",
    }
    kept, aliases = tree_prune(hier, ["1.A.1", "2.B.5.7", "9.X"])
    # seed 1.A.1: up = {1, 1.A, 1.A.1}; down = its subtree
    assert {"1", "1.A", "1.A.1", "1.A.1.1", "1.A.1.2"} <= kept
    assert "1.A.2" not in kept  # sibling subtree not reached
    # seed 2.B.5.7 truncates to 2.B.5 and keeps its up-chain
    assert aliases["2.B.5.7"] == "2.B.5"
    assert {"2", "2.B", "2.B.5"} <= kept
    # unresolvable seed reported with '' anchor, keeps nothing
    assert aliases["9.X"] == ""
    assert not any(c.startswith("9") for c in kept)


def test_rollup_then_prune_single_hop_includes_pruned_descendants():
    """A12: the rollup runs over the FULL tree before pruning, so a kept
    ancestor's set must contain substrates of descendants the prune removed
    — and equal a naive full-tree recompute for every kept node."""
    from multiomics_biocypher_kg_ray.stages.hierarchy import rollup_then_prune

    hier = {"1", "1.A", "1.A.1", "1.A.2", "1.B", "1.B.1"}
    own = {c: {"s_" + c.replace(".", "_")} for c in hier}
    # seed anchors at 1.A.1 → kept = up-path {1, 1.A, 1.A.1} + descendants of
    # 1.A.1 (none); 1.A.2 and the whole 1.B subtree are pruned away
    rolled, kept, aliases = rollup_then_prune(hier, own, ["1.A.1"])
    assert kept == {"1", "1.A", "1.A.1"}
    for node in kept:
        naive = set()
        for d in hier:
            if d == node or d.startswith(node + "."):
                naive |= own[d]
        assert rolled[node] == naive, node
    # the invariant that matters: pruned descendants still contribute
    assert "s_1_A_2" in rolled["1.A"] and "s_1_B_1" in rolled["1"]
