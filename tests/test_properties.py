"""Property-based tests (hypothesis) — invariants the reference never tested
randomly (SURVEY §5 notes it has no property-based testing; these pin the
determinism guarantees SURVEY §7.4 demands).

Driver-side only (no Ray jobs inside hypothesis loops — examples run in
milliseconds)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from multiomics_biocypher_kg_ray.functions.parsefn import (
    expand_list_cell,
    fold_change_to_log2,
    parse_asterisk_number,
)
from multiomics_biocypher_kg_ray.stages.canonicalize import (
    canonical_map_table,
    union_find_components,
)

_ids = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
_edges = st.lists(st.tuples(_ids, _ids), min_size=0, max_size=30)


@settings(max_examples=200, deadline=None)
@given(_edges)
def test_union_find_invariant_under_permutation_and_duplication(edges):
    base = union_find_components(edges)
    perm = union_find_components(list(reversed(edges)) + edges)
    assert base == perm
    # component key is always a member of its own component and the min
    for m, key in base.items():
        assert base[key] == key
        assert key <= m or key == min(
            x for x, k in base.items() if k == key
        )


@settings(max_examples=100, deadline=None)
@given(_edges)
def test_canonical_ids_are_dense_rank_of_sorted_component_keys(edges):
    tbl = canonical_map_table(edges).to_pandas()
    if tbl.empty:
        return
    # member column sorted, unique; ids dense from ent_000001 in key order
    assert tbl["member"].is_monotonic_increasing
    keys = sorted(tbl["component_key"].unique())
    id_by_key = dict(zip(tbl["component_key"], tbl["canonical_id"]))
    for i, k in enumerate(keys, start=1):
        assert id_by_key[k] == f"ent_{i:06d}"


@settings(max_examples=300, deadline=None)
@given(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    st.sampled_from(["", "*", "**"]),
    st.sampled_from(["", "*", " *"]),
)
def test_parse_asterisk_number_roundtrip(x, pre, post):
    cell = f"{pre}{x!r}{post}"
    val, star = parse_asterisk_number(cell)
    assert val is not None and math.isclose(val, x, rel_tol=1e-12)
    assert star == bool(pre or post.strip())


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=1e-300, max_value=1e300))
def test_fold_change_linear_log2_roundtrip(x):
    out = fold_change_to_log2(x, "linear")
    assert out is not None and math.isclose(2.0**out, x, rel_tol=1e-9)
    # log2-declared passes through untouched
    assert fold_change_to_log2(out, "log2") == out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="abcXYZ09 ", min_size=1, max_size=8), max_size=5))
def test_expand_list_cell_full_value_first_and_deduped(tokens):
    cell = ", ".join(t.strip() for t in tokens if t.strip())
    out = expand_list_cell(cell)
    if not cell:
        assert out == []
        return
    assert out[0] == cell  # full value always first
    assert len(out) == len(set(out))  # deduped
    for t in tokens:
        t = t.strip()
        if t and "," not in t:
            assert t in out  # every split token survives
