"""Property tests: the round-5 vectorized shingle/MinHash kernels must be
EXACTLY equivalent to the scalar reference functions they replaced —
hypothesis drives arbitrary unicode/whitespace/empty corpora through both
paths."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from multiomics_biocypher_kg_ray.functions.textfn import (
    normalize_ws_lower,
    shingle_explode,
    shingles,
)

texts_st = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=60,
        ),
    ),
    min_size=0,
    max_size=12,
)


@given(texts=texts_st, k=st.integers(min_value=1, max_value=4))
@settings(max_examples=60, deadline=None)
def test_shingle_explode_matches_scalar_reference(texts, k):
    doc_idx, sh = shingle_explode(pa.array(texts, pa.string()), k)
    got: dict[int, list[str]] = {}
    for d, s in zip(doc_idx, sh.to_pylist()):
        got.setdefault(int(d), []).append(s)
    for i, t in enumerate(texts):
        norm = normalize_ws_lower(pa.array([t if t is not None else ""])).to_pylist()[0]
        exp = shingles(norm.split(" "), k)
        assert got.get(i, []) == exp, (i, t)


@given(texts=texts_st)
@settings(max_examples=25, deadline=None)
def test_minhash_sig_rows_matches_scalar_reference(texts):
    from multiomics_biocypher_kg_ray.functions.textfn import minhash_signature
    from multiomics_biocypher_kg_ray.stages.dedup import minhash_sig_rows

    ids = pa.array(list(range(len(texts))), pa.int64())
    sig = minhash_sig_rows(ids, pa.array(texts, pa.string()), 3, 4)
    got: dict[int, dict[int, str]] = {}
    for r in sig.to_pylist():
        got.setdefault(r["doc_id"], {})[r["seed"]] = r["mh"]
    for i, t in enumerate(texts):
        norm = normalize_ws_lower(pa.array([t if t is not None else ""])).to_pylist()[0]
        sh = sorted(set(shingles(norm.split(" "), 3)))
        if not sh:
            assert i not in got
            continue
        exp = {s: mh for s, mh in enumerate(minhash_signature(sh, 4))}
        assert got.get(i) == exp, (i, t)
