"""Property tests for the session-15..24 integer kernels — exact-sum and
conservation invariants under hypothesis-generated inputs. Ray-free where
possible: the invariants live in the integer math, so the properties drive
the same formulas the distributed paths implement (and the hand-value tests
in test_s15..s24 pin the distributed paths to those formulas)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d", "e", "f"]),
            st.integers(min_value=1, max_value=1000),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=100_000),
)
def test_quota_allocate_sums_exactly_and_bounds(rows, total):
    from multiomics_biocypher_kg_ray.stages.relational import quota_allocate

    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array([r[0] for r in rows]),
                "w": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
    out = quota_allocate(ds, "g", "w", total).to_pandas()
    W = sum(r[1] for r in rows)
    # exact-sum invariant
    assert int(out["quota"].sum()) == total
    # every quota within 1 of its exact proportional share (Hamilton bound)
    for r in out.itertuples():
        exact = total * r.weight / W
        assert math.floor(exact) <= r.quota <= math.floor(exact) + 1


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(10**6), max_value=10**6),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_weighted_median_is_weighted_median(cells):
    from multiomics_biocypher_kg_ray.stages.relational import weighted_median

    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["x"] * len(cells)),
                "v": pa.array([c[0] for c in cells], pa.int64()),
                "w": pa.array([c[1] for c in cells], pa.int64()),
            }
        )
    ).repartition(2)
    out = weighted_median(ds, "g", "v", "w").to_pandas().iloc[0]
    med = int(out["wmedian"])
    W = sum(w for _, w in cells)
    below = sum(w for v, w in cells if v < med)
    upto = sum(w for v, w in cells if v <= med)
    # the defining property of the weighted lower median
    assert 2 * upto >= W
    assert 2 * below < W


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=30),
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=30),
)
def test_welch_formula_matches_float_reference(a, b):
    # the exact mirrored-double chain equals the straightforward float
    # computation to within 1 micro (the floor boundary)
    import statistics

    na, nb = len(a), len(b)
    sa, qa = sum(a), sum(v * v for v in a)
    sb, qb = sum(b), sum(v * v for v in b)
    fna, fnb = np.float64(na), np.float64(nb)
    ma = np.float64(sa) / fna
    mb = np.float64(sb) / fnb
    va = (np.float64(qa) - (np.float64(sa) * np.float64(sa)) / fna) / (
        fna - np.float64(1.0)
    )
    vb = (np.float64(qb) - (np.float64(sb) * np.float64(sb)) / fnb) / (
        fnb - np.float64(1.0)
    )
    se = va / fna + vb / fnb
    if se <= 0:
        return
    t2_engine = int(np.floor((ma - mb) * (ma - mb) * np.float64(1e6) / se))
    ref = (statistics.fmean(a) - statistics.fmean(b)) ** 2 / (
        statistics.variance(a) / na + statistics.variance(b) / nb
    )
    assert abs(t2_engine - math.floor(ref * 1e6)) <= 2


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=1000, max_value=100_000),
            min_size=3,
            max_size=20,
        ),
        min_size=2,
        max_size=5,
    )
)
def test_anova_integer_chain_tracks_float_f(groups):
    # At cents-scale magnitudes the k+1 units lost to the A/B floors are
    # negligible against s²/n (~10⁶+). The bound below is derived from
    # |ΔSSB| ≤ k+1 and |ΔSSW| ≤ k: Δf ≤ f·(k/SSW) + 10⁶·(k+1)·(N−k)/((k−1)·SSW).
    ns = [len(g) for g in groups]
    ss = [sum(g) for g in groups]
    N, S = sum(ns), sum(ss)
    Q = sum(v * v for g in groups for v in g)
    k = len(groups)
    A = sum(s * s // n for n, s in zip(ns, ss))
    B = S * S // N
    ssw = Q - A
    if ssw < 10_000 or N <= k:
        return
    f_int = (1_000_000 * (A - B) * (N - k)) // ((k - 1) * ssw)
    Af = sum(s * s / n for n, s in zip(ns, ss))
    ssb_f, ssw_f = Af - S * S / N, Q - Af
    if ssw_f <= 0:
        return
    f_ref = (ssb_f / (k - 1)) / (ssw_f / (N - k)) * 1e6
    slack = f_ref * k / ssw + 1e6 * (k + 1) * (N - k) / ((k - 1) * ssw) + 2
    assert abs(f_int - f_ref) <= slack
