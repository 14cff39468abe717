"""sorted_grouped_agg / sorted_distinct vs Ray's built-in aggregate —
exact equality (incl. nulls and composite keys) on data-proportional group
counts, where the Arrow-native path exists to dodge Ray's per-group Python
reduce (measured 26 s for 160K groups vs ~1 s)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min, Sum

from multiomics_biocypher_kg_ray.stages.fastagg import (
    sorted_distinct,
    sorted_grouped_agg,
)


def _mkds(n=30000, ngroups=12000, seed=7, with_nulls=True):
    rng = np.random.RandomState(seed)
    keys = [f"k{rng.randint(0, ngroups):06d}" for _ in range(n)]
    vals = [f"v{rng.randint(0, 10**6):06d}" for _ in range(n)]
    if with_nulls:
        vals = [None if rng.rand() < 0.07 else v for v in vals]
    nums = rng.randint(0, 1000, size=n)
    return ray.data.from_arrow(
        pa.table({"node": keys, "cand": vals, "w": nums})
    ).map_batches(lambda t: t, batch_size=2048, batch_format="pyarrow")


def test_sorted_grouped_agg_matches_ray_aggregate():
    ds = _mkds()
    fast = (
        sorted_grouped_agg(ds, ["node"], [("cand", "min"), ("w", "sum")],
                           out_names=["m", "s"])
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    ref = (
        ds.groupby("node")
        .aggregate(Min("cand", alias_name="m"), Sum("w", alias_name="s"))
        .to_pandas().sort_values("node").reset_index(drop=True)[fast.columns]
    )
    pd.testing.assert_frame_equal(fast, ref.astype(fast.dtypes.to_dict()))
    assert fast["node"].is_unique  # boundary keys collapsed exactly once


def test_sorted_grouped_agg_composite_keys():
    rng = np.random.RandomState(3)
    n = 20000
    t = pa.table(
        {
            "a": [f"a{rng.randint(0, 40):02d}" for _ in range(n)],
            "b": rng.randint(0, 300, size=n),
            "v": rng.randint(0, 10**6, size=n),
        }
    )
    ds = ray.data.from_arrow(t).map_batches(
        lambda x: x, batch_size=1024, batch_format="pyarrow"
    )
    fast = (
        sorted_grouped_agg(ds, ["a", "b"], [("v", "min")], out_names=["m"])
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    ref = (
        t.to_pandas().groupby(["a", "b"], as_index=False)["v"].min()
        .rename(columns={"v": "m"}).sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, ref.astype(fast.dtypes.to_dict()))


def test_sorted_distinct_unique_and_complete():
    ds = _mkds(n=20000, ngroups=9000, with_nulls=False)
    d = sorted_distinct(ds.select_columns(["node"]), ["node"]).to_pandas()
    ref = sorted(set(ds.to_pandas()["node"]))
    assert d["node"].is_unique
    assert sorted(d["node"]) == ref


def test_sorted_grouped_agg_property_vs_pandas():
    """Property-style sweep: random tables (varied sizes, null rates, group
    cardinalities, forced small/large path) must equal the pandas reference
    exactly."""
    from multiomics_biocypher_kg_ray.stages import fastagg

    rng = np.random.RandomState(42)
    for trial in range(6):
        n = int(rng.choice([0, 1, 37, 5000, 40000]))
        ngroups = max(1, int(rng.choice([1, 3, n or 1, (n or 1) * 2])))
        null_rate = float(rng.choice([0.0, 0.3, 1.0]))
        keys = [f"g{rng.randint(0, ngroups):06d}" for _ in range(n)]
        vals = [
            None if rng.rand() < null_rate else f"v{rng.randint(0, 50):03d}"
            for _ in range(n)
        ]
        nums = rng.randint(-100, 100, size=n)
        t = pa.table(
            {"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.string()),
             "w": pa.array(nums, pa.int64())}
        )
        ds = ray.data.from_arrow(t)
        if n:
            ds = ds.map_batches(lambda x: x, batch_size=max(1, n // 7), batch_format="pyarrow")
        # alternate forcing the big path
        old = fastagg.SMALL_PARTIALS_ROWS
        try:
            fastagg.SMALL_PARTIALS_ROWS = 0 if trial % 2 else old
            got = (
                fastagg.sorted_grouped_agg(
                    ds, ["k"], [("v", "min"), ("w", "sum"), ("w", "max")],
                    out_names=["vmin", "wsum", "wmax"],
                )
                .to_pandas().sort_values("k").reset_index(drop=True)
            )
        finally:
            fastagg.SMALL_PARTIALS_ROWS = old
        df = t.to_pandas()
        if n == 0:
            assert len(got) == 0
            continue
        ref = (
            df.groupby("k", as_index=False)
            .agg(
                # pandas object-min chokes on str/NaN mixes; dropna to match
                # arrow's ignore-null semantics
                vmin=("v", lambda s: s.dropna().min() if s.notna().any() else None),
                wsum=("w", "sum"),
                wmax=("w", "max"),
            )
            .sort_values("k").reset_index(drop=True)
        )
        # pandas min over all-NaN gives NaN; arrow gives null — both map to NaN
        pd.testing.assert_frame_equal(
            got.astype({"wsum": "int64", "wmax": "int64"}),
            ref.astype({"wsum": "int64", "wmax": "int64"}),
        )
        assert got["k"].is_unique
