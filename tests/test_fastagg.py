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
