"""Join helpers — broadcast hash join for small sides, partitioned hash join
(``Dataset.join``) for two large sides.

Reference analog: every reference join is a driver-side dict probe against a
small side (``build_gene_annotations.py:996-1001``, ``uniprot_adapter.py:
80-133``); at 100 TB the small-side probes become ``ray.put``-broadcast tables
probed inside ``map_batches`` (no shuffle), and genuinely large-large joins
use Ray Data's hash-partitioned join.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..state.broadcast import fetch


class _BroadcastMerge:
    """Actor-pool stage: pandas merge of each batch against a broadcast table."""

    def __init__(self, small_ref, on, how, suffix) -> None:
        small = fetch(small_ref)
        if isinstance(small, pa.Table):
            small = small.to_pandas()
        self.small = small
        self.on = list(on)
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(
            self.small, on=self.on, how=self.how, suffixes=("", self.suffix)
        )


def broadcast_join(
    large: "ray.data.Dataset",
    small: "pa.Table | pd.DataFrame | ray.ObjectRef",
    on: tuple[str, ...] | list[str],
    how: str = "inner",
    *,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Join a Dataset against a small in-memory side without any shuffle.

    The small side is ``ray.put`` once and pulled once per actor — never
    re-shipped per batch (SURVEY.md §2.4 J1-J7 pattern).
    """
    ref = small if isinstance(small, ray.ObjectRef) else ray.put(small)
    return large.map_batches(
        _broadcast_merge_fn,
        fn_kwargs={
            "small_ref": ref,
            "on": tuple(on),
            "how": how,
            "suffix": suffix,
        },
        batch_format="pandas",
    )


def _broadcast_merge_fn(batch, small_ref, on, how, suffix):
    from ..state.broadcast import state_key, task_state

    merger = task_state(
        state_key("bmerge", small_ref, on, how, suffix),
        lambda: _BroadcastMerge(small_ref, on, how, suffix),
    )
    return merger(batch)


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...],
    how: str = "inner",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Large-large join: Ray Data hash-partitioned join (all-to-all shuffle).

    Keep the sides projected to the minimum column set before calling — wide
    payload columns must never ride through a shuffle (SURVEY.md §7.4).
    """
    return left.join(right, join_type=how, num_partitions=num_partitions, on=tuple(on))


def semi_join_filter(
    large: "ray.data.Dataset",
    key_set,
    column: str,
) -> "ray.data.Dataset":
    """Semi-join via broadcast key set (brite_adapter.py:104-134 analog)."""
    ref = key_set if isinstance(key_set, ray.ObjectRef) else ray.put(frozenset(key_set))
    return large.map_batches(
        _semi_filter_fn,
        fn_kwargs={"key_ref": ref, "column": column},
        batch_format="pyarrow",
    )


def _semi_filter_fn(batch: pa.Table, key_ref, column: str) -> pa.Table:
    import pyarrow.compute as pc

    from ..state.broadcast import state_key, task_state

    value_set = task_state(
        state_key("semiset", key_ref), lambda: pa.array(sorted(fetch(key_ref)))
    )
    return batch.filter(pc.is_in(batch.column(column), value_set=value_set))
