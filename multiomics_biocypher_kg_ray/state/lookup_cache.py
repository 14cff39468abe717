"""Shared external-lookup cache actor (ST7).

Reference analog: the IPG cross-reference fetch cache — an on-disk SQLite
key→value store consulted before every (slow, rate-limited) external lookup
(``multiomics_kg/download/build_gene_id_mapping.py:40-45``,
``multiomics_kg/utils/ncbi_protein_xref.py``,
``scripts/migrate_ipg_cache_to_sqlite.py``).

Ray shape: ONE named detached-scope cache actor per pipeline holds the
in-memory dict and persists it to Parquet; ``enrich_with_cache`` is a
``map_batches`` stage whose tasks send each batch's MISSING keys (deduped
per batch, memoized per worker) to the actor, which computes them once via
the caller's lookup function and returns the values. The expensive lookup
therefore runs at most once per distinct key across the whole cluster, and
a restarted run warms from the Parquet spill (resume story).

Scale notes: the actor is the serialization point ONLY for cache misses —
steady-state batches resolve from the per-worker memo without an actor
round-trip. Key spaces that outgrow one actor shard by ``hash(key) % N``
across N actors (``CachedLookupPool``); values must be plain strings (the
reference stores JSON blobs the same way).
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


@ray.remote(num_cpus=0)
class LookupCacheActor:
    """Key→value cache with Parquet persistence and batched get-or-compute.

    ``lookup_fn`` maps a LIST of missing keys to a same-length list of
    values (the batched form every real external API offers). num_cpus=0:
    the actor mostly waits on I/O and must never hold a CPU slot that
    starves the data tasks (see tuning.default_actor_pool for the deadlock
    this avoids)."""

    def __init__(self, lookup_fn: Callable[[list[str]], list[str]],
                 spill_path: str | None = None) -> None:
        self._fn = lookup_fn
        self._spill = spill_path
        self._cache: dict[str, str] = {}
        self._misses = 0
        self._hits = 0
        if spill_path and os.path.exists(spill_path):
            t = __import__("pyarrow.parquet", fromlist=["read_table"]).read_table(
                spill_path
            )
            self._cache = dict(
                zip(t.column("key").to_pylist(), t.column("value").to_pylist())
            )

    def get_or_compute(self, keys: list[str]) -> dict[str, str]:
        missing = [k for k in keys if k not in self._cache]
        self._hits += len(keys) - len(missing)
        if missing:
            self._misses += len(missing)
            vals = self._fn(missing)
            self._cache.update(zip(missing, vals))
        return {k: self._cache[k] for k in keys}

    def persist(self) -> int:
        """Atomic Parquet spill (write temp + rename); returns entry count."""
        if not self._spill:
            return len(self._cache)
        import pyarrow.parquet as pq

        os.makedirs(os.path.dirname(self._spill) or ".", exist_ok=True)
        keys = sorted(self._cache)
        tmp = self._spill + ".tmp"
        pq.write_table(
            pa.table({"key": keys, "value": [self._cache[k] for k in keys]}), tmp
        )
        os.replace(tmp, self._spill)
        return len(self._cache)

    def stats(self) -> dict:
        return {"entries": len(self._cache), "hits": self._hits, "misses": self._misses}


# per-worker memo: steady-state keys resolve without an actor round-trip
_WORKER_MEMO: dict[str, dict[str, str]] = {}


def _enrich_fn(batch: pa.Table, actor, key_col: str, out_col: str, memo_key: str) -> pa.Table:
    memo = _WORKER_MEMO.setdefault(memo_key, {})
    col = batch.column(key_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    uniq = [k for k in pc.unique(col).to_pylist() if k is not None]
    missing = [k for k in uniq if k not in memo]
    if missing:
        memo.update(ray.get(actor.get_or_compute.remote(missing)))
    vals = pa.array([None if k is None else memo[k] for k in uniq], pa.string())
    inv = pc.index_in(col, value_set=pa.array(uniq, pa.string()))
    return batch.append_column(out_col, pc.take(vals, inv))


def enrich_with_cache(
    ds: "ray.data.Dataset",
    actor: "ray.actor.ActorHandle",
    key_col: str,
    out_col: str,
) -> "ray.data.Dataset":
    """Stage: add ``out_col`` = cached-lookup(``key_col``) to every row.

    Per batch: distinct keys (C++ unique), worker-memo probe, ONE actor call
    for the genuinely new keys, vectorized fan-out via ``index_in``/``take``
    — the reference's row-at-a-time cache-or-fetch loop re-expressed so the
    per-row cost is an Arrow take."""
    memo_key = actor._actor_id.hex()
    return ds.map_batches(
        _enrich_fn,
        fn_kwargs={
            "actor": actor,
            "key_col": key_col,
            "out_col": out_col,
            "memo_key": memo_key,
        },
        batch_format="pyarrow",
    )
