"""Broadcast small-side state via the object store.

Pattern (SURVEY.md §2.3 ST1-ST7): put a small index/dictionary into the object
store ONCE on the driver (``ray.put``), hand the ObjectRef to actor-pool
constructors via ``fn_constructor_kwargs``, and ``ray.get`` it once per actor
in ``__init__`` — never re-ship per batch. On a multi-node cluster the object
is pulled to each node's local store once and shared zero-copy by its workers.
"""

from __future__ import annotations

from typing import Any

import ray


def broadcast(obj: Any) -> "ray.ObjectRef":
    return ray.put(obj)


def fetch(ref_or_obj: Any) -> Any:
    """Resolve an ObjectRef (or pass through a plain object, for unit tests)."""
    if isinstance(ref_or_obj, ray.ObjectRef):
        return ray.get(ref_or_obj)
    return ref_or_obj


_TASK_STATE: dict = {}


def state_key(*parts) -> tuple:
    """Build a hashable memo key; ObjectRefs are keyed by their hex id."""
    return tuple(p.hex() if isinstance(p, ray.ObjectRef) else p for p in parts)


def task_state(key, factory):
    """Per-worker-process memo for TASK-based ``map_batches`` stages.

    Ray reuses worker processes across tasks, so state built once per
    (worker, key) — a compiled pattern set, a fetched broadcast table —
    amortizes exactly like actor state, without an actor pool's static CPU
    partitioning or per-actor startup. Use actor pools only for state too
    expensive to hold once per worker (e.g. large models)."""
    inst = _TASK_STATE.get(key)
    if inst is None:
        inst = _TASK_STATE[key] = factory()
    return inst
