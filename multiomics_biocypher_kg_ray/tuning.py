"""Cluster-size-aware tuning helpers.

Partition counts scale with the session's CPU count instead of being
hard-coded: on the 32-CPU bench box a join gets 32 partitions; on a 256-node
cluster it gets up to the cap. Callers that own the Ray session (tests,
bench.py, CLIs) may also call ``tune_context_for_small_data`` to stop Ray Data
from splitting kilobyte-sized test inputs into 200 blocks.
"""

from __future__ import annotations

import ray

JOIN_PARTITION_CAP = 256


def cluster_cpus(default: int = 8) -> int:
    try:
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def default_join_partitions() -> int:
    return max(2, min(JOIN_PARTITION_CAP, cluster_cpus()))


def tune_context_for_small_data(parallelism: int | None = None) -> None:
    """Lower Ray Data's 200-block default splits for small/local inputs.
    Only session owners (tests, bench, tools) should call this."""
    from ray.data import DataContext

    p = parallelism or max(4, cluster_cpus())
    ctx = DataContext.get_current()
    ctx.min_parallelism = p
    ctx.read_op_min_num_blocks = p
    ctx.default_hash_shuffle_parallelism = p
    ctx.enable_progress_bars = False
    # Fractional CPUs for hash-join/shuffle aggregator actors: with a small
    # CPU budget, full-CPU aggregators starve the producer tasks feeding them
    # and the pipeline deadlocks (observed at num_cpus=2).
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.125
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.125
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.125
