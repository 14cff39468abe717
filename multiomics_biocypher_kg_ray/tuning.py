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


def default_actor_pool(stages: int = 2) -> int:
    """Fixed actor-pool size ≈ (CPUs-2)/stages: ``stages`` actor stages run
    concurrently in one streaming pipeline, and ≥2 CPUs must stay free for
    read/write TASK operators. A fixed pool that claims all CPUs deadlocks
    the pipeline (fixed pools hold their CPUs while idle, so ReadParquet
    tasks never schedule — observed as a 15-min hang at num_cpus=4 with two
    pools of 2). Standalone operators default to stages=2 (safe when chained
    with one other actor stage); a pipeline that KNOWS it runs a single
    fused actor stage passes stages=1 for full width.

    Fixed beats autoscaling here: Ray's autoscaling pool ramps up too slowly
    for second-scale stages (measured: (1, 32) bounds reached only ~5 actors
    over an 11 s extract — 5.5× parallelism on 32 CPUs; a fixed pool reaches
    full width immediately)."""
    return max(1, (cluster_cpus() - 2) // stages)


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
