"""Per-partition checkpointing with lineage manifests + hot-key salted
sharding — the resume story (north_rule: "each partition checkpoints its
emitted triples plus lineage metadata (partition id, input fragment, row
counts) so the job is resumable mid-pipeline").

Reference analog: file-level mtime/exists resume guards
(``resolve_paper_ids.py:460-466``, ``build_gene_annotations.py:957-959``) and
the 3-level filesystem cache (``docs/methods_pipeline_architecture.md:
122-126``) — reworked as: the input is sharded by ``hash(conv_id) % S`` (hot
conversations salted across shards by turn range), each shard's extract+link
output is written to a temp dir and atomically renamed, then a manifest row
(shard id, input fragments, row counts, wall ms) is written. Resume =
skip shards whose manifest exists (anti-join of manifest vs shard list).

Shards are the resume granularity; within a shard the Dataset still has full
block-level parallelism. At 100 TB a shard is a group of input fragments.
"""

from __future__ import annotations

import json
import os
import time
import zlib
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import DEFAULT_RULES
from ..stages.link import AliasIndex


def _hash_str(s: str) -> int:
    """Deterministic string hash (NOT Python's salted ``hash``)."""
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


# -------------------------------------------------------- salted sharding


def detect_hot_conversations(
    transcripts: "ray.data.Dataset", hot_threshold: int
) -> set[str]:
    """Conversations with more than ``hot_threshold`` turns (skew pass).

    Conversation-count-proportional group space → Arrow-native count
    (stages/fastagg.py), and the filter runs DISTRIBUTED before anything
    reaches the driver — only the hot set (tiny by definition) is pulled."""
    from ..stages.fastagg import sorted_grouped_agg

    counts = sorted_grouped_agg(
        transcripts.select_columns(["conv_id"]),
        ["conv_id"],
        [("conv_id", "count")],
        out_names=["n"],
    )
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), hot_threshold)).select(
            ["conv_id"]
        ),
        batch_format="pyarrow",
    )
    return {r["conv_id"] for r in hot.take_all()}


def shard_transcripts(
    transcripts: "ray.data.Dataset",
    out_dir: str,
    num_shards: int,
    *,
    hot_threshold: int | None = None,
    hot_turn_block: int = 1024,
) -> list[int]:
    """Write transcripts as ``shard=K`` Parquet partitions.

    Normal conversations: ``shard = crc32(conv_id) % S`` (co-located).
    Hot conversations (> hot_threshold turns): salted —
    ``shard = crc32(conv_id + ':' + turn_idx // block) % S`` so one giant
    conversation spreads over many shards instead of capsizing one
    (SURVEY §7.4 skew handling). Returns the list of shard ids written.
    """
    hot: set[str] = set()
    if hot_threshold is not None:
        hot = detect_hot_conversations(transcripts, hot_threshold)
    hot_ref = ray.put(hot)

    def add_shard(batch: pa.Table) -> pa.Table:
        # vectorized: crc once per DISTINCT conv (C++ unique + take fan-out);
        # the per-row Python path only runs for rows of HOT conversations
        # (few by definition) whose shard also depends on the turn block
        import numpy as np

        hotset = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        conv = batch.column("conv_id")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        uniq = pc.unique(conv)
        uniq_py = uniq.to_pylist()
        uniq_shard = np.asarray(
            [_hash_str(c) % num_shards for c in uniq_py], dtype=np.int32
        )
        inv = pc.index_in(conv, value_set=uniq).to_numpy(zero_copy_only=False)
        shard = uniq_shard[inv]
        hot_idx = [i for i, c in enumerate(uniq_py) if c in hotset]
        if hot_idx:
            tidx = batch.column("turn_idx").to_numpy(zero_copy_only=False)
            hot_mask = np.isin(inv, np.asarray(hot_idx))
            conv_py = None
            for i in np.flatnonzero(hot_mask):
                if conv_py is None:
                    conv_py = conv.to_pylist()
                shard[i] = _hash_str(
                    f"{conv_py[i]}:{int(tidx[i]) // hot_turn_block}"
                ) % num_shards
        return batch.append_column("shard", pa.array(shard, pa.int32()))

    ds = transcripts.map_batches(add_shard, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["shard"])
    return sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(out_dir) if d.startswith("shard=")
    )


# ------------------------------------------------------------ manifests


@dataclass
class ShardManifest:
    shard_id: int
    stage: str
    input_fragments: list[str]
    rows_in: int
    rows_out: int
    wall_ms: int


def _manifest_path(ckpt_dir: str, stage: str, shard_id: int) -> str:
    return os.path.join(ckpt_dir, "manifest", f"{stage}_shard_{shard_id:05d}.json")


def write_manifest(ckpt_dir: str, m: ShardManifest) -> None:
    """Atomic: write temp file then rename (a crashed run never leaves a
    half-written manifest claiming completion)."""
    path = _manifest_path(ckpt_dir, m.stage, m.shard_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def completed_shards(ckpt_dir: str, stage: str) -> set[int]:
    mdir = os.path.join(ckpt_dir, "manifest")
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for f in os.listdir(mdir):
        if f.startswith(f"{stage}_shard_") and f.endswith(".json"):
            out.add(int(f[len(stage) + 7 : -5]))
    return out


def read_manifests(ckpt_dir: str, stage: str) -> list[ShardManifest]:
    mdir = os.path.join(ckpt_dir, "manifest")
    out = []
    for sid in sorted(completed_shards(ckpt_dir, stage)):
        with open(_manifest_path(ckpt_dir, stage, sid)) as f:
            out.append(ShardManifest(**json.load(f)))
    return out


# ------------------------------------------------------- resumable runner


def run_extract_link_checkpointed(
    shards_dir: str,
    ckpt_dir: str,
    index: "AliasIndex",
    rules=DEFAULT_RULES,
    *,
    stage: str = "triples",
    max_concurrent_shards: int = 4,
) -> dict:
    """Per-shard extract+link with checkpoint/resume.

    For each shard not already in the manifest: read only that shard's
    fragments, extract, link, write to ``<ckpt>/<stage>/shard=K.tmp``,
    atomically rename to ``shard=K``, then write the manifest row. A rerun
    after a crash skips complete shards (resume = anti-join manifest vs
    shard list). Returns summary stats.

    ``max_concurrent_shards`` shard pipelines run from driver threads so
    one shard's read/write tail overlaps the next shard's compute (Ray
    executes concurrent Datasets from separate threads; a strictly
    sequential loop left the cluster idle between shards — measured 68 s →
    ~30 s for 16 shards of a 15M-turn input at 32 CPUs). Each shard is
    still atomically renamed + manifested independently, so the resume
    granularity is unchanged.
    """
    from concurrent.futures import ThreadPoolExecutor

    shard_ids = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(shards_dir)
        if d.startswith("shard=")
    )
    done = completed_shards(ckpt_dir, stage)
    index_ref = ray.put(index)
    ran = [sid for sid in shard_ids if sid not in done]
    skipped = [sid for sid in shard_ids if sid in done]

    def run_shard(sid: int) -> None:
        t0 = time.time()
        frag_dir = os.path.join(shards_dir, f"shard={sid}")
        fragments = sorted(os.listdir(frag_dir))
        ds = ray.data.read_parquet(frag_dir)
        rows_in = ds.count()
        # fused read→extract→link single pass (same fn as pipelines.kg)
        from .kg import _fused_extract_link

        linked = ds.map_batches(
            _fused_extract_link,
            fn_kwargs={"rules": rules, "index_ref": index_ref},
            batch_format="pyarrow",
        )
        out_dir = os.path.join(ckpt_dir, stage, f"shard={sid}")
        tmp_dir = out_dir + ".tmp"
        import shutil

        if os.path.isdir(tmp_dir):  # half-written by a crashed run
            shutil.rmtree(tmp_dir)
        if os.path.isdir(out_dir):
            # out_dir exists but its manifest does not (this shard is not in
            # ``done``): the previous run crashed BETWEEN the rename and
            # write_manifest. The output is unverified — remove it, else
            # os.replace raises ENOTEMPTY and resume errors out forever.
            shutil.rmtree(out_dir)
        linked = linked.materialize()
        rows_out = linked.count()
        linked.write_parquet(tmp_dir)
        os.replace(tmp_dir, out_dir)
        write_manifest(
            ckpt_dir,
            ShardManifest(
                shard_id=sid,
                stage=stage,
                input_fragments=[os.path.join(frag_dir, f) for f in fragments],
                rows_in=rows_in,
                rows_out=rows_out,
                wall_ms=int((time.time() - t0) * 1000),
            ),
        )

    with ThreadPoolExecutor(max_workers=max(1, max_concurrent_shards)) as pool:
        list(pool.map(run_shard, ran))
    return {"ran": ran, "skipped": skipped, "total": len(shard_ids)}


def load_checkpointed(ckpt_dir: str, stage: str = "triples") -> "ray.data.Dataset":
    """Read all completed shard outputs back as one Dataset (for the global
    canonicalize/materialize phases)."""
    return ray.data.read_parquet(os.path.join(ckpt_dir, stage))
