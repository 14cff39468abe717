import os
import shutil

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from multiomics_biocypher_kg_ray.config import default_alias_dictionary
from multiomics_biocypher_kg_ray.pipelines import checkpoint as cp
from multiomics_biocypher_kg_ray.sources.transcripts import transcripts_dataset
from multiomics_biocypher_kg_ray.stages.link import AliasIndex


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def test_salted_sharding_spreads_hot_conversation(workdir):
    # one hot conversation with 5000 turns, a few normal ones
    rows = []
    for i in range(5000):
        rows.append(("conv_hot", i))
    for c in range(5):
        for i in range(10):
            rows.append((f"conv_{c}", i))
    tbl = pa.table(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": ["user"] * len(rows),
            "text": ["a join b"] * len(rows),
            "tool": [""] * len(rows),
            "ts": pa.array([None] * len(rows), pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = os.path.join(workdir, "shards")
    shard_ids = cp.shard_transcripts(
        ds, out, num_shards=8, hot_threshold=100, hot_turn_block=512
    )
    assert len(shard_ids) >= 2
    # the hot conversation must appear in more than one shard
    found = set()
    for sid in shard_ids:
        t = ray.data.read_parquet(os.path.join(out, f"shard={sid}")).to_pandas()
        if (t["conv_id"] == "conv_hot").any():
            found.add(sid)
        # a NORMAL conversation must stay in exactly one shard
    assert len(found) >= 2
    normal_shards = set()
    for sid in shard_ids:
        t = ray.data.read_parquet(os.path.join(out, f"shard={sid}")).to_pandas()
        if (t["conv_id"] == "conv_0").any():
            normal_shards.add(sid)
    assert len(normal_shards) == 1


def test_checkpoint_resume_skips_done_shards(workdir, sf_small):
    shards_dir = os.path.join(workdir, "shards")
    ckpt = os.path.join(workdir, "ckpt")
    cp.shard_transcripts(transcripts_dataset(sf_small), shards_dir, num_shards=4)
    index = AliasIndex(default_alias_dictionary())

    r1 = cp.run_extract_link_checkpointed(shards_dir, ckpt, index)
    assert sorted(r1["ran"]) == list(range(4)) and r1["skipped"] == []

    # simulate crash recovery: delete one shard's output+manifest → only it reruns
    shutil.rmtree(os.path.join(ckpt, "triples", "shard=2"))
    os.remove(os.path.join(ckpt, "manifest", "triples_shard_00002.json"))
    r2 = cp.run_extract_link_checkpointed(shards_dir, ckpt, index)
    assert r2["ran"] == [2] and sorted(r2["skipped"]) == [0, 1, 3]

    # lineage manifests carry fragments + row counts
    ms = cp.read_manifests(ckpt, "triples")
    assert len(ms) == 4
    assert all(m.rows_in > 0 and m.input_fragments for m in ms)

    # the checkpointed union equals a direct un-sharded run
    direct = (
        ray.data.read_parquet(shards_dir)
        .map_batches(lambda t: t.drop_columns(["shard"]), batch_format="pyarrow")
        .count()
    )
    assert cp.load_checkpointed(ckpt).count() > 0
    assert direct == transcripts_dataset(sf_small).count()


def test_halfwritten_tmp_dir_is_recovered(workdir, sf_small):
    shards_dir = os.path.join(workdir, "shards")
    ckpt = os.path.join(workdir, "ckpt")
    cp.shard_transcripts(transcripts_dataset(sf_small), shards_dir, num_shards=2)
    # fake a crashed run: stale tmp dir with junk
    stale = os.path.join(ckpt, "triples", "shard=0.tmp")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("partial")
    index = AliasIndex(default_alias_dictionary())
    r = cp.run_extract_link_checkpointed(shards_dir, ckpt, index)
    assert sorted(r["ran"]) == [0, 1]
    assert not os.path.isdir(stale)


def test_hard_kill_mid_run_resumes_to_identical_output(workdir, sf_small):
    """The north-rule resumability criterion, end to end: a WORKER PROCESS
    DIES (os._exit, no cleanup, no atexit) partway through the sharded
    extract+link run; a fresh process resumes from the manifests and the
    final output is byte-identical to an uninterrupted run."""
    import subprocess
    import sys

    shards_dir = os.path.join(workdir, "shards")
    cp.shard_transcripts(transcripts_dataset(sf_small), shards_dir, num_shards=6)

    # uninterrupted reference run (same shard files)
    clean_ckpt = os.path.join(workdir, "ckpt_clean")
    index = AliasIndex(default_alias_dictionary())
    cp.run_extract_link_checkpointed(
        shards_dir, clean_ckpt, index, max_concurrent_shards=1
    )

    # child process: dies WITHOUT cleanup right after the 2nd manifest
    kill_ckpt = os.path.join(workdir, "ckpt_killed")
    child = f"""
import os, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(cp.__file__)))!r})
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from multiomics_biocypher_kg_ray.tuning import tune_context_for_small_data
tune_context_for_small_data()
from multiomics_biocypher_kg_ray.config import default_alias_dictionary
from multiomics_biocypher_kg_ray.pipelines import checkpoint as cp
from multiomics_biocypher_kg_ray.stages.link import AliasIndex
real = cp.write_manifest
n = [0]
def dying(ckpt_dir, m):
    real(ckpt_dir, m)
    n[0] += 1
    if n[0] >= 2:
        os._exit(9)  # hard death: no ray.shutdown, no atexit, no flush
cp.write_manifest = dying
cp.run_extract_link_checkpointed(
    {shards_dir!r}, {kill_ckpt!r},
    AliasIndex(default_alias_dictionary()), max_concurrent_shards=1)
"""
    r = subprocess.run(
        [sys.executable, "-c", child], capture_output=True, text=True
    )
    assert r.returncode == 9, r.stderr[-2000:]
    done_after_kill = cp.completed_shards(kill_ckpt, "triples")
    assert len(done_after_kill) == 2

    # resume in THIS process: only the remaining shards run
    r2 = cp.run_extract_link_checkpointed(
        shards_dir, kill_ckpt, index, max_concurrent_shards=1
    )
    assert sorted(r2["skipped"]) == sorted(done_after_kill)
    assert len(r2["ran"]) == 4

    a = cp.load_checkpointed(clean_ckpt).to_pandas()
    b = cp.load_checkpointed(kill_ckpt).to_pandas()
    key = sorted(a.columns)
    a = a[key].sort_values(key).reset_index(drop=True)
    b = b[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
