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
