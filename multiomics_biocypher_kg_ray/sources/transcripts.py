"""Deterministic transcript synthesizer (FIXTURES.md F1).

The engine's primary input is a Parquet table of multi-turn conversation /
agent transcripts ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``. No such table ships with the test data, so we
derive one *deterministically* from ``documents.parquet``: each document
becomes one conversation; its single-space-tokenized text is chunked into
turns of ``TURN_TOKENS`` tokens. The derivation is intentionally simple enough
to express identically in DuckDB SQL (see ``oracle.transcripts_cte``) so every
downstream KG stage has a true SQL oracle.

Spec (must stay in lockstep with ``oracle.transcripts_cte``):
- ``conv_id``  = 'conv_' + zero-padded 8-digit doc_id
- ``turn_idx`` = 0-based chunk index (int32); chunks of 8 space-split tokens
- ``role``     = 'user' if turn_idx even else 'assistant'
- ``text``     = the chunk re-joined with single spaces
- ``tool``     = 'search' when turn_idx % 3 == 2 else '' (null-sentinel cover)
- ``ts``       = 2024-01-01T00:00:00Z + doc_id hours + turn_idx minutes (µs)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

TURN_TOKENS = 8
EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 in µs since epoch
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def docs_to_turns(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) batch → transcript-turn batch (1→N flat map).

    Vectorized where it matters: the inner loop only slices a pre-split token
    list per turn; all column construction is bulk numpy/Arrow.
    """
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()

    conv_ids: list[str] = []
    out_doc: list[int] = []
    turn_idx: list[int] = []
    out_text: list[str] = []
    for d, t in zip(doc_ids, texts):
        toks = (t or "").split(" ")
        n_turns = (len(toks) + TURN_TOKENS - 1) // TURN_TOKENS
        cid = f"conv_{d:08d}"
        for i in range(n_turns):
            conv_ids.append(cid)
            out_doc.append(int(d))
            turn_idx.append(i)
            out_text.append(" ".join(toks[i * TURN_TOKENS : (i + 1) * TURN_TOKENS]))

    ti = np.asarray(turn_idx, dtype=np.int32)
    di = np.asarray(out_doc, dtype=np.int64)
    role = np.where(ti % 2 == 0, "user", "assistant")
    tool = np.where(ti % 3 == 2, "search", "")
    ts_us = EPOCH_2024_US + di * 3_600_000_000 + ti.astype(np.int64) * 60_000_000
    return pa.Table.from_arrays(
        [
            pa.array(conv_ids, pa.string()),
            pa.array(ti, pa.int32()),
            pa.array(role, pa.string()),
            pa.array(out_text, pa.string()),
            pa.array(tool, pa.string()),
            pa.array(ts_us).cast(pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def transcripts_dataset(sf_dir: str) -> "ray.data.Dataset":
    """Read documents (pruned to the 2 needed columns) → transcript Dataset."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(docs_to_turns, batch_format="pyarrow")


def synthesize_transcripts_parquet(
    sf_dir: str, out_dir: str, num_shards: int = 8
) -> str:
    """Materialize the transcript table as shard-partitioned Parquet.

    ``shard = doc_id % num_shards`` (a stand-in for ``hash(conv_id) % S``;
    doc_id is the conv key, and modulo keeps it SQL-checkable). One directory
    per shard is the unit of checkpoint/resume lineage (SURVEY.md §7, F5
    manifest) — at 100 TB the shard count is the input-fragment group count.
    """
    import pyarrow.compute as pc

    def add_shard(batch: pa.Table) -> pa.Table:
        did = pc.utf8_slice_codeunits(batch.column("conv_id"), 5, 99)
        shard = pc.mod(pc.cast(did, pa.int64()), num_shards)
        return batch.append_column("shard", pc.cast(shard, pa.int32()))

    ds = transcripts_dataset(sf_dir).map_batches(add_shard, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["shard"])
    return out_dir
