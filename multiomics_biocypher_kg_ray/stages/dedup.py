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

from ..arrow_util import pa_from_pandas

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

    # group count = distinct-document count (data-proportional) → the
    # Arrow-native grouped agg, not Ray's per-group-Python map_groups
    from .fastagg import sorted_grouped_agg

    return sorted_grouped_agg(
        docs.map_batches(fp, batch_format="pyarrow"),
        ["fingerprint_md5"],
        [("doc_id", "min"), ("doc_id", "count")],
        out_names=["keep_doc_id", "n_dupes"],
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


LSH_BUCKET_CAP = 1000


def lsh_bucket_stats(bands: "ray.data.Dataset", cap: int = LSH_BUCKET_CAP) -> "ray.data.Dataset":
    """Per-bucket size + truncation report for ``lsh_candidate_pairs``:
    (band_idx, band_hash, n_docs, n_truncated) for every candidate-generating
    bucket (n_docs ≥ 2); n_truncated is how many docs the pair-generation cap
    drops from that bucket. This is the 'no silent caps' side-channel — any
    bucket with n_truncated > 0 means the pair table under-reports it."""
    import pyarrow.compute as pc

    from .fastagg import sorted_grouped_agg

    # bucket-count-proportional groups → Arrow-native count
    counted = sorted_grouped_agg(
        bands.select_columns(["band_idx", "band_hash"]),
        ["band_idx", "band_hash"],
        [("band_hash", "count")],
        out_names=["count()"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("count()"), pa.int64())
        trunc = pc.max_element_wise(pc.subtract(n, pa.scalar(cap, pa.int64())), 0)
        out = pa.Table.from_arrays(
            [batch.column("band_idx"), batch.column("band_hash"), n, trunc],
            names=["band_idx", "band_hash", "n_docs", "n_truncated"],
        )
        return out.filter(pc.greater_equal(out.column("n_docs"), 2))

    return counted.map_batches(finish, batch_format="pyarrow")


def lsh_candidate_pairs(bands: "ray.data.Dataset", cap: int = LSH_BUCKET_CAP) -> "ray.data.Dataset":
    """groupby (band_idx, band_hash) → all intra-bucket pairs (a < b), then a
    second groupby dedups pairs hit by several bands, counting shared bands.

    Bucket blow-up guard: a bucket of m docs yields m(m-1)/2 pairs; buckets
    are capped (sorted by doc_id, first ``cap``). The cap is part of the
    operator contract — the SQL oracle applies the identical row_number cap —
    and truncation is reported via the companion ``lsh_bucket_stats`` table
    (n_truncated per bucket), never silently."""
    CAP = cap

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = np.sort(g["doc_id"].unique())[:CAP]
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[ia].astype(np.int64)),
                "doc_b": pa.array(ids[ib].astype(np.int64)),
            }
        )

    from .fastagg import sorted_grouped_agg

    cand = bands.groupby(["band_idx", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )
    # pair-count-proportional groups → Arrow-native count
    return sorted_grouped_agg(
        cand, ["doc_a", "doc_b"], [("doc_a", "count")], out_names=["n_shared_bands"]
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
    docs: "ray.data.Dataset", max_hamming: int = 8, cap: int = LSH_BUCKET_CAP
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: bucket on each of 4 16-bit bands (a pair
    within hamming ≤ 3 of 64 bits shares ≥1 exact band by pigeonhole; wider
    thresholds trade recall), verify hamming inside the bucket. Buckets are
    capped at the first ``cap`` docs by id (a degenerate corpus where every
    doc shares a band would otherwise quadratic-blow one task), same
    contract as ``lsh_candidate_pairs``."""

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
        g = g.sort_values("doc_id").drop_duplicates("doc_id").head(cap)
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
        return pa.table(
            {
                "doc_a": pa.array(rows["doc_a"], pa.int64()),
                "doc_b": pa.array(rows["doc_b"], pa.int64()),
                "hamming": pa.array(rows["hamming"], pa.int64()),
            }
        )

    exploded = simhashes(docs).map_batches(explode, batch_format="pyarrow")
    cand = exploded.groupby(["band_idx", "band_val"]).map_groups(
        pairs, batch_format="pandas"
    )
    # multi-band duplicates carry identical hamming → min == first; pair-
    # count-proportional groups → Arrow-native dedup
    from .fastagg import sorted_grouped_agg

    return sorted_grouped_agg(
        cand, ["doc_a", "doc_b"], [("hamming", "min")], out_names=["hamming"]
    )


# ------------------------------------------------------------------ jaccard


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    k_shingle: int = 3,
    min_jaccard: float = 0.0,
    max_doc_id: int | None = None,
    cap: int = LSH_BUCKET_CAP,
) -> "ray.data.Dataset":
    """Exact pairwise Jaccard over k-token shingle sets via a shingle-keyed
    self-join: explode (shingle, doc) → groupby shingle → co-occurring pairs
    → per-pair intersection counts → JOIN sizes → jaccard = |∩| / (|A|+|B|-|∩|).

    Scale contract:
    - set sizes flow back through two distributed hash joins on doc id —
      never a driver-side size dict captured in a task closure (that dict is
      corpus-proportional and re-pickles per task).
    - hot shingles (stopword-like, m ≫ cap co-occurring docs) are capped at
      the first ``cap`` docs by doc_id, the SAME cap + ordering the SQL
      oracle applies (``oracle_rel.sql_jaccard_pairs``), with truncation
      reported by ``jaccard_shingle_stats`` — never silently.
    - ``max_doc_id`` bounds the candidate universe for the verification tier
      (pairs outside it are dropped; part of the operator contract)."""
    from ..tuning import default_join_partitions

    exploded = _shingle_explode(docs, k_shingle, max_doc_id).materialize()

    def _rename(cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)

        return fn

    # doc-count-proportional groups → Arrow-native count
    from .fastagg import sorted_grouped_agg

    sizes = sorted_grouped_agg(
        exploded, ["doc_id"], [("doc_id", "count")], out_names=["set_size"]
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = np.sort(g["doc_id"].unique())[:cap]
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[ia].astype(np.int64)),
                "doc_b": pa.array(ids[ib].astype(np.int64)),
            }
        )

    from .fastagg import sorted_grouped_agg

    # intersection counts over pair-count-proportional groups → Arrow-native
    inter = sorted_grouped_agg(
        exploded.groupby("shingle").map_groups(pairs, batch_format="pandas"),
        ["doc_a", "doc_b"],
        [("doc_a", "count")],
        out_names=["n_shared"],
    )
    np_ = default_join_partitions()
    with_a = inter.join(
        sizes, join_type="inner", num_partitions=np_, on=("doc_a",), right_on=("doc_id",)
    ).map_batches(
        lambda t: t.rename_columns(
            ["doc_a", "doc_b", "n_shared", "size_a"]
        ),
        batch_format="pyarrow",
    )
    with_b = with_a.join(
        sizes, join_type="inner", num_partitions=np_, on=("doc_b",), right_on=("doc_id",)
    ).map_batches(
        lambda t: t.rename_columns(
            ["doc_a", "doc_b", "n_shared", "size_a", "size_b"]
        ),
        batch_format="pyarrow",
    )

    def score(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        inter_n = batch.column("n_shared").to_numpy(zero_copy_only=False)
        union = (
            batch.column("size_a").to_numpy(zero_copy_only=False)
            + batch.column("size_b").to_numpy(zero_copy_only=False)
            - inter_n
        )
        jac = np.where(union > 0, inter_n / np.maximum(union, 1), 0.0)
        out = pa.Table.from_arrays(
            [
                batch.column("doc_a"),
                batch.column("doc_b"),
                pc.cast(batch.column("n_shared"), pa.int64()),
                pa.array(jac, pa.float64()),
            ],
            names=["doc_a", "doc_b", "n_shared", "jaccard"],
        )
        return out.filter(pc.greater(out.column("jaccard"), min_jaccard))

    return with_b.map_batches(score, batch_format="pyarrow")


def _shingle_explode(
    docs: "ray.data.Dataset", k_shingle: int, max_doc_id: int | None
) -> "ray.data.Dataset":
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

    return docs.map_batches(explode, batch_format="pyarrow")


def jaccard_shingle_stats(
    docs: "ray.data.Dataset",
    k_shingle: int = 3,
    max_doc_id: int | None = None,
    cap: int = LSH_BUCKET_CAP,
) -> "ray.data.Dataset":
    """Hot-shingle report for ``ngram_jaccard_pairs``: (shingle, n_docs,
    n_truncated) for every pair-generating shingle (n_docs ≥ 2); buckets with
    n_truncated > 0 are under-reported in the pair table (the cap fired)."""
    import pyarrow.compute as pc

    from .fastagg import sorted_grouped_agg

    # shingle-count-proportional groups → Arrow-native count
    counted = sorted_grouped_agg(
        _shingle_explode(docs, k_shingle, max_doc_id),
        ["shingle"],
        [("shingle", "count")],
        out_names=["count()"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("count()"), pa.int64())
        trunc = pc.max_element_wise(pc.subtract(n, pa.scalar(cap, pa.int64())), 0)
        out = pa.Table.from_arrays(
            [batch.column("shingle"), n, trunc],
            names=["shingle", "n_docs", "n_truncated"],
        )
        return out.filter(pc.greater_equal(out.column("n_docs"), 2))

    return counted.map_batches(finish, batch_format="pyarrow")
