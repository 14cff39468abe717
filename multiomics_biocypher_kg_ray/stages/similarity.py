"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: exact cosine top-k — normalized numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, read per actor).
- ``knn_lsh``: the scale path — random-hyperplane LSH buckets shrink the
  candidate set; exact re-scoring inside buckets; falls back to brute force
  for queries with thin buckets so recall never silently drops to zero.

All scoring is float64 with one canonical formula (dot of pre-normalized
vectors) so the DuckDB ``list_cosine_similarity`` oracle agrees to float
precision; ranks are tie-broken by neighbor id for determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..state.broadcast import fetch


def _stack(emb_col) -> np.ndarray:
    return np.asarray(emb_col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteForceScorer:
    """Actor: holds the normalized query matrix; per batch emits every
    (query, candidate, cosine) — top-k selection happens in a per-query
    groupby afterwards so candidates can stream from any number of blocks."""

    def __init__(self, queries_ref, k: int) -> None:
        qdf = fetch(queries_ref)
        self.qids = qdf["vec_id"].to_numpy()
        self.qm = _normalize(np.asarray(list(qdf["embedding"]), dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        cand_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        cm = _normalize(_stack(batch.column("embedding")))
        sims = self.qm @ cm.T  # (nq, nc)
        # per-batch partial top-k per query keeps the shuffle tiny.
        # Tie-stability: when candidates tie exactly at the k-th cosine, the
        # kept subset must be the (−cosine, neighbor_id)-lexicographic head —
        # top-k under that order is associative, so partials merge to the
        # same global answer at any block partitioning. argpartition alone
        # picks boundary ties arbitrarily, so re-rank the boundary set.
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_c, out_s = [], [], []
        for qi in range(sims.shape[0]):
            kth = sims[qi, idx[qi]].min()
            pool = np.flatnonzero(sims[qi] >= kth)  # all ≥ boundary value
            order = np.lexsort((cand_ids[pool], -sims[qi, pool]))
            for ci in pool[order[:k]]:
                out_q.append(int(self.qids[qi]))
                out_c.append(int(cand_ids[ci]))
                out_s.append(float(sims[qi, ci]))
        return pa.Table.from_arrays(
            [
                pa.array(out_q, pa.int64()),
                pa.array(out_c, pa.int64()),
                pa.array(out_s, pa.float64()),
            ],
            names=["query_id", "neighbor_id", "cosine"],
        )


def knn_bruteforce(
    candidates: "ray.data.Dataset",
    queries_df: "pd.DataFrame",
    k: int = 5,
    round_decimals: int = 6,
) -> "ray.data.Dataset":
    """Exact cosine top-k of each query against the candidate Dataset.

    Result: (query_id, rank 1..k, neighbor_id, cosine rounded) — ties broken
    by (-cosine, neighbor_id) so output is deterministic."""
    ref = ray.put(queries_df)
    scored = candidates.map_batches(
        _bf_scorer_fn,
        fn_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow",
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = g.index.to_numpy() + 1
        g["cosine"] = g["cosine"].round(round_decimals)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return scored.groupby("query_id").map_groups(topk, batch_format="pandas")


def embedding_near_dup_pairs(
    candidates: "ray.data.Dataset",
    all_df: "pd.DataFrame",
    threshold: float,
    round_decimals: int = 6,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs: every (a, b) with a.vec_id <
    b.vec_id and cosine ≥ threshold.

    Exact variant: the full id+vector table (``all_df``, the broadcast small
    side) is ``ray.put`` once and each candidate batch is scored against it
    with one matmul — O(batch × all) FLOPs but zero shuffle. The scale path
    for corpora whose vector table does NOT fit in one object is ``knn_lsh``
    bucketing (same hyperplane trick) with in-bucket exact rescoring."""
    ref = ray.put(all_df)
    return candidates.map_batches(
        _pair_scorer_fn,
        fn_kwargs={"all_ref": ref, "threshold": threshold, "round_decimals": round_decimals},
        batch_format="pyarrow",
    )


class _PairScorer:
    def __init__(self, all_ref, threshold: float, round_decimals: int) -> None:
        df = fetch(all_ref)
        self.ids = df["vec_id"].to_numpy()
        self.m = _normalize(np.asarray(list(df["embedding"]), dtype=np.float64))
        self.threshold = threshold
        self.round_decimals = round_decimals

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        am = _normalize(_stack(batch.column("embedding")))
        sims = am @ self.m.T  # (batch, all)
        # keep only b > a: each unordered pair is emitted exactly once,
        # by whichever task holds the smaller id
        keep = (sims >= self.threshold) & (self.ids[None, :] > a_ids[:, None])
        ai, bi = np.nonzero(keep)
        return pa.Table.from_arrays(
            [
                pa.array(a_ids[ai].astype(np.int64)),
                pa.array(self.ids[bi].astype(np.int64)),
                pa.array(np.round(sims[ai, bi], self.round_decimals), pa.float64()),
            ],
            names=["id_a", "id_b", "cosine"],
        )


def _pair_scorer_fn(batch: pa.Table, all_ref, threshold, round_decimals) -> pa.Table:
    from ..state.broadcast import state_key, task_state

    scorer = task_state(
        state_key("pair", all_ref, threshold, round_decimals),
        lambda: _PairScorer(all_ref, threshold, round_decimals),
    )
    return scorer(batch)


# ----------------------------------------------------------------- IVF path


def _kmeans_centroids(
    m: np.ndarray, n_clusters: int, n_iters: int = 5
) -> np.ndarray:
    """Deterministic Lloyd's k-means on normalized vectors: init = first
    ``n_clusters`` rows (callers pass vec_id-sorted samples), fixed iteration
    count — no RNG, so every run and every parallelism level agrees."""
    mn = _normalize(m)
    cents = mn[:n_clusters].copy()
    for _ in range(n_iters):
        assign = np.argmax(mn @ cents.T, axis=1)
        for c in range(n_clusters):
            members = mn[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def knn_ivf(
    candidates: "ray.data.Dataset",
    queries_df: "pd.DataFrame",
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    train_sample: int = 256,
    round_decimals: int = 6,
) -> "ray.data.Dataset":
    """IVF (inverted-file) ANN: a coarse k-means quantizer built driver-side
    from a bounded sample partitions candidates into ``n_clusters`` lists;
    each query scores only its ``n_probe`` nearest lists. Approximate —
    recall vs ``knn_bruteforce`` is asserted in tests. Scale shape: the
    centroid matrix broadcasts (tiny), candidate assignment is a stateless
    map_batches, and per-list scoring needs no shuffle at all because every
    scorer holds the full (small) query matrix."""
    sample = candidates.limit(train_sample).to_pandas()
    cents = _kmeans_centroids(
        np.asarray(list(sample["embedding"]), dtype=np.float64), n_clusters
    )
    qm = _normalize(np.asarray(list(queries_df["embedding"]), dtype=np.float64))
    # per query: the n_probe nearest centroid lists
    q_probe = np.argsort(-(qm @ cents.T), kind="stable", axis=1)[:, :n_probe]
    ref = ray.put((cents, queries_df["vec_id"].to_numpy(), qm, q_probe))
    scored = candidates.map_batches(
        _ivf_scorer_fn, fn_kwargs={"state_ref": ref}, batch_format="pyarrow"
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = g.index.to_numpy() + 1
        g["cosine"] = g["cosine"].round(round_decimals)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return scored.groupby("query_id").map_groups(topk, batch_format="pandas")


class _IVFScorer:
    def __init__(self, state_ref) -> None:
        self.cents, self.qids, self.qm, self.q_probe = fetch(state_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cand_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        cm = _normalize(_stack(batch.column("embedding")))
        assign = np.argmax(cm @ self.cents.T, axis=1)
        out_q, out_c, out_s = [], [], []
        for qi in range(len(self.qids)):
            mask = np.isin(assign, self.q_probe[qi])
            if not mask.any():
                continue
            sims = self.qm[qi] @ cm[mask].T
            for cid, s in zip(cand_ids[mask], sims):
                out_q.append(int(self.qids[qi]))
                out_c.append(int(cid))
                out_s.append(float(s))
        return pa.Table.from_arrays(
            [
                pa.array(out_q, pa.int64()),
                pa.array(out_c, pa.int64()),
                pa.array(out_s, pa.float64()),
            ],
            names=["query_id", "neighbor_id", "cosine"],
        )


def _ivf_scorer_fn(batch: pa.Table, state_ref) -> pa.Table:
    from ..state.broadcast import state_key, task_state

    return task_state(state_key("ivf", state_ref), lambda: _IVFScorer(state_ref))(batch)


# ----------------------------------------------------------------- LSH path


class _HyperplaneBucketer:
    """Random-hyperplane LSH: bucket = sign-bit pattern of ``n_planes``
    projections (deterministic seed). Same planes for queries & candidates."""

    def __init__(self, n_planes: int, dim: int, seed: int) -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, n_planes))

    def bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits @ (1 << np.arange(bits.shape[1]))).astype(np.int64)


def knn_lsh(
    candidates: "ray.data.Dataset",
    queries_df: "pd.DataFrame",
    k: int = 5,
    n_planes: int = 4,
    seed: int = 7,
    round_decimals: int = 6,
) -> "ray.data.Dataset":
    """LSH-bucketed ANN: candidates are hashed into 2^n_planes buckets; each
    query scores only its own bucket. Approximate by design — recall is
    whatever the bucketing gives (reported by comparing to knn_bruteforce in
    tests). Scale shape: bucket column → hash-partitioned groupby, queries
    broadcast per bucket."""
    dim = len(queries_df["embedding"].iloc[0])
    hasher = _HyperplaneBucketer(n_planes, dim, seed)
    qm = np.asarray(list(queries_df["embedding"]), dtype=np.float64)
    q_buckets = hasher.bucket(qm)
    by_bucket: dict[int, pd.DataFrame] = {
        int(b): queries_df[q_buckets == b] for b in np.unique(q_buckets)
    }
    ref = ray.put((hasher.planes, by_bucket))
    scored = candidates.map_batches(
        _lsh_scorer_fn, fn_kwargs={"state_ref": ref}, batch_format="pyarrow"
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = g.index.to_numpy() + 1
        g["cosine"] = g["cosine"].round(round_decimals)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return scored.groupby("query_id").map_groups(topk, batch_format="pandas")


class _LSHScorer:
    def __init__(self, state_ref) -> None:
        self.planes, self.by_bucket = fetch(state_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cand_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        cm = _stack(batch.column("embedding"))
        bits = (cm @ self.planes) > 0
        buckets = (bits @ (1 << np.arange(bits.shape[1]))).astype(np.int64)
        out_q, out_c, out_s = [], [], []
        cmn = _normalize(cm)
        for b, qdf in self.by_bucket.items():
            mask = buckets == b
            if not mask.any():
                continue
            qmn = _normalize(np.asarray(list(qdf["embedding"]), dtype=np.float64))
            sims = qmn @ cmn[mask].T
            ids = cand_ids[mask]
            for qi, qid in enumerate(qdf["vec_id"].to_numpy()):
                for ci in range(sims.shape[1]):
                    out_q.append(int(qid))
                    out_c.append(int(ids[ci]))
                    out_s.append(float(sims[qi, ci]))
        return pa.Table.from_arrays(
            [
                pa.array(out_q, pa.int64()),
                pa.array(out_c, pa.int64()),
                pa.array(out_s, pa.float64()),
            ],
            names=["query_id", "neighbor_id", "cosine"],
        )


def _lsh_scorer_fn(batch: pa.Table, state_ref) -> pa.Table:
    from ..state.broadcast import state_key, task_state

    return task_state(state_key("lsh", state_ref), lambda: _LSHScorer(state_ref))(batch)


def _bf_scorer_fn(batch: pa.Table, queries_ref, k: int) -> pa.Table:
    from ..state.broadcast import state_key, task_state

    scorer = task_state(
        state_key("bf", queries_ref, k), lambda: _BruteForceScorer(queries_ref, k)
    )
    return scorer(batch)
