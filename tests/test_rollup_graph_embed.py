"""Round-4 operators: GROUP BY ROLLUP, two-hop graph counts, label
centroids, distributed deterministic k-means — each against an independent
single-process reference (DuckDB or numpy)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from multiomics_biocypher_kg_ray.stages.materialize import two_hop_counts
from multiomics_biocypher_kg_ray.stages.relational import rollup_agg
from multiomics_biocypher_kg_ray.stages.similarity import (
    kmeans_assign,
    label_centroids,
)


def test_rollup_agg_matches_duckdb():
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], size=500),
            "b": rng.randint(0, 9, size=500).astype("int64"),
            "c": rng.randint(-100, 100, size=500).astype("int64"),
        }
    )
    out = (
        rollup_agg(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5),
            keys=["a", "b"],
            sums=["c"],
        )
        .to_pandas()
        .sort_values(["a", "b"], na_position="first")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = (
        con.sql(
            "SELECT a, b, count(*)::BIGINT AS n, sum(c)::BIGINT AS c "
            "FROM t GROUP BY ROLLUP(a, b)"
        )
        .df()
        .sort_values(["a", "b"], na_position="first")
        .reset_index(drop=True)
    )
    assert len(out) == len(ref)
    assert (out["n"].to_numpy() == ref["n"].to_numpy()).all()
    assert (out["c"].to_numpy() == ref["c"].to_numpy()).all()
    # levels present: finest + per-a + grand total
    assert out["b"].isna().sum() == df["a"].nunique() + 1
    assert (out["a"].isna() & out["b"].isna()).sum() == 1


def test_two_hop_counts_tiny_graph():
    edges = pd.DataFrame(
        {
            "src": ["a", "a", "b", "c", "d"],
            "dst": ["b", "c", "c", "d", "a"],
        }
    )
    out = (
        two_hop_counts(
            ray.data.from_arrow(pa.Table.from_pandas(edges, preserve_index=False)).repartition(2)
        )
        .to_pandas()
        .set_index("src")["n_two_hop"]
        .to_dict()
    )
    # a->b->c, a->c->d  => {c, d}; b->c->d => {d}; c->d->a => {a}; d->a->{b,c}
    assert out == {"a": 2, "b": 1, "c": 1, "d": 2}


def test_label_centroids_exact_vs_numpy(sf_small):
    t = pq.read_table(f"{sf_small}/embeddings.parquet", columns=["label", "embedding"])
    labels = t.column("label").to_numpy(zero_copy_only=False)
    flat = t.column("embedding").combine_chunks().flatten()
    d = len(flat) // t.num_rows
    ppm = (
        np.floor(flat.to_numpy(zero_copy_only=False).astype(np.float64) * 1e6)
        .astype(np.int64)
        .reshape(t.num_rows, d)
    )
    out = (
        label_centroids(ray.data.read_parquet(f"{sf_small}/embeddings.parquet").repartition(4))
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    for lab in np.unique(labels):
        m = labels == lab
        want = ppm[m].sum(axis=0) / m.sum()
        got = out[out["label"] == lab]["mean_ppm"].to_numpy()
        assert (got == want).all()  # exact: integer sums, identical division


def _ref_kmeans(m: np.ndarray, ids: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Single-process reference with the SAME determinism contract as
    kmeans_assign: ppm-quantized integer sums, argmin tie → smallest index."""
    order = np.argsort(ids, kind="stable")
    cents = m[order[:k]].astype(np.float64).copy()
    mq = np.floor(m * 1e6).astype(np.int64)
    for _ in range(iters):
        d2 = (m * m).sum(1, keepdims=True) - 2.0 * (m @ cents.T) + (cents * cents).sum(1)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            sel = assign == c
            if sel.any():
                cents[c] = mq[sel].sum(axis=0).astype(np.float64) / (1e6 * sel.sum())
    d2 = (m * m).sum(1, keepdims=True) - 2.0 * (m @ cents.T) + (cents * cents).sum(1)
    return np.argmin(d2, axis=1)


def test_kmeans_assign_matches_reference(sf_small):
    t = pq.read_table(f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    flat = t.column("embedding").combine_chunks().flatten()
    d = len(flat) // t.num_rows
    m = flat.to_numpy(zero_copy_only=False).astype(np.float64).reshape(t.num_rows, d)
    want = _ref_kmeans(m, ids, k=8, iters=4)
    out = (
        kmeans_assign(
            ray.data.read_parquet(f"{sf_small}/embeddings.parquet").repartition(4),
            k=8,
            iters=4,
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    order = np.argsort(ids, kind="stable")
    assert (out["cluster"].to_numpy() == want[order]).all()
    # sane clustering: every cluster non-trivial on the synthetic blobs
    assert out["cluster"].nunique() >= 2


def test_doc_unigram_score_tiny():
    from multiomics_biocypher_kg_ray.stages.text import doc_unigram_score

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a a b", "a", ""],  # corpus: a=3, b=1, total=4
        }
    )
    out = (
        doc_unigram_score(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(2)
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # ppm: a = floor(3e6/4) = 750000, b = floor(1e6/4) = 250000
    assert list(out["doc_id"]) == [1, 2]  # empty doc has no tokens
    assert list(out["n_tokens"]) == [3, 1]
    assert out["mean_freq_ppm"].iloc[0] == (750000 * 2 + 250000) / 3
    assert out["mean_freq_ppm"].iloc[1] == 750000.0


def test_filter_above_group_quantile_matches_duckdb():
    from multiomics_biocypher_kg_ray.stages.relational import (
        filter_above_group_quantile,
    )

    rng = np.random.RandomState(13)
    df = pd.DataFrame(
        {
            "id": np.arange(2000, dtype="int64"),
            "g": rng.choice(["a", "b", "c"], size=2000),
            "v": rng.randint(0, 10_000, size=2000).astype("int64"),
        }
    )
    out = (
        filter_above_group_quantile(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4),
            ["g"],
            "v",
            q=0.9,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = (
        con.sql(
            "WITH thr AS (SELECT g, quantile_disc(v, 0.9) AS t9 FROM t GROUP BY 1) "
            "SELECT id, t.g, v FROM t JOIN thr USING (g) WHERE v > t9"
        )
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert (out["id"].to_numpy() == ref["id"].to_numpy()).all()


def test_clip_to_group_quantiles_matches_duckdb():
    from multiomics_biocypher_kg_ray.stages.relational import (
        clip_to_group_quantiles,
    )

    rng = np.random.RandomState(29)
    # Include tiny groups (n=1, n=2) to pin the rank-target edge cases.
    gs = np.concatenate(
        [
            rng.choice(["a", "b", "c"], size=1500),
            np.array(["solo"]),
            np.array(["duo", "duo"]),
        ]
    )
    df = pd.DataFrame(
        {
            "id": np.arange(len(gs), dtype="int64"),
            "g": gs,
            "v": rng.randint(-5_000, 10_000, size=len(gs)).astype("int64"),
        }
    )
    out = (
        clip_to_group_quantiles(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4),
            ["g"],
            "v",
            q_lo=0.05,
            q_hi=0.95,
            out_col="w",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = (
        con.sql(
            "WITH thr AS (SELECT g, quantile_disc(v, 0.05) AS lo, "
            "quantile_disc(v, 0.95) AS hi FROM t GROUP BY 1) "
            "SELECT id, least(greatest(v, lo), hi) AS w FROM t JOIN thr USING (g)"
        )
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert (out["w"].to_numpy() == ref["w"].to_numpy()).all()


def test_label_inertia_matches_numpy_reference():
    from multiomics_biocypher_kg_ray.stages.similarity import label_inertia

    rng = np.random.RandomState(31)
    n, d = 120, 8
    labels = rng.randint(0, 4, size=n).astype(np.int32)
    vecs = rng.randn(n, d).astype(np.float32)
    t = pa.table(
        {
            "label": pa.array(labels, pa.int32()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    out = (
        label_inertia(ray.data.from_arrow(t).repartition(5))
        .to_pandas()
        .set_index("label")
        .sort_index()
    )
    q = np.floor(vecs.astype(np.float64) * 1000.0).astype(np.int64)
    for lab in np.unique(labels):
        m = labels == lab
        s = q[m].sum(axis=0)
        s2 = (q[m] * q[m]).sum(axis=0)
        cnt = int(m.sum())
        ref = int((cnt * s2 - s * s).sum())
        assert out.loc[lab, "n_vecs"] == cnt
        assert out.loc[lab, "inertia_q"] == ref
    # n * scaled SSE identity: inertia_q / n^2 approximates the true per-
    # label mean squared deviation at the quantization scale
    lab0 = int(np.unique(labels)[0])
    m = labels == lab0
    sse = ((vecs[m] - vecs[m].mean(axis=0)) ** 2).sum()
    approx = out.loc[lab0, "inertia_q"] / (out.loc[lab0, "n_vecs"] ** 2) / 1e6 * out.loc[lab0, "n_vecs"]
    assert abs(approx - sse) / sse < 0.01
