"""Round-4 session-16 operators — HyperLogLog distinct sketch (accuracy +
merge semantics), Heaps' vocabulary-growth slope (hand corpus), and the
blocking-quality audit (known duplicate pairs)."""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def test_hll_accuracy_and_grouping():
    from multiomics_biocypher_kg_ray.stages.sampling import distinct_hll

    # group 'big': 5000 distinct values; 'small': 37 distinct values
    big = [f"u{i}" for i in range(5000)] * 2  # duplicates must not matter
    small = [f"v{i}" for i in range(37)] * 3
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["big"] * len(big) + ["small"] * len(small)),
                "v": pa.array(big + small),
            }
        )
    ).repartition(4)
    out = distinct_hll(ds, ["g"], "v").to_pandas().set_index("g")
    # m=64 HLL standard error is 1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(out.loc["big", "hll_est"] - 5000) <= 5000 * 0.40
    assert abs(out.loc["small", "hll_est"] - 37) <= 37 * 0.40 + 3
    assert 1 <= out.loc["small", "n_set_regs"] <= 64
    # determinism: same input, different partitioning, identical sketch
    out2 = (
        distinct_hll(ds.repartition(11), ["g"], "v").to_pandas().set_index("g")
    )
    assert out2.loc["big", "hll_est"] == out.loc["big", "hll_est"]
    assert out2.loc["small", "hll_est"] == out.loc["small", "hll_est"]


def test_heaps_slope_hand_corpus():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_corpus_heaps_slope,
    )

    # doc d grows the vocab: doc_id 0..9, doc i has tokens w0..w(2i+1)
    texts = [" ".join(f"w{j}" for j in range(2 * i + 2)) for i in range(10)]
    df = pd.DataFrame(
        {
            "doc_id": range(10),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": 1,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = q_corpus_heaps_slope(d).to_pandas()
    assert len(out) == 1 and out.iloc[0]["n"] == 10
    # reference slope from the same quantized-log recurrence, plain python
    v = n = 0
    xs, ys = [], []
    seen: set[str] = set()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n += len(toks)
        for w in toks:
            if w not in seen:
                seen.add(w)
                v += 1
        xs.append(math.floor(math.log(n) * 1000))
        ys.append(math.floor(math.log(v) * 1000))
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    exp = (k * sxy - sx * sy) * 1_000_000 // (k * sxx - sx * sx)
    got = int(out.iloc[0]["heaps_slope_q"])
    assert abs(got - exp) <= 1
    # doc i holds the full w0..w(2i+1) prefix: V = 2i+2 while N ~ i², so
    # V ~ N^0.5 -> Heaps beta near 0.5 (=5e5)
    assert 400_000 <= got <= 700_000


def test_blocking_quality_known_dups():
    from multiomics_biocypher_kg_ray.stages.dedup import blocking_quality

    # docs 0/1 and 2/3 are exact near-dups (jaccard 1.0 within the sample);
    # the rest are distinct filler so the LSH table is non-trivial
    dup_a = "alpha beta gamma delta epsilon zeta eta theta"
    dup_b = "iota kappa lambda mu nu xi omicron pi"
    texts = [dup_a, dup_a, dup_b, dup_b] + [
        " ".join(f"t{i}_{j}" for j in range(8)) for i in range(20)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    out = blocking_quality(ds).to_pandas().iloc[0]
    assert out["n_docs"] == len(texts)
    assert out["n_truth_pairs"] == 2  # (0,1) and (2,3)
    assert out["n_hit_pairs"] == 2  # identical docs always share all bands
    assert out["pair_completeness_ppm"] == 1_000_000
    assert 0 < out["reduction_ppm"] <= 1_000_000
    assert out["n_cand_pairs"] >= 2


def test_blocking_quality_no_truth():
    from multiomics_biocypher_kg_ray.stages.dedup import blocking_quality

    # all-distinct docs: truth empty -> NULL completeness, no join crash
    texts = [" ".join(f"d{i}_{j}" for j in range(8)) for i in range(12)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = blocking_quality(ds).to_pandas().iloc[0]
    assert out["n_truth_pairs"] == 0 and out["n_hit_pairs"] == 0
    assert pd.isna(out["pair_completeness_ppm"])
