"""tfidf_cosine_pairs vs a brute-force numpy tf-idf cosine over a small
corpus with known shared-term structure (incl. quantization-faithful
reference and the no-shared-top-term exclusion)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.text import tfidf_cosine_pairs


def _ds(df: pd.DataFrame, blocks: int = 3):
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(blocks)


def _ref_pairs(texts: dict[int, str], k: int, min_cos_ppm: int):
    # replicate the operator's quantization exactly: tfidf_q =
    # floor(tf·ln(N/df)·1e6), qk = tfidf_q // 1000, top-k by
    # (tfidf_q desc, term asc)
    n = float(len(texts))
    tf: dict[int, dict[str, int]] = {}
    df: dict[str, int] = {}
    for d, t in texts.items():
        c: dict[str, int] = {}
        for w in t.split(" "):
            if w:
                c[w] = c.get(w, 0) + 1
        tf[d] = c
        for w in c:
            df[w] = df.get(w, 0) + 1
    vec: dict[int, dict[str, int]] = {}
    for d, c in tf.items():
        scored = sorted(
            (
                (-int(np.floor(cnt * np.log(n / df[w]) * 1e6)), w)
                for w, cnt in c.items()
            )
        )[:k]
        vec[d] = {w: (-q) // 1000 for q, w in scored}
    out = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = set(vec[a]) & set(vec[b])
            if not shared:
                continue
            dot = sum(vec[a][w] * vec[b][w] for w in shared)
            n2a = sum(v * v for v in vec[a].values())
            n2b = sum(v * v for v in vec[b].values())
            if n2a == 0 or n2b == 0:
                continue
            cos = int(
                np.floor(
                    (np.float64(dot) * 1e6)
                    / (np.sqrt(np.float64(n2a)) * np.sqrt(np.float64(n2b)))
                )
            )
            if cos >= min_cos_ppm:
                out[(a, b)] = (len(shared), dot, cos)
    return out


def test_tfidf_pairs_match_bruteforce():
    texts = {
        1: "quantum flux capacitor resonance flux",
        2: "quantum flux capacitor drift",
        3: "banana smoothie recipe blender",
        4: "banana smoothie recipe ice",
        5: "quantum banana paradox",
        6: "unrelated solitary document entirely",
    }
    df = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}
    )
    out = tfidf_cosine_pairs(
        _ds(df), n_docs=len(texts), k=4, min_cos_ppm=100_000
    ).to_pandas()
    got = {
        (int(r.doc_a), int(r.doc_b)): (int(r.n_shared), int(r.dot), int(r.cos_ppm))
        for r in out.itertuples(index=False)
    }
    assert got == _ref_pairs(texts, k=4, min_cos_ppm=100_000)
    # sanity: the two smoothie docs pair up; doc 6 pairs with nothing
    assert (3, 4) in got
    assert not any(6 in p for p in got)
