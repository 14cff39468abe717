"""Round-4 session-39 — byte-pair merge candidates (hand counts, space
exclusion, cross-doc isolation) and the zlib compression-ratio signal
(monotonicity + determinism)."""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

import ray.data


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
            }
        )
    ).repartition(2)


def test_char_pair_counts_hand():
    from multiomics_biocypher_kg_ray.stages.text import (
        char_pair_merge_candidates,
    )

    # 'abab' -> pairs ab, ba, ab ; 'ab cd' -> ab, cd (space pairs dropped)
    out = char_pair_merge_candidates(_docs(["abab", "ab cd"]), k=10).to_pandas()
    got = out.set_index("pair")["n"].to_dict()
    assert got == {"ab": 3, "ba": 1, "cd": 1}
    # ordering: count desc, pair asc
    assert list(out["pair"]) == ["ab", "ba", "cd"]


def test_char_pair_no_cross_doc_bleed():
    from multiomics_biocypher_kg_ray.stages.text import (
        char_pair_merge_candidates,
    )

    # doc boundary must NOT create the pair 'xy'
    out = char_pair_merge_candidates(_docs(["zx", "yz"]), k=10).to_pandas()
    assert "xy" not in set(out["pair"])


def test_doc_compression_ratio_monotone_and_deterministic():
    from multiomics_biocypher_kg_ray.stages.text import doc_compression_ratio

    rep = "spam " * 200
    rand = " ".join(f"w{i}x{i * 7 % 97}" for i in range(200))
    out = (
        doc_compression_ratio(_docs([rep, rand]))
        .to_pandas()
        .set_index("doc_id")
    )
    # repetitive text compresses far better than varied text
    assert out.loc[0, "ratio_ppm"] < out.loc[1, "ratio_ppm"]
    # exact per-doc identity with the pinned zlib level
    assert out.loc[0, "compressed_bytes"] == len(
        zlib.compress(rep.encode(), 6)
    )
    assert (
        out.loc[0, "ratio_ppm"]
        == out.loc[0, "compressed_bytes"] * 1_000_000 // out.loc[0, "raw_bytes"]
    )
