"""Triple P/R harness vs fixture-known triples (FIXTURES.md F6; the
north-rule correctness gate: P/R ≥ 0.95 on exact (subj, pred, obj) match
after canonicalization, plus per-turn text equality under stable
(conv_id, turn_idx) ordering).

The expected triples below are written BY HAND from the rule + dictionary
specs — not derived by running the engine — so this is a genuine oracle:
role filtering, CI fallback, tier-2 singletons, ambiguous/conflict aliases,
non-overlapping multi-match, empty text and hot-conversation repetition are
all pinned.
"""

import pandas as pd
import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.config import default_alias_dictionary
from multiomics_biocypher_kg_ray.stages.canonicalize import canonical_map_table
from multiomics_biocypher_kg_ray.stages.extract import extract_mentions
from multiomics_biocypher_kg_ray.stages.link import AliasIndex, link_mentions

TURNS = [
    # (conv_id, turn_idx, role, text)
    ("c1", 0, "user", "table join row"),
    ("c1", 1, "assistant", "order merge sort"),  # synonyms → one component
    ("c1", 2, "assistant", "data filter key"),  # r_filter is user-only → none
    ("c1", 3, "user", "data filter key"),
    ("c2", 0, "user", "fast join table"),  # 'fast' ambiguous → dropped
    ("c2", 1, "user", "value join table"),  # 'value' tier1 conflict → dropped
    ("c2", 2, "user", "Table join ROW"),  # CI fallback resolves both
    ("c2", 3, "user", "big scan slow"),  # tier-2 singletons both sides
    ("c3", 0, "user", ""),
    ("c3", 1, "user", "batch scan stream window"),  # single non-overlap match
    ("c3", 2, "user", "query join data and row join line"),  # two matches
    ("c4", 0, "user", "spark merge agg"),
] + [("c_hot", i, "user", "hash join sort") for i in range(50)]

# hand-written expected RESOLVED triples (term-level, pre-canonicalization):
# (conv_id, turn_idx, subj_term, pred, obj_term)
EXPECTED = [
    ("c1", 0, "term:table", "joins", "term:row"),
    ("c1", 1, "term:sort", "merges_with", "term:sort"),
    ("c1", 3, "term:data", "filters", "term:key"),
    ("c2", 2, "term:table", "joins", "term:row"),
    ("c2", 3, "term:table", "scans", "term:scan"),
    ("c3", 1, "term:batch", "scans", "term:stream"),
    ("c3", 2, "term:query", "joins", "term:data"),
    ("c3", 2, "term:row", "joins", "term:line"),
    ("c4", 0, "term:engine", "merges_with", "term:aggregate"),
] + [("c_hot", i, "term:hash", "joins", "term:sort") for i in range(50)]


def _transcripts():
    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": [t[0] for t in TURNS],
                "turn_idx": pa.array([t[1] for t in TURNS], pa.int32()),
                "role": [t[2] for t in TURNS],
                "text": [t[3] for t in TURNS],
                "tool": [""] * len(TURNS),
                "ts": pa.array([None] * len(TURNS), pa.timestamp("us")),
            }
        )
    )


def test_triple_precision_recall_vs_fixture():
    import ray

    d = default_alias_dictionary()
    linked = link_mentions(
        extract_mentions(_transcripts()), ray.put(AliasIndex(d))
    ).to_pandas()
    canon = canonical_map_table(d.all_equiv_edges()).to_pandas()
    cid = dict(zip(canon["member"], canon["canonical_id"]))

    resolved = linked.dropna(subset=["subj_id", "obj_id"])
    got = {
        (r.conv_id, int(r.turn_idx), cid[r.subj_id], r.pred, cid[r.obj_id])
        for r in resolved.itertuples()
    }
    expected = {
        (c, t, cid[s], p, cid[o]) for (c, t, s, p, o) in EXPECTED
    }

    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected)
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.3f} R={recall:.3f}; "
        f"spurious={sorted(got - expected)[:5]} missed={sorted(expected - got)[:5]}"
    )
    # the fixture is exact by construction — pin it fully
    assert precision == 1.0 and recall == 1.0


def test_per_turn_text_equality_under_stable_ordering():
    out = (
        _transcripts()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    src = (
        pd.DataFrame(TURNS, columns=["conv_id", "turn_idx", "role", "text"])
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(out["text"], src["text"])
    pd.testing.assert_series_equal(
        out["turn_idx"].astype("int64"), src["turn_idx"].astype("int64")
    )
