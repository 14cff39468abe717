import pyarrow as pa
import ray
import ray.data

from multiomics_biocypher_kg_ray.config import AliasDictionary
from multiomics_biocypher_kg_ray.stages.extract import MENTION_SCHEMA
from multiomics_biocypher_kg_ray.stages.link import (
    AliasIndex,
    link_mentions,
    unresolved_report,
)

DICT = AliasDictionary(
    specific_lookup={
        "sort": "term:sort",
        "Gene_00042": "gene:42",
        "ent_00001": "ent:1",
    },
    multi_lookup={"fast": ("t:a", "t:b"), "big": ("term:table",)},
    conflicts={"value": ("t:x", "t:y")},
)


def idx() -> AliasIndex:
    return AliasIndex(DICT)


def test_tier1_exact():
    r = idx().resolve("sort")
    assert (r.entity_id, r.method) == ("term:sort", "tier1_exact")


def test_tier1_case_insensitive():
    r = idx().resolve("SORT")
    assert (r.entity_id, r.method) == ("term:sort", "tier1_ci")
    r2 = idx().resolve("gene_00042")
    assert (r2.entity_id, r2.method) == ("gene:42", "tier1_ci")


def test_heuristic_footnote_strip():
    r = idx().resolve("sort*")
    assert (r.entity_id, r.method) == ("term:sort", "heuristic")


def test_heuristic_zero_pad():
    # 'ent_1' → zero-pad retry hits 'ent_00001' (gene_id_utils.py:835-845 analog)
    r = idx().resolve("ent_1")
    assert (r.entity_id, r.method) == ("ent:1", "heuristic")


def test_tier2_singleton_and_ambiguous():
    r = idx().resolve("big")
    assert (r.entity_id, r.method) == ("term:table", "tier2_singleton")
    r2 = idx().resolve("fast")
    assert (r2.entity_id, r2.method) == (None, "ambiguous")


def test_tier1_conflict_never_picks():
    r = idx().resolve("value")
    assert (r.entity_id, r.method) == (None, "tier1_conflict")


def test_unresolved():
    r = idx().resolve("nonsense")
    assert (r.entity_id, r.method) == (None, "unresolved")


def _mention(subj, obj):
    return {
        "conv_id": "c1",
        "turn_idx": 0,
        "rule_id": "r1",
        "pred": "p",
        "subj_text": subj,
        "obj_text": obj,
    }


def test_link_mentions_dataset_and_report():
    tbl = pa.Table.from_pylist(
        [_mention("sort", "fast"), _mention("value", "big")], schema=MENTION_SCHEMA
    )
    ds = ray.data.from_arrow(tbl)
    ref = ray.put(idx())
    linked = link_mentions(ds, ref, concurrency=1)
    df = linked.to_pandas().sort_values("subj_text").reset_index(drop=True)
    assert df.loc[df["subj_text"] == "sort", "subj_id"].iloc[0] == "term:sort"
    assert df.loc[df["subj_text"] == "value", "subj_method"].iloc[0] == "tier1_conflict"
    rep = unresolved_report(linked).to_pandas()
    assert set(rep["reason"]) == {"ambiguous", "tier1_conflict"}
    assert set(rep["raw_mention"]) == {"fast", "value"}


def test_linker_at_reference_dictionary_scale():
    """The reference's MappingData holds ~2K genes / ~20K alt-IDs per strain
    (gene_id_graph.py:96-97). Build a 20K-alias dictionary and link 200K
    mentions: resolution must stay correct and the per-unique-alias memo must
    keep it fast (sub-batch-per-second, not per-row Python)."""
    import time

    import numpy as np
    import pyarrow as pa
    import ray

    from multiomics_biocypher_kg_ray.config import AliasDictionary
    from multiomics_biocypher_kg_ray.stages.link import AliasIndex, EntityLinker

    n_ent, per_ent = 2000, 10
    specific = {}
    for e in range(n_ent):
        canon = f"term:e{e:05d}"
        for a in range(per_ent):
            specific[f"alias_{e:05d}_{a}"] = canon
    d = AliasDictionary(specific_lookup=specific, multi_lookup={}, conflicts={})
    linker = EntityLinker(ray.put(AliasIndex(d)))

    rng = np.random.RandomState(9)
    aliases = list(specific)
    subj = [aliases[i] for i in rng.randint(0, len(aliases), 200_000)]
    obj = [aliases[i] for i in rng.randint(0, len(aliases), 200_000)]
    batch = pa.table({"subj_text": subj, "obj_text": obj})
    t0 = time.time()
    out = linker(batch)
    wall = time.time() - t0
    # correctness on a sample
    s_ids = out.column("subj_id").to_pylist()
    for i in range(0, 200_000, 19_999):
        assert s_ids[i] == specific[subj[i]]
    assert set(out.column("subj_method").to_pylist()) == {"tier1_exact"}
    # memo + Arrow fan-out: the 200K-row batch must link in single-digit secs
    assert wall < 10, f"linking 200K mentions took {wall:.1f}s"
