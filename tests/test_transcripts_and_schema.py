import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from multiomics_biocypher_kg_ray.schema import NodeType, SchemaRegistry, default_registry
from multiomics_biocypher_kg_ray.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    docs_to_turns,
    transcripts_dataset,
)


def test_docs_to_turns_spec():
    batch = pa.table({"doc_id": [7], "text": ["a b c d e f g h i j"]})
    out = docs_to_turns(batch)
    rows = out.to_pylist()
    assert len(rows) == 2  # 10 tokens → turns of 8 + 2
    assert rows[0]["conv_id"] == "conv_00000007"
    assert rows[0]["turn_idx"] == 0 and rows[0]["role"] == "user"
    assert rows[0]["text"] == "a b c d e f g h"
    assert rows[1]["turn_idx"] == 1 and rows[1]["role"] == "assistant"
    assert rows[1]["text"] == "i j"
    assert rows[0]["tool"] == "" and out.schema.equals(TRANSCRIPT_SCHEMA)


def test_per_turn_text_equality_invariant(sf_small):
    """Rejoining turns in stable (conv_id, turn_idx) order reconstructs every
    document text exactly — the BASELINE.json per-row invariant."""
    df = transcripts_dataset(sf_small).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    rebuilt = df.groupby("conv_id", sort=True)["text"].apply(" ".join)
    docs = pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    dd = docs.to_pandas().sort_values("doc_id")
    assert list(rebuilt) == list(dd["text"])


def test_registry_hierarchy_and_validation():
    reg = default_registry()
    assert reg.ancestors("term") == ["entity", "named_thing"]
    assert reg.ancestors("joins") == ["semantic_association", "related_to"]
    assert reg.mint_id("term", "42") == "ent:42"
    with pytest.raises(ValueError):
        reg.add_node(NodeType("term"))


def test_registry_rejects_dangling_edge_labels():
    reg = SchemaRegistry()
    reg.add_node(NodeType("a"))
    from multiomics_biocypher_kg_ray.schema import EdgeType

    reg.add_edge(EdgeType("e", "a", "missing"))
    with pytest.raises(ValueError):
        reg.validate_edge_endpoints()


def test_arrow_schema_types():
    reg = default_registry()
    s = reg.nodes["term"].arrow_schema()
    assert s.field("mention_count").type == pa.int64()
    assert s.field("aliases").type == pa.list_(pa.string())
