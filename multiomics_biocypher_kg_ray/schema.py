"""Schema registry — typed node/edge label registry with a Biolink-like
``is_a`` hierarchy, CURIE-style id prefixes and per-label property schemas.

Reference analog: ``config/schema_config.yaml`` (26 node / ~50 edge types, each
with ``is_a``, ``represented_as``, ``preferred_id``, ``label_in_input`` and a
typed property block — reference ``config/schema_config.yaml:9-1440``) compiled
here to ``pyarrow.Schema`` objects that drive a validation ``map_batches``
stage and the typed Parquet output contract (reference
``config/biocypher_config.yaml:9-14``).

Property type strings mirror the reference's scalar/array vocabulary:
``str int float str[] int[] float[]`` (reference ``schema_config.yaml:73,637``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

_PROP_TYPES: dict[str, pa.DataType] = {
    "str": pa.string(),
    "int": pa.int64(),
    "float": pa.float64(),
    "bool": pa.bool_(),
    "str[]": pa.list_(pa.string()),
    "int[]": pa.list_(pa.int64()),
    "float[]": pa.list_(pa.float64()),
}


@dataclass(frozen=True)
class NodeType:
    label: str
    is_a: str | None = None  # parent label in the class hierarchy
    id_prefix: str = "ent"  # CURIE prefix for minted ids ("prefix:local")
    properties: dict[str, str] = field(default_factory=dict)

    def arrow_schema(self) -> pa.Schema:
        fields = [pa.field("id", pa.string()), pa.field("label", pa.string())]
        fields += [pa.field(k, _PROP_TYPES[v]) for k, v in self.properties.items()]
        return pa.schema(fields)


@dataclass(frozen=True)
class EdgeType:
    label: str  # edge predicate / relationship type
    source: str  # source node label
    target: str  # target node label
    is_a: str | None = None
    properties: dict[str, str] = field(default_factory=dict)

    def arrow_schema(self) -> pa.Schema:
        fields = [
            pa.field("src", pa.string()),
            pa.field("dst", pa.string()),
            pa.field("pred", pa.string()),
        ]
        fields += [pa.field(k, _PROP_TYPES[v]) for k, v in self.properties.items()]
        return pa.schema(fields)


class SchemaRegistry:
    """Registry of node/edge types with ancestor queries.

    Mirrors the role of BioCypher's schema_config: adapters may only emit
    labels registered here; ``ancestors()`` walks the ``is_a`` chain (the
    Biolink-like class hierarchy, ≥3 levels in the default registry).
    """

    def __init__(self) -> None:
        self.nodes: dict[str, NodeType] = {}
        self.edges: dict[str, EdgeType] = {}

    def add_node(self, nt: NodeType) -> None:
        if nt.label in self.nodes:
            raise ValueError(f"duplicate node label {nt.label!r}")
        self.nodes[nt.label] = nt

    def add_edge(self, et: EdgeType) -> None:
        if et.label in self.edges:
            raise ValueError(f"duplicate edge label {et.label!r}")
        self.edges[et.label] = et

    def ancestors(self, label: str) -> list[str]:
        """is_a chain from ``label`` (exclusive) to the root, in order."""
        out: list[str] = []
        cur = self.nodes.get(label) or self.edges.get(label)
        seen = {label}
        while cur is not None and cur.is_a:
            if cur.is_a in seen:  # cycle guard (EC transfer-chain analog)
                break
            out.append(cur.is_a)
            seen.add(cur.is_a)
            cur = self.nodes.get(cur.is_a) or self.edges.get(cur.is_a)
        return out

    def validate_edge_endpoints(self) -> None:
        """Every edge's source/target label must be a registered node label."""
        for et in self.edges.values():
            for lbl in (et.source, et.target):
                if lbl not in self.nodes:
                    raise ValueError(
                        f"edge {et.label!r} references unregistered node label {lbl!r}"
                    )

    def mint_id(self, label: str, local: str) -> str:
        """CURIE-style id ``prefix:local`` (reference curie_utils.py:20-34)."""
        return f"{self.nodes[label].id_prefix}:{local}"


def default_registry() -> SchemaRegistry:
    """The default transcript-KG registry (≥3-level is_a hierarchy).

    hierarchy: named_thing → entity → term ; named_thing → entity → actor →
    {agent, tool} ; association → semantic_association → {joins, ...}.
    """
    reg = SchemaRegistry()
    reg.add_node(NodeType("named_thing", None, "thing", {"name": "str"}))
    reg.add_node(NodeType("entity", "named_thing", "ent", {"name": "str"}))
    reg.add_node(
        NodeType(
            "term",
            "entity",
            "ent",
            {
                "name": "str",
                "mention_count": "int",
                "aliases": "str[]",
            },
        )
    )
    reg.add_node(NodeType("actor", "entity", "actor", {"name": "str"}))
    reg.add_node(NodeType("agent", "actor", "agent", {"name": "str"}))
    reg.add_node(NodeType("tool", "actor", "tool", {"name": "str"}))
    reg.add_node(
        NodeType(
            "conversation",
            "named_thing",
            "conv",
            {"name": "str", "n_turns": "int"},
        )
    )

    edge_props = {
        "weight": "int",
        "evidence": "str",  # '|'-joined sorted distinct rule ids (set-union, A14)
    }
    reg.add_edge(EdgeType("related_to", "entity", "entity", None, edge_props))
    reg.add_edge(
        EdgeType("semantic_association", "term", "term", "related_to", edge_props)
    )
    for pred in ("joins", "merges_with", "filters", "scans"):
        reg.add_edge(EdgeType(pred, "term", "term", "semantic_association", edge_props))
    reg.validate_edge_endpoints()
    return reg
