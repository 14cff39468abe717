"""End-to-end KG construction pipeline.

transcripts → extract (actor pool) → link (broadcast alias index, actor pool)
→ canonicalize (connected components + deterministic stable ids) →
materialize (dedup nodes/edges, evidence union) → rollups (degree, ranks,
conv stats) → typed Parquet graph output.

Mirrors the reference lifecycle ``prepare_data.sh → create_knowledge_graph.py
→ post-import.cypher`` (SURVEY.md §3) collapsed into ONE streaming Ray
pipeline: the "post-import" aggregation phase is just the finalize stages of
the same dataset graph, not a separate system.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

import ray
import ray.data

from ..config import DEFAULT_RULES, AliasDictionary, ExtractionRule, default_alias_dictionary
from ..stages.canonicalize import canonical_map_table
from ..stages.extract import extract_mentions
from ..stages.link import AliasIndex, link_mentions, unresolved_report
from ..stages.materialize import (
    build_graph_tables,
    conv_stats,
    edge_rank,
    node_degree,
    write_graph,
)


@dataclass
class KGConfig:
    rules: tuple[ExtractionRule, ...] = DEFAULT_RULES
    aliases: AliasDictionary = field(default_factory=default_alias_dictionary)
    extract_concurrency: int | tuple[int, int] | None = None  # None → CPU-sized
    link_concurrency: int | tuple[int, int] | None = None
    # None = whole-block batches: per-call fixed costs (role masks, combined
    # prefilter, concat) amortize over the block instead of every 8K rows
    batch_size: int | None = None


@dataclass
class KGResult:
    """Handles to every output Dataset of one build (all lazy until consumed)."""

    transcripts: "ray.data.Dataset"
    mentions: "ray.data.Dataset"
    linked: "ray.data.Dataset"
    canon: "pa.Table"  # (member, component_key, canonical_id) — entity-sized
    nodes: "ray.data.Dataset"
    edges: "ray.data.Dataset"
    unresolved: "ray.data.Dataset"


def _fused_extract_link(batch: pa.Table, rules, index_ref) -> pa.Table:
    """Extract THEN link in one task — the two stages' state is memoized per
    worker process (see stages/extract.py for the tasks-vs-actors rationale);
    chaining them in one map_batches lets Ray fuse read→extract→link into a
    single task per block with zero intermediate exchange."""
    from ..stages.extract import _extract_fn
    from ..stages.link import _link_fn

    return _link_fn(_extract_fn(batch, rules), index_ref)


def build_kg(
    transcripts: "ray.data.Dataset",
    cfg: KGConfig | None = None,
    *,
    materialize_linked: bool = False,
) -> KGResult:
    """``materialize_linked=False`` (default) keeps the mention stream fully
    streaming: read→extract→link→graph-partials fuse into one pass and the
    only thing ever pinned is the entity²-bounded combined table — at 100 TB
    the full linked stream must never sit in the object store. Pass ``True``
    when SEVERAL outputs will be consumed (unresolved report, conv stats,
    rollups — as ``run_kg_to_parquet`` does) so extract+link runs once
    instead of once per consumer."""
    cfg = cfg or KGConfig()
    mentions = extract_mentions(
        transcripts,
        cfg.rules,
        concurrency=cfg.extract_concurrency,
        batch_size=cfg.batch_size,
    )  # lazy; only consumed if the caller reads res.mentions
    index_ref = ray.put(AliasIndex(cfg.aliases))
    linked = transcripts.map_batches(
        _fused_extract_link,
        fn_kwargs={"rules": cfg.rules, "index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    if materialize_linked:
        linked = linked.materialize()

    # canonicalization over the alias-equivalence graph (dictionary-derived,
    # entity-count sized → driver union-find; `canonical_map` runs the
    # distributed label propagation for Dataset-sized edge sets instead).
    canon_tbl = canonical_map_table(cfg.aliases.all_equiv_edges())

    nodes, edges = build_graph_tables(linked, canon_tbl)
    unresolved = unresolved_report(linked)
    return KGResult(
        transcripts=transcripts,
        mentions=mentions,
        linked=linked,
        canon=canon_tbl,
        nodes=nodes,
        edges=edges,
        unresolved=unresolved,
    )


def run_kg_to_parquet(
    transcripts: "ray.data.Dataset", out_dir: str, cfg: KGConfig | None = None
) -> dict:
    """Build + materialize the full graph to ``out_dir``; returns the manifest
    (row counts per table — the schema_info analog)."""
    from ..stages.materialize import dangling_edges

    res = build_kg(transcripts, cfg, materialize_linked=True)
    manifest = write_graph(res.nodes, res.edges, out_dir)
    res.unresolved.write_parquet(f"{out_dir}/reports/unresolved")
    manifest["unresolved"] = res.unresolved.count()
    # explicit dangling-edge report (FIXTURES F5; empty by construction here
    # since nodes derive from the same resolved sides, but the contract —
    # never silently skip — requires the table to exist)
    dang = dangling_edges(res.edges, res.nodes).materialize()
    n_dang = dang.count()
    if n_dang:
        dang.write_parquet(f"{out_dir}/reports/dangling_edges")
    else:
        # Ray writes no files for an empty Dataset; the report table must
        # still exist with its schema (contract: explicit, never absent)
        import os

        import pyarrow.parquet as pq

        s = res.edges.schema()
        os.makedirs(f"{out_dir}/reports/dangling_edges", exist_ok=True)
        pq.write_table(
            pa.schema(list(zip(s.names, s.types))).empty_table(),
            f"{out_dir}/reports/dangling_edges/empty.parquet",
        )
    manifest["dangling_edges"] = n_dang
    # canonicalization diagnostics (gene_id_graph.py:345-409 analog):
    # per-method stats + conflict table + reclassification warnings as
    # first-class report outputs, not log lines
    from ..stages.link import canonicalization_report

    cfg = cfg or KGConfig()
    report = canonicalization_report(res.linked, cfg.aliases)
    report["method_stats"].write_parquet(f"{out_dir}/reports/link_method_stats")
    import pyarrow.parquet as pq

    pq.write_table(report["conflicts"], f"{out_dir}/reports/conflicts.parquet")
    manifest["link_methods"] = report["method_stats"].count()
    manifest["conflict_aliases"] = report["conflicts"].num_rows
    manifest["warnings"] = report["warnings"]
    # rollups
    deg = node_degree(res.edges)
    deg.write_parquet(f"{out_dir}/rollups/node_degree")
    rk = edge_rank(res.edges)
    rk.write_parquet(f"{out_dir}/rollups/edge_rank")
    cs = conv_stats(res.transcripts, res.linked)
    cs.write_parquet(f"{out_dir}/rollups/conv_stats")
    # re-dump the manifest with the full key set (write_graph wrote only the
    # node/edge counts before the report/rollup phases ran)
    import json

    with open(f"{out_dir}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


NODE_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("label", pa.string()),
        ("name", pa.string()),
        ("mention_count", pa.int64()),
    ]
)
EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("pred", pa.string()),
        ("dst", pa.string()),
        ("weight", pa.int64()),
        ("evidence", pa.string()),
    ]
)


def read_graph(base_dir: str) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Read a ``write_graph`` output back as (nodes, edges) Datasets with the
    canonical column order/types (hive partition columns come back last and
    dictionary-typed — normalize before anything joins or unions them)."""

    def norm(schema: pa.Schema):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return schema.empty_table()
            return pa.table(
                {f.name: t.column(f.name).cast(f.type) for f in schema}
            )

        return fn

    nodes = ray.data.read_parquet(f"{base_dir}/nodes").map_batches(
        norm(NODE_SCHEMA), batch_format="pyarrow"
    )
    edges = ray.data.read_parquet(f"{base_dir}/edges").map_batches(
        norm(EDGE_SCHEMA), batch_format="pyarrow"
    )
    return nodes, edges


def run_kg_incremental(
    base_dir: str,
    new_transcripts: "ray.data.Dataset",
    out_dir: str,
    cfg: KGConfig | None = None,
) -> dict:
    """Incremental ingest: extract/link/build over ONLY the new transcript
    batch, then merge into an existing ``write_graph`` output — weight sums
    + evidence set-union via ``merge_nodes``/``merge_edges``, whose
    associativity makes the result EQUAL a one-shot rebuild over the full
    input (pinned by ``tests/test_incremental.py`` and the
    ``kg_edges_incremental`` oracle row). This is the 100 TB ingest shape:
    a daily transcript drop costs one delta build + a distinct-edge-bounded
    merge, never a full re-extract of the corpus.

    Requires the canonical map to be dictionary-derived (the default): a
    DATA-derived alias graph (``kg_components_data``) can merge entities
    retroactively, which is a re-canonicalization, not a merge — callers on
    that path must rebuild. The manifest records lineage (base dir, base
    counts, delta counts) so a chain of increments is auditable."""
    from ..stages.materialize import merge_edges, merge_nodes

    base_nodes, base_edges = read_graph(base_dir)
    res = build_kg(new_transcripts, cfg, materialize_linked=True)
    # entity-bounded; pin once so the lineage counts don't re-run the build
    delta_nodes = res.nodes.materialize()
    delta_edges = res.edges.materialize()
    nodes = merge_nodes(base_nodes, delta_nodes)
    edges = merge_edges(base_edges, delta_edges)
    manifest = write_graph(nodes, edges, out_dir)

    import json

    try:
        with open(f"{base_dir}/manifest.json") as f:
            base_manifest = json.load(f)
    except OSError:
        base_manifest = {}
    manifest["lineage"] = {
        "base_dir": base_dir,
        "base_nodes": base_manifest.get("nodes"),
        "base_edges": base_manifest.get("edges"),
        "delta_nodes": delta_nodes.count(),
        "delta_edges": delta_edges.count(),
    }
    with open(f"{out_dir}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
