"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on sf0.001. ``queries()`` exposes
one callable per implemented operator/pipeline (SURVEY.md §2); each takes an
``sf_dir`` and returns a Dataset / DataFrame / Table. ``oracle_sql()`` gives
the DuckDB-equivalent SQL for each — generated from the SAME config objects
the Ray stages use (see ``multiomics_biocypher_kg_ray/oracle.py``).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import ray

from multiomics_biocypher_kg_ray import oracle
from multiomics_biocypher_kg_ray.config import default_alias_dictionary
from multiomics_biocypher_kg_ray.pipelines.kg import build_kg
from multiomics_biocypher_kg_ray.sources.transcripts import transcripts_dataset
from multiomics_biocypher_kg_ray.stages.canonicalize import canonical_map
from multiomics_biocypher_kg_ray.stages.extract import extract_mentions
from multiomics_biocypher_kg_ray.stages.link import (
    AliasIndex,
    link_mentions,
    unresolved_report,
)
from multiomics_biocypher_kg_ray.stages.materialize import (
    build_edges,
    build_nodes,
    conv_stats,
    edge_rank,
    node_degree,
)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full KG build; returns the
    deduplicated edge table (src, pred, dst, weight, evidence)."""
    res = build_kg(transcripts_dataset("/root/testdata/sf0.001"))
    return res.edges


# --------------------------------------------------------------- KG queries


def _linked(sf_dir: str):
    mentions = extract_mentions(transcripts_dataset(sf_dir))
    idx_ref = ray.put(AliasIndex(default_alias_dictionary()))
    return link_mentions(mentions, idx_ref)


def _canon_tbl():
    import pyarrow as pa

    return pa.Table.from_pandas(
        canonical_map(default_alias_dictionary().all_equiv_edges())
        .to_pandas()
        .sort_values("member")
        .reset_index(drop=True),
        preserve_index=False,
    )


def _q_kg_transcripts(sf_dir: str):
    return transcripts_dataset(sf_dir)


def _q_kg_mentions(sf_dir: str):
    return extract_mentions(transcripts_dataset(sf_dir))


def _q_kg_linked(sf_dir: str):
    return _linked(sf_dir)


def _q_kg_unresolved(sf_dir: str):
    return unresolved_report(_linked(sf_dir))


def _q_kg_components(sf_dir: str):
    # sf-independent (dictionary-derived); exercises the DISTRIBUTED
    # label-propagation path against the recursive-CTE oracle.
    return canonical_map(
        default_alias_dictionary().all_equiv_edges(), force_distributed=True
    )


def _q_kg_nodes(sf_dir: str):
    return build_nodes(_linked(sf_dir), _canon_tbl())


def _q_kg_edges(sf_dir: str):
    return build_edges(_linked(sf_dir), _canon_tbl())


def _q_kg_node_degree(sf_dir: str):
    return node_degree(build_edges(_linked(sf_dir), _canon_tbl()))


def _q_kg_edge_rank(sf_dir: str):
    return edge_rank(build_edges(_linked(sf_dir), _canon_tbl()))


def _q_kg_conv_stats(sf_dir: str):
    return conv_stats(transcripts_dataset(sf_dir), _linked(sf_dir))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_transcripts": _q_kg_transcripts,
        "kg_mentions": _q_kg_mentions,
        "kg_linked": _q_kg_linked,
        "kg_unresolved": _q_kg_unresolved,
        "kg_components": _q_kg_components,
        "kg_nodes": _q_kg_nodes,
        "kg_edges": _q_kg_edges,
        "kg_node_degree": _q_kg_node_degree,
        "kg_edge_rank": _q_kg_edge_rank,
        "kg_conv_stats": _q_kg_conv_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_transcripts": oracle.sql_kg_transcripts(),
        "kg_mentions": oracle.sql_kg_mentions(),
        "kg_linked": oracle.sql_kg_linked(),
        "kg_unresolved": oracle.sql_kg_unresolved(),
        "kg_components": oracle.sql_kg_components(),
        "kg_nodes": oracle.sql_kg_nodes(),
        "kg_edges": oracle.sql_kg_edges(),
        "kg_node_degree": oracle.sql_kg_node_degree(),
        "kg_edge_rank": oracle.sql_kg_edge_rank(),
        "kg_conv_stats": oracle.sql_kg_conv_stats(),
    }
