"""Graph materialization — deduplicated typed node/edge tables with evidence
set-union, dangling-edge anti-join report, and the partitioned-Parquet output
contract.

Reference analogs:
- node dedup first-seen-wins / ``skip_duplicate_nodes``
  (``ortholog_group_adapter.py:296-303``, ``config/biocypher_config.yaml:13``)
  → here: groupby(canonical id) + merge, deterministic (content-sorted, never
  arrival-order).
- edge ``MERGE ... ON MATCH`` evidence list-append
  (``scripts/post-import.cypher:1056-1087``) → groupby((src,pred,dst)) with
  sorted-distinct evidence union.
- ``skip_bad_relationships`` + import-report mining
  (``biocypher_config.yaml:14``, ``gene_id_utils.py:995-1050``) → an EXPLICIT
  anti-join emitting a first-class dangling-edges report table.

Scale pattern: every aggregate here is partial-aggregated inside
``map_batches`` first (one row per key per batch) so the all-to-all shuffle
moves pre-combined rows, not raw mentions (ray_guide "Aggregation at scale").
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..tuning import default_join_partitions
from .joins import broadcast_join

EVIDENCE_SEP = "|"


# --------------------------------------------------------------------- nodes


def _resolved_entity_rows(batch: pa.Table) -> pa.Table:
    """linked batch → one row per resolved mention side (tid = entity id)."""
    parts = []
    for side in ("subj", "obj"):
        col = batch.column(f"{side}_id")
        mask = pc.is_valid(col)
        parts.append(pa.Table.from_arrays([col.filter(mask)], names=["tid"]))
    return pa.concat_tables(parts)


def _partial_count(keys: list[str]):
    """map_batches partial aggregation: value_counts per batch → (keys, n)."""

    def inner(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        out = df.groupby(keys, sort=False, dropna=False).size().reset_index(name="n")
        return pa.Table.from_pandas(out, preserve_index=False)

    return inner


def build_nodes(
    linked: "ray.data.Dataset",
    canon: "pa.Table | pd.DataFrame",
    label: str = "term",
) -> "ray.data.Dataset":
    """linked + canonical map → node table (id, label, name, mention_count).

    ``canon`` is the (member, component_key, canonical_id) mapping — small
    relative to the mention stream (entity-count sized), so it is broadcast;
    swap for ``hash_join`` if the entity space outgrows a node's memory.
    """
    if isinstance(canon, pa.Table):
        canon = canon.to_pandas()
    canon_map = canon.rename(columns={"member": "tid"})[
        ["tid", "component_key", "canonical_id"]
    ]
    ent = linked.map_batches(_resolved_entity_rows, batch_format="pyarrow")
    # partial count per batch, then tiny final groupby
    partial = ent.map_batches(_partial_count(["tid"]), batch_format="pyarrow")
    counts = partial.groupby("tid").aggregate(Sum("n", alias_name="mention_count"))
    joined = broadcast_join(counts, canon_map, on=["tid"], how="inner")

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby(["canonical_id", "component_key"], sort=False)["mention_count"]
            .sum()
            .reset_index()
        )
        out["label"] = label
        out = out.rename(columns={"canonical_id": "id", "component_key": "name"})
        return out[["id", "label", "name", "mention_count"]]

    # members of one component can arrive as distinct tids → final combine
    partial2 = joined.map_batches(finish, batch_format="pandas")
    return (
        partial2.groupby(["id", "label", "name"])
        .aggregate(Sum("mention_count", alias_name="mention_count"))
        .select_columns(["id", "label", "name", "mention_count"])
    )


# --------------------------------------------------------------------- edges


def build_edges(
    linked: "ray.data.Dataset",
    canon: "pa.Table | pd.DataFrame",
) -> "ray.data.Dataset":
    """linked + canonical map → deduplicated edge table
    (src, pred, dst, weight, evidence) with evidence-source set-union.

    Two-phase: per-batch partial (groupby within batch → partial weight +
    partial evidence set) then a keyed shuffle merging partials — the A14
    dedup-with-set-union expressed as partial+final aggregation.
    """
    if isinstance(canon, pa.Table):
        canon = canon.to_pandas()
    cmap = dict(zip(canon["member"], canon["canonical_id"]))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["subj_id", "pred", "obj_id", "rule_id"]).to_pandas()
        df = df.dropna(subset=["subj_id", "obj_id"])
        df["src"] = df["subj_id"].map(cmap)
        df["dst"] = df["obj_id"].map(cmap)
        g = (
            df.groupby(["src", "pred", "dst"], sort=False)
            .agg(
                weight=("rule_id", "size"),
                evidence=("rule_id", lambda s: EVIDENCE_SEP.join(sorted(set(s)))),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        ev = sorted(
            {e for row in group["evidence"] for e in row.split(EVIDENCE_SEP)}
        )
        return pd.DataFrame(
            {
                "src": [group["src"].iloc[0]],
                "pred": [group["pred"].iloc[0]],
                "dst": [group["dst"].iloc[0]],
                "weight": [int(group["weight"].sum())],
                "evidence": [EVIDENCE_SEP.join(ev)],
            }
        )

    partials = linked.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["src", "pred", "dst"]).map_groups(
        final, batch_format="pandas"
    )


# ------------------------------------------------------------------ rollups


def node_degree(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-node degree + weighted degree (post-import.cypher:572-691 analog)."""

    def endpoints(batch: pa.Table) -> pa.Table:
        t1 = pa.Table.from_arrays(
            [batch.column("src"), batch.column("weight")], names=["id", "weight"]
        )
        t2 = pa.Table.from_arrays(
            [batch.column("dst"), batch.column("weight")], names=["id", "weight"]
        )
        return pa.concat_tables([t1, t2])

    return (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("id")
        .aggregate(
            Count(alias_name="degree"),
            Sum("weight", alias_name="weighted_degree"),
        )
    )


def edge_rank(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-predicate rank by weight desc with deterministic (src, dst)
    tie-break (post-import.cypher:693-735 rank_by_effect analog)."""

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["weight", "src", "dst"], ascending=[False, True, True], kind="mergesort"
        ).reset_index(drop=True)
        g["rank"] = g.index.to_numpy() + 1
        return g[["src", "pred", "dst", "weight", "rank"]]

    return edges.groupby("pred").map_groups(rank_group, batch_format="pandas")


def conv_stats(
    transcripts: "ray.data.Dataset", linked: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Per-conversation rollup (A1/A2 experiment-stats analog): turn count,
    mention count, resolved-mention count, first/last timestamp."""
    t_agg = transcripts.groupby("conv_id").aggregate(
        Count(alias_name="n_turns"),
        Min("ts", alias_name="first_ts"),
        Max("ts", alias_name="last_ts"),
    )

    def mention_flags(batch: pa.Table) -> pa.Table:
        resolved = pc.and_(
            pc.is_valid(batch.column("subj_id")), pc.is_valid(batch.column("obj_id"))
        )
        return pa.Table.from_arrays(
            [
                batch.column("conv_id"),
                pc.cast(resolved, pa.int64()),
            ],
            names=["conv_id", "resolved"],
        )

    m_agg = (
        linked.map_batches(mention_flags, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Count(alias_name="n_mentions"),
            Sum("resolved", alias_name="n_resolved"),
        )
    )
    joined = t_agg.join(
        m_agg,
        join_type="left_outer",
        num_partitions=default_join_partitions(),
        on=("conv_id",),
    )

    def fill(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_mentions"] = batch["n_mentions"].fillna(0).astype("int64")
        batch["n_resolved"] = batch["n_resolved"].fillna(0).astype("int64")
        batch["first_ts"] = batch["first_ts"].astype("datetime64[us]")
        batch["last_ts"] = batch["last_ts"].astype("datetime64[us]")
        return batch[
            ["conv_id", "n_turns", "n_mentions", "n_resolved", "first_ts", "last_ts"]
        ]

    return joined.map_batches(fill, batch_format="pandas")


# ----------------------------------------------------------- dangling report


def dangling_edges(
    edges: "ray.data.Dataset", nodes: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Explicit anti-join: edges whose src or dst has no node row.

    The reference silently skips these at import and mines the report back
    (``skip_bad_relationships``); here the report is a first-class output.
    """
    node_ids = nodes.select_columns(["id"])
    np_ = default_join_partitions()
    miss_src = edges.join(
        node_ids, join_type="left_anti", num_partitions=np_, on=("src",), right_on=("id",)
    )
    miss_dst = edges.join(
        node_ids, join_type="left_anti", num_partitions=np_, on=("dst",), right_on=("id",)
    )
    return (
        miss_src.union(miss_dst)
        .groupby(["src", "pred", "dst"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


# ------------------------------------------------------------------- writer


def write_graph(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    out_dir: str,
) -> dict:
    """Typed Parquet output mirroring the batch-writer contract: one directory
    per table, nodes partitioned by label (per-label typed files, S8 analog).
    Returns a manifest dict of row counts per table (schema_info analog,
    post-import.cypher:1361-1375)."""
    nodes = nodes.materialize()
    edges = edges.materialize()
    nodes.write_parquet(f"{out_dir}/nodes", partition_cols=["label"])
    edges.write_parquet(f"{out_dir}/edges", partition_cols=["pred"])
    manifest = {
        "nodes": nodes.count(),
        "edges": edges.count(),
    }
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
