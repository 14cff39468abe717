"""Regenerate the committed KG snapshot fixture (tests/fixtures/kg_snapshot.json).

Reference analog: ``tests/kg_validity`` snapshot regression — a committed
sample of nodes/edges re-verified after every rebuild, regenerated ONLY by an
explicit script run (``/root/reference/CLAUDE.md:408-417``,
``generate_snapshot.py``). Run this script only when a deliberate semantic
change to the build is being made; the diff of the fixture then documents the
change for review.

Usage: python tools/generate_snapshot.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys


def build_snapshot(sf_dir: str) -> dict:
    from multiomics_biocypher_kg_ray.pipelines.kg import KGConfig, build_kg
    from multiomics_biocypher_kg_ray.sources.transcripts import transcripts_dataset
    from multiomics_biocypher_kg_ray.stages.materialize import edge_rank, node_degree

    res = build_kg(transcripts_dataset(sf_dir), KGConfig(), materialize_linked=True)
    nodes = (
        res.nodes.to_pandas().sort_values("id").reset_index(drop=True)
    )
    edges = (
        res.edges.to_pandas()
        .sort_values(["src", "pred", "dst"])
        .reset_index(drop=True)
    )
    degree = (
        node_degree(res.edges).to_pandas().sort_values("id").reset_index(drop=True)
    )
    ranks = (
        edge_rank(res.edges)
        .to_pandas()
        .sort_values(["pred", "rank", "src", "dst"])
        .reset_index(drop=True)
    )
    unresolved_n = res.unresolved.count()

    def table_hash(df) -> str:
        return hashlib.md5(
            df.to_csv(index=False, float_format="%.6f").encode()
        ).hexdigest()

    return {
        "sf_dir": sf_dir,
        "counts": {
            "nodes": len(nodes),
            "edges": len(edges),
            "unresolved": unresolved_n,
        },
        "hashes": {
            "nodes": table_hash(nodes),
            "edges": table_hash(edges),
            "node_degree": table_hash(degree),
            "edge_rank": table_hash(ranks),
        },
        # full node table (entity-bounded, small) + the first edges as a
        # human-readable sample a reviewer can diff
        "nodes": nodes.to_dict("records"),
        "edge_sample": edges.head(40).to_dict("records"),
        "degree_sample": degree.head(20).to_dict("records"),
    }


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from multiomics_biocypher_kg_ray.tuning import tune_context_for_small_data

    tune_context_for_small_data()
    snap = build_snapshot(sf_dir)
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "kg_snapshot.json"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(snap, f, indent=1, default=str)
    print(f"wrote {os.path.normpath(out)}: {snap['counts']}")
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
