"""Scale-bench for the late-round-4 operator wave (corpus prep, graph
analytics, bounded windows, sampling caps): each operator at sf0.1 (1×) and
at a ≥10× input (default 16×), reporting walls + step ratios.

Tabular inputs reuse scale_bench_r3's density-preserving replication
(`_shift_tables`: id offsets per replica, time axis stretched, per-replica
token tags). The graph operators get a SYNTHETIC skewed edge table instead —
their query-registry inputs are KG edges built from transcripts, so scaling
via the KG build would measure extraction (already benched) rather than the
graph kernels; a Zipf-skewed generator isolates the kernels and plants hot
nodes on purpose (hub degree grows with size — the skew the degree-ordered
orientation and per-batch combiners exist for).

Usage: python tools/scale_bench_r4b.py [--reps 16] [--cpus 32] [--repeats 2]
Prints one JSON line per operator and a final summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_bench_r3 import _shift_tables  # noqa: E402

EDGES_1X = 200_000


def _synth_edges(n_edges: int, seed: int = 11) -> "pa.Table":
    """Zipf-skewed directed edge table (src uniform, dst ~ Zipf(1.3) over the
    node set → a few hubs hold a large in-degree share)."""
    rng = np.random.RandomState(seed)
    n_nodes = max(1000, n_edges // 10)
    src = rng.randint(0, n_nodes, size=n_edges)
    dst = rng.zipf(1.3, size=n_edges) % n_nodes
    keep = src != dst
    fmt = np.char.zfill(src[keep].astype("U10"), 10)
    fmtd = np.char.zfill(dst[keep].astype("U10"), 10)
    return pa.table(
        {
            "src": pa.array(np.char.add("n", fmt)),
            "dst": pa.array(np.char.add("n", fmtd)),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    import ray.data

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from multiomics_biocypher_kg_ray.tuning import tune_context_for_small_data

    tune_context_for_small_data()

    sf_tag = os.path.basename(args.sf.rstrip("/"))
    big = f"/tmp/scale_{sf_tag}_x{args.reps}"
    t0 = time.time()
    _shift_tables(args.sf, big, args.reps)
    print(json.dumps({"gen_sec": round(time.time() - t0, 1), "dir": big}))

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_conv_text_concat,
        q_doc_chunks,
        q_doc_decontaminate,
        q_doc_pack_assign,
        q_doc_repetition,
        q_inverted_index,
        q_user_rolling_value,
    )
    from multiomics_biocypher_kg_ray.stages import graph
    from multiomics_biocypher_kg_ray.stages.materialize import two_hop_counts

    # graph kernels over synthetic skewed edges, 1× and reps×
    g1 = _synth_edges(EDGES_1X)
    gN = _synth_edges(EDGES_1X * args.reps)

    def graph_op(fn):
        def run(tbl):
            return fn(ray.data.from_arrow(tbl).repartition(args.cpus))

        return run

    summary: dict = {"reps": args.reps, "num_cpus": args.cpus, "ops": {}}

    def bench(name, fn, small, bigi):
        row: dict = {}
        for tag, d in [("1x", small), (f"{args.reps}x", bigi)]:
            best, n = float("inf"), 0
            for _ in range(args.repeats):
                t0 = time.time()
                out = fn(d)
                n = out.count() if hasattr(out, "count") else len(out)
                best = min(best, time.time() - t0)
            row[tag] = {"sec": round(best, 2), "rows": int(n)}
        step = row[f"{args.reps}x"]["sec"] / max(row["1x"]["sec"], 1e-9)
        row["step_ratio"] = round(step, 2)
        row["per_row_ratio"] = round(step / args.reps, 3)
        summary["ops"][name] = row
        print(json.dumps({name: row}))

    bench("pagerank_synth", graph_op(lambda e: graph.pagerank(e, iters=3)), g1, gN)
    bench("triangles_synth", graph_op(graph.node_triangles), g1, gN)
    bench("two_hop_synth", graph_op(two_hop_counts), g1, gN)
    for name, fn in [
        ("conv_text_concat", q_conv_text_concat),
        ("user_rolling_value", q_user_rolling_value),
        ("inverted_index", q_inverted_index),
        ("doc_decontaminate", q_doc_decontaminate),
        ("doc_repetition_stats", q_doc_repetition),
        ("doc_chunks", q_doc_chunks),
        ("doc_pack_assign", q_doc_pack_assign),
    ]:
        bench(name, fn, args.sf, big)

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
