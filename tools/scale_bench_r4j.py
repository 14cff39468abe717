"""Scale-bench for the session-15/16/17 round-4 operator waves (schema
census/audit over the multi-source build, personalized + weighted PageRank,
turn-taking, Welch t, Heaps slope, HLL distinct, blocking quality, lang
kappa, Markov entropy rate) at sf0.1 (1x) vs a >=10x replicated input
(default 16x); PageRank variants additionally on the Zipf-skewed synthetic
edge generator so the graph kernels see hub skew at both sizes.

Usage: python tools/scale_bench_r4j.py [--reps 16] [--cpus 32] [--repeats 2]
Prints one JSON line per operator and a final summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402

from scale_bench_r3 import _shift_tables  # noqa: E402
from scale_bench_r4b import EDGES_1X, _synth_edges  # noqa: E402


def _synth_weighted(n_edges: int, seed: int = 11) -> "pa.Table":
    t = _synth_edges(n_edges, seed)
    rng = np.random.RandomState(seed + 1)
    n = t.num_rows
    return t.append_column(
        "weight", pa.array(1 + (rng.zipf(1.5, size=n) % 40), pa.int64())
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
        q_blocking_quality,
        q_conv_turn_taking,
        q_corpus_heaps_slope,
        q_doc_lang_kappa,
        q_event_markov_entropy,
        q_event_user_hll,
        q_kg_schema_audit,
        q_kg_type_rollup,
        q_purchase_click_welch,
    )
    from multiomics_biocypher_kg_ray.stages import graph

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

    skip = set((os.environ.get("GRAFT_SKIP_OPS") or "").split(","))

    # the r3 shift generator tags every non-first token with an r<N>q prefix
    # (preserves intra-replica jaccard structure for the dedup ops) — that
    # erases the extraction-rule patterns ('x join y'), so the multisource
    # KG ops need a VERBATIM-text replica dir: doc_ids offset, text kept,
    # embeddings copied (same vectors; near-dup pair structure preserved)
    big_kg = f"/tmp/scale_{sf_tag}_x{args.reps}_verbatim"
    marker = os.path.join(big_kg, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(big_kg, exist_ok=True)
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(
            os.path.join(args.sf, "documents.parquet"),
            columns=["doc_id", "text", "lang"],
        )
        reps_t = pa.concat_tables(
            [
                pa.table(
                    {
                        "doc_id": pc.add(t.column("doc_id"), r * 1_000_000),
                        "text": t.column("text"),
                        "lang": t.column("lang"),
                    }
                )
                for r in range(args.reps)
            ]
        )
        pq.write_table(reps_t, os.path.join(big_kg, "documents.parquet"))
        emb = pq.read_table(os.path.join(args.sf, "embeddings.parquet"))
        pq.write_table(emb, os.path.join(big_kg, "embeddings.parquet"))
        with open(marker, "w") as f:
            f.write(str(args.reps))

    # graph kernels on the Zipf-skewed synthetic generator (hub skew at size)
    g1w = _synth_weighted(EDGES_1X)
    gNw = _synth_weighted(EDGES_1X * args.reps)

    def graph_op(fn):
        def run(tbl):
            return fn(ray.data.from_arrow(tbl).repartition(args.cpus))

        return run

    # seeds: a fixed node-id slice — deterministic, same ids in both sizes
    seeds = [f"n{i:010d}" for i in range(50)]
    if "ppr_synth" not in skip:
        bench(
            "ppr_synth",
            graph_op(lambda ds: graph.pagerank(ds, iters=3, seeds=seeds)),
            g1w.select(["src", "dst"]),
            gNw.select(["src", "dst"]),
        )
    if "wpagerank_synth" not in skip:
        bench(
            "wpagerank_synth",
            graph_op(lambda ds: graph.pagerank(ds, iters=3, weighted=True)),
            g1w,
            gNw,
        )

    if "kg_type_rollup" not in skip:
        bench("kg_type_rollup", q_kg_type_rollup, args.sf, big_kg)
    if "kg_schema_audit" not in skip:
        bench("kg_schema_audit", q_kg_schema_audit, args.sf, big_kg)
    for name, fn in [
        ("conv_turn_taking", q_conv_turn_taking),
        ("purchase_click_welch", q_purchase_click_welch),
        ("corpus_heaps_slope", q_corpus_heaps_slope),
        ("event_user_hll", q_event_user_hll),
        ("blocking_quality", q_blocking_quality),
        ("doc_lang_kappa", q_doc_lang_kappa),
        ("event_markov_entropy", q_event_markov_entropy),
    ]:
        if name in skip:
            continue
        bench(name, fn, args.sf, big)

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
