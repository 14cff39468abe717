"""Scale-bench for the session-6 round-4 operator wave (Spearman, KS,
chi-square, categorical MI, tf-idf cosine pairs, CUSUM, Benford, RFM,
half-life decay): tabular operators at sf0.1 (1x) vs a >=10x replicated
input (default 16x); truss_peel and hits over the Zipf-skewed synthetic
edge generator.

Usage: python tools/scale_bench_r4h.py [--reps 16] [--cpus 32] [--repeats 2]
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

from scale_bench_r3 import _shift_tables  # noqa: E402
from scale_bench_r4b import EDGES_1X, _synth_edges  # noqa: E402


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
        q_doc_readability,
        q_event_type_cusum,
        q_event_type_hour_mi,
        q_orders_benford,
        q_orders_gini,
        q_part_price_spearman,
        q_purchase_click_ks,
        q_segment_priority_chisq,
        q_session_concurrency,
        q_tfidf_cosine_pairs,
        q_user_decayed_value,
        q_user_interarrival_stats,
        q_user_retention_km,
        q_user_rfm,
        q_user_value_autocorr,
    )
    from multiomics_biocypher_kg_ray.stages import graph

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

    bench(
        "truss_peel_synth",
        graph_op(lambda ds: graph.truss_peel(ds, k=3, rounds=3)),
        g1,
        gN,
    )
    bench("hits_synth", graph_op(lambda ds: graph.hits(ds, iters=2)), g1, gN)
    for name, fn in [
        ("part_price_spearman", q_part_price_spearman),
        ("purchase_click_ks", q_purchase_click_ks),
        ("segment_priority_chisq", q_segment_priority_chisq),
        ("event_type_hour_mi", q_event_type_hour_mi),
        ("tfidf_cosine_pairs", q_tfidf_cosine_pairs),
        ("event_type_cusum", q_event_type_cusum),
        ("orders_benford", q_orders_benford),
        ("user_rfm", q_user_rfm),
        ("user_decayed_value", q_user_decayed_value),
        ("orders_gini", q_orders_gini),
        ("session_concurrency", q_session_concurrency),
        ("user_retention_km", q_user_retention_km),
        ("doc_readability", q_doc_readability),
        ("user_value_autocorr", q_user_value_autocorr),
        ("user_interarrival_stats", q_user_interarrival_stats),
    ]:
        bench(name, fn, args.sf, big)

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
