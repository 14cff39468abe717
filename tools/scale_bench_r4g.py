"""Scale-bench for the late session-5 round-4 operator wave (time-RANGE max
window, forward as-of, DESeq size factors, Bolstad quantile normalization,
exact Mann-Whitney U, equi-depth histogram, OLS trend, Zipf slope, Fano
burstiness, FK audit, per-edge triangle support): tabular operators at sf0.1
(1x) and a >=10x replicated input (default 16x); edge_support over the
Zipf-skewed synthetic edge generator.

Usage: python tools/scale_bench_r4g.py [--reps 16] [--cpus 32] [--repeats 2]
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
        q_corpus_zipf_slope,
        q_event_type_burstiness,
        q_event_value_histogram,
        q_fk_orphan_audit,
        q_priority_quantile_norm,
        q_priority_size_factors,
        q_purchase_click_utest,
        q_signup_to_purchase,
        q_user_peak_1h,
        q_user_value_trend,
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

    bench("edge_support_synth", graph_op(graph.edge_support), g1, gN)
    for name, fn in [
        ("user_peak_1h", q_user_peak_1h),
        ("signup_to_purchase", q_signup_to_purchase),
        ("priority_size_factors", q_priority_size_factors),
        ("priority_quantile_norm", q_priority_quantile_norm),
        ("purchase_click_utest", q_purchase_click_utest),
        ("event_value_histogram", q_event_value_histogram),
        ("user_value_trend", q_user_value_trend),
        ("corpus_zipf_slope", q_corpus_zipf_slope),
        ("event_type_burstiness", q_event_type_burstiness),
        ("fk_orphan_audit", q_fk_orphan_audit),
    ]:
        bench(name, fn, args.sf, big)

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
