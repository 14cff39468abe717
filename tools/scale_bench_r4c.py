"""Scale-bench for the late-round-4 operator wave #2 (winsorization, skew
report, KMV distinct sketch, BM25 retrieval, incremental edge merge): each
operator at sf0.1 (1×) and at a ≥10× input (default 16×), walls + step
ratios.

Tabular inputs reuse scale_bench_r3's density-preserving `_shift_tables`
replication. The incremental merge gets synthetic edge tables (Zipf-skewed
dst like scale_bench_r4b) split into two halves — merge cost is
distinct-edge-proportional, which is exactly what the step ratio checks.

Usage: python tools/scale_bench_r4c.py [--reps 16] [--cpus 32] [--repeats 2]
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
from scale_bench_r4b import _synth_edges  # noqa: E402

EDGES_1X = 200_000


def _edge_table(n: int, seed: int) -> "pa.Table":
    """Zipf edge list -> (src, pred, dst, weight, evidence) edge table with
    per-row single-rule evidence, so merged groups genuinely re-union sets."""
    rng = np.random.RandomState(seed)
    e = _synth_edges(n, seed=seed)
    k = e.num_rows
    return pa.table(
        {
            "src": e.column("src"),
            "pred": pa.array(
                np.char.add("p", rng.randint(0, 5, size=k).astype("U1"))
            ),
            "dst": e.column("dst"),
            "weight": pa.array(np.ones(k, dtype=np.int64)),
            "evidence": pa.array(
                np.char.add("r", rng.randint(0, 8, size=k).astype("U1"))
            ),
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
        q_bm25_docs,
        q_event_user_kmv,
        q_events_winsorized,
        q_user_event_skew,
    )
    from multiomics_biocypher_kg_ray.stages.materialize import merge_edges

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

    for name, fn in [
        ("events_winsorized", q_events_winsorized),
        ("user_event_skew", q_user_event_skew),
        ("event_user_kmv", q_event_user_kmv),
        ("bm25_docs", q_bm25_docs),
    ]:
        bench(name, fn, args.sf, big)

    def merge_op(pair):
        a, b = pair
        return merge_edges(
            ray.data.from_arrow(a).repartition(args.cpus),
            ray.data.from_arrow(b).repartition(args.cpus),
        )

    m1 = (_edge_table(EDGES_1X, 11), _edge_table(EDGES_1X, 23))
    mN = (
        _edge_table(EDGES_1X * args.reps, 11),
        _edge_table(EDGES_1X * args.reps, 23),
    )
    bench("merge_edges_synth", merge_op, m1, mN)

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
