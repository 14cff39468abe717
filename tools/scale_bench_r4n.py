"""Scale-bench for the session-45/46 round-4 operator waves (weekday
seasonality strength, dedup threshold calibration curve, Hill tail index,
SAX motif census, per-tool latency, ABC mobility matrix) at sf0.1 (1x) vs
a >=10x replicated input (default 16x).

The dedup calibration curve runs its 16x on the TAGGED replica for the
same reason as ``scale_bench_r4m``'s audit: a verbatim replica makes every
doc a 16-way dup family and grows candidate pairs ~120x; the tagged
replica preserves within-replica dup families and grows pairs linearly.
Tool latency and SAX motifs ride the verbatim docs (transcripts synthesize
from text; the tagged tokens do not disturb turn structure, but verbatim
is the faithful workload).

Usage: python tools/scale_bench_r4n.py [--reps 16] [--cpus 32] [--repeats 2]
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

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    sf_tag = os.path.basename(args.sf.rstrip("/"))
    big = f"/tmp/scale_{sf_tag}_x{args.reps}"
    t0 = time.time()
    _shift_tables(args.sf, big, args.reps)
    big_docs = f"/tmp/scale_{sf_tag}_x{args.reps}_verbatim"
    if not os.path.exists(os.path.join(big_docs, "documents.parquet")):
        os.makedirs(big_docs, exist_ok=True)
        t = pq.read_table(
            os.path.join(args.sf, "documents.parquet"),
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
        reps_t = pa.concat_tables(
            [
                t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pc.add(t.column("doc_id"), r * 1_000_000),
                )
                for r in range(args.reps)
            ]
        )
        pq.write_table(reps_t, os.path.join(big_docs, "documents.parquet"))
    print(json.dumps({"gen_sec": round(time.time() - t0, 1), "dir": big}))

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_customer_abc_mobility,
        q_event_tail_hill,
        q_near_dup_threshold_curve,
        q_orders_seasonal_strength,
        q_tool_latency,
        q_user_value_sax_motifs,
    )

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
    for name, fn, bigd in [
        ("orders_seasonal_strength", q_orders_seasonal_strength, big),
        ("event_tail_hill", q_event_tail_hill, big),
        ("user_value_sax_motifs", q_user_value_sax_motifs, big),
        ("customer_abc_mobility", q_customer_abc_mobility, big),
        ("tool_latency", q_tool_latency, big_docs),
        ("near_dup_threshold_curve", q_near_dup_threshold_curve, big),
    ]:
        if name in skip:
            continue
        bench(name, fn, args.sf, bigd)

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
