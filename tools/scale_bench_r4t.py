"""Scale-bench for the session-54 round-4 operator pair (per-user
preference drift census, LSH band-config cost planner) at sf0.1 (1x) vs a
>=10x replicated input (default 16x). The LSH planner rides the TAGGED
doc replica (linear bucket growth — the session-44 verbatim caveat).

Usage: python tools/scale_bench_r4t.py [--reps 16] [--cpus 32] [--repeats 2]
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
    # nation_trade_matrix FKs: supplier replicated with the SAME r*10M
    # suppkey offsets rep_lineitem applies; nation copied verbatim
    supp_big = os.path.join(big, "supplier.parquet")
    if not os.path.exists(supp_big):
        t = pq.read_table(os.path.join(args.sf, "supplier.parquet"))
        reps_t = pa.concat_tables(
            [
                t.set_column(
                    t.schema.get_field_index("s_suppkey"),
                    "s_suppkey",
                    pc.add(t.column("s_suppkey"), r * 10_000_000),
                )
                for r in range(args.reps)
            ]
        )
        pq.write_table(reps_t, supp_big)
    nat_big = os.path.join(big, "nation.parquet")
    if not os.path.exists(nat_big):
        pq.write_table(pq.read_table(os.path.join(args.sf, "nation.parquet")), nat_big)
    # the multisource build (confidence calibration) needs embeddings next
    # to the verbatim docs
    emb_v = os.path.join(big_docs, "embeddings.parquet")
    if not os.path.exists(emb_v):
        t = pq.read_table(os.path.join(args.sf, "embeddings.parquet"))
        reps_t = pa.concat_tables(
            [
                t.set_column(
                    t.schema.get_field_index("vec_id"),
                    "vec_id",
                    pc.add(t.column("vec_id"), r * 100_000_000),
                )
                for r in range(args.reps)
            ]
        )
        pq.write_table(reps_t, emb_v)
    # user_pref_drift splits at the GLOBAL time midpoint: the time-shifted
    # replica puts each replica's users wholly into one half (degenerate
    # 0-row output), so this op gets a NO-SHIFT events replica — user ids
    # offset, timestamps verbatim
    big_ns = f"/tmp/scale_{sf_tag}_x{args.reps}_noshift"
    if not os.path.exists(os.path.join(big_ns, "events.parquet")):
        os.makedirs(big_ns, exist_ok=True)
        t = pq.read_table(
            os.path.join(args.sf, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        reps_t = pa.concat_tables(
            [
                t.set_column(
                    t.schema.get_field_index("user_id"),
                    "user_id",
                    pc.add(t.column("user_id"), r * 10_000_000),
                ).set_column(
                    t.schema.get_field_index("event_id"),
                    "event_id",
                    pc.add(t.column("event_id"), r * 1_000_000_000),
                )
                for r in range(args.reps)
            ]
        )
        pq.write_table(reps_t, os.path.join(big_ns, "events.parquet"))
    print(json.dumps({"gen_sec": round(time.time() - t0, 1), "dir": big}))

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_lsh_config_cost_audit,
        q_user_pref_drift,
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
        ("user_pref_drift", q_user_pref_drift, big_ns),
        ("lsh_config_cost_audit", q_lsh_config_cost_audit, big),
    ]:
        if name in skip:
            continue
        bench(name, fn, args.sf, bigd)

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
