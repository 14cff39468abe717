"""Scale-bench for the session-44 round-4 operator wave (per-user TWAP,
daily-revenue runs test, interarrival hazard curve, Kruskal-Wallis,
Neyman allocation, aggregated Theil-Sen, MinHash calibration audit,
JL random-projection distortion) at sf0.1 (1x) vs a >=10x replicated
input (default 16x).

Usage: python tools/scale_bench_r4m.py [--reps 16] [--cpus 32] [--repeats 2]
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
    print(json.dumps({"gen_sec": round(time.time() - t0, 1), "dir": big}))

    # NOTE: the audit runs its 16x on the TAGGED replica (`big`): a
    # verbatim replica makes every doc a 16-way dup family, so candidate
    # pairs grow ~120x per original doc (measured: >35 GB of shuffle spill
    # — the session-33/43 caveat) while the tagged replica preserves each
    # replica's planted dup families and grows pairs linearly, which is the
    # scaling claim under test. The verbatim replica is still built for
    # reference/other ops.
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

    # embeddings + part: replicate verbatim with id offsets into `big`
    emb_big = os.path.join(big, "embeddings.parquet")
    if not os.path.exists(emb_big):
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
        pq.write_table(reps_t, emb_big)
    part_big = os.path.join(big, "part.parquet")
    if not os.path.exists(part_big):
        t = pq.read_table(os.path.join(args.sf, "part.parquet"))
        reps_t = pa.concat_tables(
            [
                t.set_column(
                    t.schema.get_field_index("p_partkey"),
                    "p_partkey",
                    pc.add(t.column("p_partkey"), r * 100_000_000),
                )
                for r in range(args.reps)
            ]
        )
        pq.write_table(reps_t, part_big)

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_daily_revenue_runs,
        q_embedding_rp_distortion,
        q_event_hazard_rate,
        q_event_type_kruskal,
        q_minhash_estimate_audit,
        q_neyman_allocation,
        q_part_theil_sen,
        q_user_twap,
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
        ("user_twap", q_user_twap, big),
        ("daily_revenue_runs", q_daily_revenue_runs, big),
        ("event_hazard_rate", q_event_hazard_rate, big),
        ("event_type_kruskal", q_event_type_kruskal, big),
        ("neyman_allocation", q_neyman_allocation, big),
        ("part_theil_sen", q_part_theil_sen, big),
        ("minhash_estimate_audit", q_minhash_estimate_audit, big),
        ("embedding_rp_distortion", q_embedding_rp_distortion, big),
    ]:
        if name in skip:
            continue
        bench(name, fn, args.sf, bigd)

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
