"""Scale-bench for the round-5 rewritten kernels + new ops: the vectorized
MinHash family (shingle_explode + embedded-DuckDB signatures, fused
two-tier audit), the vectorized decontaminator, the single-union
pk_duplicate_audit, and the S7 cache-or-fetch enrichment — each at sf0.1
(1×) and a 16× density-preserving replica (scale_bench_r3's table shifts,
plus part/supplier replicas for the audit/enrichment ops).

Usage: python tools/scale_bench_r5.py [--reps 16] [--cpus 32] [--repeats 2]
Prints one JSON line per operator and a final summary JSON; paste rows into
SCALING_LOG.md and re-run tools/make_scaling_json.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_bench_r3 import _shift_tables  # noqa: E402


def _rep_part_supplier(sf: str, out_dir: str, reps: int) -> None:
    import ray.data

    marker = os.path.join(out_dir, "_PS_DONE")
    if os.path.exists(marker):
        return

    def rep_part(t: pa.Table):
        for r in range(reps):
            yield t.set_column(
                t.schema.get_field_index("p_partkey"),
                "p_partkey",
                pc.add(t.column("p_partkey"), r * 10_000_000),
            )

    def rep_supplier(t: pa.Table):
        for r in range(reps):
            # per-replica name suffix: 16x distinct keys for the cache
            # (the honest regime — a shared key space would hand the cache
            # a 16x hit rate for free)
            yield pa.table(
                {
                    "s_suppkey": pc.add(t.column("s_suppkey"), r * 10_000_000),
                    "s_name": pc.binary_join_element_wise(
                        t.column("s_name"), f"r{r}", "#"
                    ),
                }
            )

    for name, cols, fn in [
        ("part", None, rep_part),
        ("supplier", ["s_suppkey", "s_name"], rep_supplier),
    ]:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.isfile(dst):  # older harnesses dropped 1x copies here
            os.remove(dst)
        ds = ray.data.read_parquet(f"{sf}/{name}.parquet", columns=cols)
        ds.map_batches(fn, batch_format="pyarrow").repartition(16).write_parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    with open(marker, "w") as f:
        f.write(str(reps))


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

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from multiomics_biocypher_kg_ray.tuning import tune_context_for_small_data

    tune_context_for_small_data()

    sf_tag = os.path.basename(args.sf.rstrip("/"))
    big = f"/tmp/scale_{sf_tag}_x{args.reps}"
    t0 = time.time()
    _shift_tables(args.sf, big, args.reps)
    _rep_part_supplier(args.sf, big, args.reps)
    print(json.dumps({"gen_sec": round(time.time() - t0, 1), "dir": big}))

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_doc_decontaminate,
        q_jaccard_shingle_stats,
        q_lsh_candidate_pairs,
        q_minhash_bands,
        q_minhash_estimate_audit,
        q_near_dup_threshold_curve,
        q_pk_duplicate_audit,
    )
    from multiomics_biocypher_kg_ray.pipelines.reader_queries import (
        q_cached_lookup_enrich,
    )

    ops = [
        ("minhash_bands", q_minhash_bands),
        ("lsh_candidate_pairs", q_lsh_candidate_pairs),
        ("jaccard_shingle_stats", q_jaccard_shingle_stats),
        ("minhash_estimate_audit", q_minhash_estimate_audit),
        ("near_dup_threshold_curve", q_near_dup_threshold_curve),
        ("doc_decontaminate", q_doc_decontaminate),
        ("pk_duplicate_audit", q_pk_duplicate_audit),
        ("cached_lookup_enrich", q_cached_lookup_enrich),
    ]
    summary: dict = {"reps": args.reps, "num_cpus": args.cpus, "ops": {}}
    for name, fn in ops:
        row: dict = {}
        for tag, d in [("1x", args.sf), (f"{args.reps}x", big)]:
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

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
