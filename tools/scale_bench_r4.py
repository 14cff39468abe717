"""Scale-bench for the round-4 operator family (window scans, rollup, p99
filter, unigram score, centroids, k-means): each operator at sf0.1 (1×) and
at a ≥10× replicated input (default 16×), reporting walls + step ratios.

Replication reuses scale_bench_r3's density-preserving table shifts
(id offsets per replica, time axis stretched, per-replica token tags) and
adds an embeddings replicator (vec_id offsets; labels unchanged, so
per-label vector counts scale ×reps — exactly how a 16× corpus with the
same label taxonomy behaves).

Usage: python tools/scale_bench_r4.py [--reps 16] [--cpus 32] [--repeats 2]
Prints one JSON line per operator and a final summary JSON.
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


def _rep_embeddings(sf: str, out_dir: str, reps: int) -> None:
    import ray.data

    dst = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(os.path.join(dst, "_EMB_DONE")):
        return

    def rep(t: pa.Table):
        for r in range(reps):
            yield t.set_column(
                t.schema.get_field_index("vec_id"),
                "vec_id",
                pc.add(t.column("vec_id"), r * 1_000_000_000),
            )

    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet").repartition(16)
    ds.map_batches(rep, batch_format="pyarrow", batch_size=None).write_parquet(dst)
    with open(os.path.join(dst, "_EMB_DONE"), "w") as f:
        f.write("ok")


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
    _rep_embeddings(args.sf, big, args.reps)
    print(json.dumps({"gen_sec": round(time.time() - t0, 1), "dir": big}))

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_doc_unigram_score,
        q_embedding_centroids,
        q_event_lag_delta,
        q_events_above_p99,
        q_events_rollup,
        q_kmeans_embed,
        q_user_cumulative_value,
    )

    ops = [
        ("user_cumulative_value", q_user_cumulative_value),
        ("event_lag_delta", q_event_lag_delta),
        ("events_rollup", q_events_rollup),
        ("events_above_p99", q_events_above_p99),
        ("doc_unigram_score", q_doc_unigram_score),
        ("embedding_centroids", q_embedding_centroids),
        ("kmeans_embed", q_kmeans_embed),
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
