"""Scale-bench for the round-3 operator family: run each operator at sf0.1
(1×) and at a ≥10× replicated input (default 16×), report walls, per-row
step ratios, and the fan-out/skew counters the operator docstrings promise.

Replication preserves each operator's density rather than inflating it:
ids are offset per replica (distinct keys — no artificial hot groups),
timestamps/dates are shifted by the table's full time range per replica
(the time axis stretches 16×, so per-window / per-bucket density is
constant, exactly like 16× more days of the same workload), and document
tokens are tagged per replica (intra-replica near-dup structure is
preserved; no cross-replica pairs). A linear operator should show a
t(16×)/t(1×) step ≤ ~16 plus fixed costs; the acceptance bar recorded in
BASELINE.md is "no >2× super-linear step" (step ratio ≤ 32).

Usage: python tools/scale_bench_r3.py [--reps 16] [--sf /root/testdata/sf0.1]
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
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _shift_tables(sf: str, out_dir: str, reps: int) -> None:
    """Replicate events / orders / lineitem / documents with id offsets +
    time-range shifts + per-replica token tags. One-time, cached."""
    import ray.data

    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)

    def span_us(path: str, col: str) -> int:
        t = pq.read_table(path, columns=[col])
        c = pc.cast(t.column(col), pa.timestamp("us")).cast(pa.int64())
        return int(pc.max(c).as_py() - pc.min(c).as_py()) + 86_400_000_000

    ev_span = span_us(f"{sf}/events.parquet", "ts")
    od_span = span_us(f"{sf}/orders.parquet", "o_orderdate")
    li_span = span_us(f"{sf}/lineitem.parquet", "l_shipdate")
    t_span = max(od_span, li_span)  # orders/lineitem share one time axis

    def rep_events(t: pa.Table):
        for r in range(reps):
            ts = pc.cast(t.column("ts"), pa.timestamp("us")).cast(pa.int64())
            yield pa.table(
                {
                    "event_id": pc.add(t.column("event_id"), r * 1_000_000_000),
                    "ts": pc.add(ts, r * ev_span).cast(pa.timestamp("us")),
                    "user_id": pc.add(t.column("user_id"), r * 10_000_000),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                }
            )

    def rep_orders(t: pa.Table):
        for r in range(reps):
            d = pc.cast(t.column("o_orderdate"), pa.timestamp("us")).cast(pa.int64())
            yield pa.table(
                {
                    "o_orderkey": pc.add(t.column("o_orderkey"), r * 1_000_000_000),
                    "o_custkey": pc.add(t.column("o_custkey"), r * 10_000_000),
                    "o_orderstatus": t.column("o_orderstatus"),
                    "o_totalprice": t.column("o_totalprice"),
                    "o_orderdate": pc.add(d, r * t_span).cast(pa.timestamp("us")),
                    "o_orderpriority": t.column("o_orderpriority"),
                }
            )

    def rep_lineitem(t: pa.Table):
        for r in range(reps):
            d = pc.cast(t.column("l_shipdate"), pa.timestamp("us")).cast(pa.int64())
            yield pa.table(
                {
                    "l_orderkey": pc.add(t.column("l_orderkey"), r * 1_000_000_000),
                    "l_partkey": pc.add(t.column("l_partkey"), r * 10_000_000),
                    "l_suppkey": pc.add(t.column("l_suppkey"), r * 10_000_000),
                    "l_linenumber": t.column("l_linenumber"),
                    "l_quantity": t.column("l_quantity"),
                    "l_extendedprice": t.column("l_extendedprice"),
                    "l_discount": t.column("l_discount"),
                    "l_returnflag": t.column("l_returnflag"),
                    "l_shipdate": pc.add(d, r * t_span).cast(pa.timestamp("us")),
                }
            )

    def rep_customer(t: pa.Table):
        # custkey offsets mirror rep_orders so the FK survives replication
        for r in range(reps):
            yield pa.table(
                {
                    "c_custkey": pc.add(t.column("c_custkey"), r * 10_000_000),
                    "c_nationkey": t.column("c_nationkey"),
                    "c_mktsegment": t.column("c_mktsegment"),
                }
            )

    def rep_docs(t: pa.Table):
        for r in range(reps):
            # per-replica token tag: every token after the first gains an
            # 'r<N>q' prefix, so shingles never match ACROSS replicas while
            # intra-replica jaccard structure is exactly preserved
            txt = pc.replace_substring(t.column("text"), " ", f" r{r}q")
            yield pa.table(
                {
                    "doc_id": pc.add(t.column("doc_id"), r * 1_000_000),
                    "text": txt,
                    "lang": t.column("lang"),
                }
            )

    def rep_embeddings(t: pa.Table):
        for r in range(reps):
            yield pa.table(
                {
                    "vec_id": pc.add(t.column("vec_id"), r * 100_000_000),
                    "embedding": t.column("embedding"),
                    # labels offset per replica: 16x data = 16x label groups,
                    # constant group size (density-preserving)
                    "label": pc.add(
                        pc.cast(t.column("label"), pa.int32()),
                        pa.scalar(r * 1000, pa.int32()),
                    ),
                }
            )

    jobs = [
        ("embeddings", ["vec_id", "embedding", "label"], rep_embeddings),
        ("events", ["event_id", "ts", "user_id", "event_type", "value"], rep_events),
        (
            "orders",
            [
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            ],
            rep_orders,
        ),
        (
            "lineitem",
            [
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_returnflag",
                "l_shipdate",
            ],
            rep_lineitem,
        ),
        ("customer", ["c_custkey", "c_nationkey", "c_mktsegment"], rep_customer),
        ("documents", ["doc_id", "text", "lang"], rep_docs),
    ]
    for name, cols, fn in jobs:
        ds = ray.data.read_parquet(f"{sf}/{name}.parquet", columns=cols)
        (
            ds.map_batches(fn, batch_format="pyarrow")
            .repartition(32)
            .write_parquet(os.path.join(out_dir, f"{name}.parquet"))
        )
    with open(marker, "w") as f:
        f.write(str(reps))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--sf", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--repeats",
        type=int,
        default=2,
        help="min-of-N walls per (op, scale) — the VM has ±30%% host noise",
    )
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
    print(json.dumps({"gen_sec": round(time.time() - t0, 1), "dir": big}))

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_doc_tfidf_top_terms,
        q_hopping_event_counts,
        q_near_dup_clusters,
        q_near_dup_split,
        q_order_split_counts,
        q_sessionize,
        q_urgent_window_shipments,
    )

    ops = [
        ("hopping_event_counts", q_hopping_event_counts),
        ("urgent_window_shipments", q_urgent_window_shipments),
        ("order_split_counts", q_order_split_counts),
        ("doc_tfidf_top_terms", q_doc_tfidf_top_terms),
        ("near_dup_clusters", q_near_dup_clusters),
        ("near_dup_split", q_near_dup_split),
        ("sessionize", q_sessionize),
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

    # counters the docstrings promise
    import duckdb

    con = duckdb.connect()
    counters: dict = {}
    # range join: full-bucket coverage rows per interval + boundary volume
    n_urgent = con.execute(
        f"SELECT count(*) FROM read_parquet('{big}/orders.parquet/*.parquet') "
        "WHERE o_orderpriority = '1-URGENT'"
    ).fetchone()[0]
    counters["range_join"] = {
        "n_intervals": int(n_urgent),
        "full_bucket_rows_per_interval": 59,  # 60-day window, 1-day buckets, 2 boundary
        "n_points": int(
            con.execute(
                f"SELECT count(*) FROM read_parquet('{big}/lineitem.parquet/*.parquet')"
            ).fetchone()[0]
        ),
    }
    # near-dup: cluster-size histogram head
    from multiomics_biocypher_kg_ray.pipelines.queries import _read
    from multiomics_biocypher_kg_ray.stages import dedup

    pairs = dedup.ngram_jaccard_pairs(
        _read(big, "documents", ["doc_id", "text"]), min_jaccard=0.5
    )
    n_pairs = pairs.count()
    cl = q_near_dup_clusters(big)
    hist = (
        cl.to_pandas().groupby("cluster_id").size().value_counts().sort_index()
    )
    counters["near_dup"] = {
        "n_pair_edges": int(n_pairs),
        "cluster_size_histogram": {int(k): int(v) for k, v in hist.items()},
    }
    summary["counters"] = counters
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
