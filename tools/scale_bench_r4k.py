"""Scale-bench for the session-18..22 round-4 operator waves (RRF fusion,
k-step funnel, PK audit, quota allocation, DiD, CMS audit, block jackknife,
ANOVA, weighted median, mixture plan, qa pairs, embedding covariance) at
sf0.1 (1x) vs the >=10x replicated input (default 16x).

Usage: python tools/scale_bench_r4k.py [--reps 16] [--cpus 32] [--repeats 2]
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

    sf_tag = os.path.basename(args.sf.rstrip("/"))
    big = f"/tmp/scale_{sf_tag}_x{args.reps}"
    t0 = time.time()
    _shift_tables(args.sf, big, args.reps)
    print(json.dumps({"gen_sec": round(time.time() - t0, 1), "dir": big}))

    # embeddings are NOT replicated by _shift_tables's doc generator's
    # near-dup-preserving path at 16x vecs — replicate verbatim with id
    # offsets (covariance is invariant to the replication, a useful check)
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

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

    # pk_duplicate_audit reads part, which _shift_tables does not replicate
    # — copy it verbatim (1x part against 16x facts is fine for the audit)
    part_big = os.path.join(big, "part.parquet")
    if not os.path.exists(part_big):
        pq.write_table(
            pq.read_table(os.path.join(args.sf, "part.parquet")), part_big
        )

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_bm25_rrf,
        q_doc_length_calibration,
        q_doc_length_f1,
        q_kg_negative_samples,
        q_source_hapax_ratio,
        q_transition_model_eval,
        q_embedding_covariance,
        q_event_type_anova,
        q_funnel_3step,
        q_lineitem_weighted_median,
        q_pk_duplicate_audit,
        q_priority_quota,
        q_purchase_click_did,
        q_purchase_value_jackknife,
        q_qa_pairs,
        q_source_mixture_plan,
        q_term_cms_audit,
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

    # doc-text ops use the VERBATIM 16x replica (tools/scale_bench_r4j.py
    # builds it): the r<N>q token tagging would zero the BM25 query terms
    # and skew token stats; verbatim replication keeps text semantics
    big_docs = f"/tmp/scale_{sf_tag}_x{args.reps}_verbatim"
    if not os.path.exists(os.path.join(big_docs, "_DONE")):
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
        with open(os.path.join(big_docs, "_DONE"), "w") as f:
            f.write(str(args.reps))
    elif not os.path.exists(os.path.join(big_docs, "documents.parquet")):
        raise RuntimeError(f"{big_docs} marked done but missing documents")
    # the r4j verbatim dir may lack the source column — rebuild if so
    cols = pq.ParquetFile(
        os.path.join(big_docs, "documents.parquet")
    ).schema_arrow.names
    if "source" not in cols or "n_chars" not in cols:
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

    skip = set((os.environ.get("GRAFT_SKIP_OPS") or "").split(","))
    for name, fn, bigd in [
        ("bm25_rrf", q_bm25_rrf, big_docs),
        ("funnel_3step", q_funnel_3step, big),
        ("pk_duplicate_audit", q_pk_duplicate_audit, big),
        ("priority_quota", q_priority_quota, big),
        ("purchase_click_did", q_purchase_click_did, big),
        ("term_cms_audit", q_term_cms_audit, big_docs),
        ("purchase_value_jackknife", q_purchase_value_jackknife, big),
        ("event_type_anova", q_event_type_anova, big),
        ("lineitem_weighted_median", q_lineitem_weighted_median, big),
        ("source_mixture_plan", q_source_mixture_plan, big_docs),
        ("qa_pairs", q_qa_pairs, big_docs),
        ("embedding_covariance", q_embedding_covariance, big),
        ("kg_negative_samples", q_kg_negative_samples, big_docs),
        ("transition_model_eval", q_transition_model_eval, big),
        ("doc_length_f1", q_doc_length_f1, big_docs),
        ("doc_length_calibration", q_doc_length_calibration, big_docs),
        ("source_hapax_ratio", q_source_hapax_ratio, big_docs),
    ]:
        if name in skip:
            continue
        bench(name, fn, args.sf, bigd)

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
