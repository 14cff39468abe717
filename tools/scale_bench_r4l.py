"""Scale-bench for the session-27/28 round-4 operator waves (power-iteration
top principal component, churn feature/label table, hashing-trick features,
typed meta-path census, NB source-classifier confusion, pairwise source KL)
at sf0.1 (1x) vs the >=10x replicated input (default 16x).

Usage: python tools/scale_bench_r4l.py [--reps 16] [--cpus 32] [--repeats 2]
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

    # verbatim-text doc replica (extraction rules + token stats need the
    # original text — the r<N>q-tagged replica erases rule patterns)
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

    # embeddings: replicate verbatim with vec_id offsets (top-PC is
    # invariant to replication — a correctness check for free; the
    # multisource near-dup edge source needs them present too)
    for dest in (big, big_docs):
        emb_big = os.path.join(dest, "embeddings.parquet")
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

    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_char_pair_merge_candidates,
        q_chunk_dup_stats,
        q_doc_compression_ratio,
        q_dup_source_matrix,
        q_cohort_ltv,
        q_event_daily_anomaly,
        q_events_order_audit,
        q_kg_degree_gini,
        q_kg_mention_contexts,
        q_doc_hashed_features,
        q_doc_nb_source,
        q_embedding_dedup_clusters,
        q_embedding_label_margin,
        q_embedding_top_pc,
        q_kg_edge_decay,
        q_kg_entity_profile,
        q_kg_growth_curve,
        q_session_type_rules,
        q_kg_metapath_census,
        q_kg_modularity,
        q_kg_node_lifespan,
        q_kg_provenance_mix,
        q_kg_rule_yield,
        q_kg_walk_corpus,
        q_pack_efficiency,
        q_supplier_slow_ship,
        q_source_retention_funnel,
        q_kg_snapshot_diff,
        q_vocab_oov_rate,
        q_kg_pred_synonyms,
        q_kg_functional_audit,
        q_last_touch_attribution,
        q_order_percent_rank,
        q_source_eval_sample,
        q_source_token_kl,
        q_user_churn_labels,
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
        ("embedding_top_pc", q_embedding_top_pc, big),
        ("user_churn_labels", q_user_churn_labels, big),
        ("doc_hashed_features", q_doc_hashed_features, big_docs),
        ("kg_metapath_census", q_kg_metapath_census, big_docs),
        ("doc_nb_source", q_doc_nb_source, big_docs),
        ("source_token_kl", q_source_token_kl, big_docs),
        # session-29: decay rides the verbatim transcript synthesis (needs
        # real rule-pattern text), chunk audit the verbatim docs, percent
        # rank the shifted orders
        ("kg_edge_decay", q_kg_edge_decay, big_docs),
        ("chunk_dup_stats", q_chunk_dup_stats, big_docs),
        ("order_percent_rank", q_order_percent_rank, big),
        # session-30: modularity + node lifespan ride the verbatim
        # transcripts (rule-pattern text), LTV the shifted events
        ("kg_modularity", q_kg_modularity, big_docs),
        ("kg_node_lifespan", q_kg_node_lifespan, big_docs),
        ("cohort_ltv", q_cohort_ltv, big),
        # session-31
        ("embedding_label_margin", q_embedding_label_margin, big),
        ("session_type_rules", q_session_type_rules, big),
        ("kg_growth_curve", q_kg_growth_curve, big_docs),
        # session-32
        ("last_touch_attribution", q_last_touch_attribution, big),
        ("source_eval_sample", q_source_eval_sample, big_docs),
        # session-33
        ("kg_walk_corpus", q_kg_walk_corpus, big_docs),
        ("source_retention_funnel", q_source_retention_funnel, big_docs),
        # session-34
        ("kg_snapshot_diff", q_kg_snapshot_diff, big_docs),
        ("vocab_oov_rate", q_vocab_oov_rate, big_docs),
        # session-35
        ("kg_pred_synonyms", q_kg_pred_synonyms, big_docs),
        ("kg_functional_audit", q_kg_functional_audit, big_docs),
        # session-36
        ("embedding_dedup_clusters", q_embedding_dedup_clusters, big),
        # session-37
        ("kg_entity_profile", q_kg_entity_profile, big_docs),
        # session-38
        ("kg_degree_gini", q_kg_degree_gini, big_docs),
        ("events_order_audit", q_events_order_audit, big),
        # session-39
        ("char_pair_merge_candidates", q_char_pair_merge_candidates, big_docs),
        ("doc_compression_ratio", q_doc_compression_ratio, big_docs),
        # session-40
        ("kg_provenance_mix", q_kg_provenance_mix, big_docs),
        ("supplier_slow_ship", q_supplier_slow_ship, big),
        # session-41
        ("kg_mention_contexts", q_kg_mention_contexts, big_docs),
        ("event_daily_anomaly", q_event_daily_anomaly, big),
        # session-42
        ("kg_rule_yield", q_kg_rule_yield, big_docs),
        ("pack_efficiency", q_pack_efficiency, big_docs),
        # session-43
        ("dup_source_matrix", q_dup_source_matrix, big_docs),
    ]:
        if name in skip:
            continue
        bench(name, fn, args.sf, bigd)

    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
