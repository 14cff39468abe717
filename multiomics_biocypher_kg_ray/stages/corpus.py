"""Corpus-preparation operators for LLM training-data pipelines — document
chunking, sequence packing, and pattern redaction with audit counts.

These extend the reference's transform surface (its nearest analogs are the
string-transform registry, ``annotation_transforms.py``, and the row→edge
extractors) with the three ops every pretraining-data run needs between
"filtered corpus" and "token sequences":

- ``chunk_documents`` — overlapping fixed-token windows per document. Pure
  per-batch flat map: 1 doc row → ceil-many chunk rows, no shuffle, no
  state. The window arithmetic is integer-exact so the DuckDB twin
  (list_slice over string_split) matches row-for-row.
- ``pack_sequences`` — assign documents to fixed-token-budget packs. The
  contract is a deterministic ordered scan: within a shard (``doc_id %
  n_shards``), documents in ``doc_id`` order fill packs by cumulative token
  count, ``pack_idx = tokens_before // budget`` — exactly the SQL window
  ``(sum(n) OVER (PARTITION BY shard ORDER BY doc_id) - n) // budget``.
  Distribution shape: a true distributed prefix sum (``segmented_prefix_sum``)
  — global sort, per-block vectorized cumsum, block-count-bounded segment
  summaries broadcast once, offsets resolved in a second stateless pass. No
  per-shard funnel task; a shard with 10^8 docs costs any one task its
  sorted-block share.
- ``redact_patterns`` — compiled-regex scrubbing (emails, long digit runs,
  hex tokens) emitting the redacted text AND per-pattern hit counts — the
  audit side-channel a compliance pass needs (no silent rewrites). Patterns
  are RE2-safe so the DuckDB twin (``regexp_replace(..., 'g')`` +
  ``len(regexp_extract_all(...))``) is exact.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


# --------------------------------------------------------------- chunking


def _chunk_fn(batch: pa.Table, chunk_tokens: int, stride: int) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    o_id, o_idx, o_txt, o_n = [], [], [], []
    for did, t in zip(ids, texts):
        toks = (t or "").split(" ") if t else []
        n = len(toks)
        if n == 0:
            continue
        # chunks at starts 0, stride, 2·stride, …; the LAST chunk is the
        # first whose window reaches the end → integer-exact count
        n_chunks = 1 + max(0, -(-(n - chunk_tokens) // stride))
        for i in range(n_chunks):
            s = i * stride
            w = toks[s : s + chunk_tokens]
            o_id.append(did)
            o_idx.append(i)
            o_txt.append(" ".join(w))
            o_n.append(len(w))
    return pa.table(
        {
            "doc_id": pa.array(o_id, pa.int64()),
            "chunk_idx": pa.array(o_idx, pa.int64()),
            "chunk_text": pa.array(o_txt, pa.string()),
            "n_tokens": pa.array(o_n, pa.int64()),
        }
    )


def chunk_documents(
    docs: "ray.data.Dataset", chunk_tokens: int = 64, overlap: int = 16
) -> "ray.data.Dataset":
    """Overlapping token windows per document (stride = chunk − overlap):
    (doc_id, chunk_idx, chunk_text, n_tokens). Empty docs emit no chunks;
    every chunk has exactly ``chunk_tokens`` tokens except the last."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    return docs.map_batches(
        _chunk_fn,
        fn_kwargs={"chunk_tokens": chunk_tokens, "stride": chunk_tokens - overlap},
        batch_format="pyarrow",
    )


# --------------------------------------------- distributed ordered prefix sum


def segmented_prefix_sum(
    ds: "ray.data.Dataset",
    part_col: str,
    order_col: str,
    val_col: str,
    out_col: str = "prefix",
) -> "ray.data.Dataset":
    """EXCLUSIVE prefix sum of ``val_col`` per ``part_col`` in ``order_col``
    order — the distributed scan primitive (SQL: ``sum(v) OVER (PARTITION BY
    p ORDER BY o ROWS UNBOUNDED PRECEDING) - v``).

    Shape (the sessionize/asof segmented-scan pattern, reference analog:
    the per-strain ordered ID-graph passes in gene_id_graph.py): one global
    range-partitioned sort on (part, order) → per-block vectorized exclusive
    cumsum → each block emits ONE summary row per (part, block) carrying the
    segment's total (block-count-bounded, ≤ #parts-touching-the-block rows)
    → summaries broadcast once → a second stateless pass adds, per row, the
    totals of all earlier blocks' segments of its part. No partition ever
    funnels through one task; a hot part costs its sorted-block share.

    Precondition: ``order_col`` values are unique within a part (they break
    the sort deterministically and order the block segments)."""
    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))
    part_t, order_t = typ[part_col], typ[order_col]
    names = list(sch.names)

    def local_scan(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [(n, typ[n]) for n in names]
                + [(out_col, pa.int64()), ("_seg_first", order_t)]
            ).empty_table()
        parts = t.column(part_col).to_numpy(zero_copy_only=False)
        vals = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(parts)
        new_p = np.ones(n, dtype=bool)
        new_p[1:] = parts[1:] != parts[:-1]
        cum = np.cumsum(vals) - vals  # global exclusive cumsum
        seg_start = np.maximum.accumulate(np.where(new_p, np.arange(n), 0))
        local = cum - cum[seg_start]  # per-part exclusive cumsum
        order_np = t.column(order_col).to_numpy(zero_copy_only=False)
        return t.append_column(out_col, pa.array(local, pa.int64())).append_column(
            "_seg_first", pa.array(order_np[seg_start], order_t)
        )

    def seg_summary(t: pa.Table) -> pa.Table:
        """One row per (part, block segment): its first order key + total."""
        empty = pa.schema(
            [(part_col, part_t), ("_seg_first", order_t), ("_seg_total", pa.int64())]
        ).empty_table()
        if t.num_columns == 0 or t.num_rows == 0:
            return empty
        parts = t.column(part_col).to_numpy(zero_copy_only=False)
        vals = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(parts)
        new_p = np.ones(n, dtype=bool)
        new_p[1:] = parts[1:] != parts[:-1]
        starts = np.flatnonzero(new_p)
        ends = np.append(starts[1:], n)
        totals = np.add.reduceat(vals, starts)
        order_np = t.column(order_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                part_col: pa.array(parts[starts], part_t),
                "_seg_first": pa.array(order_np[starts], order_t),
                "_seg_total": pa.array(totals.astype(np.int64)),
            }
        )

    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import drop_empty_blocks

    OUT_SCHEMA = pa.schema([(n, typ[n]) for n in names] + [(out_col, pa.int64())])
    sorted_ds = ds.sort([part_col, order_col]).materialize()
    scanned = sorted_ds.map_batches(
        local_scan, batch_format="pyarrow", batch_size=None
    )
    summ_tbl = pa.concat_tables(
        [
            b
            for b in sorted_ds.map_batches(
                seg_summary, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        or [
            pa.schema(
                [
                    (part_col, part_t),
                    ("_seg_first", order_t),
                    ("_seg_total", pa.int64()),
                ]
            ).empty_table()
        ]
    ).combine_chunks()
    summ_ref = broadcast(summ_tbl)

    def _offsets(ref):
        """part → (sorted seg_first array, exclusive-prefix totals)."""
        tbl = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        out: dict = {}
        if tbl.num_rows == 0:
            return out
        tbl = tbl.sort_by([(part_col, "ascending"), ("_seg_first", "ascending")])
        parts = tbl.column(part_col).to_numpy(zero_copy_only=False)
        firsts = tbl.column("_seg_first").to_numpy(zero_copy_only=False)
        totals = tbl.column("_seg_total").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(
            np.concatenate(([True], parts[1:] != parts[:-1], [True]))
        )
        for a, b in zip(bounds[:-1], bounds[1:]):
            seg_tot = totals[a:b]
            out[parts[a]] = (
                firsts[a:b],
                np.concatenate(([0], np.cumsum(seg_tot)[:-1])),
            )
        return out

    def add_offsets(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        index = task_state(state_key("psum", summ_ref), lambda: _offsets(summ_ref))
        parts = t.column(part_col).to_numpy(zero_copy_only=False)
        firsts = t.column("_seg_first").to_numpy(zero_copy_only=False)
        local = t.column(out_col).to_numpy(zero_copy_only=False)
        off = np.zeros(len(parts), dtype=np.int64)
        for p in np.unique(parts):
            seg_firsts, seg_off = index[p]
            m = parts == p
            j = np.searchsorted(seg_firsts, firsts[m])
            off[m] = seg_off[j]
        return t.drop_columns(["_seg_first", out_col]).append_column(
            out_col, pa.array(local + off, pa.int64())
        )

    return drop_empty_blocks(
        scanned.map_batches(add_offsets, batch_format="pyarrow", batch_size=None),
        OUT_SCHEMA,
    )


# ---------------------------------------------------------------- packing


def pack_sequences(
    docs: "ray.data.Dataset",
    budget_tokens: int = 512,
    n_shards: int = 64,
) -> "ray.data.Dataset":
    """Assign each document to a training pack: (doc_id, n_tokens, shard,
    pack_idx) with ``shard = doc_id % n_shards`` and ``pack_idx =
    tokens_before_in_shard // budget`` over ``doc_id`` order — deterministic
    at any parallelism, restart-stable, and streaming (the prefix sum is the
    only coordination, and it is block-summary-bounded). Pack boundaries are
    where a writer later concatenates token streams; a doc larger than the
    budget still gets exactly one pack (packs are closed by cumulative
    count, the standard greedy-fill contract)."""

    def annotate(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = np.fromiter(
            (len(x.split(" ")) if x else 0 for x in texts),
            dtype=np.int64,
            count=len(texts),
        )
        ids = (
            pc.cast(t.column("doc_id"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(n),
                "shard": pa.array(ids % n_shards),
            }
        )

    annotated = docs.map_batches(annotate, batch_format="pyarrow")
    summed = segmented_prefix_sum(
        annotated, "shard", "doc_id", "n_tokens", out_col="_before"
    )

    def finish(t: pa.Table) -> pa.Table:
        before = t.column("_before").to_numpy(zero_copy_only=False)
        return t.drop_columns(["_before"]).append_column(
            "pack_idx", pa.array(before // budget_tokens, pa.int64())
        )

    return summed.map_batches(finish, batch_format="pyarrow")


# ----------------------------------------------------------- inverted index


def inverted_index(
    docs: "ray.data.Dataset", max_postings: int = 50, min_df: int = 1
) -> "ray.data.Dataset":
    """Term → document posting lists: (term, df, postings, truncated) with
    ``postings`` = the first ``max_postings`` doc_ids in ascending order as
    a comma-joined string (hash-stable across engines) and ``df`` the TRUE
    document frequency — so truncation is visible, never silent.

    Scale shape: per-doc distinct (term, doc) pairs are a pure per-batch
    flat map (a doc's text is one row — no tf shuffle); global distinct and
    df ride fastagg; the posting cap applies BEFORE the string-collect via
    the hot-key-safe global-sort ``ranked_over`` (a stopword appearing in
    every document costs the collect at most ``max_postings`` rows, and its
    overflow is reported through ``df``/``truncated``, mirroring the LSH
    bucket-cap contract in ``dedup.lsh_candidate_pairs``)."""
    import pandas as pd

    from .fastagg import drop_empty_blocks, sorted_distinct, sorted_grouped_agg
    from .joins import hash_join
    from .relational import ranked_over, sorted_collect

    def pairs_fn(batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas()
        ids = batch.column("doc_id").to_pandas()
        ex = s.str.split(" ").explode()
        frame = pd.DataFrame(
            {"term": ex.to_numpy(), "doc_id": ids.reindex(ex.index).to_numpy()}
        )
        frame = frame[frame["term"].notna() & (frame["term"] != "")]
        frame = frame.drop_duplicates()
        return pa.table(
            {
                "term": pa.array(frame["term"].astype(str), pa.string()),
                "doc_id": pa.array(frame["doc_id"].to_numpy(), pa.int64()),
            }
        )

    pairs = sorted_distinct(
        docs.map_batches(pairs_fn, batch_format="pyarrow"), ["term", "doc_id"]
    ).materialize()  # consumed by df AND the ranked posting path
    df = sorted_grouped_agg(pairs, ["term"], [("doc_id", "count")], out_names=["df"])
    ranked = ranked_over(pairs, ["term"], [("doc_id", True)], rank_col="_rk")
    kept = ranked.map_batches(
        lambda t: t.filter(pc.less_equal(t.column("_rk"), max_postings)).drop_columns(
            ["_rk"]
        )
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )
    postings = sorted_collect(kept, ["term"], "doc_id", [("doc_id", "postings")])

    joined = hash_join(drop_empty_blocks(df), drop_empty_blocks(postings), on=("term",))

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("df"), min_df))
        return t.append_column(
            "truncated", pc.greater(t.column("df"), max_postings)
        )

    return joined.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------- redaction

# RE2-safe patterns (no backrefs/lookaround) so the DuckDB twin is exact.
DEFAULT_REDACTIONS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._]+@[a-zA-Z0-9.]+\.[a-z]{2,}", "<EMAIL>"),
    ("long_digits", r"[0-9]{7,}", "<NUM>"),
    ("hex_id", r"0x[0-9a-f]{6,}", "<HEX>"),
]


class Redactor:
    """Compiled-once pattern scrubber with per-pattern audit counts: output
    is (doc_id, clean_text, n_<name> per pattern, n_redactions). Patterns
    apply in list order, each over the PREVIOUS pattern's output — the same
    composition the SQL twin uses (nested regexp_replace)."""

    def __init__(self, patterns=None) -> None:
        self.patterns = [
            (name, re.compile(rx), repl)
            for name, rx, repl in (patterns or DEFAULT_REDACTIONS)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts = {name: np.zeros(len(texts), dtype=np.int64) for name, _, _ in self.patterns}
        out = []
        for i, t in enumerate(texts):
            t = t or ""
            for name, rx, repl in self.patterns:
                t, n = rx.subn(repl, t)
                counts[name][i] = n
            out.append(t)
        cols = {
            "doc_id": batch.column("doc_id"),
            "clean_text": pa.array(out, pa.string()),
        }
        total = np.zeros(len(texts), dtype=np.int64)
        for name, _, _ in self.patterns:
            cols[f"n_{name}"] = pa.array(counts[name])
            total += counts[name]
        cols["n_redactions"] = pa.array(total)
        return pa.table(cols)


def redact_patterns(
    docs: "ray.data.Dataset", patterns=None, **mb
) -> "ray.data.Dataset":
    from ..state.broadcast import task_state

    key = tuple(patterns or DEFAULT_REDACTIONS)

    def fn(batch: pa.Table) -> pa.Table:
        inst = task_state(("redactor", key), lambda: Redactor(patterns))
        return inst(batch)

    return docs.map_batches(fn, batch_format="pyarrow", **mb)


# ----------------------------------------------------- decontamination


def benchmark_shingle_set(
    docs: "ray.data.Dataset",
    k_shingle: int = 3,
    bench_mod: int = 101,
    bench_rem: int = 7,
) -> frozenset:
    """Distinct k-token shingles of the benchmark/eval docs (``doc_id %
    bench_mod == bench_rem``), collected to the driver. Bounded by
    definition: eval suites are a few MB even when the corpus is 100 TB, so
    a driver-side set + ``ray.put`` broadcast is the right side to collapse
    (same small-side rule as the alias index in stages/link.py). The
    benchmark filter is fused into the shingle fn — a separate filter stage
    would emit zero-row blocks whose skipped UDF keeps the input schema.
    Each batch emits its DISTINCT shingles only."""
    from ..functions.textfn import shingle_explode

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array((ids % bench_mod) == bench_rem))
        _, sh = shingle_explode(batch.column("text"), k_shingle)
        return pa.table({"shingle": sh.unique()})

    parts = ray.get(
        docs.map_batches(explode, batch_format="pyarrow").to_arrow_refs()
    )
    acc: set[str] = set()
    for t in parts:
        acc.update(t.column("shingle").to_pylist())
    return frozenset(acc)


def decontaminate(
    docs: "ray.data.Dataset",
    k_shingle: int = 3,
    bench_mod: int = 101,
    bench_rem: int = 7,
) -> "ray.data.Dataset":
    """Benchmark-overlap decontamination (the GPT-3/Pile n-gram rule): a doc
    is contaminated when any of its k-token shingles appears in the
    benchmark set (here: docs with ``doc_id % bench_mod == bench_rem``,
    standing in for the eval suites a real run would load).

    Shape: benchmark shingles are broadcast ONCE (``ray.put``); the corpus
    flows through a single stateless ``map_batches`` probe — per-doc distinct
    shingles + set-membership hits, zero shuffle, nothing corpus-sized ever
    leaves a task. Output: (doc_id, n_ngrams, n_hits, contaminated) for every
    non-benchmark doc with ≥ k normalized tokens.

    Reference analog: the skip/filter rules of the row extractors
    (annotation_utils.py's skip_value patterns) — a filter with an audit
    column, never a silent drop."""
    from ..functions.textfn import shingle_explode

    bench_ref = ray.put(
        pa.array(
            sorted(benchmark_shingle_set(docs, k_shingle, bench_mod, bench_rem)),
            pa.string(),
        )
    )

    EMPTY = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_ngrams", pa.int64()),
            ("n_hits", pa.int64()),
            ("contaminated", pa.bool_()),
        ]
    )

    def probe(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids_all = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array((ids_all % bench_mod) != bench_rem))
        # batch-wide vectorized explode; per-doc DISTINCT via a pandas
        # hash drop_duplicates; membership via the Arrow is_in kernel
        # against the broadcast benchmark array — no per-doc Python loop
        doc_idx, sh = shingle_explode(batch.column("text"), k_shingle)
        if len(doc_idx) == 0:
            return EMPTY.empty_table()
        import pandas as pd

        df = pd.DataFrame(
            {"d": doc_idx, "s": sh.to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        hit = pc.is_in(
            pa.array(df["s"].to_numpy(), pa.string()), value_set=ray.get(bench_ref)
        ).to_numpy(zero_copy_only=False)
        d = df["d"].to_numpy()
        nrows = batch.num_rows
        n_per_doc = np.bincount(d, minlength=nrows)
        h_per_doc = np.bincount(d, weights=hit.astype(np.float64), minlength=nrows)
        keep = n_per_doc > 0  # < k tokens: no shingles on either side
        hits = pa.array(h_per_doc[keep].astype(np.int64), pa.int64())
        return pa.table(
            {
                "doc_id": pc.cast(
                    batch.column("doc_id").filter(pa.array(keep)), pa.int64()
                ),
                "n_ngrams": pa.array(n_per_doc[keep].astype(np.int64), pa.int64()),
                "n_hits": hits,
                "contaminated": pc.greater(hits, 0),
            }
        )

    return docs.map_batches(probe, batch_format="pyarrow")


# ------------------------------------------------- repetition / quality


# Gopher-style repetition thresholds, in ppm of the respective denominator:
# a doc is flagged when its single most-common token is ≥ 20% of all tokens
# or ≥ 20% of its 2-gram occurrences are occurrences of repeated 2-grams.
REP_TOP_WORD_PPM = 200_000
REP_DUP_2GRAM_PPM = 200_000


def doc_repetition_stats(
    docs: "ray.data.Dataset", threshold_top_ppm: int = REP_TOP_WORD_PPM,
    threshold_dup_ppm: int = REP_DUP_2GRAM_PPM,
) -> "ray.data.Dataset":
    """Per-doc repetition signals (the Gopher repetition-filter family):
    (doc_id, n_tokens, top_word_ppm, dup_2gram_ppm, flagged) over normalized
    tokens. ppm values are exact integer arithmetic
    (``(1_000_000 * count) // total``) so the DuckDB twin matches bit-for-bit
    with no float rounding. Pure per-batch map — each doc's counters live and
    die inside its batch; zero shuffle, zero state.

    Empty normalized docs are excluded (both sides); docs with < 2 tokens
    have no 2-grams → dup_2gram_ppm = 0."""
    from collections import Counter

    from ..functions.textfn import normalize_ws_lower

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = normalize_ws_lower(batch.column("text")).to_pylist()
        o_id, o_n, o_top, o_dup = [], [], [], []
        for d, t in zip(ids, texts):
            if not t:
                continue
            toks = t.split(" ")
            n = len(toks)
            wc = Counter(toks)
            o_id.append(d)
            o_n.append(n)
            o_top.append((1_000_000 * max(wc.values())) // n)
            if n >= 2:
                gc = Counter(zip(toks, toks[1:]))
                tot = n - 1
                dup = sum(c for c in gc.values() if c >= 2)
                o_dup.append((1_000_000 * dup) // tot)
            else:
                o_dup.append(0)
        top = pa.array(o_top, pa.int64())
        dup = pa.array(o_dup, pa.int64())
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "n_tokens": pa.array(o_n, pa.int64()),
                "top_word_ppm": top,
                "dup_2gram_ppm": dup,
                "flagged": pc.or_(
                    pc.greater_equal(top, threshold_top_ppm),
                    pc.greater_equal(dup, threshold_dup_ppm),
                ),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def chunk_dup_stats(
    docs: "ray.data.Dataset", chunk_tokens: int = 16, overlap: int = 4
) -> "ray.data.Dataset":
    """Context-window-granularity dedup audit: chunk every document with
    ``chunk_documents``, fingerprint each chunk (md5 60-bit — the
    ``_hash60`` kernel, bit-identical in the twin), and emit every
    duplicated chunk as (chunk_hash, n_occ, n_docs). Whole-doc dedup
    (``dedup.exact``/minhash) misses boilerplate that repeats INSIDE
    otherwise-unique documents — headers, license blocks, navigation —
    which is exactly what leaks into training windows after packing; this
    is the audit that finds it (the RefinedWeb/Gopher line-dedup shape at
    window granularity).

    Scale shape: chunking is a stateless flat map; one (hash, doc) fastagg
    collapses within-doc repeats; one hash-cardinality fastagg derives
    BOTH totals (n_occ = Σ pair counts, n_docs = pair rows) — two shuffle
    waves over pre-combined cells, no raw chunk text past the hash."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .sampling import _hash60

    H = pa.schema([("chunk_hash", pa.int64()), ("doc_id", pa.int64()), ("_one", pa.int64())])

    def hash_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return H.empty_table()
        h = _hash60(t.column("chunk_text"), "chunk")
        return pa.Table.from_arrays(
            [
                pa.array(h, pa.int64()),
                pc.cast(t.column("doc_id"), pa.int64()),
                pa.array(np.ones(t.num_rows, np.int64)),
            ],
            schema=H,
        )

    chunks = chunk_documents(docs, chunk_tokens=chunk_tokens, overlap=overlap)
    pairs = sorted_grouped_agg(
        drop_empty_blocks(chunks.map_batches(hash_fn, batch_format="pyarrow"), H),
        ["chunk_hash", "doc_id"],
        [("_one", "sum")],
        out_names=["n"],
    )
    agg = sorted_grouped_agg(
        pairs,
        ["chunk_hash"],
        [("n", "sum"), ("n", "count")],
        out_names=["n_occ", "n_docs"],
    )
    OUT = pa.schema(
        [("chunk_hash", pa.int64()), ("n_occ", pa.int64()), ("n_docs", pa.int64())]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        t = t.filter(pc.greater(t.column("n_occ"), 1))
        return pa.Table.from_arrays(
            [
                pc.cast(t.column("chunk_hash"), pa.int64()),
                pc.cast(t.column("n_occ"), pa.int64()),
                pc.cast(t.column("n_docs"), pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(agg.map_batches(final, batch_format="pyarrow"), OUT)
