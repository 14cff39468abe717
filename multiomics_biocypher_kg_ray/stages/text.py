"""Text-analysis operators over a document table — token counting, quality
scoring, heuristic language-ID, fingerprinting.

These are the training-data-pipeline extensions beyond the reference's own
operator set (the reference's nearest analogs are the string-transform
registry, ``annotation_transforms.py``, and the identifier-style rejection
regex, ``build_gene_annotations.py:31-34``). All stages are stateful
``map_batches`` classes: regexes/stopword sets compile once per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.textfn import STOPWORDS, md5_hex

# BPE-ish token pattern: letter runs, digit runs, single non-space symbols.
BPE_TOKEN_RE = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]"


class TextStats:
    """Per-doc stats: whitespace tokens, BPE-ish tokens, alpha/punct/stopword
    ratios and an integer quality score. All integer/ratio math is defined so
    a SQL oracle reproduces it exactly (ratios = integer counts divided by
    integer counts in float64)."""

    def __init__(self) -> None:
        self.bpe = re.compile(BPE_TOKEN_RE)
        self.stop = frozenset(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_ws = np.empty(len(texts), dtype=np.int64)
        n_bpe = np.empty(len(texts), dtype=np.int64)
        n_stop = np.empty(len(texts), dtype=np.int64)
        n_chars = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            t = t or ""  # NULL text → empty-string semantics (oracle parity)
            toks = t.split(" ") if t else []
            n_ws[i] = len(toks)
            n_bpe[i] = len(self.bpe.findall(t))
            n_stop[i] = sum(1 for w in toks if w in self.stop)
            n_chars[i] = len(t)
        stop_ratio = np.where(n_ws > 0, n_stop / np.maximum(n_ws, 1), 0.0)
        # quality: integer score 0-3 (annotation_quality 0-3 bucket analog,
        # post-import.cypher:572-678): +1 each for ≥20 tokens, ≥100 chars,
        # stopword ratio ≥ 0.05
        quality = (
            (n_ws >= 20).astype(np.int64)
            + (n_chars >= 100).astype(np.int64)
            + (stop_ratio >= 0.05).astype(np.int64)
        )
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(n_ws),
                pa.array(n_bpe),
                pa.array(n_stop),
                pa.array(n_chars),
                pa.array(stop_ratio, pa.float64()),
                pa.array(quality),
            ],
            names=[
                "doc_id",
                "n_tokens",
                "n_bpe_tokens",
                "n_stopwords",
                "n_chars",
                "stop_ratio",
                "quality",
            ],
        )


class QualityFilter:
    """Corpus quality gate on top of ``TextStats``: keep/drop decision plus a
    comma-joined reason string naming every failed check — the side-channel a
    100 TB filtering run needs to audit WHY documents were dropped (mirrors
    the engine's no-silent-drops rule: reports, not disappearances). Reasons
    are built with three vectorized numpy passes; the DuckDB twin uses
    ``concat_ws`` (which skips NULL parts, matching the numpy join exactly).
    """

    def __init__(self, min_quality: int = 2) -> None:
        self.stats = TextStats()
        self.min_quality = min_quality

    def __call__(self, batch: pa.Table) -> pa.Table:
        st = self.stats(batch)
        n_ws = st.column("n_tokens").to_numpy()
        n_chars = st.column("n_chars").to_numpy()
        stop_ratio = st.column("stop_ratio").to_numpy()
        quality = st.column("quality").to_numpy()
        reason = np.full(len(st), "", dtype=object)
        for name, fail in (
            ("short_tokens", n_ws < 20),
            ("short_chars", n_chars < 100),
            ("low_stopword", stop_ratio < 0.05),
        ):
            add = np.where(reason != "", "," + name, name)
            reason = np.where(fail, np.char.add(reason.astype(str), add), reason)
        return pa.Table.from_arrays(
            [
                st.column("doc_id"),
                st.column("quality"),
                pa.array(quality >= self.min_quality),
                pa.array(reason.astype(str), pa.string()),
            ],
            names=["doc_id", "quality", "keep", "reason"],
        )


class LangId:
    """Deterministic n-gram/stopword-count language heuristic.

    The synthetic corpus shares one vocabulary across the ``lang`` labels, so
    this cannot be *accurate* — it is a deterministic, oracle-reproducible
    scoring function with the real production shape (marker-token counting
    per language, argmax with a fixed tie order)."""

    MARKERS = {
        "en": ("the", "a"),
        "query": ("query", "table", "join"),
        "stream": ("stream", "window", "batch"),
    }

    def __init__(self) -> None:
        self.markers = {k: frozenset(v) for k, v in self.MARKERS.items()}
        self.order = sorted(self.markers)  # fixed tie order

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        guesses = []
        for t in texts:
            toks = t.split(" ") if t else []
            best_lang, best_n = "und", 0
            for lang in self.order:
                n = sum(1 for w in toks if w in self.markers[lang])
                if n > best_n:  # strict > keeps first-in-order on ties
                    best_lang, best_n = lang, n
            guesses.append(best_lang)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(guesses, pa.string())],
            names=["doc_id", "lang_guess"],
        )


class Fingerprint:
    """Document fingerprints: md5 of the normalized text (DuckDB-matchable)
    plus a rolling polynomial hash (engine-only, pytest-verified)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.textfn import normalize_ws_lower, rolling_fingerprint

        norm = normalize_ws_lower(batch.column("text"))
        texts = norm.to_pylist()
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(md5_hex(texts), pa.string()),
                pa.array(
                    [rolling_fingerprint(t or "") for t in texts], pa.int64()
                ),  # mod 2^61-1 → always fits int64
            ],
            names=["doc_id", "fingerprint_md5", "fingerprint_roll"],
        )


def _apply_cls(batch: pa.Table, cls) -> pa.Table:
    from ..state.broadcast import task_state

    return task_state(cls, cls)(batch)


def text_stats(docs: "ray.data.Dataset", **mb) -> "ray.data.Dataset":
    # task-based with per-worker memoized state: fuses with the read, no
    # actor-pool startup (see stages/extract.py for the rationale)
    return docs.map_batches(
        _apply_cls, fn_kwargs={"cls": TextStats}, batch_format="pyarrow", **mb
    )


def lang_id(docs: "ray.data.Dataset", **mb) -> "ray.data.Dataset":
    return docs.map_batches(
        _apply_cls, fn_kwargs={"cls": LangId}, batch_format="pyarrow", **mb
    )


def fingerprints(docs: "ray.data.Dataset", **mb) -> "ray.data.Dataset":
    return docs.map_batches(
        _apply_cls, fn_kwargs={"cls": Fingerprint}, batch_format="pyarrow", **mb
    )


def _quality_fn(batch: pa.Table, min_quality: int) -> pa.Table:
    from ..state.broadcast import task_state

    inst = task_state(
        ("qualityfilter", min_quality), lambda: QualityFilter(min_quality)
    )
    return inst(batch)


def quality_filter(
    docs: "ray.data.Dataset", min_quality: int = 2, **mb
) -> "ray.data.Dataset":
    return docs.map_batches(
        _quality_fn,
        fn_kwargs={"min_quality": min_quality},
        batch_format="pyarrow",
        **mb,
    )


def vocab_top_terms(
    docs: "ray.data.Dataset", k: int = 50
) -> "ray.data.Dataset":
    """Corpus vocabulary: global top-k terms by frequency (term, n) with
    deterministic (n desc, term asc) ordering — the classic wide-shuffle-
    with-combiner: per-batch token counts shrink the exchange to distinct
    terms per batch; the final groupby moves pre-combined counts only."""
    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas()
        counts = (
            s.str.split(" ").explode().replace("", None).dropna().value_counts()
        )
        return pa.table(
            {
                "term": pa.array(counts.index.astype(str), pa.string()),
                "n": pa.array(counts.to_numpy(), pa.int64()),
            }
        )

    # term-cardinality groups (real vocabularies reach 10^7+) → Arrow-native
    from .fastagg import sorted_grouped_agg

    counted = sorted_grouped_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["term"],
        [("n", "sum")],
        out_names=["n"],
    )
    return counted.sort(["n", "term"], descending=[True, False]).limit(k)


def doc_tfidf_top_terms(
    docs: "ray.data.Dataset", n_docs: int, k: int = 5
) -> "ray.data.Dataset":
    """Per-document top-``k`` terms by tf-idf (tf · ln(N/df)) — the feature-
    extraction step of classic relevance scoring / keyword tagging over a
    training corpus. Scale contract: a document's text is one row, so exact
    per-doc term counts are a pure per-batch flat map (no tf shuffle at
    all); document frequencies aggregate through fastagg (term-cardinality
    groups); the score join moves pre-counted (doc, term, tf) rows only;
    the final top-k uses the hot-key-safe global-sort ``ranked_over``, never
    a whole-group task. ``n_docs`` is the corpus size N (callers usually
    have it from a metadata count — pass it in rather than forcing an extra
    pass here).
    """
    import numpy as np

    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join
    from .relational import ranked_over

    def tf_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = batch.column("text").to_pandas()
        ids = batch.column("doc_id").to_pandas()
        ex = s.str.split(" ").explode()
        frame = pd.DataFrame(
            {"doc_id": ids.reindex(ex.index).to_numpy(), "term": ex.to_numpy()}
        )
        frame = frame[frame["term"].notna() & (frame["term"] != "")]
        g = frame.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "term": pa.array(g["term"].astype(str), pa.string()),
                "tf": pa.array(g["tf"].to_numpy(), pa.int64()),
            }
        )

    tf = docs.map_batches(tf_partial, batch_format="pyarrow").materialize()
    # each (doc, term) appears exactly once above → df = rows per term
    df = sorted_grouped_agg(tf, ["term"], [("tf", "count")], out_names=["df"])

    scored = hash_join(drop_empty_blocks(tf), drop_empty_blocks(df), on=("term",))

    def score(batch: pa.Table) -> pa.Table:
        tf_v = batch.column("tf").to_numpy().astype(np.float64)
        df_v = batch.column("df").to_numpy().astype(np.float64)
        # tfidf quantized to an integer micro-score: numpy's and DuckDB's ln
        # differ in the last ulp, so the float itself can never be part of
        # the compared output or the rank key — floor(score·10⁶) is
        # bit-stable across engines (the sampling-oracle PRECISION trick)
        q = np.floor(tf_v * np.log(float(n_docs) / df_v) * 1e6).astype(np.int64)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("term"),
                batch.column("tf"),
                batch.column("df"),
                pa.array(q, pa.int64()),
            ],
            names=["doc_id", "term", "tf", "df", "tfidf_q"],
        )

    ranked = ranked_over(
        scored.map_batches(score, batch_format="pyarrow"),
        ["doc_id"],
        [("tfidf_q", False), ("term", True)],
        rank_col="_rk",
    )
    import pyarrow.compute as pc

    def topk(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t.column("_rk"), k)).drop_columns(["_rk"])

    return ranked.map_batches(topk, batch_format="pyarrow")


def doc_unigram_score(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-document mean corpus-frequency of its tokens, in ppm — the
    unigram-LM quality signal of CCNet-style corpus filtering (documents
    made of globally rare tokens score low: gibberish, encoding damage,
    tag soup). Emits (doc_id, n_tokens, mean_freq_ppm).

    Exactness: each token's corpus frequency quantizes FIRST —
    floor(n_term · 10⁶ / total_tokens) as int64, identical double ops on
    both engines — and per-doc sums are integer, so mean = int_sum / n is
    bit-stable at any partitioning (no log/float accumulates anywhere).

    Scale shape: term counts run through the per-batch-combiner + fastagg
    path (vocab-cardinality groups); the (term → ppm) table is
    vocab-bounded and broadcasts once (documented assumption: unigram
    vocabularies are 10⁶–10⁸ entries ≈ ≤ GBs — the same budget as the
    alias dictionary); scoring is a single stateless pass with an Arrow
    ``index_in`` probe per batch. The corpus flows twice, never shuffles
    raw text."""
    import pandas as pd

    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import sorted_grouped_agg

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas()
        counts = (
            s.str.split(" ").explode().replace("", None).dropna().value_counts()
        )
        return pa.table(
            {
                "term": pa.array(counts.index.astype(str), pa.string()),
                "n": pa.array(counts.to_numpy(), pa.int64()),
            }
        )

    counted = sorted_grouped_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["term"],
        [("n", "sum")],
        out_names=["n"],
    )
    freq_tbl = pa.concat_tables(
        [
            b
            for b in counted.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns
        ]
    ).combine_chunks()
    total = int(pa.compute.sum(freq_tbl.column("n")).as_py() or 0)
    ppm = np.floor(
        freq_tbl.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        * 1_000_000.0
        / max(total, 1)
    ).astype(np.int64)
    freq_ref = broadcast(
        pa.table({"term": freq_tbl.column("term"), "ppm": pa.array(ppm)})
    )

    OUT = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("mean_freq_ppm", pa.float64())]
    )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return OUT.empty_table()

        def build():
            tb = ray.get(freq_ref) if not isinstance(freq_ref, pa.Table) else freq_ref
            return (tb.column("term").combine_chunks(), tb.column("ppm").to_numpy(zero_copy_only=False))

        terms_arr, ppm_arr = task_state(state_key("unigram", freq_ref), build)
        s = batch.column("text").to_pandas()
        ex = s.str.split(" ").explode().replace("", None).dropna()
        if not len(ex):
            return OUT.empty_table()
        flat = pa.array(ex.to_numpy(), pa.string())
        pos = pa.compute.index_in(flat, value_set=terms_arr).to_numpy(
            zero_copy_only=False
        )
        tok_ppm = np.where(np.isnan(pos.astype(np.float64)), 0, ppm_arr[np.nan_to_num(pos).astype(np.int64)])
        row_of = ex.index.to_numpy()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # segment-sum per source row (explode preserves row order)
        change = np.ones(len(row_of), dtype=bool)
        change[1:] = row_of[1:] != row_of[:-1]
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(tok_ppm.astype(np.int64), starts)
        lens = np.diff(np.append(starts, len(row_of)))
        return pa.table(
            {
                "doc_id": pa.array(ids[row_of[starts]], pa.int64()),
                "n_tokens": pa.array(lens.astype(np.int64)),
                "mean_freq_ppm": pa.array(sums.astype(np.float64) / lens),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def bm25_topk(
    docs: "ray.data.Dataset",
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> "ray.data.Dataset":
    """Top-``k`` documents by BM25 relevance for a bag of ``query_terms`` —
    the lexical retrieval primitive of corpus curation (pull training docs
    matching a topic, rank contamination candidates, build eval slices).
    Emits (doc_id, bm25_q, n_terms) with bm25_q = Σ_t floor(idf·tf-sat·10⁶)
    summed as integers, so the ranking is bit-stable at any partitioning
    (the tfidf PRECISION trick — floats never cross engines or tasks).

    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  [Robertson–Spärck Jones,
    the +1 variant that never goes negative]; tf-sat = tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)).

    Scale shape: ONE pass over the corpus emits per-doc sentinel rows
    (doc_id, dl) plus (doc_id, term, tf, dl) for query terms only — text
    never shuffles, tf is a pure per-batch flat map like
    ``doc_tfidf_top_terms``. Corpus stats (N, avgdl) reduce from
    block-count-bounded partials; df is |query_terms|-bounded and collected
    once; scoring is a stateless vectorized pass; the per-doc sum groups
    only docs that matched ≥1 term. Reference analog: the alias-scored
    entity search in `multiomics_kg/entity_linking.py` (best-match ranking
    over a term dictionary), re-expressed as corpus-level retrieval.
    """
    import pyarrow.compute as pc

    from .fastagg import sorted_grouped_agg

    terms = sorted(set(query_terms))
    if "" in query_terms or not terms:
        raise ValueError("query_terms must be non-empty, without ''")

    ROWS = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("dl", pa.int64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return ROWS.empty_table()
        s = batch.column("text").to_pandas()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ex = s.str.split(" ").explode().replace("", None).dropna()
        dl = np.zeros(len(s), dtype=np.int64)
        if len(ex):
            rows_idx, cnt = np.unique(ex.index.to_numpy(), return_counts=True)
            dl[rows_idx] = cnt
        m = ex[ex.isin(terms)]
        if len(m):
            frame = pd.DataFrame(
                {"row": m.index.to_numpy(), "term": m.to_numpy()}
            )
            g = (
                frame.groupby(["row", "term"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            grow = g["row"].to_numpy()
            doc_col = np.concatenate([ids, ids[grow]])
            term_col = np.concatenate(
                [np.full(len(s), "", dtype=object), g["term"].to_numpy()]
            )
            tf_col = np.concatenate(
                [np.zeros(len(s), np.int64), g["tf"].to_numpy().astype(np.int64)]
            )
            dl_col = np.concatenate([dl, dl[grow]])
        else:
            doc_col, term_col, tf_col, dl_col = (
                ids,
                np.full(len(s), "", dtype=object),
                np.zeros(len(s), np.int64),
                dl,
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_col, pa.int64()),
                "term": pa.array(term_col, pa.string()),
                "tf": pa.array(tf_col, pa.int64()),
                "dl": pa.array(dl_col, pa.int64()),
            }
        )

    rows = docs.map_batches(prep, batch_format="pyarrow").materialize()

    # corpus stats from the one-sentinel-per-doc rows (block-bounded partials)
    n_docs, dl_sum = 0, 0
    for t in rows.map_batches(
        lambda t: pa.table(
            {
                "n": pa.array([t.filter(pc.equal(t.column("term"), "")).num_rows], pa.int64()),
                "s": pa.array(
                    [
                        int(
                            pc.sum(
                                t.filter(pc.equal(t.column("term"), "")).column("dl")
                            ).as_py()
                            or 0
                        )
                    ],
                    pa.int64(),
                ),
            }
        )
        if t.num_rows
        else pa.table({"n": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        if t.num_rows:
            n_docs += int(pc.sum(t.column("n")).as_py() or 0)
            dl_sum += int(pc.sum(t.column("s")).as_py() or 0)
    n = float(n_docs)
    avgdl = float(dl_sum) / n if n_docs else 1.0

    matched = rows.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("term"), ""))),
        batch_format="pyarrow",
    )
    df_parts = [
        bt
        for bt in sorted_grouped_agg(
            matched, ["term"], [("tf", "count")], out_names=["df"]
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if bt.num_columns and bt.num_rows
    ]
    df_map: dict[str, int] = {}
    if df_parts:
        df_tbl = pa.concat_tables(df_parts)
        df_map = dict(
            zip(df_tbl.column("term").to_pylist(), df_tbl.column("df").to_pylist())
        )
    term_arr = pa.array(terms, pa.string())
    df_arr = np.array([df_map.get(t, 0) for t in terms], dtype=np.float64)
    k1f, bf = float(k1), float(b)

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("sq", pa.int64())]
            ).empty_table()
        pos = pc.index_in(t.column("term"), value_set=term_arr).to_numpy(
            zero_copy_only=False
        )
        dfv = df_arr[pos.astype(np.int64)]
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        # float-op ORDER mirrors the SQL twin exactly (left-assoc * and /);
        # ln is the only last-ulp risk, same budget doc_tfidf_top_terms takes
        idf = np.log((n - dfv + 0.5) / (dfv + 0.5) + 1.0)
        denom = tf + k1f * ((1.0 - bf) + (bf * dl) / avgdl)
        sq = np.floor(idf * ((tf * (k1f + 1.0)) / denom) * 1000000.0).astype(
            np.int64
        )
        return pa.table({"doc_id": t.column("doc_id"), "sq": pa.array(sq)})

    agg = sorted_grouped_agg(
        matched.map_batches(score, batch_format="pyarrow"),
        ["doc_id"],
        [("sq", "sum"), ("sq", "count")],
        out_names=["bm25_q", "n_terms"],
    )
    return agg.sort(["bm25_q", "doc_id"], descending=[True, False]).limit(k)


def bigram_pmi(
    docs: "ray.data.Dataset", min_count: int = 5
) -> "ray.data.Dataset":
    """Corpus collocation mining: adjacent-token bigrams scored by PMI —
    (term_a, term_b, n_ab, pmi_q) with pmi_q = floor(ln(n_ab·T/(n_a·n_b))·10⁶),
    T = total bigram occurrences — the phrase detector (new-york,
    machine-learning) run before vocabulary freezing. Tokens are the same
    raw space-split stream as ``vocab_top_terms`` (empties dropped, so
    bigrams bridge runs of whitespace exactly like the SQL list_filter
    twin); only bigrams with ``n_ab >= min_count`` are emitted.

    Scale shape: per-batch bigram/unigram counts are compiled pandas
    groupbys (one row per distinct gram per batch — the combiner), both
    aggregate through fastagg at vocab cardinality; unigram counts join
    back onto the (min_count-filtered, much smaller) bigram table via two
    distributed hash joins; T gathers as one scalar per block. The only
    float is one ln over exact int64 products (the ``cooccurrence_pmi``
    last-ulp budget; n_ab·T must fit int64 — quantize/min_count
    accordingly at extreme corpus sizes)."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join

    BI = pa.schema(
        [("term_a", pa.string()), ("term_b", pa.string()), ("n_ab", pa.int64())]
    )

    def bi_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if batch.num_columns == 0 or batch.num_rows == 0:
            return BI.empty_table()
        texts = batch.column("text").to_pylist()
        a_out, b_out = [], []
        for t in texts:
            toks = [w for w in (t or "").split(" ") if w]
            a_out.extend(toks[:-1])
            b_out.extend(toks[1:])
        if not a_out:
            return BI.empty_table()
        g = (
            pd.DataFrame({"term_a": a_out, "term_b": b_out})
            .groupby(["term_a", "term_b"], sort=False)
            .size()
            .reset_index(name="n_ab")
        )
        return pa.Table.from_arrays(
            [
                pa.array(g["term_a"].to_numpy(), pa.string()),
                pa.array(g["term_b"].to_numpy(), pa.string()),
                pa.array(g["n_ab"].to_numpy(), pa.int64()),
            ],
            schema=BI,
        )

    bi = sorted_grouped_agg(
        docs.map_batches(bi_partial, batch_format="pyarrow"),
        ["term_a", "term_b"],
        [("n_ab", "sum")],
        out_names=["n_ab"],
    ).materialize()  # consumed twice: T scalar + candidate filter

    t_total = 0
    for b in bi.map_batches(
        lambda t: pa.table({"s": pa.array([int(pc.sum(t.column("n_ab")).as_py() or 0)], pa.int64())})
        if t.num_columns and t.num_rows
        else pa.table({"s": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_columns and b.num_rows:
            t_total += int(pc.sum(b.column("s")).as_py() or 0)

    cand = drop_empty_blocks(
        bi.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("n_ab"), min_count))
            if t.num_columns
            else t,
            batch_format="pyarrow",
        ),
        BI,
    )

    def uni_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        UNI = pa.schema([("term", pa.string()), ("n", pa.int64())])
        if batch.num_columns == 0 or batch.num_rows == 0:
            return UNI.empty_table()
        s = batch.column("text").to_pandas()
        counts = s.str.split(" ").explode().replace("", None).dropna().value_counts()
        return pa.Table.from_arrays(
            [
                pa.array(counts.index.astype(str), pa.string()),
                pa.array(counts.to_numpy(), pa.int64()),
            ],
            schema=UNI,
        )

    uni = sorted_grouped_agg(
        docs.map_batches(uni_partial, batch_format="pyarrow"),
        ["term"],
        [("n", "sum")],
        out_names=["n"],
    )

    def as_side(col_out: str, n_out: str):
        def f(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.schema(
                    [(col_out, pa.string()), (n_out, pa.int64())]
                ).empty_table()
            return t.rename_columns([col_out, n_out])

        return f

    side_a = drop_empty_blocks(
        uni.map_batches(as_side("term_a", "n_a"), batch_format="pyarrow")
    )
    side_b = drop_empty_blocks(
        uni.map_batches(as_side("term_b", "n_b"), batch_format="pyarrow")
    )
    J1 = pa.schema(
        [
            ("term_a", pa.string()),
            ("term_b", pa.string()),
            ("n_ab", pa.int64()),
            ("n_a", pa.int64()),
        ]
    )
    # a 0-row block out of join #1 loses its schema and breaks join #2
    j1 = drop_empty_blocks(hash_join(cand, side_a, on=("term_a",)), J1)
    j = hash_join(j1, side_b, on=("term_b",))

    OUT = pa.schema(
        [
            ("term_a", pa.string()),
            ("term_b", pa.string()),
            ("n_ab", pa.int64()),
            ("pmi_q", pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        n_ab = t.column("n_ab").to_numpy(zero_copy_only=False).astype(np.int64)
        n_a = t.column("n_a").to_numpy(zero_copy_only=False).astype(np.int64)
        n_b = t.column("n_b").to_numpy(zero_copy_only=False).astype(np.int64)
        # int products first, THEN one cast — the oracle's exact op order
        pmi = np.floor(
            np.log((n_ab * t_total).astype(np.float64) / (n_a * n_b).astype(np.float64))
            * 1000000.0
        ).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t.column("term_a"),
                t.column("term_b"),
                pa.array(n_ab, pa.int64()),
                pa.array(pmi, pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(j.map_batches(finalize, batch_format="pyarrow"), OUT)


def _edit_distance_le1(a: str, b: str) -> bool:
    """Exact test for levenshtein(a, b) <= 1 on distinct strings — O(len)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) <= 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is shorter by one: b must equal a with one insertion
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def term_fuzzy_pairs(
    docs: "ray.data.Dataset",
    min_count: int = 3,
    min_len: int = 4,
    cap: int = 1000,
    term_col: str | None = None,
) -> "ray.data.Dataset":
    """Fuzzy vocabulary self-join: pairs of corpus terms within edit
    distance 1 → (term_a, term_b) — the typo/variant detector behind entity
    alias discovery and spell-normalization of extracted mentions
    (reference analog: the alias/synonym reconciliation of the entity
    linker, ``SURVEY §2.3`` ST1, discovered from data instead of a shipped
    dictionary). SymSpell blocking: two strings within edit distance 1
    ALWAYS share a 1-deletion variant (or one IS the other's variant), so
    candidates come from an equality join on deletion keys — never an
    all-pairs scan — then an exact O(len) distance-≤1 verify drops the
    (distance-2) false candidates. The SQL twin verifies with DuckDB's
    ``levenshtein() <= 1`` — identical semantics to the specialized check.

    Terms below ``min_count`` occurrences or shorter than ``min_len`` chars
    are excluded (noise guard, mirrored in the twin). Scale shape: vocab
    via one fastagg; deletion explode is vocab-proportional (len+1 variants
    per term); candidate pairs ride the segmented ``bucket_pairs`` kernel
    with the standard ascending cap; the verify runs on the candidate set,
    which the blocking keeps near-linear in vocab size.

    ``term_col=None`` tokenizes the ``text`` column on spaces (corpus
    vocabulary mode); ``term_col="c_name"`` treats each row's value as one
    pre-tokenized term (entity-name mode — single-character ID/name variants
    are exactly the alias-discovery signal)."""
    from .fastagg import drop_empty_blocks, sorted_distinct, sorted_grouped_agg

    UNI = pa.schema([("term", pa.string()), ("n", pa.int64())])

    def uni_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if batch.num_columns == 0 or batch.num_rows == 0:
            return UNI.empty_table()
        if term_col is not None:
            s = batch.column(term_col).to_pandas().dropna()
        else:
            s = (
                batch.column("text")
                .to_pandas()
                .str.split(" ")
                .explode()
                .replace("", None)
                .dropna()
            )
        counts = s.value_counts()
        return pa.Table.from_arrays(
            [
                pa.array(counts.index.astype(str), pa.string()),
                pa.array(counts.to_numpy(), pa.int64()),
            ],
            schema=UNI,
        )

    vocab = sorted_grouped_agg(
        docs.map_batches(uni_partial, batch_format="pyarrow"),
        ["term"],
        [("n", "sum")],
        out_names=["n"],
    )

    KEYED = pa.schema([("key", pa.string()), ("term", pa.string())])

    def variants(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return KEYED.empty_table()
        t = t.filter(
            pc.and_(
                pc.greater_equal(t.column("n"), min_count),
                pc.greater_equal(pc.utf8_length(t.column("term")), min_len),
            )
        )
        keys, terms = [], []
        for term in t.column("term").to_pylist():
            keys.append(term)
            terms.append(term)
            for i in range(len(term)):
                keys.append(term[:i] + term[i + 1 :])
                terms.append(term)
        return pa.Table.from_arrays(
            [pa.array(keys, pa.string()), pa.array(terms, pa.string())],
            schema=KEYED,
        )

    keyed = sorted_distinct(
        drop_empty_blocks(
            vocab.map_batches(variants, batch_format="pyarrow"), KEYED
        ),
        ["key", "term"],
    )
    from .dedup import bucket_pairs

    OUT = pa.schema([("term_a", pa.string()), ("term_b", pa.string())])
    cand = sorted_distinct(
        bucket_pairs(keyed, ["key"], id_col="term", cap=cap).map_batches(
            lambda t: t.rename_columns(["term_a", "term_b"])
            if t.num_columns
            else OUT.empty_table(),
            batch_format="pyarrow",
        ),
        ["term_a", "term_b"],
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        a = t.column("term_a").to_pylist()
        b = t.column("term_b").to_pylist()
        keep = pa.array([_edit_distance_le1(x, y) for x, y in zip(a, b)])
        return t.filter(keep)

    return drop_empty_blocks(
        cand.map_batches(verify, batch_format="pyarrow"), OUT
    )


def doc_token_entropy(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-doc unigram token entropy — the Gopher-family quality signal the
    repetition stats don't cover (a doc of one token repeated has entropy 0;
    rich prose scores near ln(vocab)): emits ``(doc_id, n_tokens, n_terms,
    nlogn_q, entropy_uq)`` with entropy in micro-nats.

    H = ln N − (Σ n·ln n)/N is computed through the repo's standard
    quantize-then-integer discipline (``relational.psi_drift`` precedent):
    the only floats are the two ln quantizations — per-(doc,term)
    ``floor(n·ln(n)·10⁶)`` and per-doc ``floor(ln(N)·10⁶)`` — everything
    after is exact int64 (order-free sums), so both engines agree at any
    parallelism: ``entropy_uq = (N·lnN_q − nlogn_q) // N``.

    Scale shape: ONE streaming ``map_batches`` — a document never spans
    blocks, so per-doc term counts, N, and the quantized sums all complete
    in-batch (vectorized pandas split/explode/groupby); no shuffle, no
    aggregation stage at all. Docs with zero tokens drop out (mirrored
    WHERE in the twin)."""
    OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_terms", pa.int64()),
            ("nlogn_q", pa.int64()),
            ("entropy_uq", pa.int64()),
        ]
    )

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if batch.num_columns == 0 or batch.num_rows == 0:
            return OUT.empty_table()
        doc_id = batch.column("doc_id").to_pandas()
        toks = (
            batch.column("text")
            .to_pandas()
            .str.split(" ")
            .explode()
            .replace("", None)
            .dropna()
        )
        if toks.empty:
            return OUT.empty_table()
        did = doc_id.reindex(toks.index)
        per_term = (
            pd.DataFrame({"doc_id": did, "term": toks})
            .groupby(["doc_id", "term"], sort=False)
            .size()
        )
        n = per_term.to_numpy(dtype=np.int64)
        contrib = np.floor(
            n.astype(np.float64) * np.log(n.astype(np.float64)) * 1e6
        ).astype(np.int64)
        g = pd.DataFrame(
            {
                "doc_id": per_term.index.get_level_values(0),
                "n": n,
                "c": contrib,
            }
        ).groupby("doc_id", sort=False)
        agg = g.agg(n_tokens=("n", "sum"), n_terms=("n", "size"), nlogn_q=("c", "sum"))
        N = agg["n_tokens"].to_numpy(dtype=np.int64)
        lnN_q = np.floor(np.log(N.astype(np.float64)) * 1e6).astype(np.int64)
        ent = (N * lnN_q - agg["nlogn_q"].to_numpy(dtype=np.int64)) // N
        return pa.Table.from_arrays(
            [
                pa.array(agg.index.to_numpy(dtype=np.int64), pa.int64()),
                pa.array(N, pa.int64()),
                pa.array(agg["n_terms"].to_numpy(dtype=np.int64), pa.int64()),
                pa.array(agg["nlogn_q"].to_numpy(dtype=np.int64), pa.int64()),
                pa.array(ent, pa.int64()),
            ],
            schema=OUT,
        )

    from .fastagg import drop_empty_blocks

    return drop_empty_blocks(docs.map_batches(fn, batch_format="pyarrow"), OUT)


def term_heavy_hitters(
    docs: "ray.data.Dataset", k: int = 2000, broadcast_cap: int = 5_000_000
) -> "ray.data.Dataset":
    """Exact φ-heavy-hitters over the corpus token stream: every term whose
    global count STRICTLY exceeds total_tokens / ``k`` — the frequency gate
    behind stopword discovery, boilerplate detection and vocabulary pruning.

    Two-pass exact algorithm (NOT a sketch): if cnt_b(x)·k ≤ n_b in every
    batch b, then Σ cnt_b(x)·k ≤ Σ n_b = n — so the union of per-batch local
    heavy hitters is a guaranteed SUPERSET of the global heavy hitters, and
    each batch contributes fewer than ``k`` candidates. Pass A therefore
    emits a (blocks × k)-bounded candidate table plus one token-total row
    per batch; the full vocabulary (10⁷⁺ terms at corpus scale) never enters
    a shuffle. Pass B counts ONLY candidate terms exactly: a broadcast
    membership filter when the distinct candidate set fits
    (``broadcast_cap``), a distributed left_semi join against the candidate
    table otherwise — then one term-cardinality-bounded fastagg and the
    final strict n·k > total gate. Tokenization is the same space-split /
    drop-empties stream as ``vocab_top_terms`` so the SQL twin shares it."""
    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import drop_empty_blocks, sorted_distinct, sorted_grouped_agg
    from .joins import hash_join

    CAND = pa.schema([("term", pa.string()), ("n", pa.int64())])

    def _counts(batch: pa.Table):
        s = batch.column("text").to_pandas()
        return s.str.split(" ").explode().replace("", None).dropna().value_counts()

    def pass_a(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return CAND.empty_table()
        counts = _counts(batch)
        n_b = int(counts.sum())
        keep = counts[counts * k > n_b]
        return pa.table(
            {
                "term": pa.array(
                    list(keep.index.astype(str)) + [None], pa.string()
                ),
                "n": pa.array(list(keep.to_numpy()) + [n_b], pa.int64()),
            }
        )

    a = docs.map_batches(pass_a, batch_format="pyarrow").materialize()
    total = a.map_batches(
        lambda t: t.filter(pc.is_null(t.column("term"))).select(["n"])
        if t.num_columns
        else CAND.empty_table().select(["n"]),
        batch_format="pyarrow",
    ).sum("n")
    OUT = pa.schema([("term", pa.string()), ("n", pa.int64())])
    if not total:
        return ray.data.from_arrow(OUT.empty_table())

    cand_ds = sorted_distinct(
        drop_empty_blocks(
            a.map_batches(
                lambda t: t.filter(pc.is_valid(t.column("term"))).select(["term"])
                if t.num_columns
                else CAND.empty_table().select(["term"]),
                batch_format="pyarrow",
            ),
            pa.schema([("term", pa.string())]),
        ),
        ["term"],
    ).materialize()

    if cand_ds.count() <= broadcast_cap:
        cand_ref = broadcast(
            frozenset(
                t
                for b in cand_ds.iter_batches(batch_format="pyarrow")
                for t in b.column("term").to_pylist()
            )
        )

        def pass_b(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return OUT.empty_table()
            cands = task_state(state_key("hh_cands", cand_ref), lambda: ray.get(cand_ref))
            counts = _counts(batch)
            keep = counts[counts.index.isin(cands)]
            return pa.table(
                {
                    "term": pa.array(keep.index.astype(str), pa.string()),
                    "n": pa.array(keep.to_numpy(), pa.int64()),
                }
            )

        partials = docs.map_batches(pass_b, batch_format="pyarrow")
    else:
        def full_counts(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return OUT.empty_table()
            counts = _counts(batch)
            return pa.table(
                {
                    "term": pa.array(counts.index.astype(str), pa.string()),
                    "n": pa.array(counts.to_numpy(), pa.int64()),
                }
            )

        partials = hash_join(
            drop_empty_blocks(
                docs.map_batches(full_counts, batch_format="pyarrow"), OUT
            ),
            cand_ds,
            on=("term",),
            how="left_semi",
        )

    counted = sorted_grouped_agg(partials, ["term"], [("n", "sum")], out_names=["n"])
    hh = counted.map_batches(
        lambda t: t.filter(pc.greater(pc.multiply(t.column("n"), pa.scalar(k, pa.int64())), pa.scalar(int(total), pa.int64())))
        if t.num_columns
        else OUT.empty_table(),
        batch_format="pyarrow",
    )
    return drop_empty_blocks(hh, OUT).sort(["n", "term"], descending=[True, False])


def doc_bigram_score(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-document bigram-LM quality signal — the CCNet-style conditional
    sibling of ``doc_unigram_score``: each adjacent token pair scores the
    add-one-smoothed conditional probability p(b|a) of its own corpus,
    quantized to int ppm, and a document's score is the exact-int mean over
    its bigram occurrences. Emits ``(doc_id, n_bigrams, mean_cond_ppm)``;
    documents with fewer than two tokens emit nothing (no bigrams). Damaged
    text (shuffled words, tag soup, boilerplate splices) pairs globally
    common tokens in globally rare ORDERS, so it scores far below fluent
    text even when its unigram score is clean.

    Exactness: cond_ppm(a,b) = floor((n_ab + 1)·10⁶ / (n_a· + V)) computed
    ONCE per distinct bigram in doubles with the oracle's exact op order —
    n_ab = corpus count of (a,b), n_a· = Σ_b n_ab (occurrences of ``a`` as a
    bigram left side), V = corpus distinct-token vocabulary (the add-one
    denominator) — then per-doc sums are int64 and the mean is one exact
    int/int division. No log/float accumulates anywhere.

    Scale shape: bigram counts ride the per-batch-combiner + fastagg path
    (bigram-vocab-cardinality groups); the model table is vocab-bounded and
    broadcasts once, context counts derived FROM it by one group_by (no
    second corpus pass; the only extra pass is the unigram fastagg that
    sizes V). Scoring is a single stateless pass with one composed-key
    Arrow ``index_in`` probe per batch. Documented assumption (same budget
    as the unigram table and the alias dictionary): bigram vocabularies are
    ≤ a few 10⁸ entries ≈ GBs; beyond that, shuffle-join the per-doc
    (bigram, count) partials against the model instead of broadcasting."""
    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import sorted_grouped_agg

    BI = pa.schema(
        [("term_a", pa.string()), ("term_b", pa.string()), ("n_ab", pa.int64())]
    )

    def bi_partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return BI.empty_table()
        texts = batch.column("text").to_pylist()
        a_out, b_out = [], []
        for t in texts:
            toks = [w for w in (t or "").split(" ") if w]
            a_out.extend(toks[:-1])
            b_out.extend(toks[1:])
        if not a_out:
            return BI.empty_table()
        g = (
            pd.DataFrame({"term_a": a_out, "term_b": b_out})
            .groupby(["term_a", "term_b"], sort=False)
            .size()
            .reset_index(name="n_ab")
        )
        return pa.Table.from_arrays(
            [
                pa.array(g["term_a"].to_numpy(), pa.string()),
                pa.array(g["term_b"].to_numpy(), pa.string()),
                pa.array(g["n_ab"].to_numpy(), pa.int64()),
            ],
            schema=BI,
        )

    bi_tbl = pa.concat_tables(
        [
            b
            for b in sorted_grouped_agg(
                docs.map_batches(bi_partial, batch_format="pyarrow"),
                ["term_a", "term_b"],
                [("n_ab", "sum")],
                out_names=["n_ab"],
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns
        ]
        or [BI.empty_table()]
    ).combine_chunks()

    def uni_partial(batch: pa.Table) -> pa.Table:
        UNI = pa.schema([("term", pa.string()), ("n", pa.int64())])
        if batch.num_columns == 0 or batch.num_rows == 0:
            return UNI.empty_table()
        s = batch.column("text").to_pandas()
        counts = s.str.split(" ").explode().replace("", None).dropna().value_counts()
        return pa.Table.from_arrays(
            [
                pa.array(counts.index.astype(str), pa.string()),
                pa.array(counts.to_numpy(), pa.int64()),
            ],
            schema=UNI,
        )

    vocab_v = sorted_grouped_agg(
        docs.map_batches(uni_partial, batch_format="pyarrow"),
        ["term"],
        [("n", "sum")],
        out_names=["n"],
    ).count()

    # context counts n_a· derived from the bigram table itself (one C++
    # group_by over the vocab-bounded model — never a corpus pass), then the
    # quantized conditional prob per DISTINCT bigram, broadcast as
    # (composed key -> ppm)
    ctx = bi_tbl.group_by(["term_a"]).aggregate([("n_ab", "sum")])
    ctx_map_keys = ctx.column("term_a")
    pos = pc.index_in(bi_tbl.column("term_a"), value_set=ctx_map_keys)
    n_a = (
        ctx.column("n_ab_sum")
        .take(pos)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_ab = bi_tbl.column("n_ab").to_numpy(zero_copy_only=False).astype(np.int64)
    ppm = np.floor(
        (n_ab + 1).astype(np.float64) * 1_000_000.0 / (n_a + int(vocab_v)).astype(np.float64)
    ).astype(np.int64)
    composed = pc.binary_join_element_wise(
        bi_tbl.column("term_a"), bi_tbl.column("term_b"), "\x1f"
    )
    model_ref = broadcast(
        pa.table({"big": composed, "ppm": pa.array(ppm, pa.int64())})
    )

    OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_bigrams", pa.int64()),
            ("mean_cond_ppm", pa.float64()),
        ]
    )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return OUT.empty_table()

        def build():
            tb = ray.get(model_ref) if not isinstance(model_ref, pa.Table) else model_ref
            return (
                tb.column("big").combine_chunks(),
                tb.column("ppm").to_numpy(zero_copy_only=False),
            )

        bigs_arr, ppm_arr = task_state(state_key("bigram_lm", model_ref), build)
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keys, row_of = [], []
        for i, t in enumerate(texts):
            toks = [w for w in (t or "").split(" ") if w]
            for a, b in zip(toks[:-1], toks[1:]):
                keys.append(a + "\x1f" + b)
                row_of.append(i)
        if not keys:
            return OUT.empty_table()
        flat = pa.array(keys, pa.string())
        row_of = np.asarray(row_of, dtype=np.int64)
        pos2 = pc.index_in(flat, value_set=bigs_arr).to_numpy(zero_copy_only=False)
        # every doc bigram exists in its own corpus model by construction
        tok_ppm = ppm_arr[pos2.astype(np.int64)]
        change = np.ones(len(row_of), dtype=bool)
        change[1:] = row_of[1:] != row_of[:-1]
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(tok_ppm.astype(np.int64), starts)
        lens = np.diff(np.append(starts, len(row_of)))
        return pa.table(
            {
                "doc_id": pa.array(ids[row_of[starts]], pa.int64()),
                "n_bigrams": pa.array(lens.astype(np.int64)),
                "mean_cond_ppm": pa.array(sums.astype(np.float64) / lens),
            }
        )

    from .fastagg import drop_empty_blocks

    return drop_empty_blocks(
        docs.map_batches(score, batch_format="pyarrow"), OUT
    )


def tfidf_cosine_pairs(
    docs: "ray.data.Dataset",
    n_docs: int,
    k: int = 10,
    min_cos_ppm: int = 300_000,
    cap: int = 1000,
) -> "ray.data.Dataset":
    """Sparse tf-idf cosine similarity pairs → ``(doc_a, doc_b, n_shared,
    dot, cos_ppm)`` for document pairs sharing ≥ 1 top-``k`` tf-idf term
    with cosine ≥ ``min_cos_ppm`` — topical near-neighbor discovery over
    text alone (no embedding model needed), the classic sparse-vector
    complement to ``similarity.embedding_near_dup_pairs``. Top-k term
    truncation IS the scale story: it bounds every doc's vector to k
    entries and drops corpus-ubiquitous terms (high df → tf-idf ≈ 0 →
    never in the top-k), which is what makes a term-keyed pair join
    tractable at all — the standard prefix-filtering trick.

    Exactness/quantization: vector components are kilo-units qk =
    tfidf_q // 1000 (tfidf_q = floor(tf·ln(N/df)·10⁶) from
    ``doc_tfidf_top_terms``), so per-pair dot terms qk_a·qk_b and per-doc
    norms Σqk² stay deep inside int64 for any plausible tf; dot and norms
    are exact integer sums; cos_ppm = floor(dot·10⁶/(√n2a·√n2b)) in the
    corr family's promote-then-multiply double order. Norms use the FULL
    top-k vector (never the pair cap), so a truncated bucket can only
    MISS pairs, never mis-score one.

    Scale shape: the (doc, term, qk) stream rides ``bucket_pairs``'
    segmented sorted-scan (term = bucket, first ``cap`` doc_ids ascending
    per term — mirrored by the twin); per-pair products combine per batch
    into a pair-cardinality fastagg; two hash joins attach the norm table
    (doc-cardinality). No all-pairs anywhere."""
    import pyarrow.compute as pc

    from .dedup import bucket_pairs
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join

    topk = doc_tfidf_top_terms(docs, n_docs=n_docs, k=k)
    VEC = pa.schema(
        [("term", pa.string()), ("doc_id", pa.int64()), ("qk", pa.int64())]
    )
    vec = drop_empty_blocks(
        topk.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column("term"),
                    pc.cast(t.column("doc_id"), pa.int64()),
                    pc.divide(t.column("tfidf_q"), pa.scalar(1000, pa.int64())),
                ],
                schema=VEC,
            )
            if t.num_columns
            else VEC.empty_table(),
            batch_format="pyarrow",
        ),
        VEC,
    ).materialize()  # consumed twice: norms and the pair kernel

    N2 = pa.schema([("doc_id", pa.int64()), ("n2", pa.int64())])
    norms = drop_empty_blocks(
        sorted_grouped_agg(
            vec.map_batches(
                lambda t: pa.table(
                    {
                        "doc_id": t.column("doc_id"),
                        "_q2": pc.multiply(t.column("qk"), t.column("qk")),
                    }
                )
                if t.num_columns and t.num_rows
                else pa.schema(
                    [("doc_id", pa.int64()), ("_q2", pa.int64())]
                ).empty_table(),
                batch_format="pyarrow",
            ),
            ["doc_id"],
            [("_q2", "sum")],
            out_names=["n2"],
        ),
        N2,
    ).materialize()  # probed twice (doc_a and doc_b sides)

    pairs = bucket_pairs(
        vec, ["term"], id_col="doc_id", payload_cols=("qk",), cap=cap
    )
    PROD = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("_p", pa.int64())]
    )
    prods = drop_empty_blocks(
        pairs.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.column("doc_a"),
                    t.column("doc_b"),
                    pc.multiply(t.column("qk_a"), t.column("qk_b")),
                ],
                schema=PROD,
            )
            if t.num_columns and t.num_rows
            else PROD.empty_table(),
            batch_format="pyarrow",
        ),
        PROD,
    )
    agg = sorted_grouped_agg(
        prods,
        ["doc_a", "doc_b"],
        [("_p", "count"), ("_p", "sum")],
        out_names=["n_shared", "dot"],
    )
    j = hash_join(
        hash_join(
            drop_empty_blocks(agg), norms.rename_columns({"doc_id": "doc_a", "n2": "_n2a"}),
            on=("doc_a",),
        ),
        norms.rename_columns({"doc_id": "doc_b", "n2": "_n2b"}),
        on=("doc_b",),
    )
    OUT = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("n_shared", pa.int64()),
            ("dot", pa.int64()),
            ("cos_ppm", pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        f = np.float64
        dot = t.column("dot").to_numpy(zero_copy_only=False).astype(f)
        n2a = t.column("_n2a").to_numpy(zero_copy_only=False).astype(f)
        n2b = t.column("_n2b").to_numpy(zero_copy_only=False).astype(f)
        ok = (n2a > 0.0) & (n2b > 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.floor((dot * 1000000.0) / (np.sqrt(n2a) * np.sqrt(n2b)))
        cos = np.where(ok, cos, 0.0).astype(np.int64)
        out = pa.Table.from_arrays(
            [
                pc.cast(t.column("doc_a"), pa.int64()),
                pc.cast(t.column("doc_b"), pa.int64()),
                pc.cast(t.column("n_shared"), pa.int64()),
                pc.cast(t.column("dot"), pa.int64()),
                pa.array(cos, pa.int64()),
            ],
            schema=OUT,
        )
        return out.filter(
            pc.greater_equal(out.column("cos_ppm"), min_cos_ppm)
        )

    return drop_empty_blocks(
        j.map_batches(finalize, batch_format="pyarrow"), OUT
    )


def doc_readability(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Flesch-reading-ease readability per document, integer milli-units:
    ``(doc_id, n_words, n_sents, n_syll, flesch_milli)`` — the grade-level
    screen corpus-quality pipelines bucket documents by (alongside the
    Gopher-style repetition and CCNet unigram signals). Counts are
    non-overlapping RE2 match counts, fully vectorized via Arrow
    ``count_substring_regex`` (identical leftmost-longest semantics to the
    DuckDB twin's ``regexp_extract_all``):

      words      = matches of ``[A-Za-z]+``
      sentences  = matches of ``[.!?]+`` (punctuation runs; clamped ≥ 1 so
                   fragment docs score as one sentence)
      syllables  = matches of ``[aeiouyAEIOUY]+`` (vowel-group heuristic —
                   runs cannot cross whitespace, so the corpus-level count
                   equals the per-word sum)

    flesch_milli = floor(206835 − 1015·W/S − 84600·Y/W) evaluated in
    float64 with the exact op order of the SQL twin (each integer count
    promoted before its own division; the two quotient terms subtracted
    from the constant) — bit-exact floor at any parallelism. NULL when the
    document has no words. Stateless map, zero shuffles: readability of
    10¹² docs is embarrassingly parallel."""
    OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_words", pa.int64()),
            ("n_sents", pa.int64()),
            ("n_syll", pa.int64()),
            ("flesch_milli", pa.int64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        txt = pc.fill_null(t.column("text"), "")
        w = pc.cast(
            pc.count_substring_regex(txt, "[A-Za-z]+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        s = pc.cast(
            pc.count_substring_regex(txt, "[.!?]+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        y = pc.cast(
            pc.count_substring_regex(txt, "[aeiouyAEIOUY]+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        s_eff = np.maximum(s, 1).astype(np.float64)
        ok = w > 0
        wf = w.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            # identical promote-then-divide order as the SQL twin
            fl = np.floor(
                206835.0 - (1015.0 * wf) / s_eff - (84600.0 * y.astype(np.float64)) / wf
            )
        return pa.Table.from_arrays(
            [
                t.column("doc_id"),
                pa.array(w, pa.int64()),
                pa.array(s, pa.int64()),
                pa.array(y, pa.int64()),
                pa.array(
                    np.where(ok, fl, 0).astype(np.int64), pa.int64(), mask=~ok
                ),
            ],
            schema=OUT,
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def _source_term_matrix(docs: "ray.data.Dataset", k: int):
    """Shared prep for the NB source classifier and the source-KL audit:
    the top-``k`` feature terms (global count desc, term asc — the
    ``vocab_top_terms`` contract) and the dense (source × feature)
    occurrence-count matrix, plus per-source doc counts.

    Scale contract: the corpus flows twice (global term counts, then
    feature-filtered (source, term) counts), both through the per-batch
    combiner + fastagg path; ONLY bounded tables ever reach the driver —
    feats is ``k`` rows and the count matrix is ``n_sources × k`` (the
    documented broadcast budget: sources are a handful, k is a config cap).
    Raw text never shuffles.

    Returns (sources asc list, feats list, C (S, K) int64 counts,
    n_docs (S,) int64).
    """
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    feats_tbl = pa.concat_tables(
        [
            b
            for b in vocab_top_terms(docs, k).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
            if b.num_columns and b.num_rows
        ]
    )
    feats = feats_tbl.column("term").to_pylist()
    feat_arr = pa.array(feats, pa.string())
    col_of = {t: i for i, t in enumerate(feats)}

    CNT = pa.schema(
        [("source", pa.string()), ("term", pa.string()), ("n", pa.int64())]
    )

    def cnt_fn(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return CNT.empty_table()
        s = batch.column("text").to_pandas()
        src = batch.column("source").to_pandas()
        ex = s.str.split(" ").explode().replace("", None).dropna()
        if not len(ex):
            return CNT.empty_table()
        keep = pc.is_in(pa.array(ex.to_numpy(), pa.string()), value_set=feat_arr)
        ex = ex[keep.to_numpy(zero_copy_only=False)]
        if not len(ex):
            return CNT.empty_table()
        frame = pd.DataFrame(
            {"source": src.reindex(ex.index).to_numpy(), "term": ex.to_numpy()}
        )
        g = frame.groupby(["source", "term"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "source": pa.array(g["source"].astype(str), pa.string()),
                "term": pa.array(g["term"].astype(str), pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    counted = sorted_grouped_agg(
        drop_empty_blocks(
            docs.select_columns(["source", "text"]).map_batches(
                cnt_fn, batch_format="pyarrow"
            ),
            CNT,
        ),
        ["source", "term"],
        [("n", "sum")],
        out_names=["n"],
    )
    cnt_tbl = pa.concat_tables(
        [
            b
            for b in counted.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns and b.num_rows
        ]
    )

    nd = sorted_grouped_agg(
        docs.select_columns(["source"]),
        ["source"],
        [("source", "count")],
        out_names=["nd"],
    )
    nd_tbl = pa.concat_tables(
        [
            b
            for b in nd.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_columns and b.num_rows
        ]
    )
    sources = sorted(nd_tbl.column("source").to_pylist())
    row_of = {s: i for i, s in enumerate(sources)}
    n_docs = np.zeros(len(sources), np.int64)
    for s, n in zip(nd_tbl.column("source").to_pylist(), nd_tbl.column("nd").to_pylist()):
        n_docs[row_of[s]] = n

    C = np.zeros((len(sources), len(feats)), np.int64)
    for s, t, n in zip(
        cnt_tbl.column("source").to_pylist(),
        cnt_tbl.column("term").to_pylist(),
        cnt_tbl.column("n").to_pylist(),
    ):
        C[row_of[s], col_of[t]] = n
    return sources, feats, C, n_docs


def nb_source_confusion(
    docs: "ray.data.Dataset", k: int = 512
) -> "ray.data.Dataset":
    """Naive-Bayes source classifier confusion matrix — train an add-one-
    smoothed multinomial NB on the corpus's own (source, token) counts over
    the top-``k`` vocabulary, re-classify every document, and emit
    (source, pred_source, n_docs): the standard contamination / style-drift
    audit a training-data pipeline runs to see which sources are lexically
    separable and which bleed into each other (a source whose docs mostly
    classify as another source is a near-duplicate feed or a mislabeled
    scrape). The self-trained-classifier shape of CCNet/fastText quality
    filtering, kept oracle-exact.

    Integer discipline: token weight w(s,t) = floor(ln((cnt+1)/(tot_s+K))
    · 10⁶) and prior p(s) = floor(ln(n_s/N) · 10⁶) quantize FIRST (single
    ln per table cell, identical double ops in the SQL twin); per-doc
    scores are int64 sums of those weights, so argmax (ties → source asc)
    is bit-stable at any partitioning.

    Scale shape: three streaming corpus passes (global vocab fastagg;
    feature-filtered (source, term) fastagg; stateless scoring pass with
    the (S × K) weight matrix + priors broadcast once). Non-feature tokens
    are ignored (not defaulted) — mirrored in the twin's join-with-feats.
    The confusion rollup is one fastagg at S² cardinality."""
    from ..state.broadcast import broadcast, state_key, task_state
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    sources, feats, C, n_docs = _source_term_matrix(docs, k)
    S, K = C.shape
    tot = C.sum(axis=1)
    W = np.floor(
        np.log((C + 1.0) / (tot[:, None] + np.float64(K))) * 1e6
    ).astype(np.int64)
    total_docs = int(n_docs.sum())
    prior = np.floor(
        np.log(n_docs.astype(np.float64) / np.float64(total_docs)) * 1e6
    ).astype(np.int64)
    ref = broadcast(
        pa.table(
            {
                "term": pa.array(feats, pa.string()),
                # W columns ride as fixed-size list rows? keep flat: one
                # int64 list column per source would fragment — ship the
                # matrix as K rows of S-length lists
                "w": pa.array(W.T.tolist(), pa.list_(pa.int64())),
            }
        )
    )
    src_arr = pa.array(sources, pa.string())

    MID = pa.schema(
        [("source", pa.string()), ("pred_source", pa.string()), ("_one", pa.int64())]
    )

    def score_fn(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return MID.empty_table()

        def build():
            tb = ray.get(ref) if not isinstance(ref, pa.Table) else ref
            terms = tb.column("term").combine_chunks()
            w = np.array(tb.column("w").to_pylist(), dtype=np.int64).T  # (S, K)
            return terms, w

        terms_arr, w_mat = task_state(state_key("nbsrc", ref), build)
        s = batch.column("text").to_pandas()
        true_src = batch.column("source").to_numpy(zero_copy_only=False)
        n_rows = batch.num_rows
        # default: no feature occurrences → argmax over priors alone
        base_pred = int(np.argmax(prior))
        pred_idx = np.full(n_rows, base_pred, np.int64)
        ex = s.str.split(" ").explode().replace("", None).dropna()
        if len(ex):
            flat = pa.array(ex.to_numpy(), pa.string())
            pos = pa.compute.index_in(flat, value_set=terms_arr).to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            valid = ~np.isnan(pos)
            if valid.any():
                row_of = ex.index.to_numpy()[valid]
                cols = pos[valid].astype(np.int64)
                occ_w = w_mat[:, cols]  # (S, n_occ)
                change = np.ones(len(row_of), dtype=bool)
                change[1:] = row_of[1:] != row_of[:-1]
                starts = np.flatnonzero(change)
                seg = np.add.reduceat(occ_w, starts, axis=1)  # (S, n_seg)
                scores = seg + prior[:, None]
                pred_idx[row_of[starts]] = np.argmax(scores, axis=0)
        return pa.Table.from_arrays(
            [
                pa.array(true_src, pa.string()),
                pa.compute.take(src_arr, pa.array(pred_idx, pa.int64())),
                pa.array(np.ones(n_rows, np.int64)),
            ],
            schema=MID,
        )

    return sorted_grouped_agg(
        drop_empty_blocks(
            docs.select_columns(["source", "text"]).map_batches(
                score_fn, batch_format="pyarrow"
            ),
            MID,
        ),
        ["source", "pred_source"],
        [("_one", "sum")],
        out_names=["n_docs"],
    )


def source_token_kl(docs: "ray.data.Dataset", k: int = 512) -> "ray.data.Dataset":
    """Pairwise source-to-source KL divergence over the top-``k`` vocabulary
    with add-one smoothing — the mixture-drift audit that ranks how far each
    source's token distribution sits from every other (feeds the
    ``source_mixture_plan`` weighting and flags a source whose distribution
    collapsed after a bad re-crawl). Emits (source_a, source_b, kl_q,
    n_terms) for every ordered pair a ≠ b.

    Integer discipline: per-term contribution floor(p_a · ln(p_a/p_b) ·
    10⁹) with p = (cnt+1)/(tot+K) — the PSI quantization pattern
    (relational.psi_drift) — summed as int64, so the result is partition-
    and order-free and the DuckDB twin matches bit-for-bit (same
    divide/divide/divide/ln/multiply/multiply/floor op chain).

    Scale shape: the two fastagg corpus passes of ``_source_term_matrix``;
    the pair computation itself runs on the driver over the (S × K) count
    matrix — S² × K cells, bounded by the same broadcast budget as the
    matrix itself (sources are a handful; NOT corpus-proportional)."""
    sources, feats, C, _ = _source_term_matrix(docs, k)
    S, K = C.shape
    tot = C.sum(axis=1)
    P = (C + 1.0) / (tot[:, None] + np.float64(K))  # (S, K)
    a_idx, b_idx, kl_q = [], [], []
    for i in range(S):
        for j in range(S):
            if i == j:
                continue
            contrib = np.floor(P[i] * np.log(P[i] / P[j]) * 1e9).astype(np.int64)
            a_idx.append(sources[i])
            b_idx.append(sources[j])
            kl_q.append(int(contrib.sum()))
    out = pa.table(
        {
            "source_a": pa.array(a_idx, pa.string()),
            "source_b": pa.array(b_idx, pa.string()),
            "kl_q": pa.array(kl_q, pa.int64()),
            "n_terms": pa.array([K] * len(a_idx), pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


def vocab_oov_rate(docs: "ray.data.Dataset", k: int = 512) -> "ray.data.Dataset":
    """Tokenizer-coverage audit: per source, total whitespace tokens, the
    occurrences covered by the global top-``k`` vocabulary, and the
    out-of-vocabulary rate in integer ppm — the what-would-a-K-entry-vocab
    miss table (a source with a high OOV rate under the shared vocabulary
    is jargon-heavy, noisy, or a different language and will fragment into
    long byte-fallback token sequences).

    Scale shape: the two ``_source_term_matrix`` fastagg passes (in-vocab
    occurrence counts land in the S × K matrix) plus one per-source total
    token fastagg; everything the driver touches is source-cardinality
    bounded. Pure integers (oov_ppm = (tot − in)·10⁶ // tot)."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    sources, feats, C, _ = _source_term_matrix(docs, k)
    in_vocab = {s: int(n) for s, n in zip(sources, C.sum(axis=1))}

    TOT = pa.schema([("source", pa.string()), ("_n", pa.int64())])

    def tot_fn(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return TOT.empty_table()
        s = batch.column("text").to_pandas()
        src = batch.column("source").to_pandas()
        ex = s.str.split(" ").explode().replace("", None).dropna()
        if not len(ex):
            return TOT.empty_table()
        g = src.reindex(ex.index).value_counts()
        return pa.table(
            {
                "source": pa.array(g.index.astype(str), pa.string()),
                "_n": pa.array(g.to_numpy(), pa.int64()),
            }
        )

    tot = sorted_grouped_agg(
        drop_empty_blocks(
            docs.select_columns(["source", "text"]).map_batches(
                tot_fn, batch_format="pyarrow"
            ),
            TOT,
        ),
        ["source"],
        [("_n", "sum")],
        out_names=["n_tokens"],
    )

    OUT = pa.schema(
        [
            ("source", pa.string()),
            ("n_tokens", pa.int64()),
            ("n_in_vocab", pa.int64()),
            ("oov_ppm", pa.int64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        srcs = t.column("source").to_pylist()
        nt = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        ni = np.array([in_vocab.get(s, 0) for s in srcs], np.int64)
        oov = ((nt - ni) * 1_000_000) // np.maximum(nt, 1)
        return pa.Table.from_arrays(
            [
                t.column("source"),
                pa.array(nt, pa.int64()),
                pa.array(ni, pa.int64()),
                pa.array(oov, pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(tot.map_batches(final, batch_format="pyarrow"), OUT)


def char_pair_merge_candidates(
    docs: "ray.data.Dataset", k: int = 50
) -> "ray.data.Dataset":
    """Subword-vocab induction, round one: the top-``k`` adjacent BYTE pairs
    across the corpus (space-adjacent pairs excluded) ordered (count desc,
    pair asc) — the first merge table a byte-level BPE trainer produces,
    run as a corpus op so vocabulary work scales with the data pipeline
    instead of a single-machine tokenizer trainer.

    Byte-level contract (that IS what byte-BPE counts): the engine scans
    UTF-8 bytes; the DuckDB twin's substr() is character-based, so the twin
    is exact for single-byte (ASCII) corpora — stated here, not hidden.

    Scale shape: per batch, ALL texts concatenate with NUL separators into
    ONE numpy buffer (no per-row Python), pair codes are a*256+b ints,
    per-batch bincount partials shrink the shuffle to ≤ 64K distinct codes;
    one fastagg + one tiny top-k sort."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    MID = pa.schema([("code", pa.int64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return MID.empty_table()
        texts = batch.column("text").to_pylist()
        buf = np.frombuffer(
            "\x00".join(t or "" for t in texts).encode("utf-8"), dtype=np.uint8
        )
        if len(buf) < 2:
            return MID.empty_table()
        a = buf[:-1].astype(np.int64)
        b = buf[1:].astype(np.int64)
        mask = (a != 32) & (b != 32) & (a != 0) & (b != 0)
        if not mask.any():
            return MID.empty_table()
        codes = a[mask] * 256 + b[mask]
        uniq, cnt = np.unique(codes, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(uniq, pa.int64()), pa.array(cnt.astype(np.int64))],
            schema=MID,
        )

    agg = sorted_grouped_agg(
        drop_empty_blocks(
            docs.select_columns(["text"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            MID,
        ),
        ["code"],
        [("n", "sum")],
        out_names=["n"],
    )
    OUT = pa.schema([("pair", pa.string()), ("n", pa.int64())])

    def to_pair(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        codes = t.column("code").to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = [chr(c // 256) + chr(c % 256) for c in codes]  # k-bounded
        return pa.Table.from_arrays(
            [pa.array(pairs, pa.string()), pc.cast(t.column("n"), pa.int64())],
            schema=OUT,
        )

    top = agg.sort(["n", "code"], descending=[True, False]).limit(k)
    return drop_empty_blocks(top.map_batches(to_pair, batch_format="pyarrow"), OUT)


def doc_compression_ratio(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Compression-ratio quality signal (zlib level 6): ratio_ppm =
    compressed_bytes·10⁶ // raw_bytes per document — the Gopher-style
    repetition/noise screen (boilerplate floods compress far below normal
    prose; encrypted/binary junk barely compresses). No SQL twin exists for
    zlib, so this op is registered ROWS-ONLY by design; determinism comes
    from the pinned zlib level and is covered by tests, not the oracle.

    Scale shape: stateless per-batch map; zlib is C-speed per doc (the
    Python loop is the documented cost — compression is inherently
    per-payload, same contract as the media decode pool)."""
    import zlib

    OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("raw_bytes", pa.int64()),
            ("compressed_bytes", pa.int64()),
            ("ratio_ppm", pa.int64()),
        ]
    )

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return OUT.empty_table()
        texts = batch.column("text").to_pylist()
        raw, comp = [], []
        for t in texts:
            bs = (t or "").encode("utf-8")
            raw.append(len(bs))
            comp.append(len(zlib.compress(bs, 6)))
        raw_a = np.array(raw, np.int64)
        comp_a = np.array(comp, np.int64)
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("doc_id"), pa.int64()),
                pa.array(raw_a),
                pa.array(comp_a),
                pa.array(comp_a * 1_000_000 // np.maximum(raw_a, 1)),
            ],
            schema=OUT,
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
