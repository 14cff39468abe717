import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.functions.textfn import (
    hamming64,
    lsh_bands,
    minhash_signature,
    rolling_fingerprint,
    shingles,
    simhash64,
)
from multiomics_biocypher_kg_ray.stages import dedup, text


def _docs(rows):
    return ray.data.from_arrow(
        pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    )


def test_shingles_and_minhash_determinism():
    toks = "a b c d".split()
    assert shingles(toks, 3) == ["a b c", "b c d"]
    assert shingles(["a"], 3) == []
    s1 = minhash_signature(["a b c", "b c d"], 4)
    s2 = minhash_signature(["b c d", "a b c"], 4)  # order-independent
    assert s1 == s2 and len(s1) == 4
    assert len(lsh_bands(s1, 2)) == 2


def test_simhash_properties():
    h1 = simhash64("the quick brown fox".split())
    h2 = simhash64("the quick brown fox".split())
    h3 = simhash64("completely different words here".split())
    assert h1 == h2
    assert 0 <= h1 < (1 << 64)
    assert hamming64(h1, h1) == 0
    assert hamming64(h1, h3) > 0
    # near-identical docs → small hamming distance
    h4 = simhash64("the quick brown fox jumps over the lazy dog again and again".split())
    h5 = simhash64("the quick brown fox jumps over the lazy dog again and once".split())
    assert hamming64(h4, h5) < hamming64(h1, h3)


def test_rolling_fingerprint_stable():
    assert rolling_fingerprint("abc") == rolling_fingerprint("abc")
    assert rolling_fingerprint("abc") != rolling_fingerprint("abd")


def test_exact_dedup_groups():
    ds = _docs([(1, "hello world"), (2, "Hello   World"), (3, "other text")])
    out = dedup.exact_dedup_groups(ds).to_pandas()
    # 1 and 2 normalize identically → one group keeping min doc_id
    g = out[out["n_dupes"] == 2]
    assert len(g) == 1 and g.iloc[0]["keep_doc_id"] == 1
    assert len(out) == 2


def test_simhash_near_dups_finds_near_identical():
    base = "the quick brown fox jumps over the lazy dog " * 4
    ds = _docs([(1, base + "ending one"), (2, base + "ending two"), (3, "x y z " * 20)])
    pairs = dedup.simhash_near_dups(ds, max_hamming=16).to_pandas()
    assert {(1, 2)} <= set(zip(pairs["doc_a"], pairs["doc_b"]))


def test_jaccard_pairs_exact_value():
    ds = _docs([(1, "a b c d"), (2, "a b c e"), (3, "z z2 z3 z4")])
    out = dedup.ngram_jaccard_pairs(ds, k_shingle=3).to_pandas()
    # doc1 shingles {abc, bcd}, doc2 {abc, bce}: inter=1, union=3
    row = out[(out["doc_a"] == 1) & (out["doc_b"] == 2)].iloc[0]
    assert row["n_shared"] == 1
    assert abs(row["jaccard"] - 1 / 3) < 1e-12
    assert len(out) == 1  # doc3 shares nothing


def test_text_stats_quality():
    long_text = ("the a " * 3 + "word " * 25).strip()
    ds = _docs([(1, long_text), (2, "x"), (3, "")])
    out = text.text_stats(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "quality"] == 3
    assert out.loc[2, "quality"] == 0
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "stop_ratio"] == 0.0


def test_langid_deterministic():
    ds = _docs([(1, "the a the"), (2, "query table join join"), (3, "zzz")])
    out = text.lang_id(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "lang_guess"] == "en"
    assert out.loc[2, "lang_guess"] == "query"
    assert out.loc[3, "lang_guess"] == "und"


def test_near_dup_clusters_components_and_singletons():
    docs = ray.data.from_arrow(pa.table({"doc_id": [1, 2, 3, 4, 5, 6]}))
    pairs = ray.data.from_arrow(
        pa.table({"doc_a": [1, 2, 5], "doc_b": [2, 3, 6]})
    )
    out = (
        dedup.near_dup_clusters(docs, pairs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["cluster_id"].tolist() == [1, 1, 1, 4, 5, 5]
    assert out["cluster_size"].tolist() == [3, 3, 3, 1, 2, 2]
    assert out["is_canonical"].tolist() == [True, False, False, True, True, False]


def test_near_dup_clusters_empty_pairs_all_singletons():
    docs = ray.data.from_arrow(pa.table({"doc_id": [7, 8]}))
    pairs = ray.data.from_arrow(
        pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    )
    out = dedup.near_dup_clusters(docs, pairs).to_pandas().sort_values("doc_id")
    assert out["cluster_id"].tolist() == [7, 8]
    assert out["is_canonical"].all() and (out["cluster_size"] == 1).all()


def test_doc_tfidf_top_terms():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "apple banana apple",
                    "banana cherry",
                    "cherry cherry dates banana",
                ],
            }
        )
    )
    out = text.doc_tfidf_top_terms(docs, n_docs=3, k=2).to_pandas()
    top1 = (
        out.sort_values(["doc_id", "tfidf_q"], ascending=[True, False])
        .groupby("doc_id")
        .first()
    )
    # the doc-exclusive term always outranks shared terms
    assert top1.loc[1, "term"] == "apple"
    assert top1.loc[3, "term"] == "dates"
    # df counts documents, not occurrences
    assert (out.loc[out["term"] == "cherry", "df"] == 2).all()
    assert (out.loc[out["term"] == "apple", "tf"] == 2).all()
    # idf of a term present in every doc is ln(1) = 0
    banana = out[out["term"] == "banana"]
    assert (banana["tfidf_q"] == 0).all() if len(banana) else True


def test_quality_filter_reasons():
    long_good = ("the and of to a " * 10).strip()  # 50 tokens, stopword-heavy
    docs = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": [long_good, "tiny doc"]})
    )
    out = text.quality_filter(docs).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "keep"]) and out.loc[1, "reason"] == ""
    assert not bool(out.loc[2, "keep"])
    assert out.loc[2, "reason"] == "short_tokens,short_chars,low_stopword"


def test_bucket_pairs_duplicate_rows_no_self_pairs():
    # ADVICE r3: a duplicate (bucket, id) row must not emit doc_a == doc_b
    # self-pairs or inflate counts — the sorted-adjacent keep mask dedupes.
    t = pa.table(
        {
            "bucket": pa.array([7, 7, 7, 7, 8, 8, 8], pa.int64()),
            "doc_id": pa.array([1, 1, 2, 3, 5, 5, 5], pa.int64()),
        }
    )
    out = dedup.bucket_pairs(
        ray.data.from_arrow(t), ["bucket"], id_col="doc_id", cap=None
    ).to_pandas()
    got = sorted(map(tuple, out[["doc_a", "doc_b"]].values.tolist()))
    assert got == [(1, 2), (1, 3), (2, 3)]  # bucket 8 collapses to one id
    assert (out["doc_a"] != out["doc_b"]).all()


def test_bucket_pairs_duplicate_rows_across_blocks():
    # duplicates that straddle the block-edge stitch path
    t = pa.table(
        {
            "bucket": pa.array([1] * 6, pa.int64()),
            "doc_id": pa.array([10, 10, 11, 11, 12, 12], pa.int64()),
        }
    )
    out = dedup.bucket_pairs(
        ray.data.from_arrow(t).repartition(3), ["bucket"], id_col="doc_id", cap=None
    ).to_pandas()
    got = sorted(map(tuple, out[["doc_a", "doc_b"]].values.tolist()))
    assert got == [(10, 11), (10, 12), (11, 12)]


def test_bm25_topk_ranks_rare_term_matches_first():
    # doc 1 matches the RARE term; doc 2 matches the common term with equal
    # tf; docs 3..42 all contain the common term (making it low-idf).
    rows = [
        (1, "alpha beta rare"),
        (2, "alpha beta common"),
    ] + [(i, "common filler words here") for i in range(3, 43)]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    out = (
        text.bm25_topk(
            ray.data.from_arrow(t).repartition(4), ["rare", "common"], k=5
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    assert out["doc_id"].iloc[0] == 1  # rare-term doc outranks all
    assert set(out.columns) == {"doc_id", "bm25_q", "n_terms"}
    assert (out["bm25_q"].to_numpy()[:-1] >= out["bm25_q"].to_numpy()[1:]).all()


def test_bm25_topk_matches_duckdb_twin():
    import duckdb

    from multiomics_biocypher_kg_ray.oracle_rel import sql_bm25_docs

    rng = np.random.RandomState(3)
    words = np.array(["join", "scan", "hash", "sort", "merge", "filter", "x"])
    texts = [
        " ".join(rng.choice(words, size=rng.randint(1, 12))) for _ in range(400)
    ]
    df = pd.DataFrame({"doc_id": np.arange(400, dtype="int64"), "text": texts})
    out = (
        text.bm25_topk(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(6),
            ["join", "hash"],
            k=15,
        )
        .to_pandas()
        .sort_values(["bm25_q", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    ref = con.sql(sql_bm25_docs(["join", "hash"], k=15)).df()
    assert (out["doc_id"].to_numpy() == ref["doc_id"].to_numpy()).all()
    assert (out["bm25_q"].to_numpy() == ref["bm25_q"].to_numpy()).all()
    assert (out["n_terms"].to_numpy() == ref["n_terms"].to_numpy()).all()


def test_cross_corpus_lsh_only_cross_side_pairs():
    # corpus A: docs 0,2 identical text; corpus B: doc 1 identical to them,
    # doc 3 unrelated. Expect (0,1) and (1,2) — never the intra-A (0,2).
    same = "the quick brown fox jumps over the lazy dog " * 4
    t = pa.table(
        {
            "doc_id": pa.array([0, 2, 1, 3], pa.int64()),
            "text": pa.array([same, same, same, "completely different words here"]),
        }
    )
    docs = ray.data.from_arrow(t)
    a = docs.map_batches(
        lambda t: t.filter(pa.compute.equal(pa.compute.bit_wise_and(t.column("doc_id"), 1), 0)),
        batch_format="pyarrow",
    )
    b = docs.map_batches(
        lambda t: t.filter(pa.compute.equal(pa.compute.bit_wise_and(t.column("doc_id"), 1), 1)),
        batch_format="pyarrow",
    )
    out = dedup.cross_corpus_lsh_pairs(a, b).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in got and (1, 2) in got
    assert (0, 2) not in got  # intra-corpus pair must not emit
    assert all(x % 2 != y % 2 for x, y in got)


def test_substring_dup_pairs_finds_verbatim_spans():
    from multiomics_biocypher_kg_ray.stages.dedup import substring_dup_pairs

    boiler = "QUOTED-SPAN " * 10  # 120 chars of shared verbatim text
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                # prefixes are stride-aligned (both ≡ 0 mod 8): the strided
                # sample guarantees shared windows only under alignment
                "intro-1 " * 5 + boiler + " tail A",
                "another-opening-sentence " * 8 + boiler + " tail B",
                "completely unrelated content with no overlap at all " * 3,
                "short",
            ],
        }
    )
    out = (
        substring_dup_pairs(ray.data.from_arrow(docs).repartition(2),
                            window=24, stride=8)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
    )
    # only (1, 2) share verbatim windows; doc 4 is below the window size
    assert list(zip(out["doc_a"], out["doc_b"])) == [(1, 2)]
    assert int(out["n_shared_windows"].iloc[0]) >= 1


def test_substring_dup_pairs_stride1_no_false_pairs():
    from multiomics_biocypher_kg_ray.stages.dedup import substring_dup_pairs

    docs = pa.table(
        {
            "doc_id": pa.array([10, 11], pa.int64()),
            "text": ["abcdefghij" * 5, "JIHGFEDCBA" * 5],
        }
    )
    out = substring_dup_pairs(
        ray.data.from_arrow(docs), window=10, stride=1
    ).to_pandas()
    assert len(out) == 0


def test_bigram_pmi_matches_bruteforce():
    import math
    from collections import Counter

    from multiomics_biocypher_kg_ray.stages.text import bigram_pmi

    texts = [
        "new york is a big city",
        "new york new york",
        "a big    apple in new york",  # empties bridged by the filter
        "machine learning and machine learning",
    ]
    docs = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = (
        bigram_pmi(ray.data.from_arrow(docs).repartition(3), min_count=2)
        .to_pandas()
        .sort_values(["term_a", "term_b"])
        .reset_index(drop=True)
    )

    uni, bi = Counter(), Counter()
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
    T = sum(bi.values())
    ref = {
        k: (n, math.floor(math.log((n * T) / (uni[k[0]] * uni[k[1]])) * 1e6))
        for k, n in bi.items()
        if n >= 2
    }
    got = {
        (r.term_a, r.term_b): (r.n_ab, r.pmi_q) for r in out.itertuples()
    }
    assert got == ref
    assert ("new", "york") in got and got[("new", "york")][0] == 4


def test_containment_pairs_catches_quoted_subset():
    # doc 2 is a strict subset of doc 1's shingles: containment = 1.0
    # while jaccard is low
    long = "w" + " w".join(str(i) for i in range(40))  # w 0 w 1 ... tokens
    long = " ".join(f"tok{i}" for i in range(40))
    short = " ".join(f"tok{i}" for i in range(10, 16))
    ds = _docs([(1, long), (2, short), (3, "unrelated words only here now")])
    out = dedup.containment_pairs(ds, min_containment_ppm=900_000).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(1, 2)}
    assert int(out["containment_ppm"].iloc[0]) == 1_000_000
    jac = dedup.ngram_jaccard_pairs(ds, k_shingle=3).to_pandas()
    row = jac[(jac["doc_a"] == 1) & (jac["doc_b"] == 2)]
    assert float(row["jaccard"].iloc[0]) < 0.2


def test_term_fuzzy_pairs_blocking_and_verify():
    from multiomics_biocypher_kg_ray.stages.text import (
        _edit_distance_le1,
        term_fuzzy_pairs,
    )

    # exact distance-<=1 check vs a tiny DP reference
    def lev(a, b):
        import numpy as np

        d = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return int(d[len(b)])

    import itertools
    words = ["color", "colour", "colom", "farbe", "farb", "fariba", "abcd", "abce"]
    for a, b in itertools.combinations(words, 2):
        assert _edit_distance_le1(a, b) == (lev(a, b) <= 1), (a, b)

    corp = " ".join(
        ["color"] * 5 + ["colour"] * 4 + ["colors"] * 3 + ["totally"] * 3
        + ["different"] * 3 + ["abc"] * 9
    )
    ds = _docs([(1, corp), (2, corp)])
    out = term_fuzzy_pairs(ds, min_count=3, min_len=4).to_pandas()
    got = set(zip(out["term_a"], out["term_b"]))
    # color~colors (insert s) and color~colour (insert u) are distance 1;
    # colour~colors is distance 2 -> excluded; abc below min_len
    assert ("color", "colors") in got
    assert ("color", "colour") in got
    assert ("colors", "colour") not in got and ("colour", "colors") not in got
    assert not any("abc" in p for pair in got for p in pair)

    # entity-name mode: each row is one pre-tokenized term
    import ray

    names = ray.data.from_items(
        [{"c_name": n} for n in ["Cust#001", "Cust#002", "Cust#100", "Other#9"]]
    )
    out2 = term_fuzzy_pairs(names, min_count=1, term_col="c_name").to_pandas()
    got2 = set(zip(out2["term_a"], out2["term_b"]))
    assert got2 == {("Cust#001", "Cust#002")}


def test_doc_token_entropy_exact_integers():
    import math

    from multiomics_biocypher_kg_ray.stages.text import doc_token_entropy

    ds = _docs([(1, "a a b"), (2, "w w w w"), (3, "p q r s")])
    out = doc_token_entropy(ds).to_pandas().set_index("doc_id")
    # doc 1: counts {a:2, b:1}, N=3
    s_q = math.floor(2 * math.log(2) * 1e6)
    ln3_q = math.floor(math.log(3) * 1e6)
    assert out.loc[1, "n_tokens"] == 3 and out.loc[1, "n_terms"] == 2
    assert out.loc[1, "nlogn_q"] == s_q
    assert out.loc[1, "entropy_uq"] == (3 * ln3_q - s_q) // 3
    # doc 2: one repeated token -> entropy 0 (up to quantization floor)
    assert out.loc[2, "entropy_uq"] <= 1 and out.loc[2, "n_terms"] == 1
    # doc 3: uniform over 4 terms -> ~ln(4) micro-nats
    assert abs(out.loc[3, "entropy_uq"] - math.floor(math.log(4) * 1e6)) <= 2
