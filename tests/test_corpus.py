import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from multiomics_biocypher_kg_ray.stages import corpus


def test_chunk_documents_window_semantics():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    "a b c d e f g h i j",  # 10 tokens → chunks at 0,3,6 (size 5, overlap 2)
                    "x y",  # shorter than one chunk → single chunk
                    "",  # empty → no chunks
                    None,  # null → no chunks
                ],
            }
        )
    )
    out = (
        corpus.chunk_documents(docs, chunk_tokens=5, overlap=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = out[out["doc_id"] == 1]
    assert list(d1["chunk_text"]) == ["a b c d e", "d e f g h", "g h i j"]
    assert list(d1["n_tokens"]) == [5, 5, 4]
    d2 = out[out["doc_id"] == 2]
    assert list(d2["chunk_text"]) == ["x y"] and list(d2["n_tokens"]) == [2]
    assert set(out["doc_id"]) == {1, 2}

    with pytest.raises(ValueError):
        corpus.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_segmented_prefix_sum_matches_pandas_across_blocks():
    """Hot part spanning many blocks + many small parts straddling block
    edges: the distributed scan must equal the pandas groupby-cumsum."""
    rng = np.random.RandomState(7)
    n = 30_000
    part = np.sort(rng.choice([0] * 8 + list(range(1, 40)), size=n))  # part 0 is hot
    order = np.arange(n, dtype=np.int64)
    rng.shuffle(order)  # order values unique but unsorted on input
    val = rng.randint(0, 50, size=n).astype(np.int64)
    t = pa.table(
        {
            "p": pa.array(part.astype(np.int64)),
            "o": pa.array(order),
            "v": pa.array(val),
        }
    )
    ds = ray.data.from_arrow(t).map_batches(
        lambda x: x, batch_size=512, batch_format="pyarrow"
    )
    got = (
        corpus.segmented_prefix_sum(ds, "p", "o", "v", out_col="ps")
        .to_pandas()
        .sort_values(["p", "o"])
        .reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["p", "o"]).reset_index(drop=True)
    df["ps"] = df.groupby("p")["v"].cumsum() - df["v"]
    pd.testing.assert_frame_equal(got[["p", "o", "v", "ps"]], df)


def test_pack_sequences_deterministic_across_partitioning():
    texts = [" ".join(["w"] * (i % 37 + 1)) for i in range(600)]
    t = pa.table(
        {"doc_id": pa.array(np.arange(600, dtype=np.int64)), "text": texts}
    )
    a = (
        corpus.pack_sequences(ray.data.from_arrow(t), budget_tokens=100, n_shards=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        corpus.pack_sequences(
            ray.data.from_arrow(t).repartition(13), budget_tokens=100, n_shards=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # pack indices are dense per shard and follow cumulative token fill
    df = a.sort_values(["shard", "doc_id"])
    for _, g in df.groupby("shard"):
        before = g["n_tokens"].cumsum() - g["n_tokens"]
        assert (g["pack_idx"] == before // 100).all()


def test_redactor_sequential_counts():
    r = corpus.Redactor()
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": ["mail bob123@site99.org then 123456789 and 0xdeadbeef done"],
        }
    )
    out = r(t).to_pandas().iloc[0]
    # the email's own digits were consumed by the email replacement first
    assert out["clean_text"] == "mail <EMAIL> then <NUM> and <HEX> done"
    assert out["n_email"] == 1
    assert out["n_long_digits"] == 1
    assert out["n_hex_id"] == 1
    assert out["n_redactions"] == 3


def test_inverted_index_cap_and_truncation_flag():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(10, dtype=np.int64)),
                # 'common' in every doc; 'rare' only in docs 3 and 7;
                # 'once' in doc 5 only (df < min_df → dropped)
                "text": [
                    "common rare once".replace(
                        "rare", "rare" if i in (3, 7) else "x"
                    ).replace("once", "once" if i == 5 else "y")
                    for i in range(10)
                ],
            }
        )
    )
    out = (
        corpus.inverted_index(docs, max_postings=4, min_df=2)
        .to_pandas()
        .set_index("term")
    )
    assert out.loc["common", "df"] == 10
    assert out.loc["common", "postings"] == "0,1,2,3"  # capped, ascending
    assert bool(out.loc["common", "truncated"])
    assert out.loc["rare", "postings"] == "3,7"
    assert not bool(out.loc["rare", "truncated"])
    assert "once" not in out.index


def test_chunk_documents_property_window_arithmetic():
    """Hypothesis sweep of (chunk, overlap, token count): chunks must tile
    the token list with the declared stride, cover every token, and agree
    with a pure-python reference."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        chunk=st.integers(min_value=2, max_value=12),
        overlap_frac=st.integers(min_value=0, max_value=100),
        lengths=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=6),
    )
    def check(chunk, overlap_frac, lengths):
        overlap = (overlap_frac * (chunk - 1)) // 100  # 0 <= overlap < chunk
        stride = chunk - overlap
        texts = [" ".join(f"t{j}" for j in range(n)) if n else "" for n in lengths]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": texts,
            }
        )
        ds = corpus.chunk_documents(
            ray.data.from_arrow(t), chunk_tokens=chunk, overlap=overlap
        )
        # schema is stable even when every doc is empty (Dataset.to_pandas
        # drops columns on a zero-row result, so go through Arrow refs)
        tables = [tb for tb in ray.get(ds.to_arrow_refs())]
        got = (
            pa.concat_tables(tables)
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        exp_rows = []
        for did, n in enumerate(lengths):
            if n == 0:
                continue
            toks = [f"t{j}" for j in range(n)]
            i = 0
            while True:
                s = i * stride
                w = toks[s : s + chunk]
                exp_rows.append((did, i, " ".join(w), len(w)))
                if s + chunk >= n:
                    break
                i += 1
        exp = pd.DataFrame(
            exp_rows, columns=["doc_id", "chunk_idx", "chunk_text", "n_tokens"]
        )
        pd.testing.assert_frame_equal(
            got.astype(exp.dtypes.to_dict()), exp, check_dtype=False
        )

    check()


def test_decontaminate_hand_example():
    """Benchmark docs (id % 5 == 0) seed the shingle set; doc 1 shares the
    3-gram 'x y z' with benchmark doc 0, doc 2 shares nothing, doc 3 is too
    short for any shingle and is dropped."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                "x y z q r",          # benchmark (0 % 5 == 0)
                "a b x y z c",        # hit: 'x y z'
                "p q r s",            # no 3-gram overlap ('q r s' not in bench)
                "one two",            # < 3 tokens → excluded
            ],
        }
    )
    out = (
        corpus.decontaminate(
            ray.data.from_arrow(t), k_shingle=3, bench_mod=5, bench_rem=0
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2]
    assert out.loc[1, "n_hits"] == 1 and bool(out.loc[1, "contaminated"])
    assert out.loc[1, "n_ngrams"] == 4
    assert out.loc[2, "n_hits"] == 0 and not bool(out.loc[2, "contaminated"])


def test_doc_repetition_stats_hand_example():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "a a a b",    # top 3/4; 2-grams aa,aa,ab → dup 2/3
                "w",          # single token: top 1/1, no 2-grams
                "  ",         # empty after normalize → excluded
            ],
        }
    )
    out = (
        corpus.doc_repetition_stats(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1]
    assert out.loc[0, "n_tokens"] == 4
    assert out.loc[0, "top_word_ppm"] == 750_000
    assert out.loc[0, "dup_2gram_ppm"] == 666_666
    assert bool(out.loc[0, "flagged"])
    assert out.loc[1, "top_word_ppm"] == 1_000_000
    assert out.loc[1, "dup_2gram_ppm"] == 0
