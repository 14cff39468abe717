"""DuckDB oracle SQL for the relational / events / text / dedup / similarity
operator queries. Numeric convention mirrors ``stages.relational.to_cents``:
money doubles → exact integer cents via ``CAST(round(x*100, 0) AS BIGINT)``
(inputs are cents-valued ± float error, never exactly half-cent, so DuckDB's
half-away rounding and numpy's rint agree)."""

from __future__ import annotations

CENTS = "CAST(round({col} * 100, 0) AS BIGINT)"


def sql_pricing_summary() -> str:
    p = CENTS.format(col="l_extendedprice")
    d = CENTS.format(col="l_discount")
    return f"""
SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n,
       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
       sum({p})::BIGINT AS sum_price_cents,
       sum({p} * (100 - {d}))::BIGINT AS sum_disc_e4
FROM lineitem GROUP BY 1, 2"""


def sql_revenue_by_nation() -> str:
    t = CENTS.format(col="o_totalprice")
    return f"""
SELECT n_name, count(*)::BIGINT AS n_orders, sum({t})::BIGINT AS revenue_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1"""


def sql_top_orders_per_customer(k: int = 3) -> str:
    return f"""
SELECT o_custkey, o_orderkey, rank FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rank
  FROM orders
) WHERE rank <= {k}"""


def sql_parts_in_heavy_lineitems(min_qty: int = 49) -> str:
    return f"""
SELECT p_partkey, p_name FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= {min_qty})"""


def sql_customers_without_orders(status: str = "F") -> str:
    # anti-join against a filtered right side (non-empty at every sf)
    return f"""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = '{status}')"""


def sql_first_event_per_user() -> str:
    return """
SELECT user_id, event_id, ts, event_type FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1"""


def sql_user_hour_activity() -> str:
    v = CENTS.format(col="value")
    return f"""
SELECT user_id, date_trunc('hour', ts) AS hour,
       count(*)::BIGINT AS n, sum({v})::BIGINT AS sum_value_cents
FROM events GROUP BY 1, 2"""


def sql_event_percentiles() -> str:
    return """
SELECT event_id, event_type, rnk,
       pct::BIGINT AS pct,
       CASE WHEN pct >= 90 THEN 'top10'
            WHEN pct >= 75 THEN 'top25'
            WHEN pct >= 25 THEN 'mid'
            ELSE 'low' END AS bucket
FROM (
  SELECT event_id, event_type, rnk,
         CASE WHEN n > 1 THEN ((n - rnk) * 100) // (n - 1) ELSE 100 END AS pct
  FROM (
    SELECT event_id, event_type,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value DESC, event_id)::BIGINT AS rnk,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM events
  )
)"""


def sql_event_type_stats() -> str:
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_type, {v} AS cents FROM events)
SELECT event_type, count(*)::BIGINT AS n,
       min(cents)::DOUBLE AS min_v, max(cents)::DOUBLE AS max_v,
       quantile_cont(cents, 0.25) AS q1,
       quantile_cont(cents, 0.5) AS median,
       quantile_cont(cents, 0.75) AS q3
FROM e GROUP BY 1"""


def sql_event_type_stats_disc() -> str:
    """Twin of ``distribution_stats(method='disc')`` — quantile_disc is
    numpy's inverted_cdf (verified on boundary cases)."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_type, {v} AS cents FROM events)
SELECT event_type, count(*)::BIGINT AS n,
       min(cents)::DOUBLE AS min_v, max(cents)::DOUBLE AS max_v,
       quantile_disc(cents, 0.25)::DOUBLE AS q1,
       quantile_disc(cents, 0.5)::DOUBLE AS median,
       quantile_disc(cents, 0.75)::DOUBLE AS q3
FROM e GROUP BY 1"""


def sql_nation_segments() -> str:
    return """
SELECT n_name, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1"""


def sql_top10_orders() -> str:
    t = CENTS.format(col="o_totalprice")
    return f"""
SELECT o_orderkey, {t} AS totalprice_cents
FROM orders ORDER BY totalprice_cents DESC, o_orderkey LIMIT 10"""


def sql_event_props_k() -> str:
    return r"""
SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
FROM events"""


def sql_sessionize(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
f AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM o
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM f
)
SELECT user_id, session_idx::BIGINT AS session_idx, count(*)::BIGINT AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts
FROM s GROUP BY 1, 2"""


def sql_asof_signup() -> str:
    return """
WITH s AS (
  SELECT event_id, user_id, ts, event_type,
         max(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_marker_ts
  FROM events
)
SELECT event_id, user_id, ts, last_marker_ts FROM s WHERE event_type = 'purchase'"""


# ------------------------------------------------------------------- text


_STOP_IN = "('the', 'a', 'and', 'of', 'to', 'in', 'is', 'it')"
_BPE_RE = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\\s]"
_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


def sql_text_stats() -> str:
    return f"""
SELECT doc_id, n_tokens, n_bpe_tokens, n_stopwords, n_chars,
       CASE WHEN n_tokens > 0
            THEN n_stopwords::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END AS stop_ratio,
       ((n_tokens >= 20)::BIGINT + (n_chars >= 100)::BIGINT
        + (CASE WHEN n_tokens > 0
                THEN n_stopwords::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END >= 0.05)::BIGINT
       )::BIGINT AS quality
FROM (
  SELECT doc_id,
         CASE WHEN text = '' THEN 0
              ELSE len(string_split(text, ' ')) END::BIGINT AS n_tokens,
         len(regexp_extract_all(text, '{_BPE_RE}'))::BIGINT AS n_bpe_tokens,
         CASE WHEN text = '' THEN 0
              ELSE len(list_filter(string_split(text, ' '),
                                   x -> x IN {_STOP_IN})) END::BIGINT AS n_stopwords,
         length(text)::BIGINT AS n_chars
  FROM documents
)"""


def sql_lang_id() -> str:
    def cnt(words: str) -> str:
        return (
            "CASE WHEN text = '' THEN 0 ELSE "
            f"len(list_filter(string_split(text, ' '), x -> x IN ({words}))) END"
        )

    c_en = cnt("'the', 'a'")
    c_q = cnt("'query', 'table', 'join'")
    c_s = cnt("'stream', 'window', 'batch'")
    return f"""
SELECT doc_id,
       CASE WHEN c_s > c_q AND c_s > c_en AND c_s > 0 THEN 'stream'
            WHEN c_q > c_en AND c_q > 0 THEN 'query'
            WHEN c_en > 0 THEN 'en'
            ELSE 'und' END AS lang_guess
FROM (SELECT doc_id, {c_en} AS c_en, {c_q} AS c_q, {c_s} AS c_s FROM documents)"""


def sql_doc_fingerprint() -> str:
    return f"SELECT doc_id, md5({_NORM}) AS fingerprint_md5 FROM documents"


def sql_dedup_exact() -> str:
    return f"""
SELECT fp AS fingerprint_md5, min(doc_id)::BIGINT AS keep_doc_id,
       count(*)::BIGINT AS n_dupes
FROM (SELECT doc_id, md5({_NORM}) AS fp FROM documents)
GROUP BY 1"""


def _shingle_cte(where: str = "", k: int = 3) -> str:
    """DISTINCT k-token shingles of the normalized text (1-based slicing)."""
    return f"""
d AS (SELECT doc_id, {_NORM} AS t FROM documents {where}),
tok AS (SELECT doc_id, string_split(t, ' ') AS tk FROM d),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(tk[(i + 1)::BIGINT:(i + {k})::BIGINT], ' ') AS shingle
  FROM (SELECT doc_id, tk, unnest(range((len(tk) - {k - 1})::BIGINT)) AS i
        FROM tok WHERE len(tk) >= {k})
)""".strip()


def sql_minhash_bands(num_hashes: int = 8, band_size: int = 2) -> str:
    n_bands = num_hashes // band_size
    band_expr = "md5(" + " || '|' || ".join(
        f"sig[band_idx * {band_size} + {j + 1}]" for j in range(band_size)
    ) + ")"
    return f"""
WITH {_shingle_cte()},
mh AS (
  SELECT doc_id, s.seed, min(md5(s.seed::VARCHAR || ':' || shingle)) AS mh
  FROM sh CROSS JOIN (SELECT unnest(range({num_hashes})) AS seed) s
  GROUP BY 1, 2
),
sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY doc_id)
SELECT doc_id, band_idx::BIGINT AS band_idx, {band_expr} AS band_hash
FROM sig CROSS JOIN (SELECT unnest(range({n_bands})) AS band_idx) b"""


def sql_lsh_candidate_pairs(cap: int = 1000) -> str:
    """Mirrors ``dedup.lsh_candidate_pairs`` INCLUDING the per-bucket pair-
    generation cap (first ``cap`` docs by doc_id per bucket), so engine and
    oracle stay hash-equal even when a bucket overflows."""
    inner = sql_minhash_bands().strip()
    return f"""
WITH band AS ({inner}),
capped AS (
  SELECT doc_id, band_idx, band_hash,
         row_number() OVER (PARTITION BY band_idx, band_hash ORDER BY doc_id) AS rn
  FROM band
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared_bands
FROM capped a
JOIN capped b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
WHERE a.rn <= {cap} AND b.rn <= {cap}
GROUP BY 1, 2"""


def sql_lsh_bucket_stats(cap: int = 1000) -> str:
    inner = sql_minhash_bands().strip()
    return f"""
WITH band AS ({inner})
SELECT band_idx, band_hash, count(*)::BIGINT AS n_docs,
       greatest(count(*) - {cap}, 0)::BIGINT AS n_truncated
FROM band GROUP BY 1, 2 HAVING count(*) >= 2"""


def sql_simhash_near_dups(max_hamming: int = 8, cap: int = 1000) -> str:
    """Bit-exact twin of ``dedup.simhash_near_dups``: 64-bit SimHash per doc
    (token hash = first 8 md5 bytes big-endian, bit majority over ALL tokens
    incl. duplicates), 4×16-bit band buckets capped at the first ``cap`` docs
    by id, hamming = popcount(xor) ≤ ``max_hamming``, min over shared bands.
    The engine stores the sketch as two's-complement int64; the oracle stays
    in UBIGINT throughout — band values and xor agree bit-for-bit."""
    return f"""
WITH d AS (SELECT doc_id, {_NORM} AS t FROM documents),
tokh AS (
  SELECT doc_id, ('0x' || substr(md5(token), 1, 16))::UBIGINT AS h
  FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS token FROM d)
),
bits AS (
  SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM tokh CROSS JOIN (SELECT unnest(range(64)) AS i) r
  GROUP BY 1, 2
),
sk AS (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::UBIGINT << i)::HUGEINT ELSE 0 END)::UBIGINT AS u
  FROM bits GROUP BY 1
),
band AS (
  SELECT doc_id, band_idx, ((u >> (16 * band_idx)) & 65535)::BIGINT AS band_val, u
  FROM sk CROSS JOIN (SELECT unnest(range(4)) AS band_idx) b
),
capped AS (
  SELECT doc_id, band_idx, band_val, u,
         row_number() OVER (PARTITION BY band_idx, band_val ORDER BY doc_id) AS rn
  FROM band
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.u, b.u))::BIGINT AS hamming
  FROM capped a JOIN capped b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
  WHERE a.rn <= {cap} AND b.rn <= {cap}
)
SELECT doc_a, doc_b, min(hamming)::BIGINT AS hamming
FROM pairs WHERE hamming <= {max_hamming}
GROUP BY 1, 2"""


def sql_jaccard_pairs(max_doc_id: int = 60, k: int = 3, cap: int = 1000) -> str:
    """Mirrors ``dedup.ngram_jaccard_pairs`` including the hot-shingle pair-
    generation cap (first ``cap`` docs by doc_id per shingle bucket). Set
    sizes use the UNCAPPED shingle sets, same as the engine."""
    return f"""
WITH {_shingle_cte(where=f"WHERE doc_id < {max_doc_id}", k=k)},
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
capped AS (
  SELECT doc_id, shingle,
         row_number() OVER (PARTITION BY shingle ORDER BY doc_id) AS rn
  FROM sh
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.rn <= {cap} AND b.rn <= {cap}
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       n_shared::DOUBLE / (sa.sz + sb.sz - n_shared)::DOUBLE AS jaccard
FROM inter
JOIN sz sa ON doc_a = sa.doc_id
JOIN sz sb ON doc_b = sb.doc_id"""


def sql_jaccard_shingle_stats(max_doc_id: int = 60, k: int = 3, cap: int = 1000) -> str:
    return f"""
WITH {_shingle_cte(where=f"WHERE doc_id < {max_doc_id}", k=k)}
SELECT shingle, count(*)::BIGINT AS n_docs,
       greatest(count(*) - {cap}, 0)::BIGINT AS n_truncated
FROM sh GROUP BY 1 HAVING count(*) >= 2"""


def sql_knn_cosine(k: int = 5, n_queries: int = 10) -> str:
    return f"""
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
           WHERE vec_id < {n_queries}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      WHERE vec_id >= {n_queries}),
s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.e, c.e) AS cos
      FROM q CROSS JOIN c),
r AS (SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id)::BIGINT AS rank
      FROM s)
SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
FROM r WHERE rank <= {k}"""


def sql_doc_chunks(chunk: int = 16, overlap: int = 4) -> str:
    """Twin of ``corpus.chunk_documents``: overlapping token windows via
    list_slice over string_split; integer-exact chunk-count arithmetic
    (``1 + ceil((n - chunk)/stride)`` as pure int division)."""
    stride = chunk - overlap
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks, len(string_split(text, ' ')) AS n
  FROM documents WHERE text IS NOT NULL AND text <> ''
),
c AS (
  SELECT doc_id, toks, n,
         unnest(range(1 + CASE WHEN n > {chunk}
                               THEN (n - {chunk} + {stride} - 1) // {stride}
                               ELSE 0 END)) AS i
  FROM d
)
SELECT doc_id, i::BIGINT AS chunk_idx,
       array_to_string(list_slice(toks, i * {stride} + 1, i * {stride} + {chunk}), ' ') AS chunk_text,
       least({chunk}, n - i * {stride})::BIGINT AS n_tokens
FROM c"""


def sql_doc_pack_assign(budget: int = 512, n_shards: int = 8) -> str:
    """Twin of ``corpus.pack_sequences``: the engine's distributed prefix
    sum must equal the window ``(sum(n) OVER shard-ordered) - n`` exactly."""
    return f"""
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id,
         CASE WHEN text IS NULL OR text = '' THEN 0
              ELSE len(string_split(text, ' ')) END::BIGINT AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens, (doc_id % {n_shards})::BIGINT AS shard,
       ((sum(n_tokens) OVER (PARTITION BY doc_id % {n_shards} ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens)
        // {budget})::BIGINT AS pack_idx
FROM d"""


def sql_doc_redact() -> str:
    """Twin of ``corpus.redact_patterns`` over the PII-suffixed corpus:
    sequential regexp_replace composition (each pattern over the previous
    pattern's output, matching the engine's subn chain) with per-pattern
    counts from regexp_extract_all at the same stage."""
    email = r"[a-zA-Z0-9._]+@[a-zA-Z0-9.]+\.[a-z]{2,}"
    digits = r"[0-9]{7,}"
    hexid = r"0x[0-9a-f]{6,}"
    return f"""
WITH t0 AS (
  SELECT doc_id,
         coalesce(text, '') || ' u' || doc_id || '@ex' || (doc_id % 5)
           || '.com ref 0xabc' || lpad(doc_id::VARCHAR, 6, '0')
           || ' acct 9' || lpad(doc_id::VARCHAR, 8, '0') AS s
  FROM documents
),
t1 AS (SELECT doc_id, s,
              regexp_replace(s, '{email}', '<EMAIL>', 'g') AS s1,
              len(regexp_extract_all(s, '{email}'))::BIGINT AS n_email
       FROM t0),
t2 AS (SELECT doc_id, s1, n_email,
              regexp_replace(s1, '{digits}', '<NUM>', 'g') AS s2,
              len(regexp_extract_all(s1, '{digits}'))::BIGINT AS n_long_digits
       FROM t1)
SELECT doc_id,
       regexp_replace(s2, '{hexid}', '<HEX>', 'g') AS clean_text,
       n_email, n_long_digits,
       len(regexp_extract_all(s2, '{hexid}'))::BIGINT AS n_hex_id,
       (n_email + n_long_digits + len(regexp_extract_all(s2, '{hexid}')))::BIGINT AS n_redactions
FROM t2"""


def sql_inverted_index(max_postings: int = 20, min_df: int = 2) -> str:
    """Twin of ``corpus.inverted_index``: distinct (term, doc) pairs → true
    df + posting list capped at ``max_postings`` ascending doc_ids."""
    return f"""
WITH p AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
p2 AS (SELECT term, doc_id FROM p WHERE term IS NOT NULL AND term <> ''),
df AS (SELECT term, count(*)::BIGINT AS df FROM p2 GROUP BY 1),
r AS (SELECT term, doc_id,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM p2),
po AS (SELECT term, string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
       FROM r WHERE rn <= {max_postings} GROUP BY 1)
SELECT df.term, df.df, po.postings, (df.df > {max_postings}) AS truncated
FROM df JOIN po ON df.term = po.term
WHERE df.df >= {min_df}"""


def sql_media_embed(dim: int = 8) -> str:
    """Twin of ``multimodal.media_embed``: dims = ascii codes of the first
    ``dim`` hex chars of md5(payload); payload = utf-8 text bytes."""
    terms = ", ".join(
        f"ascii(substr(m, {i + 1}, 1))::VARCHAR" for i in range(dim)
    )
    return f"""
SELECT doc_id AS media_id, array_to_string([{terms}], '|') AS emb
FROM (SELECT doc_id, md5(text) AS m FROM documents)  -- md5(VARCHAR) hashes the utf-8 bytes"""


def sql_frame_sample(k: int = 4) -> str:
    """Twin of ``multimodal.frame_sample`` on the ascii synthetic corpus:
    byte i·L//k == character at that 1-based position."""
    return f"""
SELECT doc_id AS media_id, i::BIGINT AS frame_idx,
       (i * length(text) // {k})::BIGINT AS byte_offset,
       ascii(substr(text, (i * length(text) // {k}) + 1, 1))::BIGINT AS byte_val
FROM (SELECT doc_id, text, unnest(range({k})) AS i FROM documents)
WHERE length(text) > 0"""


def sql_media_features() -> str:
    """Twin of ``multimodal.synth_real_media`` → ``decode_media``: the
    engine encodes REAL PNG/WAV bytes and parses the headers back; the
    oracle predicts the metadata from the same doc_id arithmetic — any
    encoder/parser defect on the engine side hash-mismatches here."""
    return """
SELECT doc_id::BIGINT AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS kind,
       CASE WHEN doc_id % 2 = 0 THEN ((doc_id % 64) + 1)::BIGINT END AS width,
       CASE WHEN doc_id % 2 = 0 THEN (((doc_id * 7) % 64) + 1)::BIGINT END AS height,
       CASE WHEN doc_id % 2 = 1 THEN 1::BIGINT END AS n_channels,
       CASE WHEN doc_id % 2 = 1 THEN 8000::BIGINT END AS sample_rate,
       CASE WHEN doc_id % 2 = 1 THEN ((doc_id % 997) + 1)::BIGINT END AS n_frames,
       CASE WHEN doc_id % 2 = 1 THEN (((doc_id % 997) + 1) * 1000 // 8000)::BIGINT END AS duration_ms
FROM documents"""


def sql_table_counts(tables: tuple[str, ...]) -> str:
    parts = [
        f"SELECT '{t}' AS tbl, count(*)::BIGINT AS n FROM {t}" for t in tables
    ]
    return "\nUNION ALL\n".join(parts)


def sql_replicate_user_stats() -> str:
    """Twin of ``relational.replicate_stats`` over events grouped by
    (user_id, event_type). Same closed-form mean/sd from exact integer
    totals, all intermediates cast to DOUBLE in the same order."""
    return """
WITH e AS (SELECT user_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
t AS (SELECT user_id, event_type,
             count(*)::BIGINT AS n,
             sum(CASE WHEN c <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_non_zero,
             CAST(sum(c) AS DOUBLE) AS s,
             CAST(sum(c * c) AS DOUBLE) AS sq
      FROM e GROUP BY 1, 2)
SELECT user_id, event_type, n, n_non_zero,
       round(s / n, 4) AS mean_v,
       round(CASE WHEN n > 1 THEN sqrt(greatest((sq - s * s / n) / (n - 1), 0))
             ELSE 0.0 END, 4) AS sd_v,
       CASE WHEN n_non_zero = n THEN 'detected'
            WHEN n_non_zero = 0 THEN 'not_detected'
            ELSE 'sporadic' END AS detection_status
FROM t"""


def sql_nation_segment_distribution() -> str:
    """Twin of ``relational.categorical_distribution``: per-nation parallel
    label-sorted (labels, counts) arrays rendered as joined strings."""
    return """
WITH j AS (SELECT n.n_name, c.c_mktsegment
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
cnt AS (SELECT n_name, c_mktsegment AS seg, count(*)::BIGINT AS n
        FROM j GROUP BY 1, 2)
SELECT n_name,
       string_agg(seg, ',' ORDER BY seg) AS labels,
       string_agg(n::VARCHAR, ',' ORDER BY seg) AS counts
FROM cnt GROUP BY 1"""


def sql_user_value_flags(threshold: float = 50.0) -> str:
    return f"""
SELECT user_id,
       sum(CASE WHEN value >= {threshold} THEN 1 ELSE 0 END)::BIGINT AS n_true,
       sum(CASE WHEN value >= {threshold} THEN 0 ELSE 1 END)::BIGINT AS n_false
FROM events GROUP BY 1"""


def sql_region_rollup() -> str:
    """Twin of ``relational.tree_rollup`` over the region→nation→customer
    hierarchy: per-node subtree leaf (customer) counts at both levels."""
    return """
WITH j AS (SELECT r.r_name, n.n_name
           FROM customer c
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey)
SELECT 'nation:' || n_name AS node_id, CAST(1 AS BIGINT) AS node_level,
       count(*)::BIGINT AS n_leaves
FROM j GROUP BY 1, 2
UNION ALL
SELECT 'region:' || r_name, CAST(0 AS BIGINT), count(*)::BIGINT
FROM j GROUP BY 1, 2"""


def sql_embedding_near_dups(threshold: float = 0.3) -> str:
    """Twin of ``similarity.embedding_near_dup_pairs``: exact cosine
    threshold join, each unordered pair once (id_a < id_b)."""
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.e, b.e), 6) AS cosine
FROM v a JOIN v b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= {threshold}"""


def sql_dag_closure(cap: int = 4096) -> str:
    """Twin of ``q_dag_closure``: recursive-CTE ancestry pairs incl. self."""
    return f"""
WITH RECURSIVE keys AS (
  SELECT DISTINCT p_partkey AS k FROM part WHERE p_partkey <= {cap}
),
e2 AS (
  SELECT child, parent FROM (
    SELECT k AS child, k // 2 AS parent FROM keys WHERE k // 2 >= 1 AND k // 2 <> k
    UNION
    SELECT k, k // 3 FROM keys WHERE k // 3 >= 1 AND k // 3 <> k
  ) WHERE parent IN (SELECT k FROM keys)
),
up(node, anc) AS (
  SELECT k, k FROM keys
  UNION
  SELECT u.node, e2.parent FROM up u JOIN e2 ON e2.child = u.anc
)
SELECT 'n' || node AS node, 'n' || anc AS ancestor FROM up"""


def _ec_raw_values() -> str:
    from .config import DEFAULT_EC_TRANSFER_RAW

    rows = []
    for old, succs in sorted(DEFAULT_EC_TRANSFER_RAW.items()):
        if not succs:
            rows.append(f"('{old}', NULL)")
        for s in succs:
            rows.append(f"('{old}', '{s}')")
    return ", ".join(rows)


def sql_ec_chain_resolve() -> str:
    """Twin of ``q_ec_chain_resolve``: the RAW transfer map goes into SQL and
    the recursive CTE does the chain-following independently — terminals are
    ids never transferred; deleted chains end at NULL and resolve to ''."""
    return f"""
WITH RECURSIVE raw(old, succ) AS (VALUES {_ec_raw_values()}),
ecs AS (
  SELECT p_partkey,
         (p_partkey % 9 + 1) || '.' || (p_partkey % 7 + 1) || '.'
         || (p_partkey % 5 + 1) || '.' || (p_partkey % 11 + 1) AS ec
  FROM part
),
distinct_ec AS (SELECT DISTINCT ec FROM ecs),
chase(ec, cur) AS (
  SELECT ec, ec FROM distinct_ec
  UNION
  SELECT c.ec, r.succ FROM chase c JOIN raw r ON c.cur = r.old
),
term AS (
  SELECT DISTINCT ec, cur FROM chase
  WHERE cur IS NOT NULL AND cur NOT IN (SELECT old FROM raw)
),
resolved AS (
  SELECT d.ec, coalesce(string_agg(t.cur, '|' ORDER BY t.cur), '') AS resolved
  FROM distinct_ec d LEFT JOIN term t ON d.ec = t.ec
  GROUP BY d.ec
)
SELECT e.p_partkey, e.ec, r.resolved
FROM ecs e JOIN resolved r ON e.ec = r.ec"""


def sql_dag_closure_levels(cap: int = 4096) -> str:
    """Twin of ``q_dag_closure_levels``: recursive-CTE root-path depths over
    the key-derived DAG (parents k//2 and k//3); UNION dedup keeps the state
    space at nodes × max_depth."""
    return f"""
WITH RECURSIVE keys AS (
  SELECT DISTINCT p_partkey AS k FROM part WHERE p_partkey <= {cap}
),
e2 AS (
  SELECT child, parent FROM (
    SELECT k AS child, k // 2 AS parent FROM keys WHERE k // 2 >= 1 AND k // 2 <> k
    UNION
    SELECT k, k // 3 FROM keys WHERE k // 3 >= 1 AND k // 3 <> k
  ) WHERE parent IN (SELECT k FROM keys)
),
paths(node, depth) AS (
  SELECT k, 0 FROM keys WHERE k NOT IN (SELECT child FROM e2)
  UNION
  SELECT e2.child, p.depth + 1 FROM paths p JOIN e2 ON e2.parent = p.node
)
SELECT 'n' || node AS node, min(depth)::BIGINT AS min_depth,
       max(depth)::BIGINT AS max_depth,
       (min(depth) <> max(depth)) AS is_best_effort
FROM paths GROUP BY 1"""


def _tree_prune_ctes(cap: int) -> str:
    """Shared CTE chain (hier, seeds, anchors, kept) for the tree-prune
    family — the synthetic TCDB-like code tree, seed anchoring, and the
    bidirectional prune."""
    return f"""hier AS (
  SELECT (c + 1)::VARCHAR AS code FROM range(3) t(c)
  UNION ALL
  SELECT (c + 1) || '.' || chr((65 + l)::INTEGER) FROM range(3) t(c), range(5) u(l)
  UNION ALL
  SELECT (c + 1) || '.' || chr((65 + l)::INTEGER) || '.' || (f + 1)
  FROM range(3) t(c), range(5) u(l), range(7) v(f)
  UNION ALL
  SELECT (c + 1) || '.' || chr((65 + l)::INTEGER) || '.' || (f + 1) || '.' || (s + 1)
  FROM range(3) t(c), range(5) u(l), range(7) v(f), range(5) w(s)
),
seeds AS (
  SELECT DISTINCT CASE
    WHEN k % 13 = 0 THEN '9.Z.9.9'
    WHEN k % 2 = 1 THEN base || '.' || (k % 6 + 1)
    ELSE base END AS seed
  FROM (
    SELECT k, (k % 3 + 1) || '.' || chr((65 + k % 5)::INTEGER) || '.' || (k % 7 + 1)
              || '.' || (k % 4 + 1) AS base
    FROM (SELECT DISTINCT p_partkey AS k FROM part WHERE p_partkey <= {cap})
  )
),
anchors AS (
  SELECT seed,
         CASE WHEN seed IN (SELECT code FROM hier) THEN seed
              ELSE (SELECT code FROM hier
                    WHERE seed LIKE code || '.%'
                    ORDER BY length(code) DESC LIMIT 1) END AS anchor
  FROM seeds
),
kept AS (
  SELECT DISTINCT h.code FROM hier h
  JOIN anchors a ON a.anchor IS NOT NULL
                AND (a.anchor = h.code OR a.anchor LIKE h.code || '.%')
  UNION
  SELECT DISTINCT h.code FROM hier h
  JOIN anchors a ON a.anchor IS NOT NULL AND h.code LIKE a.anchor || '.%'
)"""


def sql_tree_prune(cap: int = 4096) -> str:
    """Twin of ``q_tree_prune``: the curated code tree is generated from the
    same ranges; anchor = longest dot-prefix present (find_ancestor); kept =
    prefixes ∪ extensions of every anchor; unresolvable seeds surface as
    alias rows with anchor ''."""
    return f"""
WITH {_tree_prune_ctes(cap)}
SELECT 'kept' AS kind, code AS id, '' AS anchor FROM kept
UNION ALL
SELECT 'alias', seed, coalesce(anchor, '')
FROM anchors WHERE seed NOT IN (SELECT code FROM hier)"""


def sql_tree_prune_rollup(cap: int = 4096) -> str:
    """Twin of ``q_tree_prune_rollup`` (A12 composition): per-node substrate
    sets union up the FULL tree (self + all dot-descendants) BEFORE the
    prune, so every kept node's set is single-hop complete even where the
    prune removed intermediate descendants."""
    sub = "'s_' || replace(d.code, '.', '_')"
    return f"""
WITH {_tree_prune_ctes(cap)},
rolled AS (
  SELECT h.code,
         count(DISTINCT d.code)::BIGINT AS n_substrates,
         string_agg(DISTINCT {sub}, '|' ORDER BY {sub}) AS substrates
  FROM hier h JOIN hier d ON d.code = h.code OR d.code LIKE h.code || '.%'
  GROUP BY 1
)
SELECT k.code AS id, r.n_substrates, r.substrates
FROM kept k JOIN rolled r ON r.code = k.code"""


def sql_vocab_top_terms(k: int = 50) -> str:
    return f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
cnt AS (SELECT term, count(*)::BIGINT AS n FROM toks WHERE term <> '' GROUP BY 1)
SELECT term, n FROM cnt ORDER BY n DESC, term LIMIT {k}"""


def sql_doc_quality_filter(min_quality: int = 2) -> str:
    """Twin of ``text.quality_filter``: keep/drop + comma-joined reason codes
    (``concat_ws`` skips NULL parts — same semantics as the numpy join)."""
    return f"""
WITH st AS ({sql_text_stats()})
SELECT doc_id, quality, (quality >= {min_quality}) AS keep,
       concat_ws(',',
         CASE WHEN n_tokens < 20 THEN 'short_tokens' END,
         CASE WHEN n_chars < 100 THEN 'short_chars' END,
         CASE WHEN stop_ratio < 0.05 THEN 'low_stopword' END
       ) AS reason
FROM st"""


def sql_doc_tfidf_top_terms(k: int = 5) -> str:
    """Twin of ``text.doc_tfidf_top_terms``: tf · ln(N/df) per (doc, term)
    quantized to the integer micro-score floor(score·10⁶) (numpy's and
    DuckDB's ln differ in the last ulp — floats never enter the compared
    output or the rank key), top-``k`` per doc, (tfidf_q DESC, term ASC)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM toks WHERE term <> '' GROUP BY 1, 2
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         floor(tf.tf * ln(n.n / df.df) * 1000000)::BIGINT AS tfidf_q
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf_q DESC, term
  ) AS rk FROM scored
)
SELECT doc_id, term, tf, df, tfidf_q FROM ranked WHERE rk <= {k}"""


def sql_hopping_event_counts(window_s: int = 3600, hop_s: int = 900) -> str:
    """Twin of ``events.hopping_window_agg`` over the events table: an event
    at t belongs to every hop-aligned window start in (t - window, t] —
    exactly window/hop of them."""
    k = window_s // hop_s
    hop_us = hop_s * 1_000_000
    return f"""
SELECT event_type,
       make_timestamp(((epoch_us(ts) // {hop_us}) - j) * {hop_us}) AS window_start,
       count(value)::BIGINT AS n_events,
       max(value) AS max_value
FROM events CROSS JOIN (SELECT unnest(range({k})) AS j) r
GROUP BY 1, 2"""


def sql_urgent_window_shipments(days: int = 60) -> str:
    """Twin of the ``range_join`` demo: shipments falling in each urgent
    order's [orderdate, orderdate + days) attribution window."""
    return f"""
WITH urgent AS (
  SELECT o_orderkey, o_orderdate AS w_start,
         o_orderdate + INTERVAL {days} DAY AS w_end
  FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT o_orderkey, count(*)::BIGINT AS n_shipments, sum(l_quantity) AS sum_qty
FROM urgent u JOIN lineitem l
  ON l.l_shipdate >= u.w_start AND l.l_shipdate < u.w_end
GROUP BY 1"""


# -------------------------------------------------------- sampling / splits


def _split_case(key_expr: str, splits, salt: str) -> str:
    """CASE expression twin of ``sampling.hash_split`` — built from the SAME
    ``_thresholds`` integer cuts so engine and oracle agree row-for-row."""
    from .stages.sampling import PRECISION, _thresholds

    cuts = _thresholds(list(splits))
    if len(cuts) == 1:  # degenerate single split: CASE with no WHEN is a parse error
        return f"'{cuts[0][0]}'"
    b = f"(('0x' || substr(md5('{salt}:' || {key_expr}), 1, 8))::UBIGINT % {PRECISION})"
    whens = " ".join(
        f"WHEN {b} < {hi} THEN '{name}'" for name, hi in cuts[:-1]
    )
    return f"CASE {whens} ELSE '{cuts[-1][0]}' END"


def sql_doc_split_assign(splits=(("train", 0.8), ("val", 0.1), ("test", 0.1))) -> str:
    return f"""
SELECT doc_id, {_split_case('doc_id', splits, 'split')} AS split FROM documents"""


def sql_order_split_counts(splits=(("train", 0.8), ("val", 0.1), ("test", 0.1))) -> str:
    """Key-stable split check: every lineitem of an order lands in the
    order's split; counts per split of rows AND distinct keys."""
    return f"""
SELECT {_split_case('l_orderkey', splits, 'split')} AS split,
       count(*)::BIGINT AS n_rows,
       count(DISTINCT l_orderkey)::BIGINT AS n_keys
FROM lineitem GROUP BY 1"""


def sql_doc_group_cap(cap: int = 8, salt: str = "cap") -> str:
    """Twin of ``sampling.group_cap`` over documents grouped by
    (source, lang): row_number() over the same md5-bucket priority."""
    from .stages.sampling import PRECISION

    b = f"(('0x' || substr(md5('{salt}:' || doc_id), 1, 8))::UBIGINT % {PRECISION})"
    return f"""
SELECT doc_id, source, lang FROM (
  SELECT doc_id, source, lang,
         row_number() OVER (PARTITION BY source, lang ORDER BY {b}, doc_id) AS rn
  FROM documents) WHERE rn <= {cap}"""


def sql_doc_shuffle_positions(salt: str = "shuffle") -> str:
    """Twin of ``sampling.shuffle_positions`` over documents."""
    return f"""
SELECT doc_id,
       (row_number() OVER (
          ORDER BY ('0x' || substr(md5('{salt}:' || doc_id), 1, 15))::UBIGINT,
                   doc_id) - 1)::BIGINT AS shuffle_pos
FROM documents"""


def sql_doc_mixture_sample(shares=None, salt: str = "mix") -> str:
    """Twin of ``sampling.mixture_sample`` over documents strata = lang.
    The rate math mirrors the engine's float-op order exactly: T = min(n/w),
    cut = floor(((w*T)/n) * PRECISION) — IEEE-identical doubles both sides."""
    from .stages.sampling import PRECISION

    shares = shares or {"en": 0.4, "zh": 0.2, "es": 0.2, "de": 0.1, "fr": 0.1}
    vals = ", ".join(f"('{s}', {w!r}::DOUBLE)" for s, w in shares.items())
    b = f"(('0x' || substr(md5('{salt}:' || d.doc_id), 1, 8))::UBIGINT % {PRECISION})"
    return f"""
WITH c AS (SELECT lang AS s, count(*)::BIGINT AS n FROM documents GROUP BY 1),
w(s, w) AS (VALUES {vals}),
t AS (SELECT min(n / w) AS T FROM c JOIN w USING (s) WHERE n > 0 AND w > 0),
r AS (SELECT s, CAST(floor(((w * T) / n) * {PRECISION}) AS BIGINT) AS cut
      FROM c JOIN w USING (s), t WHERE n > 0 AND w > 0)
SELECT d.doc_id, d.lang FROM documents d JOIN r ON d.lang = r.s
WHERE {b} < r.cut"""


def sql_events_stratified_sample(rates=None, default_rate: float = 0.05) -> str:
    from .stages.sampling import PRECISION

    rates = rates or {"signup": 1.0, "purchase": 0.5}
    b = f"(('0x' || substr(md5('sample:' || event_id), 1, 8))::UBIGINT % {PRECISION})"
    whens = " ".join(
        f"WHEN event_type = '{s}' THEN {round(r * PRECISION)}" for s, r in rates.items()
    )
    cut = f"CASE {whens} ELSE {round(default_rate * PRECISION)} END"
    return f"""
SELECT event_id, event_type FROM events WHERE {b} < {cut}"""


def _ndc_ctes(
    k: int = 3,
    min_jaccard: float = 0.5,
    cap: int = 1000,
    pre: str = "",
    scope: str = "",
) -> str:
    """Shared CTE chain for near-dup clustering: jaccard edges (strictly >
    ``min_jaccard``, hot-shingle cap mirrored) → transitive closure
    (recursive CTE) → min-doc-id component label in ``base``; docs in no
    pair are their own singleton cluster. ``pre`` injects leading CTEs (for
    composed pipelines that filter the corpus first); ``scope`` is a join
    clause appended after every ``FROM documents`` so clustering runs over
    the filtered survivor set only (e.g. ``JOIN q USING (doc_id)``)."""
    return f"""
WITH RECURSIVE {pre}{_shingle_cte(where=scope, k=k)},
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
capped AS (
  SELECT doc_id, shingle,
         row_number() OVER (PARTITION BY shingle ORDER BY doc_id) AS rn
  FROM sh
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.rn <= {cap} AND b.rn <= {cap}
  GROUP BY 1, 2
),
jp AS (
  SELECT doc_a, doc_b
  FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
  WHERE n_shared::DOUBLE / (sa.sz + sb.sz - n_shared)::DOUBLE > {min_jaccard}
),
edges AS (SELECT doc_a AS a, doc_b AS b FROM jp UNION SELECT doc_b, doc_a FROM jp),
reach AS (
  SELECT a AS node, b AS peer FROM edges
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.peer
),
lab AS (SELECT node, least(node, min(peer))::BIGINT AS cluster_id FROM reach GROUP BY 1),
base AS (
  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id)::BIGINT AS cluster_id
  FROM documents d {scope} LEFT JOIN lab l ON d.doc_id = l.node
)"""


def sql_near_dup_clusters(k: int = 3, min_jaccard: float = 0.5, cap: int = 1000) -> str:
    """Twin of ``dedup.near_dup_clusters ∘ ngram_jaccard_pairs`` over the
    FULL corpus: one row per doc with its component label, component size,
    and the min-doc-id keeper flag."""
    return f"""{_ndc_ctes(k, min_jaccard, cap)}
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size,
       (doc_id = cluster_id) AS is_canonical
FROM base"""


def sql_near_dup_split(
    splits=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
    k: int = 3,
    min_jaccard: float = 0.5,
    cap: int = 1000,
) -> str:
    """Twin of the leakage-safe split: hash_split keyed on the near-dup
    CLUSTER label, so near-duplicate documents can never straddle
    train/val/test."""
    return f"""{_ndc_ctes(k, min_jaccard, cap)}
SELECT doc_id, cluster_id, {_split_case('cluster_id', splits, 'split')} AS split
FROM base"""


def sql_corpus_prep(
    min_quality: int = 2,
    shares=None,
    splits=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
    k: int = 3,
    min_jaccard: float = 0.5,
    cap: int = 1000,
    mix_salt: str = "mix",
) -> str:
    """Twin of the composed corpus-prep flagship: quality gate → near-dup
    cluster dedup over survivors (canonicals only) → lang-mixture resample
    (rates computed over the POST-dedup counts, same float-op order as
    ``sampling.mixture_sample``) → leakage-safe split keyed on the cluster
    label."""
    from .stages.sampling import PRECISION

    shares = shares or {"en": 0.4, "zh": 0.2, "es": 0.2, "de": 0.1, "fr": 0.1}
    vals = ", ".join(f"('{s}', {w!r}::DOUBLE)" for s, w in shares.items())
    pre = (
        f"st AS ({sql_text_stats()}), "
        f"q AS (SELECT doc_id FROM st WHERE quality >= {min_quality}), "
    )
    b = f"(('0x' || substr(md5('{mix_salt}:' || cd.doc_id), 1, 8))::UBIGINT % {PRECISION})"
    return f"""{_ndc_ctes(k, min_jaccard, cap, pre=pre, scope="JOIN q USING (doc_id)")},
cd AS (
  SELECT d.doc_id, d.lang, base.cluster_id
  FROM base JOIN documents d USING (doc_id)
  WHERE base.doc_id = base.cluster_id
),
c AS (SELECT lang AS s, count(*)::BIGINT AS n FROM cd GROUP BY 1),
w(s, w) AS (VALUES {vals}),
t AS (SELECT min(n / w) AS T FROM c JOIN w USING (s) WHERE n > 0 AND w > 0),
r AS (SELECT s, CAST(floor(((w * T) / n) * {PRECISION}) AS BIGINT) AS cut
      FROM c JOIN w USING (s), t WHERE n > 0 AND w > 0)
SELECT cd.doc_id, cd.lang,
       {_split_case('cd.cluster_id', splits, 'split')} AS split
FROM cd JOIN r ON cd.lang = r.s
WHERE {b} < r.cut"""


CANARY = "EVAL CANARY ALPHA BETA GAMMA DELTA"


def sql_decontaminate(k: int = 3, bench_mod: int = 101, bench_rem: int = 7,
                      leak_mod: int = 13, leak_rem: int = 3) -> str:
    """Twin of ``corpus.decontaminate`` over the canary-leaked corpus (the
    query appends a fixed canary phrase to docs with ``doc_id % leak_mod ==
    leak_rem`` on BOTH sides, so benchmark docs that carry it seed real
    contamination hits instead of a vacuous all-zero pass). Benchmark docs
    (``doc_id % bench_mod == bench_rem``) are excluded from the output."""
    txt = (
        f"coalesce(text, '') || CASE WHEN doc_id % {leak_mod} = {leak_rem} "
        f"THEN ' {CANARY}' ELSE '' END"
    )
    norm = f"lower(trim(regexp_replace({txt}, '\\s+', ' ', 'g')))"
    return f"""
WITH d AS (SELECT doc_id, {norm} AS t FROM documents),
tok AS (SELECT doc_id, string_split(t, ' ') AS tk FROM d),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(tk[(i + 1)::BIGINT:(i + {k})::BIGINT], ' ') AS shingle
  FROM (SELECT doc_id, tk, unnest(range((len(tk) - {k - 1})::BIGINT)) AS i
        FROM tok WHERE len(tk) >= {k})
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {bench_mod} = {bench_rem}),
agg AS (
  SELECT c.doc_id, count(*) AS n_ngrams, count(b.shingle) AS n_hits
  FROM (SELECT * FROM sh WHERE doc_id % {bench_mod} <> {bench_rem}) c
  LEFT JOIN bench b USING (shingle)
  GROUP BY 1
)
SELECT doc_id, n_ngrams::BIGINT AS n_ngrams, n_hits::BIGINT AS n_hits,
       (n_hits > 0) AS contaminated
FROM agg"""


def sql_doc_repetition_stats(top_ppm: int = 200_000, dup_ppm: int = 200_000) -> str:
    """Twin of ``corpus.doc_repetition_stats``: exact integer ppm arithmetic
    (``(1000000 * c) // total`` — floor division of non-negatives matches
    numpy) over normalized tokens; docs with empty normalized text excluded;
    < 2 tokens → dup_2gram_ppm = 0."""
    return f"""
WITH d AS (SELECT doc_id, {_NORM} AS t FROM documents),
tok AS (SELECT doc_id, string_split(t, ' ') AS tk FROM d WHERE t <> ''),
w AS (SELECT doc_id, unnest(tk) AS w FROM tok),
wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
tw AS (SELECT doc_id, sum(c) AS n_tokens, max(c) AS max_c FROM wc GROUP BY 1),
g AS (
  SELECT doc_id, array_to_string(tk[(i + 1)::BIGINT:(i + 2)::BIGINT], ' ') AS g2
  FROM (SELECT doc_id, tk, unnest(range((len(tk) - 1)::BIGINT)) AS i
        FROM tok WHERE len(tk) >= 2)
),
gc AS (SELECT doc_id, g2, count(*) AS c FROM g GROUP BY 1, 2),
gs AS (SELECT doc_id, sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_occ,
              sum(c) AS tot
       FROM gc GROUP BY 1)
SELECT t.doc_id, t.n_tokens::BIGINT AS n_tokens,
       ((1000000 * t.max_c) // t.n_tokens)::BIGINT AS top_word_ppm,
       coalesce((1000000 * g.dup_occ) // g.tot, 0)::BIGINT AS dup_2gram_ppm,
       (((1000000 * t.max_c) // t.n_tokens) >= {top_ppm}
        OR coalesce((1000000 * g.dup_occ) // g.tot, 0) >= {dup_ppm}) AS flagged
FROM tw t LEFT JOIN gs g USING (doc_id)"""


def sql_user_cumulative_value() -> str:
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_id, user_id, ts, {v} AS cents FROM events)
SELECT event_id, user_id, ts,
       sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_value_cents
FROM e"""


def sql_user_rolling_value(window: int = 7) -> str:
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_id, user_id, ts, {v} AS cents FROM events)
SELECT event_id, user_id, ts,
       sum(cents) OVER w::BIGINT AS win_sum_cents,
       count(*) OVER w::BIGINT AS win_n
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)"""


def sql_event_lag_delta() -> str:
    return """
SELECT event_id, user_id, ts,
       (epoch_us(ts) - epoch_us(
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       ))::BIGINT AS delta_us
FROM events"""


def sql_event_lead_delta() -> str:
    return """
SELECT event_id, user_id, ts,
       (epoch_us(
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       ) - epoch_us(ts))::BIGINT AS next_delta_us
FROM events"""


def sql_events_rollup() -> str:
    v = CENTS.format(col="value")
    return f"""
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, {v} AS cents FROM events
)
SELECT event_type, hour, count(*)::BIGINT AS n,
       sum(cents)::BIGINT AS sum_value_cents
FROM e GROUP BY ROLLUP(event_type, hour)"""


def sql_embedding_centroids() -> str:
    # the inner CAST to DOUBLE is load-bearing: FLOAT * 1000000.0 resolves
    # to single-precision FLOAT arithmetic in DuckDB and disagrees with the
    # engine's float64 quantization at floor boundaries (~0.2% of elements)
    return """
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS ppm
  FROM embeddings
)
SELECT label, dim::BIGINT AS dim, count(*)::BIGINT AS n_vecs,
       (sum(ppm)::DOUBLE / count(*)) AS mean_ppm
FROM ex GROUP BY 1, 2"""


def sql_doc_unigram_score() -> str:
    """Twin of ``text.doc_unigram_score``: per-token corpus frequency is
    quantized to int ppm BEFORE any aggregation (identical double ops both
    sides), so the per-doc mean is exact-int division — no float sums."""
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
cnt AS (SELECT term, count(*)::BIGINT AS n FROM tk GROUP BY 1),
tot AS (SELECT sum(n)::BIGINT AS total FROM cnt),
freq AS (
  SELECT term, CAST(floor(CAST(n AS DOUBLE) * 1000000 / total) AS BIGINT) AS ppm
  FROM cnt CROSS JOIN tot
),
ds AS (
  SELECT t.doc_id, sum(f.ppm)::BIGINT AS s, count(*)::BIGINT AS n_tokens
  FROM tk t JOIN freq f USING (term) GROUP BY 1
)
SELECT doc_id, n_tokens, (s::DOUBLE / n_tokens) AS mean_freq_ppm FROM ds"""


def sql_events_winsorized(q_lo: float = 0.01, q_hi: float = 0.99) -> str:
    """Twin of ``relational.clip_to_group_quantiles`` over events/cents."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_id, event_type, {v} AS cents FROM events),
thr AS (SELECT event_type,
               quantile_disc(cents, {q_lo}) AS lo,
               quantile_disc(cents, {q_hi}) AS hi
        FROM e GROUP BY 1)
SELECT e.event_id, e.event_type, e.cents,
       least(greatest(e.cents, thr.lo), thr.hi)::BIGINT AS clipped
FROM e JOIN thr USING (event_type)"""


def sql_events_above_p99(q: float = 0.99) -> str:
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_id, event_type, {v} AS cents FROM events),
thr AS (SELECT event_type, quantile_disc(cents, {q}) AS thr FROM e GROUP BY 1)
SELECT e.event_id, e.event_type, e.cents
FROM e JOIN thr USING (event_type) WHERE e.cents > thr.thr"""


def sql_bm25_docs(
    terms: list[str], k1: float = 1.2, b: float = 0.75, k: int = 10
) -> str:
    """Twin of ``text.bm25_topk``: per-(doc, query-term) BM25 contribution
    quantized to floor(score·10⁶) BIGINT, summed as integers per doc (so
    the ranking is partition-order-free), (bm25_q DESC, doc_id) LIMIT k.
    Float-op ORDER matches the engine's numpy expression left-to-right;
    all bare literals are ::DOUBLE (DuckDB parses 1.2 as DECIMAL)."""
    tl = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tok2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
dl AS (
  SELECT d.doc_id, count(t.term)::BIGINT AS dl
  FROM documents d LEFT JOIN tok2 t USING (doc_id) GROUP BY 1
),
stats AS (
  SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tok2 WHERE term IN ({tl}) GROUP BY 1, 2
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         floor(
           ln((n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) + 1.0::DOUBLE)
           * ((tf * ({k1}::DOUBLE + 1.0::DOUBLE))
              / (tf + {k1}::DOUBLE
                 * ((1.0::DOUBLE - {b}::DOUBLE)
                    + ({b}::DOUBLE * dl) / avgdl)))
           * 1000000.0::DOUBLE
         )::BIGINT AS sq
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, sum(sq)::BIGINT AS bm25_q, count(*)::BIGINT AS n_terms
FROM scored GROUP BY 1 ORDER BY bm25_q DESC, doc_id LIMIT {k}"""


def sql_event_user_kmv(k: int = 64, salt: str = "kmv") -> str:
    """Twin of ``sampling.distinct_kmv`` over (events.event_type,
    events.user_id): identical md5-derived 60-bit hash, k smallest distinct
    hashes per group, (k−1)·2⁶⁰/h₍ₖ₎ estimate (exact count below k)."""
    esc = salt.replace("'", "''")
    return f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5('{esc}:' || user_id), 1, 15))::UBIGINT::BIGINT AS _h
  FROM events
),
r AS (
  SELECT event_type, _h,
         row_number() OVER (PARTITION BY event_type ORDER BY _h) AS rn
  FROM h
),
kept AS (
  SELECT event_type, count(*)::BIGINT AS n_kept, max(_h)::BIGINT AS kth
  FROM r WHERE rn <= {k} GROUP BY 1
)
SELECT event_type, n_kept,
       CASE WHEN n_kept >= {k}
            THEN floor((({k}::DOUBLE - 1.0::DOUBLE)
                        * 1152921504606846976.0::DOUBLE) / kth)::BIGINT
            ELSE n_kept END AS distinct_est
FROM kept"""


def sql_user_event_skew(top_n: int = 20) -> str:
    """Twin of ``relational.key_skew_report`` over events.user_id: top-N
    keys by count with integer-ppm share (``//`` floor division)."""
    return f"""
WITH c AS (SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS tot FROM c)
SELECT c.user_id, c.n, ((c.n * 1000000) // t.tot)::BIGINT AS share_ppm
FROM c CROSS JOIN t ORDER BY n DESC, user_id LIMIT {top_n}"""


def sql_events_zscore() -> str:
    """Twin of ``relational.group_zscore`` over events/cents per event_type:
    z rearranged to integer group sums — (n·x − Σx)/√(n·Σx² − (Σx)²) — so
    both engines derive identical doubles from identical int64 aggregates
    (sqrt/division are IEEE-correctly-rounded: bit-exact, no ulp caveat).
    NULL when the group variance is zero."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_id, event_type, {v} AS cents FROM events),
st AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
         sum(cents * cents)::BIGINT AS s2
  FROM e GROUP BY 1
)
SELECT e.event_id, e.event_type, e.cents,
       CASE WHEN (n::DOUBLE * s2 - s::DOUBLE * s) > 0.0::DOUBLE
            THEN floor(((n * e.cents - s) * 1000000.0::DOUBLE)
                       / sqrt(n::DOUBLE * s2 - s::DOUBLE * s))::BIGINT
            ELSE NULL END AS zscore_ppm
FROM e JOIN st USING (event_type)"""


def sql_cohort_retention() -> str:
    """Twin of ``events.cohort_retention``: integer month keys
    (ym = year·12 + month), first-month cohort per user, distinct active
    (user, month), users counted per (cohort, offset)."""
    return """
WITH m AS (
  SELECT DISTINCT user_id::BIGINT AS u,
         (date_part('year', ts)::BIGINT * 12 + date_part('month', ts)::BIGINT) AS ym
  FROM events
),
c AS (SELECT u, min(ym) AS cohort_ym FROM m GROUP BY 1)
SELECT c.cohort_ym, (m.ym - c.cohort_ym) AS month_offset,
       count(*)::BIGINT AS n_users
FROM m JOIN c USING (u) GROUP BY 1, 2"""


def sql_event_transitions() -> str:
    """Twin of ``events.event_transitions``: lag(event_type) OVER
    (PARTITION BY user ORDER BY ts, event_id), non-null bigram counts."""
    return """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type, count(*)::BIGINT AS n
FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2"""


def sql_funnel_signup_purchase(type_a: str = "signup", type_b: str = "purchase") -> str:
    """Twin of ``events.funnel_2step``: first-A per user, any later B."""
    a = type_a.replace("'", "''")
    b = type_b.replace("'", "''")
    return f"""
WITH fa AS (
  SELECT user_id, min(ts) AS ta FROM events WHERE event_type = '{a}' GROUP BY 1
),
ab AS (
  SELECT DISTINCT f.user_id
  FROM fa f JOIN events e
    ON e.user_id = f.user_id AND e.event_type = '{b}' AND e.ts > f.ta
)
SELECT (SELECT count(*) FROM fa)::BIGINT AS n_a,
       (SELECT count(*) FROM ab)::BIGINT AS n_ab,
       (((SELECT count(*) FROM ab) * 1000000)
        // greatest((SELECT count(*) FROM fa), 1))::BIGINT AS conv_ppm"""


def sql_cross_corpus_lsh(cap: int = 1000) -> str:
    """Twin of ``dedup.cross_corpus_lsh_pairs`` with the query's even/odd
    doc_id corpus split: same banding as lsh_candidate_pairs, union-wide
    row_number cap, only cross-side pairs."""
    inner = sql_minhash_bands().strip()
    return f"""
WITH band AS ({inner}),
sided AS (
  SELECT doc_id, band_idx, band_hash, (doc_id % 2)::BIGINT AS side FROM band
),
capped AS (
  SELECT *, row_number() OVER (PARTITION BY band_idx, band_hash
                               ORDER BY doc_id) AS rn
  FROM sided
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared_bands
FROM capped a
JOIN capped b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id AND a.side <> b.side
WHERE a.rn <= {cap} AND b.rn <= {cap}
GROUP BY 1, 2"""


def sql_doc_importance_sample(salt: str = "imp") -> str:
    """Twin of the ``doc_importance_sample`` query: acceptance threshold is
    pure integer math — ppm = least(n_chars, 2000)·500 — compared against
    the identical md5 bucket used by every split/sample operator."""
    from .stages.sampling import PRECISION

    esc = salt.replace("'", "''")
    b = f"(('0x' || substr(md5('{esc}:' || doc_id), 1, 8))::UBIGINT % {PRECISION})"
    return f"""
SELECT doc_id, n_chars
FROM documents
WHERE {b} < least(n_chars, 2000) * 500"""


def sql_events_debounce(gap_us: int = 3_600_000_000) -> str:
    """Twin of ``events.debounce_events``: lag(ts) per (user, type) ordered
    (ts, event_id); keep when no predecessor or the µs gap exceeds the
    window."""
    return f"""
WITH s AS (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS pts
  FROM events
)
SELECT event_id, user_id, event_type, ts FROM s
WHERE pts IS NULL OR date_diff('microsecond', pts, ts) > {gap_us}"""


def sql_orders_skew_join() -> str:
    """Twin of the ``orders_skew_join`` query: a plain inner join — the
    engine's hot/cold ROUTING must not change the row set."""
    return """
SELECT o_orderkey, o_custkey, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey"""


def sql_orders_snapshot_diff() -> str:
    """Twin of the ``orders_snapshot_diff`` query: old = even-key orders'
    priority, new = all orders with F-status priorities rewritten — the
    full-outer diff classifies added/removed/changed."""
    return """
WITH old AS (
  SELECT o_orderkey::VARCHAR AS k, o_orderpriority AS v
  FROM orders WHERE o_orderkey % 2 = 0
),
new AS (
  SELECT o_orderkey::VARCHAR AS k,
         CASE WHEN o_orderstatus = 'F' THEN 'DONE' ELSE o_orderpriority END AS v
  FROM orders
)
SELECT coalesce(old.k, new.k) AS o_orderkey,
       CASE WHEN old.k IS NULL THEN 'added'
            WHEN new.k IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       old.v AS old_val, new.v AS new_val
FROM old FULL OUTER JOIN new ON old.k = new.k
WHERE old.k IS NULL OR new.k IS NULL OR old.v <> new.v"""


def sql_events_psi_drift(edges: list[int] | None = None) -> str:
    """Twin of the ``events_psi_drift`` query: even-event_id events as the
    base snapshot, odd as current; fixed CASE buckets; Laplace-smoothed
    proportions; psi_q = floor((p − q)·ln(p/q)·10⁶)."""
    edges = edges or [0, 1000, 5000, 20000]
    B = len(edges) + 1
    v = CENTS.format(col="value")
    whens = " ".join(
        f"WHEN cents < {e} THEN {i}" for i, e in enumerate(edges)
    )
    return f"""
WITH e AS (
  SELECT event_id, {v} AS cents,
         CASE {whens} ELSE {len(edges)} END AS bucket
  FROM events
),
b AS (SELECT bucket, count(*)::BIGINT AS n FROM e WHERE event_id % 2 = 0 GROUP BY 1),
c AS (SELECT bucket, count(*)::BIGINT AS n FROM e WHERE event_id % 2 = 1 GROUP BY 1),
tot AS (
  SELECT (SELECT coalesce(sum(n), 0) FROM b)::BIGINT AS tb,
         (SELECT coalesce(sum(n), 0) FROM c)::BIGINT AS tc
),
buckets AS (SELECT unnest(range({B})) AS bucket)
SELECT k.bucket,
       coalesce(b.n, 0)::BIGINT AS n_base,
       coalesce(c.n, 0)::BIGINT AS n_curr,
       floor(
         (((coalesce(b.n, 0) + 1.0::DOUBLE) / (tb + {B}))
          - ((coalesce(c.n, 0) + 1.0::DOUBLE) / (tc + {B})))
         * ln(((coalesce(b.n, 0) + 1.0::DOUBLE) / (tb + {B}))
              / ((coalesce(c.n, 0) + 1.0::DOUBLE) / (tc + {B})))
         * 1000000.0::DOUBLE
       )::BIGINT AS psi_q
FROM buckets k
LEFT JOIN b ON b.bucket = k.bucket
LEFT JOIN c ON c.bucket = k.bucket
CROSS JOIN tot"""


def sql_user_interval_coverage() -> str:
    """Twin of ``events.coalesce_intervals`` over synthetic event activity
    windows [ts, ts + (60 + event_id % 3540) s): the exclusive running max
    of earlier ends (``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``)
    decides island starts and each interval's novel coverage — pure int64
    µs arithmetic, bit-exact vs the segmented cummax scan."""
    return """
WITH iv AS (
  SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + (60 + event_id % 3540) * 1000000 AS e
  FROM events
),
w AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM iv
)
SELECT user_id,
       sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)::BIGINT AS n_islands,
       sum(greatest(0, e - greatest(s, coalesce(pmax, s))))::BIGINT AS covered_us,
       count(*)::BIGINT AS n_intervals
FROM w GROUP BY user_id"""


def sql_part_price_corr() -> str:
    """Twin of ``relational.group_corr`` over lineitem per part: Pearson r
    between quantity and extended price (both in cents), rearranged to the
    five exact int64 cross-moment sums, finalized in doubles with the exact
    promote-then-multiply op order the engine mirrors — bit-exact floor(r·10⁶),
    NULL on zero variance."""
    x = CENTS.format(col="l_quantity")
    y = CENTS.format(col="l_extendedprice")
    return f"""
WITH e AS (
  SELECT l_partkey::BIGINT AS l_partkey, {x} AS x, {y} AS y FROM lineitem
),
st AS (
  SELECT l_partkey, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy,
         sum(x*y)::BIGINT AS sxy
  FROM e GROUP BY 1
)
SELECT l_partkey, n,
       CASE WHEN (n::DOUBLE * sxx - sx::DOUBLE * sx) > 0.0::DOUBLE
             AND (n::DOUBLE * syy - sy::DOUBLE * sy) > 0.0::DOUBLE
            THEN floor(((n::DOUBLE * sxy - sx::DOUBLE * sy) * 1000000.0::DOUBLE)
                       / (sqrt(n::DOUBLE * sxx - sx::DOUBLE * sx)
                          * sqrt(n::DOUBLE * syy - sy::DOUBLE * sy)))::BIGINT
            ELSE NULL END AS corr_ppm
FROM st"""


def sql_orders_profile() -> str:
    """Twin of ``relational.profile_table`` over orders: per-column counts,
    null counts, exact distincts, min/max (ints compared numerically then
    stringified; money in cents, timestamps in epoch µs)."""
    c = CENTS.format(col="o_totalprice")

    def block(label: str, expr: str) -> str:
        return f"""SELECT '{label}' AS col_name, count(*)::BIGINT AS n,
       (count(*) - count({expr}))::BIGINT AS n_null,
       count(DISTINCT {expr})::BIGINT AS n_distinct,
       min({expr})::VARCHAR AS min_val, max({expr})::VARCHAR AS max_val
FROM orders"""

    parts = [
        block("o_orderkey", "o_orderkey"),
        block("o_custkey", "o_custkey"),
        block("o_totalprice_cents", c),
        block("o_orderdate_us", "epoch_us(o_orderdate)"),
        block("o_orderstatus", "o_orderstatus"),
        block("o_orderpriority", "o_orderpriority"),
    ]
    return "\nUNION ALL\n".join(parts)


def sql_substring_dup_pairs(window: int = 48, stride: int = 16, cap: int = 1000) -> str:
    """Twin of ``dedup.substring_dup_pairs``: strided raw-text substr
    windows, distinct per doc, self-joined on window equality under the
    same ascending row_number cap."""
    return f"""
WITH w AS (
  SELECT DISTINCT doc_id, substr(text, (i * {stride} + 1)::BIGINT, {window}) AS win
  FROM (SELECT doc_id, text,
               unnest(range(((len(text) - {window}) // {stride} + 1)::BIGINT)) AS i
        FROM documents WHERE len(text) >= {window})
),
capped AS (
  SELECT doc_id, win, row_number() OVER (PARTITION BY win ORDER BY doc_id) AS rn
  FROM w
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared_windows
FROM capped a JOIN capped b ON a.win = b.win AND a.doc_id < b.doc_id
WHERE a.rn <= {cap} AND b.rn <= {cap}
GROUP BY 1, 2"""


def sql_bigram_pmi(min_count: int = 5) -> str:
    """Twin of ``text.bigram_pmi``: adjacent bigrams over the empty-filtered
    space-split token stream, PMI over exact int64 products, floor(·10⁶)."""
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
cnt AS (
  SELECT term, count(*)::BIGINT AS n
  FROM (SELECT unnest(tk) AS term FROM d) GROUP BY 1
),
bi AS (
  SELECT tk[(i + 1)::BIGINT] AS term_a, tk[(i + 2)::BIGINT] AS term_b
  FROM (SELECT tk, unnest(range((len(tk) - 1)::BIGINT)) AS i
        FROM d WHERE len(tk) >= 2)
),
bc AS (SELECT term_a, term_b, count(*)::BIGINT AS n_ab FROM bi GROUP BY 1, 2),
tot AS (SELECT count(*)::BIGINT AS t FROM bi)
SELECT term_a, term_b, n_ab,
       floor(ln((n_ab * t)::DOUBLE / (ca.n * cb.n)::DOUBLE)
             * 1000000.0::DOUBLE)::BIGINT AS pmi_q
FROM bc
JOIN cnt ca ON bc.term_a = ca.term
JOIN cnt cb ON bc.term_b = cb.term
CROSS JOIN tot
WHERE n_ab >= {min_count}"""


def sql_user_type_history() -> str:
    """Twin of ``events.scd2_intervals`` over events (attr = event_type):
    change points via lag of the SAME 60-bit md5 projection the engine
    computes (parity by construction), then lead(ts) over the change-point
    subset for half-open validity intervals."""
    return """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         ('0x' || substr(md5('scd2:' || event_type), 1, 15))::UBIGINT::BIGINT AS h
  FROM events
),
l AS (
  SELECT *, lag(h) OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id) AS ph
  FROM e
),
c AS (SELECT user_id, event_type, ts, event_id FROM l WHERE ph IS NULL OR ph <> h)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY epoch_us(ts), event_id) AS valid_to
FROM c"""


def sql_embedding_inertia(scale: float = 1000.0) -> str:
    """Twin of ``similarity.label_inertia``: milli-quantized elements, pure
    int64 n·Σq² − (Σq)² per dim, integer dim sum — no double aggregation
    anywhere (see the operator docstring for the headroom argument)."""
    return f"""
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM embeddings
),
st AS (
  SELECT label, dim, count(*)::BIGINT AS n, sum(q)::BIGINT AS s,
         sum(q * q)::BIGINT AS s2
  FROM ex GROUP BY 1, 2
)
SELECT label, min(n)::BIGINT AS n_vecs, sum(n * s2 - s * s)::BIGINT AS inertia_q
FROM st GROUP BY label"""


def sql_containment_pairs(
    k: int = 3, min_ppm: int = 300_000, cap: int = 1000
) -> str:
    """Twin of ``dedup.containment_pairs``: same shingle CTE and row_number
    cap as the jaccard twin; score is positive-int floor division
    n_shared·10⁶ // min(|A|,|B|)."""
    return f"""
WITH {_shingle_cte(k=k)},
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
capped AS (
  SELECT doc_id, shingle,
         row_number() OVER (PARTITION BY shingle ORDER BY doc_id) AS rn
  FROM sh
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.rn <= {cap} AND b.rn <= {cap}
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       ((n_shared * 1000000) // greatest(least(sa.sz, sb.sz), 1))::BIGINT
         AS containment_ppm
FROM inter
JOIN sz sa ON doc_a = sa.doc_id
JOIN sz sb ON doc_b = sb.doc_id
WHERE (n_shared * 1000000) // greatest(least(sa.sz, sb.sz), 1) >= {min_ppm}"""


def sql_term_fuzzy_pairs(
    min_count: int = 3,
    min_len: int = 4,
    cap: int = 1000,
    table: str = "documents",
    term_col: str | None = None,
) -> str:
    """Twin of ``text.term_fuzzy_pairs``: SymSpell 1-deletion blocking via
    generate-series substr concat, the same ascending row_number cap, and
    DuckDB ``levenshtein() <= 1`` as the verify (identical semantics to the
    engine's specialized distance-≤1 check). ``term_col=None`` tokenizes
    ``text`` on spaces; otherwise each row of ``table.term_col`` is one
    term (entity-name mode)."""
    toks = (
        f"SELECT unnest(string_split(text, ' ')) AS term FROM {table}"
        if term_col is None
        else f"SELECT {term_col} AS term FROM {table} WHERE {term_col} IS NOT NULL"
    )
    return f"""
WITH toks AS (
  {toks}
),
cnt AS (
  SELECT term, count(*)::BIGINT AS n FROM toks WHERE term <> '' GROUP BY 1
),
t AS (SELECT term FROM cnt WHERE n >= {min_count} AND len(term) >= {min_len}),
del AS (
  SELECT term, substr(term, 1, i) || substr(term, i + 2) AS key
  FROM (SELECT term, unnest(range(len(term)::BIGINT)) AS i FROM t)
  UNION
  SELECT term, term FROM t
),
dd AS (
  SELECT key, term,
         row_number() OVER (PARTITION BY key ORDER BY term) AS rn
  FROM (SELECT DISTINCT key, term FROM del)
),
p AS (
  SELECT DISTINCT a.term AS term_a, b.term AS term_b
  FROM dd a JOIN dd b ON a.key = b.key AND a.term < b.term
  WHERE a.rn <= {cap} AND b.rn <= {cap}
)
SELECT term_a, term_b FROM p WHERE levenshtein(term_a, term_b) <= 1"""


def sql_doc_token_entropy() -> str:
    """Twin of ``text.doc_token_entropy``: same space tokenization as the
    vocab twins; the only floats are the two ln quantizations (identical
    left-associated op order: (n*ln(n))*1e6, ln(N)*1e6), everything after
    is exact int64."""
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS n
  FROM tok WHERE term <> '' GROUP BY 1, 2
),
per AS (
  SELECT doc_id,
         sum(n)::BIGINT AS n_tokens,
         count(*)::BIGINT AS n_terms,
         sum(floor(n::DOUBLE * ln(n::DOUBLE) * 1000000.0)::BIGINT)::BIGINT
           AS nlogn_q
  FROM tf GROUP BY 1
)
SELECT doc_id, n_tokens, n_terms, nlogn_q,
       ((n_tokens * floor(ln(n_tokens::DOUBLE) * 1000000.0)::BIGINT - nlogn_q)
          // n_tokens)::BIGINT AS entropy_uq
FROM per"""


def sql_events_mad_outliers(k: int = 3) -> str:
    """Twin of ``relational.mad_outliers`` over events/cents: both the
    median and the MAD are ``quantile_disc`` group elements (inverted_cdf ==
    the engine's ceil(0.5·n) rank pick), every comparison exact int64."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_id, event_type, {v} AS cents FROM events),
med AS (SELECT event_type, quantile_disc(cents, 0.5)::BIGINT AS med
        FROM e GROUP BY 1),
d AS (SELECT e.event_id, e.event_type, e.cents, med.med,
             abs(e.cents - med.med)::BIGINT AS abs_dev
      FROM e JOIN med USING (event_type)),
mad AS (SELECT event_type, quantile_disc(abs_dev, 0.5)::BIGINT AS mad
        FROM d GROUP BY 1)
SELECT d.event_id, d.event_type, d.cents, d.med, mad.mad, d.abs_dev
FROM d JOIN mad USING (event_type)
WHERE d.abs_dev > {k} * mad.mad"""


def sql_split_balance_audit(
    splits=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
    strata=("lang",),
    salt: str = "split",
) -> str:
    """Twin of ``sampling.split_balance_audit`` over documents: same md5
    CASE buckets, targets inlined as the SAME Python-quantized ppm literals
    (``split_target_ppm``), pure integer floor-div shares."""
    from .stages.sampling import split_target_ppm

    targets = split_target_ppm(list(splits))
    tp = ", ".join(f"('{k}', {v})" for k, v in targets.items())
    sc = ", ".join(strata)
    return f"""
WITH a AS (
  SELECT {sc}, {_split_case('doc_id', splits, salt)} AS split FROM documents
),
c AS (SELECT {sc}, split, count(*)::BIGINT AS n FROM a GROUP BY ALL),
t AS (SELECT {sc}, sum(n)::BIGINT AS stratum_total FROM c GROUP BY ALL),
tp(split, target_ppm) AS (VALUES {tp})
SELECT c.{sc}, c.split, c.n, t.stratum_total,
       ((c.n * 1000000) // greatest(t.stratum_total, 1))::BIGINT AS share_ppm,
       tp.target_ppm::BIGINT AS target_ppm,
       ((c.n * 1000000) // greatest(t.stratum_total, 1) - tp.target_ppm)::BIGINT
         AS dev_ppm
FROM c JOIN t USING ({sc}) JOIN tp USING (split)"""


PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def sql_user_type_pivot(categories=PIVOT_EVENT_TYPES) -> str:
    """Twin of ``relational.pivot_counts`` over events: conditional
    aggregation — one SUM(CASE) per listed category plus COUNT(*); the
    category list is part of the spec (it fixes the schema)."""
    cases = ",\n  ".join(
        f"sum(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END)::BIGINT AS n_{c}"
        for c in categories
    )
    return f"""
SELECT user_id,
  {cases},
  count(*)::BIGINT AS n_total
FROM events GROUP BY user_id"""


def sql_term_heavy_hitters(k: int = 2000) -> str:
    """Twin of ``text.term_heavy_hitters``: same space-split token stream as
    ``sql_vocab_top_terms``, strict n·k > total gate, pure integers."""
    return f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
c AS (SELECT term, count(*)::BIGINT AS n FROM toks WHERE term <> '' GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS tot FROM c)
SELECT term, n FROM c, t WHERE n * {k} > tot"""


def sql_purchase_type_at_ts() -> str:
    """Twin of ``events.point_in_time_join`` composed with
    ``events.scd2_intervals`` over a (user, ts)-deduplicated mutation log:
    the textbook half-open interval join ``ts >= valid_from AND (valid_to IS
    NULL OR ts < valid_to)``. The min-event_id dedup guarantees unique
    (user_id, valid_from) so the interval join is unambiguous — the same
    precondition the engine operator documents."""
    return """
WITH m AS (SELECT user_id, ts, min(event_id) AS event_id FROM events GROUP BY 1, 2),
log AS (
  SELECT e.user_id, e.event_type, e.ts, e.event_id
  FROM events e JOIN m USING (user_id, ts, event_id)
),
e AS (
  SELECT user_id, event_type, ts, event_id,
         ('0x' || substr(md5('scd2:' || event_type), 1, 15))::UBIGINT::BIGINT AS h
  FROM log
),
l AS (
  SELECT *, lag(h) OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id) AS ph
  FROM e
),
c AS (SELECT user_id, event_type, ts, event_id FROM l WHERE ph IS NULL OR ph <> h),
h AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id) AS valid_to
  FROM c
),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts, h.event_type AS type_at_ts
FROM p LEFT JOIN h ON p.user_id = h.user_id AND p.ts >= h.valid_from
  AND (h.valid_to IS NULL OR p.ts < h.valid_to)"""


def sql_orders_cube() -> str:
    """Twin of ``relational.cube_agg`` over orders: GROUP BY CUBE of
    (status, priority), cents-quantized sums."""
    t = CENTS.format(col="o_totalprice")
    return f"""
WITH o AS (
  SELECT o_orderstatus, o_orderpriority, {t} AS total_cents FROM orders
)
SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n,
       sum(total_cents)::BIGINT AS total_cents
FROM o GROUP BY CUBE(o_orderstatus, o_orderpriority)"""


def sql_hopping_unique_users(window_s: int = 3600, hop_s: int = 900) -> str:
    """Twin of ``events.hopping_distinct_count``: same hop-aligned window
    explode as ``sql_hopping_event_counts``, COUNT(DISTINCT user_id)."""
    k = window_s // hop_s
    hop_us = hop_s * 1_000_000
    return f"""
SELECT event_type,
       make_timestamp(((epoch_us(ts) // {hop_us}) - j) * {hop_us}) AS window_start,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events CROSS JOIN (SELECT unnest(range({k})) AS j) r
GROUP BY 1, 2"""


def sql_shipping_priority(cutoff: str = "1998-06-01", k: int = 10) -> str:
    """Twin of the TPC-H-Q3-analog ``q_shipping_priority``: exact integer e4
    revenue (cents(price) · (100 − cents(discount))), deterministic
    (revenue desc, orderkey asc) top-k."""
    p = CENTS.format(col="l_extendedprice")
    d = CENTS.format(col="l_discount")
    return f"""
WITH l AS (
  SELECT l_orderkey, {p} * (100 - {d}) AS rev_e4
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{cutoff}'
),
o AS (
  SELECT o_orderkey, o_orderdate
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '{cutoff}'
)
SELECT l.l_orderkey, o.o_orderdate, sum(l.rev_e4)::BIGINT AS revenue_e4
FROM l JOIN o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
ORDER BY revenue_e4 DESC, l_orderkey LIMIT {k}"""


def sql_order_quartiles(k: int = 4) -> str:
    """Twin of ``relational.ntile_over`` over orders: SQL NTILE + the same
    integer-ppm percent_rank (floor((rn−1)·10⁶/(n−1)), 0 for n=1)."""
    t = CENTS.format(col="o_totalprice")
    return f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority, {t} AS total_cents FROM orders
)
SELECT o_orderkey, o_orderpriority, total_cents,
       CAST(ntile({k}) OVER w AS BIGINT) AS ntile,
       CAST((row_number() OVER w - 1) * 1000000
            // greatest(count(*) OVER (PARTITION BY o_orderpriority) - 1, 1)
            AS BIGINT) AS pct_rank_ppm
FROM o
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY total_cents, o_orderkey)"""


def sql_session_type_overlap(gap_minutes: int = 30) -> str:
    """Twin of ``joins.interval_overlap_join`` composed over ``sessionize``
    (half-open session = [start_ts, end_ts + 1µs)) and ``scd2_intervals``
    (NULL valid_to clamped to 2100-01-01): strict-< overlap join, exact µs
    overlap length."""
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
f AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM o
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM f
),
sess AS (
  SELECT user_id, session_idx::BIGINT AS session_idx,
         epoch_us(min(ts)) AS s_start, epoch_us(max(ts)) + 1 AS s_end
  FROM s GROUP BY 1, 2
),
e AS (
  SELECT user_id, event_type, ts, event_id,
         ('0x' || substr(md5('scd2:' || event_type), 1, 15))::UBIGINT::BIGINT AS h
  FROM events
),
l AS (
  SELECT *, lag(h) OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id) AS ph
  FROM e
),
c AS (SELECT user_id, event_type, ts, event_id FROM l WHERE ph IS NULL OR ph <> h),
hist AS (
  SELECT user_id, event_type, epoch_us(ts) AS v_start,
         coalesce(
           epoch_us(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)),
           epoch_us(TIMESTAMP '2100-01-01')
         ) AS v_end
  FROM c
)
SELECT sess.user_id, sess.session_idx, hist.event_type,
       make_timestamp(hist.v_start) AS valid_from,
       (least(sess.s_end, hist.v_end)
          - greatest(sess.s_start, hist.v_start))::BIGINT AS overlap_us
FROM sess JOIN hist ON sess.user_id = hist.user_id
  AND sess.s_start < hist.v_end AND hist.v_start < sess.s_end"""


def sql_sorted_neighborhood(w: int = 5) -> str:
    """Twin of ``dedup.sorted_neighborhood_pairs`` over documents ordered by
    (lang, n_tokens, doc_id): the self-join on row_number distance < w."""
    return f"""
WITH d AS (
  SELECT doc_id, lang,
         CASE WHEN text = '' THEN 0
              ELSE len(string_split(text, ' ')) END::BIGINT AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY lang, n_tokens, doc_id) - 1 AS idx
  FROM d
)
SELECT least(a.doc_id, b.doc_id) AS doc_a,
       greatest(a.doc_id, b.doc_id) AS doc_b,
       (b.idx - a.idx)::BIGINT AS idx_dist
FROM r a JOIN r b ON b.idx > a.idx AND b.idx - a.idx < {w}"""


def sql_orders_bloom_join() -> str:
    """Twin of ``joins.bloom_prefilter_join`` (the skew_join contract: the
    bloom prefilter admits false positives and the exact join removes them,
    so the oracle is the PLAIN inner join)."""
    return """
SELECT o_orderkey, o_custkey, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'"""


def sql_orders_loo_priority() -> str:
    """Twin of ``relational.loo_group_mean`` over orders keyed by
    o_orderpriority: leave-one-out mean of the OTHER orders' totalprice in
    the row's priority class — exact BIGINT sums, one integer floor
    division (all-positive, so DuckDB's truncating ``//`` == numpy floor),
    NULL for singleton groups."""
    c = CENTS.format(col="o_totalprice")
    return f"""
WITH o AS (SELECT o_orderkey, o_orderpriority, {c} AS cents FROM orders),
g AS (SELECT o_orderpriority, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s
      FROM o GROUP BY 1)
SELECT o.o_orderkey, o.o_orderpriority, o.cents,
       (g.n - 1)::BIGINT AS loo_n,
       CASE WHEN g.n > 1 THEN ((g.s - o.cents) // (g.n - 1))::BIGINT
            ELSE NULL END AS loo_mean_cents
FROM o JOIN g USING (o_orderpriority)"""


def sql_doc_bigram_score() -> str:
    """Twin of ``text.doc_bigram_score``: per-bigram add-one-smoothed
    conditional probability quantized to int ppm BEFORE any aggregation
    (identical double op order both sides — promote, ·10⁶, divide, floor),
    context counts derived from the bigram table, V = corpus distinct-token
    vocabulary; the per-doc mean is exact-int division. Docs with < 2
    tokens emit nothing."""
    return """
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
uni AS (SELECT count(DISTINCT term)::BIGINT AS v
        FROM (SELECT unnest(tk) AS term FROM d)),
bi AS (
  SELECT doc_id, tk[(i + 1)::BIGINT] AS a, tk[(i + 2)::BIGINT] AS b
  FROM (SELECT doc_id, tk, unnest(range((len(tk) - 1)::BIGINT)) AS i
        FROM d WHERE len(tk) >= 2)
),
bc AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM bi GROUP BY 1, 2),
ctx AS (SELECT a, sum(n_ab)::BIGINT AS n_a FROM bc GROUP BY 1),
q AS (SELECT bc.a, bc.b,
             floor((bc.n_ab + 1)::DOUBLE * 1000000
                   / (ctx.n_a + uni.v)::DOUBLE)::BIGINT AS ppm
      FROM bc JOIN ctx USING (a) CROSS JOIN uni),
ds AS (SELECT bi.doc_id, sum(q.ppm)::BIGINT AS s, count(*)::BIGINT AS n_bigrams
       FROM bi JOIN q ON bi.a = q.a AND bi.b = q.b GROUP BY 1)
SELECT doc_id, n_bigrams, (s::DOUBLE / n_bigrams) AS mean_cond_ppm FROM ds"""


def sql_user_trailing_1h() -> str:
    """Twin of ``window.rolling_range_sum_over`` over events: trailing
    1-hour per-user cents sum + count, SQL RANGE frame (peers included on
    both sides of the current row)."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_id, user_id, ts, {v} AS cents FROM events)
SELECT event_id, user_id, ts,
       sum(cents) OVER w::BIGINT AS win_sum_cents,
       count(*) OVER w::BIGINT AS win_n
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""


def sql_user_cumulative_types() -> str:
    """Twin of the ranked_over + cumsum_over composition: running distinct
    event-type count per user — first occurrences flagged by row_number()
    over (user, type), then a running sum of the flags ((ts, event_id) is
    unique per user, so the default RANGE frame equals the engine's ROWS
    scan)."""
    return """
SELECT event_id, user_id, ts,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id)::BIGINT AS n_types
FROM (SELECT event_id, user_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)"""


def sql_order_share_of_customer() -> str:
    """Twin of ``q_order_share_of_customer``: per-order share of the
    customer's lifetime spend as exact integer ppm (all-positive BIGINT
    ``//``)."""
    c = CENTS.format(col="o_totalprice")
    return f"""
WITH o AS (SELECT o_orderkey, o_custkey, {c} AS cents FROM orders)
SELECT o_orderkey, o_custkey, cents,
       (cents * 1000000 // sum(cents) OVER (PARTITION BY o_custkey))::BIGINT
         AS share_ppm
FROM o"""


def sql_user_value_trend() -> str:
    """Twin of ``relational.group_slope`` over events per user: OLS slope of
    cents on epoch-days (DuckDB BIGINT ``//`` floors, matching the engine's
    floor_div_i64), exact int64 cross-moments, the corr twins' exact double
    op order, floor(slope·10⁶), NULL on zero x-variance."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS x, {v} AS y
           FROM events),
st AS (SELECT user_id, count(*)::BIGINT AS n,
              sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
              sum(x*x)::BIGINT AS sxx, sum(x*y)::BIGINT AS sxy
       FROM e GROUP BY 1)
SELECT user_id, n,
       CASE WHEN (n::DOUBLE * sxx - sx::DOUBLE * sx) > 0.0::DOUBLE
            THEN floor(((n::DOUBLE * sxy - sx::DOUBLE * sy) * 1000000.0::DOUBLE)
                       / (n::DOUBLE * sxx - sx::DOUBLE * sx))::BIGINT
            ELSE NULL END AS slope_q
FROM st"""


def sql_event_value_histogram(k: int = 8) -> str:
    """Twin of ``q_event_value_histogram``: equi-depth NTILE(k) buckets per
    event type (tie-broken by event_id, SQL's exact first-tiles-bigger
    rule), then per-bucket count + boundary cents."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_id, event_type, {v} AS cents FROM events),
t AS (SELECT event_type, cents,
             ntile({k}) OVER (PARTITION BY event_type
                              ORDER BY cents, event_id) AS bucket
      FROM e)
SELECT event_type, bucket::BIGINT AS bucket, count(*)::BIGINT AS n,
       min(cents)::BIGINT AS lo_cents, max(cents)::BIGINT AS hi_cents
FROM t GROUP BY 1, 2"""


def sql_user_peak_1h() -> str:
    """Twin of ``window.rolling_range_max_over`` over events: trailing
    1-hour per-user max cents + count, SQL RANGE frame (peers included)."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_id, user_id, ts, {v} AS cents FROM events)
SELECT event_id, user_id, ts,
       max(cents) OVER w::BIGINT AS win_max_cents,
       count(*) OVER w::BIGINT AS win_n
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""


def sql_signup_to_purchase() -> str:
    """Twin of the forward as-of (``asof_last_marker`` on negated time):
    each signup's earliest strictly-following purchase in (ts, event_id)
    order + latency µs, NULL when the user never purchased after it."""
    return """
WITH s AS (
  SELECT event_id, user_id, ts, event_type,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS next_purchase_ts
  FROM events
)
SELECT event_id, user_id, ts, next_purchase_ts,
       (epoch_us(next_purchase_ts) - epoch_us(ts))::BIGINT AS latency_us
FROM s WHERE event_type = 'signup'"""


def sql_priority_size_factors() -> str:
    """Twin of ``relational.median_log_ratio_factors`` over the customer ×
    priority order-count matrix: floor(ln·10⁶) quantize-then-integer
    discipline, DESeq all-samples gene filter, ×S-scaled log-ratios,
    discrete (quantile_disc == ceil(n/2) rank) median per sample."""
    return """
WITH c AS (SELECT o_custkey, o_orderpriority, count(*)::BIGINT AS cnt
           FROM orders GROUP BY 1, 2),
q AS (SELECT o_custkey, o_orderpriority,
             floor(ln(cnt::DOUBLE) * 1000000)::BIGINT AS qln
      FROM c),
s AS (SELECT count(DISTINCT o_orderpriority)::BIGINT AS ns FROM c),
g AS (SELECT o_custkey, count(*)::BIGINT AS k, sum(qln)::BIGINT AS t
      FROM q GROUP BY 1),
fg AS (SELECT o_custkey, t FROM g CROSS JOIN s WHERE g.k = s.ns),
lr AS (SELECT q.o_orderpriority, (q.qln * s.ns - fg.t)::BIGINT AS lr
       FROM q JOIN fg USING (o_custkey) CROSS JOIN s)
SELECT o_orderpriority, count(*)::BIGINT AS n_genes,
       quantile_disc(lr, 0.5)::BIGINT AS med_lr_scaled
FROM lr GROUP BY 1"""


def sql_priority_quantile_norm() -> str:
    """Twin of ``relational.quantile_normalize`` over the customer ×
    priority count matrix: complete-matrix gene filter, row_number ranks
    tie-broken by the gene key, per-rank exact integer reference mean
    (Σ // S)."""
    return """
WITH c AS (SELECT o_custkey, o_orderpriority, count(*)::BIGINT AS cnt
           FROM orders GROUP BY 1, 2),
s AS (SELECT count(DISTINCT o_orderpriority)::BIGINT AS ns FROM c),
g AS (SELECT o_custkey FROM c GROUP BY 1
      HAVING count(*) = (SELECT ns FROM s)),
f AS (SELECT c.* FROM c JOIN g USING (o_custkey)),
r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY cnt, o_custkey) AS rnk
      FROM f),
ref AS (SELECT rnk, (sum(cnt) // (SELECT ns FROM s))::BIGINT AS norm_cnt
        FROM r GROUP BY 1)
SELECT r.o_custkey, r.o_orderpriority, r.cnt, r.rnk::BIGINT AS rnk,
       ref.norm_cnt
FROM r JOIN ref USING (rnk)"""


def sql_purchase_click_utest() -> str:
    """Twin of ``relational.mann_whitney_u`` over purchase-vs-click cents:
    doubled midranks from the value-cardinality exclusive running count
    (2·N_less + c + 1), u2 = ΣcG·mid2 − n(n+1), integer-// AUC ppm."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_type AS grp, {v} AS cents FROM events
           WHERE event_type IN ('purchase', 'click')),
cv AS (SELECT cents, count(*)::BIGINT AS c FROM e GROUP BY 1),
mr AS (SELECT cents,
              (2 * coalesce(sum(c) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1)::BIGINT AS mid2
       FROM cv),
tot AS (SELECT sum(c)::BIGINT AS total FROM cv),
gv AS (SELECT grp, cents, count(*)::BIGINT AS cg FROM e GROUP BY 1, 2),
st AS (SELECT grp, sum(cg)::BIGINT AS n, sum(cg * mid2)::BIGINT AS r2
       FROM gv JOIN mr USING (cents) GROUP BY 1)
SELECT grp AS event_type, n,
       (r2 - n * (n + 1))::BIGINT AS u2,
       CASE WHEN (total - n) > 0
            THEN ((r2 - n * (n + 1)) * 1000000 // (2 * n * (total - n)))::BIGINT
            ELSE NULL END AS auc_ppm
FROM st CROSS JOIN tot"""


def sql_purchase_click_welch() -> str:
    """Twin of ``relational.welch_t`` over purchase-vs-click cents: exact
    int64 conditional moments, then the engine finalize's EXACT double op
    order — ma = sa/na, va = (qa − sa·sa/na)/(na−1), sea = va/na,
    t² = floor(d·d·10⁶ / (sea+seb)), Welch–Satterthwaite df in millis.
    NULL stats when either n ≤ 1 or the pooled standard error is zero."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_type AS grp, {v} AS cents FROM events
           WHERE event_type IN ('purchase', 'click')),
st AS (SELECT
  sum(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS na,
  sum(CASE WHEN grp = 'purchase' THEN cents ELSE 0 END)::BIGINT AS sa,
  sum(CASE WHEN grp = 'purchase' THEN cents * cents ELSE 0 END)::BIGINT AS qa,
  sum(CASE WHEN grp = 'click' THEN 1 ELSE 0 END)::BIGINT AS nb,
  sum(CASE WHEN grp = 'click' THEN cents ELSE 0 END)::BIGINT AS sb,
  sum(CASE WHEN grp = 'click' THEN cents * cents ELSE 0 END)::BIGINT AS qb
  FROM e),
m AS (SELECT na, nb,
  sa::DOUBLE / na::DOUBLE AS ma, sb::DOUBLE / nb::DOUBLE AS mb,
  CASE WHEN na > 1 AND nb > 1 THEN
    ((qa::DOUBLE - (sa::DOUBLE * sa::DOUBLE) / na::DOUBLE)
       / (na::DOUBLE - 1.0)) / na::DOUBLE ELSE NULL END AS sea,
  CASE WHEN na > 1 AND nb > 1 THEN
    ((qb::DOUBLE - (sb::DOUBLE * sb::DOUBLE) / nb::DOUBLE)
       / (nb::DOUBLE - 1.0)) / nb::DOUBLE ELSE NULL END AS seb
  FROM st)
SELECT na AS n_a, nb AS n_b,
  CASE WHEN sea + seb > 0.0
       THEN floor(((ma - mb) * (ma - mb) * 1000000.0) / (sea + seb))::BIGINT
       ELSE NULL END AS t2_micro,
  CASE WHEN sea + seb > 0.0
       THEN floor(((sea + seb) * (sea + seb) * 1000.0)
                  / ((sea * sea) / (na::DOUBLE - 1.0)
                     + (seb * seb) / (nb::DOUBLE - 1.0)))::BIGINT
       ELSE NULL END AS df_milli
FROM m"""


def sql_user_churn_labels(
    feature_window_s: int = 30 * 86400, label_window_s: int = 7 * 86400
) -> str:
    """Twin of ``q_user_churn_labels``: data-midpoint cutoff, per-type
    conditional counts over the trailing feature window, binary
    purchase-within-label-window label, feature-window-active users only."""
    fw = feature_window_s * 1_000_000
    lw = label_window_s * 1_000_000
    types = ("click", "error", "purchase", "signup", "view")
    feats = ",\n  ".join(
        f"sum(CASE WHEN us > cutoff - {fw} AND us <= cutoff"
        f" AND event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS n_{t}"
        for t in types
    )
    tot = " + ".join(f"n_{t}" for t in types)
    return f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
mm AS (SELECT (min(us) + max(us)) // 2 AS cutoff FROM e),
a AS (SELECT user_id,
  {feats},
  (sum(CASE WHEN us > cutoff AND us <= cutoff + {lw}
            AND event_type = 'purchase' THEN 1 ELSE 0 END) > 0)::BIGINT
    AS label
  FROM e CROSS JOIN mm GROUP BY 1)
SELECT * FROM a WHERE {tot} > 0"""


def sql_doc_hashed_features(n_features: int = 256, salt: str = "fh") -> str:
    """Twin of ``q_doc_hashed_features``: identical md5 60-bit bucket per
    term, (doc, feature) cell counts."""
    esc = salt.replace("'", "''")
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
tk AS (SELECT doc_id::BIGINT AS doc_id,
              (('0x' || substr(md5('{esc}:' || term), 1, 15))::UBIGINT
               % {n_features})::BIGINT AS feature_idx
       FROM tok WHERE term <> '')
SELECT doc_id, feature_idx, count(*)::BIGINT AS n
FROM tk GROUP BY 1, 2"""


def sql_doc_length_calibration(k: int = 10) -> str:
    """Twin of ``q_doc_length_calibration``: NTILE(k) over (n_chars,
    doc_id), per-decile positive rate in integer ppm."""
    return f"""
WITH d AS (SELECT doc_id, n_chars::BIGINT AS score,
                  (lang = 'en')::BIGINT AS pos FROM documents),
t AS (SELECT pos, ntile({k}) OVER (ORDER BY score, doc_id) AS decile FROM d),
a AS (SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_docs,
             sum(pos)::BIGINT AS n_pos FROM t GROUP BY 1)
SELECT decile, n_docs, n_pos,
       (n_pos * 1000000 // CASE WHEN n_docs > 0 THEN n_docs ELSE 1 END)::BIGINT
         AS pos_rate_ppm
FROM a"""


def sql_source_hapax_ratio() -> str:
    """Twin of ``q_source_hapax_ratio``: per-source distinct-term and
    within-source hapax counts, integer ppm ratio."""
    return """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
             FROM documents),
c AS (SELECT source, term, count(*)::BIGINT AS n FROM tok
      WHERE term <> '' GROUP BY 1, 2),
a AS (SELECT source, count(*)::BIGINT AS n_terms,
             sum((n = 1)::BIGINT)::BIGINT AS n_hapax FROM c GROUP BY 1)
SELECT source, n_terms, n_hapax,
       (n_hapax * 1000000
        // CASE WHEN n_terms > 0 THEN n_terms ELSE 1 END)::BIGINT
         AS hapax_ppm
FROM a"""


def sql_transition_model_eval() -> str:
    """Twin of ``q_transition_model_eval``: lag transitions, data-midpoint
    temporal split, per-state majority model (count desc, type asc) fit on
    pre-cutoff cells, top-1 accuracy on post-cutoff cells."""
    return """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
mm AS (SELECT (min(us) + max(us)) // 2 AS cutoff FROM e),
s AS (SELECT user_id, event_type, us,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id) AS prev
      FROM e),
tr AS (SELECT prev, event_type AS cur,
              (us > (SELECT cutoff FROM mm)) AS is_eval
       FROM s WHERE prev IS NOT NULL),
cells AS (SELECT prev, cur, is_eval, count(*)::BIGINT AS n
          FROM tr GROUP BY 1, 2, 3),
train AS (SELECT prev, cur AS pred,
                 row_number() OVER (PARTITION BY prev
                                    ORDER BY n DESC, cur) AS rn
          FROM cells WHERE NOT is_eval),
model AS (SELECT prev, pred FROM train WHERE rn = 1),
ev AS (SELECT c.cur, c.n, m.pred FROM cells c
       LEFT JOIN model m ON m.prev = c.prev WHERE c.is_eval),
st AS (SELECT
  (SELECT coalesce(sum(n), 0)::BIGINT FROM cells WHERE NOT is_eval)
    AS n_train,
  coalesce(sum(n), 0)::BIGINT AS n_eval,
  coalesce(sum(CASE WHEN cur = pred THEN n ELSE 0 END), 0)::BIGINT
    AS n_correct
  FROM ev)
SELECT n_train, n_eval, n_correct,
       CASE WHEN n_eval > 0 THEN (n_correct * 1000000 // n_eval)::BIGINT
            ELSE NULL END AS accuracy_ppm
FROM st"""


def sql_doc_length_f1() -> str:
    """Twin of ``q_doc_length_f1``: per-distinct-score positives/totals,
    descending-score window cumsums, integer F1 = 2·TP·10⁶ // (PP + P),
    (f1 desc, threshold asc) LIMIT 1."""
    return """
WITH d AS (SELECT n_chars::BIGINT AS score, (lang = 'en')::BIGINT AS pos
           FROM documents),
c AS (SELECT score, sum(pos)::BIGINT AS p, count(*)::BIGINT AS t
      FROM d GROUP BY 1),
cw AS (SELECT score,
              sum(p) OVER (ORDER BY score DESC
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS tp,
              sum(t) OVER (ORDER BY score DESC
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS pt
       FROM c),
tot AS (SELECT sum(pos)::BIGINT AS pp FROM d)
SELECT score AS threshold, tp, (pt - tp)::BIGINT AS fp,
       (pp - tp)::BIGINT AS fn,
       ((2 * tp * 1000000) // (pt + pp))::BIGINT AS f1_micro
FROM cw CROSS JOIN tot
ORDER BY f1_micro DESC, threshold ASC LIMIT 1"""


def sql_embedding_covariance(scale: int = 1000) -> str:
    """Twin of ``similarity.embedding_covariance``: quantize-first milli
    ints, exact pairwise product sums via a per-vector dim self-join,
    floor-corrected (n·Σxy − Σx·Σy) // n on the possibly-negative
    numerator (DuckDB // truncates toward zero)."""
    return f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}.0) AS BIGINT)
           AS q
  FROM embeddings
),
g AS (SELECT a.dim::BIGINT AS dim_i, b.dim::BIGINT AS dim_j,
             sum(a.q * b.q)::BIGINT AS sxy
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
      GROUP BY 1, 2),
d AS (SELECT dim::BIGINT AS dim, count(*)::BIGINT AS n, sum(q)::BIGINT AS s
      FROM ex GROUP BY 1),
t AS (SELECT max(n)::BIGINT AS nv FROM d)
SELECT g.dim_i, g.dim_j, t.nv AS n_vecs,
       ((t.nv * g.sxy - di.s * dj.s) // t.nv
        - CASE WHEN (t.nv * g.sxy - di.s * dj.s) < 0
                    AND ((t.nv * g.sxy - di.s * dj.s) % t.nv) <> 0
               THEN 1 ELSE 0 END)::BIGINT AS cov_m2
FROM g
JOIN d di ON di.dim = g.dim_i
JOIN d dj ON dj.dim = g.dim_j
CROSS JOIN t"""


def sql_embedding_top_pc(iters: int = 3) -> str:
    """Twin of ``similarity.embedding_top_pc``: the covariance twin as a
    subquery, symmetric expansion, ``iters`` unrolled integer power steps —
    HUGEINT matvec sums (order-free exact), floor-corrected renormalization
    on the possibly-negative components."""
    cov = sql_embedding_covariance().strip()
    parts = [
        f"cov AS ({cov})",
        "sym AS (SELECT dim_i AS i, dim_j AS j, cov_m2 AS c FROM cov\n"
        "        UNION ALL\n"
        "        SELECT dim_j, dim_i, cov_m2 FROM cov WHERE dim_i <> dim_j)",
        "v0 AS (SELECT DISTINCT i AS dim, 1000000::HUGEINT AS val FROM sym)",
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""w{it} AS (SELECT s.i AS dim,
        sum(s.c::HUGEINT * v.val)::HUGEINT AS w
        FROM sym s JOIN v{it - 1} v ON v.dim = s.j GROUP BY 1)"""
        )
        parts.append(f"m{it} AS (SELECT max(abs(w))::HUGEINT AS m FROM w{it})")
        parts.append(
            f"""v{it} AS (SELECT dim,
        CASE WHEN m = 0 THEN w
             ELSE (w * 1000000) // m
                  - CASE WHEN (w * 1000000) < 0
                              AND ((w * 1000000) % m) <> 0
                         THEN 1 ELSE 0 END
        END::HUGEINT AS val
        FROM w{it} CROSS JOIN m{it})"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT dim, val::BIGINT AS v_micro FROM v{iters}"
    )


def sql_event_type_anova() -> str:
    """Twin of ``relational.anova_f`` over event-type cents: per-group
    exact int64 moments, HUGEINT A = Σ s²//n and B = S²//N floors —
    bit-identical integer F, no float anywhere."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_type AS g, {v} AS v FROM events),
st AS (SELECT g, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
              sum(v * v)::BIGINT AS q FROM e GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS nn, sum(s)::HUGEINT AS ss,
             sum(q)::HUGEINT AS qq, count(*)::BIGINT AS k,
             sum((s::HUGEINT * s::HUGEINT) // n)::HUGEINT AS a
      FROM st)
SELECT nn AS n_rows, k AS k_groups,
  CASE WHEN k >= 2 AND nn > k AND (qq - a) > 0
       THEN ((1000000::HUGEINT * (a - (ss * ss) // nn) * (nn - k))
             // ((k - 1) * (qq - a)))::BIGINT
       ELSE NULL END AS f_micro
FROM t"""


def sql_lineitem_weighted_median() -> str:
    """Twin of ``relational.weighted_median`` over lineitem per return
    flag: quantity-weighted lower median of extended-price cents —
    (group, value) weight cells, window cumsum in value order,
    2·cum ≥ W in pure integers."""
    v = CENTS.format(col="l_extendedprice")
    return f"""
WITH e AS (SELECT l_returnflag, {v} AS v,
                  CAST(round(l_quantity, 0) AS BIGINT) AS w FROM lineitem),
c AS (SELECT l_returnflag, v, sum(w)::BIGINT AS w FROM e GROUP BY 1, 2),
cw AS (SELECT l_returnflag, v, w,
              sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cw
       FROM c),
t AS (SELECT l_returnflag, sum(w)::BIGINT AS total_weight FROM c GROUP BY 1)
SELECT t.l_returnflag, t.total_weight, min(cw.v)::BIGINT AS wmedian
FROM cw JOIN t USING (l_returnflag)
WHERE 2 * cw.cw >= t.total_weight
GROUP BY 1, 2"""


def sql_source_mixture_plan(budget_tokens: int = 100_000) -> str:
    """Twin of ``q_source_mixture_plan``: per-source whitespace token
    supply, weight = numeric source suffix + 1, integer need / capped
    rate_ppm / epochs_milli."""
    return f"""
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
             FROM documents),
tk AS (SELECT source, count(*)::BIGINT AS tokens FROM tok
       WHERE term <> '' GROUP BY 1),
w AS (SELECT source, tokens,
             (substr(source, 4)::BIGINT + 1)::BIGINT AS weight FROM tk),
t AS (SELECT sum(weight)::BIGINT AS tw FROM w),
m AS (SELECT source, tokens, weight,
             (({budget_tokens} * weight) // tw)::BIGINT AS need_tokens
      FROM w CROSS JOIN t)
SELECT source, tokens, weight, need_tokens,
       least(1000000, (need_tokens * 1000000)
             // (CASE WHEN tokens > 0 THEN tokens ELSE 1 END))::BIGINT
         AS rate_ppm,
       ((need_tokens * 1000)
        // (CASE WHEN tokens > 0 THEN tokens ELSE 1 END))::BIGINT
         AS epochs_milli
FROM m"""


def sql_term_cms_audit(
    k: int = 20, width: int = 1024, depth: int = 4, salt: str = "cms"
) -> str:
    """Twin of ``sampling.cms_estimate`` over corpus terms: identical
    md5-derived per-row hashes (md5('{salt}<r>:' || term) → 60-bit %
    width), cells built from the exact count aggregate, min over rows."""
    h = (
        f"('0x' || substr(md5('{salt}' || {{r}} || ':' || {{t}}), 1, 15))"
        f"::UBIGINT % {width}"
    )
    return f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
tk AS (SELECT term FROM tok WHERE term <> ''),
cnt AS (SELECT term, count(*)::BIGINT AS n FROM tk GROUP BY 1),
cells AS (
  SELECT r, {h.format(r="r", t="term")} AS cell, sum(n)::BIGINT AS cn
  FROM cnt CROSS JOIN (SELECT unnest(range({depth})) AS r) rr
  GROUP BY 1, 2
),
topk AS (SELECT term, n FROM cnt ORDER BY n DESC, term LIMIT {k})
SELECT t.term, t.n AS true_n, min(c.cn)::BIGINT AS cms_est
FROM topk t
CROSS JOIN (SELECT unnest(range({depth})) AS r2) r2s
JOIN cells c ON c.r = r2 AND c.cell = {h.format(r="r2", t="t.term")}
GROUP BY 1, 2"""


def sql_purchase_value_jackknife(n_blocks: int = 32) -> str:
    """Twin of ``relational.block_jackknife`` over user-blocked purchase
    cents: the same md5 bucket % n_blocks assignment, leave-out means
    quantized to micro FIRST, exact integer deviation sums."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT user_id, {v} AS cents FROM events
           WHERE event_type = 'purchase'),
b AS (SELECT ((('0x' || substr(md5('jk:' || user_id), 1, 8))::UBIGINT
              % 1000000) % {n_blocks})::BIGINT AS blk, cents FROM e),
g AS (SELECT blk, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s
      FROM b GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS nn, sum(s)::BIGINT AS ss,
             count(*)::BIGINT AS bb FROM g),
q AS (SELECT ((1000000 * (ss - s)) // (nn - n))::BIGINT AS qi
      FROM g CROSS JOIN t),
mb AS (SELECT (sum(qi) // (SELECT bb FROM t))::BIGINT AS mbar FROM q),
d AS (SELECT sum((qi - mbar) * (qi - mbar))::BIGINT AS sd
      FROM q CROSS JOIN mb)
SELECT (SELECT nn FROM t) AS n_rows, (SELECT bb FROM t) AS n_blocks,
       ((1000000 * (SELECT ss FROM t)) // (SELECT nn FROM t))::BIGINT
         AS mean_micro,
       CASE WHEN (SELECT bb FROM t) >= 2
            THEN ((((SELECT bb FROM t) - 1) * sd) // (SELECT bb FROM t))::BIGINT
            ELSE NULL END AS jk_var_micro2
FROM d"""


def sql_pk_duplicate_audit() -> str:
    """Twin of ``q_pk_duplicate_audit``: per-table row / distinct-key /
    duplicate counts, composite key via a DISTINCT subquery."""
    singles = [
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("part", "p_partkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
    ]
    parts = [
        f"""SELECT '{t}' AS tbl, count(*)::BIGINT AS n_rows,
       count(DISTINCT {k})::BIGINT AS n_distinct,
       (count(*) - count(DISTINCT {k}))::BIGINT AS n_dup_rows FROM {t}"""
        for t, k in singles
    ]
    parts.append(
        """SELECT 'lineitem', count(*)::BIGINT,
       (SELECT count(*)::BIGINT FROM
        (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)),
       (count(*) - (SELECT count(*)::BIGINT FROM
        (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)))::BIGINT
       FROM lineitem"""
    )
    return "\nUNION ALL\n".join(parts)


def sql_priority_quota(total: int = 10_000) -> str:
    """Twin of ``relational.quota_allocate`` over order-priority counts:
    base = total·w // W, leftover Σrem/W to the largest remainders,
    (rem DESC, group ASC) tie-break."""
    return f"""
WITH gw AS (SELECT o_orderpriority, count(*)::BIGINT AS weight
            FROM orders GROUP BY 1),
w AS (SELECT sum(weight)::BIGINT AS tw FROM gw),
m AS (SELECT o_orderpriority, weight,
             ({total} * weight) // tw AS base,
             ({total} * weight) % tw AS rem
      FROM gw CROSS JOIN w),
l AS (SELECT (sum(rem) // (SELECT tw FROM w))::BIGINT AS lv FROM m),
r AS (SELECT o_orderpriority, weight, base,
             row_number() OVER (ORDER BY rem DESC, o_orderpriority) AS rnk
      FROM m)
SELECT o_orderpriority, weight,
       (base + CASE WHEN rnk <= (SELECT lv FROM l) THEN 1 ELSE 0 END)::BIGINT
         AS quota
FROM r"""


def sql_purchase_click_did() -> str:
    """Twin of ``relational.diff_in_diff`` over purchase-vs-click cents:
    data-midpoint cutoff (min+max)//2 epoch µs, four conditional int64
    moment cells, the engine finalize's exact double op order."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_type AS grp, epoch_us(ts) AS us, {v} AS cents
           FROM events WHERE event_type IN ('purchase', 'click')),
mm AS (SELECT (min(us) + max(us)) // 2 AS cutoff FROM e),
st AS (SELECT
  sum(CASE WHEN grp = 'purchase' AND us <= cutoff THEN 1 ELSE 0 END)::BIGINT AS ntp,
  sum(CASE WHEN grp = 'purchase' AND us <= cutoff THEN cents ELSE 0 END)::BIGINT AS stp,
  sum(CASE WHEN grp = 'purchase' AND us > cutoff THEN 1 ELSE 0 END)::BIGINT AS ntq,
  sum(CASE WHEN grp = 'purchase' AND us > cutoff THEN cents ELSE 0 END)::BIGINT AS stq,
  sum(CASE WHEN grp = 'click' AND us <= cutoff THEN 1 ELSE 0 END)::BIGINT AS ncp,
  sum(CASE WHEN grp = 'click' AND us <= cutoff THEN cents ELSE 0 END)::BIGINT AS scp,
  sum(CASE WHEN grp = 'click' AND us > cutoff THEN 1 ELSE 0 END)::BIGINT AS ncq,
  sum(CASE WHEN grp = 'click' AND us > cutoff THEN cents ELSE 0 END)::BIGINT AS scq,
  (SELECT cutoff FROM mm) AS cutoff
  FROM e CROSS JOIN mm)
SELECT ntp AS n_treat_pre, ntq AS n_treat_post,
       ncp AS n_ctrl_pre, ncq AS n_ctrl_post,
       cutoff AS cutoff_us,
       CASE WHEN ntp > 0 AND ntq > 0 AND ncp > 0 AND ncq > 0
            THEN floor(((stq::DOUBLE / ntq::DOUBLE - stp::DOUBLE / ntp::DOUBLE)
                        - (scq::DOUBLE / ncq::DOUBLE - scp::DOUBLE / ncp::DOUBLE))
                       * 1000000.0::DOUBLE)::BIGINT
            ELSE NULL END AS did_micro
FROM st"""


def sql_bm25_rrf(
    terms: "list[str]", k0: int = 60, keep: int = 50, k: int = 10
) -> str:
    """Twin of ``q_bm25_rrf``: BM25 top-``keep`` and query-term-count
    top-``keep`` row_number ranks, fused by Σ 10⁶ // (k0 + rank) — pure
    integers, (rrf_micro DESC, doc_id) LIMIT k."""
    bm = sql_bm25_docs(terms, k=keep).strip()
    tl = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"""
WITH a AS ({bm}),
ar AS (SELECT doc_id,
       row_number() OVER (ORDER BY bm25_q DESC, doc_id) AS rnk FROM a),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
bc AS (SELECT doc_id, count(*)::BIGINT AS cnt FROM toks
       WHERE term IN ({tl}) GROUP BY 1
       ORDER BY cnt DESC, doc_id LIMIT {keep}),
br AS (SELECT doc_id,
       row_number() OVER (ORDER BY cnt DESC, doc_id) AS rnk FROM bc),
u AS (
  SELECT doc_id, (1000000 // ({k0} + rnk))::BIGINT AS s FROM ar
  UNION ALL
  SELECT doc_id, (1000000 // ({k0} + rnk))::BIGINT AS s FROM br
)
SELECT doc_id, count(*)::BIGINT AS n_rankers, sum(s)::BIGINT AS rrf_micro
FROM u GROUP BY 1
ORDER BY rrf_micro DESC, doc_id LIMIT {k}"""


def sql_funnel_3step(
    steps: "tuple[str, str, str]" = ("signup", "click", "purchase"),
    max_gap_s: int = 72 * 3600,
) -> str:
    """Twin of ``events.funnel_ksteps`` for the 3-step signup→click→
    purchase funnel: chained per-user earliest-qualifying-anchor mins with
    the strict-after + gap-window predicate."""
    gap_us = max_gap_s * 1_000_000
    a, b, c = steps
    return f"""
WITH e AS (SELECT user_id AS u, event_type, epoch_us(ts) AS t FROM events),
s0 AS (SELECT u, min(t) AS m FROM e WHERE event_type = '{a}' GROUP BY 1),
s1 AS (SELECT e.u, min(e.t) AS m FROM e JOIN s0 ON s0.u = e.u
       WHERE e.event_type = '{b}' AND e.t > s0.m AND e.t <= s0.m + {gap_us}
       GROUP BY 1),
s2 AS (SELECT e.u, min(e.t) AS m FROM e JOIN s1 ON s1.u = e.u
       WHERE e.event_type = '{c}' AND e.t > s1.m AND e.t <= s1.m + {gap_us}
       GROUP BY 1)
SELECT 0::BIGINT AS step_idx, '{a}' AS step_type,
       (SELECT count(*)::BIGINT FROM s0) AS n_users
UNION ALL
SELECT 1, '{b}', (SELECT count(*)::BIGINT FROM s1)
UNION ALL
SELECT 2, '{c}', (SELECT count(*)::BIGINT FROM s2)"""


def sql_doc_lang_kappa() -> str:
    """Twin of ``q_doc_lang_kappa``: Cohen's kappa between documents.lang
    and the ``sql_lang_id`` heuristic prediction — confusion cells, integer
    marginal products, (10⁶·(N·D − S)) // (N² − S) with DuckDB's floor //."""
    lid = sql_lang_id().strip()
    return f"""
WITH pred AS ({lid}),
pair AS (
  SELECT d.lang AS a, p.lang_guess AS b
  FROM documents d JOIN pred p ON p.doc_id = d.doc_id
),
conf AS (SELECT a, b, count(*)::BIGINT AS n FROM pair GROUP BY 1, 2),
marg AS (
  SELECT l, sum(r)::BIGINT AS r, sum(c)::BIGINT AS c FROM (
    SELECT a AS l, n AS r, 0::BIGINT AS c FROM conf
    UNION ALL
    SELECT b, 0, n FROM conf
  ) GROUP BY 1
),
st AS (SELECT
  (SELECT sum(n)::BIGINT FROM conf) AS nt,
  (SELECT coalesce(sum(n), 0)::BIGINT FROM conf WHERE a = b) AS d,
  (SELECT sum(r * c)::BIGINT FROM marg) AS s)
SELECT nt AS n_rows, d AS n_agree,
       -- true FLOOR division: DuckDB // truncates toward zero, but kappa's
       -- numerator can be negative (denominator N² − S is always ≥ 0)
       CASE WHEN nt * nt - s <> 0
            THEN (((1000000 * (nt * d - s)) // (nt * nt - s))
                  - CASE WHEN (1000000 * (nt * d - s)) < 0
                              AND ((1000000 * (nt * d - s)) % (nt * nt - s)) <> 0
                         THEN 1 ELSE 0 END)::BIGINT
            ELSE NULL END AS kappa_micro
FROM st"""


def sql_event_markov_entropy() -> str:
    """Twin of ``q_event_markov_entropy``: conditional next-type entropy
    rate H(next|cur) over the ``sql_event_transitions`` cells — single-floor
    identity (Σᵢ nᵢ·L(nᵢ) − Σᵢⱼ c·L(c)) // N in milli-nats, the
    ``group_entropy`` quantized-log discipline."""
    tr = sql_event_transitions().strip()
    return f"""
WITH cells AS ({tr}),
rowm AS (SELECT prev_type, sum(n)::BIGINT AS ni FROM cells GROUP BY 1),
st AS (SELECT
  (SELECT sum(n)::BIGINT FROM cells) AS nt,
  (SELECT count(*)::BIGINT FROM rowm) AS n_states,
  (SELECT sum(ni * floor(ln(ni::DOUBLE) * 1000)::BIGINT)::BIGINT FROM rowm) AS hi,
  (SELECT sum(n * floor(ln(n::DOUBLE) * 1000)::BIGINT)::BIGINT FROM cells) AS lo)
SELECT nt AS n_transitions, n_states,
       ((hi - lo) // nt)::BIGINT AS entropy_rate_milli
FROM st"""


def sql_blocking_quality(
    sample_max_doc_id: int = 60, min_jaccard: float = 0.5, cap: int = 1000
) -> str:
    """Twin of ``dedup.blocking_quality``: shingle-Jaccard > min_jaccard
    pairs over the bounded doc-id sample as ground truth (the
    ``sql_jaccard_pairs`` kernel), the full ``sql_lsh_candidate_pairs`` as
    candidates (completeness restricted to the sample, reduction counted
    globally), one-row pair-completeness / reduction-ratio readout in ppm."""
    lsh = sql_lsh_candidate_pairs(cap).strip()
    jac = sql_jaccard_pairs(max_doc_id=sample_max_doc_id, cap=cap).strip()
    return f"""
WITH truth AS (
  SELECT doc_a, doc_b FROM ({jac}) j WHERE j.jaccard > {min_jaccard}
),
cand AS (SELECT doc_a, doc_b FROM ({lsh}) c),
st AS (SELECT
  (SELECT count(*)::BIGINT FROM documents) AS nd,
  (SELECT count(*)::BIGINT FROM truth) AS nt,
  (SELECT count(*)::BIGINT FROM cand) AS nc,
  (SELECT count(*)::BIGINT FROM truth t
     JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
     WHERE c.doc_a < {sample_max_doc_id}
       AND c.doc_b < {sample_max_doc_id}) AS nh)
SELECT nd AS n_docs, nt AS n_truth_pairs, nc AS n_cand_pairs,
       nh AS n_hit_pairs,
       CASE WHEN nt > 0 THEN (nh * 1000000 // nt)::BIGINT
            ELSE NULL END AS pair_completeness_ppm,
       CASE WHEN nd * (nd - 1) // 2 > 0
            THEN ((nd * (nd - 1) // 2 - nc) * 1000000
                  // (nd * (nd - 1) // 2))::BIGINT
            ELSE NULL END AS reduction_ppm
FROM st"""


def sql_corpus_heaps_slope() -> str:
    """Twin of ``q_corpus_heaps_slope``: per-term first-occurrence doc,
    new-terms and token counts per doc, running V(d)/N(d) windows ordered
    by doc_id, both axes floor(ln·10³) milli-nat ints, the shared
    group_slope cross-moment finalize (Heaps' law V ≈ k·N^β — slope_q
    ≈ β·10⁶)."""
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
fs AS (SELECT term, min(doc_id)::BIGINT AS fsd FROM tk GROUP BY 1),
nn AS (SELECT fsd AS doc_id, count(*)::BIGINT AS n_new FROM fs GROUP BY 1),
nt AS (SELECT doc_id, count(*)::BIGINT AS n_tok FROM tk GROUP BY 1),
c AS (
  SELECT nt.doc_id,
         sum(coalesce(nn.n_new, 0)) OVER (ORDER BY nt.doc_id)::BIGINT AS v,
         sum(nt.n_tok) OVER (ORDER BY nt.doc_id)::BIGINT AS nw
  FROM nt LEFT JOIN nn ON nn.doc_id = nt.doc_id
),
q AS (SELECT floor(ln(nw::DOUBLE) * 1000)::BIGINT AS x,
             floor(ln(v::DOUBLE) * 1000)::BIGINT AS y
      FROM c),
st AS (SELECT count(*)::BIGINT AS n,
              sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
              sum(x*x)::BIGINT AS sxx, sum(x*y)::BIGINT AS sxy
       FROM q)
SELECT n,
       CASE WHEN (n::DOUBLE * sxx - sx::DOUBLE * sx) > 0.0::DOUBLE
            THEN floor(((n::DOUBLE * sxy - sx::DOUBLE * sy) * 1000000.0::DOUBLE)
                       / (n::DOUBLE * sxx - sx::DOUBLE * sx))::BIGINT
            ELSE NULL END AS heaps_slope_q
FROM st WHERE n > 0"""


def sql_event_user_hll(salt: str = "hll") -> str:
    """Twin of ``sampling.distinct_hll`` over (events.event_type,
    events.user_id): identical md5-derived 60-bit hash split into a 6-bit
    register (// 2⁵⁴) and 50-bit tail (% 2⁵⁰); rank = 51 − bit_length(tail)
    from a max-k join against a powers-of-two VALUES table (the engine's
    exact-frexp twin); register max, Σ2^(51−rank) integer harmonic sum,
    then the mirrored double estimator with linear-counting fallback."""
    esc = salt.replace("'", "''")
    powers = ", ".join(f"({k}, {1 << k})" for k in range(50))
    c51 = 1 << 51  # 2251799813685248
    return f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5('{esc}:' || user_id), 1, 15))::UBIGINT::BIGINT AS _h
  FROM events
),
r0 AS (SELECT event_type, _h // {1 << 54} AS reg, _h % {1 << 50} AS tail FROM h),
p(k, v) AS (VALUES {powers}),
bl AS (
  SELECT r0.event_type, r0.reg,
         CASE WHEN r0.tail = 0 THEN 51 ELSE 50 - max(p.k) END AS rnk
  FROM r0 LEFT JOIN p ON p.v <= r0.tail
  GROUP BY r0.event_type, r0.reg, r0.tail
),
rm AS (SELECT event_type, reg, max(rnk)::BIGINT AS r FROM bl GROUP BY 1, 2),
ag AS (SELECT event_type, count(*)::BIGINT AS n_set,
              sum(1::BIGINT << (51 - r))::BIGINT AS s
       FROM rm GROUP BY 1)
SELECT event_type, n_set AS n_set_regs,
  CASE WHEN floor((0.709::DOUBLE * 64.0::DOUBLE * 64.0::DOUBLE * {c51}.0::DOUBLE)
                  / (s + (64 - n_set) * {c51})::DOUBLE) <= 160.0::DOUBLE
            AND (64 - n_set) > 0
       THEN floor(64.0::DOUBLE * ln(64.0::DOUBLE / (64 - n_set)::DOUBLE))::BIGINT
       ELSE floor((0.709::DOUBLE * 64.0::DOUBLE * 64.0::DOUBLE * {c51}.0::DOUBLE)
                  / (s + (64 - n_set) * {c51})::DOUBLE)::BIGINT END AS hll_est
FROM ag"""


def sql_corpus_zipf_slope() -> str:
    """Twin of ``q_corpus_zipf_slope``: vocabulary ranked by (freq DESC,
    term), both axes floor(ln·10³) milli-nat ints, the group_slope
    cross-moment finalize."""
    return """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
cnt AS (SELECT term, count(*)::BIGINT AS n FROM tok WHERE term <> ''
        GROUP BY 1),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rnk FROM cnt),
q AS (SELECT floor(ln(rnk::DOUBLE) * 1000)::BIGINT AS x,
             floor(ln(n::DOUBLE) * 1000)::BIGINT AS y
      FROM r),
st AS (SELECT count(*)::BIGINT AS n,
              sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
              sum(x*x)::BIGINT AS sxx, sum(x*y)::BIGINT AS sxy
       FROM q)
SELECT n,
       CASE WHEN (n::DOUBLE * sxx - sx::DOUBLE * sx) > 0.0::DOUBLE
            THEN floor(((n::DOUBLE * sxy - sx::DOUBLE * sy) * 1000000.0::DOUBLE)
                       / (n::DOUBLE * sxx - sx::DOUBLE * sx))::BIGINT
            ELSE NULL END AS zipf_slope_q
FROM st WHERE n > 0"""


def sql_event_type_burstiness() -> str:
    """Twin of ``q_event_type_burstiness``: hourly-count Fano factor per
    type — sample variance over mean, ×10⁶, exact int64 moments, the corr
    family's promote-then-multiply double finalize; NULL below 2 hours."""
    return """
WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
                  count(*)::BIGINT AS c
           FROM events GROUP BY 1, 2),
st AS (SELECT event_type, count(*)::BIGINT AS n_hours,
              sum(c)::BIGINT AS s, sum(c*c)::BIGINT AS ss
       FROM h GROUP BY 1)
SELECT event_type, n_hours,
       CASE WHEN n_hours > 1 AND s > 0
            THEN floor(((n_hours::DOUBLE * ss - s::DOUBLE * s) * 1000000.0::DOUBLE)
                       / ((n_hours::DOUBLE - 1.0::DOUBLE) * s::DOUBLE))::BIGINT
            ELSE NULL END AS fano_ppm
FROM st"""


def sql_fk_orphan_audit() -> str:
    """Twin of ``q_fk_orphan_audit``: per FK pair the child rowcount,
    anti-join orphan count and integer-ppm orphan rate."""

    def block(name: str, child: str, ck: str, parent: str, pk: str) -> str:
        return f"""SELECT '{name}' AS fk, count(*)::BIGINT AS n_rows,
       count(CASE WHEN p.{pk} IS NULL THEN 1 END)::BIGINT AS n_orphans,
       (count(CASE WHEN p.{pk} IS NULL THEN 1 END) * 1000000
        // greatest(count(*), 1))::BIGINT AS orphan_ppm
FROM {child} c LEFT JOIN {parent} p ON c.{ck} = p.{pk}"""

    blocks = [
        block("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        block("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        block("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    return "\nUNION ALL\n".join(blocks)


def sql_part_price_spearman() -> str:
    """Twin of ``relational.group_spearman`` over lineitem per part:
    Spearman ρ between quantity and extended price (both cents), doubled
    midranks via 2·rank() + count-equal − 1 (= 2·N_less + c + 1), then the
    corr family's exact-int cross-moments and promote-then-multiply double
    finalize — bit-exact floor(ρ·10⁶), NULL on a constant column."""
    x = CENTS.format(col="l_quantity")
    y = CENTS.format(col="l_extendedprice")
    return f"""
WITH e AS (
  SELECT l_partkey::BIGINT AS g, {x} AS x, {y} AS y FROM lineitem
),
r AS (
  SELECT g,
         (2 * rank() OVER (PARTITION BY g ORDER BY x)
            + count(*) OVER (PARTITION BY g, x) - 1)::BIGINT AS mx,
         (2 * rank() OVER (PARTITION BY g ORDER BY y)
            + count(*) OVER (PARTITION BY g, y) - 1)::BIGINT AS my
  FROM e
),
st AS (
  SELECT g, count(*)::BIGINT AS n,
         sum(mx)::BIGINT AS sx, sum(my)::BIGINT AS sy,
         sum(mx*mx)::BIGINT AS sxx, sum(my*my)::BIGINT AS syy,
         sum(mx*my)::BIGINT AS sxy
  FROM r GROUP BY 1
)
SELECT g AS l_partkey, n,
       CASE WHEN (n::DOUBLE * sxx - sx::DOUBLE * sx) > 0.0::DOUBLE
             AND (n::DOUBLE * syy - sy::DOUBLE * sy) > 0.0::DOUBLE
            THEN floor(((n::DOUBLE * sxy - sx::DOUBLE * sy) * 1000000.0::DOUBLE)
                       / (sqrt(n::DOUBLE * sxx - sx::DOUBLE * sx)
                          * sqrt(n::DOUBLE * syy - sy::DOUBLE * sy)))::BIGINT
            ELSE NULL END AS spearman_ppm
FROM st"""


def sql_purchase_click_ks() -> str:
    """Twin of ``relational.ks_two_sample`` over purchase-vs-click cents:
    per-value indicator counts, inclusive running sums ordered by value,
    d_num = max|cumA·n_b − cumB·n_a| exact integer, d_ppm floored in the
    same promote-then-divide double order as the engine."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_type AS grp, {v} AS v FROM events
           WHERE event_type IN ('purchase', 'click')),
cv AS (SELECT v,
              sum(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS ca,
              sum(CASE WHEN grp = 'click' THEN 1 ELSE 0 END)::BIGINT AS cb
       FROM e GROUP BY 1),
c AS (SELECT sum(ca) OVER (ORDER BY v)::BIGINT AS cuma,
             sum(cb) OVER (ORDER BY v)::BIGINT AS cumb
      FROM cv),
t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM cv)
SELECT na AS n_a, nb AS n_b,
       max(abs(cuma * nb - cumb * na))::BIGINT AS d_num,
       CASE WHEN na > 0 AND nb > 0
            THEN floor((max(abs(cuma * nb - cumb * na))::DOUBLE
                        * 1000000.0::DOUBLE)
                       / (na::DOUBLE * nb::DOUBLE))::BIGINT
            ELSE NULL END AS d_ppm
FROM c CROSS JOIN t GROUP BY na, nb"""


def sql_segment_priority_chisq() -> str:
    """Twin of ``relational.contingency_chi2`` over segment × priority:
    cells + margins, FULL cross product (zero cells carry their expected
    mass), per-cell floor((O·N−R·C)²·10⁶/(N·R·C)) in the engine's double
    op order, Cramér's V from the already-quantized statistic."""
    return """
WITH j AS (SELECT c_mktsegment AS r, o_orderpriority AS c
           FROM orders JOIN customer ON o_custkey = c_custkey),
cells AS (SELECT r, c, count(*)::BIGINT AS o FROM j GROUP BY 1, 2),
rm AS (SELECT r, sum(o)::BIGINT AS rt FROM cells GROUP BY 1),
cm AS (SELECT c, sum(o)::BIGINT AS ct FROM cells GROUP BY 1),
tot AS (SELECT sum(o)::BIGINT AS n FROM cells),
fullx AS (SELECT rt, ct, coalesce(cells.o, 0)::BIGINT AS o, n
          FROM rm CROSS JOIN cm CROSS JOIN tot
          LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c),
q AS (SELECT floor(((o::DOUBLE * n::DOUBLE - rt::DOUBLE * ct::DOUBLE)
                    * (o::DOUBLE * n::DOUBLE - rt::DOUBLE * ct::DOUBLE)
                    * 1000000.0::DOUBLE)
                   / (n::DOUBLE * rt::DOUBLE * ct::DOUBLE))::BIGINT AS qv, n
      FROM fullx),
dims AS (SELECT (SELECT count(*) FROM rm)::BIGINT AS nr,
                (SELECT count(*) FROM cm)::BIGINT AS nc)
SELECT n, nr AS n_rows, nc AS n_cols,
       ((nr - 1) * (nc - 1))::BIGINT AS dof,
       sum(qv)::BIGINT AS chi2_micro,
       floor(sqrt((sum(qv)::DOUBLE / 1000000.0::DOUBLE)
                  / (n::DOUBLE * least(nr - 1, nc - 1)::DOUBLE))
             * 1000000.0::DOUBLE)::BIGINT AS cramers_v_ppm
FROM q CROSS JOIN dims GROUP BY n, nr, nc"""


def sql_event_type_hour_mi() -> str:
    """Twin of ``relational.contingency_mi`` over event type × hour-of-day:
    observed cells only (zero cells contribute exactly 0), pointwise log
    quantized to milli-nats FIRST (the zipf-slope floor(ln·10³) discipline),
    weighted by exact integer counts."""
    return """
WITH e AS (SELECT event_type AS r,
                  ((epoch_us(ts) // 3600000000) % 24)::BIGINT AS c
           FROM events),
cells AS (SELECT r, c, count(*)::BIGINT AS o FROM e GROUP BY 1, 2),
rm AS (SELECT r, sum(o)::BIGINT AS rt FROM cells GROUP BY 1),
cm AS (SELECT c, sum(o)::BIGINT AS ct FROM cells GROUP BY 1),
tot AS (SELECT sum(o)::BIGINT AS n FROM cells)
SELECT n,
       (SELECT count(*) FROM rm)::BIGINT AS n_rows,
       (SELECT count(*) FROM cm)::BIGINT AS n_cols,
       sum(o * floor(ln((o::DOUBLE * n::DOUBLE) / (rt::DOUBLE * ct::DOUBLE))
                     * 1000.0::DOUBLE)::BIGINT)::BIGINT AS mi_milli_sum
FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot GROUP BY n"""


def sql_tfidf_cosine_pairs(
    k: int = 10, min_cos_ppm: int = 300_000, cap: int = 1000
) -> str:
    """Twin of ``text.tfidf_cosine_pairs``: the ``sql_doc_tfidf_top_terms``
    pipeline at top-``k``, kilo-unit components qk = tfidf_q // 1000,
    first-``cap``-ascending-doc_ids-per-term pair join (the LSH bucket-cap
    convention), exact integer dot/norms, promote-then-multiply cosine."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM toks WHERE term <> '' GROUP BY 1, 2
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         floor(tf.tf * ln(n.n / df.df) * 1000000)::BIGINT AS tfidf_q
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf_q DESC, term
  ) AS rk FROM scored
),
topk AS (
  SELECT doc_id, term, (tfidf_q // 1000)::BIGINT AS qk
  FROM ranked WHERE rk <= {k}
),
norms AS (SELECT doc_id, sum(qk * qk)::BIGINT AS n2 FROM topk GROUP BY 1),
capped AS (
  SELECT term, doc_id, qk FROM (
    SELECT *, row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
    FROM topk
  ) WHERE rn <= {cap}
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.qk * b.qk AS prod
  FROM capped a JOIN capped b
    ON a.term = b.term AND a.doc_id < b.doc_id
),
agg AS (
  SELECT doc_a, doc_b, count(*)::BIGINT AS n_shared, sum(prod)::BIGINT AS dot
  FROM p GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared, dot,
       floor((dot::DOUBLE * 1000000.0::DOUBLE)
             / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)))::BIGINT AS cos_ppm
FROM agg
JOIN norms na ON doc_a = na.doc_id
JOIN norms nb ON doc_b = nb.doc_id
WHERE floor((dot::DOUBLE * 1000000.0::DOUBLE)
            / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)))::BIGINT
      >= {min_cos_ppm}"""


def sql_event_type_cusum() -> str:
    """Twin of ``relational.group_cusum`` over per-type daily counts:
    row_number step index, running-count window, |n·C_j − j·S| exact
    integer, peak via (tj DESC, day ASC) row_number = 1."""
    return """
WITH d AS (SELECT event_type, (epoch_us(ts) // 86400000000)::BIGINT AS day,
                  count(*)::BIGINT AS c
           FROM events GROUP BY 1, 2),
w AS (SELECT event_type, day,
             row_number() OVER (PARTITION BY event_type ORDER BY day)::BIGINT AS j,
             sum(c) OVER (PARTITION BY event_type ORDER BY day)::BIGINT AS cum
      FROM d),
t AS (SELECT event_type, count(*)::BIGINT AS n_steps, sum(c)::BIGINT AS total
      FROM d GROUP BY 1),
s AS (SELECT w.event_type, day, n_steps, total,
             abs(n_steps * cum - j * total)::BIGINT AS tj
      FROM w JOIN t USING (event_type))
SELECT event_type, n_steps, total, tj AS cusum_max, day AS peak_step
FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY tj DESC, day) AS rn FROM s)
WHERE rn = 1"""


def sql_orders_benford() -> str:
    """Twin of ``relational.benford_digits`` over totalprice cents: first
    digit via VARCHAR substr (== the engine's integer-division loop on
    positive ints), all nine digits zero-filled, obs_ppm integer floor,
    expected_ppm the constant floor(ln(1+1/d)/ln(10)·10⁶)."""
    c = CENTS.format(col="o_totalprice")
    return f"""
WITH v AS (SELECT {c} AS c FROM orders),
dig AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM v WHERE c > 0),
cnt AS (SELECT digit, count(*)::BIGINT AS n FROM dig GROUP BY 1),
all9 AS (SELECT unnest(range(1, 10))::BIGINT AS digit),
tot AS (SELECT sum(n)::BIGINT AS nt FROM cnt)
SELECT a.digit,
       coalesce(c.n, 0)::BIGINT AS n_obs,
       (coalesce(c.n, 0) * 1000000 // nt)::BIGINT AS obs_ppm,
       floor(ln(1.0 + 1.0 / a.digit::DOUBLE) / ln(10.0::DOUBLE)
             * 1000000.0::DOUBLE)::BIGINT AS expected_ppm,
       ((coalesce(c.n, 0) * 1000000 // nt)
        - floor(ln(1.0 + 1.0 / a.digit::DOUBLE) / ln(10.0::DOUBLE)
                * 1000000.0::DOUBLE))::BIGINT AS dev_ppm
FROM all9 a LEFT JOIN cnt c USING (digit) CROSS JOIN tot"""


def sql_user_rfm() -> str:
    """Twin of ``q_user_rfm``: purchase-only per-user aggregates, NTILE(5)
    with (metric DESC, user_id) tie-breaks — DuckDB's first-(n mod k)-tiles-
    get-ceil rule matches ``relational.ntile_over`` exactly."""
    v = CENTS.format(col="value")
    return f"""
WITH p AS (SELECT user_id, (epoch_us(ts) // 86400000000)::BIGINT AS day,
                  {v} AS cents
           FROM events WHERE event_type = 'purchase'),
agg AS (SELECT user_id, max(day)::BIGINT AS last_day,
               count(*)::BIGINT AS n_purchases,
               sum(cents)::BIGINT AS total_cents
        FROM p GROUP BY 1),
t AS (SELECT *,
        ntile(5) OVER (ORDER BY last_day DESC, user_id)::BIGINT AS r_tile,
        ntile(5) OVER (ORDER BY n_purchases DESC, user_id)::BIGINT AS f_tile,
        ntile(5) OVER (ORDER BY total_cents DESC, user_id)::BIGINT AS m_tile
      FROM agg)
SELECT user_id, last_day, n_purchases, total_cents,
       r_tile, f_tile, m_tile,
       (r_tile * 100 + f_tile * 10 + m_tile)::BIGINT AS rfm
FROM t"""


def sql_user_decayed_value(halflife_days: int = 7, max_shift: int = 40) -> str:
    """Twin of ``relational.halflife_decayed_sum`` over purchase cents:
    w = least((max_day − day) // halflife, max_shift); decayed = Σ cents
    // (1 << w) — exact integer halving per elapsed half-life."""
    v = CENTS.format(col="value")
    return f"""
WITH p AS (SELECT user_id, (epoch_us(ts) // 86400000000)::BIGINT AS day,
                  {v} AS cents
           FROM events WHERE event_type = 'purchase'),
mx AS (SELECT max(day)::BIGINT AS mday FROM p),
d AS (SELECT user_id, cents,
             least((mday - day) // {halflife_days}, {max_shift})::BIGINT AS w
      FROM p CROSS JOIN mx)
SELECT user_id, count(*)::BIGINT AS n_rows, sum(cents)::BIGINT AS total,
       sum(cents // (1::BIGINT << w))::BIGINT AS decayed
FROM d GROUP BY 1"""


def sql_orders_gini() -> str:
    """Twin of ``relational.group_gini`` over orders per priority: doubled
    midranks m = 2·rank() + count-equal − 1, G_num = Σv·m − (n+1)·Σv exact
    BIGINT, then the engine's single promote-then-divide double floor."""
    v = CENTS.format(col="o_totalprice")
    return f"""
WITH e AS (SELECT o_orderpriority AS g, {v} AS v FROM orders),
r AS (
  SELECT g, v,
         (2 * rank() OVER (PARTITION BY g ORDER BY v)
            + count(*) OVER (PARTITION BY g, v) - 1)::BIGINT AS m
  FROM e
),
st AS (
  SELECT g, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
         sum(v * m)::BIGINT AS vm
  FROM r GROUP BY 1
)
SELECT g AS o_orderpriority, n, s AS total,
       CASE WHEN s > 0
            THEN floor(((vm - (n + 1) * s)::DOUBLE * 1000000.0::DOUBLE)
                       / (n::DOUBLE * s::DOUBLE))::BIGINT
            ELSE NULL END AS gini_ppm
FROM st"""


def sql_session_concurrency(gap_minutes: int = 30) -> str:
    """Twin of ``events.session_concurrency`` over sessionized events:
    the sessionize CTE, ±1 endpoint deltas (end+1 so closed intervals
    touching at an instant overlap), per-instant delta aggregation, one
    running sum in time order, then peak / earliest-instant scalars."""
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
f AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM o
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM f
),
sess AS (
  SELECT user_id, session_idx, min(ts) AS start_ts, max(ts) AS end_ts
  FROM s GROUP BY 1, 2
),
ep AS (
  SELECT epoch_us(start_ts)::BIGINT AS t, 1::BIGINT AS d FROM sess
  UNION ALL
  SELECT epoch_us(end_ts)::BIGINT + 1, (-1)::BIGINT FROM sess
),
ag AS (SELECT t, sum(d)::BIGINT AS d FROM ep GROUP BY 1),
c AS (SELECT t, sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)::BIGINT AS cur
      FROM ag)
SELECT (SELECT count(*) FROM sess)::BIGINT AS n_sessions,
       (SELECT max(cur) FROM c)::BIGINT AS peak,
       (SELECT min(t) FROM c
        WHERE cur = (SELECT max(cur) FROM c))::BIGINT AS at_us"""


def sql_user_retention_km(
    unit_us: int = 3_600_000_000, censor_units: int = 24
) -> str:
    """Twin of ``events.survival_km`` over user event lifetimes: per-user
    first/last µs, right-censor within censor_days of corpus max, per-
    duration death/leave counts (durations in ``unit_us`` units — hours
    for this dense corpus), at-risk via exclusive running sum, KM
    product as exact sums of per-step floor(ln·10⁶) micro-nat logs —
    NULL on the (last) row where the risk set dies out."""
    c_us = censor_units * unit_us
    return f"""
WITH u AS (
  SELECT user_id, min(epoch_us(ts))::BIGINT AS f, max(epoch_us(ts))::BIGINT AS l
  FROM events GROUP BY 1
),
mx AS (SELECT max(l) AS m FROM u),
lt AS (
  SELECT (l - f) // {unit_us} AS dur,
         CASE WHEN (SELECT m FROM mx) - l >= {c_us} THEN 1 ELSE 0 END AS died
  FROM u
),
d AS (SELECT dur, count(*)::BIGINT AS tot, sum(died)::BIGINT AS deaths
      FROM lt GROUP BY 1),
r AS (
  SELECT dur, deaths,
         ((SELECT count(*) FROM u)
          - coalesce(sum(tot) OVER (ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0))::BIGINT AS n_risk
  FROM d
),
s AS (
  SELECT dur, n_risk, deaths,
         CASE WHEN n_risk > deaths
              THEN floor(ln((n_risk - deaths)::DOUBLE / n_risk::DOUBLE)
                         * 1000000.0::DOUBLE)::BIGINT
              ELSE 0 END AS step,
         (n_risk <= deaths) AS zero
  FROM r WHERE deaths > 0
)
SELECT dur, n_risk, deaths AS n_died,
       (CASE WHEN zero THEN NULL
             ELSE sum(step) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
        END)::BIGINT AS log_surv_e6
FROM s"""


def sql_doc_readability() -> str:
    """Twin of ``text.doc_readability``: regexp_extract_all match counts
    (RE2, non-overlapping — same kernel family as Arrow's
    count_substring_regex), Flesch milli floor in the engine's op order."""
    return """
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]+'))::BIGINT AS w,
         len(regexp_extract_all(coalesce(text, ''), '[.!?]+'))::BIGINT AS s,
         len(regexp_extract_all(coalesce(text, ''), '[aeiouyAEIOUY]+'))::BIGINT AS y
  FROM documents
)
SELECT doc_id, w AS n_words, s AS n_sents, y AS n_syll,
       CASE WHEN w > 0
            THEN floor(206835.0::DOUBLE
                       - (1015.0::DOUBLE * w::DOUBLE) / greatest(s, 1)::DOUBLE
                       - (84600.0::DOUBLE * y::DOUBLE) / w::DOUBLE)::BIGINT
            ELSE NULL END AS flesch_milli
FROM c"""


def sql_user_value_autocorr() -> str:
    """Twin of the ``lag_over`` + ``group_corr`` composition: lag-1 value
    pairs per user in (ts, event_id) order, then the corr family's exact
    int cross-moments and promote-then-multiply double finalize."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, {v} AS v FROM events),
p AS (
  SELECT user_id, v AS y,
         lag(v) OVER (PARTITION BY user_id ORDER BY t, event_id) AS x
  FROM e
),
q AS (SELECT user_id AS g, x, y FROM p WHERE x IS NOT NULL),
st AS (
  SELECT g, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy,
         sum(x*y)::BIGINT AS sxy
  FROM q GROUP BY 1
)
SELECT g AS user_id, n,
       CASE WHEN (n::DOUBLE * sxx - sx::DOUBLE * sx) > 0.0::DOUBLE
             AND (n::DOUBLE * syy - sy::DOUBLE * sy) > 0.0::DOUBLE
            THEN floor(((n::DOUBLE * sxy - sx::DOUBLE * sy) * 1000000.0::DOUBLE)
                       / (sqrt(n::DOUBLE * sxx - sx::DOUBLE * sx)
                          * sqrt(n::DOUBLE * syy - sy::DOUBLE * sy)))::BIGINT
            ELSE NULL END AS autocorr_ppm
FROM st"""


def sql_user_interarrival_stats() -> str:
    """Twin of the lag-gap + ``distribution_stats(method='disc')``
    composition: per-user inter-event µs gaps, discrete quantiles."""
    return """
WITH o AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS t,
         lag(epoch_us(ts)::BIGINT)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
g AS (SELECT user_id, (t - prev)::BIGINT AS gap_us FROM o WHERE prev IS NOT NULL)
SELECT user_id, count(*)::BIGINT AS n,
       min(gap_us)::DOUBLE AS min_v, max(gap_us)::DOUBLE AS max_v,
       quantile_disc(gap_us, 0.25)::DOUBLE AS q1,
       quantile_disc(gap_us, 0.5)::DOUBLE AS median,
       quantile_disc(gap_us, 0.75)::DOUBLE AS q3
FROM g GROUP BY 1"""


def sql_purchase_click_tv() -> str:
    """Twin of ``relational.total_variation`` over purchase-vs-click cents:
    per-value indicator counts, exact integer Σ|ca·nb − cb·na|, tv_ppm in
    the same promote-then-divide double order as the engine."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_type AS grp, {v} AS v FROM events
           WHERE event_type IN ('purchase', 'click')),
cv AS (SELECT v,
              sum(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS ca,
              sum(CASE WHEN grp = 'click' THEN 1 ELSE 0 END)::BIGINT AS cb
       FROM e GROUP BY 1),
t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM cv)
SELECT na AS n_a, nb AS n_b,
       sum(abs(ca * nb - cb * na))::BIGINT AS tv_num,
       CASE WHEN na > 0 AND nb > 0
            THEN floor((sum(abs(ca * nb - cb * na))::DOUBLE * 1000000.0::DOUBLE)
                       / (2.0::DOUBLE * na::DOUBLE * nb::DOUBLE))::BIGINT
            ELSE NULL END AS tv_ppm
FROM cv, t GROUP BY na, nb"""


def sql_user_streak_days() -> str:
    """Twin of ``events.longest_streak``: distinct (user, day) → lag gap →
    island numbering by running sum → island lengths → per-user max."""
    return """
WITH d AS (SELECT DISTINCT user_id,
                  epoch_us(ts)::BIGINT // 86400000000 AS day
           FROM events),
l AS (SELECT user_id, day,
             lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
      FROM d),
m AS (SELECT user_id, day,
             CASE WHEN prev IS NULL OR day - prev > 1 THEN 1 ELSE 0 END AS new_i
      FROM l),
i AS (SELECT user_id, day,
             sum(new_i) OVER (PARTITION BY user_id ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS isl
      FROM m),
s AS (SELECT user_id, isl, count(*)::BIGINT AS len FROM i GROUP BY 1, 2)
SELECT user_id, sum(len)::BIGINT AS n_active_days,
       max(len)::BIGINT AS longest_streak
FROM s GROUP BY 1"""


def sql_nation_monthly_growth() -> str:
    """Twin of ``q_nation_monthly_growth``: monthly cents rollup per
    customer nation, lag along ym, mirrored float growth floor."""
    v = CENTS.format(col="o_totalprice")
    return f"""
WITH j AS (
  SELECT c_nationkey::BIGINT AS c_nationkey,
         (year(o_orderdate) * 100 + month(o_orderdate))::BIGINT AS ym,
         {v} AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
m AS (SELECT c_nationkey, ym, sum(cents)::BIGINT AS revenue_cents
      FROM j GROUP BY 1, 2),
l AS (SELECT c_nationkey, ym, revenue_cents,
             lag(revenue_cents) OVER (PARTITION BY c_nationkey ORDER BY ym)
               AS prev
      FROM m)
SELECT c_nationkey, ym, revenue_cents,
       CASE WHEN prev IS NOT NULL AND prev > 0
            THEN floor(((revenue_cents::DOUBLE - prev::DOUBLE)
                        * 1000000.0::DOUBLE) / prev::DOUBLE)::BIGINT
            ELSE NULL END AS growth_ppm
FROM l"""


def sql_orders_weekday_profile() -> str:
    """Twin of ``q_orders_weekday_profile``: isodow (Mon=1..Sun=7 — Arrow
    day_of_week(Monday=0)+1), per-dow count/sum, pure integer share."""
    v = CENTS.format(col="o_totalprice")
    return f"""
WITH o AS (SELECT isodow(o_orderdate)::BIGINT AS dow_iso, {v} AS cents
           FROM orders),
a AS (SELECT dow_iso, count(*)::BIGINT AS n, sum(cents)::BIGINT AS sum_cents
      FROM o GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS total FROM a)
SELECT dow_iso, n, sum_cents,
       (n * 1000000 // greatest(total, 1))::BIGINT AS share_ppm
FROM a, t"""


def sql_customer_abc() -> str:
    """Twin of ``relational.pareto_class`` over per-customer spend: window
    running total in (value DESC, key) order, pure-integer class cuts
    cum·100 vs total·threshold."""
    v = CENTS.format(col="o_totalprice")
    return f"""
WITH s AS (SELECT o_custkey AS c_custkey, sum({v})::BIGINT AS v
           FROM orders GROUP BY 1),
t AS (SELECT sum(v)::BIGINT AS total FROM s),
c AS (SELECT c_custkey, v,
             sum(v) OVER (ORDER BY v DESC, c_custkey
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
      FROM s)
SELECT c_custkey, v AS value, cum AS cum_value,
       CASE WHEN cum * 100 <= (SELECT total FROM t) * 80 THEN 'A'
            WHEN cum * 100 <= (SELECT total FROM t) * 95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM c"""


def sql_event_type_walk(steps: int = 3, scale: int = 1_000_000) -> str:
    """Twin of ``graph.weighted_walk`` over the event-type transition
    counts: uniform integer mass, per-step (m·w)//W routing unrolled one
    CTE per step; only states receiving final-step mass appear."""
    parts = [
        """tr AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)""",
        """e AS (SELECT prev_type AS s, event_type AS d, count(*)::BIGINT AS w
      FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2)""",
        "ws AS (SELECT s, sum(w)::BIGINT AS W FROM e GROUP BY 1)",
        "st AS (SELECT DISTINCT s FROM (SELECT s FROM e UNION ALL SELECT d FROM e))",
        f"p0 AS (SELECT s, {scale}::BIGINT AS m FROM st)",
    ]
    for r in range(1, steps + 1):
        parts.append(
            f"p{r} AS (SELECT e.d AS s, sum((p.m * e.w) // ws.W)::BIGINT AS m "
            f"FROM p{r - 1} p JOIN e ON p.s = e.s JOIN ws ON ws.s = e.s "
            f"GROUP BY 1)"
        )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT s AS state, m AS mass_e6 FROM p{steps}"""


def sql_part_kendall(k: int = 10) -> str:
    """Twin of ``relational.group_kendall_binned`` over lineitem per part:
    tie-preserving midrank-decile bins qx = ((2·N_less + c)·k) // (2n)
    (2·rank + count_eq − 2 over rows ≡ the engine's cell form), cell
    counts, tie masses from the marginals, concordant/discordant from the
    qualifying cell-pair self-join, mirrored τ-b float floor."""
    x = CENTS.format(col="l_quantity")
    y = CENTS.format(col="l_extendedprice")
    return f"""
WITH e AS (
  SELECT l_partkey::BIGINT AS g, {x} AS x, {y} AS y FROM lineitem
),
q AS (
  SELECT g,
         (((2 * rank() OVER (PARTITION BY g ORDER BY x)
            + count(*) OVER (PARTITION BY g, x) - 2) * {k})
          // (2 * count(*) OVER (PARTITION BY g)))::BIGINT AS qx,
         (((2 * rank() OVER (PARTITION BY g ORDER BY y)
            + count(*) OVER (PARTITION BY g, y) - 2) * {k})
          // (2 * count(*) OVER (PARTITION BY g)))::BIGINT AS qy
  FROM e
),
cells AS (SELECT g, qx, qy, count(*)::BIGINT AS c FROM q GROUP BY 1, 2, 3),
nx AS (SELECT g, sum(t)::BIGINT AS n, sum(t * (t - 1) // 2)::BIGINT AS n1
       FROM (SELECT g, qx, sum(c)::BIGINT AS t FROM cells GROUP BY 1, 2)
       GROUP BY 1),
ny AS (SELECT g, sum(t * (t - 1) // 2)::BIGINT AS n2
       FROM (SELECT g, qy, sum(c)::BIGINT AS t FROM cells GROUP BY 1, 2)
       GROUP BY 1),
cd AS (
  SELECT a.g,
         sum(CASE WHEN a.qy < b.qy THEN a.c * b.c ELSE 0 END)::BIGINT AS cc,
         sum(CASE WHEN a.qy > b.qy THEN a.c * b.c ELSE 0 END)::BIGINT AS dd
  FROM cells a JOIN cells b ON a.g = b.g AND a.qx < b.qx
  GROUP BY 1
)
SELECT nx.g AS l_partkey, nx.n AS n,
       CASE WHEN (nx.n * (nx.n - 1) // 2) > nx.n1
             AND (nx.n * (nx.n - 1) // 2) > ny.n2
            THEN floor(((coalesce(cd.cc, 0) - coalesce(cd.dd, 0))::DOUBLE
                        * 1000000.0::DOUBLE)
                       / (sqrt(((nx.n * (nx.n - 1) // 2) - nx.n1)::DOUBLE)
                          * sqrt(((nx.n * (nx.n - 1) // 2) - ny.n2)::DOUBLE)))::BIGINT
            ELSE NULL END AS kendall_ppm
FROM nx JOIN ny ON nx.g = ny.g LEFT JOIN cd ON cd.g = nx.g"""


def sql_part_supplier_hhi() -> str:
    """Twin of ``relational.concentration_hhi`` over lineitem: per-supplier
    revenue totals per part, Σv² exact, mirrored squared-share floor."""
    v = CENTS.format(col="l_extendedprice")
    return f"""
WITH m AS (SELECT l_partkey::BIGINT AS g, l_suppkey, sum({v})::BIGINT AS v
           FROM lineitem GROUP BY 1, 2),
a AS (SELECT g, count(*)::BIGINT AS n_members, sum(v)::BIGINT AS s,
             sum(v * v)::BIGINT AS ss
      FROM m GROUP BY 1)
SELECT g AS l_partkey, n_members, s AS total,
       CASE WHEN s > 0
            THEN floor((ss::DOUBLE * 1000000.0::DOUBLE)
                       / (s::DOUBLE * s::DOUBLE))::BIGINT
            ELSE NULL END AS hhi_e6
FROM a"""


def sql_user_session_stats(gap_minutes: int = 30) -> str:
    """Twin of ``q_user_session_stats``: the sessionize CTE folded to a
    per-user census with pure-integer mean session length."""
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
f AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM o
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM f
),
sess AS (SELECT user_id, session_idx, count(*)::BIGINT AS n_events
         FROM s GROUP BY 1, 2)
SELECT user_id, count(*)::BIGINT AS n_sessions,
       sum(n_events)::BIGINT AS n_events,
       max(n_events)::BIGINT AS max_session_events,
       (sum(n_events) * 1000 // count(*))::BIGINT AS mean_len_milli
FROM sess GROUP BY 1"""


def sql_embedding_dim_stats() -> str:
    """Twin of ``similarity.embedding_dim_stats``: quantize-first element
    ppm ints, exact sums, mean/var derived in the engine's double op order
    (ss/n − (s/n)²). The inner CAST to DOUBLE is load-bearing (FLOAT
    arithmetic would disagree at floor boundaries — see the centroids
    twin)."""
    return """
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT)
           AS ppm
  FROM embeddings
),
a AS (SELECT dim::BIGINT AS dim, count(*)::BIGINT AS n,
             sum(ppm)::BIGINT AS s, sum(ppm * ppm)::BIGINT AS ss
      FROM ex GROUP BY 1)
SELECT dim, n AS n_vecs,
       (s::DOUBLE / n) AS mean_ppm,
       (ss::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n)) AS var_ppm2
FROM a"""


def sql_events_outlier_iqr() -> str:
    """Twin of ``q_events_outlier_iqr``: discrete quantile fences per type,
    pure integer 2v-vs-2q comparisons (no float fence ever computed)."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (SELECT event_type, {v} AS cents FROM events),
b AS (SELECT event_type,
             quantile_disc(cents, 0.25)::BIGINT AS q1,
             quantile_disc(cents, 0.75)::BIGINT AS q3
      FROM e GROUP BY 1),
f AS (
  SELECT e.event_type,
         CASE WHEN 2 * e.cents < 2 * b.q1 - 3 * (b.q3 - b.q1)
              THEN 1 ELSE 0 END AS lo,
         CASE WHEN 2 * e.cents > 2 * b.q3 + 3 * (b.q3 - b.q1)
              THEN 1 ELSE 0 END AS hi
  FROM e JOIN b ON e.event_type = b.event_type
)
SELECT event_type, count(*)::BIGINT AS n,
       sum(lo)::BIGINT AS n_low, sum(hi)::BIGINT AS n_high,
       (sum(lo) + sum(hi))::BIGINT AS n_outliers
FROM f GROUP BY 1"""


def sql_user_first_last_value() -> str:
    """Twin of ``q_user_first_last_value``: zero-padded ts|id|value packed
    strings, plain min/max, payload sliced off the fixed 34-char prefix."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (
  SELECT user_id,
         lpad(epoch_us(ts)::VARCHAR, 20, '0') || '|'
           || lpad(event_id::VARCHAR, 12, '0') || '|'
           || ({v})::VARCHAR AS pack
  FROM events
),
a AS (SELECT user_id, min(pack) AS fp, max(pack) AS lp FROM e GROUP BY 1)
SELECT user_id,
       substring(fp, 35)::BIGINT AS first_value,
       substring(lp, 35)::BIGINT AS last_value,
       (substring(lp, 35)::BIGINT - substring(fp, 35)::BIGINT) AS delta_cents
FROM a"""


def sql_doc_ngram_novelty(k: int = 3) -> str:
    """Twin of ``dedup.doc_ngram_novelty``: the shared shingle CTE, first
    owner by min doc_id, pure-integer novelty share."""
    return f"""
WITH {_shingle_cte(k=k)},
f AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1),
p AS (
  SELECT sh.doc_id, count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)::BIGINT
           AS n_novel
  FROM sh JOIN f ON sh.shingle = f.shingle GROUP BY 1
)
SELECT doc_id, n_shingles, n_novel,
       (n_novel * 1000000 // n_shingles)::BIGINT AS novelty_ppm
FROM p"""


def sql_user_type_lift() -> str:
    """Twin of ``q_user_type_lift``: distinct (user, type), within-user
    ordered type pairs, lift vs independence in the engine's float order."""
    return """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT count(DISTINCT user_id)::BIGINT AS nu FROM events),
ta AS (SELECT event_type, count(*)::BIGINT AS c FROM ut GROUP BY 1),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*)::BIGINT AS n_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT type_a, type_b, n_ab,
       floor(((n_ab::DOUBLE * (SELECT nu FROM n)::DOUBLE) * 1000000.0::DOUBLE)
             / (ca.c::DOUBLE * cb.c::DOUBLE))::BIGINT AS lift_ppm
FROM p JOIN ta ca ON ca.event_type = p.type_a
       JOIN ta cb ON cb.event_type = p.type_b"""


def sql_user_hour_entropy(quantum: int = 1000) -> str:
    """Twin of ``relational.group_entropy`` over per-user hour-of-day
    counts: quantized logs first, exact integer sums, integer floor
    division — no float in the compared output."""
    return f"""
WITH h AS (SELECT user_id, hour(ts)::BIGINT AS hr FROM events),
c AS (SELECT user_id, hr, count(*)::BIGINT AS c FROM h GROUP BY 1, 2),
a AS (
  SELECT user_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_items,
         sum(c * floor(ln(c::DOUBLE) * {quantum}.0)::BIGINT)::BIGINT AS s
  FROM c GROUP BY 1
)
SELECT user_id, n, n_items,
       ((n * floor(ln(n::DOUBLE) * {quantum}.0)::BIGINT - s) // n)::BIGINT
         AS entropy_milli
FROM a"""


def sql_part_return_wilson() -> str:
    """Twin of ``q_part_return_wilson``: exact (k, n) counts, one Wilson
    lower-bound float expression with identical parenthesization (z=2)."""
    return """
WITH a AS (
  SELECT l_partkey::BIGINT AS l_partkey, count(*)::BIGINT AS n,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS k
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, n, k,
       floor((((k::DOUBLE / n::DOUBLE) + 2.0::DOUBLE / n::DOUBLE)
              - 2.0::DOUBLE * sqrt((k::DOUBLE / n::DOUBLE)
                                   * (1.0::DOUBLE - k::DOUBLE / n::DOUBLE)
                                   / n::DOUBLE
                                   + 1.0::DOUBLE / (n::DOUBLE * n::DOUBLE)))
             / (1.0::DOUBLE + 4.0::DOUBLE / n::DOUBLE)
             * 1000000.0::DOUBLE)::BIGINT AS wilson_low_ppm
FROM a"""


def sql_doc_token_hhi() -> str:
    """Twin of ``q_doc_token_hhi``: whitespace token explode, per-term
    counts as member totals, mirrored squared-share floor."""
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS term
  FROM documents
),
m AS (SELECT doc_id, term, count(*)::BIGINT AS v FROM tok GROUP BY 1, 2),
a AS (SELECT doc_id, count(*)::BIGINT AS n_members, sum(v)::BIGINT AS s,
             sum(v * v)::BIGINT AS ss
      FROM m GROUP BY 1)
SELECT doc_id, n_members, s AS total,
       CASE WHEN s > 0
            THEN floor((ss::DOUBLE * 1000000.0::DOUBLE)
                       / (s::DOUBLE * s::DOUBLE))::BIGINT
            ELSE NULL END AS hhi_e6
FROM a"""


def sql_orders_skyline() -> str:
    """Twin of ``relational.skyline_2d`` over (price cents, −order day):
    min-y per distinct x, then the exclusive running-min window — a point
    survives iff strictly below every smaller-x minimum."""
    v = CENTS.format(col="o_totalprice")
    return f"""
WITH p AS (
  SELECT {v} AS x,
         -(epoch_us(o_orderdate)::BIGINT // 86400000000) AS y
  FROM orders
),
d AS (SELECT x, min(y) AS y FROM p GROUP BY 1),
w AS (SELECT x, y,
             min(y) OVER (ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev
      FROM d)
SELECT x AS price_cents, (-y)::BIGINT AS order_day
FROM w WHERE prev IS NULL OR y < prev"""


def sql_doc_nb_source(k: int = 512) -> str:
    """Twin of ``text.nb_source_confusion``: add-one multinomial NB over the
    top-``k`` vocabulary, integer-quantized weights floor(ln((c+1)/(tot+K))
    ·10⁶) and priors floor(ln(n_s/N)·10⁶) so the per-doc argmax (ties →
    source ASC) is bit-stable across engines. Non-feature tokens drop via
    the feats join — same as the engine's index_in filter."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
cnt_all AS (SELECT term, count(*)::BIGINT AS n FROM tk GROUP BY 1),
feats AS (SELECT term FROM cnt_all ORDER BY n DESC, term LIMIT {k}),
nfeat AS (SELECT count(*)::BIGINT AS kk FROM feats),
dsrc AS (SELECT doc_id, source FROM documents),
srcs AS (SELECT source, count(*)::BIGINT AS nd FROM dsrc GROUP BY 1),
totdocs AS (SELECT sum(nd)::BIGINT AS n FROM srcs),
occ AS (SELECT t.doc_id, t.term FROM tk t JOIN feats f USING (term)),
cnt AS (SELECT d.source, o.term, count(*)::BIGINT AS c
        FROM occ o JOIN dsrc d USING (doc_id) GROUP BY 1, 2),
tot AS (SELECT s.source, coalesce(t.tot, 0)::BIGINT AS tot
        FROM srcs s LEFT JOIN (SELECT source, sum(c)::BIGINT AS tot
                               FROM cnt GROUP BY 1) t USING (source)),
w AS (SELECT t2.source, f.term,
             CAST(floor(ln((coalesce(c.c, 0) + 1)::DOUBLE / (t2.tot + nf.kk))
                        * 1000000) AS BIGINT) AS w
      FROM tot t2 CROSS JOIN feats f CROSS JOIN nfeat nf
      LEFT JOIN cnt c ON c.source = t2.source AND c.term = f.term),
prior AS (SELECT s.source,
                 CAST(floor(ln(s.nd::DOUBLE / td.n) * 1000000) AS BIGINT) AS pq
          FROM srcs s CROSS JOIN totdocs td),
sc AS (SELECT o.doc_id, w.source, sum(w.w)::BIGINT AS sw
       FROM occ o JOIN w ON w.term = o.term GROUP BY 1, 2),
allsc AS (SELECT d.doc_id, d.source AS true_source, p.source AS cand,
                 (p.pq + coalesce(sc.sw, 0))::BIGINT AS score
          FROM dsrc d CROSS JOIN prior p
          LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.source = p.source),
pred AS (SELECT doc_id, true_source, cand AS pred_source,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, cand ASC) AS rn
         FROM allsc)
SELECT true_source AS source, pred_source, count(*)::BIGINT AS n_docs
FROM pred WHERE rn = 1 GROUP BY 1, 2"""


def sql_source_token_kl(k: int = 512) -> str:
    """Twin of ``text.source_token_kl``: pairwise smoothed KL over the
    top-``k`` vocabulary, per-term contribution floor(p_a·ln(p_a/p_b)·10⁹)
    with p = (cnt+1)::DOUBLE/(tot+K) — the identical
    divide/divide/divide/ln/multiply/multiply/floor chain as numpy."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
cnt_all AS (SELECT term, count(*)::BIGINT AS n FROM tk GROUP BY 1),
feats AS (SELECT term FROM cnt_all ORDER BY n DESC, term LIMIT {k}),
nfeat AS (SELECT count(*)::BIGINT AS kk FROM feats),
dsrc AS (SELECT doc_id, source FROM documents),
srcs AS (SELECT DISTINCT source FROM dsrc),
occ AS (SELECT t.doc_id, t.term FROM tk t JOIN feats f USING (term)),
cnt AS (SELECT d.source, o.term, count(*)::BIGINT AS c
        FROM occ o JOIN dsrc d USING (doc_id) GROUP BY 1, 2),
tot AS (SELECT s.source, coalesce(t.tot, 0)::BIGINT AS tot
        FROM srcs s LEFT JOIN (SELECT source, sum(c)::BIGINT AS tot
                               FROM cnt GROUP BY 1) t USING (source)),
p AS (SELECT t2.source, f.term,
             (coalesce(c.c, 0) + 1)::DOUBLE / (t2.tot + nf.kk) AS p
      FROM tot t2 CROSS JOIN feats f CROSS JOIN nfeat nf
      LEFT JOIN cnt c ON c.source = t2.source AND c.term = f.term)
SELECT a.source AS source_a, b.source AS source_b,
       sum(CAST(floor(a.p * ln(a.p / b.p) * 1000000000) AS BIGINT))::BIGINT
         AS kl_q,
       count(*)::BIGINT AS n_terms
FROM p a JOIN p b ON a.term = b.term AND a.source <> b.source
GROUP BY 1, 2"""


def sql_chunk_dup_stats(chunk: int = 16, overlap: int = 4) -> str:
    """Twin of ``corpus.chunk_dup_stats``: the ``sql_doc_chunks`` window
    CTE, the ``_hash60`` md5 fingerprint expression, pair-then-hash
    grouping, duplicates only."""
    return f"""
WITH ch AS ({sql_doc_chunks(chunk, overlap)}),
h AS (SELECT doc_id::BIGINT AS doc_id,
             ('0x' || substr(md5('chunk:' || chunk_text), 1, 15))::UBIGINT::BIGINT
               AS chunk_hash
      FROM ch),
pairs AS (SELECT chunk_hash, doc_id, count(*)::BIGINT AS n
          FROM h GROUP BY 1, 2)
SELECT chunk_hash, sum(n)::BIGINT AS n_occ, count(*)::BIGINT AS n_docs
FROM pairs GROUP BY 1 HAVING sum(n) > 1"""


def sql_order_percent_rank() -> str:
    """Twin of ``q_order_percent_rank``: deterministic row_number over
    (cents, o_orderkey) per priority; pr_ppm = (rn−1)·10⁶ // (n−1) — all
    non-negative integers, so // truncation == floor on both engines."""
    v = CENTS.format(col="o_totalprice")
    return f"""
WITH o AS (SELECT o_orderkey::BIGINT AS o_orderkey, o_orderpriority,
                  {v} AS cents FROM orders),
r AS (SELECT o_orderkey, o_orderpriority, cents,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY cents, o_orderkey)::BIGINT AS rn,
             count(*) OVER (PARTITION BY o_orderpriority)::BIGINT AS n
      FROM o)
SELECT o_orderkey, o_orderpriority, cents,
       (CASE WHEN n > 1 THEN ((rn - 1) * 1000000) // (n - 1)
             ELSE 0 END)::BIGINT AS pr_ppm
FROM r"""


def sql_cohort_ltv() -> str:
    """Twin of ``events.cohort_ltv``: integer month keys, per-(user, month)
    cents partials, cohort min join, (cohort × offset) rollup, running
    cumulative via the window sum."""
    v = CENTS.format(col="value")
    return f"""
WITH mv AS (
  SELECT user_id::BIGINT AS u,
         (date_part('year', ts)::BIGINT * 12 + date_part('month', ts)::BIGINT)
           AS ym,
         sum({v})::BIGINT AS v
  FROM events GROUP BY 1, 2
),
c AS (SELECT u, min(ym) AS cohort_ym FROM mv GROUP BY 1),
g AS (SELECT c.cohort_ym, (mv.ym - c.cohort_ym)::BIGINT AS month_offset,
             count(*)::BIGINT AS n_users, sum(mv.v)::BIGINT AS ltv_cents
      FROM mv JOIN c USING (u) GROUP BY 1, 2)
SELECT cohort_ym, month_offset, n_users, ltv_cents,
       sum(ltv_cents) OVER (PARTITION BY cohort_ym
                            ORDER BY month_offset)::BIGINT AS cum_cents
FROM g"""


def sql_embedding_label_margin() -> str:
    """Twin of ``similarity.embedding_label_margin``: quantize-first ppm
    elements, TRUE-floor centroid division (the remainder-corrected CASE —
    sums go negative, DuckDB // truncates toward zero, numpy floors),
    exact int64 squared distances, nearest-other tie-break (d2, label)."""
    return """
WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT)
           AS ppm
  FROM embeddings
),
cs AS (SELECT label, dim, sum(ppm)::BIGINT AS s, count(*)::BIGINT AS n
       FROM ex GROUP BY 1, 2),
cent AS (SELECT label, dim,
                (s // n - CASE WHEN s < 0 AND (s % n) <> 0
                               THEN 1 ELSE 0 END)::BIGINT AS c
         FROM cs),
d2 AS (SELECT e.vec_id, e.label AS own, c.label AS cand,
              sum((e.ppm - c.c) * (e.ppm - c.c))::BIGINT AS d2
       FROM ex e JOIN cent c ON c.dim = e.dim
       GROUP BY 1, 2, 3),
own AS (SELECT vec_id, own AS label, d2 AS d2_own FROM d2 WHERE own = cand),
oth AS (SELECT vec_id, cand AS other_label, d2 AS d2_other,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cand) AS rn
        FROM d2 WHERE own <> cand)
SELECT o.vec_id, w.label, w.d2_own, o.d2_other, o.other_label,
       (o.d2_other - w.d2_own)::BIGINT AS margin
FROM own w JOIN oth o ON o.vec_id = w.vec_id AND o.rn = 1"""


def sql_session_type_rules(gap_minutes: int = 30) -> str:
    """Twin of ``events.session_type_rules``: the sessionize lag/cumsum CTE
    chain, distinct (user, session, type) baskets, a < b pair counts
    mirrored to both directions, integer ppm confidence and lift."""
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH o AS (
  SELECT user_id, event_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
f AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM o
),
s AS (
  SELECT user_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM f
),
b AS (SELECT DISTINCT user_id, sess, event_type FROM s),
na AS (SELECT event_type, count(*)::BIGINT AS n FROM b GROUP BY 1),
ns AS (SELECT count(*)::BIGINT AS n FROM
       (SELECT DISTINCT user_id, sess FROM b)),
p AS (SELECT x.event_type AS ta, y.event_type AS tb, count(*)::BIGINT AS n_ab
      FROM b x JOIN b y
        ON x.user_id = y.user_id AND x.sess = y.sess
       AND x.event_type < y.event_type
      GROUP BY 1, 2),
u AS (SELECT ta, tb, n_ab FROM p UNION ALL SELECT tb, ta, n_ab FROM p)
SELECT u.ta AS type_a, u.tb AS type_b, u.n_ab, a.n AS n_a, bb.n AS n_b,
       ((u.n_ab * 1000000) // a.n)::BIGINT AS conf_ppm,
       ((u.n_ab * ns.n * 1000000) // (a.n * bb.n))::BIGINT AS lift_ppm
FROM u JOIN na a ON a.event_type = u.ta
JOIN na bb ON bb.event_type = u.tb CROSS JOIN ns"""


def sql_last_touch_attribution(
    target_type: str = "purchase", window_us: int = 86_400_000_000
) -> str:
    """Twin of ``events.last_touch_attribution``: the identical
    ts_us·64+code encoding (alphabetical codes over non-target types), an
    inclusive preceding-window max, window check, '(none)' bucket."""
    v = CENTS.format(col="value")
    return f"""
WITH codes AS (
  SELECT event_type, (row_number() OVER (ORDER BY event_type) - 1)::BIGINT
           AS code
  FROM (SELECT DISTINCT event_type FROM events
        WHERE event_type <> '{target_type}')
),
e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             {v} AS cents FROM events),
enc AS (SELECT e.*, CASE WHEN e.event_type <> '{target_type}'
                         THEN e.ts_us * 64 + c.code ELSE -1 END AS ev
        FROM e LEFT JOIN codes c USING (event_type)),
m AS (SELECT *, max(ev) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS attr
      FROM enc),
p AS (SELECT CASE WHEN attr >= 0 AND ts_us - (attr // 64) <= {window_us}
                  THEN attr % 64 ELSE -1 END AS code, cents
      FROM m WHERE event_type = '{target_type}')
SELECT coalesce(c.event_type, '(none)') AS attributed_type,
       count(*)::BIGINT AS n_purchases, sum(p.cents)::BIGINT AS value_cents
FROM p LEFT JOIN codes c USING (code) GROUP BY 1"""


def sql_source_eval_sample(k: int = 10, salt: str = "evalsample") -> str:
    """Twin of ``sampling.group_sample_k`` over documents: row_number per
    source ordered by the identical md5 60-bit hash, then doc_id."""
    esc = salt.replace("'", "''")
    return f"""
WITH h AS (
  SELECT doc_id::BIGINT AS doc_id, source,
         ('0x' || substr(md5('{esc}:' || doc_id), 1, 15))::UBIGINT::BIGINT
           AS hh
  FROM documents
)
SELECT doc_id, source FROM h
QUALIFY row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) <= {k}"""


def sql_source_retention_funnel(
    k: int = 3, min_jaccard: float = 0.5, cap: int = 1000
) -> str:
    """Twin of ``q_source_retention_funnel``: the quality / exact-dedup /
    near-dup twins' verdicts joined onto (doc, source), per-source sums —
    each audit evaluated over the FULL corpus independently."""
    return f"""
WITH q AS ({sql_doc_quality_filter()}),
e AS ({sql_dedup_exact()}),
nd AS ({sql_near_dup_clusters(k, min_jaccard, cap)}),
d AS (SELECT doc_id::BIGINT AS doc_id, source FROM documents)
SELECT d.source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN q.keep THEN 1 ELSE 0 END)::BIGINT AS n_quality,
       sum(CASE WHEN ek.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_exact_keep,
       sum(CASE WHEN nd.is_canonical THEN 1 ELSE 0 END)::BIGINT
         AS n_neardup_keep
FROM d
JOIN q ON q.doc_id = d.doc_id
JOIN nd ON nd.doc_id = d.doc_id
LEFT JOIN (SELECT DISTINCT keep_doc_id::BIGINT AS doc_id FROM e) ek
  ON ek.doc_id = d.doc_id
GROUP BY 1"""


def sql_vocab_oov_rate(k: int = 512) -> str:
    """Twin of ``text.vocab_oov_rate``: top-``k`` vocabulary (count desc,
    term asc), per-source total vs covered occurrences, integer ppm."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
cnt_all AS (SELECT term, count(*)::BIGINT AS n FROM tk GROUP BY 1),
feats AS (SELECT term FROM cnt_all ORDER BY n DESC, term LIMIT {k}),
d AS (SELECT doc_id, source FROM documents),
tot AS (SELECT d.source, count(*)::BIGINT AS n_tokens
        FROM tk t JOIN d USING (doc_id) GROUP BY 1),
inv AS (SELECT d.source, count(*)::BIGINT AS n_in
        FROM tk t JOIN feats USING (term) JOIN d USING (doc_id) GROUP BY 1)
SELECT t.source, t.n_tokens,
       coalesce(i.n_in, 0)::BIGINT AS n_in_vocab,
       (((t.n_tokens - coalesce(i.n_in, 0)) * 1000000)
        // greatest(t.n_tokens, 1))::BIGINT AS oov_ppm
FROM tot t LEFT JOIN inv i USING (source)"""


def sql_embedding_dedup_clusters(threshold: float = 0.3) -> str:
    """Twin of ``q_embedding_dedup_clusters``: exact cosine pairs feed the
    same recursive transitive closure + min-id labeling as the jaccard
    near-dup twin; singletons label themselves."""
    return f"""
WITH RECURSIVE
jp AS (SELECT a.vec_id AS da, b.vec_id AS db
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding, b.embedding)
             >= {threshold}),
edges AS (SELECT da AS a, db AS b FROM jp UNION SELECT db, da FROM jp),
reach AS (
  SELECT a AS node, b AS peer FROM edges
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.peer
),
lab AS (SELECT node, least(node, min(peer))::BIGINT AS cluster_id
        FROM reach GROUP BY 1),
base AS (SELECT v.vec_id::BIGINT AS vec_id,
                coalesce(l.cluster_id, v.vec_id)::BIGINT AS cluster_id
         FROM embeddings v LEFT JOIN lab l ON l.node = v.vec_id)
SELECT vec_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size,
       (vec_id = cluster_id) AS is_canonical
FROM base"""


def sql_events_order_audit() -> str:
    """Twin of ``q_events_order_audit``: lag(ts) over arrival (event_id)
    order per user, adjacent inversion counts, integer ppm."""
    return """
WITH o AS (
  SELECT user_id::BIGINT AS user_id, event_id,
         epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id)
           AS prev
  FROM events
),
a AS (SELECT user_id, count(*)::BIGINT AS n_events,
             sum(CASE WHEN prev > ts_us THEN 1 ELSE 0 END)::BIGINT
               AS n_inversions
      FROM o GROUP BY 1)
SELECT user_id, n_events, n_inversions,
       ((n_inversions * 1000000) // greatest(n_events, 1))::BIGINT
         AS inversion_ppm
FROM a"""


def sql_char_pair_merge_candidates(k: int = 50) -> str:
    """Twin of ``text.char_pair_merge_candidates`` — exact for single-byte
    (ASCII) corpora, where DuckDB's character substr equals the engine's
    byte scan; space-adjacent pairs excluded, (count desc, pair asc)."""
    return f"""
WITH pos AS (
  SELECT text, unnest(range(1, length(text))) AS i
  FROM documents WHERE length(text) >= 2
),
p AS (SELECT substr(text, i::INT, 1) AS c1,
             substr(text, (i + 1)::INT, 1) AS c2
      FROM pos),
f AS (SELECT c1 || c2 AS pair, count(*)::BIGINT AS n
      FROM p WHERE c1 <> ' ' AND c2 <> ' ' GROUP BY 1)
SELECT pair, n FROM f ORDER BY n DESC, pair LIMIT {k}"""


def sql_supplier_slow_ship(late_days: int = 60) -> str:
    """Twin of ``q_supplier_slow_ship``: lineitem⋈orders, µs date delta vs
    the late threshold, per-supplier (k, n), the identical Wilson z=2
    expression as ``sql_part_return_wilson``."""
    late_us = late_days * 86_400_000_000
    return f"""
WITH j AS (
  SELECT l.l_suppkey::BIGINT AS l_suppkey,
         (epoch_us(l.l_shipdate::TIMESTAMP)
          - epoch_us(o.o_orderdate::TIMESTAMP)) AS delta_us
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
a AS (
  SELECT l_suppkey, count(*)::BIGINT AS n,
         sum(CASE WHEN delta_us > {late_us} THEN 1 ELSE 0 END)::BIGINT AS k
  FROM j GROUP BY 1
)
SELECT l_suppkey, n, k,
       floor((((k::DOUBLE / n::DOUBLE) + 2.0::DOUBLE / n::DOUBLE)
              - 2.0::DOUBLE * sqrt((k::DOUBLE / n::DOUBLE)
                                   * (1.0::DOUBLE - k::DOUBLE / n::DOUBLE)
                                   / n::DOUBLE
                                   + 1.0::DOUBLE / (n::DOUBLE * n::DOUBLE)))
             / (1.0::DOUBLE + 4.0::DOUBLE / n::DOUBLE)
             * 1000000.0::DOUBLE)::BIGINT AS wilson_low_ppm
FROM a"""


def sql_event_daily_anomaly() -> str:
    """Twin of ``q_event_daily_anomaly``: epoch-day counts per type, the
    integer-sum z rearrangement (bit-exact, NULL zero-variance)."""
    return """
WITH c AS (
  SELECT event_type, (epoch_us(ts) // 86400000000)::BIGINT AS day,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, count(*)::BIGINT AS cnt, sum(n)::BIGINT AS s,
         sum(n * n)::BIGINT AS s2
  FROM c GROUP BY 1
)
SELECT c.event_type, c.day, c.n,
       CASE WHEN (cnt::DOUBLE * s2 - s::DOUBLE * s) > 0.0::DOUBLE
            THEN floor(((cnt * c.n - s) * 1000000.0::DOUBLE)
                       / sqrt(cnt::DOUBLE * s2 - s::DOUBLE * s))::BIGINT
            ELSE NULL END AS zscore_ppm
FROM c JOIN st USING (event_type)"""


def sql_pack_efficiency(budget: int = 512, n_shards: int = 8) -> str:
    """Twin of ``q_pack_efficiency``: the pack-assign window CTE grouped to
    (shard, pack bin) with integer fill ppm."""
    return f"""
WITH p AS ({sql_doc_pack_assign(budget, n_shards)})
SELECT shard, pack_idx, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS used_tokens,
       ((sum(n_tokens) * 1000000) // {budget})::BIGINT AS fill_ppm
FROM p GROUP BY 1, 2"""


def sql_dup_source_matrix(
    k: int = 3, min_jaccard: float = 0.5, cap: int = 1000
) -> str:
    """Twin of ``q_dup_source_matrix``: the capped shingle pair CTE with the
    jaccard threshold, endpoint sources attached, unordered cell rollup."""
    return f"""
WITH {_shingle_cte(where="", k=k)},
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
capped AS (
  SELECT doc_id, shingle,
         row_number() OVER (PARTITION BY shingle ORDER BY doc_id) AS rn
  FROM sh
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.rn <= {cap} AND b.rn <= {cap}
  GROUP BY 1, 2
),
jp AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
  WHERE n_shared::DOUBLE / (sa.sz + sb.sz - n_shared)::DOUBLE > {min_jaccard}
),
dsrc AS (SELECT doc_id::BIGINT AS doc_id, source FROM documents)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*)::BIGINT AS n_pairs
FROM jp JOIN dsrc da ON da.doc_id = jp.doc_a
JOIN dsrc db ON db.doc_id = jp.doc_b
GROUP BY 1, 2"""


def sql_user_twap() -> str:
    """Twin of ``q_user_twap``: lead() per user in (ts, event_id) order, ms
    holding intervals, exact integer partials, one mirrored float division."""
    return """
WITH e AS (
  SELECT user_id::BIGINT AS u, epoch_us(ts::TIMESTAMP) AS t,
         event_id::BIGINT AS eid,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
),
w AS (
  SELECT u, c, t,
         lead(t) OVER (PARTITION BY u ORDER BY t, eid) AS nt
  FROM e
),
i AS (SELECT u, c, (nt - t) // 1000 AS dms FROM w WHERE nt IS NOT NULL),
a AS (
  SELECT u AS user_id, count(*)::BIGINT AS n_intervals,
         sum(c * dms)::BIGINT AS num, sum(dms)::BIGINT AS span_ms
  FROM i GROUP BY 1
)
SELECT user_id, n_intervals, span_ms,
       CAST(floor(num::DOUBLE / span_ms::DOUBLE) AS BIGINT) AS twap_cents
FROM a WHERE span_ms > 0"""


def sql_daily_revenue_runs() -> str:
    """Twin of ``q_daily_revenue_runs``: day cents rollup, two lag()
    windows (previous revenue, previous sign), zero deltas dropped, the
    identical Wald–Wolfowitz z parenthesization milli-quantized."""
    return """
WITH d AS (
  SELECT epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))::BIGINT AS rev
  FROM orders GROUP BY 1
),
l AS (SELECT day, rev, lag(rev) OVER (ORDER BY day) AS prev FROM d),
s AS (
  SELECT day, CASE WHEN rev > prev THEN 1 ELSE -1 END::BIGINT AS sgn
  FROM l WHERE prev IS NOT NULL AND rev <> prev
),
p AS (SELECT day, sgn, lag(sgn) OVER (ORDER BY day) AS prev_sgn FROM s),
t AS (
  SELECT sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_plus,
         sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)::BIGINT AS n_minus,
         sum(CASE WHEN prev_sgn IS NULL OR prev_sgn <> sgn THEN 1 ELSE 0 END)::BIGINT AS runs
  FROM p
)
SELECT (n_plus + n_minus) AS n_signs, n_plus, n_minus, runs,
       CAST(floor(
         CASE WHEN (2.0::DOUBLE * n_plus::DOUBLE * n_minus::DOUBLE
                    * (2.0::DOUBLE * n_plus::DOUBLE * n_minus::DOUBLE
                       - n_plus::DOUBLE - n_minus::DOUBLE)
                    / ((n_plus + n_minus)::DOUBLE * (n_plus + n_minus)::DOUBLE
                       * ((n_plus + n_minus)::DOUBLE - 1.0::DOUBLE))) > 0.0::DOUBLE
         THEN (runs::DOUBLE
               - (2.0::DOUBLE * n_plus::DOUBLE * n_minus::DOUBLE
                  / (n_plus + n_minus)::DOUBLE + 1.0::DOUBLE))
              / sqrt(2.0::DOUBLE * n_plus::DOUBLE * n_minus::DOUBLE
                     * (2.0::DOUBLE * n_plus::DOUBLE * n_minus::DOUBLE
                        - n_plus::DOUBLE - n_minus::DOUBLE)
                     / ((n_plus + n_minus)::DOUBLE * (n_plus + n_minus)::DOUBLE
                        * ((n_plus + n_minus)::DOUBLE - 1.0::DOUBLE)))
         ELSE 0.0::DOUBLE END * 1000.0::DOUBLE) AS BIGINT) AS z_milli
FROM t"""


def sql_event_hazard_rate(bucket_s: int = 3600, max_bucket: int = 48) -> str:
    """Twin of ``q_event_hazard_rate``: per-user lead() gaps, capped hour
    buckets, suffix at-risk sums via a descending window, exact integer
    hazard ppm."""
    bucket_us = bucket_s * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id::BIGINT AS u, epoch_us(ts::TIMESTAMP) AS t,
         event_id::BIGINT AS eid
  FROM events
),
w AS (SELECT u, t, lead(t) OVER (PARTITION BY u ORDER BY t, eid) AS nt FROM e),
g AS (
  SELECT least((nt - t) // {bucket_us}, {max_bucket})::BIGINT AS bucket_h
  FROM w WHERE nt IS NOT NULL
),
h AS (SELECT bucket_h, count(*)::BIGINT AS n_gaps FROM g GROUP BY 1),
r AS (
  SELECT bucket_h, n_gaps,
         sum(n_gaps) OVER (ORDER BY bucket_h DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                          )::BIGINT AS at_risk
  FROM h
)
SELECT bucket_h, n_gaps, at_risk,
       ((n_gaps * 1000000) // at_risk)::BIGINT AS hazard_ppm
FROM r"""


def sql_event_type_kruskal() -> str:
    """Twin of ``q_event_type_kruskal``: value-cell doubled midranks via one
    exclusive window, per-group HUGEINT rank sums, micro-floored per-group
    Σ R²/n terms, the true-floor negative-division CASE on the final
    tie-corrected statistic."""
    return """
WITH v AS (
  SELECT event_type AS g, CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
),
cv AS (SELECT c, count(*)::HUGEINT AS cnt FROM v GROUP BY 1),
mr AS (
  SELECT c, cnt,
         2 * coalesce(sum(cnt) OVER (ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) + cnt + 1 AS mid2
  FROM cv
),
gv AS (SELECT g, c, count(*)::HUGEINT AS cg FROM v GROUP BY 1, 2),
r AS (
  SELECT g, sum(cg)::HUGEINT AS n, sum(cg * mid2)::HUGEINT AS r2
  FROM gv JOIN mr USING (c) GROUP BY 1
),
a AS (
  SELECT count(*)::BIGINT AS k, sum(n)::HUGEINT AS n,
         sum((1000000::HUGEINT * r2 * r2) // n)::HUGEINT AS s1
  FROM r
),
t AS (SELECT coalesce(sum(cnt * cnt * cnt - cnt), 0)::HUGEINT AS tie FROM cv)
SELECT a.n::BIGINT AS n_rows, a.k AS k_groups, t.tie::BIGINT AS tie_sum,
       CASE WHEN a.k >= 2 AND a.n >= 2
                 AND (1000000::HUGEINT * ((a.n * a.n * a.n - a.n) - t.tie)) > 0
            THEN ((3 * (a.n - 1)
                   * (a.s1 - 1000000::HUGEINT * a.n * (a.n + 1) * (a.n + 1))
                   * 1000)
                  // (1000000::HUGEINT * ((a.n * a.n * a.n - a.n) - t.tie))
                  -- true FLOOR: the numerator can be negative near H = 0
                  - CASE WHEN (3 * (a.n - 1)
                               * (a.s1 - 1000000::HUGEINT * a.n * (a.n + 1) * (a.n + 1))
                               * 1000) < 0
                              AND ((3 * (a.n - 1)
                                    * (a.s1 - 1000000::HUGEINT * a.n * (a.n + 1) * (a.n + 1))
                                    * 1000)
                                   % (1000000::HUGEINT * ((a.n * a.n * a.n - a.n) - t.tie))) <> 0
                         THEN 1 ELSE 0 END)::BIGINT
            ELSE NULL END AS h_milli
FROM a, t"""


def sql_neyman_allocation(total: int = 10_000) -> str:
    """Twin of ``q_neyman_allocation``: HUGEINT stratum moments, the
    floor(sqrt(n·Σc² − (Σc)²)) weight, the largest-remainder CTE from
    ``sql_priority_quota`` with (rem DESC, stratum ASC) tie-break."""
    return f"""
WITH v AS (
  SELECT event_type AS g, CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
),
m AS (
  SELECT g, count(*)::HUGEINT AS n, sum(c)::HUGEINT AS s,
         sum(c::HUGEINT * c)::HUGEINT AS q
  FROM v GROUP BY 1
),
gw AS (
  SELECT g, n,
         CAST(floor(sqrt((n * q - s * s)::DOUBLE)) AS BIGINT) AS weight
  FROM m
),
w AS (SELECT sum(weight)::BIGINT AS tw FROM gw),
mm AS (
  SELECT g, n, weight,
         ({total} * weight) // tw AS base,
         ({total} * weight) % tw AS rem
  FROM gw CROSS JOIN w
),
l AS (SELECT (sum(rem) // (SELECT tw FROM w))::BIGINT AS lv FROM mm),
r AS (
  SELECT g, n, weight, base,
         row_number() OVER (ORDER BY rem DESC, g) AS rnk
  FROM mm
)
SELECT g AS stratum, n::BIGINT AS n_rows, weight,
       (base + CASE WHEN rnk <= (SELECT lv FROM l) THEN 1 ELSE 0 END)::BIGINT
         AS alloc
FROM r"""


def sql_part_theil_sen() -> str:
    """Twin of ``q_part_theil_sen``: per-size lower weighted median via the
    2·cum ≥ W cell scan (``weighted_median`` convention), size-pair slopes
    with the true-floor negative-division CASE, lower median of slopes."""
    return """
WITH c AS (
  SELECT p_size::BIGINT AS s,
         CAST(round(p_retailprice * 100, 0) AS BIGINT) AS v,
         count(*)::BIGINT AS w
  FROM part GROUP BY 1, 2
),
tw AS (SELECT s, sum(w)::BIGINT AS wt FROM c GROUP BY 1),
cum AS (
  SELECT s, v,
         sum(w) OVER (PARTITION BY s ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM c
),
med AS (
  SELECT cum.s, min(v)::BIGINT AS m
  FROM cum JOIN tw USING (s) WHERE 2 * cw >= wt GROUP BY cum.s
),
pr AS (
  SELECT a.s AS sa, a.m AS ma, b.s AS sb, b.m AS mb
  FROM med a JOIN med b ON a.s < b.s
),
sl AS (
  SELECT ((mb - ma) * 1000000) // (sb - sa)
         - CASE WHEN ((mb - ma) * 1000000) < 0
                     AND (((mb - ma) * 1000000) % (sb - sa)) <> 0
                THEN 1 ELSE 0 END AS slope
  FROM pr
),
o AS (
  SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
         count(*) OVER () AS cnt
  FROM sl
)
SELECT (SELECT count(*) FROM med)::BIGINT AS n_sizes,
       (SELECT count(*) FROM sl)::BIGINT AS n_pairs,
       (SELECT slope FROM o WHERE 2 * rn >= cnt
        ORDER BY slope LIMIT 1)::BIGINT AS ts_slope_ppm"""


def sql_minhash_estimate_audit(
    k: int = 3, num_hashes: int = 8, band_size: int = 2, cap: int = 1000
) -> str:
    """Twin of ``dedup.minhash_estimate_audit``: the band/candidate CTEs of
    ``sql_lsh_candidate_pairs``, per-seed component matches, the capped
    shingle intersection RESTRICTED to candidate docs (row_number after the
    restriction, exactly as the engine's semi-join-first exact tier)."""
    n_bands = num_hashes // band_size
    band_expr = "md5(" + " || '|' || ".join(
        f"sig[band_idx * {band_size} + {j + 1}]" for j in range(band_size)
    ) + ")"
    return f"""
WITH {_shingle_cte(k=k)},
mh AS (
  SELECT doc_id, s.seed, min(md5(s.seed::VARCHAR || ':' || shingle)) AS mh
  FROM sh CROSS JOIN (SELECT unnest(range({num_hashes})) AS seed) s
  GROUP BY 1, 2
),
sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
band AS (
  SELECT doc_id, band_idx::BIGINT AS band_idx, {band_expr} AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(range({n_bands})) AS band_idx) b
),
cb AS (
  SELECT doc_id, band_idx, band_hash,
         row_number() OVER (PARTITION BY band_idx, band_hash ORDER BY doc_id) AS rn
  FROM band
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cb a JOIN cb b ON a.band_idx = b.band_idx
                     AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
  WHERE a.rn <= {cap} AND b.rn <= {cap}
  GROUP BY 1, 2
),
est AS (
  SELECT c.doc_a, c.doc_b,
         sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)::BIGINT AS m
  FROM cand c
  JOIN mh ma ON ma.doc_id = c.doc_a
  JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
  GROUP BY 1, 2
),
cd AS (SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b FROM cand),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN cd USING (doc_id)),
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
capped AS (
  SELECT doc_id, shingle,
         row_number() OVER (PARTITION BY shingle ORDER BY doc_id) AS rn
  FROM shr
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS ns
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.rn <= {cap} AND b.rn <= {cap}
  GROUP BY 1, 2
),
ex AS (
  SELECT i.doc_a, i.doc_b,
         ((ns * 1000000) // (sa.sz + sb.sz - ns))::BIGINT AS exact_ppm
  FROM inter i
  JOIN sz sa ON i.doc_a = sa.doc_id
  JOIN sz sb ON i.doc_b = sb.doc_id
)
SELECT e.doc_a, e.doc_b,
       ((e.m * 1000000) // {num_hashes})::BIGINT AS est_ppm,
       ex.exact_ppm,
       ((e.m * 1000000) // {num_hashes} - ex.exact_ppm)::BIGINT AS err_ppm
FROM est e JOIN ex ON e.doc_a = ex.doc_a AND e.doc_b = ex.doc_b"""


def sql_embedding_rp_distortion(k: int = 8, scale: int = 1000) -> str:
    """Twin of ``similarity.rp_distortion``: milli-quantized unnest, the
    md5 first-nibble Rademacher sign matrix, per-pair exact integer
    distance sums, NULL ratio on zero original distance."""
    return f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}.0) AS BIGINT)
           AS q
  FROM embeddings
),
dims AS (SELECT DISTINCT dim FROM ex),
signs AS (
  SELECT dim, j,
         CASE WHEN substr(md5(dim::VARCHAR || ':' || j::VARCHAR), 1, 1)
                   IN ('0','1','2','3','4','5','6','7')
              THEN 1 ELSE -1 END::BIGINT AS s
  FROM dims CROSS JOIN (SELECT unnest(range({k})) AS j) jj
),
proj AS (
  SELECT e.vec_id, s.j, sum(s.s * e.q)::BIGINT AS y
  FROM ex e JOIN signs s ON s.dim = e.dim GROUP BY 1, 2
),
pr AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 2 = 0
),
od AS (
  SELECT p.vec_a, p.vec_b, sum((ea.q - eb.q) * (ea.q - eb.q))::BIGINT AS d2_orig
  FROM pr p
  JOIN ex ea ON ea.vec_id = p.vec_a
  JOIN ex eb ON eb.vec_id = p.vec_b AND eb.dim = ea.dim
  GROUP BY 1, 2
),
pd AS (
  SELECT p.vec_a, p.vec_b, sum((ya.y - yb.y) * (ya.y - yb.y))::BIGINT AS d2_proj
  FROM pr p
  JOIN proj ya ON ya.vec_id = p.vec_a
  JOIN proj yb ON yb.vec_id = p.vec_b AND yb.j = ya.j
  GROUP BY 1, 2
)
SELECT od.vec_a, od.vec_b, od.d2_orig, pd.d2_proj,
       CASE WHEN od.d2_orig > 0
            THEN ((pd.d2_proj * 1000000) // ({k} * od.d2_orig))::BIGINT
            ELSE NULL END AS ratio_ppm
FROM od JOIN pd ON od.vec_a = pd.vec_a AND od.vec_b = pd.vec_b"""


def sql_orders_seasonal_strength() -> str:
    """Twin of ``q_orders_seasonal_strength``: HUGEINT day moments, day%7
    weekday classes, the ``anova_f``-style per-group floors (A − B over
    Q − B), ppm-quantized eta²."""
    return """
WITH d AS (
  SELECT epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))::HUGEINT AS rev
  FROM orders GROUP BY 1
),
g AS (
  SELECT day % 7 AS w, count(*)::HUGEINT AS n, sum(rev)::HUGEINT AS s
  FROM d GROUP BY 1
),
t AS (
  SELECT (SELECT count(*)::HUGEINT FROM d) AS nd,
         (SELECT count(*)::BIGINT FROM g) AS k,
         (SELECT sum(rev)::HUGEINT FROM d) AS st,
         (SELECT sum(rev * rev)::HUGEINT FROM d) AS q,
         (SELECT sum((s * s) // n)::HUGEINT FROM g) AS a
)
SELECT nd::BIGINT AS n_days, k AS k_weekdays,
       CASE WHEN nd >= 2 AND (q - (st * st) // nd) > 0
            -- true FLOOR: per-group flooring can push A below B near eta=0
            THEN ((1000000 * (a - (st * st) // nd))
                  // (q - (st * st) // nd)
                  - CASE WHEN (1000000 * (a - (st * st) // nd)) < 0
                              AND ((1000000 * (a - (st * st) // nd))
                                   % (q - (st * st) // nd)) <> 0
                         THEN 1 ELSE 0 END)::BIGINT
            ELSE NULL END AS eta2_ppm
FROM t"""


def sql_near_dup_threshold_curve() -> str:
    """Twin of ``q_near_dup_threshold_curve``: the full MinHash-audit twin
    as a CTE, exact-ppm deciles, integer mean |error| per decile."""
    inner = sql_minhash_estimate_audit().strip()
    return f"""
WITH audit AS ({inner})
SELECT (exact_ppm // 100000)::BIGINT AS decile,
       count(*)::BIGINT AS n_pairs,
       (sum(abs(err_ppm)) // count(*))::BIGINT AS mean_abs_err_ppm
FROM audit GROUP BY 1"""


def sql_event_tail_hill(quantum: int = 1000) -> str:
    """Twin of ``q_event_tail_hill``: cents cells, inclusive cumulative
    window for the integer p90 (10·cum ≥ 9·n), strict exceedances with
    floor(ln·quantum) logs, integer mean in micro units."""
    return f"""
WITH e AS (
  SELECT event_type AS g, CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events
),
c AS (SELECT g, v, count(*)::BIGINT AS c FROM e GROUP BY 1, 2),
n AS (SELECT g, sum(c)::BIGINT AS n FROM c GROUP BY 1),
cum AS (
  SELECT g, v, c,
         sum(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM c
),
u AS (
  SELECT cum.g, min(v)::BIGINT AS u
  FROM cum JOIN n USING (g) WHERE 10 * cw >= 9 * n GROUP BY cum.g
),
tail AS (
  SELECT c.g, u.u, c.c,
         CAST(floor(ln(c.v::DOUBLE) * {quantum}.0) AS BIGINT)
         - CAST(floor(ln(u.u::DOUBLE) * {quantum}.0) AS BIGINT) AS dl
  FROM c JOIN u USING (g) WHERE c.v > u.u AND u.u >= 1
)
SELECT g AS event_type, min(u)::BIGINT AS u_cents,
       sum(c)::BIGINT AS k_tail,
       ((sum(c * dl) * 1000) // sum(c))::BIGINT AS hill_inv_alpha_micro
FROM tail GROUP BY 1"""


def sql_user_value_sax_motifs() -> str:
    """Twin of ``q_user_value_sax_motifs``: per-user discrete quartiles via
    the 4·cum ≥ k·n cell scan, 0-3 symbol coding, two lead() windows in
    (ts, event_id) order, 3-symbol motif codes, global census."""
    return """
WITH e AS (
  SELECT user_id::BIGINT AS u, epoch_us(ts::TIMESTAMP) AS t,
         event_id::BIGINT AS eid,
         CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events
),
c AS (SELECT u, v, count(*)::BIGINT AS c FROM e GROUP BY 1, 2),
n AS (SELECT u, sum(c)::BIGINT AS n FROM c GROUP BY 1),
cum AS (
  SELECT u, v, c,
         sum(c) OVER (PARTITION BY u ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM c
),
q AS (
  SELECT cum.u,
         min(CASE WHEN 4 * cw >= 1 * n THEN v END)::BIGINT AS q1,
         min(CASE WHEN 4 * cw >= 2 * n THEN v END)::BIGINT AS q2,
         min(CASE WHEN 4 * cw >= 3 * n THEN v END)::BIGINT AS q3
  FROM cum JOIN n USING (u) GROUP BY cum.u
),
s AS (
  SELECT e.u, e.t, e.eid,
         ((CASE WHEN e.v > q.q1 THEN 1 ELSE 0 END)
          + (CASE WHEN e.v > q.q2 THEN 1 ELSE 0 END)
          + (CASE WHEN e.v > q.q3 THEN 1 ELSE 0 END))::BIGINT AS s
  FROM e JOIN q ON q.u = e.u
),
w AS (
  SELECT u, s,
         lead(s, 1) OVER (PARTITION BY u ORDER BY t, eid) AS s1,
         lead(s, 2) OVER (PARTITION BY u ORDER BY t, eid) AS s2
  FROM s
)
SELECT (s * 16 + s1 * 4 + s2)::BIGINT AS motif_code, count(*)::BIGINT AS n
FROM w WHERE s1 IS NOT NULL AND s2 IS NOT NULL
GROUP BY 1"""


def sql_customer_abc_mobility() -> str:
    """Twin of ``q_customer_abc_mobility``: data-midpoint cutoff, the
    ``sql_customer_abc`` window per half, FULL OUTER JOIN, 'none' fill."""
    v = CENTS.format(col="o_totalprice")
    half = """
  SELECT c_custkey, CASE WHEN cum * 100 <= total * 80 THEN 'A'
                         WHEN cum * 100 <= total * 95 THEN 'B'
                         ELSE 'C' END AS cls
  FROM (SELECT c_custkey, v,
               sum(v) OVER (ORDER BY v DESC, c_custkey
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
               (sum(v) OVER ())::BIGINT AS total
        FROM (SELECT o_custkey AS c_custkey, sum({v})::BIGINT AS v
              FROM o WHERE {cond} GROUP BY 1))"""
    return f"""
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate::TIMESTAMP) AS us, o_totalprice
  FROM orders
),
mm AS (SELECT (min(us) + max(us)) // 2 AS cutoff FROM o),
h1 AS ({half.format(v=v, cond="us <= (SELECT cutoff FROM mm)")}),
h2 AS ({half.format(v=v, cond="us > (SELECT cutoff FROM mm)")})
SELECT coalesce(h1.cls, 'none') AS class_h1,
       coalesce(h2.cls, 'none') AS class_h2,
       count(*)::BIGINT AS n_customers
FROM h1 FULL OUTER JOIN h2 USING (c_custkey)
GROUP BY 1, 2"""


def sql_part_affinity_lift(min_support: int = 2, cap: int = 1000) -> str:
    """Twin of ``q_part_affinity_lift``: distinct (order, part) baskets,
    capped intra-basket pairs (the ``bucket_pairs`` contract), supports,
    integer lift ppm."""
    return f"""
WITH op AS (
  SELECT DISTINCT l_orderkey::BIGINT AS o, l_partkey::BIGINT AS p
  FROM lineitem
),
capped AS (
  SELECT o, p, row_number() OVER (PARTITION BY o ORDER BY p) AS rn FROM op
),
pr AS (
  SELECT a.p AS part_a, b.p AS part_b, count(*)::BIGINT AS n_ab
  FROM capped a JOIN capped b ON a.o = b.o AND a.p < b.p
  WHERE a.rn <= {cap} AND b.rn <= {cap}
  GROUP BY 1, 2 HAVING count(*) >= {min_support}
),
sup AS (SELECT p, count(*)::BIGINT AS n FROM op GROUP BY 1),
t AS (SELECT count(DISTINCT o)::BIGINT AS n_orders FROM op)
SELECT pr.part_a, pr.part_b, pr.n_ab, sa.n AS n_a, sb.n AS n_b,
       ((pr.n_ab::HUGEINT * t.n_orders * 1000000)
        // (sa.n::HUGEINT * sb.n))::BIGINT AS lift_ppm
FROM pr JOIN sup sa ON sa.p = pr.part_a
JOIN sup sb ON sb.p = pr.part_b
CROSS JOIN t"""


def sql_nation_trade_matrix() -> str:
    """Twin of ``q_nation_trade_matrix``: the Q7-style four-way join with
    the exact e4 revenue convention, nation²×year rollup."""
    p = CENTS.format(col="l_extendedprice")
    d = CENTS.format(col="l_discount")
    return f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(o.o_orderdate::TIMESTAMP) AS BIGINT) AS o_year,
       count(*)::BIGINT AS n_items,
       sum({p} * (100 - {d}))::BIGINT AS revenue_e4
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
GROUP BY 1, 2, 3"""


def sql_dedup_incoming_verdicts(cap: int = 1000) -> str:
    """Twin of ``q_dedup_incoming_verdicts``: even/odd corpus split, md5
    fingerprint membership for the exact tier, the ``sql_cross_corpus_lsh``
    candidate CTEs for the near tier, LEFT-join verdict CASE."""
    inner = sql_minhash_bands().strip()
    return f"""
WITH band AS ({inner}),
sided AS (
  SELECT doc_id, band_idx, band_hash, (doc_id % 2)::BIGINT AS side FROM band
),
capped AS (
  SELECT *, row_number() OVER (PARTITION BY band_idx, band_hash
                               ORDER BY doc_id) AS rn
  FROM sided
),
xp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a
  JOIN capped b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
               AND a.doc_id < b.doc_id AND a.side <> b.side
  WHERE a.rn <= {cap} AND b.rn <= {cap}
  GROUP BY 1, 2
),
near AS (
  SELECT CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END AS doc_id,
         count(*)::BIGINT AS n_near
  FROM xp GROUP BY 1
),
bfp AS (SELECT DISTINCT md5({_NORM}) AS fp FROM documents WHERE doc_id % 2 = 0),
inc AS (SELECT doc_id::BIGINT AS doc_id, md5({_NORM}) AS fp
        FROM documents WHERE doc_id % 2 = 1)
SELECT i.doc_id,
       CASE WHEN i.fp IN (SELECT fp FROM bfp) THEN 'drop_exact'
            WHEN coalesce(n.n_near, 0) > 0 THEN 'review_near'
            ELSE 'keep' END AS verdict,
       coalesce(n.n_near, 0)::BIGINT AS n_near_candidates
FROM inc i LEFT JOIN near n USING (doc_id)"""


def sql_value_quantile_hist_audit() -> str:
    """Twin of ``q_value_quantile_hist_audit``: the identical
    floor(log2(v+1)·8) binning double expression, per-bin count+min,
    100·cum ≥ p·N quantile reads on both the histogram and the exact
    value cells."""
    return """
WITH v AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS v FROM events),
bb AS (SELECT CAST(floor(log2((v + 1)::DOUBLE) * 8.0) AS BIGINT) AS b, v FROM v),
h AS (SELECT b, count(*)::BIGINT AS n, min(v)::BIGINT AS vmin FROM bb GROUP BY 1),
nt AS (SELECT count(*)::BIGINT AS nn FROM v),
hc AS (SELECT b, vmin,
              sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum
       FROM h),
cells AS (SELECT v, count(*)::BIGINT AS c FROM v GROUP BY 1),
cc AS (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
       FROM cells),
p AS (SELECT unnest([50, 90, 99]) AS pct),
q AS (
  SELECT p.pct::BIGINT AS pct,
         (SELECT vmin FROM hc WHERE 100 * cum >= p.pct * (SELECT nn FROM nt)
          ORDER BY b LIMIT 1) AS est_cents,
         (SELECT v FROM cc WHERE 100 * cum >= p.pct * (SELECT nn FROM nt)
          ORDER BY v LIMIT 1) AS exact_cents
  FROM p
)
SELECT pct, est_cents::BIGINT AS est_cents, exact_cents::BIGINT AS exact_cents,
       CASE WHEN est_cents IS NULL OR exact_cents IS NULL THEN NULL
            ELSE ((abs(est_cents - exact_cents) * 1000000)
                  // greatest(exact_cents, 1))::BIGINT END AS err_ppm
FROM q"""


def sql_order_amount_reconciliation() -> str:
    """Twin of ``q_order_amount_reconciliation``: exact e6 implied totals
    per order, e6-scaled stated totals, per-status integer mismatch
    rollup."""
    p = CENTS.format(col="l_extendedprice")
    d = CENTS.format(col="l_discount")
    t = CENTS.format(col="l_tax")
    c = CENTS.format(col="o_totalprice")
    return f"""
WITH l AS (
  SELECT l_orderkey,
         sum({p} * (100 - {d}) * (100 + {t}))::BIGINT AS implied_e6
  FROM lineitem GROUP BY 1
),
o AS (
  SELECT o_orderkey, o_orderstatus, ({c} * 10000)::BIGINT AS stated_e6
  FROM orders
),
j AS (
  SELECT o.o_orderstatus,
         (l.implied_e6 - o.stated_e6) AS delta, o.stated_e6
  FROM o JOIN l ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
       sum(CASE WHEN delta = 0 THEN 1 ELSE 0 END)::BIGINT AS n_exact,
       (sum((abs(delta) * 1000000) // greatest(stated_e6, 1))
        // count(*))::BIGINT AS mean_abs_err_ppm
FROM j GROUP BY 1"""


def sql_part_brand_price_index() -> str:
    """Twin of ``q_part_brand_price_index``: data-midpoint shipdate cutoff,
    per-(part, half) integer micro unit prices, parts in both halves, the
    HUGEINT Laspeyres numerator/denominator with H1 basket weights."""
    p = CENTS.format(col="l_extendedprice")
    return f"""
WITH l AS (
  SELECT l_partkey, epoch_us(l_shipdate::TIMESTAMP) AS us,
         {p} AS cents, CAST(round(l_quantity, 0) AS BIGINT) AS qty
  FROM lineitem
),
mm AS (SELECT (min(us) + max(us)) // 2 AS cutoff FROM l),
ph AS (
  SELECT l_partkey,
         CASE WHEN us > (SELECT cutoff FROM mm) THEN 1 ELSE 0 END AS half,
         sum(cents)::BIGINT AS rev, sum(qty)::BIGINT AS qty
  FROM l GROUP BY 1, 2
),
h1 AS (SELECT l_partkey, (rev * 1000000) // qty AS p1, qty AS q1
       FROM ph WHERE half = 0 AND qty > 0),
h2 AS (SELECT l_partkey, (rev * 1000000) // qty AS p2
       FROM ph WHERE half = 1 AND qty > 0),
b AS (
  SELECT pt.p_brand, h2.p2::HUGEINT * h1.q1 AS num,
         h1.p1::HUGEINT * h1.q1 AS den
  FROM h1 JOIN h2 USING (l_partkey)
  JOIN part pt ON pt.p_partkey = h1.l_partkey
)
SELECT p_brand, count(*)::BIGINT AS n_parts,
       ((sum(num) * 1000000) // greatest(sum(den), 1))::BIGINT AS index_ppm
FROM b GROUP BY 1"""


def sql_event_transition_latency() -> str:
    """Twin of ``q_event_transition_latency``: lag(ts)/lag(type) per user in
    (ts, event_id) order, ms gaps with floor division, type² rollup."""
    return """
WITH e AS (
  SELECT user_id::BIGINT AS u, epoch_us(ts::TIMESTAMP) AS t,
         event_id::BIGINT AS eid, event_type
  FROM events
),
w AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY u ORDER BY t, eid) AS prev_type,
         (t - lag(t) OVER (PARTITION BY u ORDER BY t, eid)) // 1000 AS gap_ms
  FROM e
)
SELECT prev_type, event_type, count(*)::BIGINT AS n,
       (sum(gap_ms) // count(*))::BIGINT AS mean_gap_ms,
       max(gap_ms)::BIGINT AS max_gap_ms
FROM w WHERE prev_type IS NOT NULL
GROUP BY 1, 2"""


def sql_embedding_anisotropy(scale: int = 1000) -> str:
    """Twin of ``q_embedding_anisotropy``: milli-quantized unnest, HUGEINT
    per-dim sums and squared-norm total, Σ S_d²·10⁶ // (N·Σ‖q‖²)."""
    return f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}.0) AS BIGINT)
           AS q
  FROM embeddings
),
d AS (SELECT dim, sum(q)::HUGEINT AS s FROM ex GROUP BY 1),
t AS (SELECT sum(q::HUGEINT * q)::HUGEINT AS q2,
             count(DISTINCT vec_id)::HUGEINT AS n
      FROM ex)
SELECT t.n::BIGINT AS n_vecs,
       (SELECT count(*)::BIGINT FROM d) AS n_dims,
       CASE WHEN t.n > 0 AND t.q2 > 0
            THEN (((SELECT sum(s * s) FROM d) * 1000000)
                  // (t.n * t.q2))::BIGINT
            ELSE NULL END AS anisotropy_ppm
FROM t"""


def sql_ltv_forecast_eval() -> str:
    """Twin of ``q_ltv_forecast_eval``: data-midpoint cutoff, 30-day signup
    cohorts, per-cohort integer H1 mean as prediction, per-user |H2 − pred|
    MAE in cents."""
    v = CENTS.format(col="value")
    return f"""
WITH e AS (
  SELECT user_id::BIGINT AS u, event_type, epoch_us(ts::TIMESTAMP) AS us,
         {v} AS c
  FROM events
),
mm AS (SELECT (min(us) + max(us)) // 2 AS cutoff FROM e),
coh AS (
  SELECT u, min(us // 2592000000000) AS cohort_m
  FROM e WHERE event_type = 'signup' GROUP BY 1
),
sp AS (
  SELECT u,
         sum(CASE WHEN us <= (SELECT cutoff FROM mm) THEN c ELSE 0 END)::BIGINT AS h1,
         sum(CASE WHEN us > (SELECT cutoff FROM mm) THEN c ELSE 0 END)::BIGINT AS h2
  FROM e WHERE event_type = 'purchase' GROUP BY 1
),
j AS (SELECT coh.cohort_m, sp.h1, sp.h2 FROM coh JOIN sp USING (u)),
pr AS (
  SELECT cohort_m, count(*)::BIGINT AS n_users,
         (sum(h1) // greatest(count(*), 1))::BIGINT AS pred_cents
  FROM j GROUP BY 1
)
SELECT j.cohort_m, pr.n_users, pr.pred_cents,
       (sum(abs(j.h2 - pr.pred_cents)) // pr.n_users)::BIGINT AS mae_cents
FROM j JOIN pr USING (cohort_m)
GROUP BY 1, 2, 3"""


def sql_user_pref_drift(min_events: int = 3) -> str:
    """Twin of ``q_user_pref_drift``: per-(user, half, type) counts, the
    exact integer TV ppm Σ|c1·N2 − c2·N1| // (2·N1·N2), decile census."""
    return f"""
WITH e AS (
  SELECT user_id::BIGINT AS u, event_type, epoch_us(ts::TIMESTAMP) AS us
  FROM events
),
mm AS (SELECT (min(us) + max(us)) // 2 AS cutoff FROM e),
c AS (
  SELECT u, event_type,
         sum(CASE WHEN us <= (SELECT cutoff FROM mm) THEN 1 ELSE 0 END)::BIGINT AS c1,
         sum(CASE WHEN us > (SELECT cutoff FROM mm) THEN 1 ELSE 0 END)::BIGINT AS c2
  FROM e GROUP BY 1, 2
),
n AS (SELECT u, sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM c GROUP BY 1),
q AS (
  SELECT c.u, sum(abs(c.c1 * n.n2 - c.c2 * n.n1))::BIGINT AS num,
         min(n.n1) AS n1, min(n.n2) AS n2
  FROM c JOIN n USING (u)
  WHERE n.n1 >= {min_events} AND n.n2 >= {min_events}
  GROUP BY 1
),
tv AS (SELECT ((num * 1000000) // (2 * n1 * n2)) // 100000 AS drift_decile FROM q)
SELECT drift_decile::BIGINT AS drift_decile, count(*)::BIGINT AS n_users
FROM tv GROUP BY 1"""


def sql_lsh_config_cost_audit(num_hashes: int = 8) -> str:
    """Twin of ``q_lsh_config_cost_audit``: one shared signature CTE, one
    UNION ALL block per band configuration, Σ C(bucket, 2) per config."""
    blocks = []
    for band_size in (1, 2, 4, 8):
        n_bands = num_hashes // band_size
        band_expr = "md5(" + " || '|' || ".join(
            f"sig[band_idx * {band_size} + {j + 1}]" for j in range(band_size)
        ) + ")"
        blocks.append(
            f"""SELECT {band_size} AS band_size, {n_bands} AS n_bands,
       band_idx, {band_expr} AS bh
FROM sig CROSS JOIN (SELECT unnest(range({n_bands})) AS band_idx) b{band_size}"""
        )
    union = "\nUNION ALL\n".join(blocks)
    return f"""
WITH {_shingle_cte()},
mh AS (
  SELECT doc_id, s.seed, min(md5(s.seed::VARCHAR || ':' || shingle)) AS mh
  FROM sh CROSS JOIN (SELECT unnest(range({num_hashes})) AS seed) s
  GROUP BY 1, 2
),
sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
bands AS (
{union}
),
sz AS (
  SELECT band_size, n_bands, band_idx, bh, count(*)::BIGINT AS c
  FROM bands GROUP BY 1, 2, 3, 4
)
SELECT band_size::BIGINT AS band_size, n_bands::BIGINT AS n_bands,
       count(*)::BIGINT AS n_buckets,
       sum((c * (c - 1)) // 2)::BIGINT AS est_pairs
FROM sz GROUP BY 1, 2"""


def sql_dup_quality_interaction(max_bucket: int = 5) -> str:
    """Twin of ``q_dup_quality_interaction``: the near-dup-cluster CTEs
    joined to the text-stats quality column, capped size buckets, integer
    mean quality milli."""
    return f"""{_ndc_ctes(3, 0.5, 1000)},
cs AS (
  SELECT doc_id,
         count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size
  FROM base
),
st AS ({sql_text_stats()})
SELECT least(cs.cluster_size, {max_bucket})::BIGINT AS cluster_size_bucket,
       count(*)::BIGINT AS n_docs,
       ((sum(st.quality) * 1000) // count(*))::BIGINT AS mean_quality_milli
FROM cs JOIN st USING (doc_id)
GROUP BY 1"""


def sql_part_sourcing_risk() -> str:
    """Twin of ``q_part_sourcing_risk``: distinct (part, supplier) pairs,
    per-part supplier counts, census."""
    return """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pp AS (SELECT l_partkey, count(*)::BIGINT AS n_suppliers FROM ps GROUP BY 1)
SELECT n_suppliers, count(*)::BIGINT AS n_parts
FROM pp GROUP BY 1"""


def sql_kmeans_embed(k: int = 8, iters: int = 4) -> str:
    """Twin of ``q_kmeans_embed`` — Lloyd's k-means UNROLLED to ``iters``
    iteration blocks of plain SQL (the round-4 verdict's 'unrolled-iteration
    SQL twin'). Mirrors the engine exactly: init centroids = embeddings of
    the k smallest vec_ids; d² = (Σx² − 2·Σxc) + Σc² with ties → smallest
    cluster (row_number); centroid update in EXACT integer space
    (Σ floor(x·10⁶) as BIGINT, then /(10⁶·n) in double — identical IEEE
    operands on both sides); empty clusters keep their previous centroid.
    The only engine/oracle difference is float summation ORDER inside d²
    (BLAS blocked vs list_sum sequential), which can only flip an argmin on
    a near-ulp distance tie — absent in this corpus and guarded by the
    driver's hash compare."""
    ctes = [
        "emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""c1 AS (
  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS cluster, v AS c
  FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT {k}))""",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""d{i} AS (
  SELECT e.vec_id, e.v, kk.cluster,
    ((list_sum(list_transform(e.v, x -> x * x))
      - 2.0 * list_sum(list_transform(generate_series(1, len(e.v)),
                                      j -> e.v[j] * kk.c[j])))
     + list_sum(list_transform(kk.c, x -> x * x))) AS d2
  FROM emb e CROSS JOIN c{i} kk)""")
        ctes.append(f"""a{i} AS (
  SELECT vec_id, v, cluster FROM (
    SELECT vec_id, v, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, cluster ASC) AS rn
    FROM d{i}) WHERE rn = 1)""")
        ctes.append(f"""s{i} AS (
  SELECT cluster, count(*)::BIGINT AS nv FROM a{i} GROUP BY cluster)""")
        ctes.append(f"""q{i} AS (
  SELECT a.cluster, t.j AS dim,
         sum(floor(a.v[t.j] * 1000000.0)::BIGINT)::BIGINT AS s_dim
  FROM a{i} a, unnest(generate_series(1, len(a.v))) AS t(j)
  GROUP BY a.cluster, t.j)""")
        ctes.append(f"""u{i} AS (
  SELECT q.cluster,
         list(q.s_dim::DOUBLE / (1000000.0 * s.nv) ORDER BY q.dim) AS c
  FROM q{i} q JOIN s{i} s USING (cluster) GROUP BY q.cluster)""")
        ctes.append(f"""c{i + 1} AS (
  SELECT c.cluster, coalesce(u.c, c.c) AS c
  FROM c{i} c LEFT JOIN u{i} u USING (cluster))""")
    final = iters + 1
    ctes.append(f"""dfin AS (
  SELECT e.vec_id, kk.cluster,
    ((list_sum(list_transform(e.v, x -> x * x))
      - 2.0 * list_sum(list_transform(generate_series(1, len(e.v)),
                                      j -> e.v[j] * kk.c[j])))
     + list_sum(list_transform(kk.c, x -> x * x))) AS d2
  FROM emb e CROSS JOIN c{final} kk)""")
    body = ",\n".join(ctes)
    return f"""WITH {body}
SELECT vec_id, cluster FROM (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, cluster ASC) AS rn
  FROM dfin) WHERE rn = 1"""


def sql_tokenizer_fertility() -> str:
    """Twin of ``q_tokenizer_fertility``: per-source char/token budgets under
    the whitespace and BPE-ish regex tokenizations (RE2 on both sides)."""
    return r"""
WITH t AS (
  SELECT source,
         length(coalesce(text, '')) AS n_chars,
         len(regexp_extract_all(coalesce(text, ''), '\S+')) AS n_ws,
         len(regexp_extract_all(coalesce(text, ''), '\w+|[^\w\s]')) AS n_bpe
  FROM documents
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS n_chars,
       sum(n_ws)::BIGINT AS n_ws_tokens,
       sum(n_bpe)::BIGINT AS n_bpe_tokens,
       ((sum(n_chars) * 1000000) // greatest(sum(n_bpe), 1))::BIGINT
         AS fertility_ppm
FROM t GROUP BY source"""
