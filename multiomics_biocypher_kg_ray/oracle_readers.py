"""DuckDB oracle twins for the reader/scalar-parser query family
(SURVEY §2 S1–S5, M2–M6/M9/M11–M15/M17/M18 — the operators that were
pytest-only through round 4).

Each SQL string re-derives the result from the SAME committed fixture file
(or parquet view) through DuckDB's own readers and string/list kernels — an
independent second implementation of the reference semantics
(``omics_adapter.py:634-867``, ``gene_id_utils.py:327-475``,
``build_gene_annotations.py:342-365``), NOT a dump of the engine output.

Fixture paths are resolved at SQL-generation time from this module's
location so the strings stay valid wherever the repo is checked out.
"""

from __future__ import annotations

from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[1]
FIXTURES = _REPO_ROOT / "tests" / "fixtures"

# the exact NULL_SENTINELS set from functions.parsefn, as a SQL list literal
_NULLSTR = "['', '-', 'NA', 'N/A', 'na', 'n/a', 'NaN', 'nan', 'None']"

# _ASTERISK_RE from functions.parsefn (RE2-compatible as-is)
_AST = r"^\s*(\*+)?\s*([-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)\s*(\*+)?\s*$"


def sql_paper_table_extract() -> str:
    """Twin of ``q_paper_table_extract``: DuckDB ``read_csv`` with the same
    delimiter/skip/null-sentinel options (S1), then SQL mirrors of
    ``parse_asterisk_number`` (M4/M5), ``fold_change_to_log2`` (M2),
    ``parse_timepoint_hours`` (M6), ``parse_bool_cell`` (M15),
    ``expand_list_cell`` (M9, via order-preserving list kernels),
    ``clean_text`` (M12) and the ``ent:`` CURIE mint (M13)."""
    p = FIXTURES / "paper_table.csv"
    # timepoint patterns mirror functions.parsefn._TP_PATTERNS in order;
    # the parenthesized absolute (36h) wins over the leading relative time
    tp_paren = r"\((\d+(?:\.\d+)?)\s*[hH]\)"
    tp_h = r"(?i)^\s*(\d+(?:\.\d+)?)\s*h(?:ours?|r s?)?\b"
    tp_min = r"(?i)^\s*(\d+(?:\.\d+)?)\s*min(?:utes?)?\b"
    tp_day = r"(?i)^\s*day\s*(\d+(?:\.\d+)?)\b"
    tp_d = r"(?i)^\s*(\d+(?:\.\d+)?)\s*d(?:ays?)?\b"
    return f"""
WITH raw AS (
  SELECT * FROM read_csv('{p}', delim=';', skip=2, header=true,
                         all_varchar=true, nullstr={_NULLSTR})
), base AS (
  SELECT row_id::BIGINT AS row_id, trim(gene) AS g, fc, fc_type,
         pval::DOUBLE AS pval, timepoint, detected, note
  FROM raw
), fcparse AS (
  SELECT *, regexp_extract(fc, '{_AST}', 2) AS _v,
         (regexp_extract(fc, '{_AST}', 1) <> ''
          OR regexp_extract(fc, '{_AST}', 3) <> '') AS _star
  FROM base
), scalars AS (
  SELECT row_id, g, pval,
    CASE WHEN fc IS NULL OR _v = '' THEN NULL
         WHEN fc_type = 'log2' THEN _v::DOUBLE
         WHEN _v::DOUBLE <= 0 THEN NULL
         ELSE log2(_v::DOUBLE) END AS log2fc,
    CASE WHEN fc IS NULL OR _v = '' THEN false ELSE _star END AS fc_significant,
    CASE WHEN timepoint IS NULL THEN NULL
         WHEN regexp_extract(timepoint, '{tp_paren}', 1) <> ''
           THEN regexp_extract(timepoint, '{tp_paren}', 1)::DOUBLE
         WHEN regexp_extract(trim(timepoint), '{tp_h}', 1) <> ''
           THEN regexp_extract(trim(timepoint), '{tp_h}', 1)::DOUBLE * 1.0::DOUBLE
         WHEN regexp_extract(trim(timepoint), '{tp_min}', 1) <> ''
           THEN regexp_extract(trim(timepoint), '{tp_min}', 1)::DOUBLE * (1.0::DOUBLE / 60.0::DOUBLE)
         WHEN regexp_extract(trim(timepoint), '{tp_day}', 1) <> ''
           THEN regexp_extract(trim(timepoint), '{tp_day}', 1)::DOUBLE * 24.0::DOUBLE
         WHEN regexp_extract(trim(timepoint), '{tp_d}', 1) <> ''
           THEN regexp_extract(trim(timepoint), '{tp_d}', 1)::DOUBLE * 24.0::DOUBLE
         ELSE NULL END AS timepoint_hours,
    CASE WHEN detected IS NULL THEN NULL
         WHEN lower(trim(detected)) IN ('true','yes','y','1','t','+') THEN true
         WHEN lower(trim(detected)) IN ('false','no','n','0','f') THEN false
         ELSE NULL END AS detected,
    replace(replace(note, '''', '^'), '|', ',') AS note_clean
  FROM fcparse
), l1 AS (
  SELECT *, list_prepend(g, list_transform(string_split_regex(g, '[,;]'),
                                           x -> trim(x))) AS lst1
  FROM scalars WHERE g IS NOT NULL
), l2 AS (
  SELECT *, list_filter(lst1, (x, i) -> x <> '' AND list_position(lst1, x) = i) AS lst2
  FROM l1
), l3 AS (
  SELECT *, flatten(list_transform(lst2, tok -> [
      trim(regexp_replace(tok, '\\([^)]*\\)', '', 'g')),
      trim(regexp_extract(tok, '\\(([^)]+)\\)', 1))])) AS extras
  FROM l2
), l4 AS (
  SELECT *, list_concat(lst2, list_filter(extras, (x, i) ->
      x <> '' AND NOT list_contains(lst2, x)
      AND list_position(extras, x) = i)) AS final
  FROM l3
)
SELECT row_id,
       unnest(generate_series(1, len(final)))::BIGINT AS token_rank,
       unnest(final) AS gene_token,
       'ent:' || unnest(final) AS gene_curie,
       log2fc, fc_significant, pval, timepoint_hours, detected, note_clean
FROM l4
"""


def sql_eggnog_tsv_probe() -> str:
    """Twin of ``q_eggnog_tsv_probe`` (S2): skip the ``##`` comment block,
    read the ``#``-prefixed header, '-' (and friends) as null sentinels."""
    p = FIXTURES / "eggnog.tsv"
    return f"""
SELECT "#query" AS query, seed_ortholog, evalue::DOUBLE AS evalue,
       score::DOUBLE AS score, cog_category, description
FROM read_csv('{p}', delim='\t', skip=2, header=true,
              all_varchar=true, nullstr={_NULLSTR})
"""


def sql_keyed_json_probe() -> str:
    """Twin of ``q_keyed_json_probe`` (S3): top-level JSON object keyed by
    locus_tag, unnested via json_keys."""
    p = FIXTURES / "gene_annotations.json"
    return f"""
SELECT k AS locus_tag,
       j -> k ->> 'product' AS product,
       (j -> k ->> 'length')::BIGINT AS length,
       j -> k ->> 'cog' AS cog
FROM (SELECT json(content) AS j FROM read_text('{p}')),
     unnest(json_keys(j)) AS t(k)
"""


def sql_fasta_stats() -> str:
    """Twin of ``q_fasta_stats`` (S4): line-level FASTA parse in SQL —
    trim, drop blanks and ';' comments, window-sum deflines into record
    ids, concatenate sequence lines in order."""
    p = FIXTURES / "proteins.fasta"
    return f"""
WITH raw AS (SELECT content FROM read_text('{p}')),
lines AS (
  SELECT unnest(string_split(content, chr(10))) AS l,
         unnest(generate_series(1, len(string_split(content, chr(10))))) AS i
  FROM raw
), keep AS (
  SELECT trim(l) AS l, i FROM lines
  WHERE trim(l) <> '' AND NOT starts_with(trim(l), ';')
), marked AS (
  SELECT l, i,
         sum(CASE WHEN starts_with(l, '>') THEN 1 ELSE 0 END)
           OVER (ORDER BY i) AS rec
  FROM keep
), recs AS (
  SELECT rec,
         max(CASE WHEN starts_with(l, '>') THEN l END) AS header,
         coalesce(string_agg(CASE WHEN NOT starts_with(l, '>') THEN l END,
                             '' ORDER BY i), '') AS seq
  FROM marked WHERE rec >= 1 GROUP BY rec
), heads AS (
  SELECT trim(substr(header, 2)) AS head, seq FROM recs
)
SELECT split_part(head, ' ', 1) AS accession,
       CASE WHEN position(' ' IN head) > 0
            THEN trim(substr(head, position(' ' IN head) + 1))
            ELSE '' END AS description,
       seq AS sequence,
       length(seq)::BIGINT AS length
FROM heads
"""


def sql_gff_features() -> str:
    """Twin of ``q_gff_features`` (S5 + M11): '#' comment drop, 9-column
    tab split, '.' sentinel to null, semicolon-attribute extraction, and
    the RNA-feature regex skip filter."""
    p = FIXTURES / "features.gff"
    return f"""
WITH raw AS (SELECT content FROM read_text('{p}')),
lines AS (SELECT unnest(string_split(content, chr(10))) AS l FROM raw),
rows_ AS (SELECT l FROM lines WHERE l <> '' AND NOT starts_with(l, '#')),
parsed AS (
  SELECT split_part(l, chr(9), 1) AS seqid,
         split_part(l, chr(9), 3) AS type,
         split_part(l, chr(9), 4)::BIGINT AS start,
         split_part(l, chr(9), 5)::BIGINT AS "end",
         nullif(split_part(l, chr(9), 7), '.') AS strand,
         regexp_extract(split_part(l, chr(9), 9),
                        '(?:^|;)locus_tag=([^;]*)', 1) AS locus_tag,
         nullif(regexp_extract(split_part(l, chr(9), 9),
                               '(?:^|;)Name=([^;]*)', 1), '') AS name
  FROM rows_
)
SELECT * FROM parsed
WHERE NOT regexp_matches(locus_tag, 'tRNA|ncRNA|rRNA')
"""


def sql_formula_elements() -> str:
    """Twin of ``q_formula_elements`` (M17): Hill-notation full-match
    validity + two-char element symbol extraction, distinct-sorted."""
    p = FIXTURES / "metabolites.csv"
    return f"""
WITH raw AS (
  SELECT * FROM read_csv('{p}', delim=',', header=true,
                         all_varchar=true, nullstr={_NULLSTR})
), p AS (
  SELECT name,
    CASE WHEN formula IS NULL
              OR NOT regexp_full_match(trim(formula), '(?:[A-Z][a-z]?\\d*)+')
         THEN []::VARCHAR[]
         ELSE list_sort(list_distinct(
                regexp_extract_all(trim(formula), '[A-Z][a-z]?')))
    END AS els
  FROM raw
)
SELECT name, coalesce(array_to_string(els, ','), '') AS elements_csv,
       len(els)::BIGINT AS n_elements
FROM p
"""


# --------------------------------------------------- M14 id-column detect

_ID_KEYWORDS = ("id", "key", "tag", "accession", "locus", "code", "name")
_ID_SHAPE_SQL = r"^[A-Za-z]*[_\-]?\d+(\.\d+)?$"

# (name, kind) for the part-table columns the detector considers
# (float columns are skipped by the heuristic on both sides)
_PART_COLS = [
    ("p_partkey", "int"),
    ("p_name", "str"),
    ("p_brand", "str"),
    ("p_type", "str"),
    ("p_size", "int"),
]


def sql_id_column_detect(sample_n: int = 2000, head_n: int = 200) -> str:
    """Twin of ``q_id_column_detect`` (M14) over the first ``sample_n`` part
    rows by p_partkey: per-column cardinality / keyword / mean-length /
    id-shape scoring. The keyword test is name-static, so it is resolved at
    SQL-generation time from the same keyword list the engine uses; the
    data-dependent stats come from per-column CTEs over the sample."""
    ctes = [f"samp AS (SELECT * FROM part ORDER BY p_partkey LIMIT {sample_n})"]
    selects = []
    for name, kind in _PART_COLS:
        kw = any(k in name.lower() for k in _ID_KEYWORDS)
        kw_score = "2.0" if kw else "0.0"
        kw_reason = "'keyword_name'" if kw else "NULL"
        ctes.append(
            f"c_{name} AS (SELECT count(DISTINCT {name}) AS nu, count(*) AS n FROM samp)"
        )
        card = "(c.nu::DOUBLE / c.n)"
        card_score = f"CASE WHEN {card} >= 0.3 THEN 1.0 ELSE 0.0 END"
        card_reason = f"CASE WHEN {card} >= 0.3 THEN 'high_cardinality' END"
        if kind == "int":
            extra_score = "0.5"
            shape_reason = "NULL"
            frm = f"FROM c_{name} c"
        else:
            ctes.append(
                f"""s_{name} AS (
  SELECT coalesce(avg(length(v)), 1e300) AS mean_len,
         coalesce(avg(CASE WHEN regexp_matches(v, '{_ID_SHAPE_SQL}')
                           THEN 1.0 ELSE 0.0 END), 0.0) AS shaped,
         count(*) AS n_vals
  FROM (SELECT {name} AS v FROM (SELECT {name}, p_partkey FROM samp
                                 ORDER BY p_partkey LIMIT {head_n}))
  WHERE v IS NOT NULL AND v <> '')"""
            )
            extra_score = (
                "(CASE WHEN st.n_vals > 0 AND st.mean_len <= 24.0 THEN 0.5 ELSE 0.0 END"
                " + CASE WHEN st.n_vals > 0 AND st.shaped >= 0.8 THEN 1.5 ELSE 0.0 END)"
            )
            shape_reason = (
                "CASE WHEN st.n_vals > 0 AND st.shaped >= 0.8"
                " THEN 'id_shaped_values' END"
            )
            frm = f"FROM c_{name} c, s_{name} st"
        int_reason = "'integer'" if kind == "int" else "NULL"
        score = f"({kw_score} + {card_score} + {extra_score})"
        selects.append(
            f"""
  SELECT '{name}' AS "column",
         {score}::DOUBLE AS score,
         ((c.nu * 1000000) // c.n)::BIGINT AS cardinality_ppm,
         concat_ws(',', {kw_reason}, {card_reason}, {shape_reason}, {int_reason}) AS reasons,
         ({score} >= 2.5) AS is_id_like
  {frm}"""
        )
    union = "\n  UNION ALL\n".join(selects)
    return "WITH " + ",\n".join(ctes) + "\n" + union


# ------------------------------------------- M18 priority cascade classify

PRIORITY_CASCADES: list[dict[str, str]] = [
    {"1-URGENT": "critical", "2-HIGH": "elevated"},
    {"2-HIGH": "wrong_tier", "3-MEDIUM": "standard", "4-NOT SPECIFIED": "unspecified"},
]
PRIORITY_DEFAULT = "routine"
PRIORITY_VOCAB = frozenset(
    {"critical", "elevated", "standard", "unspecified", "wrong_tier", "routine"}
)


def sql_priority_classify_probe() -> str:
    """Twin of ``q_priority_classify_probe`` (M18): the first-hit-wins
    cascade flattened into one CASE (generated from the SAME cascade
    config the engine classifies with — earlier tiers shadow later ones)."""
    seen: set[str] = set()
    whens = []
    for tier in PRIORITY_CASCADES:
        for k, v in tier.items():
            if k not in seen:
                seen.add(k)
                whens.append(f"WHEN '{k}' THEN '{v}'")
    case = "CASE o_orderpriority " + " ".join(whens) + f" ELSE '{PRIORITY_DEFAULT}' END"
    return f"""
SELECT {case} AS priority_class, count(*)::BIGINT AS n
FROM orders GROUP BY 1
"""


def sql_value_range_report() -> str:
    """Twin of ``q_value_range_report`` (M3): per-group min/max with the
    declared-linear nonpositive-range warning."""
    return """
SELECT l_returnflag, min(l_discount) AS min_v, max(l_discount) AS max_v,
       'linear_has_nonpositive' AS warning
FROM lineitem GROUP BY l_returnflag HAVING min(l_discount) <= 0
"""
