"""DuckDB oracle SQL generator for the KG pipeline.

Every SQL string here is generated from the SAME config objects
(``config.DEFAULT_RULES``, ``config.default_alias_dictionary``) that drive the
Ray Data stages, so the driver's side-by-side comparison checks two
implementations of one spec. The transcript CTE mirrors
``sources/transcripts.py`` token-for-token (see the spec block there).

All SQL is DuckDB 1.0 / RE2 compatible: no lookbehind, matches are
non-overlapping left-to-right, list slicing is 1-based inclusive.
"""

from __future__ import annotations

from .config import (
    DEFAULT_RULES,
    AliasDictionary,
    ExtractionRule,
    default_alias_dictionary,
)
from .sources.transcripts import EPOCH_2024_US, TURN_TOKENS

# ---------------------------------------------------------------- transcripts


def transcripts_cte() -> str:
    """CTE 'transcripts' — must match sources.transcripts.docs_to_turns."""
    return f"""
transcripts AS (
  SELECT
    'conv_' || lpad(doc_id::VARCHAR, 8, '0') AS conv_id,
    ti::INTEGER AS turn_idx,
    CASE WHEN ti % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
    array_to_string(tk[(ti * {TURN_TOKENS} + 1)::BIGINT : ((ti + 1) * {TURN_TOKENS})::BIGINT], ' ') AS text,
    CASE WHEN ti % 3 = 2 THEN 'search' ELSE '' END AS tool,
    make_timestamp({EPOCH_2024_US} + doc_id * 3600000000 + ti * 60000000) AS ts
  FROM (
    SELECT doc_id, tk, unnest(range(((len(tk) + {TURN_TOKENS} - 1) // {TURN_TOKENS})::BIGINT)) AS ti
    FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
  )
)""".strip()


# ------------------------------------------------------------------ mentions


def _rule_select(rule: ExtractionRule, from_table: str = "transcripts") -> str:
    roles = ", ".join(f"'{r}'" for r in rule.applies_role)
    # zipped unnest over the two capture groups (DuckDB zips parallel unnests)
    base = f"""
  SELECT conv_id, turn_idx, '{rule.rule_id}' AS rule_id, '{rule.predicate}' AS pred,
         unnest(regexp_extract_all(text, '{rule.pattern}', 1)) AS subj_text,
         unnest(regexp_extract_all(text, '{rule.pattern}', 2)) AS obj_text
  FROM {from_table} WHERE role IN ({roles})""".strip()
    if not rule.transforms:
        return base
    # chained transforms: compose the registered DuckDB twins around both
    # sides, in the same order the engine's compile_chain applies them
    from .functions.transforms import sql_chain

    s_expr = sql_chain(rule.transforms, "subj_text")
    o_expr = sql_chain(rule.transforms, "obj_text")
    return (
        f"  SELECT conv_id, turn_idx, rule_id, pred,\n"
        f"         {s_expr} AS subj_text,\n"
        f"         {o_expr} AS obj_text\n"
        f"  FROM (\n{base}\n  )"
    )


def mentions_cte(
    rules: tuple[ExtractionRule, ...] = DEFAULT_RULES,
    name: str = "mentions",
    from_table: str = "transcripts",
) -> str:
    body = "\n  UNION ALL\n".join(_rule_select(r, from_table) for r in rules)
    return f"{name} AS (\n{body}\n)"


# ------------------------------------------------------- alias dict as VALUES


def alias_ctes(d: AliasDictionary | None = None) -> str:
    d = d or default_alias_dictionary()
    spec = ", ".join(f"('{a}', '{c}')" for a, c in sorted(d.specific_lookup.items()))
    multi = ", ".join(
        f"('{a}', {len(cs)}, '{cs[0]}')" for a, cs in sorted(d.multi_lookup.items())
    )
    confl = ", ".join(f"('{a}')" for a in sorted(d.conflicts))
    return (
        f"specific(alias, canonical) AS (VALUES {spec}),\n"
        f"multi(alias, n_cands, c0) AS (VALUES {multi}),\n"
        f"conflicts(alias) AS (VALUES {confl})"
    )


# -------------------------------------------------------------------- linked


def _resolve_cols(side: str) -> str:
    """Resolution CASE chain for one side ('subj' or 'obj').

    Priority must match stages.link.EntityLinker: conflict → tier-1 exact →
    tier-2 singleton → ambiguous → unresolved. (The CI and heuristic passes
    cannot fire on this all-lowercase corpus, so they are omitted from the
    oracle but exercised in unit tests.)
    """
    s = side[0]  # 's' or 'o'
    return f"""
    CASE WHEN c{s}.alias IS NOT NULL THEN NULL
         WHEN s{s}.alias IS NOT NULL THEN s{s}.canonical
         WHEN m{s}.alias IS NOT NULL AND m{s}.n_cands = 1 THEN m{s}.c0
         ELSE NULL END AS {side}_id,
    CASE WHEN c{s}.alias IS NOT NULL THEN 'tier1_conflict'
         WHEN s{s}.alias IS NOT NULL THEN 'tier1_exact'
         WHEN m{s}.alias IS NOT NULL AND m{s}.n_cands = 1 THEN 'tier2_singleton'
         WHEN m{s}.alias IS NOT NULL THEN 'ambiguous'
         ELSE 'unresolved' END AS {side}_method""".strip()


def linked_cte() -> str:
    return f"""
linked AS (
  SELECT m.conv_id, m.turn_idx, m.rule_id, m.pred, m.subj_text, m.obj_text,
    {_resolve_cols("subj")},
    {_resolve_cols("obj")}
  FROM mentions m
  LEFT JOIN conflicts cs ON m.subj_text = cs.alias
  LEFT JOIN specific ss ON m.subj_text = ss.alias
  LEFT JOIN multi ms ON m.subj_text = ms.alias
  LEFT JOIN conflicts co ON m.obj_text = co.alias
  LEFT JOIN specific so ON m.obj_text = so.alias
  LEFT JOIN multi mo ON m.obj_text = mo.alias
)""".strip()


# ------------------------------------------------------------- canonicalize


def canon_ctes(d: AliasDictionary | None = None) -> str:
    """Connected components over alias-equivalence edges via recursive CTE;
    stable canonical ids = 'ent_' + zero-padded dense rank of the component's
    lexicographic min member (the deterministic-sort id assignment)."""
    d = d or default_alias_dictionary()
    edges = d.all_equiv_edges()
    vals = ", ".join(f"('{a}', '{b}')" for a, b in edges)
    return f"""
eq(a, b) AS (VALUES {vals}),
sym AS (
  SELECT a, b FROM eq UNION SELECT b, a FROM eq
  UNION SELECT a, a FROM eq UNION SELECT b, b FROM eq
),
reach(src, dst) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
),
comp AS (SELECT src AS member, min(dst) AS component_key FROM reach GROUP BY src),
canon AS (
  SELECT member, component_key,
         'ent_' || lpad(dense_rank() OVER (ORDER BY component_key)::VARCHAR, 6, '0') AS canonical_id
  FROM comp
)""".strip()


def _doubling_lp_ctes(sym: str, pfx: str, rounds: int = 10) -> str:
    """Unrolled pointer-doubling min-label propagation over a symmetric
    self-looped edge CTE ``sym(a, b)`` → ``{pfx}{rounds}(node, lab)`` with
    lab = min node id of the component. Each round relaxes through both the
    neighbor labels AND the label-of-label pointer (standard pointer
    jumping), so ``rounds`` rounds cover components of diameter 2^rounds —
    2^10 here, far past any real co-occurrence graph. State per round is ONE
    row per node, replacing the full transitive-closure recursive CTE whose
    O(Σ component²) pair set OOM'd DuckDB at sf0.1."""
    # AS MATERIALIZED is load-bearing: each round references the previous
    # round twice and the edge CTE once — default inlining would double the
    # expanded plan per round (2^rounds copies of the whole upstream
    # pipeline, observed as fd exhaustion re-opening the parquet inputs)
    parts = [
        f"{pfx}s AS MATERIALIZED (SELECT a, b FROM {sym})",
        f"{pfx}0 AS MATERIALIZED "
        f"(SELECT a AS node, min(b) AS lab FROM {pfx}s GROUP BY a)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""{pfx}{r} AS MATERIALIZED (
  SELECT node, min(lab) AS lab FROM (
    SELECT s.a AS node, p.lab FROM {pfx}s s JOIN {pfx}{r - 1} p ON s.b = p.node
    UNION ALL
    SELECT p1.node, p2.lab
    FROM {pfx}{r - 1} p1 JOIN {pfx}{r - 1} p2 ON p1.lab = p2.node
  ) GROUP BY node)"""
        )
    return ",\n".join(parts)


def data_canon_ctes(d: AliasDictionary | None = None) -> str:
    """SQL twin of ``canonicalize.data_canonical_map``: learned
    mention-co-occurrence edges (per-turn min-entity anchor; tok:/turn: node
    spaces) ∪ config seed edges → connected components (pointer-doubling
    min-label propagation, memory-bounded) → stable ids."""
    d = d or default_alias_dictionary()
    vals = ", ".join(f"('{a}', '{b}')" for a, b in d.all_equiv_edges())
    return f"""
sides AS (
  SELECT conv_id, turn_idx, subj_text AS text, subj_id AS eid FROM linked
  UNION ALL
  SELECT conv_id, turn_idx, obj_text, obj_id FROM linked
),
anchors AS (
  SELECT conv_id, turn_idx, min(eid) AS anchor
  FROM sides WHERE eid IS NOT NULL GROUP BY 1, 2
),
seed(a, b) AS (VALUES {vals}),
eq2(a, b) AS (
  SELECT 'tok:' || s.text, an.anchor
  FROM sides s JOIN anchors an USING (conv_id, turn_idx)
  UNION
  SELECT 'turn:' || conv_id || ':' || turn_idx, anchor FROM anchors
  UNION
  SELECT a, b FROM seed
),
sym2 AS (
  SELECT a, b FROM eq2 UNION SELECT b, a FROM eq2
  UNION SELECT a, a FROM eq2 UNION SELECT b, b FROM eq2
),
{_doubling_lp_ctes("sym2", "p", rounds=10)},
comp2 AS (SELECT node AS member, lab AS component_key FROM p10),
canon2 AS (
  SELECT member, component_key,
         'ent_' || lpad(dense_rank() OVER (ORDER BY component_key)::VARCHAR, 6, '0') AS canonical_id
  FROM comp2
)""".strip()


# ------------------------------------------------------------ full pipelines


def _kg_prefix(recursive: bool = False) -> str:
    parts = [transcripts_cte(), mentions_cte(), alias_ctes(), linked_cte()]
    if recursive:
        parts.append(canon_ctes())
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return kw + " " + ",\n".join(parts)


def sql_kg_transcripts() -> str:
    return f"{_kg_prefix()} SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts"


def sql_kg_mentions() -> str:
    return (
        f"{_kg_prefix()} SELECT conv_id, turn_idx, rule_id, pred, subj_text, obj_text"
        " FROM mentions"
    )


def sql_kg_linked() -> str:
    return (
        f"{_kg_prefix()} SELECT conv_id, turn_idx, rule_id, pred, subj_text, obj_text,"
        " subj_id, subj_method, obj_id, obj_method FROM linked"
    )


def sql_kg_unresolved() -> str:
    bad = "('unresolved', 'ambiguous', 'tier1_conflict')"
    return f"""{_kg_prefix()}
SELECT conv_id, turn_idx, raw_mention, reason FROM (
  SELECT conv_id, turn_idx, subj_text AS raw_mention, subj_method AS reason FROM linked
  UNION ALL
  SELECT conv_id, turn_idx, obj_text, obj_method FROM linked
) WHERE reason IN {bad}"""


def sql_kg_link_stats() -> str:
    """Per-method resolution stats over both mention sides — twin of
    ``link.resolution_stats`` (the diagnostic-report counts)."""
    return f"""{_kg_prefix()},
sides AS (
  SELECT subj_method AS method, subj_text AS alias FROM linked
  UNION ALL
  SELECT obj_method, obj_text FROM linked
)
SELECT method, count(*)::BIGINT AS n_mentions,
       count(DISTINCT alias)::BIGINT AS n_distinct_aliases
FROM sides GROUP BY 1"""


def sql_kg_components() -> str:
    return f"WITH RECURSIVE {canon_ctes()} SELECT member, component_key, canonical_id FROM canon"


def sql_kg_components_data() -> str:
    prefix = "WITH RECURSIVE " + ",\n".join(
        [transcripts_cte(), mentions_cte(), alias_ctes(), linked_cte(), data_canon_ctes()]
    )
    return f"{prefix} SELECT member, component_key, canonical_id FROM canon2"


def sql_kg_nodes() -> str:
    return f"""{_kg_prefix(recursive=True)},
mr AS (
  SELECT subj_id AS tid FROM linked WHERE subj_id IS NOT NULL
  UNION ALL
  SELECT obj_id FROM linked WHERE obj_id IS NOT NULL
)
SELECT c.canonical_id AS id, 'term' AS label, c.component_key AS name,
       count(*)::BIGINT AS mention_count
FROM mr JOIN canon c ON mr.tid = c.member
GROUP BY 1, 2, 3"""


def _edges_select() -> str:
    return """
SELECT cs.canonical_id AS src, l.pred, co.canonical_id AS dst,
       count(*)::BIGINT AS weight,
       string_agg(DISTINCT l.rule_id, '|' ORDER BY l.rule_id) AS evidence
FROM linked l
JOIN canon cs ON l.subj_id = cs.member
JOIN canon co ON l.obj_id = co.member
GROUP BY 1, 2, 3""".strip()


def sql_kg_edges() -> str:
    return f"{_kg_prefix(recursive=True)} {_edges_select()}"


def sql_kg_edge_lifespan() -> str:
    """Twin of ``materialize.edge_lifespan``: per canonical edge, mention
    count + first/last asserting-turn timestamp (join back to transcripts
    on (conv_id, turn_idx))."""
    return f"""{_kg_prefix(recursive=True)}
SELECT cs.canonical_id AS src, l.pred, co.canonical_id AS dst,
       count(*)::BIGINT AS n_mentions,
       min(t.ts) AS first_seen,
       max(t.ts) AS last_seen
FROM linked l
JOIN canon cs ON l.subj_id = cs.member
JOIN canon co ON l.obj_id = co.member
JOIN transcripts t ON l.conv_id = t.conv_id AND l.turn_idx = t.turn_idx
GROUP BY 1, 2, 3"""


def sql_kg_edge_decay(tau_days: int = 30) -> str:
    """Twin of ``materialize.edge_decay``: per-mention weight quantizes
    FIRST — floor(exp(−age_days/τ)·10⁶) over exact integer age_days (µs
    delta // 86400000000, all non-negative) — then int64 per-edge sums."""
    return f"""{_kg_prefix(recursive=True)},
mts AS (
  SELECT cs.canonical_id AS src, l.pred, co.canonical_id AS dst,
         epoch_us(t.ts) AS ts_us
  FROM linked l
  JOIN canon cs ON l.subj_id = cs.member
  JOIN canon co ON l.obj_id = co.member
  JOIN transcripts t ON l.conv_id = t.conv_id AND l.turn_idx = t.turn_idx
),
mx AS (SELECT max(ts_us) AS m FROM mts)
SELECT src, pred, dst, count(*)::BIGINT AS n_mentions,
       sum(CAST(floor(exp(-(((mx.m - ts_us) // 86400000000)::DOUBLE)
                          / {tau_days}) * 1000000) AS BIGINT))::BIGINT
         AS decay_q
FROM mts CROSS JOIN mx
GROUP BY 1, 2, 3"""


def sql_kg_rule_yield() -> str:
    """Twin of ``q_kg_rule_yield``: per-rule mention and both-sides-linked
    counts over the linked stream, integer ppm."""
    return f"""{_kg_prefix()}
SELECT rule_id, count(*)::BIGINT AS n_mentions,
       sum(CASE WHEN subj_id IS NOT NULL AND obj_id IS NOT NULL
                THEN 1 ELSE 0 END)::BIGINT AS n_linked,
       ((sum(CASE WHEN subj_id IS NOT NULL AND obj_id IS NOT NULL
                  THEN 1 ELSE 0 END) * 1000000)
        // greatest(count(*), 1))::BIGINT AS linked_ppm
FROM linked GROUP BY 1"""


def sql_kg_mention_contexts() -> str:
    """Twin of ``q_kg_mention_contexts``: mentions joined to their turn and
    ±1-turn neighbors (NULL at conversation boundaries)."""
    return f"""{_kg_prefix()}
SELECT m.conv_id, m.turn_idx::BIGINT AS turn_idx, m.pred,
       m.subj_text, m.obj_text,
       tp.text AS prev_text, t0.text AS text, tn.text AS next_text
FROM mentions m
JOIN transcripts t0
  ON t0.conv_id = m.conv_id AND t0.turn_idx = m.turn_idx
LEFT JOIN transcripts tp
  ON tp.conv_id = m.conv_id AND tp.turn_idx = m.turn_idx - 1
LEFT JOIN transcripts tn
  ON tn.conv_id = m.conv_id AND tn.turn_idx = m.turn_idx + 1"""


def sql_kg_provenance_mix() -> str:
    """Twin of ``q_kg_provenance_mix``: substring classification of the
    evidence union over the multi-source edge table."""
    return f"""
WITH ms AS ({sql_kg_multisource()})
SELECT pred,
       CASE WHEN contains(evidence, 'doc:')
                 AND contains(evidence, 'transcript:') THEN 'both'
            WHEN contains(evidence, 'doc:') THEN 'doc_only'
            WHEN contains(evidence, 'transcript:') THEN 'transcript_only'
            ELSE 'other' END AS provenance,
       count(*)::BIGINT AS n_edges
FROM ms GROUP BY 1, 2"""


def sql_kg_degree_gini() -> str:
    """Twin of ``q_kg_degree_gini``: the doubled-midrank exact-integer Gini
    over the node-degree distribution, constant group."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
deg AS (SELECT node, count(*)::BIGINT AS degree FROM
        (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
        GROUP BY 1),
e AS (SELECT 'all' AS g, degree AS v FROM deg),
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
SELECT g, n, s AS total,
       CASE WHEN s > 0
            THEN floor(((vm - (n + 1) * s)::DOUBLE * 1000000.0::DOUBLE)
                       / (n::DOUBLE * s::DOUBLE))::BIGINT
            ELSE NULL END AS gini_ppm
FROM st"""


def sql_kg_entity_profile(quantum: int = 1000) -> str:
    """Twin of ``q_kg_entity_profile``: degree + predicate entropy + top
    out-neighbor + mention lifespan left-joined onto the node universe."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
deg AS (SELECT node AS id, count(*)::BIGINT AS degree,
               sum(weight)::BIGINT AS weighted_degree
        FROM (SELECT src AS node, weight FROM edges
              UNION ALL SELECT dst, weight FROM edges)
        GROUP BY 1),
c AS (SELECT src, pred, count(*)::BIGINT AS c FROM edges GROUP BY 1, 2),
a AS (SELECT src, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_items,
             sum(c * floor(ln(c::DOUBLE) * {quantum}.0)::BIGINT)::BIGINT AS s
      FROM c GROUP BY 1),
pe AS (SELECT src, n_items AS n_preds,
              ((n * floor(ln(n::DOUBLE) * {quantum}.0)::BIGINT - s)
               // n)::BIGINT AS pred_entropy_milli
       FROM a),
topn AS (SELECT src, dst AS top_neighbor, weight::BIGINT AS top_w FROM edges
         QUALIFY row_number() OVER (PARTITION BY src
                                    ORDER BY weight DESC, dst) = 1),
mts AS (
  SELECT cs.canonical_id AS src, co.canonical_id AS dst, t.ts
  FROM linked l
  JOIN canon cs ON l.subj_id = cs.member
  JOIN canon co ON l.obj_id = co.member
  JOIN transcripts t ON l.conv_id = t.conv_id AND l.turn_idx = t.turn_idx
),
nl AS (SELECT id, count(*)::BIGINT AS n_mentions,
              min(ts) AS first_seen, max(ts) AS last_seen
       FROM (SELECT src AS id, ts FROM mts UNION ALL SELECT dst, ts FROM mts)
       GROUP BY 1)
SELECT d.id, d.degree, d.weighted_degree, pe.n_preds, pe.pred_entropy_milli,
       t.top_neighbor, t.top_w, nl.n_mentions, nl.first_seen, nl.last_seen
FROM deg d
LEFT JOIN pe ON pe.src = d.id
LEFT JOIN topn t ON t.src = d.id
LEFT JOIN nl ON nl.id = d.id"""


def sql_kg_pred_synonyms() -> str:
    """Twin of ``q_kg_pred_synonyms``: distinct (src, dst, pred) triples,
    same-(src, dst) predicate pairs (a < b), jaccard ppm over per-pred
    edge-set sizes."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
trip AS (SELECT DISTINCT src, dst, pred FROM edges),
nsz AS (SELECT pred, count(*)::BIGINT AS n FROM trip GROUP BY 1),
p AS (SELECT x.pred AS pred_a, y.pred AS pred_b, count(*)::BIGINT AS n_shared
      FROM trip x JOIN trip y
        ON x.src = y.src AND x.dst = y.dst AND x.pred < y.pred
      GROUP BY 1, 2)
SELECT p.pred_a, p.pred_b, p.n_shared, a.n AS n_a, b.n AS n_b,
       ((p.n_shared * 1000000) // (a.n + b.n - p.n_shared))::BIGINT
         AS jaccard_ppm
FROM p JOIN nsz a ON a.pred = p.pred_a JOIN nsz b ON b.pred = p.pred_b"""


def sql_kg_functional_audit() -> str:
    """Twin of ``q_kg_functional_audit``: per-(pred, src) distinct-object
    counts, per-pred violation rollup in ppm."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
trip AS (SELECT DISTINCT pred, src, dst FROM edges),
ps AS (SELECT pred, src, count(*)::BIGINT AS n_obj FROM trip GROUP BY 1, 2)
SELECT pred, count(*)::BIGINT AS n_subjects,
       sum(CASE WHEN n_obj > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
       ((sum(CASE WHEN n_obj > 1 THEN 1 ELSE 0 END) * 1000000)
        // greatest(count(*), 1))::BIGINT AS violation_ppm
FROM ps GROUP BY 1"""


def sql_kg_snapshot_diff() -> str:
    """Twin of ``q_kg_snapshot_diff``: the base snapshot is the linked
    stream restricted to the md5-split 'a' half (the identical
    ``_split_case`` CASE as ``sampling.hash_split``), re-aggregated to
    edges; diff = full-build edges left-joined to base, adds + weight
    changes only."""
    from .oracle_rel import _split_case

    case = _split_case("l.conv_id", (("a", 0.5), ("b", 0.5)), "split")
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
base AS (
  SELECT cs.canonical_id AS src, l.pred, co.canonical_id AS dst,
         count(*)::BIGINT AS weight
  FROM linked l
  JOIN canon cs ON l.subj_id = cs.member
  JOIN canon co ON l.obj_id = co.member
  WHERE {case} = 'a'
  GROUP BY 1, 2, 3
)
SELECT e.src, e.pred, e.dst, b.weight AS w_base, e.weight AS w_new,
       CASE WHEN b.weight IS NULL THEN 'added'
            ELSE 'weight_changed' END AS status
FROM edges e LEFT JOIN base b USING (src, pred, dst)
WHERE b.weight IS NULL OR b.weight <> e.weight"""


def sql_kg_growth_curve() -> str:
    """Twin of ``q_kg_growth_curve``: first-seen epoch-week (µs //
    604800000000, non-negative) per edge and per node, counted by week."""
    return f"""{_kg_prefix(recursive=True)},
mts AS (
  SELECT cs.canonical_id AS src, l.pred, co.canonical_id AS dst,
         epoch_us(t.ts) AS ts_us
  FROM linked l
  JOIN canon cs ON l.subj_id = cs.member
  JOIN canon co ON l.obj_id = co.member
  JOIN transcripts t ON l.conv_id = t.conv_id AND l.turn_idx = t.turn_idx
),
ew AS (SELECT min(ts_us) // 604800000000 AS week
       FROM mts GROUP BY src, pred, dst),
nw AS (SELECT min(ts_us) // 604800000000 AS week FROM
       (SELECT src AS id, ts_us FROM mts UNION ALL SELECT dst, ts_us FROM mts)
       GROUP BY id)
SELECT week::BIGINT AS week, 'edge' AS kind, count(*)::BIGINT AS n_new
FROM ew GROUP BY 1
UNION ALL
SELECT week::BIGINT, 'node', count(*)::BIGINT FROM nw GROUP BY 1"""


def sql_kg_node_degree() -> str:
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()})
SELECT node AS id, count(*)::BIGINT AS degree, sum(weight)::BIGINT AS weighted_degree
FROM (SELECT src AS node, weight FROM edges UNION ALL SELECT dst, weight FROM edges)
GROUP BY 1"""


def sql_kg_edge_rank() -> str:
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()})
SELECT src, pred, dst, weight,
       row_number() OVER (PARTITION BY pred ORDER BY weight DESC, src, dst)::BIGINT AS rank
FROM edges"""


def sql_kg_conv_stats() -> str:
    return f"""{_kg_prefix()},
t_agg AS (
  SELECT conv_id, count(*)::BIGINT AS n_turns, min(ts) AS first_ts, max(ts) AS last_ts
  FROM transcripts GROUP BY 1
),
m_agg AS (
  SELECT conv_id, count(*)::BIGINT AS n_mentions,
         sum(CASE WHEN subj_id IS NOT NULL AND obj_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_resolved
  FROM linked GROUP BY 1
)
SELECT a.conv_id, a.n_turns,
       coalesce(m.n_mentions, 0)::BIGINT AS n_mentions,
       coalesce(m.n_resolved, 0)::BIGINT AS n_resolved,
       a.first_ts, a.last_ts
FROM t_agg a LEFT JOIN m_agg m USING (conv_id)"""


def sql_entity_consensus() -> str:
    """Majority-vote consensus surface form per resolved entity (A13 twin of
    ``relational.majority_vote``): tie-break = (votes desc, mention asc)."""
    return f"""{_kg_prefix()},
mr AS (
  SELECT subj_id AS entity_id, subj_text AS mention FROM linked WHERE subj_id IS NOT NULL
  UNION ALL
  SELECT obj_id, obj_text FROM linked WHERE obj_id IS NOT NULL
),
cnt AS (SELECT entity_id, mention, count(*)::BIGINT AS n FROM mr GROUP BY 1, 2),
r AS (SELECT entity_id, mention, n,
             row_number() OVER (PARTITION BY entity_id ORDER BY n DESC, mention) AS rn
      FROM cnt)
SELECT entity_id, mention AS consensus, n AS n_votes FROM r WHERE rn = 1"""


def sql_kg_multisource() -> str:
    """Composed MULTI-SOURCE build twin (the ``create_knowledge_graph.py:
    52-279`` dependency-ordered multi-adapter run, shrunk to two sources):
    transcript mentions AND document-level mentions flow through the SAME
    alias linking + shared canonicalization, edges dedup across sources with
    a source-tagged evidence union ('doc:<rule>' | 'transcript:<rule>');
    embedding near-dup pairs join as a third source of document-node edges."""
    doc_turns = (
        "doc_turns AS (SELECT 'doc_' || lpad(doc_id::VARCHAR, 8, '0') AS conv_id, "
        "0 AS turn_idx, 'user' AS role, text FROM documents)"
    )
    tagged = """
mentions AS (
  SELECT conv_id, turn_idx, 'transcript:' || rule_id AS rule_id, pred, subj_text, obj_text
  FROM t_mentions
  UNION ALL
  SELECT conv_id, turn_idx, 'doc:' || rule_id, pred, subj_text, obj_text
  FROM d_mentions
)""".strip()
    parts = [
        transcripts_cte(),
        doc_turns,
        mentions_cte(name="t_mentions", from_table="transcripts"),
        mentions_cte(name="d_mentions", from_table="doc_turns"),
        tagged,
        alias_ctes(),
        linked_cte(),
        canon_ctes(),
    ]
    # third source: embedding-cosine near-dup pairs as near_dup_of edges
    # between document nodes (cross-reference edges between sources)
    nd = """
SELECT 'doc_' || lpad(a.vec_id::VARCHAR, 8, '0') AS src,
       'near_dup_of' AS pred,
       'doc_' || lpad(b.vec_id::VARCHAR, 8, '0') AS dst,
       1::BIGINT AS weight, 'emb:cosine' AS evidence
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) a
JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) b
  ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.3""".strip()
    return (
        "WITH RECURSIVE " + ",\n".join(parts) + " " + _edges_select()
        + "\nUNION ALL\n" + nd
    )


def sql_kg_two_hop() -> str:
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()})
SELECT e1.src AS src, count(DISTINCT e2.dst)::BIGINT AS n_two_hop
FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
GROUP BY 1"""


def sql_kg_pagerank(
    iters: int = 3, damping_pct: int = 85, scale: int = 1_000_000
) -> str:
    """Twin of ``graph.pagerank`` — the same int64 fixed-point recurrence,
    unrolled one CTE per iteration (integer sums are order-independent, so
    the engines match bit-for-bit). ``//`` is DuckDB integer division, the
    exact twin of Arrow's truncating int64 ``divide``; all values positive."""
    base = scale * (100 - damping_pct) // 100
    parts = [
        "e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        "deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1)",
        "ed AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN deg d ON d.src = e.src)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        f"s0 AS (SELECT node, {scale}::BIGINT AS score FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""s{i} AS (
  SELECT n.node,
         ({base}::BIGINT
           + ({damping_pct} * COALESCE(sum(p.score // ed.outdeg), 0)) // 100
         )::BIGINT AS score
  FROM nodes n
  LEFT JOIN ed ON ed.dst = n.node
  LEFT JOIN s{i - 1} p ON p.node = ed.src
  GROUP BY n.node)"""
        )
    return (
        f"{_kg_prefix(recursive=True)},\nedges AS ({_edges_select()}),\n"
        + ",\n".join(parts)
        + f"\nSELECT node, score AS pr_score FROM s{iters}"
    )


def sql_kg_triangles() -> str:
    """Twin of ``graph.node_triangles`` — undirected simple graph, one
    enumeration per triangle via the identical degree-ordered orientation,
    credited to all three corners."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
deg AS (SELECT node, count(*)::BIGINT AS d FROM
        (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        GROUP BY 1),
ori AS (SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                    THEN u.a ELSE u.b END AS u,
               CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                    THEN u.b ELSE u.a END AS v
        FROM und u
        JOIN deg da ON da.node = u.a
        JOIN deg db ON db.node = u.b),
tri AS (SELECT o1.u AS x, o1.v AS y, o2.v AS z
        FROM ori o1
        JOIN ori o2 ON o1.u = o2.u AND o1.v < o2.v
        JOIN und t ON t.a = o1.v AND t.b = o2.v)
SELECT node, count(*)::BIGINT AS n_triangles FROM
(SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
 UNION ALL SELECT z FROM tri)
GROUP BY 1"""


def sql_conv_text_concat() -> str:
    """Twin of the per-conversation ordered text reassembly (sorted_collect
    over (conv_id, turn_idx)) — the document-reconstruction step a transcript
    pipeline runs before doc-level dedup/scoring."""
    return f"""WITH {transcripts_cte()}
SELECT conv_id, string_agg(text, ' ' ORDER BY turn_idx) AS full_text
FROM transcripts GROUP BY 1"""


def sql_kg_degree_histogram() -> str:
    """Twin of ``materialize.degree_histogram``: node-degree distribution
    (degree, n_nodes) over the built edge table — pure integer pipeline."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
deg AS (
  SELECT node, count(*)::BIGINT AS degree
  FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
  GROUP BY 1
)
SELECT degree, count(*)::BIGINT AS n_nodes FROM deg GROUP BY 1"""


def sql_kg_reciprocity() -> str:
    """Twin of ``materialize.reciprocity_by_pred``: per-pred edge count and
    how many edges have their (dst, pred, src) reverse present."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()})
SELECT e.pred, count(*)::BIGINT AS n_edges,
       sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_reciprocal
FROM edges e LEFT JOIN edges r
  ON e.src = r.dst AND e.dst = r.src AND e.pred = r.pred
GROUP BY 1"""


def sql_kg_cooccurrence(cap: int = 200, min_pairs: int = 2) -> str:
    """Twin of ``materialize.cooccurrence_pmi``: distinct (conv, entity)
    occurrences, per-conv entity set capped at the first ``cap`` ascending,
    intra-conv a<b pairs, PMI = ln(n_ab·N/(n_a·n_b)) quantized to
    floor(·10⁶) over exact int64 products."""
    return f"""{_kg_prefix()},
occ AS (
  SELECT DISTINCT conv_id, entity FROM (
    SELECT conv_id, subj_id AS entity FROM linked WHERE subj_id IS NOT NULL
    UNION ALL
    SELECT conv_id, obj_id FROM linked WHERE obj_id IS NOT NULL
  )
),
r AS (
  SELECT conv_id, entity,
         row_number() OVER (PARTITION BY conv_id ORDER BY entity) AS rn
  FROM occ
),
capped AS (SELECT conv_id, entity FROM r WHERE rn <= {cap}),
p AS (
  SELECT a.entity AS ent_a, b.entity AS ent_b, count(*)::BIGINT AS n_ab
  FROM capped a JOIN capped b
    ON a.conv_id = b.conv_id AND a.entity < b.entity
  GROUP BY 1, 2
),
cnt AS (SELECT entity, count(*)::BIGINT AS n FROM capped GROUP BY 1),
tot AS (SELECT count(DISTINCT conv_id)::BIGINT AS nconv FROM capped)
SELECT ent_a, ent_b, n_ab,
       floor(ln((n_ab * nconv)::DOUBLE / (na.n * nb.n))
             * 1000000.0::DOUBLE)::BIGINT AS pmi_q
FROM p
JOIN cnt na ON na.entity = p.ent_a
JOIN cnt nb ON nb.entity = p.ent_b
CROSS JOIN tot
WHERE n_ab >= {min_pairs}"""


def sql_conv_role_stats() -> str:
    """Twin of ``convo.conv_role_stats``: per-conv role/tool/char census."""
    return f"""{_kg_prefix()}
SELECT conv_id, count(*)::BIGINT AS n_turns,
       sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_user,
       sum(CASE WHEN coalesce(tool, '') <> '' THEN 1 ELSE 0 END)::BIGINT AS n_tool,
       sum(length(text))::BIGINT AS n_chars
FROM transcripts GROUP BY 1"""


def sql_conv_response_latency() -> str:
    """Twin of ``convo.response_latency``: lag(ts)/lag(role) per conversation
    ordered by turn_idx, assistant-after-user rows only, per-conv integer
    latency rollup (identical semantics to the engine's lossless
    ts*4+role_code pack)."""
    return f"""{_kg_prefix()}
, lagged AS (
  SELECT conv_id, role,
         lag(role) OVER w AS prev_role,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS latency_us
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, count(*)::BIGINT AS n_responses,
       sum(latency_us)::BIGINT AS total_latency_us,
       min(latency_us)::BIGINT AS min_latency_us,
       max(latency_us)::BIGINT AS max_latency_us
FROM lagged
WHERE role = 'assistant' AND prev_role = 'user'
GROUP BY 1"""


def sql_turn_templates(min_convs: int = 2, k: int = 50) -> str:
    """Twin of ``convo.turn_templates``: texts in ≥ min_convs distinct convs,
    top-k by total occurrences, (n_turns DESC, text)."""
    return f"""{_kg_prefix()}
SELECT text, count(DISTINCT conv_id)::BIGINT AS n_convs,
       count(*)::BIGINT AS n_turns
FROM transcripts GROUP BY 1
HAVING count(DISTINCT conv_id) >= {min_convs}
ORDER BY n_turns DESC, text LIMIT {k}"""


def sql_conv_turn_taking() -> str:
    """Twin of ``convo.turn_taking``: lag(role)/lag(length(text)) per
    conversation ordered by turn_idx, adjacent-pair switch counts and
    absolute length deltas, integer switch_ppm (identical semantics to the
    engine's lossless len*4+role_code pack; convs with a single turn drop
    out — GROUP BY after the prev-IS-NOT-NULL filter, both engines)."""
    return f"""{_kg_prefix()}
, lagged AS (
  SELECT conv_id, role,
         lag(role) OVER w AS prev_role,
         length(text)::BIGINT AS len,
         lag(length(text)::BIGINT) OVER w AS prev_len
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
p AS (
  SELECT conv_id,
         CASE WHEN role <> prev_role THEN 1 ELSE 0 END::BIGINT AS sw,
         abs(len - prev_len)::BIGINT AS dl
  FROM lagged WHERE prev_role IS NOT NULL
),
a AS (
  SELECT conv_id, count(*)::BIGINT AS n_pairs, sum(sw)::BIGINT AS n_switches,
         sum(dl)::BIGINT AS sum_abs_len_delta
  FROM p GROUP BY 1
)
SELECT conv_id, n_pairs, n_switches,
       (n_switches * 1000000 // CASE WHEN n_pairs > 1 THEN n_pairs ELSE 1 END)::BIGINT AS switch_ppm,
       sum_abs_len_delta
FROM a"""


def sql_kg_negative_samples(salt: str = "neg") -> str:
    """Twin of ``graph.negative_samples`` over the built KG edges: the
    identical md5 tail pick over row_number-ordered nodes, the same
    self/original/existing-edge filters, DISTINCT (src, dst_neg)."""
    esc = salt.replace("'", "''")
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
nl AS (SELECT DISTINCT node FROM
       (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
nodes AS (SELECT node, row_number() OVER (ORDER BY node) - 1 AS idx FROM nl),
nn AS (SELECT count(*)::BIGINT AS c FROM nodes),
cand AS (
  SELECT e.src, e.dst, n2.node AS dst_neg
  FROM e CROSS JOIN nn
  JOIN nodes n2 ON n2.idx =
    ('0x' || substr(md5('{esc}:' || e.src || '|' || e.dst), 1, 15))::UBIGINT
      % nn.c
),
flt AS (
  SELECT c.src, c.dst_neg
  FROM cand c
  LEFT JOIN e e2 ON e2.src = c.src AND e2.dst = c.dst_neg
  WHERE c.dst_neg <> c.src AND c.dst_neg <> c.dst AND e2.src IS NULL
)
SELECT DISTINCT src, dst_neg FROM flt"""


def sql_qa_pairs() -> str:
    """Twin of ``convo.qa_pairs``: assistant turns joined to the directly
    preceding user turn on (conv_id, turn_idx − 1)."""
    return f"""{_kg_prefix()},
u AS (SELECT conv_id, turn_idx, text FROM transcripts WHERE role = 'user'),
a AS (SELECT conv_id, turn_idx, text FROM transcripts
      WHERE role = 'assistant')
SELECT a.conv_id, a.turn_idx::BIGINT AS turn_idx, u.text AS prompt,
       a.text AS response,
       length(u.text)::BIGINT AS prompt_chars,
       length(a.text)::BIGINT AS response_chars
FROM a JOIN u ON u.conv_id = a.conv_id AND u.turn_idx = a.turn_idx - 1"""


def sql_kg_type_rollup() -> str:
    """Twin of ``q_kg_type_rollup``: the multi-source edge table rolled up
    to (src_type, pred, dst_type) with edge counts and summed weights —
    node type = split_part(id, '_', 1), the engine's _node_type."""
    return f"""
SELECT split_part(src, '_', 1) AS src_type, pred,
       split_part(dst, '_', 1) AS dst_type,
       count(*)::BIGINT AS n_edges, sum(weight)::BIGINT AS total_weight
FROM ({sql_kg_multisource()}) ms
GROUP BY 1, 2, 3"""


def sql_kg_metapath_census() -> str:
    """Twin of ``queries.metapath_census``: typed 2-hop path counts via the
    naive edge self-join (the factorized per-mid profile product the engine
    runs is count-identical to counting (e1, e2) edge pairs — here the
    oracle states the definition directly)."""
    return f"""
WITH ms AS ({sql_kg_multisource()})
SELECT split_part(e1.src, '_', 1) AS src_type, e1.pred AS pred1,
       split_part(e1.dst, '_', 1) AS mid_type, e2.pred AS pred2,
       split_part(e2.dst, '_', 1) AS dst_type,
       count(*)::BIGINT AS n_paths
FROM ms e1 JOIN ms e2 ON e1.dst = e2.src
GROUP BY 1, 2, 3, 4, 5"""


def sql_kg_schema_audit(
    declared: "tuple[tuple[str, str, str], ...] | None" = None,
) -> str:
    """Twin of ``q_kg_schema_audit``: multi-source edges outside the
    declared (src_type, pred, dst_type) schema, or self-loops (self-loop
    wins the reason priority), rolled up with counts."""
    if declared is None:
        from .pipelines.queries import KG_DECLARED_SCHEMA

        declared = KG_DECLARED_SCHEMA
    vals = ", ".join(f"('{a}', '{p}', '{b}')" for a, p, b in declared)
    return f"""
WITH ms AS ({sql_kg_multisource()}),
decl(src_type, pred, dst_type) AS (VALUES {vals}),
typed AS (
  SELECT split_part(src, '_', 1) AS src_type, pred,
         split_part(dst, '_', 1) AS dst_type,
         (src = dst) AS is_self
  FROM ms
),
flagged AS (
  SELECT t.src_type, t.pred, t.dst_type,
         CASE WHEN t.is_self THEN 'self_loop' ELSE 'undeclared_triple' END AS reason
  FROM typed t
  LEFT JOIN decl d ON d.src_type = t.src_type AND d.pred = t.pred
                  AND d.dst_type = t.dst_type
  WHERE t.is_self OR d.pred IS NULL
)
SELECT src_type, pred, dst_type, reason, count(*)::BIGINT AS n_edges
FROM flagged GROUP BY 1, 2, 3, 4"""


def sql_kg_ppr(
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    seed_prefix: str = "term:s",
) -> str:
    """Twin of ``q_kg_ppr`` — ``graph.pagerank`` with seed restart: the
    identical int64 fixed-point recurrence, unrolled one CTE per iteration,
    with score₀ and the base term masked to the seed set (canonical ids of
    components whose key starts with ``seed_prefix``)."""
    base = scale * (100 - damping_pct) // 100
    parts = [
        "e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        "deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1)",
        "ed AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN deg d ON d.src = e.src)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "seeds AS (SELECT DISTINCT canonical_id AS node FROM canon "
        f"WHERE component_key LIKE '{seed_prefix}%')",
        "sn AS (SELECT n.node, (s.node IS NOT NULL)::BIGINT AS is_seed "
        "FROM nodes n LEFT JOIN seeds s ON s.node = n.node)",
        f"s0 AS (SELECT node, (is_seed * {scale})::BIGINT AS score FROM sn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""s{i} AS (
  SELECT n.node,
         (n.is_seed * {base}::BIGINT
           + ({damping_pct} * COALESCE(sum(p.score // ed.outdeg), 0)) // 100
         )::BIGINT AS score
  FROM sn n
  LEFT JOIN ed ON ed.dst = n.node
  LEFT JOIN s{i - 1} p ON p.node = ed.src
  GROUP BY n.node, n.is_seed)"""
        )
    return (
        f"{_kg_prefix(recursive=True)},\nedges AS ({_edges_select()}),\n"
        + ",\n".join(parts)
        + f"\nSELECT node, score AS ppr_score FROM s{iters}"
    )


def sql_kg_wpagerank(
    iters: int = 3, damping_pct: int = 85, scale: int = 1_000_000
) -> str:
    """Twin of ``graph.pagerank(weighted=True)`` over the built KG edges:
    parallel edges pre-summed per (src, dst), out-mass split proportional
    to edge weight — contribution = score·w // wsum(src); same unrolled
    int64 fixed-point recurrence as ``sql_kg_pagerank``."""
    base = scale * (100 - damping_pct) // 100
    parts = [
        "e AS (SELECT src, dst, sum(weight)::BIGINT AS w FROM edges "
        "WHERE src <> dst GROUP BY 1, 2)",
        "deg AS (SELECT src, sum(w)::BIGINT AS wsum FROM e GROUP BY 1)",
        "ed AS (SELECT e.src, e.dst, e.w, d.wsum FROM e "
        "JOIN deg d ON d.src = e.src)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        f"s0 AS (SELECT node, {scale}::BIGINT AS score FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""s{i} AS (
  SELECT n.node,
         ({base}::BIGINT
           + ({damping_pct} * COALESCE(sum((p.score * ed.w) // ed.wsum), 0)) // 100
         )::BIGINT AS score
  FROM nodes n
  LEFT JOIN ed ON ed.dst = n.node
  LEFT JOIN s{i - 1} p ON p.node = ed.src
  GROUP BY n.node)"""
        )
    return (
        f"{_kg_prefix(recursive=True)},\nedges AS ({_edges_select()}),\n"
        + ",\n".join(parts)
        + f"\nSELECT node, score AS wpr_score FROM s{iters}"
    )


def sql_tool_sequences(k: int = 20) -> str:
    """Twin of ``convo.tool_sequences``: per-conv ordered non-empty tool
    sequence, top-k sequences by conversation count."""
    return f"""{_kg_prefix()},
s AS (
  SELECT conv_id, string_agg(tool, ',' ORDER BY turn_idx) AS seq
  FROM transcripts WHERE coalesce(tool, '') <> '' GROUP BY 1
)
SELECT seq, count(*)::BIGINT AS n_convs FROM s GROUP BY 1
ORDER BY n_convs DESC, seq LIMIT {k}"""


def sql_kg_common_neighbors(cap: int = 200, min_common: int = 2) -> str:
    """Twin of ``graph.common_neighbors``: undirected distinct incidence,
    true distinct degrees for the Adamic–Adar weight floor(10⁶/ln(d)),
    row_number-capped neighbor sets for pair enumeration, integer sums."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
ue AS (SELECT src AS m, dst AS nb FROM edges WHERE src <> dst
       UNION ALL SELECT dst, src FROM edges WHERE src <> dst),
und AS (SELECT DISTINCT m, nb FROM ue),
deg AS (SELECT m, count(*)::BIGINT AS d FROM und GROUP BY 1),
w AS (SELECT m, floor(1000000.0::DOUBLE / ln(d::DOUBLE))::BIGINT AS w
      FROM deg WHERE d >= 2),
cp AS (SELECT m, nb FROM (
         SELECT m, nb, row_number() OVER (PARTITION BY m ORDER BY nb) AS rn
         FROM und) WHERE rn <= {cap}),
j AS (SELECT cp.m, cp.nb, w.w FROM cp JOIN w ON w.m = cp.m),
p AS (SELECT a.nb AS node_a, b.nb AS node_b, a.w AS w
      FROM j a JOIN j b ON a.m = b.m AND a.nb < b.nb)
SELECT node_a, node_b, count(*)::BIGINT AS n_common, sum(w)::BIGINT AS aa_q
FROM p GROUP BY 1, 2
HAVING count(*) >= {min_common}"""


def sql_kg_hub_domains(min_hub_deg: int = 8, rounds: int = 3) -> str:
    """Twin of ``graph.hub_domains``: multi-source BFS unrolled one CTE
    triple per round (frontier fan-out + min-hub pick + anti-join against
    assigned), AS MATERIALIZED for the same inlining-explosion reason as
    the k-core twin."""
    parts = [
        "ue AS (SELECT src AS m, dst AS nb FROM edges WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM edges WHERE src <> dst)",
        "und AS MATERIALIZED (SELECT DISTINCT m, nb FROM ue)",
        "deg AS (SELECT m, count(*)::BIGINT AS d FROM und GROUP BY 1)",
        f"a0 AS MATERIALIZED (SELECT m AS node, m AS hub, 0::BIGINT AS hops "
        f"FROM deg WHERE d >= {min_hub_deg})",
        "f0 AS MATERIALIZED (SELECT node, hub FROM a0)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT und.nb AS node, min(f.hub) AS hub "
            f"FROM f{r - 1} f JOIN und ON f.node = und.m GROUP BY 1)"
        )
        parts.append(
            f"n{r} AS MATERIALIZED (SELECT c.node, c.hub, {r}::BIGINT AS hops "
            f"FROM c{r} c WHERE c.node NOT IN (SELECT node FROM a{r - 1}))"
        )
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT * FROM a{r - 1} "
            f"UNION ALL SELECT * FROM n{r})"
        )
        parts.append(f"f{r} AS MATERIALIZED (SELECT node, hub FROM n{r})")
    body = ",\n".join(parts)
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
{body}
SELECT node, hub, hops FROM a{rounds}"""


def sql_kg_neighbor_jaccard(
    cap: int = 200, min_common: int = 2, min_jaccard_ppm: int = 0
) -> str:
    """Twin of ``graph.neighbor_jaccard``: same incidence/degree/cap CTEs as
    the Adamic-Adar twin; score is pure positive-int floor division
    n_common*10^6 // (d_a + d_b - n_common) with TRUE degrees."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
ue AS (SELECT src AS m, dst AS nb FROM edges WHERE src <> dst
       UNION ALL SELECT dst, src FROM edges WHERE src <> dst),
und AS (SELECT DISTINCT m, nb FROM ue),
deg AS (SELECT m, count(*)::BIGINT AS d FROM und GROUP BY 1),
cp AS (SELECT m, nb FROM (
         SELECT m, nb, row_number() OVER (PARTITION BY m ORDER BY nb) AS rn
         FROM und) WHERE rn <= {cap}),
p AS (SELECT a.nb AS node_a, b.nb AS node_b
      FROM cp a JOIN cp b ON a.m = b.m AND a.nb < b.nb),
cnt AS (SELECT node_a, node_b, count(*)::BIGINT AS n_common
        FROM p GROUP BY 1, 2 HAVING count(*) >= {min_common})
SELECT node_a, node_b, n_common, da.d AS d_a, db.d AS d_b,
       ((n_common * 1000000) // greatest(da.d + db.d - n_common, 1))::BIGINT
         AS jaccard_ppm
FROM cnt
JOIN deg da ON node_a = da.m
JOIN deg db ON node_b = db.m
WHERE (n_common * 1000000) // greatest(da.d + db.d - n_common, 1)
        >= {min_jaccard_ppm}"""


def sql_kg_kcore(k: int = 2, rounds: int = 4) -> str:
    """Twin of ``graph.kcore_peel``: the same fixed number of peel rounds
    unrolled one CTE triple per round (degree → survivors → filtered
    edges); pure integer degrees."""
    # AS MATERIALIZED: each eN is referenced three times per round — the
    # default inlining re-expands the whole upstream KG pipeline 3^rounds
    # times and never finishes
    parts = [
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM edges WHERE src <> dst)"
    ]
    for r in range(rounds):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT node, count(*)::BIGINT AS c FROM "
            f"(SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r}) GROUP BY 1)"
        )
        parts.append(f"s{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE c >= {k})")
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT a, b FROM e{r} "
            f"JOIN s{r} sa ON a = sa.node JOIN s{r} sb ON b = sb.node)"
        )
    body = ",\n".join(parts)
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
{body}
SELECT node, count(*)::BIGINT AS deg
FROM (SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
GROUP BY 1 HAVING count(*) >= {k}"""


def _labelprop_parts(rounds: int) -> list[str]:
    """Shared CTE chain of the labelprop / modularity twins: undirected
    simple graph + ``rounds`` unrolled synchronous LPA updates."""
    parts = [
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM edges WHERE src <> dst)",
        "dir AS MATERIALIZED (SELECT a AS u, b AS v FROM e0 "
        "UNION ALL SELECT b, a FROM e0)",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM dir)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"m{r} AS MATERIALIZED (SELECT dir.v AS node, l.label, "
            f"count(*)::BIGINT AS c FROM dir JOIN l{r - 1} l ON dir.u = l.node "
            f"GROUP BY 1, 2)"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (SELECT node, label, c FROM m{r} QUALIFY "
            f"row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) = 1)"
        )
    return parts


def sql_kg_labelprop(rounds: int = 3) -> str:
    """Twin of ``graph.label_propagation``: the same fixed number of
    synchronous rounds unrolled one CTE pair per round (messages →
    deterministic (count desc, label asc) argmax via QUALIFY)."""
    body = ",\n".join(_labelprop_parts(rounds))
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
{body}
SELECT node, label, c AS n_votes FROM l{rounds}"""


def sql_kg_modularity(rounds: int = 3) -> str:
    """Twin of ``graph.modularity_by_label``: per LPA community the
    fraction-cleared integer modularity contribution q_num = 4·m·e_c −
    d_c² (denominator 4m²) — pure BIGINT, zero floats."""
    parts = _labelprop_parts(rounds) + [
        f"lab AS (SELECT node, label FROM l{rounds})",
        "mm AS (SELECT count(*)::BIGINT AS m FROM e0)",
        "intra AS (SELECT la.label AS community, count(*)::BIGINT AS n_intra "
        "FROM e0 JOIN lab la ON la.node = e0.a JOIN lab lb ON lb.node = e0.b "
        "WHERE la.label = lb.label GROUP BY 1)",
        "deg AS (SELECT node, count(*)::BIGINT AS d FROM "
        "(SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1)",
        "dsum AS (SELECT l.label AS community, sum(d.d)::BIGINT AS deg_sum "
        "FROM deg d JOIN lab l ON l.node = d.node GROUP BY 1)",
    ]
    body = ",\n".join(parts)
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
{body}
SELECT ds.community, coalesce(i.n_intra, 0)::BIGINT AS n_intra, ds.deg_sum,
       (4 * mm.m * coalesce(i.n_intra, 0) - ds.deg_sum * ds.deg_sum)::BIGINT
         AS q_num
FROM dsum ds LEFT JOIN intra i USING (community) CROSS JOIN mm"""


def sql_kg_node_lifespan() -> str:
    """Twin of ``materialize.node_lifespan``: the edge-decay mention CTE,
    exploded to both endpoints, count/min/max per canonical node."""
    return f"""{_kg_prefix(recursive=True)},
mts AS (
  SELECT cs.canonical_id AS src, co.canonical_id AS dst, t.ts
  FROM linked l
  JOIN canon cs ON l.subj_id = cs.member
  JOIN canon co ON l.obj_id = co.member
  JOIN transcripts t ON l.conv_id = t.conv_id AND l.turn_idx = t.turn_idx
)
SELECT id, count(*)::BIGINT AS n_mentions,
       min(ts) AS first_seen, max(ts) AS last_seen
FROM (SELECT src AS id, ts FROM mts UNION ALL SELECT dst, ts FROM mts)
GROUP BY 1"""


def sql_kg_walk_corpus(steps: int = 3) -> str:
    """Twin of ``graph.walk_corpus``: per-step next-hop = the out-edge with
    the smallest md5('walk:src:step:dst') 60-bit hash (ties → dst), walks
    unrolled one CTE pair per step, step-0 rows included."""
    parts = [
        "e AS (SELECT DISTINCT src, dst FROM edges)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "w0 AS (SELECT node AS start, node FROM nodes)",
    ]
    for r in range(1, steps + 1):
        parts.append(
            f"n{r} AS (SELECT src, dst FROM ("
            f"SELECT src, dst, ('0x' || substr(md5('walk:' || src || ':{r}:' "
            f"|| dst), 1, 15))::UBIGINT::BIGINT AS h FROM e) "
            f"QUALIFY row_number() OVER (PARTITION BY src ORDER BY h, dst) = 1)"
        )
        parts.append(
            f"w{r} AS (SELECT w.start, n.dst AS node "
            f"FROM w{r - 1} w JOIN n{r} n ON n.src = w.node)"
        )
    body = ",\n".join(parts)
    sel = "\nUNION ALL\n".join(
        f"SELECT start, {r}::BIGINT AS step, node FROM w{r}"
        for r in range(steps + 1)
    )
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
{body}
{sel}"""


def sql_kg_assortativity() -> str:
    """Twin of ``graph.degree_assortativity`` — undirected simple graph,
    each edge counted in both orientations, Pearson r between endpoint
    degrees via exact int64 cross-moments, finalized with the same
    promote-then-multiply double op order as ``sql_part_price_corr``."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
dir AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und),
deg AS (SELECT node, count(*)::BIGINT AS d FROM
        (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        GROUP BY 1),
j AS (SELECT du.d AS x, dv.d AS y FROM dir
      JOIN deg du ON du.node = dir.u
      JOIN deg dv ON dv.node = dir.v),
st AS (SELECT count(*)::BIGINT AS n,
              sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
              sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy,
              sum(x*y)::BIGINT AS sxy FROM j)
SELECT n,
       CASE WHEN (n::DOUBLE * sxx - sx::DOUBLE * sx) > 0.0::DOUBLE
             AND (n::DOUBLE * syy - sy::DOUBLE * sy) > 0.0::DOUBLE
            THEN floor(((n::DOUBLE * sxy - sx::DOUBLE * sy) * 1000000.0::DOUBLE)
                       / (sqrt(n::DOUBLE * sxx - sx::DOUBLE * sx)
                          * sqrt(n::DOUBLE * syy - sy::DOUBLE * sy)))::BIGINT
            ELSE NULL END AS assort_ppm
FROM st WHERE n > 0"""


def sql_kg_clustering() -> str:
    """Twin of ``graph.clustering_coefficient`` — same degree-ordered
    triangle enumeration as ``sql_kg_triangles``, credited to corners, then
    cc_ppm = floor(2·T·10⁶ / (d·(d−1))) over every node with degree ≥ 2
    (triangle-free nodes kept at 0 via LEFT JOIN; all-positive BIGINT
    ``//`` == floor)."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
deg AS (SELECT node, count(*)::BIGINT AS d FROM
        (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        GROUP BY 1),
ori AS (SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                    THEN u.a ELSE u.b END AS u,
               CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                    THEN u.b ELSE u.a END AS v
        FROM und u
        JOIN deg da ON da.node = u.a
        JOIN deg db ON db.node = u.b),
tri AS (SELECT o1.u AS x, o1.v AS y, o2.v AS z
        FROM ori o1
        JOIN ori o2 ON o1.u = o2.u AND o1.v < o2.v
        JOIN und t ON t.a = o1.v AND t.b = o2.v),
tc AS (SELECT node, count(*)::BIGINT AS n_triangles FROM
       (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
       GROUP BY 1)
SELECT deg.node, deg.d,
       coalesce(tc.n_triangles, 0)::BIGINT AS n_triangles,
       ((2 * coalesce(tc.n_triangles, 0) * 1000000)
        // (deg.d * (deg.d - 1)))::BIGINT AS cc_ppm
FROM deg LEFT JOIN tc USING (node) WHERE deg.d >= 2"""


def sql_kg_edge_support() -> str:
    """Twin of ``graph.edge_support`` — the triangle CTEs of
    ``sql_kg_triangles``, credited to each triangle's three canonical
    edges, zero-support edges kept via LEFT join."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
deg AS (SELECT node, count(*)::BIGINT AS d FROM
        (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        GROUP BY 1),
ori AS (SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                    THEN u.a ELSE u.b END AS u,
               CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                    THEN u.b ELSE u.a END AS v
        FROM und u
        JOIN deg da ON da.node = u.a
        JOIN deg db ON db.node = u.b),
tri AS (SELECT o1.u AS x, o1.v AS y, o2.v AS z
        FROM ori o1
        JOIN ori o2 ON o1.u = o2.u AND o1.v < o2.v
        JOIN und t ON t.a = o1.v AND t.b = o2.v),
es AS (SELECT least(x, y) AS a, greatest(x, y) AS b FROM tri
       UNION ALL SELECT least(x, z), greatest(x, z) FROM tri
       UNION ALL SELECT least(y, z), greatest(y, z) FROM tri),
sc AS (SELECT a, b, count(*)::BIGINT AS s FROM es GROUP BY 1, 2)
SELECT und.a, und.b, coalesce(sc.s, 0)::BIGINT AS support
FROM und LEFT JOIN sc USING (a, b)"""


def sql_kg_ktruss(k: int = 3, rounds: int = 3) -> str:
    """Twin of ``graph.truss_peel``: the same fixed number of
    recount-and-filter rounds unrolled one CTE triple per round — x<y<z
    three-way self-join triangle enumeration, per-edge support via the
    3-way corner union, inner join keeps only edges with support ≥ k−2
    (positive threshold, so the engine's left-join zero-fill is moot)."""
    parts = [
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM edges WHERE src <> dst)"
    ]
    for r in range(rounds):
        parts.append(
            f"t{r} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            f"FROM e{r} e1 JOIN e{r} e2 ON e2.a = e1.b "
            f"JOIN e{r} e3 ON e3.a = e1.a AND e3.b = e2.b)"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT a, b, count(*)::BIGINT AS support "
            f"FROM (SELECT x AS a, y AS b FROM t{r} "
            f"UNION ALL SELECT x, z FROM t{r} "
            f"UNION ALL SELECT y, z FROM t{r}) GROUP BY 1, 2)"
        )
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT s.a, s.b, s.support "
            f"FROM e{r} e JOIN s{r} s ON e.a = s.a AND e.b = s.b "
            f"WHERE s.support >= {k - 2})"
        )
    body = ",\n".join(parts)
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
{body}
SELECT a, b, support FROM e{rounds}"""


def sql_kg_hits(iters: int = 2, scale: int = 1_000_000) -> str:
    """Twin of ``graph.hits``: fixed synchronous half-iterations unrolled —
    gather-sum across the directed deduped edges, zero-fill via nodes LEFT
    JOIN, rescale by integer division with greatest(max // scale, 1)."""
    parts = [
        "e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges "
        "WHERE src <> dst)",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0))",
        f"h0 AS MATERIALIZED (SELECT node, {scale}::BIGINT AS s FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"ar{i} AS MATERIALIZED (SELECT n.node, coalesce(x.s, 0)::BIGINT AS s "
            f"FROM nodes n LEFT JOIN (SELECT e.dst AS node, sum(h.s)::BIGINT AS s "
            f"FROM e0 e JOIN h{i - 1} h ON e.src = h.node GROUP BY 1) x "
            f"ON n.node = x.node)"
        )
        parts.append(
            f"ad{i} AS (SELECT greatest(max(s) // {scale}, 1)::BIGINT AS d FROM ar{i})"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT node, (s // d)::BIGINT AS s "
            f"FROM ar{i} CROSS JOIN ad{i})"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED (SELECT n.node, coalesce(x.s, 0)::BIGINT AS s "
            f"FROM nodes n LEFT JOIN (SELECT e.src AS node, sum(a.s)::BIGINT AS s "
            f"FROM e0 e JOIN a{i} a ON e.dst = a.node GROUP BY 1) x "
            f"ON n.node = x.node)"
        )
        parts.append(
            f"hd{i} AS (SELECT greatest(max(s) // {scale}, 1)::BIGINT AS d FROM hr{i})"
        )
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT node, (s // d)::BIGINT AS s "
            f"FROM hr{i} CROSS JOIN hd{i})"
        )
    body = ",\n".join(parts)
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
{body}
SELECT a.node, a.s AS auth_q, h.s AS hub_q
FROM a{iters} a JOIN h{iters} h USING (node)"""


def sql_kg_closeness(min_seed_deg: int = 8, rounds: int = 3) -> str:
    """Twin of ``graph.harmonic_closeness``: per-(node, seed) BFS unrolled
    one CTE triple per round (frontier fan-out + two-key anti-join against
    visited pairs + per-seed contribution counts at exact integer weight
    10⁶ // r), AS MATERIALIZED for the same inlining-explosion reason as
    the hub-domains twin; zero rows keep unreachable seeds present."""
    parts = [
        "ue AS (SELECT src AS m, dst AS nb FROM edges WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM edges WHERE src <> dst)",
        "und AS MATERIALIZED (SELECT DISTINCT m, nb FROM ue)",
        "deg AS (SELECT m, count(*)::BIGINT AS d FROM und GROUP BY 1)",
        f"a0 AS MATERIALIZED (SELECT m AS node, m AS seed FROM deg "
        f"WHERE d >= {min_seed_deg})",
        "f0 AS MATERIALIZED (SELECT node, seed FROM a0)",
    ]
    unions = ["SELECT seed, 0::BIGINT AS n, 0::BIGINT AS h FROM a0"]
    for r in range(1, rounds + 1):
        w = 1_000_000 // r
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT DISTINCT und.nb AS node, f.seed "
            f"FROM f{r - 1} f JOIN und ON f.node = und.m)"
        )
        parts.append(
            f"n{r} AS MATERIALIZED (SELECT c.node, c.seed FROM c{r} c "
            f"WHERE NOT EXISTS (SELECT 1 FROM a{r - 1} a "
            f"WHERE a.node = c.node AND a.seed = c.seed))"
        )
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT * FROM a{r - 1} "
            f"UNION ALL SELECT * FROM n{r})"
        )
        parts.append(f"f{r} AS MATERIALIZED (SELECT node, seed FROM n{r})")
        parts.append(
            f"g{r} AS MATERIALIZED (SELECT seed, count(*)::BIGINT AS n, "
            f"(count(*) * {w})::BIGINT AS h FROM n{r} GROUP BY 1)"
        )
        unions.append(f"SELECT seed, n, h FROM g{r}")
    body = ",\n".join(parts)
    allc = " UNION ALL ".join(unions)
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
{body},
allc AS ({allc})
SELECT seed, sum(n)::BIGINT AS n_reached, sum(h)::BIGINT AS harmonic_e6
FROM allc GROUP BY 1"""


def sql_conv_echo_rate() -> str:
    """Twin of ``convo.conv_echo_rate``: whitespace-split term explode per
    (conv, role), distinct-(conv, term) role indicators via max, pure
    integer echo share n_echoed·10⁶ // n_user_terms."""
    return f"""{_kg_prefix()},
tok AS (
  SELECT conv_id, role, unnest(string_split(text, ' ')) AS term
  FROM transcripts
),
ct AS (
  SELECT conv_id, term,
         max(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS u,
         max(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT AS a
  FROM tok GROUP BY 1, 2
),
s AS (
  SELECT conv_id, sum(u)::BIGINT AS n_user_terms, sum(u * a)::BIGINT AS n_echoed
  FROM ct GROUP BY 1
)
SELECT conv_id, n_user_terms, n_echoed,
       CASE WHEN n_user_terms > 0
            THEN (n_echoed * 1000000 // n_user_terms)::BIGINT
            ELSE NULL END AS echo_ppm
FROM s"""


def sql_conv_mention_density() -> str:
    """Twin of ``q_conv_mention_density``: mention counts per conv LEFT
    JOINed onto per-conv char totals (zero-mention convs kept), pure
    integer density ·10⁶."""
    return f"""{_kg_prefix()},
mc AS (SELECT conv_id, count(*)::BIGINT AS nm FROM mentions GROUP BY 1),
cc AS (SELECT conv_id, sum(length(text))::BIGINT AS n_chars
       FROM transcripts GROUP BY 1)
SELECT cc.conv_id, coalesce(mc.nm, 0)::BIGINT AS n_mentions, cc.n_chars,
       (coalesce(mc.nm, 0) * 1000000 // greatest(cc.n_chars, 1))::BIGINT
         AS density_e6
FROM cc LEFT JOIN mc ON cc.conv_id = mc.conv_id"""


def sql_kg_node_pred_entropy(quantum: int = 1000) -> str:
    """Twin of ``relational.group_entropy`` over (src, pred) of the built
    KG edges: quantized logs first, exact integer sums, integer floor."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
c AS (SELECT src, pred, count(*)::BIGINT AS c FROM edges GROUP BY 1, 2),
a AS (
  SELECT src, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_items,
         sum(c * floor(ln(c::DOUBLE) * {quantum}.0)::BIGINT)::BIGINT AS s
  FROM c GROUP BY 1
)
SELECT src, n, n_items,
       ((n * floor(ln(n::DOUBLE) * {quantum}.0)::BIGINT - s) // n)::BIGINT
         AS entropy_milli
FROM a"""


def sql_tool_latency() -> str:
    """Twin of ``convo.tool_latency``: lead(ts) per conversation in turn
    order, tool-bearing turns only, per-tool integer latency rollup."""
    return f"""{_kg_prefix()}
, led AS (
  SELECT tool, lead(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               - epoch_us(ts) AS lat
  FROM transcripts
)
SELECT tool, count(*)::BIGINT AS n_calls,
       sum(lat)::BIGINT AS total_latency_us,
       max(lat)::BIGINT AS max_latency_us
FROM led WHERE tool <> '' AND lat IS NOT NULL
GROUP BY 1"""


def sql_kg_curated_edges(func_thr_ppm: int = 100_000, min_weight: int = 2) -> str:
    """Twin of ``q_kg_curated_edges``: the edges CTE, the functional-audit
    rollup, the (weight DESC, dst) row_number keep-one on near-functional
    predicates, support filter, union."""
    return f"""{_kg_prefix(recursive=True)},
edges AS ({_edges_select()}),
ps AS (
  SELECT pred, src, count(DISTINCT dst)::BIGINT AS n_obj
  FROM edges GROUP BY 1, 2
),
fp AS (
  SELECT pred FROM ps GROUP BY pred
  HAVING (sum(CASE WHEN n_obj > 1 THEN 1 ELSE 0 END) * 1000000)
         // greatest(count(*), 1) <= {func_thr_ppm}
),
sup AS (SELECT src, pred, dst, weight FROM edges WHERE weight >= {min_weight}),
nf AS (SELECT s.* FROM sup s WHERE s.pred NOT IN (SELECT pred FROM fp)),
fr AS (
  SELECT s.*, row_number() OVER (PARTITION BY s.pred, s.src
                                 ORDER BY s.weight DESC, s.dst) AS rk
  FROM sup s WHERE s.pred IN (SELECT pred FROM fp)
)
SELECT src, pred, dst, weight FROM nf
UNION ALL
SELECT src, pred, dst, weight FROM fr WHERE rk = 1"""


def sql_kg_confidence_calibration(max_bucket: int = 10) -> str:
    """Twin of ``q_kg_confidence_calibration``: weight buckets capped at
    ``max_bucket`` over the multi-source edge table, integer corroboration
    ppm."""
    return f"""
WITH ms AS ({sql_kg_multisource()}),
b AS (
  SELECT least(weight, {max_bucket})::BIGINT AS weight_bucket,
         CASE WHEN contains(evidence, 'doc:')
                   AND contains(evidence, 'transcript:') THEN 1
              ELSE 0 END::BIGINT AS is_corr
  FROM ms
)
SELECT weight_bucket, count(*)::BIGINT AS n_edges,
       sum(is_corr)::BIGINT AS n_corroborated,
       ((sum(is_corr) * 1000000) // count(*))::BIGINT AS corroborated_ppm
FROM b GROUP BY 1"""


def sql_kg_merge_preview(
    cap: int = 200, min_common: int = 2, min_jaccard_ppm: int = 500_000
) -> str:
    """Twin of ``q_kg_merge_preview``: the ``sql_kg_neighbor_jaccard``
    candidate CTEs, recursive min-label closure over the candidate graph,
    LEFT-join endpoint remap with pass-through, per-pred distinct-triple
    counts before/after."""
    return f"""{_kg_prefix(recursive=True)},
edges0 AS ({_edges_select()}),
edges AS (SELECT DISTINCT pred, src, dst FROM edges0),
ue AS (SELECT src AS m, dst AS nb FROM edges WHERE src <> dst
       UNION ALL SELECT dst, src FROM edges WHERE src <> dst),
und AS (SELECT DISTINCT m, nb FROM ue),
deg AS (SELECT m, count(*)::BIGINT AS d FROM und GROUP BY 1),
cp AS (SELECT m, nb FROM (
         SELECT m, nb, row_number() OVER (PARTITION BY m ORDER BY nb) AS rn
         FROM und) WHERE rn <= {cap}),
p AS (SELECT a.nb AS node_a, b.nb AS node_b
      FROM cp a JOIN cp b ON a.m = b.m AND a.nb < b.nb),
cnt AS (SELECT node_a, node_b, count(*)::BIGINT AS n_common
        FROM p GROUP BY 1, 2 HAVING count(*) >= {min_common}),
cand AS (
  SELECT node_a AS a, node_b AS b FROM cnt
  JOIN deg da ON node_a = da.m JOIN deg db ON node_b = db.m
  WHERE (n_common * 1000000) // greatest(da.d + db.d - n_common, 1)
          >= {min_jaccard_ppm}
),
msym AS (
  SELECT a, b FROM cand UNION SELECT b, a FROM cand
  UNION SELECT a, a FROM cand UNION SELECT b, b FROM cand
),
mreach(src, dst) AS (
  SELECT a, b FROM msym
  UNION
  SELECT r.src, s.b FROM mreach r JOIN msym s ON r.dst = s.a
),
mcomp AS (SELECT src AS member, min(dst) AS component_key
          FROM mreach GROUP BY src),
mapped AS (
  SELECT DISTINCT e.pred,
         coalesce(cs.component_key, e.src) AS s,
         coalesce(cd.component_key, e.dst) AS d
  FROM edges e
  LEFT JOIN mcomp cs ON cs.member = e.src
  LEFT JOIN mcomp cd ON cd.member = e.dst
),
bef AS (SELECT pred, count(*)::BIGINT AS n_before FROM edges GROUP BY 1),
aft AS (SELECT pred, count(*)::BIGINT AS n_after FROM mapped GROUP BY 1)
SELECT bef.pred, bef.n_before, aft.n_after,
       (bef.n_before - aft.n_after)::BIGINT AS n_merged
FROM bef JOIN aft USING (pred)"""


def sql_conv_topic_drift() -> str:
    """Twin of ``q_conv_topic_drift``: per-conv turn counts, first/second
    half split at 2·turn_idx ≥ n, distinct (conv, half, token), both-halves
    presence via count = 2, integer Jaccard ppm."""
    return f"""{_kg_prefix()}
, nt AS (SELECT conv_id, count(*)::BIGINT AS n FROM transcripts GROUP BY 1),
tok AS (
  SELECT t.conv_id,
         CASE WHEN 2 * t.turn_idx >= nt.n THEN 1 ELSE 0 END AS half,
         unnest(string_split(t.text, ' ')) AS tk
  FROM transcripts t JOIN nt USING (conv_id)
  WHERE nt.n >= 2
),
dist AS (SELECT DISTINCT conv_id, half, tk FROM tok),
pt AS (SELECT conv_id, tk, count(*)::BIGINT AS nh FROM dist GROUP BY 1, 2),
a AS (
  SELECT conv_id, count(*)::BIGINT AS n_union,
         sum(CASE WHEN nh = 2 THEN 1 ELSE 0 END)::BIGINT AS n_common
  FROM pt GROUP BY 1
)
SELECT conv_id, n_union, n_common,
       ((n_common * 1000000) // n_union)::BIGINT AS jaccard_ppm
FROM a"""


def sql_conv_verbosity_trend() -> str:
    """Twin of ``q_conv_verbosity_trend``: assistant turns only, OLS slope
    of text length on turn index (the ``sql_user_value_trend`` expression),
    NULL on zero x-variance."""
    return f"""{_kg_prefix()}
, e AS (
  SELECT conv_id, turn_idx::BIGINT AS x, length(text)::BIGINT AS y
  FROM transcripts WHERE role = 'assistant'
),
st AS (SELECT conv_id, count(*)::BIGINT AS n,
              sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
              sum(x*x)::BIGINT AS sxx, sum(x*y)::BIGINT AS sxy
       FROM e GROUP BY 1)
SELECT conv_id, n,
       CASE WHEN (n::DOUBLE * sxx - sx::DOUBLE * sx) > 0.0::DOUBLE
            THEN floor(((n::DOUBLE * sxy - sx::DOUBLE * sy) * 1000000.0::DOUBLE)
                       / (n::DOUBLE * sxx - sx::DOUBLE * sx))::BIGINT
            ELSE NULL END AS slope_q
FROM st"""
