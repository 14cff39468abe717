"""Extraction-rule config and tiered alias dictionary — the single source of
truth shared by the Ray pipeline stages AND the DuckDB oracle SQL generator
(``oracle.py``), so correctness checks compare two implementations of one spec.

Reference analogs:
- extraction rules ← per-publication ``paperconfig.yaml`` ``statistical_analyses``
  column-mapping blocks (reference ``CLAUDE.md:138-272``) and the defline
  regex extractors (reference ``multiomics_kg/utils/gene_id_utils.py:360-456``).
- alias dictionary ← three-tier ``MappingData`` (``specific_lookup`` 1:1,
  ``multi_lookup`` 1:many, ``conflicts``) from ``gene_id_mapping.json`` v2
  (reference ``gene_id_utils.py:214-273``, ``download/gene_id_graph.py:324-343``).
- equivalence chains ← GeneIdGraph alias-equivalence rows that require
  iterative convergence (reference ``gene_id_graph.py:172-196``).

IMPORTANT: the default rule patterns must stay within the regex subset whose
semantics agree between Python ``re`` and DuckDB's RE2 (no lookbehind, no
backrefs); matches are non-overlapping left-to-right in both engines.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractionRule:
    """One rule+pattern triple-extraction rule (FIXTURES.md F2).

    ``pattern`` must contain exactly two capture groups: group 1 = subject
    surface form, group 2 = object surface form.
    """

    rule_id: str
    pattern: str
    predicate: str
    subj_type: str = "term"
    obj_type: str = "term"
    applies_role: tuple[str, ...] = ("user", "assistant")
    transforms: tuple[str, ...] = ()  # names from functions.transforms registry


# Default rules over the synthetic transcript vocabulary. Word-boundary-free
# token patterns: the corpus is single-space-separated lowercase words.
DEFAULT_RULES: tuple[ExtractionRule, ...] = (
    ExtractionRule("r_join", r"(\w+) join (\w+)", "joins"),
    ExtractionRule("r_merge", r"(\w+) merge (\w+)", "merges_with"),
    ExtractionRule("r_filter", r"(\w+) filter (\w+)", "filters", applies_role=("user",)),
    ExtractionRule("r_scan", r"(\w+) scan (\w+)", "scans"),
    # chained-transform rule (M7 coverage in the kg_mentions oracle): the
    # two-token subject context collapses to its first token via the
    # transform chain — engine (functions.transforms.compile_chain) and
    # oracle (transforms.sql_chain) compose the SAME named transforms
    ExtractionRule(
        "r_group",
        r"(\w+ \w+) group (\w+)",
        "groups",
        transforms=("normalize_ws", "first_token_space"),
    ),
)


@dataclass(frozen=True)
class AliasDictionary:
    """Three-tier alias index (gene_id_mapping.json v2 analog).

    - ``specific_lookup``: tier-1, alias → exactly one canonical id.
    - ``multi_lookup``: tier-2/3, alias → candidate list; singletons resolve
      with method ``tier2_singleton``, multi-candidate aliases are
      ``ambiguous`` (never guessed — reference gene_id_utils.py:478-622).
    - ``conflicts``: tier-1 conflicts; resolution reports ``tier1_conflict``
      and never picks a side (reference gene_id_graph.py:274-284).
    - ``equiv_edges``: extra alias-equivalence edges (beyond the implied
      alias↔canonical tier-1 edges) whose transitive closure defines the
      canonicalization components; includes chains needing ≥3 label-
      propagation rounds.
    """

    specific_lookup: dict[str, str]
    multi_lookup: dict[str, tuple[str, ...]]
    conflicts: dict[str, tuple[str, ...]]
    equiv_edges: tuple[tuple[str, str], ...] = field(default_factory=tuple)

    def all_equiv_edges(self) -> list[tuple[str, str]]:
        """Tier-1 alias↔canonical edges plus the configured extra chains."""
        edges = [(a, c) for a, c in sorted(self.specific_lookup.items())]
        edges += list(self.equiv_edges)
        return edges


def default_alias_dictionary() -> AliasDictionary:
    """Deterministic alias dictionary over the synthetic corpus vocabulary.

    Synonym pairs ('order'→sort, 'agg'→aggregate, …) make several aliases map
    to one canonical; 'fast' is ambiguous; 'big'/'slow' are tier-2 singletons;
    'value' is a tier-1 conflict; 'the'/'a'/'small' are deliberately unmapped
    (→ unresolved report rows).
    """
    specific = {
        "table": "term:table",
        "row": "term:row",
        "column": "term:column",
        "batch": "term:batch",
        "stream": "term:stream",
        "window": "term:window",
        "hash": "term:hash",
        "sort": "term:sort",
        "order": "term:sort",  # synonym — same component as 'sort'
        "scan": "term:scan",
        "group": "term:group",
        "query": "term:query",
        "data": "term:data",
        "line": "term:line",
        "part": "term:part",
        "customer": "term:customer",
        "vector": "term:vector",
        "spark": "term:engine",
        "agg": "term:aggregate",
        "dup": "term:duplicate",
        "key": "term:key",
        "merge": "term:merge",
        "join": "term:join",
        "filter": "term:filter",
    }
    multi = {
        "fast": ("term:hash", "term:scan"),  # ambiguous, never resolved
        "big": ("term:table",),  # tier-2 singleton
        "slow": ("term:scan",),  # tier-2 singleton
    }
    conflicts = {"value": ("term:value_a", "term:value_b")}
    # Chains forcing ≥3 convergence rounds in label propagation:
    # term:sort — term:order_by — term:ordering — term:arrange
    equiv = (
        ("term:sort", "term:order_by"),
        ("term:order_by", "term:ordering"),
        ("term:ordering", "term:arrange"),
        ("term:aggregate", "term:group"),  # merges two tier-1 components
    )
    return AliasDictionary(specific, multi, conflicts, equiv)


# Default EC transfer map for the ec_chain_resolve query (ST3 analog,
# annotation_transforms.py:160-259): chains (A→B→C collapses to C),
# a deleted entry, and a multi-successor transfer. Kept acyclic here — the
# cycle guard is exercised by property tests on arbitrary maps.
DEFAULT_EC_TRANSFER_RAW: dict[str, list[str]] = {
    "1.1.1.1": ["2.2.2.2"],  # chain hop 1
    "2.2.2.2": ["3.3.3.3"],  # chain hop 2 → both resolve to 3.3.3.3
    "4.4.4.4": [],  # deleted entry → ''
    "5.5.5.5": ["3.3.3.3", "6.6.6.6"],  # multi-successor
    "7.7.7.7": ["4.4.4.4"],  # transfers INTO a deleted entry → ''
}


# Resolution-method vocabulary (resolve_row analog, gene_id_utils.py:478-622).
METHOD_TIER1_EXACT = "tier1_exact"
METHOD_TIER1_CI = "tier1_ci"
METHOD_HEURISTIC = "heuristic"
METHOD_TIER2_SINGLETON = "tier2_singleton"
METHOD_AMBIGUOUS = "ambiguous"
METHOD_TIER1_CONFLICT = "tier1_conflict"
METHOD_UNRESOLVED = "unresolved"
