"""Named transform registry — config-referenced scalar string transforms.

Reference analog: the 14-entry ``_TRANSFORMS`` registry dispatched by YAML
name (``multiomics_kg/download/utils/annotation_transforms.py:27-278``,
registered at ``:262-278``). Extraction rules reference transforms by name
(``ExtractionRule.transforms``); unknown names fail at config time, not per
row. This module reimplements the full capability set:

- token/prefix hygiene: ``first_token_space``, ``strip_prefix_ko``,
  ``strip_function_prefix``, footnote/version strippers, case folds;
- ontology-id extraction: ``add_go_prefix``, ``extract_go_from_pipe``,
  ``extract_go_from_brackets`` (reference ``:34-90``);
- free-text cleaners: ``clean_function_description`` /
  ``clean_catalytic_activity`` (inline ``{ECO:…}`` evidence-tag removal,
  reference ``:106-124``), ``extract_cofactor_name`` /
  ``extract_pathway_name`` (``:127-141``);
- feature-range extractors: ``extract_tm_range`` / ``extract_signal_range``
  (``:144-157``);
- list-valued: ``split_cog_category`` (``:93-103``) and the stateful
  ``normalize_ec`` transfer-chain resolver with cycle guard
  (``:160-259``) — exposed via :class:`EcTransferMap`.

Transforms used inside oracle-checked extraction rules must have a DuckDB
SQL twin in ``TRANSFORM_SQL`` (the oracle generator composes them in the
same order); list-valued transforms are excluded from rule chains (they fan
rows out — use ``parsefn.expand_list_cell``-style stages instead).
"""

from __future__ import annotations

import re
from collections.abc import Callable

Transform = Callable[[str], "str | list[str]"]

_ZPAD_RE = re.compile(r"^([A-Za-z]+[_-]?)(\d+)$")
_GO_DIGITS_RE = re.compile(r"^\d{7}$")
_ECO_TAG_RE = re.compile(r"\s*\{ECO:[^}]*\}[.,]?\s*")
_EC_TOKEN_RE = re.compile(r"^\d+\.[\d-]+\.[\d-]+\.[\d-]+$")


def _first_token_space(s: str) -> str:
    return s.split(" ", 1)[0] if s else s


def _casefold(s: str) -> str:
    return s.lower()


def _upper(s: str) -> str:
    return s.upper()


def _strip_footnotes(s: str) -> str:
    return s.rstrip("*+").strip()


def _zero_pad5(s: str) -> str:
    m = _ZPAD_RE.match(s)
    if not m:
        return s
    prefix, digits = m.groups()
    return f"{prefix}{digits.zfill(5)}"


def _strip_version_suffix(s: str) -> str:
    return re.sub(r"\.\d+$", "", s)


def _normalize_ws(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def _extract_parenthesized(s: str) -> str:
    m = re.search(r"\(([^)]+)\)", s)
    return m.group(1).strip() if m else s


def _drop_parenthesized(s: str) -> str:
    return re.sub(r"\([^)]*\)", "", s).strip()


# ---------------------------------------------- ontology-id extraction family


def _add_go_prefix(s: str) -> str:
    """Bare 7-digit ids get the 'GO:' CURIE prefix; null sentinel '-' → ''."""
    s = (s or "").strip()
    if not s or s == "-":
        return ""
    if s.startswith("GO:"):
        return s
    if _GO_DIGITS_RE.match(s):
        return f"GO:{s}"
    return s


def _extract_go_from_pipe(s: str) -> str:
    """'term name|0006260||IEA' → 'GO:0006260'; falls back to add_go_prefix."""
    s = (s or "").strip()
    if not s or s == "-":
        return ""
    if "|" in s:
        cand = s.split("|")[1].strip()
        if _GO_DIGITS_RE.match(cand):
            return f"GO:{cand}"
    return _add_go_prefix(s)


def _extract_go_from_brackets(s: str) -> str:
    """'complex name [GO:0009360]' → 'GO:0009360'; '' when no GO id found."""
    s = (s or "").strip()
    if not s or s == "-":
        return ""
    parts = s.split("GO:")
    if len(parts) < 2:
        return ""
    return "GO:" + parts[-1].rstrip("]").strip()


def _strip_prefix_ko(s: str) -> str:
    return re.sub(r"^ko:", "", (s or "").strip(), flags=re.IGNORECASE)


def _strip_function_prefix(s: str) -> str:
    return re.sub(r"^FUNCTION:\s*", "", (s or "").strip(), flags=re.IGNORECASE)


# ------------------------------------------------------ free-text cleaners


def _clean_function_description(s: str) -> str:
    out = _strip_function_prefix(s)
    return _ECO_TAG_RE.sub(" ", out).strip().rstrip(".")


def _clean_catalytic_activity(s: str) -> str:
    out = re.sub(r"^CATALYTIC ACTIVITY:\s*", "", (s or "").strip(), flags=re.IGNORECASE)
    return _ECO_TAG_RE.sub(" ", out).strip().rstrip(";").strip()


def _extract_cofactor_name(s: str) -> str:
    m = re.match(r"COFACTOR:\s*Name=([^;]+)", (s or "").strip(), re.IGNORECASE)
    return m.group(1).strip() if m else ""


def _extract_pathway_name(s: str) -> str:
    out = re.sub(r"^PATHWAY:\s*", "", (s or "").strip(), flags=re.IGNORECASE)
    return _ECO_TAG_RE.sub(" ", out).strip().rstrip(".")


def _extract_tm_range(s: str) -> str:
    m = re.search(r"TRANSMEM\s+(\d+\.\.\d+)", s or "")
    return m.group(1) if m else ""


def _extract_signal_range(s: str) -> str:
    m = re.search(r"SIGNAL\s+(\d+\.\.\d+)", s or "")
    return m.group(1) if m else ""


# --------------------------------------------------------- list-valued


def _split_cog_category(s: str) -> list[str]:
    """Multi-letter category string → single-char code list ('LU'→['L','U'];
    '-' and '' → [])."""
    s = (s or "").strip()
    if not s or s == "-":
        return []
    return list(s)


# ------------------------------------------- EC transfer-chain resolution


class EcTransferMap:
    """Obsolete-EC rewriting with transfer-chain following + cycle guard
    (ST3; reference ``annotation_transforms.py:160-259``).

    ``raw`` maps obsolete EC → list of immediate successors (empty list =
    deleted entry). Construction resolves every chain to its FINAL current
    successors, so lookups are O(1): A→B→C collapses to A→[C]; cycles
    terminate by returning the first revisited node (the reference's
    ``visited`` guard); deleted entries resolve to []. ``normalize(ec)``
    mirrors ``_tx_normalize_ec``: current ids pass through, single-successor
    transfers return a string, multi-successor a list, deleted ''.
    """

    def __init__(self, raw: dict[str, list[str]]) -> None:
        self._resolved: dict[str, list[str]] = {}
        for ec in raw:
            self._resolved[ec] = self._resolve(ec, raw, frozenset())

    def _resolve(
        self, ec: str, raw: dict[str, list[str]], visited: frozenset[str]
    ) -> list[str]:
        if ec in visited:
            return [ec]  # cycle guard: stop, keep the revisited id
        if ec not in raw:
            return [ec]  # current EC — not obsolete
        succ = raw[ec]
        if not succ:
            return []  # deleted entry
        out: list[str] = []
        nv = visited | {ec}
        for s in succ:
            for r in self._resolve(s, raw, nv):
                if r not in out:  # stable de-dup, first-seen order
                    out.append(r)
        return out

    def normalize(self, value: str) -> str | list[str]:
        s = (value or "").strip()
        if not s or s == "-":
            return ""
        if s not in self._resolved:
            return s
        succ = self._resolved[s]
        if not succ:
            return ""
        if len(succ) == 1:
            return succ[0]
        return list(succ)

    @staticmethod
    def from_records(descriptions: dict[str, str]) -> "EcTransferMap":
        """Build the raw map from per-EC description strings, mirroring the
        reference's Expasy parser: 'Transferred entry: X[, Y and Z]' →
        successor list; 'Deleted…' → []."""
        raw: dict[str, list[str]] = {}
        for ec, desc in descriptions.items():
            d = (desc or "").strip()
            if d.startswith("Transferred entry:"):
                rest = d[len("Transferred entry:") :].strip().rstrip(".")
                parts = re.split(r",\s*|\s+and\s+", rest)
                raw[ec] = [p.strip() for p in parts if _EC_TOKEN_RE.match(p.strip())]
            elif d.startswith("Deleted"):
                raw[ec] = []
        return EcTransferMap(raw)


def make_normalize_ec(transfer: EcTransferMap) -> Transform:
    """Bind an EC transfer map into a registerable transform (the reference
    holds it as lazy module state; here the caller owns the map and the
    bound transform is explicit per-pipeline state, broadcast-friendly)."""
    return transfer.normalize


# ------------------------------------------------------------- registry

_TRANSFORMS: dict[str, Transform] = {
    "first_token_space": _first_token_space,
    "casefold": _casefold,
    "upper": _upper,
    "strip_footnotes": _strip_footnotes,
    "zero_pad5": _zero_pad5,
    "strip_version_suffix": _strip_version_suffix,
    "normalize_ws": _normalize_ws,
    "extract_parenthesized": _extract_parenthesized,
    "drop_parenthesized": _drop_parenthesized,
    "add_go_prefix": _add_go_prefix,
    "extract_go_from_pipe": _extract_go_from_pipe,
    "extract_go_from_brackets": _extract_go_from_brackets,
    "strip_prefix_ko": _strip_prefix_ko,
    "strip_function_prefix": _strip_function_prefix,
    "clean_function_description": _clean_function_description,
    "clean_catalytic_activity": _clean_catalytic_activity,
    "extract_cofactor_name": _extract_cofactor_name,
    "extract_pathway_name": _extract_pathway_name,
    "extract_tm_range": _extract_tm_range,
    "extract_signal_range": _extract_signal_range,
    "split_cog_category": _split_cog_category,
}

# list-valued transforms: excluded from scalar rule chains (they fan out)
_LIST_VALUED: frozenset[str] = frozenset({"split_cog_category"})


def _arrow_transforms():
    """Vectorized Arrow twins for the transforms that have exact pyarrow
    kernels — used by the extractor's single-match fast path so a chained
    rule never pays a per-value Python loop (VERDICT r2 #6: r_group cost 3×
    the other rules through ``[chain(v) for v in ...to_pylist()]``).
    Equivalence with the scalar fns is asserted in tests/test_extract.py."""
    import pyarrow.compute as pc

    return {
        "first_token_space": lambda a: pc.list_element(
            pc.split_pattern(a, " ", max_splits=1), 0
        ),
        "casefold": pc.utf8_lower,
        "upper": pc.utf8_upper,
        "strip_footnotes": lambda a: pc.utf8_trim_whitespace(
            pc.utf8_rtrim(a, characters="*+")
        ),
        "strip_version_suffix": lambda a: pc.replace_substring_regex(
            a, r"\.\d+$", ""
        ),
        "normalize_ws": lambda a: pc.utf8_trim_whitespace(
            pc.replace_substring_regex(a, r"\s+", " ")
        ),
        "drop_parenthesized": lambda a: pc.utf8_trim_whitespace(
            pc.replace_substring_regex(a, r"\([^)]*\)", "")
        ),
    }


_ARROW_TRANSFORMS = None


def compile_chain_arrow(names: tuple[str, ...]):
    """Arrow-vectorized chain (``pa.Array → pa.Array``), or None when any
    named transform lacks an exact Arrow kernel — callers then fall back to
    the scalar ``compile_chain``."""
    global _ARROW_TRANSFORMS
    if _ARROW_TRANSFORMS is None:
        _ARROW_TRANSFORMS = _arrow_transforms()
    fns = [_ARROW_TRANSFORMS.get(n) for n in names]
    if any(f is None for f in fns):
        return None

    def chain(arr):
        for f in fns:
            arr = f(arr)
        return arr

    return chain

# DuckDB twins for transforms legal inside oracle-checked extraction rules;
# {x} is the wrapped SQL expression. Semantics must match the Python fns on
# the single-space-normalized corpus (asserted in tests/test_extract.py).
TRANSFORM_SQL: dict[str, str] = {
    "first_token_space": "string_split({x}, ' ')[1]",
    "casefold": "lower({x})",
    "upper": "upper({x})",
    "strip_footnotes": "trim(rtrim({x}, '*+'))",
    "strip_version_suffix": r"regexp_replace({x}, '\.\d+$', '')",
    "normalize_ws": r"trim(regexp_replace({x}, '\s+', ' ', 'g'))",
    "strip_prefix_ko": "regexp_replace(trim({x}), '^ko:', '', 'i')",
    "strip_function_prefix": r"regexp_replace(trim({x}), '^FUNCTION:\s*', '', 'i')",
}


def get_transform(name: str) -> Transform:
    try:
        return _TRANSFORMS[name]
    except KeyError:
        raise KeyError(
            f"unknown transform {name!r}; registered: {sorted(_TRANSFORMS)}"
        ) from None


def register_transform(name: str, fn: Transform, *, sql: str | None = None) -> None:
    """User-extension surface (SURVEY §2.11): new named transform, optionally
    with its DuckDB twin for oracle-checked rules."""
    if name in _TRANSFORMS:
        raise ValueError(f"transform {name!r} already registered")
    _TRANSFORMS[name] = fn
    if sql is not None:
        TRANSFORM_SQL[name] = sql


def compile_chain(names: tuple[str, ...]) -> Callable[[str], str]:
    """Compose named SCALAR transforms left-to-right; validates names (and
    scalar-ness) eagerly — list-valued transforms fan rows out and belong in
    explode stages, not rule chains."""
    bad = [n for n in names if n in _LIST_VALUED]
    if bad:
        raise ValueError(f"list-valued transforms not allowed in rule chains: {bad}")
    fns = [get_transform(n) for n in names]

    def chain(s: str) -> str:
        for f in fns:
            s = f(s)
        return s

    return chain


def sql_chain(names: tuple[str, ...], expr: str) -> str:
    """Compose the DuckDB twins of a rule chain around ``expr`` — used by the
    oracle generator so engine and SQL apply the identical composition."""
    for n in names:
        tmpl = TRANSFORM_SQL.get(n)
        if tmpl is None:
            raise KeyError(
                f"transform {n!r} has no SQL twin; oracle-checked rules may "
                f"only chain: {sorted(TRANSFORM_SQL)}"
            )
        expr = tmpl.format(x=expr)
    return expr
