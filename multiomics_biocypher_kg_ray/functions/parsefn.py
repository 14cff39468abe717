"""Scalar parsing semantics ported exactly from the reference (the P/R-parity
knobs listed in SURVEY.md §7.4):

- null sentinels ``''`` / ``'-'`` / ``'NA'`` (omics_adapter.py:766-768, eggNOG
  ``-`` sentinel build_gene_annotations.py:342-365)
- asterisk-significance cells ``"1.1*"`` / ``"* 1.1"`` → (value, flag)
  (omics_adapter.py:770-783)
- fold-change scale: declared ``linear`` values ≤ 0 → None (dropped), else
  log2(x); declared ``log2`` passes through (omics_adapter.py:76-92)
- timepoint strings ``"4h"``, ``"day 18"``, ``"1h extended darkness (36h)"``
  → hours float (paperconfig_utils.py:185-213)
- boolean cells with a blank policy and HARD ERROR on unknown tokens
  (observations_adapter.py:78-126)
- list-cell expansion ``"A, B; C (D)"`` → candidate tokens, full value first
  (gene_id_utils.py:327-357)
"""

from __future__ import annotations

import math
import re

NULL_SENTINELS = frozenset({"", "-", "NA", "N/A", "na", "n/a", "NaN", "nan", "None"})


def is_null_cell(s: str | None) -> bool:
    return s is None or s.strip() in NULL_SENTINELS


_ASTERISK_RE = re.compile(r"^\s*(\*+)?\s*([-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)\s*(\*+)?\s*$")


def parse_asterisk_number(cell: str | None) -> tuple[float | None, bool]:
    """``"1.1*"`` / ``"* 1.1"`` → (1.1, True); plain number → (x, False);
    unparseable/null → (None, False)."""
    if is_null_cell(cell):
        return (None, False)
    m = _ASTERISK_RE.match(cell)  # type: ignore[arg-type]
    if not m:
        return (None, False)
    star = bool(m.group(1) or m.group(3))
    try:
        val = float(m.group(2))
    except ValueError:
        return (None, False)
    if not math.isfinite(val):
        return (None, False)
    return (val, star)


def fold_change_to_log2(value: float | None, scale: str) -> float | None:
    """Declared-scale fold change → log2. ``linear`` with value ≤ 0 is
    undefined → None (row drop), matching the reference exactly."""
    if value is None or not math.isfinite(value):
        return None
    if scale == "log2":
        return value
    if scale == "linear":
        if value <= 0:
            return None
        return math.log2(value)
    raise ValueError(f"unknown fold-change scale {scale!r}")


_TP_PATTERNS: list[tuple[re.Pattern, float]] = [
    (re.compile(r"^\s*(\d+(?:\.\d+)?)\s*h(?:ours?|r s?)?\b", re.I), 1.0),
    (re.compile(r"^\s*(\d+(?:\.\d+)?)\s*min(?:utes?)?\b", re.I), 1 / 60),
    (re.compile(r"^\s*day\s*(\d+(?:\.\d+)?)\b", re.I), 24.0),
    (re.compile(r"^\s*(\d+(?:\.\d+)?)\s*d(?:ays?)?\b", re.I), 24.0),
]
_TP_PAREN_RE = re.compile(r"\((\d+(?:\.\d+)?)\s*h\)", re.I)


def parse_timepoint_hours(s: str | None) -> float | None:
    """Timepoint label → hours. A parenthesized absolute ``(36h)`` wins over
    the leading relative time (the reference's 'extended darkness' case)."""
    if is_null_cell(s):
        return None
    text = s.strip()  # type: ignore[union-attr]
    m = _TP_PAREN_RE.search(text)
    if m:
        return float(m.group(1))
    for pat, factor in _TP_PATTERNS:
        m = pat.match(text)
        if m:
            return float(m.group(1)) * factor
    return None


TRUE_TOKENS = frozenset({"true", "yes", "y", "1", "t", "+"})
FALSE_TOKENS = frozenset({"false", "no", "n", "0", "f"})


class UnknownBooleanToken(ValueError):
    pass


def parse_bool_cell(
    cell: str | None, blank_policy: str = "skip"
) -> bool | None:
    """Boolean cell with blank policy ∈ {skip, true, false} and a HARD error
    on unknown tokens — fail-loud per the reference spec, never guess."""
    if is_null_cell(cell):
        if blank_policy == "skip":
            return None
        if blank_policy == "true":
            return True
        if blank_policy == "false":
            return False
        raise ValueError(f"unknown blank_policy {blank_policy!r}")
    tok = cell.strip().lower()  # type: ignore[union-attr]
    if tok in TRUE_TOKENS:
        return True
    if tok in FALSE_TOKENS:
        return False
    raise UnknownBooleanToken(f"unexpected boolean token {cell!r}")


_LIST_SPLIT_RE = re.compile(r"[,;]")
_PAREN_RE = re.compile(r"\(([^)]+)\)")


def expand_list_cell(cell: str | None) -> list[str]:
    """``"A, B; C (D)"`` → ["A, B; C (D)", "A", "B", "C (D)", "C", "D"] —
    the full value first, then split tokens, then parenthesized extractions,
    deduped preserving first-seen order."""
    if is_null_cell(cell):
        return []
    full = cell.strip()  # type: ignore[union-attr]
    out: list[str] = [full]
    for tok in _LIST_SPLIT_RE.split(full):
        tok = tok.strip()
        if tok and tok not in out:
            out.append(tok)
    extra: list[str] = []
    for tok in list(out):
        m = _PAREN_RE.search(tok)
        if m:
            outer = _PAREN_RE.sub("", tok).strip()
            inner = m.group(1).strip()
            for cand in (outer, inner):
                if cand and cand not in out and cand not in extra:
                    extra.append(cand)
    return out + extra


_ELEMENT_RE = re.compile(r"([A-Z][a-z]?)(\d*)")


def parse_formula_elements(formula: str | None) -> list[str]:
    """Hill-notation chemical formula → sorted unique element symbols
    (reference ``metabolism_adapter.py`` ``_parse_elements``; chemparse
    replaced by a two-char-symbol regex — no external dependency)."""
    if is_null_cell(formula):
        return []
    elements = set()
    pos = 0
    for m in _ELEMENT_RE.finditer(formula.strip()):  # type: ignore[union-attr]
        if m.start() != pos:
            return []  # unparseable junk between tokens → not a formula
        pos = m.end()
        elements.add(m.group(1))
    if pos != len(formula.strip()):  # trailing junk
        return []
    return sorted(elements)
