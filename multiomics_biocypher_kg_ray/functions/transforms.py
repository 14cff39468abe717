"""Named transform registry — config-referenced scalar string transforms.

Reference analog: the 14-entry ``_TRANSFORMS`` registry dispatched by YAML
name (``multiomics_kg/download/utils/annotation_transforms.py:27-278``,
registered at ``:262-278``). Extraction rules reference transforms by name
(``ExtractionRule.transforms``); unknown names fail at config time, not
per row.
"""

from __future__ import annotations

import re
from collections.abc import Callable

Transform = Callable[[str], str]

_ZPAD_RE = re.compile(r"^([A-Za-z]+[_-]?)(\d+)$")


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
}


def get_transform(name: str) -> Transform:
    try:
        return _TRANSFORMS[name]
    except KeyError:
        raise KeyError(
            f"unknown transform {name!r}; registered: {sorted(_TRANSFORMS)}"
        ) from None


def register_transform(name: str, fn: Transform) -> None:
    """User-extension surface (SURVEY §2.11): new named transform."""
    if name in _TRANSFORMS:
        raise ValueError(f"transform {name!r} already registered")
    _TRANSFORMS[name] = fn


def compile_chain(names: tuple[str, ...]) -> Transform:
    """Compose named transforms left-to-right; validates names eagerly."""
    fns = [get_transform(n) for n in names]

    def chain(s: str) -> str:
        for f in fns:
            s = f(s)
        return s

    return chain
