"""Declarative YAML extraction-config surface — the ``paperconfig.yaml``
analog (reference ``CLAUDE.md:133-183``, per-publication configs like
``data/Prochlorococcus/papers_and_supp/Biller 2018/paperconfig.yaml:1-150``,
validated by ``tests/test_paperconfig_validation.py``).

A user adds a new source by DROPPING A YAML FILE, not by editing Python:

.. code-block:: yaml

    rules:
      - rule_id: r_join
        pattern: "(\\w+) join (\\w+)"
        predicate: joins
        applies_role: [user, assistant]
        transforms: [normalize_ws]
    aliases:
      specific_lookup: {table: "term:table"}
      multi_lookup: {fast: ["term:hash", "term:scan"]}
      conflicts: {value: ["term:value_a", "term:value_b"]}
      equiv_edges: [["term:sort", "term:order_by"]]

Validation is a first-class report (the reference's paperconfig validation
suite made config errors loud, not silent): unknown transform names, bad or
group-count-wrong regexes, RE2-unsafe constructs (lookaround/backrefs would
diverge engine vs oracle), unknown roles, unknown node labels, duplicate
rule ids, malformed alias tiers. ``strict=True`` (default) raises
``ConfigValidationError`` carrying the report; ``strict=False`` returns the
report for the caller to render (the S9-style diagnostics side channel).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .config import AliasDictionary, ExtractionRule

VALID_ROLES = ("user", "assistant", "system", "tool")

# constructs whose semantics differ (or fail) between Python re and DuckDB
# RE2 — the oracle twin composes the same pattern, so these are config errors
_RE2_UNSAFE = (
    ("(?=", "lookahead"),
    ("(?!", "negative lookahead"),
    ("(?<=", "lookbehind"),
    ("(?<!", "negative lookbehind"),
)
_BACKREF_RE = re.compile(r"\\[1-9]")


@dataclass(frozen=True)
class ConfigIssue:
    severity: str  # 'error' | 'warning'
    where: str  # e.g. "rules[2] (r_scan)" / "aliases.multi_lookup"
    field: str
    message: str

    def as_row(self) -> dict:
        return {
            "severity": self.severity,
            "where": self.where,
            "field": self.field,
            "message": self.message,
        }


@dataclass
class ValidationReport:
    issues: list[ConfigIssue] = field(default_factory=list)

    def error(self, where: str, fld: str, msg: str) -> None:
        self.issues.append(ConfigIssue("error", where, fld, msg))

    def warning(self, where: str, fld: str, msg: str) -> None:
        self.issues.append(ConfigIssue("warning", where, fld, msg))

    @property
    def errors(self) -> list[ConfigIssue]:
        return [i for i in self.issues if i.severity == "error"]

    @property
    def ok(self) -> bool:
        return not self.errors

    def rows(self) -> list[dict]:
        return [i.as_row() for i in self.issues]

    def render(self) -> str:
        return "\n".join(
            f"{i.severity.upper():7s} {i.where} [{i.field}]: {i.message}"
            for i in self.issues
        )


class ConfigValidationError(ValueError):
    def __init__(self, report: ValidationReport) -> None:
        self.report = report
        super().__init__(
            f"{len(report.errors)} config error(s):\n{report.render()}"
        )


@dataclass(frozen=True)
class ExtractionConfig:
    rules: tuple[ExtractionRule, ...]
    aliases: AliasDictionary | None
    report: ValidationReport


def _known_transforms() -> set[str]:
    from .functions import transforms as T

    return set(T._TRANSFORMS)


def _list_valued_transforms() -> set[str]:
    from .functions import transforms as T

    return set(T._LIST_VALUED)


def _validate_rule(
    i: int, raw: object, report: ValidationReport, seen_ids: set[str]
) -> ExtractionRule | None:
    where = f"rules[{i}]"
    if not isinstance(raw, dict):
        report.error(where, "", f"rule must be a mapping, got {type(raw).__name__}")
        return None
    rid = raw.get("rule_id")
    if not isinstance(rid, str) or not rid:
        report.error(where, "rule_id", "missing or non-string rule_id")
        return None
    where = f"rules[{i}] ({rid})"
    if rid in seen_ids:
        report.error(where, "rule_id", f"duplicate rule_id {rid!r}")
        return None
    seen_ids.add(rid)

    ok = True
    pattern = raw.get("pattern")
    if not isinstance(pattern, str) or not pattern:
        report.error(where, "pattern", "missing or non-string pattern")
        ok = False
    else:
        for needle, what in _RE2_UNSAFE:
            if needle in pattern:
                report.error(
                    where, "pattern",
                    f"{what} is not RE2-safe (engine/oracle would diverge)",
                )
                ok = False
        if _BACKREF_RE.search(pattern):
            report.error(where, "pattern", "backreferences are not RE2-safe")
            ok = False
        try:
            groups = re.compile(pattern).groups
        except re.error as exc:
            report.error(where, "pattern", f"regex does not compile: {exc}")
            ok = False
        else:
            if groups != 2:
                report.error(
                    where, "pattern",
                    f"pattern must have exactly 2 capture groups "
                    f"(subject, object), found {groups}",
                )
                ok = False

    predicate = raw.get("predicate")
    if not isinstance(predicate, str) or not predicate:
        report.error(where, "predicate", "missing or non-string predicate")
        ok = False

    from .schema import default_registry

    reg = default_registry()
    subj_type = raw.get("subj_type", "term")
    obj_type = raw.get("obj_type", "term")
    for fld, val in (("subj_type", subj_type), ("obj_type", obj_type)):
        if val not in reg.nodes:
            report.error(
                where, fld,
                f"unknown node label {val!r} (known: {sorted(reg.nodes)})",
            )
            ok = False
    if isinstance(predicate, str) and predicate and predicate not in reg.edges:
        # tolerated like BioCypher's skip_bad_relationships, but reported
        report.warning(
            where, "predicate",
            f"predicate {predicate!r} is not a registered edge label; "
            "edges will materialize under the generic hierarchy",
        )

    roles = raw.get("applies_role", ["user", "assistant"])
    if isinstance(roles, str):
        roles = [roles]
    if not isinstance(roles, (list, tuple)) or not roles:
        report.error(where, "applies_role", "applies_role must be a non-empty list")
        ok = False
        roles = []
    for r in roles:
        if r not in VALID_ROLES:
            report.error(
                where, "applies_role",
                f"unknown role {r!r} (valid: {VALID_ROLES})",
            )
            ok = False

    transforms = raw.get("transforms", [])
    if isinstance(transforms, str):
        transforms = [transforms]
    if not isinstance(transforms, (list, tuple)):
        report.error(where, "transforms", "transforms must be a list of names")
        ok = False
        transforms = []
    known = _known_transforms()
    listy = _list_valued_transforms()
    for t in transforms:
        if t not in known:
            report.error(
                where, "transforms",
                f"unknown transform {t!r} (known: {sorted(known)})",
            )
            ok = False
        elif t in listy:
            report.error(
                where, "transforms",
                f"list-valued transform {t!r} fans rows out and cannot be "
                "chained in a rule (use an explode stage)",
            )
            ok = False

    unknown_keys = set(raw) - {
        "rule_id", "pattern", "predicate", "subj_type", "obj_type",
        "applies_role", "transforms",
    }
    for k in sorted(unknown_keys):
        report.warning(where, k, f"unknown key {k!r} ignored")

    if not ok:
        return None
    return ExtractionRule(
        rule_id=rid,
        pattern=pattern,
        predicate=predicate,
        subj_type=subj_type,
        obj_type=obj_type,
        applies_role=tuple(roles),
        transforms=tuple(transforms),
    )


def _validate_aliases(
    raw: object, report: ValidationReport
) -> AliasDictionary | None:
    where = "aliases"
    if raw is None:
        return None
    if not isinstance(raw, dict):
        report.error(where, "", "aliases must be a mapping")
        return None

    specific = raw.get("specific_lookup", {})
    if not isinstance(specific, dict) or not all(
        isinstance(k, str) and isinstance(v, str) for k, v in specific.items()
    ):
        report.error(where, "specific_lookup", "must map alias (str) → id (str)")
        specific = {}

    multi_raw = raw.get("multi_lookup", {})
    multi: dict[str, tuple[str, ...]] = {}
    if not isinstance(multi_raw, dict):
        report.error(where, "multi_lookup", "must map alias → [candidate ids]")
    else:
        for k, v in multi_raw.items():
            if not isinstance(v, (list, tuple)) or not all(
                isinstance(x, str) for x in v
            ):
                report.error(
                    where, "multi_lookup",
                    f"candidates for {k!r} must be a list of ids",
                )
                continue
            if not v:
                report.warning(
                    where, "multi_lookup", f"alias {k!r} has no candidates"
                )
            multi[k] = tuple(v)

    conflicts_raw = raw.get("conflicts", {})
    conflicts: dict[str, tuple[str, ...]] = {}
    if not isinstance(conflicts_raw, dict):
        report.error(where, "conflicts", "must map alias → [conflicting ids]")
    else:
        for k, v in conflicts_raw.items():
            if not isinstance(v, (list, tuple)) or len(v) < 2:
                report.error(
                    where, "conflicts",
                    f"conflict {k!r} needs ≥2 conflicting ids",
                )
                continue
            conflicts[k] = tuple(v)

    overlap = set(specific) & (set(multi) | set(conflicts))
    for k in sorted(overlap):
        report.error(
            where, "specific_lookup",
            f"alias {k!r} appears in multiple tiers (tier-1 must be unique)",
        )

    equiv_raw = raw.get("equiv_edges", [])
    equiv: list[tuple[str, str]] = []
    if not isinstance(equiv_raw, (list, tuple)):
        report.error(where, "equiv_edges", "must be a list of [a, b] pairs")
    else:
        for e in equiv_raw:
            if (
                not isinstance(e, (list, tuple))
                or len(e) != 2
                or not all(isinstance(x, str) for x in e)
            ):
                report.error(where, "equiv_edges", f"bad edge {e!r}")
                continue
            equiv.append((e[0], e[1]))

    return AliasDictionary(dict(specific), multi, conflicts, tuple(equiv))


def validate_extraction_config(doc: object) -> ExtractionConfig:
    """Validate a parsed YAML document; never raises — read ``report``."""
    report = ValidationReport()
    if not isinstance(doc, dict):
        report.error("", "", "top level must be a mapping with 'rules'")
        return ExtractionConfig((), None, report)
    for k in sorted(set(doc) - {"rules", "aliases"}):
        report.warning("", k, f"unknown top-level key {k!r} ignored")
    raw_rules = doc.get("rules", [])
    if not isinstance(raw_rules, list):
        report.error("rules", "", "'rules' must be a list")
        raw_rules = []
    rules: list[ExtractionRule] = []
    seen: set[str] = set()
    for i, raw in enumerate(raw_rules):
        rule = _validate_rule(i, raw, report, seen)
        if rule is not None:
            rules.append(rule)
    if not rules:
        report.error("rules", "", "no valid extraction rules")
    aliases = _validate_aliases(doc.get("aliases"), report)
    return ExtractionConfig(tuple(rules), aliases, report)


def load_extraction_config(path: str, *, strict: bool = True) -> ExtractionConfig:
    """Load + validate a YAML extraction config file. ``strict`` raises
    ``ConfigValidationError`` on any error-severity issue; warnings never
    raise (they surface via ``config.report``)."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    cfg = validate_extraction_config(doc)
    if strict and not cfg.report.ok:
        raise ConfigValidationError(cfg.report)
    return cfg
