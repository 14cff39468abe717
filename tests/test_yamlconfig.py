"""Declarative YAML extraction-config surface (paperconfig.yaml analog):
round-trip equality with the code config + the validation-failure suite
(reference ``tests/test_paperconfig_validation.py`` strategy)."""

from __future__ import annotations

from pathlib import Path

import pytest

from multiomics_biocypher_kg_ray.config import (
    DEFAULT_RULES,
    default_alias_dictionary,
)
from multiomics_biocypher_kg_ray.yamlconfig import (
    ConfigValidationError,
    load_extraction_config,
    validate_extraction_config,
)

FIXTURE = str(
    Path(__file__).resolve().parent / "fixtures" / "extraction_config.yaml"
)


def test_yaml_round_trips_code_config():
    cfg = load_extraction_config(FIXTURE)
    assert cfg.report.ok
    assert cfg.rules == DEFAULT_RULES
    assert cfg.aliases == default_alias_dictionary()


def test_yaml_drives_identical_mentions(sf_small):
    import pandas as pd

    from multiomics_biocypher_kg_ray.pipelines.reader_queries import (
        q_kg_mentions_yaml,
    )
    from multiomics_biocypher_kg_ray.sources.transcripts import (
        transcripts_dataset,
    )
    from multiomics_biocypher_kg_ray.stages.extract import extract_mentions

    a = q_kg_mentions_yaml(sf_small).to_pandas()
    b = extract_mentions(transcripts_dataset(sf_small)).to_pandas()
    key = list(a.columns)
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def _one_rule(**kw) -> dict:
    base = {
        "rule_id": "r_x",
        "pattern": r"(\w+) uses (\w+)",
        "predicate": "joins",
    }
    base.update(kw)
    return {"rules": [base]}


def _errs(doc) -> list[str]:
    rep = validate_extraction_config(doc).report
    return [f"{i.field}: {i.message}" for i in rep.errors]


def test_unknown_transform_rejected():
    errs = _errs(_one_rule(transforms=["no_such_transform"]))
    assert any("unknown transform" in e for e in errs)


def test_list_valued_transform_rejected():
    from multiomics_biocypher_kg_ray.functions import transforms as T

    name = sorted(T._LIST_VALUED)[0]
    errs = _errs(_one_rule(transforms=[name]))
    assert any("list-valued transform" in e for e in errs)


def test_bad_regex_rejected():
    errs = _errs(_one_rule(pattern=r"(\w+ uses (\w+)"))
    assert any("does not compile" in e for e in errs)


def test_wrong_group_count_rejected():
    errs = _errs(_one_rule(pattern=r"(\w+) uses \w+"))
    assert any("exactly 2 capture groups" in e for e in errs)
    errs = _errs(_one_rule(pattern=r"(\w+) (uses) (\w+)"))
    assert any("exactly 2 capture groups" in e for e in errs)


def test_re2_unsafe_rejected():
    errs = _errs(_one_rule(pattern=r"(?<=x)(\w+) uses (\w+)"))
    assert any("RE2-safe" in e for e in errs)
    errs = _errs(_one_rule(pattern=r"(\w+) uses (\w+) \1"))
    assert any("backreferences" in e for e in errs)


def test_duplicate_rule_id_rejected():
    doc = {"rules": [_one_rule()["rules"][0], _one_rule()["rules"][0]]}
    errs = _errs(doc)
    assert any("duplicate rule_id" in e for e in errs)


def test_unknown_role_and_label_rejected():
    errs = _errs(_one_rule(applies_role=["user", "robot"]))
    assert any("unknown role" in e for e in errs)
    errs = _errs(_one_rule(subj_type="nonexistent_label"))
    assert any("unknown node label" in e for e in errs)


def test_unregistered_predicate_is_warning_not_error():
    cfg = validate_extraction_config(_one_rule(predicate="frobnicates"))
    assert cfg.report.ok  # warnings only
    assert any(
        i.severity == "warning" and "not a registered edge label" in i.message
        for i in cfg.report.issues
    )
    assert len(cfg.rules) == 1


def test_alias_tier_overlap_rejected():
    doc = {
        "rules": [_one_rule()["rules"][0]],
        "aliases": {
            "specific_lookup": {"x": "term:x"},
            "multi_lookup": {"x": ["term:y"]},
        },
    }
    errs = _errs(doc)
    assert any("multiple tiers" in e for e in errs)


def test_conflict_needs_two_ids():
    doc = {
        "rules": [_one_rule()["rules"][0]],
        "aliases": {"conflicts": {"v": ["term:only_one"]}},
    }
    errs = _errs(doc)
    assert any("needs ≥2" in e for e in errs)


def test_strict_load_raises_with_report(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text(
        "rules:\n"
        "  - rule_id: r_bad\n"
        "    pattern: '(\\w+ broken'\n"
        "    predicate: joins\n"
    )
    with pytest.raises(ConfigValidationError) as ei:
        load_extraction_config(str(p))
    assert "does not compile" in str(ei.value)
    cfg = load_extraction_config(str(p), strict=False)
    assert not cfg.report.ok and cfg.rules == ()


def test_empty_rules_rejected():
    errs = _errs({"rules": []})
    assert any("no valid extraction rules" in e for e in errs)
