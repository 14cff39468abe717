import json
import math

import pytest
import ray.data

from multiomics_biocypher_kg_ray.functions import parsefn, transforms
from multiomics_biocypher_kg_ray.sources.readers import (
    read_csv_with_options,
    read_keyed_json,
)


def test_null_sentinels():
    for s in ("", "-", "NA", "  NA ", None, "nan"):
        assert parsefn.is_null_cell(s)
    assert not parsefn.is_null_cell("0")


def test_asterisk_significance():
    assert parsefn.parse_asterisk_number("1.1*") == (1.1, True)
    assert parsefn.parse_asterisk_number("* 1.1") == (1.1, True)
    assert parsefn.parse_asterisk_number(" 2.5 ") == (2.5, False)
    assert parsefn.parse_asterisk_number("-1e-3") == (-0.001, False)
    assert parsefn.parse_asterisk_number("abc") == (None, False)
    assert parsefn.parse_asterisk_number("NA") == (None, False)


def test_fold_change_scales():
    assert parsefn.fold_change_to_log2(8.0, "linear") == 3.0
    assert parsefn.fold_change_to_log2(-2.0, "linear") is None  # ≤0 dropped
    assert parsefn.fold_change_to_log2(0.0, "linear") is None
    assert parsefn.fold_change_to_log2(-2.0, "log2") == -2.0
    with pytest.raises(ValueError):
        parsefn.fold_change_to_log2(1.0, "bogus")


def test_timepoint_parsing():
    assert parsefn.parse_timepoint_hours("4h") == 4.0
    assert parsefn.parse_timepoint_hours("30 min") == 0.5
    assert parsefn.parse_timepoint_hours("day 18") == 18 * 24.0
    assert parsefn.parse_timepoint_hours("1h extended darkness (36h)") == 36.0
    assert parsefn.parse_timepoint_hours("whenever") is None
    assert parsefn.parse_timepoint_hours("NA") is None


def test_bool_hard_error():
    assert parsefn.parse_bool_cell("yes") is True
    assert parsefn.parse_bool_cell("F") is False
    assert parsefn.parse_bool_cell("", blank_policy="skip") is None
    assert parsefn.parse_bool_cell("", blank_policy="true") is True
    with pytest.raises(parsefn.UnknownBooleanToken):
        parsefn.parse_bool_cell("maybe")


def test_list_cell_expansion_full_value_first():
    out = parsefn.expand_list_cell("A, B; C (D)")
    assert out[0] == "A, B; C (D)"
    assert "A" in out and "B" in out and "C (D)" in out
    assert "C" in out and "D" in out
    assert parsefn.expand_list_cell("NA") == []


def test_transform_registry():
    assert transforms.get_transform("first_token_space")("WP_1 rest") == "WP_1"
    assert transforms.get_transform("zero_pad5")("ent_1") == "ent_00001"
    assert transforms.get_transform("strip_version_suffix")("WP_000123.1") == "WP_000123"
    chain = transforms.compile_chain(("strip_footnotes", "casefold"))
    assert chain("ABC*") == "abc"
    with pytest.raises(KeyError):
        transforms.get_transform("nope")


def test_csv_reader_options(tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("## comment line\n## another\n#id\tvalue\nx\t1\ny\t-\n")
    ds = read_csv_with_options(
        str(p), delimiter="\t", comment_header=True, null_sentinels=True
    )
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "value"]
    assert df.loc[1, "id"] == "y"
    import pandas as pd

    assert pd.isna(df.loc[1, "value"])


def test_keyed_json(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(json.dumps({"g1": {"name": "x"}, "g2": {"name": "y"}}))
    tbl = read_keyed_json(str(p), key_column="locus_tag")
    assert sorted(tbl.column("locus_tag").to_pylist()) == ["g1", "g2"]


def test_parse_formula_elements():
    from multiomics_biocypher_kg_ray.functions.parsefn import parse_formula_elements

    assert parse_formula_elements("C6H12O6") == ["C", "H", "O"]
    assert parse_formula_elements("NaCl2") == ["Cl", "Na"]
    assert parse_formula_elements("") == []
    assert parse_formula_elements("not a formula") == []
