import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from multiomics_biocypher_kg_ray.functions.schema_infer import (
    detect_id_columns,
    priority_classify,
    validate_value_ranges,
)


def test_detect_id_columns_flags_id_shaped_high_cardinality():
    t = pa.table(
        {
            "locus_tag": [f"PMM_{i:04d}" for i in range(100)],
            "description": ["some long free text about the gene"] * 100,
            "flag": ["yes", "no"] * 50,
        }
    )
    res = {d["column"]: d for d in detect_id_columns(t)}
    assert res["locus_tag"]["is_id_like"]
    assert not res["flag"]["is_id_like"]
    assert res["locus_tag"]["score"] > res["description"]["score"]


def test_validate_value_ranges_linear_and_log2():
    ds = ray.data.from_items(
        [{"g": "a", "v": -1.0}, {"g": "a", "v": 2.0}, {"g": "b", "v": 3.0}]
    )
    w = validate_value_ranges(ds, "g", "v", "linear")
    assert list(w["g"]) == ["a"] and w.iloc[0]["warning"] == "linear_has_nonpositive"
    # every value > 1.0 under a log2 declaration → suspicious
    ds2 = ray.data.from_items([{"g": "x", "v": 2.0}, {"g": "x", "v": 4.0}])
    w2 = validate_value_ranges(ds2, "g", "v", "log2")
    assert w2.iloc[0]["warning"] == "log2_all_above_1"
    # clean data → empty report
    assert validate_value_ranges(ds2, "g", "v", "linear").empty


def test_priority_classify_first_hit_wins_and_vocabulary_gate():
    col = pa.array(["r1", "t1", "c1", "zz", None])
    tiers = [
        {"r1": "photosynthesis"},          # tier 1 wins for r1
        {"r1": "WRONG", "t1": "transport"},  # tier 2 must not override r1
        {"c1": "metabolism"},
    ]
    out = priority_classify(
        col,
        tiers,
        default="unknown",
        vocabulary=frozenset({"photosynthesis", "transport", "metabolism"}),
    )
    assert out.to_pylist() == [
        "photosynthesis",
        "transport",
        "metabolism",
        "unknown",
        "unknown",
    ]
    with pytest.raises(ValueError, match="outside vocabulary"):
        priority_classify(col, tiers, vocabulary=frozenset({"transport"}))
