import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.config import ExtractionRule
from multiomics_biocypher_kg_ray.stages.extract import TripleExtractor, extract_mentions


def _batch(rows):
    return pa.Table.from_pylist(
        [
            {
                "conv_id": r[0],
                "turn_idx": r[1],
                "role": r[2],
                "text": r[3],
                "tool": "",
                "ts": None,
            }
            for r in rows
        ],
        schema=pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("text", pa.string()),
                ("tool", pa.string()),
                ("ts", pa.timestamp("us")),
            ]
        ),
    )


RULES = (ExtractionRule("r1", r"(\w+) join (\w+)", "joins"),)


def test_basic_extraction():
    ex = TripleExtractor(RULES)
    out = ex(_batch([("c1", 0, "user", "a join b")]))
    assert out.to_pylist() == [
        {
            "conv_id": "c1",
            "turn_idx": 0,
            "rule_id": "r1",
            "pred": "joins",
            "subj_text": "a",
            "obj_text": "b",
        }
    ]


def test_non_overlapping_left_to_right():
    # 'a join b join c' → only (a, b): the scan resumes after the first match,
    # matching RE2 regexp_extract_all semantics in the oracle.
    ex = TripleExtractor(RULES)
    out = ex(_batch([("c1", 0, "user", "a join b join c")]))
    assert [(r["subj_text"], r["obj_text"]) for r in out.to_pylist()] == [("a", "b")]
    out2 = ex(_batch([("c1", 0, "user", "a join b c join d")]))
    assert [(r["subj_text"], r["obj_text"]) for r in out2.to_pylist()] == [
        ("a", "b"),
        ("c", "d"),
    ]


def test_role_filter_and_empty_text():
    rules = (ExtractionRule("r1", r"(\w+) join (\w+)", "joins", applies_role=("user",)),)
    ex = TripleExtractor(rules)
    out = ex(
        _batch(
            [
                ("c1", 0, "assistant", "a join b"),
                ("c1", 1, "user", ""),
                ("c1", 2, "user", "x join y"),
            ]
        )
    )
    assert out.num_rows == 1
    assert out.to_pylist()[0]["subj_text"] == "x"


def test_rule_must_have_two_groups():
    import pytest

    with pytest.raises(ValueError):
        TripleExtractor((ExtractionRule("bad", r"(\w+) scan", "scans"),))


def test_extract_mentions_dataset():
    ds = ray.data.from_arrow(
        _batch([("c1", 0, "user", "a join b"), ("c2", 1, "assistant", "c join d")])
    )
    out = extract_mentions(ds, RULES, concurrency=1).to_pandas()
    assert len(out) == 2
    assert set(out["conv_id"]) == {"c1", "c2"}
    assert str(out["turn_idx"].dtype) == "int32"


def test_char_class_pattern_takes_findall_path_correctly():
    """A '(' inside a character class must not be rewritten into a named
    group — patterns with classes bail to the findall path and still work."""
    from multiomics_biocypher_kg_ray.config import ExtractionRule
    from multiomics_biocypher_kg_ray.stages.extract import TripleExtractor

    rule = ExtractionRule("r_cls", r"([\w(]+) uses ([\w)]+)", "uses")
    ex = TripleExtractor((rule,))
    assert ex.rules[0][3] is None  # no vectorized rewrite for class patterns
    batch = pa.table(
        {
            "conv_id": ["c"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["a( uses b)"],
            "tool": [""],
            "ts": pa.array([None], pa.timestamp("us")),
        }
    )
    out = ex(batch)
    assert out.column("subj_text").to_pylist() == ["a("]
    assert out.column("obj_text").to_pylist() == ["b)"]
