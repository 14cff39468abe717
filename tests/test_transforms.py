"""Transform-library tests: per-transform behavior (reference
``annotation_transforms.py`` semantics), Python↔DuckDB twin parity, and
EC transfer-chain resolution properties (termination, cycle guard)."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from multiomics_biocypher_kg_ray.functions.transforms import (
    TRANSFORM_SQL,
    EcTransferMap,
    compile_chain,
    get_transform,
    make_normalize_ec,
    sql_chain,
)


def test_go_prefix_family():
    f = get_transform("add_go_prefix")
    assert f("0009360") == "GO:0009360"
    assert f("GO:0009360") == "GO:0009360"
    assert f("-") == "" and f("") == ""
    assert f("K02710") == "K02710"  # non-GO terms pass through

    p = get_transform("extract_go_from_pipe")
    assert p("DNA replication|0006260||IEA") == "GO:0006260"
    assert p("0006260") == "GO:0006260"  # fallback to add_go_prefix
    assert p("name|notdigits||x") == "name|notdigits||x"

    b = get_transform("extract_go_from_brackets")
    assert b("DNA polymerase III complex [GO:0009360]") == "GO:0009360"
    assert b("no go here") == ""


def test_cleaner_family():
    c = get_transform("clean_function_description")
    assert (
        c("FUNCTION: Binds DNA {ECO:0000256|ARBA:ARBA0001}. Also stuff.")
        == "Binds DNA Also stuff"
    )
    assert c("FUNCTION: Binds DNA.") == "Binds DNA"
    assert get_transform("clean_catalytic_activity")(
        "CATALYTIC ACTIVITY: a + b = c; {ECO:0000256};"
    ).startswith("a + b = c")
    assert get_transform("extract_cofactor_name")("COFACTOR: Name=FMN; Xref=x") == "FMN"
    assert get_transform("extract_pathway_name")(
        "PATHWAY: Energy metabolism; oxphos. {ECO:1}."
    ).startswith("Energy metabolism")
    assert get_transform("extract_tm_range")('TRANSMEM 32..50; /note="Helical"') == "32..50"
    assert get_transform("extract_signal_range")("SIGNAL 1..26; /evidence=x") == "1..26"
    assert get_transform("strip_prefix_ko")("ko:K02710") == "K02710"


def test_split_cog_category_list_valued_and_banned_in_chains():
    f = get_transform("split_cog_category")
    assert f("LU") == ["L", "U"]
    assert f("S") == ["S"]
    assert f("-") == [] and f("") == []
    with pytest.raises(ValueError):
        compile_chain(("split_cog_category",))


def test_sql_twins_match_python_on_samples():
    samples = [
        "alpha beta",
        "x",
        "",
        "foo*+",
        "A.1.2",
        "  spaced   out  ",
        "ko:K00001",
        "FUNCTION: does things",
        "tok.2",
    ]
    con = duckdb.connect()
    for name, tmpl in TRANSFORM_SQL.items():
        py = get_transform(name)
        for s in samples:
            expr = tmpl.format(x="?")
            got = con.execute(f"SELECT {expr}", [s]).fetchone()[0]
            assert got == py(s), f"{name} mismatch on {s!r}: sql={got!r} py={py(s)!r}"


def test_sql_chain_composes_in_order():
    con = duckdb.connect()
    expr = sql_chain(("normalize_ws", "first_token_space", "upper"), "?")
    got = con.execute(f"SELECT {expr}", ["  hello   world "]).fetchone()[0]
    assert got == "HELLO"
    chain = compile_chain(("normalize_ws", "first_token_space", "upper"))
    assert chain("  hello   world ") == "HELLO"
    with pytest.raises(KeyError):
        sql_chain(("extract_tm_range",), "x")  # no SQL twin → config-time error


# ------------------------------------------------------- EC transfer chains


def test_ec_chain_basic_transfer_deleted_and_multi():
    m = EcTransferMap(
        {
            "1.1.1.1": ["2.2.2.2"],
            "2.2.2.2": ["3.3.3.3"],
            "4.4.4.4": [],
            "5.5.5.5": ["3.3.3.3", "6.6.6.6"],
        }
    )
    norm = make_normalize_ec(m)
    assert norm("1.1.1.1") == "3.3.3.3"  # chain collapsed A→B→C ⇒ A→C
    assert norm("2.2.2.2") == "3.3.3.3"
    assert norm("4.4.4.4") == ""  # deleted
    assert norm("5.5.5.5") == ["3.3.3.3", "6.6.6.6"]  # multi-successor
    assert norm("9.9.9.9") == "9.9.9.9"  # current: pass through
    assert norm("-") == "" and norm("") == ""


def test_ec_chain_cycle_guard():
    m = EcTransferMap({"1.1.1.1": ["2.2.2.2"], "2.2.2.2": ["1.1.1.1"]})
    # cycle terminates; the revisited node is kept (reference visited-guard)
    out = m.normalize("1.1.1.1")
    assert out in ("1.1.1.1", "2.2.2.2")


def test_ec_from_records_parser():
    m = EcTransferMap.from_records(
        {
            "1.1.1.1": "Transferred entry: 2.2.2.2, 3.3.3.3 and 4.4.4.4.",
            "5.5.5.5": "Deleted entry.",
            "6.6.6.6": "A real enzyme",
        }
    )
    assert m.normalize("1.1.1.1") == ["2.2.2.2", "3.3.3.3", "4.4.4.4"]
    assert m.normalize("5.5.5.5") == ""
    assert m.normalize("6.6.6.6") == "6.6.6.6"


_EC_IDS = [f"{i}.{i}.{i}.{i}" for i in range(1, 9)]


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(_EC_IDS),
        st.lists(st.sampled_from(_EC_IDS), max_size=3),
        max_size=8,
    )
)
def test_ec_chain_always_terminates_and_resolves_to_current(raw):
    """Property: construction terminates for ANY transfer map (including
    cycles and self-loops), and every resolved id is either current (not a
    transferred key), or part of a cycle."""
    m = EcTransferMap(raw)
    for ec in _EC_IDS:
        out = m.normalize(ec)
        vals = out if isinstance(out, list) else ([out] if out else [])
        for v in vals:
            assert isinstance(v, str) and v
            if v in raw and raw[v]:
                # a transferred id may only appear if a cycle exists through it
                seen, stack = set(), [v]
                cyclic = False
                while stack:
                    cur = stack.pop()
                    if cur == v and cur in seen:
                        cyclic = True
                        break
                    if cur in seen:
                        continue
                    seen.add(cur)
                    for s in raw.get(cur, []):
                        if s == v:
                            cyclic = True
                            stack.clear()
                            break
                        stack.append(s)
                assert cyclic, f"{v} is transferred but not cyclic in {raw}"


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=30))
def test_scalar_transforms_total_on_arbitrary_text(s):
    """Every scalar transform is total: no exceptions, returns str."""
    for name in TRANSFORM_SQL:
        out = get_transform(name)(s)
        assert isinstance(out, str)
