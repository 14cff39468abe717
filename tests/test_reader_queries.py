"""Registry queries for the reader/scalar-parser family (SURVEY §2 S1–S5,
M2–M18) — known-value assertions over the committed fixtures, mirroring the
DuckDB oracles in ``oracle_readers`` (the driver checks engine vs oracle;
these tests pin the EXPECTED parses so both sides can't drift together)."""

from __future__ import annotations

import math

import pandas as pd

from multiomics_biocypher_kg_ray.pipelines import reader_queries as rq

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_paper_table_extract_known_values():
    df = _df(rq.q_paper_table_extract(SF)).set_index(["row_id", "token_rank"])
    # M9: list-cell expansion, full value first
    assert df.loc[(0, 1), "gene_token"] == "PMM0001, PMM0002"
    assert df.loc[(0, 2), "gene_token"] == "PMM0001"
    assert df.loc[(0, 3), "gene_token"] == "PMM0002"
    # M9 paren extraction: outer then inner after the full value
    assert df.loc[(2, 1), "gene_token"] == "PMM0004 (hli01)"
    assert df.loc[(2, 2), "gene_token"] == "PMM0004"
    assert df.loc[(2, 3), "gene_token"] == "hli01"
    # M13: CURIE mint
    assert df.loc[(1, 1), "gene_curie"] == "ent:PMM0003"
    # M4/M5 + M2: trailing/leading asterisk, linear→log2
    assert df.loc[(0, 1), "fc_significant"]
    assert df.loc[(0, 1), "log2fc"] == math.log2(1.1)
    assert df.loc[(1, 1), "fc_significant"]
    assert df.loc[(1, 1), "log2fc"] == math.log2(2.4)
    # log2-declared passes through, even negative
    assert df.loc[(2, 1), "log2fc"] == -0.5
    assert not df.loc[(2, 1), "fc_significant"]
    # linear ≤ 0 → null; unparseable → null, flag false
    assert pd.isna(df.loc[(5, 1), "log2fc"])
    assert pd.isna(df.loc[(6, 1), "log2fc"])
    assert not df.loc[(6, 1), "fc_significant"]
    # '-' sentinel fc → null at read → null parse
    assert pd.isna(df.loc[(4, 1), "log2fc"])
    # M6: paren absolute wins; day/min/d units
    assert df.loc[(0, 1), "timepoint_hours"] == 4.0
    assert df.loc[(1, 1), "timepoint_hours"] == 432.0
    assert df.loc[(2, 1), "timepoint_hours"] == 36.0
    assert df.loc[(3, 1), "timepoint_hours"] == 0.5
    assert df.loc[(4, 1), "timepoint_hours"] == 48.0
    assert pd.isna(df.loc[(6, 1), "timepoint_hours"])
    # M15: bool tokens
    assert df.loc[(0, 1), "detected"]
    assert df.loc[(1, 1), "detected"]
    assert not df.loc[(2, 1), "detected"]
    assert df.loc[(4, 1), "detected"]
    assert not df.loc[(5, 1), "detected"]
    # M12: clean_text ' → ^, | → ,  ; '-' note nulls at read
    assert df.loc[(0, 1), "note_clean"] == "light ^stress^ response"
    assert df.loc[(1, 1), "note_clean"] == "up,down mixed"
    assert pd.isna(df.loc[(3, 1), "note_clean"])
    # NA pval → null
    assert pd.isna(df.loc[(3, 1), "pval"])
    assert len(df) == 12


def test_eggnog_tsv_probe():
    df = _df(rq.q_eggnog_tsv_probe(SF)).set_index("query")
    assert df.loc["PMM0001", "evalue"] == 1e-50
    assert pd.isna(df.loc["PMM0002", "seed_ortholog"])
    assert pd.isna(df.loc["PMM0002", "evalue"])
    assert df.loc["PMM0003", "cog_category"] == "KT"
    assert df.loc["PMM0004", "score"] == 612.25


def test_keyed_json_probe():
    df = _df(rq.q_keyed_json_probe(SF)).set_index("locus_tag")
    assert df.loc["PMM0001", "length"] == 234
    assert pd.isna(df.loc["PMM0002", "cog"])
    assert df.loc["PMM0003", "product"] == "sensor histidine kinase"


def test_fasta_stats():
    df = _df(rq.q_fasta_stats(SF)).set_index("accession")
    assert len(df) == 3
    assert df.loc["WP_000001.1", "length"] == 180
    assert df.loc["WP_000001.1", "description"].startswith("ribosomal protein")
    assert df.loc["WP_000002.1", "sequence"] == "MSKLEEKNS"
    assert df.loc["WP_000003.1", "description"] == ""
    assert df.loc["WP_000003.1", "length"] == 87


def test_gff_features_m11_filter():
    df = _df(rq.q_gff_features(SF))
    # M11: the 3 RNA features are dropped
    assert set(df["locus_tag"]) == {"PMM0001", "PMM0002", "PMM0003", "PMM0004"}
    assert (df["type"] == "gene").all()
    row = df.set_index("locus_tag").loc["PMM0001"]
    assert row["start"] == 100 and row["end"] == 1500 and row["strand"] == "+"
    assert row["name"] == "rpl1"
    assert pd.isna(df.set_index("locus_tag").loc["PMM0002", "name"])


def test_formula_elements():
    df = _df(rq.q_formula_elements(SF)).set_index("name")
    assert df.loc["glucose", "elements_csv"] == "C,H,O"
    assert df.loc["copper sulfate", "elements_csv"] == "Cu,O,S"
    assert df.loc["ATP", "elements_csv"] == "C,H,N,O,P"
    assert df.loc["iron", "elements_csv"] == "Fe"
    # junk / sentinel → empty element set
    assert df.loc["junk", "n_elements"] == 0
    assert df.loc["blank", "elements_csv"] == ""
    assert df.loc["dash", "n_elements"] == 0


def test_id_column_detect():
    df = _df(rq.q_id_column_detect(SF)).set_index("column")
    assert bool(df.loc["p_partkey", "is_id_like"])
    assert df.loc["p_partkey", "cardinality_ppm"] == 1_000_000
    assert "keyword_name" in df.loc["p_partkey", "reasons"]
    assert "integer" in df.loc["p_size", "reasons"]
    assert not bool(df.loc["p_brand", "is_id_like"])
    # float column skipped by the heuristic
    assert "p_retailprice" not in df.index


def test_priority_classify_probe():
    df = _df(rq.q_priority_classify_probe(SF)).set_index("priority_class")
    # first-hit-wins: tier-1 'elevated' shadows tier-2 'wrong_tier'
    assert "wrong_tier" not in df.index
    assert set(df.index) == {
        "critical",
        "elevated",
        "standard",
        "unspecified",
        "routine",
    }
    assert int(df["n"].sum()) == 1500  # orders rows at sf0.001


def test_value_range_report():
    df = _df(rq.q_value_range_report(SF))
    # every return flag has min discount 0 → warns
    assert set(df["warning"]) == {"linear_has_nonpositive"}
    assert (df["min_v"] <= 0).all()
    assert len(df) == 3


def test_source_routing_precedence():
    """J7: exact match wins, then substring containment in sorted-key order
    (src1 ⊂ src10..src19), else the default route."""
    df = _df(rq.q_source_routing(SF)).set_index("route")
    # src1 exact + src10..src19 containment = 11 sources; src2 exact = 1;
    # the remaining 8 (src0, src3..src9) default — 25 docs per source at
    # sf0.001? rows counts depend on sf, so check proportions instead
    total = int(df["n_docs"].sum())
    assert set(df.index) == {"shard_one", "shard_two", "shard_default"}
    assert df.loc["shard_one", "n_docs"] == total * 11 // 20
    assert df.loc["shard_two", "n_docs"] == total // 20
    assert df.loc["shard_default", "n_docs"] == total * 8 // 20
