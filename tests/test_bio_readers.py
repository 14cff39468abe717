"""FASTA / GFF3 reader tests (S4/S5): multi-line records, comments,
sentinels, attribute extraction, multi-file parallelism."""

import ray.data

from multiomics_biocypher_kg_ray.sources.bio import (
    parse_fasta_bytes,
    read_fasta,
    read_gff,
)

FASTA_A = b""">WP_000001.1 DNA polymerase III subunit
MKRLA
DEFGH
>WP_000002.1
QQQQ

>WP_000003.1 trailing record
ZZ
"""

GFF = b"""##gff-version 3
# a comment line
chr1\tcyanorak\tgene\t100\t900\t.\t+\t.\tID=gene1;Name=dnaN;locus_tag=PMM0001
chr1\tcyanorak\tCDS\t100\t900\t0.9\t+\t0\tID=cds1;Parent=gene1
chr2\tncbi\tgene\t5\t50\t.\t-\t.\tID=gene2;locus_tag=PMM0002
"""


def test_parse_fasta_multiline_and_blank(tmp_path):
    t = parse_fasta_bytes(FASTA_A, "x.faa")
    assert t.column("accession").to_pylist() == [
        "WP_000001.1", "WP_000002.1", "WP_000003.1",
    ]
    assert t.column("sequence").to_pylist() == ["MKRLADEFGH", "QQQQ", "ZZ"]
    assert t.column("description").to_pylist()[0] == "DNA polymerase III subunit"


def test_read_fasta_multi_file(tmp_path):
    (tmp_path / "a.faa").write_bytes(FASTA_A)
    (tmp_path / "b.faa").write_bytes(b">ACC_B desc\nABCD\n")
    out = (
        read_fasta([str(tmp_path / "a.faa"), str(tmp_path / "b.faa")])
        .to_pandas()
        .sort_values("accession")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert out.loc[0, "accession"] == "ACC_B" and out.loc[0, "sequence"] == "ABCD"
    # broadcast-dict conversion target (the reference's {acc → seq} probe)
    d = dict(zip(out["accession"], out["sequence"]))
    assert d["WP_000002.1"] == "QQQQ"


def test_read_gff_columns_sentinels_attributes(tmp_path):
    p = tmp_path / "x.gff"
    p.write_bytes(GFF)
    out = read_gff(str(p)).to_pandas().sort_values(["seqid", "start"]).reset_index(drop=True)
    assert len(out) == 3
    g1 = out[out["attr_ID"] == "gene1"].iloc[0]
    assert g1["start"] == 100 and g1["end"] == 900
    assert g1["attr_Name"] == "dnaN" and g1["attr_locus_tag"] == "PMM0001"
    assert g1["score"] is None and g1["phase"] is None  # '.' sentinels → null
    cds = out[out["attr_ID"] == "cds1"].iloc[0]
    assert cds["score"] == "0.9" and cds["phase"] == "0"
    g2 = out[out["attr_ID"] == "gene2"].iloc[0]
    assert g2["strand"] == "-" and g2["attr_Name"] is None
