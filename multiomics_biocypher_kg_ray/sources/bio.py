"""Bioinformatics file readers — FASTA and GFF3 as Ray Data sources.

Reference analogs:
- FASTA: ``cyanorak_ncbi_adapter.py:94-119`` parses ``protein.faa`` into
  ``{accession: AA-sequence}`` (defline ``>ACC description``; sequence lines
  concatenated until the next defline).
- GFF: ``download_genome_data.py`` (gffpandas) extracts gene coordinates —
  9 tab-separated columns with ``#`` comment lines and a semicolon-separated
  ``key=value`` attribute column.

Ray shape: FASTA records span lines, so the parallel unit is the FILE
(``read_binary_files`` → one parse task per file — genome payloads ship as
many per-strain files, which is exactly the reference's layout); GFF is
line-oriented, so it reads with the CSV machinery and a vectorized
attribute-extraction pass. Both emit plain Arrow tables ready for
broadcast-dict conversion (``{accession → seq}`` probes) or joins.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

FASTA_SCHEMA = pa.schema(
    [
        ("accession", pa.string()),
        ("description", pa.string()),
        ("sequence", pa.string()),
        ("path", pa.string()),
    ]
)

GFF_COLUMNS = (
    "seqid source type start end score strand phase attributes".split()
)


def parse_fasta_bytes(data: bytes, path: str = "") -> pa.Table:
    """One FASTA file → (accession, description, sequence, path) rows.

    Defline: ``>ACC optional description``; accession = first whitespace
    token. Sequence lines are concatenated verbatim (minus newlines);
    blank lines and ``;`` comment lines are skipped."""
    acc: list[str] = []
    desc: list[str] = []
    seqs: list[str] = []
    cur_parts: list[str] = []

    def flush() -> None:
        if acc and len(seqs) < len(acc):
            seqs.append("".join(cur_parts))

    for raw in data.decode("utf-8", errors="replace").splitlines():
        line = raw.strip()
        if not line or line.startswith(";"):
            continue
        if line.startswith(">"):
            flush()
            cur_parts = []
            head = line[1:].strip()
            first, _, rest = head.partition(" ")
            acc.append(first)
            desc.append(rest.strip())
        else:
            cur_parts.append(line)
    flush()
    return pa.table(
        {
            "accession": pa.array(acc, pa.string()),
            "description": pa.array(desc, pa.string()),
            "sequence": pa.array(seqs, pa.string()),
            "path": pa.array([path] * len(acc), pa.string()),
        }
    )


def read_fasta(paths: "str | list[str]") -> "ray.data.Dataset":
    """FASTA files → Dataset(accession, description, sequence, path).

    File-parallel: each file parses in its own task (records span lines, so
    the file is the natural split unit; per-strain layouts give plenty of
    files). For a single giant FASTA, pre-split it at deflines upstream."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_fasta_bytes(b, p)
            for p, b in zip(
                batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
            )
        ]
        return pa.concat_tables(tables) if tables else FASTA_SCHEMA.empty_table()

    return files.map_batches(parse, batch_format="pyarrow")


def read_gff(paths: "str | list[str]", attribute_keys: tuple[str, ...] = ("ID", "Name", "locus_tag")) -> "ray.data.Dataset":
    """GFF3 → Dataset with the 9 standard columns plus one extracted column
    per requested attribute key (``ID=...;Name=...`` semicolon attributes).

    Line-oriented → reads through the text machinery with ``#`` comments
    dropped; attribute extraction is a vectorized regex per key. '.'
    sentinels become nulls for score/strand/phase; start/end are int64."""
    lines = ray.data.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        keep = pc.invert(pc.starts_with(col, "#"))
        col = col.filter(keep)
        parts = pc.split_pattern(col, "\t")
        cols: dict[str, pa.Array] = {}
        for i, name in enumerate(GFF_COLUMNS):
            cols[name] = pc.list_element(parts, i)
        # typed/sentinel handling
        out: dict[str, pa.Array] = {}
        out["seqid"] = cols["seqid"]
        out["source"] = cols["source"]
        out["type"] = cols["type"]
        out["start"] = pc.cast(cols["start"], pa.int64())
        out["end"] = pc.cast(cols["end"], pa.int64())
        for c in ("score", "strand", "phase"):
            v = cols[c]
            out[c] = pc.if_else(pc.equal(v, "."), pa.nulls(len(v), pa.string()), v)
        out["attributes"] = cols["attributes"]
        for key in attribute_keys:
            ex = pc.extract_regex(
                cols["attributes"], pattern=rf"(?:^|;){key}=(?P<v>[^;]*)"
            )
            out[f"attr_{key}"] = pc.struct_field(ex, "v")
        return pa.table(out)

    return lines.map_batches(parse, batch_format="pyarrow")
