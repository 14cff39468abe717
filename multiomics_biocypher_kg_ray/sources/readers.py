"""Configurable tabular readers (SURVEY §2.1 S1-S3 analogs).

- ``read_csv_with_options``: per-table parse options (delimiter, skip rows,
  comment-prefixed headers) — the paperconfig ``sep`` / ``skip_rows``
  analog (omics_adapter.py:676-684).
- The eggNOG-style TSV convention (``##`` comment lines, header line
  prefixed with ``#``, ``-`` as null sentinel —
  build_gene_annotations.py:342-365) is ``comment_header=True`` +
  ``null_sentinels``.
- ``read_keyed_json``: row-oriented JSON dict keyed by id → Dataset with the
  key as a column (gene_annotations_merged.json analog,
  build_gene_annotations.py:328-441); small files → broadcastable table.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data

from ..functions.parsefn import NULL_SENTINELS


def read_csv_with_options(
    path: str,
    *,
    delimiter: str = ",",
    skip_rows: int = 0,
    comment_header: bool = False,
    null_sentinels: bool = True,
) -> "ray.data.Dataset":
    """CSV/TSV with per-table options.

    ``comment_header=True``: lines starting with ``##`` are dropped and the
    first remaining line, stripped of a leading ``#``, is the header.
    ``null_sentinels=True``: '', '-', 'NA', … parse as null.
    """
    if comment_header:
        # pre-scan the comment block driver-side (headers are tiny); the data
        # body still streams through Arrow CSV
        with open(path) as f:
            lines = f.readlines()
        body_start = 0
        while body_start < len(lines) and lines[body_start].startswith("##"):
            body_start += 1
        header = lines[body_start].lstrip("#").strip().split(delimiter)
        import io
        import tempfile

        tmp = tempfile.NamedTemporaryFile(
            "w", suffix=".csv", delete=False, prefix="reader_"
        )
        tmp.write(delimiter.join(header) + "\n")
        tmp.writelines(lines[body_start + 1 :])
        tmp.close()
        path = tmp.name
        skip_rows = 0

    parse_options = pacsv.ParseOptions(delimiter=delimiter)
    convert_options = pacsv.ConvertOptions(
        null_values=sorted(NULL_SENTINELS) if null_sentinels else [],
        strings_can_be_null=null_sentinels,
    )
    read_options = pacsv.ReadOptions(skip_rows=skip_rows)
    return ray.data.read_csv(
        path,
        parse_options=parse_options,
        convert_options=convert_options,
        read_options=read_options,
    )


def read_keyed_json(path: str, key_column: str = "key") -> pa.Table:
    """``{id: {field: value, ...}, ...}`` JSON → Arrow table with ``key_column``
    first. Small index files; intended for ``ray.put`` broadcast."""
    with open(path) as f:
        data = json.load(f)
    if not isinstance(data, dict):
        raise ValueError("expected a top-level JSON object keyed by id")
    rows = []
    for k, v in data.items():
        row = {key_column: k}
        if isinstance(v, dict):
            row.update(v)
        else:
            row["value"] = v
        rows.append(row)
    return pa.Table.from_pylist(rows)
