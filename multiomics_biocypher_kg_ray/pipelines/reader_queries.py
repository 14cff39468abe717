"""Registry queries for the reader / scalar-parser operator family
(SURVEY §2 S1–S5 and M2–M6/M9/M11–M15/M17/M18) — the operators that through
round 4 were exercised only by pytest. Each query here has a DuckDB twin in
``oracle_readers`` so the driver's hard correctness gate covers them.

The tabular fixtures are committed under ``tests/fixtures/`` (the reference's
own test strategy: tiny synthetic inputs with known parses — SURVEY §5);
paths resolve from this module's location. Config-scale inputs (paper
supplementary tables, annotation exports) are inherently small — the per-row
scalar parse inside one ``map_batches`` batch is the spec here, not a hot
path (reference ``omics_adapter.py:634-867`` is the same shape); the
corpus-scale queries (priority classify, range report, id detect) stay fully
vectorized / distributed.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.parsefn import (
    expand_list_cell,
    fold_change_to_log2,
    parse_asterisk_number,
    parse_bool_cell,
    parse_formula_elements,
    parse_timepoint_hours,
)
from ..functions.textfn import clean_text
from ..oracle_readers import (
    PRIORITY_CASCADES,
    PRIORITY_DEFAULT,
    PRIORITY_VOCAB,
)
from ..sources.bio import read_fasta, read_gff
from ..sources.readers import (
    read_csv_with_options,
    read_keyed_json,
)

_REPO_ROOT = Path(__file__).resolve().parents[2]
FIXTURES = _REPO_ROOT / "tests" / "fixtures"


def _registry():
    """Per-worker-cached schema registry for CURIE minting (M13/ST6)."""
    from ..schema import default_registry
    from ..state.broadcast import state_key, task_state

    return task_state(state_key("reader_queries_schema"), default_registry)


# --------------------------------------------------------------- S1 + M2..M15


def q_paper_table_extract(sf_dir: str):
    """Paper supplementary-table ingest (S1 read options + the scalar-parser
    family): ``read_csv_with_options`` (';' delimiter, 2 skipped preamble
    rows, null sentinels), then per row: ``expand_list_cell`` (M9) over the
    gene cell, ``parse_asterisk_number`` (M4/M5) + ``fold_change_to_log2``
    (M2) over the fold-change cell, ``parse_timepoint_hours`` (M6),
    ``parse_bool_cell`` (M15), ``clean_text`` (M12) and the cached ``ent:``
    CURIE mint (M13/ST6). One output row per (row, gene token), rank 1-based
    with the full cell value first — reference row→edge extraction shape
    (``omics_adapter.py:634-867``)."""
    ds = read_csv_with_options(
        str(FIXTURES / "paper_table.csv"), delimiter=";", skip_rows=2
    )
    OUT = pa.schema(
        [
            ("row_id", pa.int64()),
            ("token_rank", pa.int64()),
            ("gene_token", pa.string()),
            ("gene_curie", pa.string()),
            ("log2fc", pa.float64()),
            ("fc_significant", pa.bool_()),
            ("pval", pa.float64()),
            ("timepoint_hours", pa.float64()),
            ("detected", pa.bool_()),
            ("note_clean", pa.string()),
        ]
    )

    def parse(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return OUT.empty_table()
        reg = _registry()
        notes = clean_text(batch.column("note"))  # vectorized M12 pass
        rows: list[dict] = []
        for i in range(batch.num_rows):
            fc_cell = batch.column("fc")[i].as_py()
            fc_val, fc_sig = parse_asterisk_number(fc_cell)
            log2fc = fold_change_to_log2(
                fc_val, batch.column("fc_type")[i].as_py()
            )
            tp = parse_timepoint_hours(batch.column("timepoint")[i].as_py())
            det = parse_bool_cell(batch.column("detected")[i].as_py())
            note = notes[i].as_py()
            row_id = batch.column("row_id")[i].as_py()
            pval = batch.column("pval")[i].as_py()
            for rank, tok in enumerate(
                expand_list_cell(batch.column("gene")[i].as_py()), start=1
            ):
                rows.append(
                    {
                        "row_id": row_id,
                        "token_rank": rank,
                        "gene_token": tok,
                        "gene_curie": reg.mint_id("term", tok),
                        "log2fc": log2fc,
                        "fc_significant": fc_sig,
                        "pval": pval,
                        "timepoint_hours": tp,
                        "detected": det,
                        "note_clean": note,
                    }
                )
        if not rows:
            return OUT.empty_table()
        return pa.Table.from_pylist(rows, schema=OUT)

    return ds.map_batches(parse, batch_format="pyarrow")


# ------------------------------------------------------------------------ S2


def q_eggnog_tsv_probe(sf_dir: str):
    """eggNOG-convention TSV (S2): '##' comment block dropped, header
    stripped of its leading '#', '-' parsed as null
    (``build_gene_annotations.py:342-365``)."""
    return read_csv_with_options(
        str(FIXTURES / "eggnog.tsv"), delimiter="\t", comment_header=True
    )


# ------------------------------------------------------------------------ S3


def q_keyed_json_probe(sf_dir: str):
    """Keyed-JSON annotation load (S3): ``{locus_tag: record}`` →  table
    with the key as first column (``gene_annotations_merged.json`` analog)."""
    return read_keyed_json(
        str(FIXTURES / "gene_annotations.json"), key_column="locus_tag"
    )


# ------------------------------------------------------------------------ S4


def q_fasta_stats(sf_dir: str):
    """FASTA ingest (S4): defline accession/description split, multi-line
    sequence concatenation, ';' comments and blanks dropped
    (``cyanorak_ncbi_adapter.py:94-119``); emits per-record length."""
    ds = read_fasta(str(FIXTURES / "proteins.fasta"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "accession": t.column("accession"),
                "description": t.column("description"),
                "sequence": t.column("sequence"),
                "length": pc.cast(
                    pc.utf8_length(t.column("sequence")), pa.int64()
                ),
            }
        )

    return ds.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------------ S5 + M11


def q_gff_features(sf_dir: str):
    """GFF3 ingest (S5) + the RNA-feature regex skip filter (M11):
    9-column tab parse with '#' comment drop, '.'-sentinel nulling,
    attribute extraction, then the ``tRNA|ncRNA|rRNA`` id drop
    (``gene_id_utils.py:113-118``)."""
    ds = read_gff(
        str(FIXTURES / "features.gff"), attribute_keys=("Name", "locus_tag")
    )

    def finish(t: pa.Table) -> pa.Table:
        lt = t.column("attr_locus_tag")
        keep = pc.invert(
            pc.match_substring_regex(
                pc.fill_null(lt, ""), r"tRNA|ncRNA|rRNA"
            )
        )
        t = t.filter(keep)
        return pa.table(
            {
                "seqid": t.column("seqid"),
                "type": t.column("type"),
                "start": t.column("start"),
                "end": t.column("end"),
                "strand": t.column("strand"),
                "locus_tag": t.column("attr_locus_tag"),
                "name": t.column("attr_Name"),
            }
        )

    return ds.map_batches(finish, batch_format="pyarrow")


# ----------------------------------------------------------------------- M17


def q_formula_elements(sf_dir: str):
    """Hill-notation formula → sorted unique element symbols (M17,
    ``metabolism_adapter.py`` ``_parse_elements``); junk / sentinel cells
    yield an empty element set."""
    ds = read_csv_with_options(str(FIXTURES / "metabolites.csv"))
    OUT = pa.schema(
        [
            ("name", pa.string()),
            ("elements_csv", pa.string()),
            ("n_elements", pa.int64()),
        ]
    )

    def parse(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return OUT.empty_table()
        rows = []
        for i in range(batch.num_rows):
            els = parse_formula_elements(batch.column("formula")[i].as_py())
            rows.append(
                {
                    "name": batch.column("name")[i].as_py(),
                    "elements_csv": ",".join(els),
                    "n_elements": len(els),
                }
            )
        return pa.Table.from_pylist(rows, schema=OUT)

    return ds.map_batches(parse, batch_format="pyarrow")


# ----------------------------------------------------------------------- M14


def q_id_column_detect(sf_dir: str):
    """ID-like column detection (M14) over a deterministic sampled block —
    the first 2000 part rows by p_partkey (driver-side schema inference per
    the reference's heuristics, ``gene_id_utils.py:859-915``)."""
    from ..arrow_util import read_parquet_clean
    from ..functions.schema_infer import detect_id_columns

    rows = (
        read_parquet_clean(f"{sf_dir}/part.parquet")
        .sort("p_partkey")
        .limit(2000)
        .take_all()
    )
    sample = pa.Table.from_pylist(rows)
    out = detect_id_columns(sample)
    return pd.DataFrame(
        [
            {
                "column": d["column"],
                "score": float(d["score"]),
                "cardinality_ppm": int(d["cardinality_ppm"]),
                "reasons": d["reasons"],
                "is_id_like": bool(d["is_id_like"]),
            }
            for d in out
        ]
    )


# ----------------------------------------------------------------------- M18


def q_priority_classify_probe(sf_dir: str):
    """First-hit-wins mapping-cascade classification (M18,
    ``build_gene_annotations.py:60-201``): orders priorities through a
    2-tier cascade (tier 1 shadows tier 2 for '2-HIGH' — the probe that
    proves precedence) with a vocabulary assertion, then a class count."""
    from ..arrow_util import read_parquet_clean
    from ..functions.schema_infer import priority_classify
    from ..stages.fastagg import drop_empty_blocks, sorted_grouped_agg

    MID = pa.schema([("priority_class", pa.string()), ("_one", pa.int64())])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        cls = priority_classify(
            t.column("o_orderpriority"),
            PRIORITY_CASCADES,
            default=PRIORITY_DEFAULT,
            vocabulary=PRIORITY_VOCAB,
        )
        return pa.Table.from_arrays(
            [cls, pa.array(np.ones(t.num_rows, np.int64))], schema=MID
        )

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority"]
    ).map_batches(prep, batch_format="pyarrow")
    return sorted_grouped_agg(
        drop_empty_blocks(ds, MID),
        ["priority_class"],
        [("_one", "sum")],
        out_names=["n"],
    )


# ------------------------------------------------------------- S7 / ST7


def q_cached_lookup_enrich(sf_dir: str):
    """Cache-or-fetch enrichment (S7/ST7, ``ncbi_protein_xref`` /
    ``build_gene_id_mapping.py:40-45`` analog): supplier rows enriched
    through the shared ``LookupCacheActor`` — each distinct key is
    "fetched" at most once cluster-wide (per-batch C++ distinct →
    per-worker memo → one actor round-trip for genuinely new keys →
    vectorized ``index_in``/``take`` fan-out). The sandbox has no network,
    so the fetcher is the deterministic md5 stand-in
    ``tax:<md5('fetch:'+key)[:8]>`` — which is exactly what lets the
    DuckDB twin re-derive the enrichment independently."""
    import hashlib

    from ..arrow_util import read_parquet_clean
    from ..state.lookup_cache import LookupCacheActor, enrich_with_cache

    def fetch(keys: list[str]) -> list[str]:
        return [
            "tax:" + hashlib.md5(f"fetch:{k}".encode()).hexdigest()[:8]
            for k in keys
        ]

    actor = LookupCacheActor.remote(fetch)
    ds = read_parquet_clean(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    return enrich_with_cache(ds, actor, "s_name", "taxon")


def sql_cached_lookup_enrich() -> str:
    """Twin of ``q_cached_lookup_enrich``: the same md5 derivation inline."""
    return """
SELECT s_suppkey, s_name,
       'tax:' || substr(md5('fetch:' || s_name), 1, 8) AS taxon
FROM supplier
"""


# -------------------------------------------------------------------- J7

# routing dict (ORGANISM_TO_GENOME_DIR analog, gene_id_utils.py:32-158):
# exact normalized match first, then substring containment over the keys in
# sorted order (first hit wins), else the default route
SOURCE_ROUTES: dict[str, str] = {"src1": "shard_one", "src2": "shard_two"}
ROUTE_DEFAULT = "shard_default"


def q_source_routing(sf_dir: str):
    """Entity-routing dict lookup (J7): each document's source routed
    through a broadcast ~100-alias-scale dict — exact lowercase match, then
    substring containment in sorted-key order (src1 ⊂ src10..src19, the
    reference's normalized-substring organism lookup), else default. One
    vectorized cascade (index_in + match_substring fill-null chain) and a
    route count fastagg."""
    from ..arrow_util import read_parquet_clean
    from ..stages.fastagg import drop_empty_blocks, sorted_grouped_agg

    keys = sorted(SOURCE_ROUTES)
    MID = pa.schema([("route", pa.string()), ("_one", pa.int64())])

    def route(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        src = pc.utf8_lower(pc.utf8_trim_whitespace(t.column("source")))
        key_arr = pa.array(keys, pa.string())
        val_arr = pa.array([SOURCE_ROUTES[k] for k in keys], pa.string())
        out = pc.take(val_arr, pc.index_in(src, value_set=key_arr))
        for k in keys:  # containment tiers, first hit wins
            hit = pc.match_substring(src, k)
            out = pc.if_else(
                pc.is_valid(out),
                out,
                pc.if_else(hit, pa.scalar(SOURCE_ROUTES[k]), pa.nulls(1, pa.string())[0]),
            )
        out = pc.fill_null(out, ROUTE_DEFAULT)
        return pa.Table.from_arrays(
            [out, pa.array(np.ones(t.num_rows, np.int64))], schema=MID
        )

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["source"]
    ).map_batches(route, batch_format="pyarrow")
    return sorted_grouped_agg(
        drop_empty_blocks(ds, MID), ["route"], [("_one", "sum")], out_names=["n_docs"]
    )


def sql_source_routing() -> str:
    """Twin of ``q_source_routing``: the same exact-then-containment cascade
    flattened to CASE tiers, generated from the SAME routing dict."""
    keys = sorted(SOURCE_ROUTES)
    exact = " ".join(
        f"WHEN s = '{k}' THEN '{SOURCE_ROUTES[k]}'" for k in keys
    )
    contain = " ".join(
        f"WHEN contains(s, '{k}') THEN '{SOURCE_ROUTES[k]}'" for k in keys
    )
    return f"""
WITH n AS (SELECT lower(trim(source)) AS s FROM documents)
SELECT CASE {exact} {contain} ELSE '{ROUTE_DEFAULT}' END AS route,
       count(*)::BIGINT AS n_docs
FROM n GROUP BY 1
"""


# ----------------------------------------------- declarative-config surface


def q_kg_mentions_yaml(sf_dir: str):
    """The paperconfig.yaml analog driving the flagship extractor: rules
    loaded + validated from the committed YAML fixture
    (``yamlconfig.load_extraction_config``) must reproduce ``kg_mentions``
    byte-for-byte — same oracle SQL twin. A user adds a source by dropping
    a YAML file, not editing Python (reference ``CLAUDE.md:133-183``)."""
    from ..sources.transcripts import transcripts_dataset
    from ..stages.extract import extract_mentions
    from ..yamlconfig import load_extraction_config

    cfg = load_extraction_config(str(FIXTURES / "extraction_config.yaml"))
    return extract_mentions(transcripts_dataset(sf_dir), rules=cfg.rules)


# ------------------------------------------------------------------------ M3


def q_value_range_report(sf_dir: str):
    """Declared-scale range validation (M3, ``omics_adapter.py:95-134``):
    l_discount declared 'linear' per return flag — groups whose min ≤ 0 get
    a warning row (TPC-H discounts include 0, so every flag warns)."""
    from ..arrow_util import read_parquet_clean
    from ..functions.schema_infer import validate_value_ranges

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_discount"]
    )
    return validate_value_ranges(ds, "l_returnflag", "l_discount", "linear")
