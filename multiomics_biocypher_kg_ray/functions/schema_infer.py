"""Driver-side schema-inference and validation helpers (SURVEY §2.2
M3/M14/M18 analogs). These operate on a SAMPLED block (a pyarrow Table) —
never on the full dataset — mirroring the reference's driver-side heuristics.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# ------------------------------------------------- M14: ID-column detection

_ID_KEYWORDS = ("id", "key", "tag", "accession", "locus", "code", "name")
_ID_SHAPE_RE = re.compile(r"^[A-Za-z]*[_\-]?\d+(\.\d+)?$")


def detect_id_columns(
    sample: pa.Table,
    *,
    min_cardinality_ratio: float = 0.3,
    max_mean_len: float = 24.0,
) -> list[dict]:
    """Heuristic ID-like column detector over a sampled block (reference:
    ``gene_id_utils.py:859-915`` — cardinality, numeric-ness, mean length,
    keyword lists). Returns per-column diagnostics sorted by score desc."""
    out = []
    for name in sample.column_names:
        col = sample.column(name)
        if not pa.types.is_string(col.type) and not pa.types.is_integer(col.type):
            continue
        n = len(col)
        if n == 0:
            continue
        n_uniq = len(pc.unique(col))
        card = n_uniq / n
        score = 0.0
        reasons = []
        if any(k in name.lower() for k in _ID_KEYWORDS):
            score += 2.0
            reasons.append("keyword_name")
        if card >= min_cardinality_ratio:
            score += 1.0
            reasons.append("high_cardinality")
        if pa.types.is_string(col.type):
            vals = [v for v in col.slice(0, 200).to_pylist() if v]
            if vals:
                mean_len = float(np.mean([len(v) for v in vals]))
                if mean_len <= max_mean_len:
                    score += 0.5
                shaped = sum(1 for v in vals if _ID_SHAPE_RE.match(v)) / len(vals)
                if shaped >= 0.8:
                    score += 1.5
                    reasons.append("id_shaped_values")
        elif pa.types.is_integer(col.type):
            score += 0.5
            reasons.append("integer")
        out.append(
            {
                "column": name,
                "score": round(score, 2),
                "cardinality_ratio": round(card, 4),
                # exact integer twin of the ratio (ppm) — the oracle-safe
                # field: n_uniq*1e6 // n has no float-rounding hazard
                "cardinality_ppm": n_uniq * 1_000_000 // n,
                "reasons": ",".join(reasons),
                "is_id_like": score >= 2.5,
            }
        )
    return sorted(out, key=lambda d: (-d["score"], d["column"]))


# --------------------------------------------- M3: declared-scale validator


def validate_value_ranges(
    ds: "ray.data.Dataset",
    group_key: str,
    value_col: str,
    declared_scale: str,
) -> pd.DataFrame:
    """Per-group range sanity check for a declared fold-change-like scale
    (reference ``omics_adapter.py:95-134``): ``linear`` values must be > 0;
    a ``log2`` column where EVERY value is > 1.0 probably is linear-declared-
    as-log2. Returns a warnings DataFrame (group, min, max, warning) — empty
    when clean. Distributed min/max aggregate; verdicts on the tiny result."""
    from ray.data.aggregate import Max, Min

    stats = (
        ds.select_columns([group_key, value_col])
        .groupby(group_key)
        .aggregate(Min(value_col, alias_name="min_v"), Max(value_col, alias_name="max_v"))
        .to_pandas()
    )
    warnings = []
    for r in stats.itertuples():
        if declared_scale == "linear" and r.min_v <= 0:
            warnings.append((getattr(r, group_key), r.min_v, r.max_v, "linear_has_nonpositive"))
        if declared_scale == "log2" and r.min_v > 1.0:
            warnings.append((getattr(r, group_key), r.min_v, r.max_v, "log2_all_above_1"))
    return pd.DataFrame(warnings, columns=[group_key, "min_v", "max_v", "warning"])


# ----------------------------------- M18: priority mapping cascade (3-tier)


def priority_classify(
    col: pa.Array | pa.ChunkedArray,
    cascades: list[dict[str, str]],
    default: str = "unknown",
    vocabulary: frozenset[str] | None = None,
) -> pa.Array:
    """First-hit-wins classification through an ordered list of mapping
    dicts (reference ``build_gene_annotations.py:60-201``: Cyanorak role →
    TIGR role → COG letter into 26 controlled values, with a build-time
    vocabulary assertion). Vectorized: each tier is one ``pc.index_in`` +
    ``pc.take``; unresolved rows fall through to the next tier."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    result = pa.nulls(len(col), pa.string())
    for mapping in cascades:
        keys = pa.array(list(mapping.keys()), pa.string())
        vals = pa.array(list(mapping.values()), pa.string())
        idx = pc.index_in(col, value_set=keys)
        tier_hit = pc.take(vals, idx)
        result = pc.if_else(pc.is_valid(result), result, tier_hit)
    result = pc.fill_null(result, default)
    if vocabulary is not None:
        out_vals = set(pc.unique(result).to_pylist())
        bad = out_vals - set(vocabulary) - {default}
        if bad:
            raise ValueError(f"classified values outside vocabulary: {sorted(bad)}")
    return result
