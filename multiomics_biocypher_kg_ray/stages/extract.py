"""Rule+pattern triple extraction stage.

Reference analog: the paperconfig-driven per-row extraction in
``multiomics_kg/adapters/omics_adapter.py:634-867`` (config-declared column
mappings → emitted edge tuples) and the defline regex extractors
(``multiomics_kg/utils/gene_id_utils.py:360-456``) — re-expressed as a single
stateful ``map_batches`` stage: regexes are compiled ONCE per actor in
``__init__`` and applied per batch, emitting 0..N mention rows per turn
(flat-map via a fresh Arrow table, no per-row Python dicts).

Scale notes: stateless w.r.t. data (pure function of the batch), so the stage
pipelines under the streaming executor with backpressure; the only per-row
Python is the unavoidable ``regex.findall`` C call per text value.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

from ..config import DEFAULT_RULES, ExtractionRule

MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("rule_id", pa.string()),
        ("pred", pa.string()),
        ("subj_text", pa.string()),
        ("obj_text", pa.string()),
    ]
)


class TripleExtractor:
    """Callable-class stage for ``map_batches`` (actor pool).

    One actor compiles all rule patterns once; ``__call__`` applies every rule
    to the batch. Matches are non-overlapping left-to-right (Python ``re`` —
    same semantics as the DuckDB/RE2 oracle for the supported pattern subset).
    """

    def __init__(self, rules: tuple[ExtractionRule, ...] = DEFAULT_RULES) -> None:
        from ..functions.transforms import compile_chain

        self.rules = [
            (r, re.compile(r.pattern), compile_chain(r.transforms) if r.transforms else None)
            for r in rules
        ]
        for r, pat, _ in self.rules:
            if pat.groups != 2:
                raise ValueError(
                    f"rule {r.rule_id!r}: pattern must have exactly 2 groups (subj, obj)"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
        tidx = batch.column("turn_idx").to_numpy(zero_copy_only=False)
        role = batch.column("role").to_numpy(zero_copy_only=False)
        text = batch.column("text").to_pylist()

        o_conv: list[str] = []
        o_tidx: list[int] = []
        o_rule: list[str] = []
        o_pred: list[str] = []
        o_subj: list[str] = []
        o_obj: list[str] = []
        for rule, pat, chain in self.rules:
            role_ok = np.isin(role, rule.applies_role)
            findall = pat.findall
            for i in np.flatnonzero(role_ok):
                t = text[i]
                if not t:
                    continue
                for subj, obj in findall(t):
                    if chain is not None:
                        subj, obj = chain(subj), chain(obj)
                    o_conv.append(conv[i])
                    o_tidx.append(int(tidx[i]))
                    o_rule.append(rule.rule_id)
                    o_pred.append(rule.predicate)
                    o_subj.append(subj)
                    o_obj.append(obj)

        return pa.Table.from_arrays(
            [
                pa.array(o_conv, pa.string()),
                pa.array(o_tidx, pa.int32()),
                pa.array(o_rule, pa.string()),
                pa.array(o_pred, pa.string()),
                pa.array(o_subj, pa.string()),
                pa.array(o_obj, pa.string()),
            ],
            schema=MENTION_SCHEMA,
        )


def extract_mentions(
    transcripts: "ray.data.Dataset",
    rules: tuple[ExtractionRule, ...] = DEFAULT_RULES,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """transcripts → mention rows (conv_id, turn_idx, rule_id, pred, subj, obj)."""
    from ..tuning import default_actor_pool

    if concurrency is None:
        concurrency = default_actor_pool()
    return transcripts.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={"rules": rules},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
