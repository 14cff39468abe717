"""Tiered entity-linking stage (broadcast alias index + stateful actor pool).

Reference analog: ``resolve_row`` multi-pass resolution against the three-tier
``MappingData`` index — tier-1 exact → tier-1 case-insensitive → heuristic
candidates → tier-2/3 singleton; ambiguous = no match
(``multiomics_kg/utils/gene_id_utils.py:214-273,478-622``), with the
case-insensitive index built lazily (``:240-273``) and heuristic candidate
generation (strip ``*``/``+`` footnotes, zero-pad retry — ``:459-475,835-845``).

Ray shape: the alias index is broadcast once (``ray.put``); each linker actor
``ray.get``s it in ``__init__`` and memoizes resolutions per alias string, so
per-batch work is one dict probe per *unique* mention (``np.unique``), not per
row. Resolution priority must stay in lockstep with ``oracle._resolve_cols``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

from ..config import (
    METHOD_AMBIGUOUS,
    METHOD_HEURISTIC,
    METHOD_TIER1_CI,
    METHOD_TIER1_CONFLICT,
    METHOD_TIER1_EXACT,
    METHOD_TIER2_SINGLETON,
    METHOD_UNRESOLVED,
    AliasDictionary,
)
from ..state.broadcast import fetch

_ZERO_PAD_RE = re.compile(r"^([A-Za-z]+[_-]?)(\d+)$")


@dataclass
class Resolution:
    entity_id: str | None
    method: str


class AliasIndex:
    """Immutable tiered alias index; cheap to pickle into the object store."""

    def __init__(self, d: AliasDictionary) -> None:
        self.specific = dict(d.specific_lookup)
        self.multi = {k: tuple(v) for k, v in d.multi_lookup.items()}
        self.conflicts = set(d.conflicts)
        self._ci: dict[str, str | None] | None = None  # lazily built (ST1)

    def _ci_index(self) -> dict[str, str | None]:
        if self._ci is None:
            ci: dict[str, str | None] = {}
            for alias, canonical in self.specific.items():
                low = alias.lower()
                # CI collisions are ambiguous → None marker (never guessed)
                ci[low] = None if low in ci and ci[low] != canonical else canonical
            self._ci = ci
        return self._ci

    def _heuristic_candidates(self, alias: str) -> list[str]:
        """Footnote-strip and zero-pad variants (gene_id_utils.py:459-475)."""
        cands = []
        stripped = alias.rstrip("*+").strip()
        if stripped != alias:
            cands.append(stripped)
        m = _ZERO_PAD_RE.match(stripped or alias)
        if m:
            prefix, digits = m.groups()
            for width in (4, 5, 6):
                if len(digits) < width:
                    cands.append(f"{prefix}{digits.zfill(width)}")
            if digits.lstrip("0") and digits.lstrip("0") != digits:
                cands.append(f"{prefix}{digits.lstrip('0')}")
        return cands

    def resolve(self, alias: str) -> Resolution:
        """Priority: conflict → tier1 exact → tier1 CI → heuristic →
        tier2 singleton → ambiguous → unresolved."""
        if alias in self.conflicts:
            return Resolution(None, METHOD_TIER1_CONFLICT)
        hit = self.specific.get(alias)
        if hit is not None:
            return Resolution(hit, METHOD_TIER1_EXACT)
        ci_hit = self._ci_index().get(alias.lower())
        if ci_hit is not None:
            return Resolution(ci_hit, METHOD_TIER1_CI)
        for cand in self._heuristic_candidates(alias):
            if cand in self.conflicts:
                continue
            h = self.specific.get(cand)
            if h is not None:
                return Resolution(h, METHOD_HEURISTIC)
        cands = self.multi.get(alias)
        if cands is not None:
            if len(cands) == 1:
                return Resolution(cands[0], METHOD_TIER2_SINGLETON)
            return Resolution(None, METHOD_AMBIGUOUS)
        return Resolution(None, METHOD_UNRESOLVED)


class EntityLinker:
    """Stage callable: adds {subj,obj}_id / {subj,obj}_method columns.

    Hot path is Arrow-native: ``pc.unique`` collapses the batch to its
    distinct aliases (C++), the tiered Python ``resolve`` runs once per
    NEW distinct alias (memoized across batches), and results fan back out
    through ``pc.index_in`` + ``pc.take`` — zero Python-object string
    materialization per row (an earlier ``np.unique``-over-object-dtype
    version spent most of its CPU constructing and sort-comparing Python
    strings)."""

    def __init__(self, index_ref) -> None:
        self.index: AliasIndex = fetch(index_ref)
        self.memo: dict[str, Resolution] = {}

    def _resolve_array(self, arr: pa.ChunkedArray | pa.Array):
        import pyarrow.compute as pc

        uniq = pc.unique(arr if isinstance(arr, pa.Array) else arr.combine_chunks())
        ids: list[str | None] = []
        methods: list[str] = []
        memo = self.memo
        resolve = self.index.resolve
        for alias in uniq.to_pylist():
            if alias is None:
                ids.append(None)
                methods.append(METHOD_UNRESOLVED)
                continue
            r = memo.get(alias)
            if r is None:
                r = memo[alias] = resolve(alias)
            ids.append(r.entity_id)
            methods.append(r.method)
        inv = pc.index_in(arr, value_set=uniq)
        return (
            pc.take(pa.array(ids, pa.string()), inv),
            pc.take(pa.array(methods, pa.string()), inv),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        s_id, s_m = self._resolve_array(batch.column("subj_text"))
        o_id, o_m = self._resolve_array(batch.column("obj_text"))
        return (
            batch.append_column("subj_id", s_id)
            .append_column("subj_method", s_m)
            .append_column("obj_id", o_id)
            .append_column("obj_method", o_m)
        )


# Process-level linker memo keyed by the broadcast ObjectRef — task-based
# map_batches reuses warm workers, so the index is fetched/indexed once per
# worker process (see stages/extract.py for the tasks-vs-actors rationale).
_LINKER_CACHE: dict = {}


def _link_fn(batch: pa.Table, index_ref) -> pa.Table:
    key = index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref)
    lk = _LINKER_CACHE.get(key)
    if lk is None:
        lk = _LINKER_CACHE[key] = EntityLinker(index_ref)
    return lk(batch)


def link_mentions(
    mentions: "ray.data.Dataset",
    index_ref,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 16384,
) -> "ray.data.Dataset":
    """Default TASK-based (alias index is broadcast + memoized per worker);
    pass ``concurrency`` to force an actor pool for genuinely heavy indexes."""
    if concurrency is not None:
        return mentions.map_batches(
            EntityLinker,
            fn_constructor_kwargs={"index_ref": index_ref},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    return mentions.map_batches(
        _link_fn,
        fn_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


UNRESOLVED_REASONS = (METHOD_UNRESOLVED, METHOD_AMBIGUOUS, METHOD_TIER1_CONFLICT)


def resolution_stats(linked: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-method resolution statistics over both mention sides:
    (method, n_mentions, n_distinct_aliases) — the distributed analog of the
    reference's per-id_type diagnostic counts
    (``gene_id_graph.py:345-383`` ``build_diagnostic_report``).

    Combiner shape: per-batch (method, alias) distinct + counts, then one
    keyed shuffle over (method, alias) partials, then the tiny per-method
    rollup."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        parts = []
        for side in ("subj", "obj"):
            parts.append(
                pa.Table.from_arrays(
                    [batch.column(f"{side}_method"), batch.column(f"{side}_text")],
                    names=["method", "alias"],
                )
            )
        t = pa.concat_tables(parts)
        g = t.group_by(["method", "alias"]).aggregate([([], "count_all")])
        return g.rename_columns(["method", "alias", "n"])

    # alias-cardinality groups → Arrow-native (stages/fastagg.py)
    from .fastagg import sorted_grouped_agg

    per_alias = sorted_grouped_agg(
        linked.map_batches(partial, batch_format="pyarrow"),
        ["method", "alias"],
        [("n", "sum")],
        out_names=["n_mentions"],
    )
    return (
        per_alias.groupby("method")
        .aggregate(
            Sum("n_mentions", alias_name="n_mentions"),
            Count(alias_name="n_distinct_aliases"),
        )
        .map_batches(
            lambda t: t.select(["method", "n_mentions", "n_distinct_aliases"]),
            batch_format="pyarrow",
        )
    )


def canonicalization_report(
    linked: "ray.data.Dataset", aliases
) -> dict:
    """First-class canonicalization diagnostics (the ``gene_id_graph.py:
    345-409`` report as tables, not log lines):

    - ``method_stats``: Dataset (method, n_mentions, n_distinct_aliases);
    - ``conflicts``: pa.Table (alias, candidates) — the tier-1 conflict
      dictionary, recorded and never guessed;
    - ``warnings``: list[str] — reclassification hints computed from the
      observed method mix (ambiguous-heavy dictionaries, any conflict hits).
    """
    stats_ds = resolution_stats(linked).materialize()
    stats = {
        r["method"]: (int(r["n_mentions"]), int(r["n_distinct_aliases"]))
        for r in stats_ds.take_all()
    }
    total = sum(n for n, _ in stats.values()) or 1
    warnings: list[str] = []
    n_conf = stats.get(METHOD_TIER1_CONFLICT, (0, 0))[0]
    if n_conf:
        warnings.append(
            f"[CONFLICT] {n_conf} mention(s) hit tier-1 conflict aliases — "
            "check dictionary quality."
        )
    n_amb = stats.get(METHOD_AMBIGUOUS, (0, 0))[0]
    if n_amb * 100 > total * 10:
        warnings.append(
            f"[RECLASSIFY?] {n_amb * 100 // total}% of mentions are ambiguous "
            "multi-candidate aliases — consider promoting frequent ones to tier 1."
        )
    conflicts = pa.table(
        {
            "alias": sorted(aliases.conflicts),
            "candidates": [
                "|".join(aliases.conflicts[a]) for a in sorted(aliases.conflicts)
            ],
        }
    )
    return {"method_stats": stats_ds, "conflicts": conflicts, "warnings": warnings}


def unresolved_report(linked: "ray.data.Dataset") -> "ray.data.Dataset":
    """First-class diagnostics table (resolve_paper_ids.py:590-656 analog):
    one row per unresolved mention side with its reason."""

    def to_report(batch: pa.Table) -> pa.Table:
        out = []
        for side in ("subj", "obj"):
            method = batch.column(f"{side}_method")
            mask = pa.compute.is_in(method, value_set=pa.array(UNRESOLVED_REASONS))
            sub = batch.filter(mask)
            out.append(
                pa.Table.from_arrays(
                    [
                        sub.column("conv_id"),
                        sub.column("turn_idx"),
                        sub.column(f"{side}_text"),
                        sub.column(f"{side}_method"),
                    ],
                    names=["conv_id", "turn_idx", "raw_mention", "reason"],
                )
            )
        return pa.concat_tables(out)

    return linked.map_batches(to_report, batch_format="pyarrow")
