"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on sf0.001. ``queries()`` exposes
one callable per implemented operator/pipeline (SURVEY.md §2); each takes an
``sf_dir`` and returns a Dataset / DataFrame / Table. ``oracle_sql()`` gives
the DuckDB-equivalent SQL for each — generated from the SAME config objects
the Ray stages use (``multiomics_biocypher_kg_ray/oracle*.py``); queries with
no SQL-expressible semantics (LSH-seeded ANN, bit-level SimHash) are omitted
from ``oracle_sql()`` → rows-only check.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from multiomics_biocypher_kg_ray.pipelines.kg import build_kg
from multiomics_biocypher_kg_ray.pipelines.queries import registry
from multiomics_biocypher_kg_ray.sources.transcripts import transcripts_dataset


def _tune() -> None:
    """Session-level Ray Data tuning for the driver's sf-scale runs (block
    split counts only — never ray.init/shutdown, which the driver owns)."""
    import ray

    if ray.is_initialized():
        from multiomics_biocypher_kg_ray.tuning import tune_context_for_small_data

        tune_context_for_small_data()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full KG build; returns the
    deduplicated edge table (src, pred, dst, weight, evidence)."""
    _tune()
    res = build_kg(transcripts_dataset("/root/testdata/sf0.001"))
    return res.edges


def queries() -> dict[str, Callable[[str], Any]]:
    _tune()
    return {name: fn for name, (fn, _) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in registry().items() if sql is not None}
