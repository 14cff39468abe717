"""multiomics_biocypher_kg_ray — Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the *capability set* of the BioCypher ETL reference
``wosnat/multiomics_biocypher_kg`` (schema-config-driven typed node/edge
emission, rule+pattern extraction, tiered entity linking, iterative
canonicalization, deduplicated graph materialization, rollups/ranking) as
idiomatic Ray Data pipelines over zero-copy Arrow batches of Parquet
conversation-transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout
------
- ``schema``      node/edge type registry (schema_config.yaml analog)
- ``config``      extraction rules + tiered alias dictionary (paperconfig /
                  gene_id_mapping.json analogs) — single source of truth for
                  both the Ray pipeline and the DuckDB oracle SQL
- ``functions``   vectorized scalar/text function library (annotation_transforms
                  analog): sanitizers, parsers, fingerprints, minhash/simhash
- ``sources``     readers + the deterministic transcript synthesizer + graph
                  Parquet sink (BioCypher batch-writer contract analog)
- ``stages``      the operator library: extract, link, canonicalize,
                  materialize, rollups, dedup, text, similarity, relational
- ``pipelines``   end-to-end KG build with per-partition checkpoint/lineage
- ``state``       broadcast helpers (ray.put-based small-side distribution)

No function in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
caller (driver, bench.py, test fixture) owns the Ray session.
"""

__version__ = "0.1.0"


def _install_schema_hash_log_filter() -> None:
    """Drop Ray's benign "Failed to hash the schemas" warning.

    Root cause: ``hash(pa.Schema)`` raises ``unhashable type: 'dict'`` on the
    pandas metadata pandas-written Parquet files carry. Every table THIS
    package creates is metadata-free (``arrow_util.pa_from_pandas`` /
    ``read_parquet_clean``), but Ray's fused ReadParquet task unifies the raw
    input-file schemas BEFORE our strip stage can run, and the test inputs
    are read-only — so that one benign, per-read occurrence is filtered here.
    Workers import this package while deserializing our stage functions (i.e.
    before the read executes), so the filter is in place in every worker that
    runs our operators. Scoped to the exact message; everything else from
    that logger still flows.
    """
    import logging

    class _SchemaHashFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").addFilter(
        _SchemaHashFilter()
    )


_install_schema_hash_log_filter()


def _stabilize_fsspec_http() -> None:
    """Make the fsspec HTTP import race-free for concurrent Datasets.

    ``aiohttp`` is absent in this environment, so
    ``fsspec.implementations.http`` fails to import. Ray's
    ``_is_http_filesystem`` guards that with ``except ModuleNotFoundError``
    — but when several driver threads run ``read_parquet`` concurrently
    (checkpointed shards, write_graph), the racing imports can surface as a
    plain ``ImportError`` ("cannot import name 'HTTPFileSystem'…") that
    escapes Ray's guard and kills a shard. Registering a stub module once,
    at import time on the main thread, makes the lookup deterministic; the
    stub class is used only in an ``isinstance`` check, which then simply
    answers False (exactly the no-aiohttp semantics).
    """
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ModuleNotFoundError:
        import sys
        import types

        m = sys.modules.get("fsspec.implementations.http")
        if m is None:
            m = types.ModuleType("fsspec.implementations.http")
            sys.modules["fsspec.implementations.http"] = m
        if not hasattr(m, "HTTPFileSystem"):
            class _NoHTTPFileSystem:  # isinstance-only stand-in
                pass

            m.HTTPFileSystem = _NoHTTPFileSystem
    except ImportError:
        pass  # partially-imported module from a racing thread; leave it


_stabilize_fsspec_http()
