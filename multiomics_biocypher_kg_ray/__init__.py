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
