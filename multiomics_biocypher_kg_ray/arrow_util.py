"""Small Arrow interop helpers shared by the stages."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def pa_from_pandas(df: "pd.DataFrame") -> pa.Table:
    """``pa.Table.from_pandas(preserve_index=False)`` with the pandas schema
    metadata STRIPPED.

    The auto-attached ``b'pandas'`` metadata makes ``hash(schema)`` raise
    ``unhashable type: 'dict'``, which defeats Ray's hash-shuffle
    schema-deduplication fast path and spams "Failed to hash the schemas"
    warnings on every aggregator. Every table fed into a shuffle must carry a
    hashable (metadata-free) schema, so all stage code converts pandas →
    Arrow through this helper, never ``from_pandas`` directly.
    """
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def floor_div_i64(col: "pa.Array | pa.ChunkedArray", divisor: int) -> pa.Array:
    """Floor (toward −∞) integer division of a non-null int64 Arrow column.

    ``pc.divide`` truncates toward zero, while numpy's ``//`` and DuckDB's
    integer ``//``/``floor`` conventions floor — for negative values (e.g.
    pre-epoch timestamps) a point bucketed with one convention and an
    interval exploded with the other can land in DIFFERENT buckets and a
    qualifying pair is silently dropped. Every time/bucket division in the
    package routes through this single floor-convention helper so engine,
    interval-explode, and SQL-oracle math agree for any sign.
    """
    import numpy as np

    vals = col.to_numpy(zero_copy_only=False)
    return pa.array(vals // np.int64(divisor), type=pa.int64())


def strip_meta(batch: pa.Table) -> pa.Table:
    """Zero-copy schema-metadata strip, applied right after ``read_parquet``
    (fuses with the read task): Parquet files written by pandas carry the
    same unhashable ``b'pandas'`` metadata — see ``pa_from_pandas``."""
    return batch.replace_schema_metadata(None)


def read_parquet_clean(path: str, columns: list[str] | None = None, **kw):
    """``ray.data.read_parquet`` with hashable (metadata-free) block schemas.

    The clean schema is passed INTO the read so blocks are born metadata-free
    (pandas-written Parquet carries unhashable ``b'pandas'`` schema metadata,
    and the read operator itself logs "Failed to hash the schemas" while
    deduping its output bundles — a post-read strip is too late). The strip
    map stays as a belt-and-braces pass for multi-file reads with mixed
    schemas, where ``schema=`` cannot be derived from one footer."""
    import os

    import ray.data

    if "schema" not in kw and os.path.isfile(path):
        import pyarrow.parquet as pq

        file_schema = pq.read_schema(path)
        fields = (
            [file_schema.field(c) for c in columns]
            if columns is not None
            else list(file_schema)
        )
        kw["schema"] = pa.schema(fields)  # new schema ⇒ no metadata
    return ray.data.read_parquet(path, columns=columns, **kw).map_batches(
        strip_meta, batch_format="pyarrow"
    )
