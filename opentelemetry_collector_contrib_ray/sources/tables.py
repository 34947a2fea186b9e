"""Metadata-clean Parquet table reads.

The driver's testdata parquet files were written from pandas and carry a
``b'pandas'`` schema-metadata blob. ``hash(pa.Schema)`` raises on that
metadata dict, which makes Ray Data's schema-dedup fast path
(``transform_pyarrow.unify_schemas``: ``set(schemas)``) log a
"Failed to hash the schemas" warning on every reduce/concat — hundreds of
lines per sweep. Passing an explicit metadata-free schema to
``read_parquet`` keeps every downstream block hashable and the driver log
quiet, and costs nothing (one footer read the driver does anyway).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def read_table(path: str, *, columns: list[str] | None = None,
               **kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with a metadata-free explicit schema.

    ``path`` is a parquet file or a directory of same-schema part files
    (the schema comes from the first part's footer). ``columns`` prunes
    the read as usual; the schema passed to Ray is projected to match.
    """
    import os
    probe = path
    if os.path.isdir(path):
        probe = os.path.join(path, sorted(os.listdir(path))[0])
    schema = pq.read_schema(probe).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=schema,
                                 **kwargs)
