"""Small shared Arrow helpers."""

from __future__ import annotations

import pyarrow as pa


def nometa(t: pa.Table) -> pa.Table:
    """Drop table-level schema metadata (parquet files written by pandas
    carry a ``pandas`` metadata dict that survives filter/append_column;
    pyarrow's ``hash(schema)`` then raises "unhashable type: 'dict'" inside
    Ray's shuffle-reduce schema dedup, spamming warnings). Apply to any
    table about to enter a groupby/sort/repartition shuffle."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t
