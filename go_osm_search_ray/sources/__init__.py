"""Table readers.  The "Lance table" of the design maps to Parquet here
(no lance wheel in this container); the reader API is format-agnostic so
swapping `read_parquet` for `read_lance` is a one-line change.

Replaces the reference's custom binary/gob/msgpack/bbolt artifacts
(SURVEY.md S5-S16) with columnar datasets.
"""

from __future__ import annotations

import os

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_table(sf_dir: str, name: str, columns=None, **kwargs):
    """Column-pruned read of one testdata table as a ray.data.Dataset."""
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kwargs
    )


def read_table_arrow(sf_dir: str, name: str, columns=None):
    """Small side tables: read directly to an Arrow table (driver side)."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
