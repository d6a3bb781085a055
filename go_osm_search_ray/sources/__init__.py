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
    """Column-pruned read of one testdata table as a ray.data.Dataset.

    The testdata tables are SINGLE-file, single-row-group parquet, for
    which Ray's default plan is one read task streaming dozens of tiny
    blocks under backpressure — every downstream stage serializes
    behind it (measured 2.0 s vs 0.28 s for a 2.7 MB file).  Explicit
    override_num_blocks restores read parallelism; real deployments
    with many files / row groups should NOT set it and let the
    autoscaler choose."""
    import ray.data as rd

    kwargs.setdefault("override_num_blocks", 16)
    return rd.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kwargs
    )


def read_table_auto(path: str, columns=None, **kwargs):
    """Format-dispatched Dataset reader: .parquet / .csv / .json(l).

    Parquet projects columns at the read (pushdown); CSV and JSONL have
    no projection pushdown in this Ray version, so the column prune
    happens in the first map stage — rows still stream, but the bytes
    leave storage: prefer parquet/lance for wide tables at scale.
    """
    import ray.data as rd

    lower = path.lower()
    if lower.endswith(".parquet"):
        return rd.read_parquet(path, columns=columns, **kwargs)
    if lower.endswith(".osm"):
        from .osm import read_osm

        ds = read_osm(path, kind=kwargs.pop("kind", "nodes"))
    elif lower.endswith(".csv"):
        ds = rd.read_csv(path, **kwargs)
    elif lower.endswith(".json") or lower.endswith(".jsonl"):
        ds = rd.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported table format: {path}")
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def read_table_arrow(sf_dir: str, name: str, columns=None):
    """Small side tables: read directly to an Arrow table (driver side)."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
