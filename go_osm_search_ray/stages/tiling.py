"""Tile (cell) assignment + salted cell aggregation.

This is the engine's spatial partitioning substrate — the role the
reference's R-tree plays (rtree.go:168-205): instead of a shared tree,
every row gets a grid cell key and wide operations shuffle on it.

Skew: geodata clusters (urban hot cells).  `salted_tile_counts` shows
the canonical two-phase pattern — partial per-batch combine (which
already collapses hot keys within each block) followed by a small
groupby over partials; `add_salt` exposes explicit salting for
`map_groups`-style per-group work where partials don't apply.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import geo


def derive_phash_latlon(batch: pa.Table) -> pa.Table:
    """phash -> (lat, lon) geo-key columns (north_star derivation)."""
    lat, lon = geo.phash_to_latlon(batch["phash"].to_numpy())
    return batch.append_column("lat", pa.array(lat, pa.float64())).append_column(
        "lon", pa.array(lon, pa.float64())
    )


def derive_key_latlon(key_col: str, mult_lat: int = 9973, mult_lon: int = 7919):
    """Batch fn adding (lat, lon) from an int key column — the
    SQL-mirrorable derivation used by the DuckDB oracles."""

    def fn(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy().astype(np.int64)
        lat = (((k * mult_lat) % 18000).astype(np.float64) + 0.5) / 100.0 - 90.0
        lon = (((k * mult_lon) % 36000).astype(np.float64) + 0.5) / 100.0 - 180.0
        return batch.append_column("lat", pa.array(lat, pa.float64())).append_column(
            "lon", pa.array(lon, pa.float64())
        )

    return fn


def assign_tiles(res: int = geo.DEFAULT_TILE_RES, lat_col="lat", lon_col="lon",
                 out_col="tile_id"):
    """Batch fn adding the grid cell id column (the "tile assignment")."""

    def fn(batch: pa.Table) -> pa.Table:
        t = geo.tile_id(batch[lat_col].to_numpy(), batch[lon_col].to_numpy(), res)
        return batch.append_column(out_col, pa.array(t, pa.int64()))

    return fn


def add_salt(n_salt: int, key_col: str = "tile_id", id_col: str | None = None,
             out_col: str = "salt"):
    """Batch fn adding salt = hash(id) % n_salt for hot-key splitting.

    Use when a per-group computation (map_groups) would serialize on a
    hot cell: group by (key, salt), combine the n_salt partials after.
    """

    def fn(batch: pa.Table) -> pa.Table:
        if id_col is None:
            s = np.arange(batch.num_rows, dtype=np.int64) % n_salt
        else:
            ids = batch[id_col]
            if pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type):
                h = np.array([hash_str(x) for x in ids.to_pylist()], dtype=np.int64)
            else:
                h = ids.to_numpy().astype(np.int64)
            s = np.abs(h) % n_salt
        return batch.append_column(out_col, pa.array(s, pa.int64()))

    return fn


def hash_str(s: str) -> int:
    """Deterministic 63-bit string hash (FNV-1a), process-independent."""
    h = 1469598103934665603
    for b in s.encode():
        h = ((h ^ b) * 1099511628211) & 0x7FFFFFFFFFFFFFFF
    return h


def partial_tile_counts(batch: pa.Table, key_col: str = "tile_id") -> pa.Table:
    """Per-batch combiner: one (tile, partial_count) row per distinct tile.

    Collapses hot cells before the shuffle — the groupby that follows
    moves O(distinct tiles per block) rows instead of O(rows).
    """
    vc = batch[key_col].value_counts()
    return pa.table(
        {
            key_col: vc.field("values"),
            "partial": vc.field("counts").cast(pa.int64()),
        }
    )


def salted_tile_counts(ds, key_col: str = "tile_id", combine="driver"):
    """Skew-safe exact per-tile counts: partial per-batch combine (which
    collapses hot cells inside each block) -> small final combine.

    combine="driver" is deliberate here — the key space is PROVABLY
    bounded by the grid (4^res cells, 16k at res 7), the one case the
    driver combine is for (see stages/agg.py).  Pass "shuffle" for
    resolutions where 4^res stops being driver-sized (res >= ~12)."""
    from .agg import two_phase_agg

    def partial(b):
        vc = b[key_col].value_counts()
        import pandas as pd

        return pd.DataFrame({key_col: vc.index.to_numpy(),
                             "n": vc.to_numpy().astype(np.int64)})

    return two_phase_agg(ds, partial, [key_col], ["n"], combine=combine)
