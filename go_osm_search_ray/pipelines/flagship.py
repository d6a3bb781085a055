"""Flagship pipeline (the BASELINE.md bench workload):

    read image table -> derive phash geo-keys -> tile assignment
    -> cell-keyed PIP spatial join (broadcast compiled polygons)
    -> partitioned Parquet write + per-partition lineage manifest

Everything streams; the image payload (`bytes`) rides through untouched
(per-row invariant).  The only wide op is the final partitioned write;
the PIP side is broadcast, so there is NO all-to-all shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import geo, synth
from ..stages import pip, tiling
from ..state import manifest

PARTITION_RES = 3  # 8x8 = 64 output partitions (coarse parent of tile_id)


def tile_and_join(images_ds, polygons: pa.Table, res: int = geo.DEFAULT_TILE_RES,
                  concurrency=4):
    """images Dataset -> + (lat, lon, tile_id, part, polygon_id, region meta)."""

    def derive(batch: pa.Table) -> pa.Table:
        batch = tiling.derive_phash_latlon(batch)
        batch = tiling.assign_tiles(res)(batch)
        part = geo.tile_parent(batch["tile_id"].to_numpy(), res, PARTITION_RES)
        return batch.append_column("part", pa.array(part, pa.int64()))

    ds = images_ds.map_batches(derive, batch_format="pyarrow")
    return pip.pip_join(ds, polygons, tile_res=res, concurrency=concurrency)


def run_flagship(images_ds, polygons: pa.Table, out_dir: str,
                 res: int = geo.DEFAULT_TILE_RES, concurrency=4,
                 input_files: list[str] | None = None) -> dict:
    joined = tile_and_join(images_ds, polygons, res=res, concurrency=concurrency)
    return manifest.write_partitioned(joined, out_dir, "part",
                                      input_files=input_files)


def run_flagship_synth(n_images: int, out_dir: str, seed: int = 42,
                       concurrency=4) -> dict:
    images = synth.images_dataset(n_images, seed=seed)
    polygons = synth.polygons_table(64, seed=seed)
    return run_flagship(images, polygons, out_dir, concurrency=concurrency,
                        input_files=[f"synth://images?n={n_images}&seed={seed}"])
