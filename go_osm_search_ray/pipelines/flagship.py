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

PARTITION_RES = 2  # 4x4 = 16 output partitions (coarse parent of tile_id);
# hive writes emit files-per-task x partitions, so keep this modest —
# resume granularity stays per-partition either way


def tile_and_join(images_ds, polygons: pa.Table, res: int = geo.DEFAULT_TILE_RES,
                  concurrency=None, include_ahash: bool = False):
    """images Dataset -> + (lat, lon, tile_id, part, polygon_id, region
    meta [, ahash]).  include_ahash adds the decode -> perceptual-hash
    stage (stages/images.py) — the multimodal leg of the headline
    pipeline; it also proves the payload decodes after every stage."""

    def derive(batch: pa.Table) -> pa.Table:
        batch = tiling.derive_phash_latlon(batch)
        batch = tiling.assign_tiles(res)(batch)
        part = geo.tile_parent(batch["tile_id"].to_numpy(), res, PARTITION_RES)
        return batch.append_column("part", pa.array(part, pa.int64()))

    ds = images_ds
    if include_ahash:
        from ..stages.images import AverageHash

        ds = ds.map_batches(AverageHash(), batch_format="pyarrow", batch_size=2048)
    ds = ds.map_batches(derive, batch_format="pyarrow")
    return pip.pip_join(ds, polygons, tile_res=res, concurrency=concurrency)


def run_flagship(images_ds, polygons: pa.Table, out_dir: str,
                 res: int = geo.DEFAULT_TILE_RES, concurrency=None,
                 input_files: list[str] | None = None,
                 include_ahash: bool = False,
                 collect_stats: str = "full") -> dict:
    joined = tile_and_join(images_ds, polygons, res=res, concurrency=concurrency,
                           include_ahash=include_ahash)
    return manifest.write_partitioned(joined, out_dir, "part",
                                      input_files=input_files,
                                      collect_stats=collect_stats)


def run_flagship_synth(n_images: int, out_dir: str, seed: int = 42,
                       concurrency=4) -> dict:
    images = synth.images_dataset(n_images, seed=seed)
    polygons = synth.polygons_table(64, seed=seed)
    return run_flagship(images, polygons, out_dir, concurrency=concurrency,
                        input_files=[f"synth://images?n={n_images}&seed={seed}"])
