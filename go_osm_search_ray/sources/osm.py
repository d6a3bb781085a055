"""OSM XML ingestion (round-5 ask #8): the reference's two-pass OSM
reader semantics — `pkg/geo/parse_osm.go:42-137` (S1 filtered entity
scan, S2 way->node ref resolution) — over the REAL OSM wire format,
not the engine's synthetic parquet.

Shape: `ray.data.read_binary_files` streams whole files to read
tasks; each file parses there (expat C parser via xml.etree) and
emits one slim arrow table per entity kind.  A planet-scale input
would be `.osm.pbf` — one task per ~8 MB PBF blob instead of per
file, same operator shape with the decoder swapped; the XML decoder
is what this container can exercise end to end (no protobuf wheel,
documented in COVERAGE.md).

Missing tags are returned as '' (the oracle mirrors with
COALESCE(col, '')).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KINDS = ("nodes", "way_refs", "way_tags")


def _parse_osm_bytes(data: bytes, kind: str) -> pa.Table:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(data)
    if kind == "nodes":
        ids, lats, lons, amenities, names = [], [], [], [], []
        for el in root.iter("node"):
            ids.append(int(el.get("id")))
            lats.append(float(el.get("lat")))
            lons.append(float(el.get("lon")))
            tags = {t.get("k"): t.get("v") for t in el.iter("tag")}
            amenities.append(tags.get("amenity", ""))
            names.append(tags.get("name", ""))
        return pa.table({
            "node_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "lat": pa.array(np.asarray(lats, dtype=np.float64)),
            "lon": pa.array(np.asarray(lons, dtype=np.float64)),
            "amenity": pa.array(amenities, pa.string()),
            "name": pa.array(names, pa.string()),
        })
    if kind == "way_refs":
        wids, seqs, refs = [], [], []
        for el in root.iter("way"):
            wid = int(el.get("id"))
            for s, nd in enumerate(el.iter("nd")):
                wids.append(wid)
                seqs.append(s)
                refs.append(int(nd.get("ref")))
        return pa.table({
            "way_id": pa.array(np.asarray(wids, dtype=np.int64)),
            "seq": pa.array(np.asarray(seqs, dtype=np.int64)),
            "node_id": pa.array(np.asarray(refs, dtype=np.int64)),
        })
    if kind == "way_tags":
        wids, highways, names = [], [], []
        for el in root.iter("way"):
            wids.append(int(el.get("id")))
            tags = {t.get("k"): t.get("v") for t in el.iter("tag")}
            highways.append(tags.get("highway", ""))
            names.append(tags.get("name", ""))
        return pa.table({
            "way_id": pa.array(np.asarray(wids, dtype=np.int64)),
            "highway": pa.array(highways, pa.string()),
            "name": pa.array(names, pa.string()),
        })
    raise ValueError(f"unknown OSM entity kind: {kind!r} (one of {_KINDS})")


def read_osm(path: str, kind: str = "nodes"):
    """OSM XML -> Dataset of one entity kind (see module docstring)."""
    import ray.data as rd

    if kind not in _KINDS:
        raise ValueError(f"unknown OSM entity kind: {kind!r} (one of {_KINDS})")

    def parse(b: pa.Table) -> pa.Table:
        tables = [_parse_osm_bytes(data.as_py(), kind) for data in b["bytes"]]
        return pa.concat_tables(tables) if tables else _parse_osm_bytes(
            b"<osm/>", kind)

    return rd.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow")
