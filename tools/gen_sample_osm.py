"""Deterministic generator for the checked-in OSM-XML ingestion
fixture (round-5 ask #8: prove the S1/S2 reader semantics —
`pkg/geo/parse_osm.go:42-137` — on REAL-format data, not the engine's
synthetic parquet).

Writes:
  tests/data/sample.osm           — OSM XML v0.6 (nodes + ways + tags,
                                    with entity escapes, unicode names,
                                    tagless nodes, a dangling way ref)
  tests/data/sample_nodes.csv     — flattened node truth
  tests/data/sample_way_refs.csv  — (way_id, seq, node_id)
  tests/data/sample_way_tags.csv  — (way_id, highway, name)

The CSVs are the ORACLE's view of the same content (DuckDB read_csv);
value-matching the engine's XML parse against them proves the parser,
not the data.  No external data is used — the extract is synthesized
deterministically (sandbox rule), but in the real wire format.
"""

from __future__ import annotations

import csv
import hashlib
import os

N_NODES = 3000
N_WAYS = 400
REFS_PER_WAY = 6

WORDS = ["Warung", "Kopi", "Jaya", "Maju", "Sari", "Indah", "Toko",
         "Pasar", "Jalan", "Taman", "Balekambang", "Solo", "Grand",
         "Mall", "Café", "Σigma"]
AMENITIES = ["restaurant", "cafe", "school", "bank", "fuel",
             "hospital", "", "", ""]  # '' -> no amenity tag
HIGHWAYS = ["primary", "secondary", "residential", "tertiary", "", ""]


def h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def node_latlon(nid: int) -> tuple[float, float]:
    lat = -7.50 - (h(f"lat{nid}") % 200000) / 1_000_000.0   # [-7.70, -7.50]
    lon = 110.70 + (h(f"lon{nid}") % 250000) / 1_000_000.0  # [110.70, 110.95]
    return round(lat, 6), round(lon, 6)


def node_name(nid: int) -> str:
    k = h(f"name{nid}")
    if k % 3 == 0:
        return ""  # unnamed
    n_words = 1 + (k % 3)
    ws = [WORDS[(k >> (4 * i)) % len(WORDS)] for i in range(n_words)]
    name = " ".join(ws)
    if k % 11 == 0:
        name += " & Co"  # entity-escape exercise
    return name


def node_amenity(nid: int) -> str:
    return AMENITIES[h(f"am{nid}") % len(AMENITIES)]


def xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    os.makedirs(out_dir, exist_ok=True)

    nodes = []
    for i in range(N_NODES):
        nid = 1000 + i
        lat, lon = node_latlon(nid)
        nodes.append((nid, lat, lon, node_amenity(nid), node_name(nid)))

    ways, way_tags = [], []
    for w in range(N_WAYS):
        wid = 900000 + w
        k = h(f"way{w}")
        n_refs = 2 + k % (REFS_PER_WAY - 1)
        refs = [1000 + (k >> (3 * j)) % N_NODES for j in range(n_refs)]
        if w % 57 == 0:
            refs[-1] = 999_999_999  # dangling ref: reader must drop the way
        ways.append((wid, refs))
        way_tags.append((wid, HIGHWAYS[k % len(HIGHWAYS)],
                         node_name(wid) if k % 2 == 0 else ""))

    osm_path = os.path.join(out_dir, "sample.osm")
    with open(osm_path, "w", encoding="utf-8") as fh:
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        fh.write('<osm version="0.6" generator="gen_sample_osm">\n')
        fh.write('  <!-- deterministic synthetic extract; real format -->\n')
        fh.write('  <bounds minlat="-7.70" minlon="110.70" '
                 'maxlat="-7.50" maxlon="110.95"/>\n')
        for nid, lat, lon, amenity, name in nodes:
            tags = []
            if amenity:
                tags.append(("amenity", amenity))
            if name:
                tags.append(("name", name))
            if not tags:
                # self-closing, attribute order varied
                if nid % 2:
                    fh.write(f'  <node id="{nid}" lat="{lat}" lon="{lon}" '
                             f'version="1"/>\n')
                else:
                    fh.write(f'  <node lon="{lon}" lat="{lat}" id="{nid}"/>\n')
                continue
            fh.write(f'  <node id="{nid}" lat="{lat}" lon="{lon}">\n')
            for kk, vv in tags:
                fh.write(f'    <tag k="{kk}" v="{xml_escape(vv)}"/>\n')
            fh.write('  </node>\n')
        for (wid, refs), (_, highway, wname) in zip(ways, way_tags):
            fh.write(f'  <way id="{wid}">\n')
            for r in refs:
                fh.write(f'    <nd ref="{r}"/>\n')
            if highway:
                fh.write(f'    <tag k="highway" v="{highway}"/>\n')
            if wname:
                fh.write(f'    <tag k="name" v="{xml_escape(wname)}"/>\n')
            fh.write('  </way>\n')
        fh.write('</osm>\n')

    with open(os.path.join(out_dir, "sample_nodes.csv"), "w",
              encoding="utf-8", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["node_id", "lat", "lon", "amenity", "name"])
        for nid, lat, lon, amenity, name in nodes:
            w.writerow([nid, lat, lon, amenity, name])

    with open(os.path.join(out_dir, "sample_way_refs.csv"), "w",
              encoding="utf-8", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["way_id", "seq", "node_id"])
        for wid, refs in ways:
            for s, r in enumerate(refs):
                w.writerow([wid, s, r])

    with open(os.path.join(out_dir, "sample_way_tags.csv"), "w",
              encoding="utf-8", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["way_id", "highway", "name"])
        for wid, highway, wname in way_tags:
            w.writerow([wid, highway, wname])

    print(f"wrote {osm_path} ({os.path.getsize(osm_path)} bytes), "
          f"{N_NODES} nodes, {N_WAYS} ways")


if __name__ == "__main__":
    main()
