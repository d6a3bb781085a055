"""Deterministic synthetic data generators (seeded; no external data).

Produces the FIXTURES.md tables at any scale:

- T1 ``images``  — the primary Lance/Parquet-style table per
  BASELINE.json input_hint: (image_id, bytes, w, h, fmt, caption, phash).
  lat/lon derive from phash (geo.phash_to_latlon); a configurable share
  of rows is squeezed into a few HOT cells to exercise salting.
- T2 ``polygons`` — admin-style rings (convex fans + rectangles).
- T3 ``streets``  — polylines for the nearest-street join.
- T4 ``fences`` / T5 ``fence_events`` — geofence circles + trajectories.

Everything is a pure function of (row index, seed) via splitmix64 bit
mixing, so generation is order-independent, parallelizable, and
reproducible across processes — the property checkpoint/resume tests
rely on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import codecs, geo

WORD_POOL = [
    "jalan", "kebun", "binatang", "taman", "monumen", "nasional", "raya",
    "pasar", "kantor", "masjid", "gereja", "stasiun", "terminal", "bandara",
    "universitas", "sekolah", "rumah", "sakit", "hotel", "museum", "dunia",
    "fantasi", "ragunan", "harapan", "sentosa", "indah", "baru", "lama",
    "utara", "selatan", "timur", "barat", "tengah", "pusat", "agung",
]


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constant set), vectorized."""
    z = np.asarray(x).astype(np.uint64)
    z = (z + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(1)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _captions(h: np.ndarray) -> list[str]:
    nwords = 2 + (h % np.uint64(5)).astype(np.int64)  # 2..6 words
    out = []
    pool = len(WORD_POOL)
    for i in range(len(h)):
        hh = int(h[i])
        words = [WORD_POOL[(hh >> (7 * j)) % pool] for j in range(nwords[i])]
        out.append(" ".join(words))
    return out


# three HOT cells (dense urban clusters) for skew exercising
HOT_CENTERS = [(-6.2, 106.8), (-7.25, 112.75), (1.35, 103.82)]  # Jakarta/Surabaya/SG
HOT_SHARE = 0.25


def latlon_to_phash(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Inverse of geo.phash_to_latlon (quantized)."""
    hi = np.clip(((lat + 90.0) / 180.0 * 4294967296.0), 0, 2**32 - 1).astype(np.uint64)
    lo = np.clip(((lon + 180.0) / 360.0 * 4294967296.0), 0, 2**32 - 1).astype(np.uint64)
    return ((hi << np.uint64(32)) | lo).view(np.int64)


def images_batch(indices: np.ndarray, seed: int = 42, img_side: int = 8) -> pa.Table:
    """Generate rows of the T1 images table for the given row indices."""
    idx = np.asarray(indices, dtype=np.uint64)
    h1 = mix64(idx + np.uint64(seed) * np.uint64(0x1000003))
    h2 = mix64(h1)
    h3 = mix64(h2)

    # --- geo key: HOT_SHARE of rows cluster tightly around hot centers
    u = (h2 % np.uint64(10_000)).astype(np.float64) / 10_000.0
    hot = u < HOT_SHARE
    which = (h2 >> np.uint64(17)) % np.uint64(len(HOT_CENTERS))
    base_lat = (h1 % np.uint64(1_800_000)).astype(np.float64) / 10_000.0 - 90.0
    base_lon = ((h1 >> np.uint64(21)) % np.uint64(3_600_000)).astype(np.float64) / 10_000.0 - 180.0
    jit_lat = ((h3 % np.uint64(2000)).astype(np.float64) / 1000.0 - 1.0) * 0.05
    jit_lon = (((h3 >> np.uint64(13)) % np.uint64(2000)).astype(np.float64) / 1000.0 - 1.0) * 0.05
    hot_lat = np.array([c[0] for c in HOT_CENTERS])[which.astype(np.int64)]
    hot_lon = np.array([c[1] for c in HOT_CENTERS])[which.astype(np.int64)]
    lat = np.where(hot, hot_lat + jit_lat, base_lat)
    lon = np.where(hot, hot_lon + jit_lon, base_lon)
    phash = latlon_to_phash(lat, lon)

    fmt = np.where((h3 % np.uint64(3)) == 0, "jpeg", "png")
    captions = _captions(h2)

    # --- tiny deterministic RGB images: index-parameterized gradients
    side = img_side
    yy, xx = np.mgrid[0:side, 0:side].astype(np.uint16)
    blobs, ws, hs = [], [], []
    for i in range(len(idx)):
        b = int(h3[i])
        r = ((xx * ((b & 7) + 1) + (b & 0xFF)) % 256).astype(np.uint8)
        g = ((yy * (((b >> 3) & 7) + 1) + ((b >> 8) & 0xFF)) % 256).astype(np.uint8)
        bl = (((xx + yy) * (((b >> 6) & 7) + 1) + ((b >> 16) & 0xFF)) % 256).astype(np.uint8)
        rgb = np.stack([r, g, bl], axis=-1)
        blobs.append(codecs.encode(rgb, str(fmt[i])))
        ws.append(side)
        hs.append(side)

    return pa.table(
        {
            "image_id": pa.array([f"img{int(i):010d}" for i in idx], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmt.tolist(), pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phash, pa.int64()),
        }
    )


def images_dataset(n: int, seed: int = 42, parallelism: int = -1):
    """Distributed deterministic generation: ray.data.range -> map_batches."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(
        lambda b: images_batch(b["id"], seed=seed),
        batch_format="numpy",
        batch_size=4096,
    )


def images_from_keys(keys: np.ndarray, img_side: int = 8) -> pa.Table:
    """T1-schema image rows derived from int64 table keys with
    SQL-MIRRORABLE math (no 64-bit mixing): pixel (x=col, y=row)

        r = (key*3 + x*7  + y*11) % 256
        g = (key*5 + x*13 + y*3 ) % 256
        b = (key*7 + x*11 + y*5 ) % 256

    geo key: phash = latlon_to_phash(point_from_key(key)) — the same
    +0.5/100 derivation the DuckDB oracles reproduce, through the
    phash 2^-32 quantization.  Payload is REAL PNG (codecs.encode), so
    a pipeline that decodes these proves the codec end-to-end against a
    pure-SQL pixel-math oracle that never touches the codec."""
    k = np.asarray(keys, dtype=np.int64)
    lat, lon = geo.point_from_key(k)
    phash = latlon_to_phash(lat, lon)
    side = img_side
    yy, xx = np.mgrid[0:side, 0:side]
    blobs = []
    for kk in k.tolist():
        r = ((kk * 3 + xx * 7 + yy * 11) % 256).astype(np.uint8)
        g = ((kk * 5 + xx * 13 + yy * 3) % 256).astype(np.uint8)
        b = ((kk * 7 + xx * 11 + yy * 5) % 256).astype(np.uint8)
        blobs.append(codecs.encode(np.stack([r, g, b], axis=-1), "png"))
    n = len(k)
    return pa.table(
        {
            "image_id": pa.array([f"img{kk:010d}" for kk in k.tolist()], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([side] * n, pa.int32()),
            "h": pa.array([side] * n, pa.int32()),
            "fmt": pa.array(["png"] * n, pa.string()),
            "caption": pa.array([f"caption {kk}" for kk in k.tolist()], pa.string()),
            "phash": pa.array(phash, pa.int64()),
        }
    )


def videos_from_keys(keys: np.ndarray, n_frames: int = 6,
                     img_side: int = 8) -> pa.Table:
    """Video rows from int keys: `n_frames` REAL PNG frames in the
    FVID container, frame f pixel math SQL-mirrorable:

        r = (key*3 + f*17 + x*7  + y*11) % 256
        g = (key*5 + f*13 + x*13 + y*3 ) % 256
        b = (key*7 + f*19 + x*11 + y*5 ) % 256
    """
    k = np.asarray(keys, dtype=np.int64)
    side = img_side
    yy, xx = np.mgrid[0:side, 0:side]
    blobs = []
    for kk in k.tolist():
        frames = []
        for f in range(n_frames):
            r = ((kk * 3 + f * 17 + xx * 7 + yy * 11) % 256).astype(np.uint8)
            g = ((kk * 5 + f * 13 + xx * 13 + yy * 3) % 256).astype(np.uint8)
            b = ((kk * 7 + f * 19 + xx * 11 + yy * 5) % 256).astype(np.uint8)
            frames.append(codecs.png_encode(np.stack([r, g, b], axis=-1)))
        blobs.append(codecs.video_pack(frames))
    n = len(k)
    return pa.table(
        {
            "video_id": pa.array([f"vid{kk:010d}" for kk in k.tolist()], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
            "fmt": pa.array(["fvid/png"] * n, pa.string()),
            "caption": pa.array([f"clip {kk}" for kk in k.tolist()], pa.string()),
        }
    )


def audio_from_keys(keys: np.ndarray, n_samples: int = 1024) -> pa.Table:
    """PCM16 audio rows from int keys, sample math SQL-mirrorable:
    s[t] = (key*31 + t*7) % 2048 - 1024."""
    k = np.asarray(keys, dtype=np.int64)
    t = np.arange(n_samples, dtype=np.int64)
    blobs = []
    for kk in k.tolist():
        samples = ((kk * 31 + t * 7) % 2048 - 1024).astype(np.int16)
        blobs.append(codecs.pcm16_encode(samples))
    n = len(k)
    return pa.table(
        {
            "audio_id": pa.array([f"aud{kk:010d}" for kk in k.tolist()], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "n_samples": pa.array([n_samples] * n, pa.int32()),
            "fmt": pa.array(["pcm16le"] * n, pa.string()),
        }
    )


def polygons_table(n_polygons: int = 64, seed: int = 42) -> pa.Table:
    """T2 admin polygons: convex fans around seeded centers, plus a few
    world-tiling rectangles so every point matches >=1 polygon."""
    rng = np.random.default_rng(seed)
    rows = {"polygon_id": [], "province": [], "district": [], "sub_district": [],
            "village": [], "postal_code": [], "ring": []}
    pid = 0

    def add(ring_pts):
        rows["polygon_id"].append(pid)
        rows["province"].append(f"Province{pid % 7}")
        rows["district"].append(f"District{pid % 13}")
        rows["sub_district"].append(f"SubDistrict{pid % 17}")
        rows["village"].append(f"Village{pid}")
        rows["postal_code"].append(f"{10000 + pid}")
        rows["ring"].append([{"lat": float(a), "lon": float(o)} for a, o in ring_pts])

    # coarse 5x5 world rectangles (match the nation-rect oracle layout)
    for n in range(25):
        r, c = n % 5, n // 5
        lat0, lon0 = r * 36.0 - 90.0, c * 72.0 - 180.0
        lat1, lon1 = lat0 + 38.0, lon0 + 74.0
        add([(lat0, lon0), (lat0, lon1), (lat1, lon1), (lat1, lon0), (lat0, lon0)])
        pid += 1

    for _ in range(max(0, n_polygons - 25)):
        clat = rng.uniform(-60, 60)
        clon = rng.uniform(-170, 170)
        k = rng.integers(5, 12)
        angles = np.sort(rng.uniform(0, 2 * np.pi, k))
        radii = rng.uniform(0.5, 4.0, k)
        pts = [(clat + r * np.sin(a), clon + r * np.cos(a)) for a, r in zip(angles, radii)]
        pts.append(pts[0])
        add(pts)
        pid += 1

    ring_type = pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))
    return pa.table(
        {
            "polygon_id": pa.array(rows["polygon_id"], pa.int64()),
            "province": pa.array(rows["province"]),
            "district": pa.array(rows["district"]),
            "sub_district": pa.array(rows["sub_district"]),
            "village": pa.array(rows["village"]),
            "postal_code": pa.array(rows["postal_code"]),
            "ring": pa.array(rows["ring"], ring_type),
        }
    )


ROAD_CLASSES = [
    "motorway", "trunk", "primary", "secondary", "tertiary", "unclassified",
    "residential", "motorway_link", "trunk_link", "primary_link",
    "secondary_link", "tertiary_link", "living_street", "service",
]


def streets_table(n_streets: int = 200, seed: int = 43) -> pa.Table:
    """T3 street polylines, 2-5 vertices each."""
    rng = np.random.default_rng(seed)
    ids, names, classes, prios, geoms = [], [], [], [], []
    for i in range(n_streets):
        nseg = rng.integers(2, 6)
        lat = rng.uniform(-60, 60)
        lon = rng.uniform(-170, 170)
        pts = [(lat, lon)]
        for _ in range(nseg - 1):
            lat += rng.uniform(-0.05, 0.05)
            lon += rng.uniform(-0.05, 0.05)
            pts.append((lat, lon))
        ids.append(i)
        names.append(f"jalan {WORD_POOL[i % len(WORD_POOL)]} {i}")
        classes.append(ROAD_CLASSES[i % len(ROAD_CLASSES)])
        prios.append(int(100 - 5 * (i % len(ROAD_CLASSES))))
        geoms.append([{"lat": float(a), "lon": float(o)} for a, o in pts])
    geom_type = pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))
    return pa.table(
        {
            "street_id": pa.array(ids, pa.int64()),
            "name": pa.array(names),
            "road_class": pa.array(classes),
            "priority": pa.array(prios, pa.int32()),
            "geom": pa.array(geoms, geom_type),
        }
    )


def fences_table(n_fences: int = 20, seed: int = 44) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "fence_name": pa.array(["fleet"] * n_fences),
            "key": pa.array([f"fence{i}" for i in range(n_fences)]),
            "lat": pa.array(rng.uniform(-60, 60, n_fences)),
            "lon": pa.array(rng.uniform(-170, 170, n_fences)),
            "radius_km": pa.array(rng.uniform(50, 500, n_fences)),
        }
    )


def spell_errors_lines(words: list[str] | None = None, seed: int = 46) -> list[str]:
    """Deterministic "correct: err1, err2" spell-error corpus in the
    reference's file format (spell-errors.txt; parser
    spell_corrector.go:57-107).  Typos: deletion, adjacent swap,
    substitution, insertion."""
    rng = np.random.default_rng(seed)
    words = [w for w in (words or WORD_POOL) if len(w) >= 3]
    lines = []
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    for w in words:
        errs = []
        i = int(rng.integers(0, len(w)))
        errs.append(w[:i] + w[i + 1 :])  # deletion
        if len(w) >= 2:
            j = int(rng.integers(0, len(w) - 1))
            errs.append(w[:j] + w[j + 1] + w[j] + w[j + 2 :])  # transposition
        k = int(rng.integers(0, len(w)))
        c = alphabet[int(rng.integers(0, 26))]
        errs.append(w[:k] + c + w[k + 1 :])  # substitution
        m = int(rng.integers(0, len(w) + 1))
        c2 = alphabet[int(rng.integers(0, 26))]
        errs.append(w[:m] + c2 + w[m:])  # insertion
        errs = [e for e in dict.fromkeys(errs) if e and e != w]
        lines.append(f"{w}: {', '.join(errs)}")
    return lines


def fence_events_table(fences: pa.Table, n_points: int = 10, steps: int = 30,
                       seed: int = 45) -> pa.Table:
    """T5 trajectories scripted through/around the fences so every
    transition type occurs (INSIDE/OUTSIDE/ENTER/EXIT/CROSS)."""
    rng = np.random.default_rng(seed)
    f_lat = fences["lat"].to_numpy()
    f_lon = fences["lon"].to_numpy()
    seqs, pids, lats, lons = [], [], [], []
    seq = 0
    for p in range(n_points):
        fi = p % len(f_lat)
        # walk from far outside, through the fence center, out the other side
        t = np.linspace(-3.0, 3.0, steps)
        bearing = rng.uniform(0, 360)
        dlat = np.cos(np.radians(bearing))
        dlon = np.sin(np.radians(bearing))
        for s in range(steps):
            seqs.append(seq)
            pids.append(f"veh{p}")
            lats.append(float(f_lat[fi] + t[s] * dlat * 2.0 + rng.uniform(-0.1, 0.1)))
            lons.append(float(f_lon[fi] + t[s] * dlon * 2.0 + rng.uniform(-0.1, 0.1)))
            seq += 1
    return pa.table(
        {
            "seq": pa.array(seqs, pa.int64()),
            "point_id": pa.array(pids),
            "lat": pa.array(lats, pa.float64()),
            "lon": pa.array(lons, pa.float64()),
        }
    )
