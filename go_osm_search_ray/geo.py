"""Vectorized geospatial kernels (numpy), mirroring the reference's scalar math.

Reference formulas reimplemented 1:1 (so golden tests match row-for-row):

- haversine km        -> /root/reference/pkg/datastructure/distance.go:19-28
- winding-number PIP  -> /root/reference/pkg/geo/geometry.go:90-126
  (on-boundary counts as inside, geometry.go:107-110)
- destination point   -> /root/reference/pkg/geo/geometry.go:131-155
- circle contains     -> /root/reference/pkg/datastructure/circle.go:40-42
- line-circle cross   -> /root/reference/pkg/datastructure/circle.go:54-96
  (equirectangular projection, meters, quadratic discriminant)
- great-circle midpoint -> /root/reference/pkg/geo/geometry.go:67-80

The tile grid replaces the reference's R-tree as the spatial index: a
2^res x 2^res row-major lat/lon grid; cell id = y * 2^res + x.  It is
deliberately SQL-expressible so DuckDB oracles can recompute it.

All functions are vectorized over numpy arrays and are the single
source of truth used by every Ray stage.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0
EARTH_RADIUS_M = 6371007.0  # reference distance.go:7

# ---------------------------------------------------------------------------
# distances


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km (reference distance.go:19-28)."""
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    a = (1 - np.cos(lat1 - lat2)) / 2.0 + np.cos(lat1) * np.cos(lat2) * (
        1 - np.cos(lon1 - lon2)
    ) / 2.0
    return EARTH_RADIUS_KM * 2.0 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def hav_matrix(lat_a, lon_a, lat_b, lon_b):
    """Pairwise haversine "a" term as an (len_a, len_b) matrix WITHOUT
    per-pair trig: cos(x-y) expands to outer products of per-point
    sin/cos, so the matrix is 4 rank-1 updates (BLAS) + elementwise.

    Monotone in distance: argsort/threshold on `a` == on distance
    (dist = 2R asin(sqrt(clip(a)))), so candidate selection can happen
    on `a` and the exact `haversine_km` formula is re-evaluated only on
    the selected pairs (keeping emitted distances bit-identical to the
    scalar formula used by the SQL oracles).
    """
    la = np.radians(np.asarray(lat_a, dtype=np.float64))
    lo = np.radians(np.asarray(lon_a, dtype=np.float64))
    lb = np.radians(np.asarray(lat_b, dtype=np.float64))
    ob = np.radians(np.asarray(lon_b, dtype=np.float64))
    # identity: hav(theta) = (1 - cos(theta))/2 and cos(theta) is the
    # dot product of the 3-D unit vectors — ONE (n,3)@(3,m) BLAS matmul
    # and two in-place passes, instead of several full-matrix
    # temporaries (this matters: selection matrices are the hot path)
    va = np.stack([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)],
                  axis=1)
    vb = np.stack([np.cos(lb) * np.cos(ob), np.cos(lb) * np.sin(ob), np.sin(lb)],
                  axis=0)
    out = va @ vb
    out *= -0.5
    out += 0.5
    return out


def hav_of_km(dist_km):
    """Haversine "a" value equivalent to a km distance (for thresholds
    against hav_matrix)."""
    x = np.sin(np.asarray(dist_km, dtype=np.float64) / (2.0 * EARTH_RADIUS_KM))
    return x * x


def great_circle_midpoint(lat1, lon1, lat2, lon2):
    """Midpoint along the great circle (reference geometry.go:67-80)."""
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    bx = np.cos(lat2) * np.cos(lon2 - lon1)
    by = np.cos(lat2) * np.sin(lon2 - lon1)
    lat_m = np.arctan2(
        np.sin(lat1) + np.sin(lat2),
        np.sqrt((np.cos(lat1) + bx) ** 2 + by**2),
    )
    lon_m = lon1 + np.arctan2(by, np.cos(lat1) + bx)
    return np.degrees(lat_m), np.degrees(lon_m)


def destination_point(lat, lon, bearing_deg, dist_km):
    """Destination along a great circle (reference geometry.go:131-155)."""
    dr = np.asarray(dist_km, dtype=np.float64) / EARTH_RADIUS_KM
    brg = np.radians(np.asarray(bearing_deg, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon, dtype=np.float64))
    lat2 = np.arcsin(np.sin(lat1) * np.cos(dr) + np.cos(lat1) * np.sin(dr) * np.cos(brg))
    lon2 = lon1 + np.arctan2(
        np.sin(brg) * np.sin(dr) * np.cos(lat1),
        np.cos(dr) - np.sin(lat1) * np.sin(lat2),
    )
    lon2 = np.mod(lon2 + 3 * np.pi, 2 * np.pi) - np.pi
    return np.degrees(lat2), np.degrees(lon2)


# ---------------------------------------------------------------------------
# tile grid ("H3/S2 role": spatial partition key).  SQL-expressible:
#   x = least(greatest(floor((lon+180)/360*2^res),0),2^res-1)
#   y = least(greatest(floor((lat+90)/180*2^res),0),2^res-1)
#   tile = y*2^res + x

DEFAULT_TILE_RES = 7


def tile_xy(lat, lon, res=DEFAULT_TILE_RES):
    n = 1 << res
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    return x, y


def tile_id(lat, lon, res=DEFAULT_TILE_RES):
    """Row-major cell id on a 2^res x 2^res lat/lon grid."""
    x, y = tile_xy(lat, lon, res)
    return y * (1 << res) + x


def tile_parent(tile, res, parent_res):
    """Hierarchical coarsening: drop (res - parent_res) bits per axis."""
    tile = np.asarray(tile, dtype=np.int64)
    n = 1 << res
    x, y = tile % n, tile // n
    shift = res - parent_res
    return (y >> shift) * (1 << parent_res) + (x >> shift)


def tile_bounds(tile, res=DEFAULT_TILE_RES):
    """(lat_min, lat_max, lon_min, lon_max) of a cell."""
    tile = np.asarray(tile, dtype=np.int64)
    n = 1 << res
    x, y = tile % n, tile // n
    dlat, dlon = 180.0 / n, 360.0 / n
    return (-90.0 + y * dlat, -90.0 + (y + 1) * dlat, -180.0 + x * dlon, -180.0 + (x + 1) * dlon)


def tile_ring(tile, res=DEFAULT_TILE_RES, radius=1):
    """Neighbor cells within `radius` grid steps (Chebyshev ring incl. self).

    The kNN candidate-gather key (replaces the reference's incremental
    R-tree traversal, rtree.go:685-723).  Longitude wraps; latitude clamps.
    Returns a 2-D int64 array (len(tile), (2*radius+1)^2).
    """
    tile = np.atleast_1d(np.asarray(tile, dtype=np.int64))
    n = 1 << res
    x, y = tile % n, tile // n
    offs = np.arange(-radius, radius + 1)
    ox, oy = np.meshgrid(offs, offs, indexing="ij")
    ox, oy = ox.ravel(), oy.ravel()
    nx = (x[:, None] + ox[None, :]) % n
    ny = np.clip(y[:, None] + oy[None, :], 0, n - 1)
    return ny * n + nx


def cells_for_radius_km(lat, res, radius_km):
    """Grid-step radius needed so a km radius around a point at `lat` is covered.

    The worst-case longitude compression inside the circle is at the
    latitude furthest from the equator the circle can REACH (|lat| +
    radius), not at the query's own latitude — a query at lat 77 with a
    1500 km radius must cover cells near lat 89 where a degree of
    longitude is ~50x shorter.  When the circle reaches the pole the
    covering degenerates to a full-longitude wrap (callers clamp the
    returned ring radius to n/2, which wraps)."""
    n = 1 << res
    km_per_deg = 111.19492664455873  # km per degree latitude (R=6371)
    dlat_km = 180.0 / n * km_per_deg
    lat_worst = min(89.999, abs(float(lat)) + radius_km / km_per_deg)
    coslat = max(1e-9, float(np.cos(np.radians(lat_worst))))
    dlon_km = 360.0 / n * km_per_deg * coslat
    r = radius_km / min(dlat_km, dlon_km)
    return int(min(np.ceil(r), n))  # n steps of longitude = full wrap


# ---------------------------------------------------------------------------
# point in polygon (winding number; on-segment bbox test = inside)


def point_in_polygon(lat, lon, ring_lat, ring_lon):
    """Vectorized winding-number PIP for many points vs ONE closed ring.

    Mirrors reference geometry.go:90-126 exactly:
    - the "on segment" check is an axis-aligned bbox test per segment
      (geometry.go:94-102) and short-circuits to inside;
    - up-crossing counted when seg_lat[i] <= p < seg_lat[i+1] and point
      left of the edge; down-crossing symmetric.

    ring_lat/ring_lon must be closed (first == last).  Returns bool array.
    """
    p_lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    p_lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    a_lat = np.asarray(ring_lat[:-1], dtype=np.float64)[:, None]
    a_lon = np.asarray(ring_lon[:-1], dtype=np.float64)[:, None]
    b_lat = np.asarray(ring_lat[1:], dtype=np.float64)[:, None]
    b_lon = np.asarray(ring_lon[1:], dtype=np.float64)[:, None]

    on_seg = (
        (p_lon[None, :] >= np.minimum(a_lon, b_lon))
        & (p_lon[None, :] <= np.maximum(a_lon, b_lon))
        & (p_lat[None, :] >= np.minimum(a_lat, b_lat))
        & (p_lat[None, :] <= np.maximum(a_lat, b_lat))
    ).any(axis=0)

    cross = (b_lon - a_lon) * (p_lat[None, :] - a_lat) - (
        p_lon[None, :] - a_lon
    ) * (b_lat - a_lat)
    up = (a_lat <= p_lat[None, :]) & (b_lat > p_lat[None, :]) & (cross > 0)
    down = (a_lat > p_lat[None, :]) & (b_lat <= p_lat[None, :]) & (cross < 0)
    wn = up.sum(axis=0).astype(np.int64) - down.sum(axis=0).astype(np.int64)
    return on_seg | (wn != 0)


def ring_bbox(ring_lat, ring_lon):
    return (
        float(np.min(ring_lat)),
        float(np.max(ring_lat)),
        float(np.min(ring_lon)),
        float(np.max(ring_lon)),
    )


def ring_covering_tiles(ring_lat, ring_lon, res=DEFAULT_TILE_RES):
    """All grid cells intersecting the ring's bbox (conservative covering)."""
    lat0, lat1, lon0, lon1 = ring_bbox(ring_lat, ring_lon)
    n = 1 << res
    x0, y0 = tile_xy(np.array([lat0]), np.array([lon0]), res)
    x1, y1 = tile_xy(np.array([lat1]), np.array([lon1]), res)
    xs = np.arange(x0[0], x1[0] + 1)
    ys = np.arange(y0[0], y1[0] + 1)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return (gy.ravel() * n + gx.ravel()).astype(np.int64)


# ---------------------------------------------------------------------------
# circles (geofences)


def circle_contains(center_lat, center_lon, radius_km, lat, lon):
    """haversine(center, p) <= r (reference circle.go:40-42)."""
    return haversine_km(center_lat, center_lon, lat, lon) <= radius_km


def line_circle_intersect(center_lat, center_lon, radius_km, lat1, lon1, lat2, lon2):
    """Segment-vs-circle test (reference circle.go:54-96), vectorized.

    Equirectangular projection at the circle center's latitude, meters;
    quadratic in the segment parameter t; intersect iff a root lies in
    [0, 1].  All inputs broadcast together.
    """
    c_lat = np.radians(np.asarray(center_lat, dtype=np.float64))
    c_lon = np.radians(np.asarray(center_lon, dtype=np.float64))
    r_m = np.asarray(radius_km, dtype=np.float64) * 1000.0

    def proj(p_lat, p_lon):
        return p_lat * EARTH_RADIUS_M, p_lon * EARTH_RADIUS_M * np.cos(c_lat)

    a_lat, a_lon = proj(np.radians(np.asarray(lat1, dtype=np.float64)),
                        np.radians(np.asarray(lon1, dtype=np.float64)))
    b_lat, b_lon = proj(np.radians(np.asarray(lat2, dtype=np.float64)),
                        np.radians(np.asarray(lon2, dtype=np.float64)))
    cc_lat, cc_lon = proj(c_lat, c_lon)

    v_lat, v_lon = a_lat - cc_lat, a_lon - cc_lon
    u_lat, u_lon = b_lat - a_lat, b_lon - a_lon

    alpha = u_lat * u_lat + u_lon * u_lon
    beta = u_lat * v_lat + u_lon * v_lon
    gamma = v_lat * v_lat + v_lon * v_lon - r_m * r_m

    disc = beta * beta - alpha * gamma
    with np.errstate(invalid="ignore", divide="ignore"):
        sq = np.sqrt(np.maximum(disc, 0.0))
        t1 = (-beta + sq) / alpha
        t2 = (-beta - sq) / alpha
    hit1 = (t1 >= 0) & (t1 <= 1)
    hit2 = (t2 >= 0) & (t2 <= 1)
    return (disc >= 0) & (alpha > 0) & (hit1 | hit2)


# ---------------------------------------------------------------------------
# point -> segment projection (reverse geocoding / nearest-street join)


def project_point_to_segment(p_lat, p_lon, a_lat, a_lon, b_lat, b_lon):
    """GREAT-CIRCLE projection of P onto segment AB, clamped to the arc
    — the spherical analog of the reference's S2 chord projection
    (geometry.go:171-184), consistent with the haversine metric used
    everywhere else (closes the round-3 planar/S2 divergence note).

    Unit-sphere math: n = A x B is the great-circle normal; the
    projection is Q = normalize(P - (P.n̂)n̂); Q lies ON the arc iff
    (A x Q).n̂ >= 0 and (Q x B).n̂ >= 0, else the nearest ENDPOINT
    (larger P-dot, i.e. smaller chord == smaller haversine) wins.
    Degenerate segments (A == B, so n == 0) project to A.  Fully
    vectorized and broadcasting; mirrored expression-for-expression by
    the DuckDB oracle (queries.sql_gc_project_ctes)."""
    rad = np.radians
    plat, plon = rad(np.asarray(p_lat, np.float64)), rad(np.asarray(p_lon, np.float64))
    alat, alon = rad(np.asarray(a_lat, np.float64)), rad(np.asarray(a_lon, np.float64))
    blat, blon = rad(np.asarray(b_lat, np.float64)), rad(np.asarray(b_lon, np.float64))
    px, py, pz = np.cos(plat) * np.cos(plon), np.cos(plat) * np.sin(plon), np.sin(plat)
    ax, ay, az = np.cos(alat) * np.cos(alon), np.cos(alat) * np.sin(alon), np.sin(alat)
    bx, by, bz = np.cos(blat) * np.cos(blon), np.cos(blat) * np.sin(blon), np.sin(blat)
    nx, ny, nz = ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx
    nn = np.sqrt(nx * nx + ny * ny + nz * nz)
    with np.errstate(invalid="ignore", divide="ignore"):
        nxu, nyu, nzu = nx / nn, ny / nn, nz / nn
        dot = px * nxu + py * nyu + pz * nzu
        qx, qy, qz = px - dot * nxu, py - dot * nyu, pz - dot * nzu
        qn = np.sqrt(qx * qx + qy * qy + qz * qz)
        qxu, qyu, qzu = qx / qn, qy / qn, qz / qn
        t1 = ((ay * qzu - az * qyu) * nxu + (az * qxu - ax * qzu) * nyu
              + (ax * qyu - ay * qxu) * nzu)
        t2 = ((qyu * bz - qzu * by) * nxu + (qzu * bx - qxu * bz) * nyu
              + (qxu * by - qyu * bx) * nzu)
    on_arc = (nn > 0) & (qn > 0) & (t1 >= 0) & (t2 >= 0)
    on_arc &= np.isfinite(t1) & np.isfinite(t2)
    use_a = (px * ax + py * ay + pz * az) >= (px * bx + py * by + pz * bz)
    q_lat = np.degrees(np.arcsin(np.clip(np.where(on_arc, qzu, 0.0), -1.0, 1.0)))
    q_lon = np.degrees(np.arctan2(np.where(on_arc, qyu, 0.0),
                                  np.where(on_arc, qxu, 1.0)))
    a_lat_b = np.broadcast_to(np.asarray(a_lat, np.float64), on_arc.shape)
    a_lon_b = np.broadcast_to(np.asarray(a_lon, np.float64), on_arc.shape)
    b_lat_b = np.broadcast_to(np.asarray(b_lat, np.float64), on_arc.shape)
    b_lon_b = np.broadcast_to(np.asarray(b_lon, np.float64), on_arc.shape)
    end_lat = np.where(use_a, a_lat_b, b_lat_b)
    end_lon = np.where(use_a, a_lon_b, b_lon_b)
    return (np.where(on_arc, q_lat, end_lat),
            np.where(on_arc, q_lon, end_lon))


# ---------------------------------------------------------------------------
# deterministic key -> point derivation (shared with the DuckDB oracles)
#
# SQL equivalent:
#   lat = (CAST((k*9973) % 18000 AS DOUBLE) + 0.5)/100.0 - 90.0
#   lon = (CAST((k*7919) % 36000 AS DOUBLE) + 0.5)/100.0 - 180.0
# Keys must be non-negative and < ~9e14 so k*9973 fits in int64 without
# overflow in either engine.

def point_from_key(key):
    """Deterministic pseudo-random-looking (lat, lon) from an int64 key."""
    k = np.asarray(key, dtype=np.int64)
    lat = ((k * 9973) % 18000).astype(np.float64)
    lon = ((k * 7919) % 36000).astype(np.float64)
    return (lat + 0.5) / 100.0 - 90.0, (lon + 0.5) / 100.0 - 180.0


# phash bit-split -> lat/lon for the image table (north_star: "phash-derived
# geo-keys").  Upper 32 bits -> lat, lower 32 -> lon, quantized.

def phash_to_latlon(phash):
    h = np.asarray(phash).astype(np.uint64)
    hi = (h >> np.uint64(32)).astype(np.float64)
    lo = (h & np.uint64(0xFFFFFFFF)).astype(np.float64)
    lat = hi / 4294967296.0 * 180.0 - 90.0
    lon = lo / 4294967296.0 * 360.0 - 180.0
    return lat, lon


def bbox_around_point(lat, lon, radius_km):
    """±radius bbox via destination points at bearings 45 and 225 degrees
    (reference indexer.go:488-494)."""
    lat_ne, lon_ne = destination_point(lat, lon, 45.0, radius_km)
    lat_sw, lon_sw = destination_point(lat, lon, 225.0, radius_km)
    return (
        np.minimum(lat_sw, lat_ne),
        np.maximum(lat_sw, lat_ne),
        np.minimum(lon_sw, lon_ne),
        np.maximum(lon_sw, lon_ne),
    )
