"""Golden-vector tests for the geo kernels, lifted from the reference's own
unit tests (see file:line cites per case)."""

import numpy as np
import pytest

from go_osm_search_ray import geo


class TestHaversine:
    # reference pkg/datastructure/distance_test.go:9-49
    CASES = [
        (-7.557155997491524, 110.77170252731288, -7.550209300671982, 110.78942094938256, 2.1),
        (-7.546196863318374, 110.7775170972345, -7.550209300671982, 110.78942094938256, 1.38),
        (-7.759889166547908, 110.36689459108496, -7.760335932763678, 110.37671195413539, 1.08),
        (-7.700002453207869, 110.37712514761436, -7.760335932763678, 110.37671195413539, 6.7),
    ]

    def test_golden(self):
        for la1, lo1, la2, lo2, want in self.CASES:
            got = geo.haversine_km(la1, lo1, la2, lo2)
            assert abs(got - want) < 0.1

    def test_vectorized_matches_scalar(self):
        arr = np.array(self.CASES)
        got = geo.haversine_km(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3])
        np.testing.assert_allclose(got, arr[:, 4], atol=0.1)

    def test_zero(self):
        assert geo.haversine_km(1.0, 2.0, 1.0, 2.0) == 0.0


class TestCircle:
    def test_contains(self):
        # reference pkg/datastructure/circle_test.go:9-33
        c = (-7.5680354571554025, 110.81169121664644, 1.0)
        assert geo.circle_contains(*c, -7.568015281898911, 110.81444088141711)
        assert geo.circle_contains(*c, -7.572317914672147, 110.81118863253744)
        assert not geo.circle_contains(*c, -7.559435821190102, 110.80760986341456)
        assert not geo.circle_contains(*c, -7.55888752969384, 110.81268429828974)

    def test_line_circle_intersect(self):
        # reference pkg/datastructure/circle_test.go:36-81
        c = (-7.559940429364888, 110.78890921003895, 1.0)
        b = (-7.564498664733181, 110.8035880873389)
        assert geo.line_circle_intersect(*c, -7.5577436088673435, 110.78127272655398, *b)
        assert geo.line_circle_intersect(*c, -7.554174552910251, 110.76387434819563, *b)
        assert not geo.line_circle_intersect(
            *c, -7.54644310927346, 110.77781694597039, -7.552212073890144, 110.79527493164542
        )
        assert not geo.line_circle_intersect(
            *c, -7.556780022123904, 110.80638234773562, -7.571822225335152, 110.80379309018404
        )
        assert not geo.line_circle_intersect(
            *c, -7.54419186409313, 110.77112430380268, -7.561352173450039, 110.7642426738976
        )

    def test_vectorized(self):
        got = geo.line_circle_intersect(
            -7.559940429364888,
            110.78890921003895,
            1.0,
            np.array([-7.5577436088673435, -7.54644310927346]),
            np.array([110.78127272655398, 110.77781694597039]),
            np.array([-7.564498664733181, -7.552212073890144]),
            np.array([110.8035880873389, 110.79527493164542]),
        )
        assert got.tolist() == [True, False]


class TestPIP:
    # the polygon of reference pkg/geo/geometry_test.go:9-43 (closed below)
    RING = [
        (-7.8236786093625454, 110.32093322132368),
        (-7.829740180582352, 110.35293804508764),
        (-7.826476268571158, 110.4094171458476),
        (-7.7821777971150485, 110.4098878050206),
        (-7.7821777971150485, 110.43012614945958),
        (-7.763058061783706, 110.43012614945958),
        (-7.742538353844481, 110.34211288410864),
        (-7.8236786093625454, 110.32093322132368),
    ]

    def _ring(self):
        r = np.array(self.RING)
        return r[:, 0], r[:, 1]

    def test_inside_outside(self):
        rlat, rlon = self._ring()
        assert geo.point_in_polygon(-7.786841015007818, 110.35482068177964, rlat, rlon)[0]
        assert not geo.point_in_polygon(-7.709038594647804, 110.5904486305967, rlat, rlon)[0]

    def test_on_vertex_is_inside(self):
        # on-boundary counts as inside (reference geometry.go:107-110)
        rlat, rlon = self._ring()
        assert geo.point_in_polygon(self.RING[0][0], self.RING[0][1], rlat, rlon)[0]

    def test_square(self):
        rlat = np.array([0.0, 0.0, 10.0, 10.0, 0.0])
        rlon = np.array([0.0, 10.0, 10.0, 0.0, 0.0])
        lat = np.array([5.0, 5.0, -1.0, 0.0, 10.0, 9.999])
        lon = np.array([5.0, 15.0, 5.0, 0.0, 10.0, 0.001])
        got = geo.point_in_polygon(lat, lon, rlat, rlon)
        assert got.tolist() == [True, False, False, True, True, True]

    def test_concave(self):
        # U-shape: notch points are outside
        rlat = np.array([0, 0, 10, 10, 2, 2, 10, 10, 0], dtype=float)
        rlon = np.array([0, 8, 8, 6, 6, 2, 2, 0, 0], dtype=float)
        got = geo.point_in_polygon(
            np.array([5.0, 1.0, 5.0]), np.array([4.0, 4.0, 7.0]), rlat, rlon
        )
        assert got.tolist() == [False, True, True]


class TestTiles:
    def test_corners(self):
        res = 3
        n = 1 << res
        assert geo.tile_id(-90.0, -180.0, res) == 0
        assert geo.tile_id(89.999, 179.999, res) == n * n - 1
        # exact top edge clamps into the last row
        assert geo.tile_id(90.0, 180.0, res) == n * n - 1

    def test_bounds_roundtrip(self):
        rng = np.random.default_rng(42)
        lat = rng.uniform(-90, 90, 1000)
        lon = rng.uniform(-180, 180, 1000)
        t = geo.tile_id(lat, lon, 7)
        lat0, lat1, lon0, lon1 = geo.tile_bounds(t, 7)
        assert ((lat >= lat0) & (lat <= lat1)).all()
        assert ((lon >= lon0) & (lon <= lon1)).all()

    def test_parent(self):
        lat, lon = np.array([12.3]), np.array([45.6])
        child = geo.tile_id(lat, lon, 8)
        parent = geo.tile_parent(child, 8, 5)
        assert parent[0] == geo.tile_id(lat, lon, 5)[0]

    def test_ring_wraps(self):
        res = 3
        n = 1 << res
        t = geo.tile_id(np.array([0.0]), np.array([-179.9]), res)  # x == 0 column
        ring = geo.tile_ring(t, res, 1)[0]
        assert len(ring) == 9
        xs = ring % n
        assert (xs == n - 1).any()  # wrapped across the antimeridian

    def test_ring_contains_all_within_radius(self):
        t = geo.tile_id(np.array([10.0]), np.array([10.0]), 5)
        ring2 = set(geo.tile_ring(t, 5, 2)[0].tolist())
        ring1 = set(geo.tile_ring(t, 5, 1)[0].tolist())
        assert ring1 < ring2


class TestProjection:
    def test_project_onto_meridian(self):
        # great circle through (0,0)-(10,0) is the lon=0 meridian; the
        # projection lands ON it (lon exactly 0), near lat 5
        la, lo = geo.project_point_to_segment(5.0, 1.0, 0.0, 0.0, 10.0, 0.0)
        assert lo == 0.0
        assert abs(la - 5.0) < 0.05

    def test_projection_is_nearest_on_arc(self):
        # the returned point must beat a dense sample of the arc
        rng = np.random.default_rng(3)
        for _ in range(20):
            a = rng.uniform(-60, 60, 2)
            b = a + rng.uniform(-3, 3, 2)
            p = a + rng.uniform(-4, 4, 2)
            la, lo = geo.project_point_to_segment(
                p[0], p[1], a[0], a[1], b[0], b[1])
            d = geo.haversine_km(p[0], p[1], la, lo)

            # sample the TRUE great-circle arc by slerp of unit vectors
            def unit(lat, lon):
                lat, lon = np.radians(lat), np.radians(lon)
                return np.array([np.cos(lat) * np.cos(lon),
                                 np.cos(lat) * np.sin(lon), np.sin(lat)])

            ua, ub = unit(*a), unit(*b)
            om = np.arccos(np.clip(ua @ ub, -1, 1))
            t = np.linspace(0, 1, 2000)[:, None]
            v = (np.sin((1 - t) * om) * ua[None, :]
                 + np.sin(t * om) * ub[None, :]) / np.sin(om)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            arc_lat = np.degrees(np.arcsin(np.clip(v[:, 2], -1, 1)))
            arc_lon = np.degrees(np.arctan2(v[:, 1], v[:, 0]))
            d_arc = geo.haversine_km(p[0], p[1], arc_lat, arc_lon)
            assert d <= d_arc.min() + 1e-6

    def test_clamps(self):
        la, lo = geo.project_point_to_segment(-5.0, 1.0, 0.0, 0.0, 10.0, 0.0)
        assert (la, lo) == (0.0, 0.0)
        la, lo = geo.project_point_to_segment(15.0, 1.0, 0.0, 0.0, 10.0, 0.0)
        assert (la, lo) == (10.0, 0.0)

    def test_degenerate(self):
        la, lo = geo.project_point_to_segment(5.0, 5.0, 2.0, 2.0, 2.0, 2.0)
        assert (la, lo) == (2.0, 2.0)


class TestDerivations:
    def test_point_from_key_range(self):
        k = np.arange(0, 100000, dtype=np.int64)
        lat, lon = geo.point_from_key(k)
        assert lat.min() >= -90 and lat.max() <= 90
        assert lon.min() >= -180 and lon.max() <= 180
        # deterministic
        lat2, _ = geo.point_from_key(k)
        np.testing.assert_array_equal(lat, lat2)

    def test_point_from_key_matches_duckdb(self):
        import duckdb

        k = np.arange(1, 5000, dtype=np.int64)
        lat, lon = geo.point_from_key(k)
        got = duckdb.sql(
            "SELECT (CAST((k*9973)%18000 AS DOUBLE)+0.5)/100.0-90.0 AS lat,"
            "       (CAST((k*7919)%36000 AS DOUBLE)+0.5)/100.0-180.0 AS lon "
            "FROM range(1,5000) t(k) ORDER BY k"
        ).fetchnumpy()
        np.testing.assert_array_equal(lat, got["lat"])
        np.testing.assert_array_equal(lon, got["lon"])

    def test_tile_matches_duckdb(self):
        import duckdb

        res = 7
        n = 1 << res
        k = np.arange(1, 5000, dtype=np.int64)
        lat, lon = geo.point_from_key(k)
        t = geo.tile_id(lat, lon, res)
        got = duckdb.sql(
            f"""
            WITH p AS (
              SELECT (CAST((k*9973)%18000 AS DOUBLE)+0.5)/100.0-90.0 AS lat,
                     (CAST((k*7919)%36000 AS DOUBLE)+0.5)/100.0-180.0 AS lon
              FROM range(1,5000) t(k) ORDER BY k)
            SELECT LEAST(GREATEST(CAST(FLOOR((lat+90.0)/180.0*{n}) AS BIGINT),0),{n - 1})*{n}
                 + LEAST(GREATEST(CAST(FLOOR((lon+180.0)/360.0*{n}) AS BIGINT),0),{n - 1}) AS tile
            FROM p
            """
        ).fetchnumpy()
        np.testing.assert_array_equal(t, got["tile"])

    def test_phash_to_latlon(self):
        ph = np.array([0, -1, 2**62, 123456789], dtype=np.int64)
        lat, lon = geo.phash_to_latlon(ph)
        assert (lat >= -90).all() and (lat < 90).all()
        assert (lon >= -180).all() and (lon < 180).all()


class TestDestinationPoint:
    def test_distance_preserved(self):
        la, lo = geo.destination_point(-7.55, 110.77, 45.0, 0.4)
        d = geo.haversine_km(-7.55, 110.77, la, lo)
        assert abs(d - 0.4) < 1e-7

    def test_bbox_around_point(self):
        lat0, lat1, lon0, lon1 = geo.bbox_around_point(-7.55, 110.77, 0.4)
        assert lat0 < -7.55 < lat1
        assert lon0 < 110.77 < lon1


class TestMidpoint:
    def test_midpoint_on_meridian(self):
        la, lo = geo.great_circle_midpoint(0.0, 10.0, 10.0, 10.0)
        assert abs(la - 5.0) < 1e-6 and abs(lo - 10.0) < 1e-6
