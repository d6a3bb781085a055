"""kNN joins + reverse geocoding (reference J7/J8/K3/K4,
rtree.go:635-738 and searcher.go:402-459).

Execution model: the query side is small (it always is — queries are
requests, points are the corpus), so it is broadcast (`ray.put`) and
every point batch computes a PARTIAL top-(k+offset) per query — an
exact, shuffle-light plan: the groupby that merges partials moves only
O(n_blocks * Q * k) rows, never the corpus.  This replaces the
reference's incremental best-first R-tree traversal (Hjaltason-Samet,
rtree.go:685-723) with a combiner-style distributed argmin; both are
exact, ours parallelizes.

Memory note: each batch materializes a Q x B float64 distance matrix;
keep Q * batch_size ~ 1e7 (chunk queries above that).

Tag filter semantics mirror `NearestNeighboursRadiusFilterOSM`
(rtree.go:656-682): filter tag + dist <= radius while collecting,
offset/k slice at the end.  Tie-break: (dist, point_id) ascending.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import geo


# elements per Q x CHUNK selection tile (x8 bytes).  131072 = 1 MiB
# keeps the tile in L2/L3; benchmarked against 0.5-16 MiB on the
# sandbox host (see BASELINE.md round-2 notes)
TILE_BUDGET = 131072

# per-worker-process compiled-state cache for task-mode stages (same
# pattern as stages/pip.py): a stateless task pool reuses worker
# processes, so each process builds the broadcast state once — actor
# semantics without the per-call pool-startup latency (~1-2 s per
# query invocation on this host).  A small LRU (not a single slot): a
# pipeline that interleaves two task-mode broadcast stages in one
# worker process (e.g. knn_join + reverse_geocode) must not rebuild
# the state on every alternation.
_STATE_CACHE: dict[str, object] = {}
_STATE_CACHE_MAX = 4


def cached_state(key: str, build):
    c = _STATE_CACHE.get(key)
    if c is None:
        c = build()
        while len(_STATE_CACHE) >= _STATE_CACHE_MAX:
            _STATE_CACHE.pop(next(iter(_STATE_CACHE)))  # evict oldest
        _STATE_CACHE[key] = c
    else:
        # refresh recency (dict preserves insertion order)
        _STATE_CACHE.pop(key)
        _STATE_CACHE[key] = c
    return c


def topk_cols_exact(a: np.ndarray, n: int, sec: np.ndarray | None = None):
    """Per-row column indices of the n smallest entries with EXACT
    (value, tie-key) semantics at the boundary: argpartition fast path;
    only rows whose boundary-value ties actually straddle the cut are
    re-done with a lexsort.  Tie-key = column position by default (pass
    `sec` for an explicit per-cell key).  Membership is exact; order
    WITHIN the returned selection is arbitrary — downstream re-sorts."""
    if n >= a.shape[1]:
        return np.broadcast_to(np.arange(a.shape[1]), a.shape).copy()
    part = np.argpartition(a, n - 1, axis=1)[:, :n]
    vals = np.take_along_axis(a, part, axis=1)
    vb = vals.max(axis=1)
    tie_total = (a == vb[:, None]).sum(axis=1)
    tie_sel = (vals == vb[:, None]).sum(axis=1)
    amb = np.nonzero(tie_total != tie_sel)[0]
    if len(amb):
        s = (sec[amb] if sec is not None
             else np.broadcast_to(np.arange(a.shape[1]),
                                  (len(amb), a.shape[1])))
        part[amb] = np.lexsort((s, a[amb]), axis=-1)[:, :n]
    return part


class KNNPartial:
    """Actor-pool stage: per-batch partial top-k of corpus points
    against every broadcast query."""

    def __init__(self, queries_ref, point_id_col: str = "point_id",
                 tag_col: str | None = None):
        import ray

        q = ray.get(queries_ref)
        if isinstance(q, pa.Table):
            q = q.to_pandas()
        self.q_id = q["query_id"].to_numpy()
        self.q_lat = q["lat"].to_numpy(dtype=np.float64)
        self.q_lon = q["lon"].to_numpy(dtype=np.float64)
        self.q_keep = (
            q["k"].to_numpy(dtype=np.int64)
            + (q["offset"].to_numpy(dtype=np.int64) if "offset" in q else 0)
        )
        self.q_radius = (
            q["radius_km"].to_numpy(dtype=np.float64)
            if "radius_km" in q
            else np.full(len(q), np.nan)
        )
        self.q_feature = q["feature"].tolist() if "feature" in q else [None] * len(q)
        self.point_id_col = point_id_col
        self.tag_col = tag_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        p_lat = batch["lat"].to_numpy()
        p_lon = batch["lon"].to_numpy()
        p_id = batch[self.point_id_col].to_numpy()
        # Pre-sort the batch by point_id: array POSITION then equals the
        # id rank, so every (a, position) lexsort below is exactly the
        # oracle's (dist, point_id) tie-break — exact ties are systemic
        # here (point_from_key collides for keys differing by 36000).
        order = np.argsort(p_id, kind="stable")
        p_lat, p_lon, p_id = p_lat[order], p_lon[order], p_id[order]
        tags = (
            np.asarray(batch[self.tag_col].to_pylist())[order]
            if self.tag_col and self.tag_col in batch.column_names
            else None
        )
        # Selection runs on the haversine "a" matrix (distance-monotone)
        # computed in CACHE-SIZED point chunks — a full Q x B float64
        # matrix would thrash memory bandwidth; each Q x CHUNK tile stays
        # in L2/L3 and a running per-query top-kmax accumulator merges
        # tiles.  The exact haversine formula runs only on the final
        # (Q x kmax) winners, so emitted distances stay bit-identical to
        # the scalar formula the SQL oracles use.  The partial keeps
        # kmax = max(k+offset) for EVERY query; the driver-side finalize
        # re-sorts and trims per query.
        big = np.float64(2.0)  # sentinel > any valid hav value (<= 1)
        Q = len(self.q_id)
        kmax = min(int(self.q_keep.max()), len(p_lat))
        CHUNK = max(kmax, TILE_BUDGET // max(Q, 1))  # Q*CHUNK*8B tile
        has_r = ~np.isnan(self.q_radius)
        # inflate the approximate hav-space threshold by a few ulps so a
        # float-boundary point is never dropped HERE; the exact-distance
        # recheck below prunes the overshoot
        thr = np.where(
            has_r,
            geo.hav_of_km(np.where(has_r, self.q_radius, 1.0)) * (1 + 1e-12) + 1e-300,
            np.inf,
        )
        feat_rows = {}
        if tags is not None:
            for f in set(x for x in self.q_feature if x is not None):
                feat_rows[f] = np.array([x == f for x in self.q_feature])
        acc_a = np.full((Q, 0), big)
        acc_i = np.zeros((Q, 0), dtype=np.int64)
        for s0 in range(0, len(p_lat), CHUNK):
            s1 = min(s0 + CHUNK, len(p_lat))
            a = geo.hav_matrix(self.q_lat, self.q_lon, p_lat[s0:s1], p_lon[s0:s1])
            for f, rows in feat_rows.items():
                a[np.ix_(rows, tags[s0:s1] != f)] = big
            if has_r.any():
                np.putmask(a, a > thr[:, None], big)
            kc = min(kmax, a.shape[1])
            # exact (dist, id-rank) membership at the cut: column
            # position IS the id rank (batch pre-sorted by id);
            # argpartition fast path, lexsort only on tie-straddle rows
            t = topk_cols_exact(a, kc)
            acc_a = np.concatenate([acc_a, np.take_along_axis(a, t, axis=1)], axis=1)
            acc_i = np.concatenate([acc_i, t + s0], axis=1)
            if acc_a.shape[1] > 4 * kmax:
                t2 = topk_cols_exact(acc_a, kmax, sec=acc_i)
                acc_a = np.take_along_axis(acc_a, t2, axis=1)
                acc_i = np.take_along_axis(acc_i, t2, axis=1)
        if acc_a.shape[1] > kmax:
            t2 = topk_cols_exact(acc_a, kmax, sec=acc_i)
            acc_a = np.take_along_axis(acc_a, t2, axis=1)
            acc_i = np.take_along_axis(acc_i, t2, axis=1)
        valid = acc_a < big
        dist = geo.haversine_km(
            self.q_lat[:, None], self.q_lon[:, None],
            p_lat[acc_i], p_lon[acc_i],
        )
        # re-check the radius on the EXACT recomputed distances: a point
        # whose approximate hav-"a" value straddles the threshold must
        # not be emitted past radius_km (or the SQL oracle diverges at
        # the float boundary)
        if has_r.any():
            radius = np.where(has_r, self.q_radius, np.inf)
            valid &= dist <= radius[:, None]
        m = valid.ravel()
        out_q = [np.repeat(self.q_id, acc_a.shape[1])[m]]
        out_p = [p_id[acc_i.ravel()][m]]
        out_d = [dist.ravel()[m]]
        if not m.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    self.point_id_col: pa.array([], pa.from_numpy_dtype(p_id.dtype))
                    if p_id.dtype != object
                    else pa.array([], pa.string()),
                    "dist_km": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.point_id_col: pa.array(np.concatenate(out_p)),
                "dist_km": pa.array(np.concatenate(out_d), pa.float64()),
            }
        )


def knn_join(points_ds, queries: pa.Table, point_id_col: str = "point_id",
             tag_col: str | None = None, concurrency=(1, 4),
             batch_size: int = 8192, mode: str = "auto"):
    """points x queries -> (query_id, rank, point_id, dist_km), exact kNN.

    `queries` columns: query_id, lat, lon, k [, offset, radius_km, feature].
    rank is 1-based AFTER the offset slice.  Returns a pandas DataFrame:
    the result is inherently small (Q x k), and the per-block partial
    top-k already collapsed the corpus, so the final merge is a
    driver-side combine of partials — no shuffle.

    mode="tasks" (auto for <=100k queries): stateless task pool with a
    per-process compiled-state cache — elastic, no pool startup.
    mode="actors": explicit pool (pin big query tables once per worker).
    """
    import ray

    ref = ray.put(queries)
    if mode == "auto":
        mode = "tasks" if queries.num_rows <= 100_000 else "actors"
    if mode == "tasks":
        key = f"knn/{ref.hex()}/{point_id_col}/{tag_col}"

        def fn(batch: pa.Table) -> pa.Table:
            st = cached_state(
                key, lambda: KNNPartial(ref, point_id_col, tag_col)
            )
            return st(batch)

        partials = points_ds.map_batches(
            fn, batch_format="pyarrow", batch_size=batch_size
        )
    else:
        partials = points_ds.map_batches(
            KNNPartial,
            fn_constructor_kwargs={
                "queries_ref": ref,
                "point_id_col": point_id_col,
                "tag_col": tag_col,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    qcols = ["query_id", "k"] + (
        ["offset"] if "offset" in queries.column_names else []
    )
    qdf = queries.select(qcols).to_pandas()
    if "offset" not in qdf.columns:
        qdf["offset"] = 0
    pdf = partials.to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame(
            {"query_id": [], point_id_col: [], "dist_km": [], "rank": []}
        )
    # vectorized per-query page slice: sort once, cumcount, mask
    pdf = pdf.merge(qdf, on="query_id")
    pdf = pdf.sort_values(["query_id", "dist_km", point_id_col], kind="mergesort")
    rn = pdf.groupby("query_id", sort=False).cumcount()
    keep = (rn >= pdf["offset"]) & (rn < pdf["offset"] + pdf["k"])
    out = pdf.loc[keep, ["query_id", point_id_col, "dist_km"]].copy()
    out["rank"] = (rn[keep] - pdf.loc[keep, "offset"] + 1).astype(np.int64)
    return out.reset_index(drop=True)


def knn_cell_join(points_ds, queries_ds, radius_km: float | None, k: int,
                  res: int = 6, point_id_col: str = "point_id",
                  batch_size: int = 4096, ring_radius: int | None = None,
                  with_meta: bool = False, points_keyed: bool = False,
                  n_salt: int = 1):
    """Cell-partitioned kNN for LARGE query sides (millions of queries).

    The broadcast plan above needs the query table to fit in every
    worker; when it doesn't, co-locate by grid cell instead
    (the reference's R-tree traversal becomes data layout, SURVEY §7.3):

      1. queries explode to (cell, ...) over their radius ring
         (`geo.tile_ring`; ring radius from `cells_for_radius_km`)
      2. points keyed by their own cell
      3. groupby(cell) joins the two sides per cell bucket; each bucket
         runs a local brute top-k
      4. groupby(query_id) merges bucket partials -> exact top-k within
         `radius_km`

    Semantics = kNN with a radius bound (rtree.go:656-682); for
    UNBOUNDED kNN use `knn_cell_join_unbounded` (iterative ring
    expansion on top of this — pass `ring_radius` to pin the covering
    ring explicitly and `radius_km=None` to skip the distance filter).
    with_meta=True carries (q_lat, q_lon) through to the output rows
    (the expansion loop needs them for the guarantee test).
    Returns (query_id, rank, point_id, dist_km) — rank only when the
    radius path finalizes (ring rounds finalize in the caller).

    HOT-CELL SKEW: geodata clusters (a dense urban cell can hold a
    large fraction of the corpus), and the groupby(cell) would hand one
    task that whole cell.  n_salt > 1 splits every cell's POINT side
    into hash(point_id) % n_salt shards and replicates each query row
    to all shards of its ring cells — the group key becomes
    (cell, salt), per-group work is bounded by the shard, and the
    per-query merge of shard partials stays exact (the same combiner
    argument as the broadcast path).  Query-side replication cost is
    n_salt x ring rows — size n_salt to the hottest expected cell.
    """
    import pandas as pd

    if radius_km is None and ring_radius is None:
        raise ValueError("need radius_km or an explicit ring_radius")

    def explode_queries(b: pd.DataFrame) -> pd.DataFrame:
        lat = b["lat"].to_numpy()
        lon = b["lon"].to_numpy()
        tiles = geo.tile_id(lat, lon, res)
        rows = {"cell": [], "query_id": [], "q_lat": [], "q_lon": []}
        n_axis = 1 << res
        for i in range(len(b)):
            r = ring_radius if ring_radius is not None else min(
                geo.cells_for_radius_km(lat[i], res, radius_km), n_axis // 2
            )
            r = min(r, n_axis)
            ring = np.unique(geo.tile_ring(np.array([tiles[i]]), res, r)[0])
            rows["cell"].extend(ring.tolist())
            rows["query_id"].extend([b["query_id"].iloc[i]] * len(ring))
            rows["q_lat"].extend([lat[i]] * len(ring))
            rows["q_lon"].extend([lon[i]] * len(ring))
        return pd.DataFrame(rows)

    def key_points(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[point_id_col, "lat", "lon"]].copy()
        out["cell"] = geo.tile_id(b["lat"].to_numpy(), b["lon"].to_numpy(), res)
        return out

    q_cells = queries_ds.map_batches(explode_queries, batch_format="pandas")
    p_cells = (points_ds if points_keyed
               else points_ds.map_batches(key_points, batch_format="pandas"))

    # tag and union the two sides so one shuffle co-locates both; with
    # n_salt > 1 the points shard by id hash and queries replicate to
    # every shard (see docstring)
    def q_tag_fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(side="q", **{point_id_col: -1})
        if n_salt > 1:
            b = b.loc[b.index.repeat(n_salt)].reset_index(drop=True)
            b["salt"] = np.tile(np.arange(n_salt, dtype=np.int64),
                                len(b) // n_salt)
        else:
            b["salt"] = np.int64(0)
        return b

    def p_tag_fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(side="p", query_id=-1, q_lat=0.0, q_lon=0.0)
        if n_salt > 1:
            b["salt"] = (
                np.abs(b[point_id_col].to_numpy().astype(np.int64)) % n_salt
            )
        else:
            b["salt"] = np.int64(0)
        return b

    q_tag = q_cells.map_batches(q_tag_fn, batch_format="pandas")
    p_tag = p_cells.map_batches(p_tag_fn, batch_format="pandas")

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        qs = g[g["side"] == "q"]
        ps = g[g["side"] == "p"]
        meta_cols = (["q_lat", "q_lon"] if with_meta else [])
        empty = {"query_id": [], point_id_col: [], "dist_km": [],
                 **{c: [] for c in meta_cols}}
        if len(qs) == 0 or len(ps) == 0:
            return pd.DataFrame(empty)
        d = geo.haversine_km(
            qs["q_lat"].to_numpy()[:, None], qs["q_lon"].to_numpy()[:, None],
            ps["lat"].to_numpy()[None, :], ps["lon"].to_numpy()[None, :],
        )
        pid = ps[point_id_col].to_numpy()
        # exact (dist, point_id) tie-break at the cut, fully
        # vectorized: out-of-radius cells masked to +inf, one
        # topk_cols_exact over the whole matrix (argpartition fast
        # path; only boundary-tied rows lexsort), then the masked
        # selections filter out.  No per-query Python — a hot cell
        # with 10^5 queries is one matrix pass.
        if radius_km is not None:
            d = np.where(d <= radius_km, d, np.inf)
        cols = topk_cols_exact(d, k, sec=np.broadcast_to(pid, d.shape))
        vals = np.take_along_axis(d, cols, axis=1)
        valid = np.isfinite(vals).ravel()
        rows = np.repeat(np.arange(d.shape[0]), cols.shape[1])[valid]
        sel = cols.ravel()[valid]
        out = {"query_id": qs["query_id"].to_numpy()[rows],
               point_id_col: pid[sel],
               "dist_km": vals.ravel()[valid]}
        if with_meta:
            out["q_lat"] = qs["q_lat"].to_numpy()[rows]
            out["q_lon"] = qs["q_lon"].to_numpy()[rows]
        return pd.DataFrame(out)

    partials = (
        q_tag.union(p_tag)
        .groupby(["cell", "salt"])
        .map_groups(local_topk, batch_format="pandas")
    )
    if with_meta:
        # ring mode: the expansion loop finalizes (it needs candidate
        # counts + the guarantee test before ranking)
        return partials

    # query_id is UNBOUNDED (this is the "millions of queries" path),
    # so the merge of per-cell partials is a bucket-hash shuffle + ONE
    # vectorized dedup/sort/cumcount per bucket — never a
    # groupby(query_id) sort with per-query dispatch (the top_k_multi
    # pattern, stages/text.py)
    from .agg import bucketed_group_apply

    def finalize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["query_id", point_id_col])
        g = g.sort_values(["query_id", "dist_km", point_id_col],
                          kind="mergesort")
        rn = g.groupby("query_id", sort=False).cumcount().to_numpy()
        out = g[rn < k].copy()
        out["rank"] = (rn[rn < k] + 1).astype(np.int64)
        return out

    return bucketed_group_apply(partials, ["query_id"], finalize_bucket)


def _ring_guarantee_km(lat: np.ndarray, res: int, r: int) -> np.ndarray:
    """Largest distance D such that EVERY point within D of a query at
    `lat` is guaranteed inside the Chebyshev ring of radius r around the
    query's cell.  Lat direction: a point (r-1) full cell-heights away
    can never leave the ring; lon direction uses the worst (most
    compressed) latitude the ring itself reaches — conservative, and it
    degrades to 0 near the poles, where only a full-grid ring (r >= n)
    terminates the expansion."""
    n = 1 << res
    km = 111.19492664455873
    dlat_deg = 180.0 / n
    lat_worst = np.minimum(89.999, np.abs(lat) + (r + 1) * dlat_deg)
    dlon_km = 360.0 / n * km * np.maximum(np.cos(np.radians(lat_worst)), 0.0)
    dlat_km = dlat_deg * km
    return np.maximum(0.0, r - 1) * np.minimum(dlat_km, dlon_km)


def knn_cell_join_unbounded(points_ds, queries_ds, k: int, res: int = 6,
                            point_id_col: str = "point_id",
                            max_rounds: int = 32):
    """Unbounded-k cell-partitioned kNN — the reference's incremental
    best-first NN (rtree.go:685-723) as ITERATIVE RING EXPANSION:

      round r: gather candidates from the Chebyshev ring of radius r
      around each pending query's cell; a query FINISHES when it has k
      candidates whose k-th distance is within the ring's guarantee
      radius (no point outside the ring can beat the current k-th), or
      when the ring covers the whole grid.  Unfinished queries double r
      and re-join; finished ones exit the loop.

    Per round the shuffle moves only pending queries x ring cells +
    their candidate partials; pending sets are materialized between
    rounds (bounded by query count) so earlier rounds don't re-execute.
    The next pending set is previous pending MINUS queries marked
    final (hash anti-join on query_id) — a query whose current ring
    holds no points emits no candidate rows, and deriving pending from
    the round output would silently drop it; the anti-join keeps it
    pending and expanding, preserving the exact unbounded-kNN contract
    (rtree.go:685-723 always returns the k nearest).
    Returns (query_id, rank, point_id, dist_km), exact.
    """
    from .agg import bucketed_group_apply, default_join_partitions, join_safe

    n_part = default_join_partitions()
    n_axis = 1 << res
    results = []
    pending = queries_ds.materialize()

    # key the point side ONCE — every round reuses the materialized
    # cell-keyed points instead of re-deriving them per round
    def key_points(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[point_id_col, "lat", "lon"]].copy()
        out["cell"] = geo.tile_id(b["lat"].to_numpy(), b["lon"].to_numpy(), res)
        return out

    p_keyed = points_ds.map_batches(key_points,
                                    batch_format="pandas").materialize()

    # r=1's guarantee radius is 0 (a (r-1)-cell bound) — it could never
    # finish a query, so start at 2; grow x4 per round (each ring is a
    # superset, so overshooting a round only adds candidates, never
    # wrongness)
    r = 2
    for _ in range(max_rounds):
        full_grid = r >= n_axis
        joined = knn_cell_join(
            p_keyed, pending, radius_km=None, k=k, res=res,
            point_id_col=point_id_col, ring_radius=r, with_meta=True,
            points_keyed=True,
        )

        def split_bucket(g: pd.DataFrame, _r=r, _full=full_grid) -> pd.DataFrame:
            # ALL queries of this hash bucket at once: vectorized
            # dedup + sort + cumcount top-k, per-query kth-distance /
            # count via transform — no per-query dispatch
            g = g.drop_duplicates(subset=["query_id", point_id_col])
            g = g.sort_values(["query_id", "dist_km", point_id_col],
                              kind="mergesort")
            rn = g.groupby("query_id", sort=False).cumcount().to_numpy()
            top = g[rn < k].copy()
            grp = top.groupby("query_id", sort=False)["dist_km"]
            cnt = grp.transform("size").to_numpy()
            dk = grp.transform("max").to_numpy()
            guar = _ring_guarantee_km(top["q_lat"].to_numpy(), res, _r)
            top["rank"] = (rn[rn < k] + 1).astype(np.int64)
            top["final"] = _full | ((cnt >= k) & (dk <= guar))
            return top

        round_out = bucketed_group_apply(
            joined, ["query_id"], split_bucket
        ).materialize()
        done_part = round_out.map_batches(
            lambda b: b[b["final"]].drop(columns=["final", "q_lat", "q_lon"]),
            batch_format="pandas",
        )
        results.append(done_part)
        if full_grid:
            # every query just saw the whole grid; anything still
            # candidate-less has no answer at all
            break
        final_ids = round_out.map_batches(
            lambda b: b.loc[b["final"], ["query_id"]].drop_duplicates(),
            batch_format="pandas",
        ).materialize()
        if final_ids.count() > 0:
            # an all-empty round leaves final_ids schema-less, which the
            # Acero join rejects — and with nothing final, pending is
            # unchanged anyway (empty-ring queries keep expanding)
            pending = join_safe(pending).join(
                join_safe(final_ids), "left_anti", n_part, on=("query_id",)
            ).materialize()
            if pending.count() == 0:
                break
        r *= 4
    out = results[0]
    for extra in results[1:]:
        out = out.union(extra)
    return out.select_columns(["query_id", "rank", point_id_col, "dist_km"])


# ---------------------------------------------------------------------------
# reverse geocoding: nearest polyline via point->segment projection


class CompiledSegments:
    """Street polylines exploded into a flat segment array once per actor."""

    def __init__(self, streets: pa.Table):
        a_lat, a_lon, b_lat, b_lon, sid, names = [], [], [], [], [], []
        street_names = (
            streets["name"].to_pylist()
            if "name" in streets.column_names
            else [None] * streets.num_rows
        )
        for i in range(streets.num_rows):
            pts = streets["geom"][i].as_py()
            s = streets["street_id"][i].as_py()
            for j in range(len(pts) - 1):
                a_lat.append(pts[j]["lat"]); a_lon.append(pts[j]["lon"])
                b_lat.append(pts[j + 1]["lat"]); b_lon.append(pts[j + 1]["lon"])
                sid.append(s); names.append(street_names[i])
        self.a_lat = np.array(a_lat); self.a_lon = np.array(a_lon)
        self.b_lat = np.array(b_lat); self.b_lon = np.array(b_lon)
        self.street_id = np.array(sid, dtype=np.int64)
        self.names = names

    def nearest(self, p_lat: np.ndarray, p_lon: np.ndarray, seg_chunk: int = 2048):
        """Per point: (street_id, dist_km, proj_lat, proj_lon) of the
        nearest segment (haversine to the clamped GREAT-CIRCLE
        projection — the spherical analog of the reference's S2 chord
        projection, searcher.go:437-459).  Ties -> lower street_id wins."""
        n = len(p_lat)
        best_d = np.full(n, np.inf)
        best_i = np.zeros(n, dtype=np.int64)
        best_la = np.zeros(n); best_lo = np.zeros(n)
        for s0 in range(0, len(self.a_lat), seg_chunk):
            s1 = min(s0 + seg_chunk, len(self.a_lat))
            pla, plo = geo.project_point_to_segment(
                p_lat[None, :], p_lon[None, :],
                self.a_lat[s0:s1, None], self.a_lon[s0:s1, None],
                self.b_lat[s0:s1, None], self.b_lon[s0:s1, None],
            )
            d = geo.haversine_km(p_lat[None, :], p_lon[None, :], pla, plo)
            # tie-break on street_id: strictly-less keeps the first (lowest
            # segment index, and segments are emitted in street_id order)
            j = np.argmin(d, axis=0)
            dmin = d[j, np.arange(n)]
            upd = dmin < best_d
            best_d[upd] = dmin[upd]
            best_i[upd] = s0 + j[upd]
            best_la[upd] = pla[j, np.arange(n)][upd]
            best_lo[upd] = plo[j, np.arange(n)][upd]
        return self.street_id[best_i], best_d, best_la, best_lo


class ReverseGeocoder:
    """Actor-pool stage: nearest street for each point in the batch."""

    def __init__(self, streets_ref, lat_col="lat", lon_col="lon"):
        import ray

        self.compiled = CompiledSegments(ray.get(streets_ref))
        self.lat_col, self.lon_col = lat_col, lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sid, d, pla, plo = self.compiled.nearest(
            batch[self.lat_col].to_numpy(), batch[self.lon_col].to_numpy()
        )
        return (
            batch.append_column("street_id", pa.array(sid, pa.int64()))
            .append_column("street_dist_km", pa.array(d, pa.float64()))
            .append_column("proj_lat", pa.array(pla, pa.float64()))
            .append_column("proj_lon", pa.array(plo, pa.float64()))
        )


def reverse_geocode(points_ds, streets: pa.Table, concurrency=(1, 4),
                    batch_size: int = 4096, lat_col="lat", lon_col="lon",
                    mode: str = "auto"):
    import ray

    ref = ray.put(streets)
    if mode == "auto":
        mode = "tasks" if streets.num_rows <= 100_000 else "actors"
    if mode == "tasks":
        key = f"revgeo/{ref.hex()}/{lat_col}/{lon_col}"

        def fn(batch: pa.Table) -> pa.Table:
            st = cached_state(
                key, lambda: ReverseGeocoder(ref, lat_col, lon_col)
            )
            return st(batch)

        return points_ds.map_batches(fn, batch_format="pyarrow",
                                     batch_size=batch_size)
    return points_ds.map_batches(
        ReverseGeocoder,
        fn_constructor_kwargs={"streets_ref": ref, "lat_col": lat_col,
                               "lon_col": lon_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# all-pairs distance self-join (spatial θ-join): every pair of rows
# within radius_km, with NO broadcast side — both sides are the (huge)
# table itself.  Reference analogue: the R-tree range search
# (rtree.go:553-580) applied symmetrically over all objects.


def _ring_steps_aniso(lat: np.ndarray, res: int,
                      radius_km: float) -> tuple[np.ndarray, np.ndarray]:
    """Per-point ANISOTROPIC covering-ring steps (slat, slon) for a km
    radius at that point's latitude band — the lat axis never needs
    more than radius/dlat steps, so the polar longitude compression
    must not inflate it (a square geo.cells_for_radius_km ring at the
    pole is (2n+1)^2 cells; the rectangle is (2slat+1) x n).  slon is
    capped at n/2: beyond that the wrapped ring already covers every
    longitude."""
    n = 1 << res
    km_per_deg = 111.19492664455873
    dlat_km = 180.0 / n * km_per_deg
    lat_worst = np.minimum(89.999, np.abs(lat) + radius_km / km_per_deg)
    coslat = np.maximum(1e-9, np.cos(np.radians(lat_worst)))
    dlon_km = 360.0 / n * km_per_deg * coslat
    slat = np.minimum(np.ceil(radius_km / dlat_km), n).astype(np.int64)
    slon = np.minimum(np.ceil(radius_km / dlon_km), n // 2).astype(np.int64)
    return slat, slon


def _tile_rect(tile: np.ndarray, res: int, slat: int, slon: int) -> np.ndarray:
    """Anisotropic tile_ring: neighbor cells within slat lat-steps x
    slon lon-steps (lon wraps, lat clamps).  (len(tile), rows*cols)."""
    n = 1 << res
    x, y = tile % n, tile // n
    ox, oy = np.meshgrid(np.arange(-slon, slon + 1),
                         np.arange(-slat, slat + 1), indexing="ij")
    ox, oy = ox.ravel(), oy.ravel()
    nx = (x[:, None] + ox[None, :]) % n
    ny = np.clip(y[:, None] + oy[None, :], 0, n - 1)
    return ny * n + nx


def distance_self_join(ds, radius_km: float, res: int = 7,
                       id_col: str = "point_id", lat_col: str = "lat",
                       lon_col: str = "lon", n_buckets: int = 64):
    """All (id_a < id_b) pairs with haversine(a, b) <= radius_km.

    Scale shape — the classic cell-partitioned spatial self-join:
    every point is HOME in its own tile and replicated as a GHOST to
    each tile of its covering ring (per-latitude ring radius, dedup
    after clamp/wrap), pairs are found by a vectorized home x replica
    merge on the cell inside hash buckets of cells
    (bucketed_group_apply — no per-cell task, no global sort), and
    each qualifying pair is emitted EXACTLY ONCE by the rule "emit in
    the home cell of the smaller id": cell(a) is inside b's covering
    ring whenever dist(a,b) <= radius (the same worst-case-latitude
    guarantee the cell-kNN path relies on, geo.cells_for_radius_km),
    so the (a home, b replica) match always exists.  Shuffle volume =
    points x ring size; per-cell pair work is bounded by cell density
    at the chosen res (hot cells: raise res, or salt as in
    knn_cell_join).  Returns (id_a, id_b, dist_km)."""
    from .agg import bucketed_group_apply
    from .. import geo

    def replicate(b: pd.DataFrame) -> pd.DataFrame:
        cols = [id_col, lat_col, lon_col]
        if len(b) == 0:
            return b[cols].assign(
                cell=pd.Series([], dtype="int64"),
                home=pd.Series([], dtype="bool"))
        lat = b[lat_col].to_numpy()
        lon = b[lon_col].to_numpy()
        own = geo.tile_id(lat, lon, res)
        slat, slon = _ring_steps_aniso(lat, res, radius_km)
        key = slat * (1 << 32) + slon
        outs = []
        for kv in np.unique(key):
            m = key == kv
            sub = b.loc[m, cols]
            ring = _tile_rect(own[m], res, int(kv >> 32),
                              int(kv & 0xFFFFFFFF))
            idx = np.repeat(np.arange(len(sub)), ring.shape[1])
            rep = sub.iloc[idx].copy()
            rep["cell"] = ring.ravel()
            rep["home"] = rep["cell"].to_numpy() == np.repeat(own[m],
                                                             ring.shape[1])
            outs.append(rep)
        out = pd.concat(outs, ignore_index=True)
        # lat clamp / lon wrap can duplicate ring cells
        return out.drop_duplicates([id_col, "cell"])

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        home = g[g["home"]][[id_col, lat_col, lon_col, "cell"]]
        allr = g[[id_col, lat_col, lon_col, "cell"]]
        m = home.merge(allr, on="cell", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if len(m) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "dist_km": pd.Series([], dtype="float64")})
        d = geo.haversine_km(m[f"{lat_col}_a"].to_numpy(),
                             m[f"{lon_col}_a"].to_numpy(),
                             m[f"{lat_col}_b"].to_numpy(),
                             m[f"{lon_col}_b"].to_numpy())
        keep = d <= radius_km
        return pd.DataFrame({
            "id_a": m[f"{id_col}_a"].to_numpy(np.int64)[keep],
            "id_b": m[f"{id_col}_b"].to_numpy(np.int64)[keep],
            "dist_km": d[keep],
        })

    rep = ds.map_batches(replicate, batch_format="pandas")
    return bucketed_group_apply(rep, ["cell"], pairs_bucket,
                                n_buckets=n_buckets)
