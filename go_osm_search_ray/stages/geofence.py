"""Geofence transition evaluation (reference J9/A9/ST8,
geofence.go:63-116 + fence_index.go:50-73).

The reference processes one event at a time: read last position from
bbolt, write the new one, emit transition statuses against the 3
nearest fence circles.  Ray-Data-native equivalent:

1. previous position = a per-point lag: bucket-hash shuffle on
   point_id + one vectorized sort+shift per bucket (ordering
   assumption: per-point sequential updates, SURVEY.md §2.10).
   Missing previous -> the reference's (-999, -999) sentinel
   (fence_index.go:61-64) — note the sentinel deliberately FLOWS INTO
   the CROSS line test, exactly as in the reference.
2. fences are a broadcast side table; each event batch evaluates
   containment + transitions vectorized against its ``nearest_n``
   fences (or all fences when ``nearest_n is None``).

Transition matrix (geofence.go:97-116):
    INSIDE  -> INSIDE : [INSIDE]
    INSIDE  -> OUTSIDE: [EXIT, OUTSIDE]
    OUTSIDE -> INSIDE : [ENTER, INSIDE]
    OUTSIDE -> OUTSIDE: [CROSS] if old->new segment cuts the circle
                        else [OUTSIDE]

State checkpointing: ``last_positions`` materializes the end-of-epoch
state dataset (the bbolt store analogue, kvdb/kv_db.go:109-137) for the
next epoch's sentinel join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import geo

SENTINEL = -999.0


# a checkpoint row must sort BEFORE every real event of its point; real
# seqs are application counters, never near int64 min
_STATE_SEQ = np.int64(-(1 << 62))


def with_prev_position(events_ds, state: pa.Table | None = None,
                       n_buckets: int = 64):
    """Add (old_lat, old_lon) per event via per-point ordered lag.

    ``state`` is an optional previous-epoch checkpoint
    (point_id, lat, lon): a point's first event in this epoch uses its
    checkpointed position instead of the sentinel.

    Scale shape: point_ids are UNBOUNDED (one per tracked entity), so
    the lag is a bucket-hash shuffle (hash(point_id) % n_buckets) plus
    ONE vectorized sort+shift per bucket over ALL its points — never a
    ``groupby(point_id)`` sort over millions of groups or a per-point
    Python task (the sessionize pattern, stages/agg.py).  The
    checkpoint joins in as synthetic first rows (seq = -2^62) flowing
    through the same shuffle — the state table never has to fit in one
    task or on the driver.
    """
    import ray.data as rd

    from .agg import bucketed_group_apply

    cols = ["point_id", "seq", "lat", "lon"]

    def tag_events(b: pd.DataFrame) -> pd.DataFrame:
        return b[cols].assign(_st=np.int8(0))

    ds = events_ds.map_batches(tag_events, batch_format="pandas")
    if state is not None:
        sdf = state.to_pandas()[["point_id", "lat", "lon"]].copy()
        sdf["seq"] = _STATE_SEQ
        sdf["_st"] = np.int8(1)
        ds = ds.union(rd.from_pandas(sdf[cols + ["_st"]]))

    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["point_id", "seq"], kind="mergesort").copy()
        g["old_lat"] = g["lat"].shift(1)
        g["old_lon"] = g["lon"].shift(1)
        first = g["point_id"].ne(g["point_id"].shift(1)).to_numpy()
        g.loc[first, "old_lat"] = SENTINEL
        g.loc[first, "old_lon"] = SENTINEL
        g = g[g["_st"] == 0]
        return g.drop(columns=["_st"])

    return bucketed_group_apply(ds, ["point_id"], lag_bucket, n_buckets)


class FenceEvaluator:
    """Actor-pool stage: transitions of each (event, fence) pair."""

    def __init__(self, fences_ref, nearest_n: int | None = 3):
        import ray

        f = ray.get(fences_ref)
        if isinstance(f, pa.Table):
            f = f.to_pandas()
        self.keys = f["key"].to_numpy()
        self.f_lat = f["lat"].to_numpy(dtype=np.float64)
        self.f_lon = f["lon"].to_numpy(dtype=np.float64)
        self.f_r = f["radius_km"].to_numpy(dtype=np.float64)
        self.nearest_n = nearest_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy()
        lon = batch["lon"].to_numpy()
        olat = batch["old_lat"].to_numpy()
        olon = batch["old_lon"].to_numpy()
        pid = batch["point_id"].to_pylist()
        seq = batch["seq"].to_numpy()

        nf = len(self.keys)
        B = len(lat)
        n = min(self.nearest_n if self.nearest_n is not None else nf, nf)
        # nearest-n selection on the BLAS hav-"a" matrix (distance-
        # monotone, no per-pair trig — the reference's 3-NN fence probe,
        # geofence.go:65).  Only the MEMBERSHIP of the n nearest fences
        # matters (each selected fence is evaluated independently), but a
        # distance TIE at the nth boundary must resolve like the SQL
        # oracle's ORDER BY dist, fence_id — the broadcast fence table is
        # fence_id-sorted, so (a, column position) tie-break is exactly
        # that.  Exact per-pair math then runs only on (E, n).
        if n < nf:
            # cache-sized event chunks; argpartition fast path with
            # exact tie handling only where ties straddle the cut
            from .knn import topk_cols_exact

            chunk = max(1, 131072 // max(nf, 1))
            parts = []
            for e0 in range(0, B, chunk):
                a = geo.hav_matrix(lat[e0 : e0 + chunk], lon[e0 : e0 + chunk],
                                   self.f_lat, self.f_lon)
                parts.append(topk_cols_exact(a, n))
            kth = np.concatenate(parts, axis=0)
        else:
            kth = np.broadcast_to(np.arange(nf), (B, nf)).copy()

        f_lat, f_lon, f_r = self.f_lat[kth], self.f_lon[kth], self.f_r[kth]
        d_new = geo.haversine_km(lat[:, None], lon[:, None], f_lat, f_lon)
        new_in = d_new <= f_r
        has_old = olat != SENTINEL
        d_old = geo.haversine_km(olat[:, None], olon[:, None], f_lat, f_lon)
        old_in = (d_old <= f_r) & has_old[:, None]
        cross = geo.line_circle_intersect(
            f_lat, f_lon, f_r,
            olat[:, None], olon[:, None], lat[:, None], lon[:, None],
        )

        out = {"point_id": [], "seq": [], "fence_key": [], "status": []}

        def emit(mask, status):
            e, j = np.nonzero(mask)
            f = kth[e, j]
            out["point_id"].extend(pid[i] for i in e)
            out["seq"].extend(seq[e].tolist())
            out["fence_key"].extend(self.keys[f].tolist())
            out["status"].extend([status] * len(e))

        emit(old_in & new_in, "INSIDE")
        emit(old_in & ~new_in, "EXIT")
        emit(old_in & ~new_in, "OUTSIDE")
        emit(~old_in & new_in, "ENTER")
        emit(~old_in & new_in, "INSIDE")
        emit(~old_in & ~new_in & cross, "CROSS")
        emit(~old_in & ~new_in & ~cross, "OUTSIDE")

        return pa.table(
            {
                "point_id": pa.array(out["point_id"], pa.string()),
                "seq": pa.array(out["seq"], pa.int64()),
                "fence_key": pa.array(out["fence_key"], pa.string()),
                "status": pa.array(out["status"], pa.string()),
            }
        )


def fence_transitions(events_ds, fences: pa.Table, nearest_n: int | None = 3,
                      state: pa.Table | None = None, concurrency=2,
                      batch_size: int = 4096, mode: str = "auto"):
    """events -> (point_id, seq, fence_key, status) transition rows.

    mode="tasks" (auto for <=100k fences): stateless task pool with the
    per-process state cache (stages/knn.cached_state) — no per-call
    actor-pool startup."""
    import ray

    ref = ray.put(fences)
    lagged = with_prev_position(events_ds, state=state)
    if mode == "auto":
        mode = "tasks" if fences.num_rows <= 100_000 else "actors"
    if mode == "tasks":
        from .knn import cached_state

        key = f"fence/{ref.hex()}/{nearest_n}"

        def fn(batch: pa.Table) -> pa.Table:
            st = cached_state(key, lambda: FenceEvaluator(ref, nearest_n))
            return st(batch)

        return lagged.map_batches(fn, batch_format="pyarrow",
                                  batch_size=batch_size)
    return lagged.map_batches(
        FenceEvaluator,
        fn_constructor_kwargs={"fences_ref": ref, "nearest_n": nearest_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FenceIndex:
    """Named fence sets + per-point state — the reference's FenceIndex
    API surface (fence_index.go:26-95) over Arrow tables instead of an
    in-process map + bbolt.

    add_fence/delete_fence manage named sets; add_fence_point upserts a
    circle by key (reference Add re-inserts on duplicate,
    geofence.go:49-61); search evaluates an event batch against a set
    and advances the state checkpoint.
    """

    def __init__(self):
        self._fences: dict[str, pd.DataFrame] = {}
        self._state: pa.Table | None = None

    def add_fence(self, name: str):
        if name in self._fences:
            raise ValueError(f"fence {name!r} already exists")
        self._fences[name] = pd.DataFrame(
            columns=["key", "lat", "lon", "radius_km"]
        )

    def delete_fence(self, name: str):
        self._fences.pop(name, None)

    def add_fence_point(self, name: str, key: str, lat: float, lon: float,
                        radius_km: float):
        if name not in self._fences:
            raise KeyError(f"fence {name!r} does not exist")
        f = self._fences[name]
        f = f[f["key"] != key]  # upsert semantics (geofence.go:52-59)
        self._fences[name] = pd.concat(
            [f, pd.DataFrame([{"key": key, "lat": lat, "lon": lon,
                               "radius_km": radius_km}])],
            ignore_index=True,
        )

    def update_fence_point(self, point_id: str, lat: float, lon: float):
        """UpdateFencePoint (fence_index.go:75-85): overwrite a tracked
        point's last position without emitting transitions."""
        row = pa.table({"point_id": pa.array([point_id]),
                        "lat": pa.array([lat]), "lon": pa.array([lon])})
        if self._state is None:
            self._state = row
        else:
            keep = self._state.filter(
                pa.compute.not_equal(self._state["point_id"], point_id)
            )
            self._state = pa.concat_tables([keep, row])

    def search(self, name: str, events_ds, nearest_n: int | None = 3,
               concurrency=2):
        """Evaluate an event batch against fence set `name`, then
        advance the state checkpoint to the batch's last positions."""
        if name not in self._fences:
            raise KeyError(f"fence {name!r} does not exist")
        fences = pa.Table.from_pandas(self._fences[name], preserve_index=False)
        out = fence_transitions(events_ds, fences, nearest_n=nearest_n,
                                state=self._state, concurrency=concurrency)
        result = out.to_pandas()
        new_state = last_positions(events_ds).to_pandas()
        if self._state is not None:
            old = self._state.to_pandas()
            old = old[~old["point_id"].isin(set(new_state["point_id"]))]
            new_state = pd.concat([old, new_state], ignore_index=True)
        self._state = pa.Table.from_pandas(new_state, preserve_index=False)
        return result


    def checkpoint(self, out_dir: str):
        """Persist fence sets + per-point last positions as parquet +
        a JSON meta (atomic replace) — the durable analogue of the
        reference's bbolt store (kvdb/kv_db.go:109-137): a restarted
        process resumes epoch evaluation exactly where this one stopped."""
        import json
        import os

        import pyarrow.parquet as pq

        os.makedirs(os.path.join(out_dir, "fences"), exist_ok=True)
        for name, df in self._fences.items():
            pq.write_table(
                pa.Table.from_pandas(df, preserve_index=False),
                os.path.join(out_dir, "fences", f"{name}.parquet"),
            )
        if self._state is not None:
            pq.write_table(self._state, os.path.join(out_dir, "state.parquet"))
        tmp = os.path.join(out_dir, "_meta.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"fence_sets": sorted(self._fences),
                       "has_state": self._state is not None}, fh)
        os.replace(tmp, os.path.join(out_dir, "_meta.json"))

    @staticmethod
    def restore(out_dir: str) -> "FenceIndex":
        import json
        import os

        import pyarrow.parquet as pq

        with open(os.path.join(out_dir, "_meta.json")) as fh:
            meta = json.load(fh)
        idx = FenceIndex()
        for name in meta["fence_sets"]:
            idx._fences[name] = pq.read_table(
                os.path.join(out_dir, "fences", f"{name}.parquet")
            ).to_pandas()
        if meta["has_state"]:
            idx._state = pq.read_table(os.path.join(out_dir, "state.parquet"))
        return idx


def last_positions(events_ds, n_buckets: int = 64):
    """End-of-epoch state checkpoint: latest (lat, lon) per point_id.

    Same bucket-hash shape as `with_prev_position`: one vectorized
    sort + last-row-per-point mask per bucket, no per-point task."""
    from .agg import bucketed_group_apply

    def last_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["point_id", "seq"], kind="mergesort")
        is_last = g["point_id"].ne(g["point_id"].shift(-1)).to_numpy()
        return g.loc[is_last, ["point_id", "lat", "lon"]]

    return bucketed_group_apply(
        events_ds.map_batches(
            lambda b: b[["point_id", "seq", "lat", "lon"]],
            batch_format="pandas",
        ),
        ["point_id"], last_bucket, n_buckets,
    )
