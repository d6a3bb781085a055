"""Two-phase aggregation helpers.

Ray Data's sort-based `groupby().aggregate()` pays a large fixed
all-to-all cost (and degrades with group count in this version: ~60 s
for 100k groups on 100k rows at 8 CPUs).  When the per-batch PARTIAL
aggregation already collapses the data to O(distinct keys per block),
the final combine over partials is tiny — so this helper finishes it
with a single pandas combine on the driver.

Scale contract: the DEFAULT is combine="shuffle" — a distributed
`Dataset.groupby` over the partials, safe for any key cardinality
(web-corpus vocab / n-gram keyspaces are billions of keys at 100 TB).
Pass combine="driver" ONLY when the key space is provably small and
bounded (grid cells at a fixed resolution, enum-like keys, per-language
buckets): it skips the all-to-all and finishes with one pandas combine
on the driver, which this Ray version makes worth having (~60 s fixed
cost for a 100k-group sorted groupby at 8 CPUs).
"""

from __future__ import annotations

import pandas as pd


def two_phase_agg(ds, partial_fn, keys, sums, combine: str = "shuffle",
                  n_buckets: int = 64):
    """partial_fn: batch -> partial rows with `keys` + `sums` columns.
    Returns aggregated result with SUM over each column in `sums`.

    combine="shuffle" (default): distributed BUCKET-HASH combine —
    partials shuffle on hash(keys) % n_buckets (a cheap 64-group sort,
    NOT a sort over the full key space: this Ray version's sort-based
    groupby degrades badly with group count, ~25 s for 100k groups),
    then each bucket runs one vectorized pandas groupby-sum.  Returns a
    Dataset; safe for unbounded key spaces — size n_buckets to the
    cluster, every bucket holds only its hash slice of the keys.
    combine="driver": small final pandas combine — returns a DataFrame;
    ONLY for provably bounded key spaces (see module docstring).
    """
    partials = ds.map_batches(partial_fn, batch_format="pandas")
    if combine == "shuffle":
        def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return b.assign(_bucket=pd.Series([], dtype="uint64"))
            h = pd.util.hash_pandas_object(b[list(keys)], index=False)
            return b.assign(_bucket=h.to_numpy() % n_buckets)

        def combine_bucket(g):
            # pyarrow-native combine: Acero's C++ hash aggregation,
            # no pandas round-trip on the post-shuffle path
            import pyarrow as pa

            out = g.group_by(list(keys)).aggregate(
                [(s, "sum") for s in sums])
            cols = {k: out[k] for k in keys}
            for s in sums:
                cols[s] = out[f"{s}_sum"]
            return pa.table(cols)

        return (
            partials.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(combine_bucket, batch_format="pyarrow")
        )
    pdf = partials.to_pandas()
    if len(pdf) == 0:
        return pdf
    out = pdf.groupby(keys, sort=True, as_index=False)[list(sums)].sum()
    return out


def default_join_partitions() -> int:
    """Hash-join partition count proportional to the cluster: each
    partition becomes an aggregator actor, so over-partitioning a
    small cluster pays pure actor-pool startup (measured ~6 s of a
    16 s pipeline at 8 CPUs), while under-partitioning a big one
    caps join parallelism and per-partition memory."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4, cpus // 2)


def join_safe(ds, n_blocks: int = 16):
    """Prepare a bounded dataset to feed a hash `Dataset.join`:
    map_groups pipelines (bucketed_group_apply included) can emit a
    zero-column empty block, and Acero rejects a join input whose
    blocks disagree on schema ("No match ... for key field reference").
    A repartition concatenates the degenerate block away.  Use ONLY on
    bounded sides (pair lists, label tables, candidate sets) — it is a
    small all-to-all."""
    return ds.repartition(n_blocks)


def ensure_schema(ds, dtypes: dict):
    """Pin every block to exactly `dtypes` (column order + dtype).

    Hash-join OUTPUT partitions that received no rows, and
    repartition() over an all-empty dataset, emit schema-LESS empty
    blocks; feeding one to the next Acero join fails with "No match
    for key field reference", and pandas map functions KeyError on the
    missing columns.  A cheap map_batches re-type (no shuffle) makes
    chained joins and downstream maps safe at any data size.

    CAST CONTRACT (intentional, round-4 ADVICE): pyarrow's
    safe-by-default Table.cast RAISES on lossy casts (out-of-range,
    non-integral float->int) where the old pandas astype silently
    truncated.  That is the behavior we want on join paths — a stage
    emitting loosely-typed blocks should fail loudly here, not ship
    silently corrupted keys into a join."""
    import numpy as np
    import pyarrow as pa

    cols = list(dtypes)
    schema = pa.schema([(c, pa.from_numpy_dtype(np.dtype(t)))
                        for c, t in dtypes.items()])

    def fix(t: pa.Table) -> pa.Table:
        # pyarrow-native: select + cast, no pandas round-trip (this
        # sits on every join path, so the conversion cost is per-block
        # per-stage).  Empty/schema-less blocks get the typed schema.
        if t.num_rows == 0:
            return schema.empty_table()
        return t.select(cols).cast(schema)

    return ds.map_batches(fix, batch_format="pyarrow")


def membership_filter(probe_ds, keys_mat, probe_col: str, key_col: str,
                      keep: bool = True):
    """EXACT broadcast semi- (keep=True) / anti- (keep=False) join
    filter for a BOUNDED key side: the sorted distinct int64 key array
    ships once per worker process (ray.put + per-process cache) and
    each probe batch is filtered by one vectorized searchsorted — no
    shuffle of either side, no join aggregator pool (whose startup
    alone costs ~1-2 s per join on this Ray version).  The caller owns
    the size policy: use only when the key side's row count is known
    (materialized) and fits the broadcast budget (4M int64 = 32 MB),
    else fall back to the keyed `Dataset.join`."""
    import numpy as np
    import ray

    from .knn import cached_state

    karr = np.sort(np.unique(np.concatenate([
        b[key_col].to_numpy(np.int64)
        for b in keys_mat.iter_batches(batch_format="pandas")
    ] or [np.array([], dtype=np.int64)])))
    ref = ray.put(karr)

    def f(b: pd.DataFrame) -> pd.DataFrame:
        ks = cached_state(f"memb-{ref.hex()}", lambda: ray.get(ref))
        if len(b) == 0:
            return b
        if len(ks) == 0:
            return b.iloc[0:0] if keep else b
        pv = b[probe_col].to_numpy(np.int64)
        pos = np.searchsorted(ks, pv)
        pos[pos >= len(ks)] = 0
        isin = ks[pos] == pv
        return b[isin] if keep else b[~isin]

    return probe_ds.map_batches(f, batch_format="pandas")


def join_input(ds, n_blocks: int | None = None):
    """Prepare one BOUNDED side of a hash `Dataset.join`: materialize,
    then repartition to <= the row count so NO block is empty.
    Returns (dataset, row_count).

    Why: Ray's hash-shuffle join broadcasts each input's schema only
    with the FIRST shuffle task of that input (hash_shuffle.py:584,
    `should_broadcast_schemas`); `_shuffle_block` returns before
    broadcasting when its block has zero rows (hash_shuffle.py:223),
    but the flag is still flipped — so if the first block happens to
    be empty, aggregators whose partition receives no rows finalize a
    schema-LESS empty table and Acero rejects the join ("No match for
    key field reference").  All-non-empty input blocks make the first
    task always carry schema.  The count is free post-materialize and
    lets callers early-exit the n == 0 case (where no repartitioning
    can help — skip the join entirely)."""
    n_blocks = n_blocks or default_join_partitions()
    mat = ds.materialize()
    n = mat.count()
    if n == 0:
        return mat, 0
    return mat.repartition(max(1, min(n_blocks, n))), n


def bucketed_group_apply(ds, keys, bucket_fn, n_buckets: int = 64):
    """Keyed-group work at UNBOUNDED group counts: co-locate rows by
    hash(keys) % n_buckets (cheap 64-group sort shuffle — every row of
    a key lands in exactly one bucket) and run `bucket_fn` ONCE PER
    BUCKET over all its groups, vectorized pandas style.  This replaces
    groupby(keys).map_groups(per_group_fn), whose sort degrades with
    group count in this Ray version (~25 s at 100k groups) and whose
    per-group Python dispatch dominates for tiny groups.

    bucket_fn: DataFrame (bucket rows, no bucket column) -> DataFrame.
    It must implement the per-group semantics itself with vectorized
    groupby/drop_duplicates/agg calls."""

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b.assign(_bucket=pd.Series([], dtype="uint64"))
        h = pd.util.hash_pandas_object(b[list(keys)], index=False)
        return b.assign(_bucket=h.to_numpy() % n_buckets)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(run, batch_format="pandas")
    )


def quantile_disc_from_histogram(values, counts, q: float) -> int:
    """percentile_disc over a value histogram: the smallest value whose
    cumulative count reaches ceil(q * n).  `values` must be sorted
    ascending; exact for integer domains (the histogram IS the sorted
    multiset) — DuckDB quantile_disc semantics."""
    import numpy as np

    values = np.asarray(values)
    cum = np.cumsum(np.asarray(counts, dtype=np.int64))
    target = int(np.ceil(q * cum[-1]))
    return values[np.searchsorted(cum, target)]


def _col_us(series) -> "pd.Series":
    """Timestamp-like column -> int64 microseconds (int columns pass
    through)."""
    import numpy as np

    v = series.to_numpy()
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").astype(np.int64)
    return v.astype(np.int64)


def interval_join(points_ds, intervals_ds, ts_col, t0_col, t1_col,
                  bucket_us: int, n_partitions: int | None = None,
                  broadcast_max: int = 100_000):
    """Distributed INTERVAL (range-containment) join: every point row
    is matched to every interval row with t0 <= ts < t1, with NO
    equi-key — the pure range predicate.  Reference analogue: the
    R-tree range search over 1-D extents (rtree.go:553-580's bbox
    overlap test restricted to one axis).

    Scale shape (the standard distributed interval join): time is cut
    into `bucket_us`-wide buckets; each INTERVAL is replicated to every
    bucket it overlaps (vectorized np.repeat), each POINT lands in
    exactly ONE bucket, and the two sides meet in the native hash join
    on the bucket id — an equi-join the engine partitions by
    hash(bucket), so no side is broadcast and no all-to-all sort runs.
    The exact containment predicate filters the per-bucket candidates.
    A point matches an interval in exactly one bucket (its own), so the
    output needs no dedup.  Pick bucket_us on the order of the typical
    interval length: replication factor = len/bucket_us + 1, while the
    per-bucket candidate count shrinks with narrower buckets.

    Caller contract: the two sides share NO column names; `ts_col` on
    points and `t0_col`/`t1_col` on intervals may be datetime64 or
    int64 microseconds.  Returns the joined Dataset with both sides'
    columns (timestamps preserved as-is; the bucket id is dropped).

    Adaptive: an interval side with <= `broadcast_max` rows is
    broadcast whole (ray.put once, per-worker-process cache) and the
    join becomes a per-batch vectorized containment scan over the
    streaming point side — no shuffle of EITHER side, no join
    aggregator pool.  The bucketized join below is the
    unbounded-intervals path.
    """
    import numpy as np

    intervals_ds = intervals_ds.materialize()
    if intervals_ds.count() <= broadcast_max:
        return _interval_join_broadcast(points_ds, intervals_ds,
                                        ts_col, t0_col, t1_col)

    def tag_points(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b.assign(_tb=pd.Series([], dtype="int64"))
        return b.assign(_tb=_col_us(b[ts_col]) // bucket_us)

    def replicate(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b.assign(_tb=pd.Series([], dtype="int64"))
        t0 = _col_us(b[t0_col])
        t1 = _col_us(b[t1_col])
        b0 = t0 // bucket_us
        b1 = np.maximum(t1 - 1, t0) // bucket_us  # t1 exclusive
        counts = b1 - b0 + 1
        idx = np.repeat(np.arange(len(b)), counts)
        offs = np.arange(counts.sum()) - np.repeat(
            np.cumsum(counts) - counts, counts)
        out = b.iloc[idx].reset_index(drop=True)
        out["_tb"] = b0[idx] + offs
        return out

    n_part = n_partitions or default_join_partitions()
    pts = points_ds.map_batches(tag_points, batch_format="pandas")
    ivs = intervals_ds.map_batches(replicate, batch_format="pandas")
    joined = join_safe(pts).join(join_safe(ivs), "inner", n_part,
                                 on=("_tb",))

    def contain(b: pd.DataFrame) -> pd.DataFrame:
        ts = _col_us(b[ts_col])
        keep = (ts >= _col_us(b[t0_col])) & (ts < _col_us(b[t1_col]))
        return b[keep].drop(columns=["_tb"])

    return joined.map_batches(contain, batch_format="pandas")


def _interval_join_broadcast(points_ds, intervals_mat, ts_col,
                             t0_col, t1_col):
    """Small-interval-side interval join: the interval table rides the
    object store once (per-worker-process cache).  Each point batch is
    matched by ONE sorted searchsorted sweep — sort the batch's
    timestamps once, binary-search every interval's [t0, t1) bounds,
    and gather the hit ranges vectorized: O(n log n + m log n + hits),
    no per-interval mask pass, zero shuffle.  Interval-side columns
    that collide with point-side names get an ``_iv`` suffix (both the
    hit and the empty schema, so block schemas stay consistent)."""
    import numpy as np
    import ray

    from .knn import cached_state

    iv_df = intervals_mat.to_pandas()
    ref = ray.put(iv_df)

    def match(b: pd.DataFrame) -> pd.DataFrame:
        iv = cached_state(f"ivjoin-{ref.hex()}", lambda: ray.get(ref))
        iv_out = [c + "_iv" if c in b.columns else c for c in iv.columns]

        def empty() -> pd.DataFrame:
            cols = {c: pd.Series([], dtype=b[c].dtype) for c in b.columns}
            for c, oc in zip(iv.columns, iv_out):
                cols[oc] = pd.Series([], dtype=iv[c].dtype)
            return pd.DataFrame(cols)

        if len(b) == 0 or len(iv) == 0:
            return empty()
        ts = _col_us(b[ts_col])
        t0 = _col_us(iv[t0_col])
        t1 = _col_us(iv[t1_col])
        order = np.argsort(ts, kind="stable")
        tss = ts[order]
        lo = np.searchsorted(tss, t0, side="left")
        hi = np.searchsorted(tss, t1, side="left")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return empty()
        ii = np.repeat(np.arange(len(iv)), counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                            counts)
        pi = order[lo[ii] + offs]
        left = b.iloc[pi].reset_index(drop=True)
        right = iv.iloc[ii].reset_index(drop=True)
        right.columns = iv_out
        return pd.concat([left, right], axis=1)

    return points_ds.map_batches(match, batch_format="pandas")


def asof_join_tagged(ds, key, ts_col, side_col, left_val, right_val,
                     right_cols, n_buckets: int = 64, rsuffix: str = "_r"):
    """Keyed backward AS-OF join over ONE tagged stream: each left-side
    row (side_col == left_val) is matched to the right-side row
    (side_col == right_val) with the greatest ts_col <= its own, per
    key.  Inner semantics: left rows with no predecessor drop.

    Operating on one tagged stream (type column over a shared log — the
    events-table shape) sidesteps two-dataset schema alignment and is
    how temporal logs arrive at scale anyway.

    Scale shape: keys are UNBOUNDED, so this is a bucket-hash shuffle
    (hash(key) % n_buckets) + ONE vectorized `pd.merge_asof(by=key)`
    per bucket over all its keys — no per-key task, no global sort.
    Matched right columns are emitted with `rsuffix`.
    """
    import numpy as np

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[side_col].isin([left_val, right_val])]
        h = pd.util.hash_pandas_object(b[key], index=False)
        return b.assign(_bucket=h.to_numpy() % n_buckets)

    out_r = [f"{c}{rsuffix}" for c in right_cols]

    payload = [c for c in right_cols if c != ts_col]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        l = g[g[side_col] == left_val].drop(columns=[side_col])
        r = g[g[side_col] == right_val][[key, ts_col, *payload]]
        r = r.rename(columns={c: f"{c}{rsuffix}" for c in payload})
        if ts_col in right_cols:
            # the on-column survives from the LEFT side only; carry the
            # matched right timestamp as an explicit suffixed copy
            r[f"{ts_col}{rsuffix}"] = r[ts_col]
        if len(l) == 0 or len(r) == 0:
            return l.head(0).assign(
                **{c: pd.Series([], dtype=r.dtypes.get(c, "object"))
                   for c in out_r}
            )
        m = pd.merge_asof(
            l.sort_values(ts_col, kind="mergesort"),
            r.sort_values(ts_col, kind="mergesort"),
            on=ts_col, by=key, direction="backward",
            suffixes=("", rsuffix),
        )
        # inner semantics: drop lefts with no predecessor
        return m[m[out_r[0]].notna()]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(join_bucket, batch_format="pandas")
    )


def funnel_steps(ds, key: str, ts_col: str, type_col: str,
                 steps: list[str], horizon_us: int, n_buckets: int = 64):
    """FUNNEL analysis with earliest-anchor greedy matching (the
    classic product-analytics semantics): per key, t1 = earliest
    steps[0] event; t_{i+1} = earliest steps[i+1] event in
    (t_i, t_i + horizon]; output one row per key with
    steps_completed in 0..len(steps).

    Scale shape: bucket-hash on the key (unbounded key spaces — the
    sessionize/lag pattern); inside a bucket every funnel step is one
    vectorized map-prev + mask + groupby-min over all the bucket's
    keys at once, never per-key Python.  Reference analogue: the
    staged status resolution of the geofence transition matrix
    (fence_index.go:50-73) applied to an ordered event sequence."""
    import numpy as np

    H = pd.Timedelta(microseconds=horizon_us)

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keys = g[key].unique()
        reached = pd.Series(np.int64(0), index=keys)
        cur = None
        for i, step in enumerate(steps):
            rows = g[g[type_col] == step]
            if i > 0:
                pv = rows[key].map(cur)
                rows = rows[(rows[ts_col] > pv) & (rows[ts_col] <= pv + H)]
            cur = rows.groupby(key)[ts_col].min()
            if cur.empty:
                break
            reached.loc[cur.index] = np.int64(i + 1)
        return pd.DataFrame({key: reached.index.to_numpy(np.int64),
                             "steps_completed": reached.to_numpy(np.int64)})

    return bucketed_group_apply(ds, [key], funnel_bucket,
                                n_buckets=n_buckets)


def dictionary_encode(ds, col: str, out_col: str | None = None,
                      id_cols: list[str] | None = None):
    """CATEGORICAL DICTIONARY ENCODING (the feature-tag encode of the
    reference's tag pipeline, osm_object.go's tag id map, re-expressed
    columnar): assign each distinct value of `col` its dense rank in
    LEXICOGRAPHIC order (deterministic across runs and engines), then
    stream the mapping over the dataset.

    Scale shape: per-batch distinct -> small driver combine (the
    category space is bounded by construction — that is what makes a
    column categorical; an unbounded key space belongs in
    bucketed_group_apply instead) -> the sorted dict broadcasts in the
    task closure; the encode pass is one vectorized map per batch.
    Returns the dataset with `out_col` (int64) replacing `col` unless
    id_cols narrows the projection."""
    import numpy as np

    out_col = out_col or f"{col}_id"
    parts = ds.map_batches(
        lambda b: b[[col]].drop_duplicates(), batch_format="pandas"
    ).to_pandas()
    values = np.sort(parts[col].unique())
    mapping = {v: np.int64(i) for i, v in enumerate(values)}

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[out_col] = b[col].map(mapping).astype(np.int64)
        cols = (id_cols + [out_col]) if id_cols else \
            [c for c in b.columns if c != col]
        return b[cols]

    return ds.map_batches(encode, batch_format="pandas")


def watermark_late(ds, seq_col: str, ts_col: str, lateness_us: int,
                   range_size: int = 4096, keep_cols: list[str] | None = None,
                   n_buckets: int = 64):
    """LATE-DATA DETECTION under a max-event-time watermark (the
    streaming-ingestion gate the reference's per-event geofence flow
    implies but never needed single-process, fence_index.go:50-73): an
    event is LATE iff the watermark — the maximum event time seen
    strictly BEFORE it in arrival order (`seq_col`) — exceeds its own
    event time by more than `lateness_us`.

    This is a PREFIX-MAX over arrival order, distributed in two passes
    so no global sort touches the data:

      pass 1  per-arrival-range (seq // range_size) MAX(ts): per-batch
              partials collapse to O(ranges-per-block) rows, the
              combine is driver-side over a BOUNDED set (#ranges —
              size range_size to the cluster so #ranges stays ~1e5
              even at 1e9 events, a few MB);
      carry   exclusive running max across sorted range ids (tiny
              driver numpy scan) -> broadcast dict;
      pass 2  bucket-hash on range id (bucketed_group_apply — range
              count grows with data, so no groupby(range).map_groups),
              within a bucket ONE vectorized sort + per-range
              cythonized cummax/shift gives the in-range exclusive
              prefix; watermark = max(carry-in, in-range prefix).

    Returns the late rows only: keep_cols + ts + wm_ts + late_us."""
    import numpy as np

    keep_cols = list(keep_cols or [seq_col])

    def range_partial(b: pd.DataFrame) -> pd.DataFrame:
        r = (b[seq_col].to_numpy(np.int64) // range_size)
        t = _col_us(b[ts_col])
        return pd.DataFrame({"_range": r, "_mx": t}).groupby(
            "_range", sort=False, as_index=False).max()

    parts = ds.map_batches(range_partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(columns=keep_cols + [ts_col, "wm_ts", "late_us"])
    rng_max = parts.groupby("_range", sort=True)["_mx"].max()
    ids = rng_max.index.to_numpy(np.int64)
    mx = rng_max.to_numpy(np.int64)
    excl = np.empty_like(mx)
    excl[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(mx[:-1], out=mx[:-1])
    excl[1:] = mx[:-1]
    carry = {int(i): int(v) for i, v in zip(ids, excl)}

    def late_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["_range"] = g[seq_col].to_numpy(np.int64) // range_size
        g["_us"] = _col_us(g[ts_col])
        g = g.sort_values(["_range", seq_col], kind="mergesort")
        grp = g.groupby("_range", sort=False)
        in_range = grp["_us"].cummax().groupby(
            g["_range"], sort=False).shift(1)
        carry_in = g["_range"].map(carry).astype(np.int64)
        wm = np.maximum(
            carry_in.to_numpy(np.int64),
            in_range.fillna(np.iinfo(np.int64).min).to_numpy(np.int64),
        )
        us = g["_us"].to_numpy(np.int64)
        # the first event overall has no watermark (sentinel int64.min:
        # subtracting would wrap) — it can never be late
        valid = wm != np.iinfo(np.int64).min
        diff = np.zeros_like(us)
        diff[valid] = wm[valid] - us[valid]
        late = valid & (diff > lateness_us)
        out = g.loc[late, keep_cols + [ts_col]].copy()
        out["wm_ts"] = wm[late].astype("datetime64[us]")
        out["late_us"] = diff[late]
        return out

    return _late_apply(ds, seq_col, range_size, late_bucket, n_buckets)


def _late_apply(ds, seq_col, range_size, late_bucket, n_buckets):
    """bucketed_group_apply on the derived range id (not a stored
    column): add the bucket key from seq//range_size, then reuse the
    bucket-hash shuffle."""
    import numpy as np

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b.assign(_bucket=pd.Series([], dtype="uint64"))
        r = b[seq_col].to_numpy(np.int64) // range_size
        h = r.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return b.assign(_bucket=h % np.uint64(n_buckets))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return late_bucket(g.drop(columns=["_bucket"]))

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(run, batch_format="pandas"))


def keyed_prefix_sum(ds, key: str, seq_col: str, val_col: str,
                     range_size: int = 4096, n_buckets: int = 64):
    """Per-key EXCLUSIVE running sum of `val_col` over `seq_col` order
    — the distributed window-function SUM() OVER (PARTITION BY key
    ORDER BY seq), with no global sort: the watermark_late two-pass
    prefix shape, keyed.

      pass 1  per (key, seq-range) partial sums — bounded by
              #keys x #ranges rows on the driver (size range_size so
              this stays small; it is the scan state, not the data);
      carry   per-key exclusive prefix over sorted range ids (driver
              numpy scan over the bounded state);
      pass 2  bucket-hash on (key, range): within a bucket one
              vectorized sort + per-(key,range) cython cumsum, plus
              the broadcast carry-in.

    Returns the input rows + `prefix_excl` (int64)."""
    import numpy as np

    def range_partial(b: pd.DataFrame) -> pd.DataFrame:
        r = b[seq_col].to_numpy(np.int64) // range_size
        return pd.DataFrame({key: b[key].to_numpy(),
                             "_range": r,
                             "_s": b[val_col].to_numpy(np.int64)}) \
            .groupby([key, "_range"], sort=False, as_index=False).sum()

    parts = ds.map_batches(range_partial, batch_format="pandas").to_pandas()
    carry: dict = {}
    if len(parts):
        parts = parts.groupby([key, "_range"], sort=True, as_index=False) \
            .sum().sort_values([key, "_range"], kind="mergesort")
        k = parts[key].to_numpy()
        s = parts["_s"].to_numpy(np.int64)
        cum = np.cumsum(s)
        first = np.zeros(len(parts), dtype=bool)
        first[0] = True
        first[1:] = k[1:] != k[:-1]
        cum_prev = np.concatenate([[0], cum[:-1]])
        # subtract each key's own start-of-key cumulative. Forward-fill
        # the key-start *row index* (monotone by construction), not the
        # cumulative value — maximum.accumulate over values is wrong
        # when val_col can be negative (the running sum can dip below a
        # previous key's start).
        start_idx = np.maximum.accumulate(
            np.where(first, np.arange(len(parts)), 0))
        excl = np.where(first, 0, cum_prev - cum_prev[start_idx])
        carry = {(kk, int(rr)): int(vv) for kk, rr, vv in
                 zip(k, parts["_range"].to_numpy(np.int64), excl)}

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["_range"] = g[seq_col].to_numpy(np.int64) // range_size
        g = g.sort_values([key, "_range", seq_col], kind="mergesort")
        v = g[val_col].to_numpy(np.int64)
        grp = g.groupby([key, "_range"], sort=False)
        within = grp[val_col].cumsum().to_numpy(np.int64) - v
        cin = np.fromiter(
            (carry[(kk, int(rr))] for kk, rr in
             zip(g[key].to_numpy(), g["_range"].to_numpy(np.int64))),
            dtype=np.int64, count=len(g))
        g["prefix_excl"] = within + cin
        return g.drop(columns=["_range"])

    return bucketed_group_apply(ds, [key], bucket_fn, n_buckets=n_buckets)
