"""Deduplication operators (reference D3 + training-data scale additions).

- exact_dedup: content-hash -> hash-partition groupby -> per-group min id
  (the "exact dedup = hash-partition + per-group first" pattern).
- name_bbox_dedup: the reference's near-dedup semantics
  (indexer.go:582-618): same normalized name AND bbox containment.
  Re-expressed as groupby(norm_name) + in-group spatial resolution —
  no shared mutable map.
- minhash_lsh_pairs: MinHash + banded LSH candidate generation with
  exact-Jaccard verification (the near-dup path for 100 TB text).
- simhash_signatures: 64-bit SimHash per doc + Hamming-bucket pairs.
- jaccard_pairs: exact n-gram-shingle Jaccard pairs via shingle-key
  shuffle (the SQL-checkable oracle for near-dup).

All hashing is process-independent (md5 / FNV), never Python hash().
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import tokenize_series


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _shingles(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def _hash64(s: str) -> np.uint64:
    return np.uint64(int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little"))


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(ds, id_col="doc_id", text_col="text", normalize: bool = True):
    """Keep the min-id doc per (normalized) content hash.

    Matches DuckDB: md5(lower(regexp_replace(text,'[^a-z0-9]+',' ','g')))
    when normalize else md5(text).

    The group count equals the distinct-content count (~corpus size),
    so the combine is a BUCKET-hash shuffle + one vectorized
    sort+drop_duplicates per bucket — never a sort over billions of
    hash groups or a per-group Python task (stages/agg.py).
    """
    import re

    from .agg import bucketed_group_apply

    norm_re = re.compile(r"[^a-z0-9]+")

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        if normalize:
            key = (
                batch[text_col]
                .str.lower()
                .map(lambda s: norm_re.sub(" ", s))
                .map(md5_hex)
            )
        else:
            key = batch[text_col].map(md5_hex)
        return pd.DataFrame({"text_hash": key, id_col: batch[id_col]})

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(id_col, kind="mergesort")
            .drop_duplicates("text_hash", keep="first")
        )

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    return bucketed_group_apply(hashed, ["text_hash"], keep_min)


# ---------------------------------------------------------------------------
# reference D3: same-name + bbox containment dedup (indexer.go:582-618)


def name_bbox_dedup(ds, name_col="name", lat_col="lat", lon_col="lon",
                    id_col="point_id"):
    """Keep one representative per lowercased name when one record's
    bbox (grown union of its sightings) contains the other.  In-group
    resolution: ascending id order, drop a record if an earlier kept
    record's running bbox contains its point; else keep and grow the
    bbox — deterministic equivalent of the reference's encounter-order
    map (indexer.go:156-165)."""

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        kept_idx = []
        box = None  # (lat0, lat1, lon0, lon1)
        for row in g.itertuples():
            lat, lon = getattr(row, lat_col), getattr(row, lon_col)
            if box is not None and box[0] <= lat <= box[1] and box[2] <= lon <= box[3]:
                continue
            kept_idx.append(row.Index)
            if box is None:
                box = (lat, lat, lon, lon)
            else:
                box = (min(box[0], lat), max(box[1], lat),
                       min(box[2], lon), max(box[3], lon))
        return g.loc[kept_idx]

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["norm_name"] = batch[name_col].str.lower()
        return batch

    from .agg import bucketed_group_apply

    def resolve_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # the in-group resolution is inherently sequential (running
        # bbox), but the SHUFFLE is a 64-bucket hash, not a sort over
        # every distinct name
        frames = [resolve(grp) for _, grp in g.groupby("norm_name", sort=False)]
        return pd.concat(frames) if frames else g.head(0)

    return bucketed_group_apply(
        ds.map_batches(norm, batch_format="pandas"),
        ["norm_name"], resolve_bucket,
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup


class MinHasher:
    """Vectorized minhash signatures; permutations are (a*h+b) mod p
    over 64-bit shingle hashes (universal hashing)."""

    MERSENNE = np.uint64((1 << 61) - 1)

    def __init__(self, num_perm: int = 128, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = shingle_hashes[:, None]
        vals = (self.a[None, :] * h + self.b[None, :]) % self.MERSENNE
        return vals.min(axis=0)


def minhash_lsh_pairs(ds, id_col="doc_id", text_col="text", k_shingle: int = 3,
                      num_perm: int = 128, bands: int = 16, threshold: float = 0.5):
    """Near-dup pairs: shingle -> minhash -> banded buckets -> candidate
    pairs (signature-estimated Jaccard prefilter) -> exact-Jaccard
    verify of the SURVIVING candidates only.  Returns a Dataset of
    (id_a, id_b, jaccard) with id_a < id_b and exact jaccard >= threshold.

    Scale shape: the banding shuffle moves ONLY (band, bucket, doc_id,
    signature) — a signature is a fixed num_perm*8 bytes, independent of
    document length, so per-doc shuffle bytes are bands * (16 B bucket +
    1 KiB sig), never the corpus text (shipping each doc's shingle list
    in every band row would amplify the corpus x bands through the
    object store).  The exact verify re-scans the source for CANDIDATE
    docs only (bounded by the LSH candidate count, << corpus).
    """
    import ray.data as rd

    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm)

    def sig_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize_series(batch[text_col])
        out = {"band": [], "bucket": [], id_col: [], "sig": []}
        for i, ws in enumerate(toks):
            sh = _shingles(ws, k_shingle)
            hv = np.array([_hash64(s) for s in sh], dtype=np.uint64)
            sig = hasher.signature(hv)
            sig_b = sig.tobytes()
            for b in range(bands):
                band_sig = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bucket = hashlib.md5(band_sig.tobytes()).hexdigest()[:16]
                out["band"].append(b)
                out["bucket"].append(bucket)
                out[id_col].append(batch[id_col].iloc[i])
                out["sig"].append(sig_b)
        return pd.DataFrame(out)

    # prefilter slack: the signature estimate of a true >=threshold pair
    # is within ~5 sigma of truth at num_perm=128; half the threshold is
    # far below that band, so no true pair is lost here — the exact
    # verify below makes the final call
    est_floor = threshold * 0.5

    def cands_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].tolist()
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
        ra, rb = [], []
        for i in range(len(ids) - 1):
            est = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for off in np.nonzero(est >= est_floor)[0]:
                ra.append(ids[i])
                rb.append(ids[i + 1 + off])
        return pd.DataFrame({"id_a": ra, "id_b": rb})

    from .agg import bucketed_group_apply

    def cands_hash_bucket(g: pd.DataFrame) -> pd.DataFrame:
        frames = [cands_in_bucket(grp)
                  for _, grp in g.groupby(["band", "bucket"], sort=False)]
        return (pd.concat(frames, ignore_index=True) if frames
                else pd.DataFrame({"id_a": [], "id_b": []}))

    cand = bucketed_group_apply(
        ds.map_batches(sig_rows, batch_format="pandas"),
        ["band", "bucket"], cands_hash_bucket,
    )
    # same pair surfaces from several bands -> bucketed distinct
    cand = bucketed_group_apply(
        cand, ["id_a", "id_b"], lambda g: g.drop_duplicates(["id_a", "id_b"])
    ).to_pandas()  # bounded by candidate count, not corpus size

    empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                          "id_b": pd.Series([], dtype=np.int64),
                          "jaccard": pd.Series([], dtype=np.float64)})
    if len(cand) == 0:
        return rd.from_pandas(empty)

    # exact verify: second scan restricted to candidate docs
    wanted = set(cand["id_a"]) | set(cand["id_b"])

    def shingle_sets(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch[id_col].isin(wanted)]
        toks = tokenize_series(sub[text_col])
        return pd.DataFrame({
            id_col: sub[id_col].to_numpy(),
            "shingles": [sorted(_shingles(ws, k_shingle)) for ws in toks],
        })

    sh_df = ds.map_batches(shingle_sets, batch_format="pandas").to_pandas()
    sets = {d: set(s) for d, s in zip(sh_df[id_col], sh_df["shingles"])}
    ra, rb, rj = [], [], []
    for a, b in zip(cand["id_a"], cand["id_b"]):
        sa, sb = sets[a], sets[b]
        union = len(sa | sb)
        jac = len(sa & sb) / union if union else 1.0
        if jac >= threshold:
            ra.append(a); rb.append(b); rj.append(jac)
    if not ra:
        return rd.from_pandas(empty)
    return rd.from_pandas(pd.DataFrame({"id_a": ra, "id_b": rb, "jaccard": rj}))


def near_dedup_keep(ds, id_col="doc_id", text_col="text", k_shingle: int = 3,
                    threshold: float = 0.2, max_df: int | None = None,
                    method: str = "exact"):
    """Training-data near-dedup END TO END: pair generation (exact
    shingle-Jaccard, or MinHash+LSH via method="minhash") -> connected
    components -> keep the MIN-ID representative per component.
    Returns a Dataset of kept ids (docs with no near-dup survive).

    The pair list is bounded by the near-dup rate (<< corpus), so the
    union-find runs driver-side; swap in distributed label propagation
    (iterated min-neighbor joins) if pair counts ever rival the corpus.
    The survivors filter streams — the corpus never materializes.
    """
    if method == "minhash":
        pairs_ds = minhash_lsh_pairs(ds, id_col, text_col, k_shingle,
                                     threshold=threshold)
    else:
        pairs_ds = jaccard_pairs(ds, id_col, text_col, k_shingle,
                                 threshold=threshold, max_df=max_df)
    pairs = pairs_ds.to_pandas()  # bounded by near-dup pair count

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id root => the representative is the smallest member
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    drop = {x for x in parent if find(x) != x}

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return b[~b[id_col].isin(drop)][[id_col]]

    return ds.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash


_POW2_63 = np.int64(1) << np.arange(63, dtype=np.int64)
_KBITS = np.arange(64, dtype=np.uint64)


def simhash64_batch(toks: pd.Series) -> np.ndarray:
    """64-bit SimHash per token list, tf-weighted, vectorized
    batch-wide: md5 runs ONCE per unique token in the batch; the
    +/- votes accumulate with one np.add.at scatter; the bit pack
    mirrors the SQL oracle's v_lo63 - bit63*(2^63-1) - bit63
    two's-complement form bit-for-bit.  Order-invariant by
    construction (depends only on the token bag)."""
    n = len(toks)
    out = np.zeros(n, dtype=np.int64)
    lens = toks.str.len().to_numpy(np.int64) if n else np.array([], np.int64)
    if n and lens.sum():
        rows = np.repeat(np.arange(n), lens)
        flat = np.concatenate([np.asarray(ws, dtype=object) for ws in toks])
        tf = (
            pd.DataFrame({"r": rows, "t": flat})
            .groupby(["r", "t"], sort=False)
            .size()
        )
        rr = tf.index.get_level_values(0).to_numpy()
        tt = tf.index.get_level_values(1).to_numpy()
        cc = tf.to_numpy().astype(np.int64)
        uniq, inv = np.unique(tt, return_inverse=True)
        hv = np.array([_hash64(t) for t in uniq], dtype=np.uint64)
        signs = (
            2 * ((hv[:, None] >> _KBITS[None, :]) & np.uint64(1)).astype(np.int64)
            - 1
        )  # U x 64 in {-1, +1}
        acc = np.zeros((n, 64), dtype=np.int64)
        np.add.at(acc, rr, signs[inv] * cc[:, None])
        bits = acc > 0
        v_lo = (bits[:, :63].astype(np.int64) * _POW2_63[None, :]).sum(axis=1)
        b63 = bits[:, 63].astype(np.int64)
        out = v_lo - b63 * np.int64(9223372036854775807) - b63
    return out


def simhash_signatures(ds, id_col="doc_id", text_col="text"):
    """64-bit SimHash over token hashes, weighted by term frequency.
    Returned as int64 (two's complement) for Arrow friendliness.
    Core math in `simhash64_batch` (property-tested directly)."""

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch[id_col],
            "simhash": simhash64_batch(tokenize_series(batch[text_col])),
        })

    return ds.map_batches(sig, batch_format="pandas")


def simhash_dup_pairs(ds, id_col="doc_id", text_col="text", max_hamming: int = 3):
    """Near-dup pairs by SimHash: 4-way band blocking (any identical
    16-bit band -> candidate), exact Hamming verify <= max_hamming."""

    sigs = simhash_signatures(ds, id_col, text_col)

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["simhash"].to_numpy().view(np.uint64)
        out = {"band": [], "bucket": [], "doc_id": [], "simhash": []}
        for b in range(4):
            chunk = (s >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            out["band"].extend([b] * len(batch))
            out["bucket"].extend(chunk.tolist())
            out["doc_id"].extend(batch[id_col].tolist())
            out["simhash"].extend(batch["simhash"].tolist())
        return pd.DataFrame(out)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        g = g.sort_values("doc_id", kind="mergesort")
        ids = g["doc_id"].tolist()
        hs = g["simhash"].to_numpy().view(np.uint64)
        ra, rb, rh = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = int(bin(int(hs[i] ^ hs[j])).count("1"))
                if ham <= max_hamming:
                    ra.append(ids[i]); rb.append(ids[j]); rh.append(ham)
        return pd.DataFrame({"id_a": ra, "id_b": rb, "hamming": rh})

    from .agg import bucketed_group_apply

    def pairs_hash_bucket(g: pd.DataFrame) -> pd.DataFrame:
        frames = [pairs(grp)
                  for _, grp in g.groupby(["band", "bucket"], sort=False)]
        return (pd.concat(frames, ignore_index=True) if frames
                else pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}))

    cand = bucketed_group_apply(
        sigs.map_batches(band_rows, batch_format="pandas"),
        ["band", "bucket"], pairs_hash_bucket,
    )
    return bucketed_group_apply(
        cand, ["id_a", "id_b"], lambda g: g.drop_duplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (shingle-key shuffle; SQL-checkable)


def jaccard_pairs(ds, id_col="doc_id", text_col="text", k_shingle: int = 3,
                  threshold: float = 0.2, max_df: int | None = None,
                  output: str = "jaccard"):
    """All pairs with distinct-shingle Jaccard >= threshold, computed by
    exploding (shingle, doc) pairs and shuffling on shingle — exactly
    the DuckDB self-join oracle, distributed.

    Hot-key guard: a shingle shared by g docs emits O(g^2) pair rows —
    one stopword trigram shared by 10^6 docs would emit 10^12 rows.
    `max_df` drops shingle groups larger than the cap before pair
    emission (standard near-dup practice: ultra-common shingles carry no
    dedup signal; mirror it in SQL with HAVING COUNT(*) <= max_df when
    oracle parity with a cap is wanted).  None = no cap (exact oracle
    semantics; only for bounded corpora).

    output="jaccard": (id_a, id_b, jaccard rounded to 6).
    output="sizes":   (id_a, id_b, common, size_a, size_b) — the
    SQL-checkable shingle_common form (integer columns hash exactly).
    """

    def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize_series(batch[text_col])
        ids, shs, sizes = [], [], []
        for i, ws in enumerate(toks):
            sh = sorted(_shingles(ws, k_shingle))
            ids.extend([batch[id_col].iloc[i]] * len(sh))
            shs.extend(sh)
            sizes.extend([len(sh)] * len(sh))
        return pd.DataFrame({"shingle": shs, id_col: ids, "set_size": sizes})

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized pair emission for ALL shingle groups in a bucket:
        df-cap filter, then a self-merge on shingle (a C-level hash
        join) — no per-group Python loop, no O(g^2) list appends."""
        if max_df is not None and len(g):
            vc = g["shingle"].value_counts()
            hot = vc[vc > max_df].index
            if len(hot):
                g = g[~g["shingle"].isin(hot)]
        m = g.merge(g, on="shingle", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        return pd.DataFrame({
            "id_a": m[f"{id_col}_a"].to_numpy(),
            "id_b": m[f"{id_col}_b"].to_numpy(),
            "size_a": m["set_size_a"].to_numpy(np.int64),
            "size_b": m["set_size_b"].to_numpy(np.int64),
            "common_partial": np.ones(len(m), dtype=np.int64),
        })

    def finalize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized agg over ALL pair groups in the bucket — the
        # pair-group count is unbounded, so no per-group task/sort
        agg = (
            g.groupby(["id_a", "id_b"], sort=False)
            .agg(common=("common_partial", "sum"),
                 size_a=("size_a", "first"), size_b=("size_b", "first"))
            .reset_index()
        )
        common = agg["common"].to_numpy(np.int64)
        sa = agg["size_a"].to_numpy(np.int64)
        sb = agg["size_b"].to_numpy(np.int64)
        jac = common / (sa + sb - common)
        keep = jac >= threshold
        agg = agg[keep]
        if output == "sizes":
            out = agg.copy()
            out["common"] = out["common"].astype(np.int64)
            return out[["id_a", "id_b", "common", "size_a", "size_b"]]
        return pd.DataFrame({"id_a": agg["id_a"], "id_b": agg["id_b"],
                             "jaccard": np.round(jac[keep], 6)})

    from .agg import bucketed_group_apply

    sh_rows = ds.map_batches(shingle_rows, batch_format="pandas")
    pairs = bucketed_group_apply(sh_rows, ["shingle"], pairs_bucket)
    return bucketed_group_apply(pairs, ["id_a", "id_b"], finalize_bucket)
