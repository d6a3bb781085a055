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
    """
    import re

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

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, id_col)

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("text_hash")
        .map_groups(keep_first, batch_format="pandas")
    )


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

    return (
        ds.map_batches(norm, batch_format="pandas")
        .groupby("norm_name")
        .map_groups(resolve, batch_format="pandas")
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
    pairs -> exact-Jaccard verify.  Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= threshold.

    Scale path: the only shuffle is groupby(band, bucket); the verify
    joins shingle SETS of candidates only (broadcast back via pairs).
    """
    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm)

    def sig_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize_series(batch[text_col])
        out = {"band": [], "bucket": [], id_col: [], "shingles": []}
        for i, ws in enumerate(toks):
            sh = _shingles(ws, k_shingle)
            hv = np.array([_hash64(s) for s in sh], dtype=np.uint64)
            sig = hasher.signature(hv)
            sh_list = sorted(sh)
            for b in range(bands):
                band_sig = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bucket = hashlib.md5(band_sig.tobytes()).hexdigest()[:16]
                out["band"].append(b)
                out["bucket"].append(bucket)
                out[id_col].append(batch[id_col].iloc[i])
                out["shingles"].append(sh_list)
        return pd.DataFrame(out)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].tolist()
        sh = [set(s) for s in g["shingles"]]
        ra, rb, rj = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sh[i] & sh[j])
                union = len(sh[i] | sh[j])
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    ra.append(ids[i]); rb.append(ids[j]); rj.append(jac)
        return pd.DataFrame({"id_a": ra, "id_b": rb, "jaccard": rj})

    cand = (
        ds.map_batches(sig_rows, batch_format="pandas")
        .groupby(["band", "bucket"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    # same pair can surface from several bands -> dedup
    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["id_a", "id_b"]).map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash


def simhash_signatures(ds, id_col="doc_id", text_col="text"):
    """64-bit SimHash over token hashes, weighted by term frequency.
    Returned as int64 (two's complement) for Arrow friendliness."""

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize_series(batch[text_col])
        out = np.zeros(len(batch), dtype=np.int64)
        for i, ws in enumerate(toks):
            if not ws:
                continue
            acc = np.zeros(64, dtype=np.int64)
            vals, counts = np.unique(ws, return_counts=True)
            for w, c in zip(vals, counts):
                h = _hash64(w)
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == 1, c, -c)
            bits = acc > 0
            val = np.uint64(0)
            for k in np.nonzero(bits)[0]:
                val |= np.uint64(1) << np.uint64(k)
            out[i] = int(val.astype(np.int64))
        return pd.DataFrame({"doc_id": batch[id_col], "simhash": out})

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

    cand = sigs.map_batches(band_rows, batch_format="pandas").groupby(
        ["band", "bucket"]
    ).map_groups(pairs, batch_format="pandas")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["id_a", "id_b"]).map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (shingle-key shuffle; SQL-checkable)


def jaccard_pairs(ds, id_col="doc_id", text_col="text", k_shingle: int = 3,
                  threshold: float = 0.2):
    """All pairs with distinct-shingle Jaccard >= threshold, computed by
    exploding (shingle, doc) pairs and shuffling on shingle — exactly
    the DuckDB self-join oracle, distributed."""

    def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize_series(batch[text_col])
        ids, shs, sizes = [], [], []
        for i, ws in enumerate(toks):
            sh = sorted(_shingles(ws, k_shingle))
            ids.extend([batch[id_col].iloc[i]] * len(sh))
            shs.extend(sh)
            sizes.extend([len(sh)] * len(sh))
        return pd.DataFrame({"shingle": shs, id_col: ids, "set_size": sizes})

    def common_in_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "size_a": [], "size_b": [],
                                 "common_partial": []})
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].tolist()
        sizes = g["set_size"].tolist()
        ra, rb, sa, sb = [], [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ra.append(ids[i]); rb.append(ids[j])
                sa.append(sizes[i]); sb.append(sizes[j])
        return pd.DataFrame({"id_a": ra, "id_b": rb, "size_a": sa, "size_b": sb,
                             "common_partial": np.ones(len(ra), dtype=np.int64)})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        common = int(g["common_partial"].sum())
        sa, sb = int(g["size_a"].iloc[0]), int(g["size_b"].iloc[0])
        jac = common / (sa + sb - common)
        if jac < threshold:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        return pd.DataFrame({"id_a": [g["id_a"].iloc[0]], "id_b": [g["id_b"].iloc[0]],
                             "jaccard": [round(jac, 6)]})

    pairs = (
        ds.map_batches(shingle_rows, batch_format="pandas")
        .groupby("shingle")
        .map_groups(common_in_group, batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(finalize, batch_format="pandas")
