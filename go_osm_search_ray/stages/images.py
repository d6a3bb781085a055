"""Multimodal (image) operators over the binary `bytes` column.

The input_hint table carries images as opaque binary + typed metadata
(image_id, bytes, w, h, fmt, caption, phash).  These stages are the
actor-pool `map_batches` plumbing a training-data pipeline needs:

- DecodeStats   — decode -> per-image pixel statistics + integrity check
- Resize        — decode -> nearest-neighbor resize -> re-encode
- AverageHash   — decode -> grayscale 8x8 average hash (a real phash)
- EmbedImage    — decode -> tiny deterministic feature vector (pooled
                  grid means) standing in for a vision model embedding

Decoding uses the repo's real PNG codec and the clearly-marked fake
lossy codec (go_osm_search_ray.codecs).  `ExternalCodec` marks where a
real image library would slot in (PIL/cv2 are not in this container):
it raises NotImplementedError for unknown formats — the Ray-side
schema, batch shapes, and actor signatures are real and tested.

All stages preserve the per-row invariant: `caption` (and any column
not being transformed) rides through untouched; Resize is the only
stage that rewrites `bytes` (and re-stamps w/h/fmt accordingly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codecs


def _decode(data: bytes, fmt: str) -> np.ndarray:
    try:
        return codecs.decode(data, fmt)
    except NotImplementedError:
        raise NotImplementedError(
            f"fmt {fmt!r} needs an external codec (PIL/libjpeg) — "
            "not available in this container; see stages/images.py"
        )


class DecodeStats:
    """Per-image pixel stats; `decode_ok` flags undecodable payloads."""

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_raw", None)
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        px, self._raw = decode_batch_uniform(batch, getattr(self, "_raw", None))
        if px is not None:
            n = batch.num_rows
            flat = px.reshape(n, -1)
            m = flat.mean(axis=1)
            s = flat.std(axis=1)
            return pa.table(
                {
                    "image_id": batch["image_id"],
                    "mean_pixel": pa.array(m, pa.float64()),
                    "std_pixel": pa.array(s, pa.float64()),
                    "decode_ok": pa.array(np.ones(n, dtype=bool), pa.bool_()),
                }
            )
        means, stds, ok = [], [], []
        for b, f in zip(batch["bytes"], batch["fmt"]):
            try:
                img = _decode(b.as_py(), f.as_py())
                means.append(float(img.mean()))
                stds.append(float(img.std()))
                ok.append(True)
            except (ValueError, NotImplementedError):
                means.append(0.0)
                stds.append(0.0)
                ok.append(False)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "mean_pixel": pa.array(means, pa.float64()),
                "std_pixel": pa.array(stds, pa.float64()),
                "decode_ok": pa.array(ok, pa.bool_()),
            }
        )


def decode_batch_uniform(
    batch: pa.Table, raw_buf: np.ndarray | None
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Batched fixed-layout decode for a batch whose rows share
    (w, h, fmt) — the overwhelmingly common case in a real corpus
    shard and the always case for the synthetic flagship table.

    Reads the Arrow binary column's offsets/data buffers directly
    (zero-copy; no ``to_pylist`` bytes materialization) and inflates
    every blob into ``raw_buf`` (caller-owned, reused across batches).
    Returns ``(pixels, raw_buf)`` with pixels a read-only
    (n, h, w, 3) uint8 view, or ``(None, raw_buf)`` when the batch is
    mixed / non-uniform / not our encoder's layout — callers fall back
    to the per-image ``_decode`` loop.
    """
    import pyarrow.compute as pc

    n = batch.num_rows
    if n == 0:
        return None, raw_buf
    wmm = pc.min_max(batch["w"]).as_py()
    hmm = pc.min_max(batch["h"]).as_py()
    if wmm["min"] != wmm["max"] or hmm["min"] != hmm["max"]:
        return None, raw_buf
    if batch["fmt"].null_count:
        return None, raw_buf
    fmts = set(pc.unique(batch["fmt"]).to_pylist())
    if not fmts <= {"png", "jpeg"}:
        return None, raw_buf
    w, h = wmm["min"], hmm["min"]

    arr = batch["bytes"].combine_chunks()
    if arr.null_count:
        return None, raw_buf
    bufs = arr.buffers()
    if bufs[2] is None:
        return None, raw_buf
    odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + n + 1]
    dat = np.frombuffer(bufs[2], dtype=np.uint8)
    starts = off[:-1].astype(np.int64)
    ends = off[1:].astype(np.int64)
    if "jpeg" in fmts:
        # fake-lossy container: 8-byte magic prefix, then a real PNG
        # (the quantization happened at encode time) — so a MIXED
        # png/jpeg batch still decodes in one batched pass with a
        # per-row prefix offset
        is_j = pc.equal(batch["fmt"], "jpeg").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        if ((ends - starts) < 57 + 8 * is_j).any():
            return None, raw_buf
        js = starts[is_j]
        magic = np.frombuffer(b"FAKEJPG0", np.uint8)
        for j in range(8):
            if not (dat[js + j] == magic[j]).all():
                return None, raw_buf
        starts = starts + 8 * is_j
    elif ((ends - starts) < 57).any():
        return None, raw_buf
    try:
        px, raw_buf = codecs.png_decode_batch(
            dat, starts, ends, w, h, out=raw_buf
        )
    except (ValueError, NotImplementedError):
        return None, raw_buf
    return px, raw_buf


def _resize_nn(img: np.ndarray, w: int, h: int) -> np.ndarray:
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[np.ix_(ys, xs)]


class DecodeSums:
    """Integer-exact per-image, per-channel pixel sums — the
    DuckDB-oracle-hashable decode proof (floats round differently across
    engines; integer sums cannot).  decode runs through the REAL codec;
    the SQL oracle reproduces the pixel math without ever decoding."""

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_raw", None)
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        px, self._raw = decode_batch_uniform(batch, getattr(self, "_raw", None))
        if px is not None:
            sums = px.sum(axis=(1, 2), dtype=np.int64)
        else:
            blobs = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            sums = np.zeros((n, 3), dtype=np.int64)
            for i in range(n):
                img = _decode(blobs[i], fmts[i]).astype(np.int64)
                sums[i] = img.sum(axis=(0, 1))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "sum_r": pa.array(sums[:, 0], pa.int64()),
                "sum_g": pa.array(sums[:, 1], pa.int64()),
                "sum_b": pa.array(sums[:, 2], pa.int64()),
            }
        )


class AverageHashInt:
    """Integer-exact 8x8 average hash over (r+g+b) sums: bit (y*8+x) is
    set iff 64*(r+g+b)[y,x] > sum of all (r+g+b) — no float grayscale,
    so the threshold comparison is exact and SQL-mirrorable.  The int64
    two's-complement packing matches the SQL v_lo - bit63*(2^63-1) -
    bit63 formulation bit-for-bit."""

    _POW2_63 = (np.int64(1) << np.arange(63, dtype=np.int64))

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_raw", None)
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        px, self._raw = decode_batch_uniform(batch, getattr(self, "_raw", None))
        if px is not None:
            h, w = px.shape[1:3]
            if (h, w) != (8, 8):
                ys = (np.arange(8) * h // 8).clip(0, h - 1)
                xs = (np.arange(8) * w // 8).clip(0, w - 1)
                px = px[:, ys[:, None], xs]  # same picks as _resize_nn
            g3 = px.sum(axis=3, dtype=np.int64).reshape(n, 64)
        else:
            blobs = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            imgs = [_decode(blobs[i], fmts[i]) for i in range(n)]
            if n and all(im.shape == (8, 8, 3) for im in imgs):
                g3 = np.stack(imgs).astype(np.int64).sum(axis=3).reshape(n, 64)
            else:
                g3 = np.empty((n, 64), dtype=np.int64)
                for i, img in enumerate(imgs):
                    small = _resize_nn(img.astype(np.int64), 8, 8)
                    g3[i] = small.sum(axis=2).reshape(64)
        total = g3.sum(axis=1, keepdims=True)
        bits = (64 * g3) > total
        v_lo = (bits[:, :63].astype(np.int64) * self._POW2_63[None, :]).sum(axis=1)
        b63 = bits[:, 63].astype(np.int64)
        vals = v_lo - b63 * np.int64(9223372036854775807) - b63
        return batch.append_column("ahash_int", pa.array(vals, pa.int64()))


class Resize:
    """Decode -> nearest-neighbor resize -> re-encode (always PNG out,
    lossless, so downstream invariants are exact)."""

    def __init__(self, w: int, h: int):
        self.w, self.h = w, h

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = []
        for b, f in zip(batch["bytes"], batch["fmt"]):
            img = _decode(b.as_py(), f.as_py())
            blobs.append(codecs.png_encode(_resize_nn(img, self.w, self.h)))
        n = batch.num_rows
        batch = batch.drop_columns(["bytes", "w", "h", "fmt"])
        return (
            batch.append_column("bytes", pa.array(blobs, pa.binary()))
            .append_column("w", pa.array([self.w] * n, pa.int32()))
            .append_column("h", pa.array([self.h] * n, pa.int32()))
            .append_column("fmt", pa.array(["png"] * n, pa.string()))
        )


class AverageHash:
    """8x8 grayscale average hash -> int64 column `ahash` (a real
    perceptual hash; near-dup images collide).

    Uniform batches (shared w/h/fmt — the flagship case) take the
    fully-batched path: one vectorized fixed-layout PNG parse, every
    inflate into a REUSED per-actor buffer, grayscale/threshold/packbits
    as whole-batch numpy ops with ``out=`` into reused buffers.  The
    MB-scale per-batch allocations this removes are the page-fault
    traffic that BASELINE.md measured as the non-scaling resource past
    ~8 workers.  Mixed batches fall back to the per-image decode."""

    _POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def __getstate__(self):
        d = self.__dict__.copy()
        for k in ("_raw", "_gray", "_bits"):
            d.pop(k, None)
        return d

    def _hash_flat(self, flat: np.ndarray) -> np.ndarray:
        """(n, 64) grayscale -> uint64 hashes (bit i weighted 2^i,
        identical to the POW2 dot product, via packbits)."""
        n = len(flat)
        bits = getattr(self, "_bits", None)
        if bits is None or bits.shape[0] < n:
            bits = self._bits = np.empty(
                (max(n, 4096), 64), dtype=np.bool_
            )
        np.greater(flat, flat.mean(axis=1, keepdims=True), out=bits[:n])
        return (
            np.packbits(bits[:n], axis=1, bitorder="little")
            .view(np.uint64)
            .ravel()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        px, raw = decode_batch_uniform(batch, getattr(self, "_raw", None))
        self._raw = raw
        if px is not None:
            h, w = px.shape[1:3]
            if (h, w) != (8, 8):
                ys = (np.arange(8) * h // 8).clip(0, h - 1)
                xs = (np.arange(8) * w // 8).clip(0, w - 1)
                px = px[:, ys[:, None], xs]  # same picks as _resize_nn
            gray = getattr(self, "_gray", None)
            if gray is None or gray.shape[0] < n:
                gray = self._gray = np.empty(
                    (max(n, 4096), 64), dtype=np.float32
                )
            flat = gray[:n]
            # channel sum on the strided view directly (no contiguous
            # copy of the pixel block), accumulated straight into the
            # reused f32 buffer
            px.sum(axis=3, dtype=np.float32, out=flat.reshape(n, 8, 8))
            flat /= 3  # f32 sum / 3 == .astype(f32).mean(axis=-1) bitwise
            vals = self._hash_flat(flat)
            return batch.append_column(
                "ahash", pa.array(vals.astype(np.int64), pa.int64())
            )
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        imgs = [_decode(blobs[i], fmts[i]) for i in range(n)]
        if n and all(im.shape == (8, 8, 3) for im in imgs):
            flat = (
                np.stack(imgs).astype(np.float32).mean(axis=3).reshape(n, 64)
            )
        else:
            smalls = np.empty((n, 8, 8), dtype=np.float32)
            for i, img in enumerate(imgs):
                gray = img.mean(axis=2, dtype=np.float32)
                smalls[i] = _resize_nn(gray[:, :, None], 8, 8)[:, :, 0]
            flat = smalls.reshape(n, 64)
        bits = flat > flat.mean(axis=1, keepdims=True)
        vals = (bits.astype(np.uint64) * self._POW2[None, :]).sum(axis=1)
        return batch.append_column(
            "ahash", pa.array(vals.astype(np.int64), pa.int64())
        )


class EdgeEnergy:
    """Integer GRADIENT-ENERGY (sharpness/blur) metric — the
    image-quality gate a multimodal training pipeline runs before
    keeping a sample: per image, sum of |Δ| of the channel-sum plane
    along x and y.  Low energy = flat/blurry, high = textured.
    Integer-exact (the oracle design rule): energy over
    s(x,y) = r+g+b needs no float at any step.

    Decode is per-image (zlib); uniform-shape batches stack ONCE and
    the two difference sums run batch-wide (the AverageHashInt
    pattern)."""

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_raw", None)
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        px, self._raw = decode_batch_uniform(batch, getattr(self, "_raw", None))
        if px is not None:
            s = px.sum(axis=3, dtype=np.int64)
            e = (np.abs(np.diff(s, axis=2)).sum(axis=(1, 2))
                 + np.abs(np.diff(s, axis=1)).sum(axis=(1, 2)))
            return batch.append_column(
                "edge_energy", pa.array(e.astype(np.int64), pa.int64()))
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        imgs = [_decode(blobs[i], fmts[i]) for i in range(n)]
        if n and all(im.shape == imgs[0].shape for im in imgs):
            s = np.stack(imgs).sum(axis=3, dtype=np.int64)
            e = (np.abs(np.diff(s, axis=2)).sum(axis=(1, 2))
                 + np.abs(np.diff(s, axis=1)).sum(axis=(1, 2)))
        else:
            e = np.zeros(n, dtype=np.int64)
            for i, im in enumerate(imgs):
                s = im.sum(axis=2, dtype=np.int64)
                e[i] = (np.abs(np.diff(s, axis=1)).sum()
                        + np.abs(np.diff(s, axis=0)).sum())
        return batch.append_column("edge_energy",
                                   pa.array(e.astype(np.int64), pa.int64()))


class SceneChanges:
    """VIDEO SCENE-CHANGE detection (the shot-boundary pass of a
    video-training pipeline): unpack the FVID container, decode every
    frame, and compare consecutive frames by integer L1 distance
    (sum over pixels of |Δr|+|Δg|+|Δb|); a CUT is a transition whose
    L1 exceeds the threshold.  Output per video: (video_id, n_cuts,
    total_l1) — all int64 (the oracle design rule).

    Per-video frame loop (containers are variable-length), but each
    frame pair compares as one whole-array numpy op."""

    def __init__(self, threshold: int):
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import codecs

        vids = batch["video_id"].to_pylist()
        n_cuts = np.zeros(len(vids), dtype=np.int64)
        total = np.zeros(len(vids), dtype=np.int64)
        for i, blob in enumerate(batch["bytes"].to_pylist()):
            frames = [codecs.png_decode(fb).astype(np.int64)
                      for fb in codecs.video_unpack(blob)]
            for a, b in zip(frames, frames[1:]):
                l1 = int(np.abs(a - b).sum())
                total[i] += l1
                if l1 > self.threshold:
                    n_cuts[i] += 1
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "n_cuts": pa.array(n_cuts, pa.int64()),
            "total_l1": pa.array(total, pa.int64()),
        })


class EmbedImageSums:
    """Integer-exact grid-pooled feature extraction (the oracle-able
    core of EmbedImage): per (grid_y, grid_x) block, per-channel pixel
    SUMS as int64, emitted LONG (one row per image x grid cell) so the
    driver can value-hash them.  EmbedImage's float embedding is these
    sums / block_pixels / 255."""

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_raw", None)
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        px, self._raw = decode_batch_uniform(batch, getattr(self, "_raw", None))
        if px is not None:
            n = batch.num_rows
            h, w = px.shape[1:3]
            s = np.empty((n, g, g, 3), dtype=np.int64)
            for yi in range(g):  # g*g batched cell sums, not n loops
                ys = slice(yi * h // g, max(yi * h // g + 1, (yi + 1) * h // g))
                for xi in range(g):
                    xs = slice(xi * w // g,
                               max(xi * w // g + 1, (xi + 1) * w // g))
                    s[:, yi, xi] = px[:, ys, xs].sum(
                        axis=(1, 2), dtype=np.int64)
            id_np = np.asarray(batch["image_id"].to_pylist(), dtype=object)
            ids = np.repeat(id_np, g * g)
            gys = np.tile(np.repeat(np.arange(g, dtype=np.int64), g), n)
            gxs = np.tile(np.arange(g, dtype=np.int64), g * n)
            s = s.reshape(-1, 3)
            return pa.table(
                {
                    "image_id": pa.array(ids, pa.string()),
                    "grid_y": pa.array(gys, pa.int64()),
                    "grid_x": pa.array(gxs, pa.int64()),
                    "sum_r": pa.array(s[:, 0], pa.int64()),
                    "sum_g": pa.array(s[:, 1], pa.int64()),
                    "sum_b": pa.array(s[:, 2], pa.int64()),
                }
            )
        ids, gys, gxs, sums = [], [], [], []
        for iid, blob, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            img = _decode(blob, fmt).astype(np.int64)
            h, w = img.shape[:2]
            for yi in range(g):
                ys = slice(yi * h // g, max(yi * h // g + 1, (yi + 1) * h // g))
                for xi in range(g):
                    xs = slice(xi * w // g,
                               max(xi * w // g + 1, (xi + 1) * w // g))
                    ids.append(iid)
                    gys.append(yi)
                    gxs.append(xi)
                    sums.append(img[ys, xs].sum(axis=(0, 1)))
        s = np.asarray(sums, dtype=np.int64).reshape(-1, 3)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "grid_y": pa.array(gys, pa.int64()),
                "grid_x": pa.array(gxs, pa.int64()),
                "sum_r": pa.array(s[:, 0], pa.int64()),
                "sum_g": pa.array(s[:, 1], pa.int64()),
                "sum_b": pa.array(s[:, 2], pa.int64()),
            }
        )


class EmbedImage:
    """Deterministic stand-in for batched vision-model inference: 4x4
    grid-pooled RGB means -> 48-dim float32 vector.  Swap `__call__`'s
    body for a real model (loaded once HERE in __init__) outside the
    sandbox."""

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_raw", None)
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        px, self._raw = decode_batch_uniform(batch, getattr(self, "_raw", None))
        if px is not None:
            n = batch.num_rows
            h, w = px.shape[1:3]
            pooled = np.empty((n, g, g, 3), np.float32)
            for yi in range(g):  # g*g batched cell means, not n loops
                ys = slice(yi * h // g, max(yi * h // g + 1, (yi + 1) * h // g))
                for xi in range(g):
                    xs = slice(xi * w // g,
                               max(xi * w // g + 1, (xi + 1) * w // g))
                    pooled[:, yi, xi] = (
                        px[:, ys, xs].astype(np.float32).mean(axis=(1, 2))
                    )
            vecs = (pooled.reshape(n, -1) / 255.0)
            return batch.append_column(
                "embedding",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel(), pa.float32()), g * g * 3
                ).cast(pa.list_(pa.float32())),
            )
        vecs = []
        for b, f in zip(batch["bytes"], batch["fmt"]):
            img = _decode(b.as_py(), f.as_py()).astype(np.float32)
            h, w = img.shape[:2]
            pooled = np.zeros((g, g, 3), np.float32)
            for yi in range(g):
                for xi in range(g):
                    ys = slice(yi * h // g, max(yi * h // g + 1, (yi + 1) * h // g))
                    xs = slice(xi * w // g, max(xi * w // g + 1, (xi + 1) * w // g))
                    pooled[yi, xi] = img[ys, xs].mean(axis=(0, 1))
            vecs.append((pooled.ravel() / 255.0).tolist())
        return batch.append_column(
            "embedding", pa.array(vecs, pa.list_(pa.float32()))
        )


class FrameSample:
    """Video frame sampling: unpack the FVID container, keep every
    `stride`-th frame, EXPLODE to one row per sampled frame
    (video_id, frame_idx, bytes, fmt) — the map_batches leg a video
    pipeline hangs decode/feature stages off.  The container layer is
    real; a real video codec slots in at the frame-decode boundary
    exactly like JPEG (codecs module docstring)."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import codecs

        vids, idxs, blobs = [], [], []
        for vid, data in zip(batch["video_id"].to_pylist(),
                             batch["bytes"].to_pylist()):
            frames = codecs.video_unpack(data)
            for fi in range(0, len(frames), self.stride):
                vids.append(vid)
                idxs.append(fi)
                blobs.append(frames[fi])
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "bytes": pa.array(blobs, pa.binary()),
                "fmt": pa.array(["png"] * len(vids), pa.string()),
            }
        )


class AudioFeatures:
    """PCM16 feature extraction, integer-exact (SQL-hashable): decoded
    sample count, sum of absolute amplitudes, zero crossings (strict
    sign changes), peak amplitude."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import codecs

        n, sab, zc, pk = [], [], [], []
        for data in batch["bytes"].to_pylist():
            s = codecs.pcm16_decode(data).astype(np.int64)
            n.append(len(s))
            sab.append(int(np.abs(s).sum()))
            zc.append(int(((s[:-1] < 0) != (s[1:] < 0)).sum()) if len(s) > 1 else 0)
            pk.append(int(np.abs(s).max()) if len(s) else 0)
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "n_samples": pa.array(n, pa.int64()),
                "sum_abs": pa.array(sab, pa.int64()),
                "zero_crossings": pa.array(zc, pa.int64()),
                "peak": pa.array(pk, pa.int64()),
            }
        )


class PayloadInvariantError(AssertionError):
    pass


def with_payload_invariant(stage_fn, psnr_min: float = 40.0):
    """Wrap a batch-level image stage with the north-rule per-row
    invariant: for every image_id the stage emits, `caption` must equal
    the input's caption, and if the stage rewrote `bytes` the decoded
    pixels must match the input's at PSNR >= psnr_min (exact payloads
    short-circuit on byte equality).  Raises PayloadInvariantError
    inside the worker, failing the pipeline loudly.

    Opt-in (flagship `check_invariants=True`): the check decodes every
    image twice, so it is a validation mode, not the hot path."""
    from .. import codecs

    def wrapped(batch: pa.Table) -> pa.Table:
        in_cols = batch.column_names
        has_bytes = "bytes" in in_cols
        has_cap = "caption" in in_cols
        before = {
            batch["image_id"][i].as_py(): (
                batch["bytes"][i].as_py() if has_bytes else None,
                batch["fmt"][i].as_py() if has_bytes else None,
                batch["caption"][i].as_py() if has_cap else None,
            )
            for i in range(batch.num_rows)
        }
        out = stage_fn(batch)
        cols = out.column_names
        for i in range(out.num_rows):
            iid = out["image_id"][i].as_py()
            b0, f0, c0 = before[iid]
            if has_cap and "caption" in cols and out["caption"][i].as_py() != c0:
                raise PayloadInvariantError(f"caption changed for {iid}")
            if has_bytes and "bytes" in cols:
                b1 = out["bytes"][i].as_py()
                f1 = out["fmt"][i].as_py() if "fmt" in cols else f0
                if b1 != b0:
                    p = codecs.psnr(codecs.decode(b0, f0), codecs.decode(b1, f1))
                    if p < psnr_min:
                        raise PayloadInvariantError(
                            f"PSNR {p:.1f} dB < {psnr_min} for {iid}"
                        )
        return out

    return wrapped


# Stage wrappers run TASK MODE by default (concurrency=None): the
# constructors are trivial (no broadcast side table), the per-process
# cache keeps one compiled instance per worker, and a stateless task
# pool is elastic over every CPU — an explicit (1, 4) pool throttled
# these stages to 4 workers on a 32-CPU box.  Pass an explicit
# concurrency to pin an actor pool (e.g. for a real model with a slow
# load, sized (1, NUM_CPUS)).


def _stage(images_ds, cls, batch_size, concurrency, key, **ctor):
    if concurrency is None:
        from .knn import cached_state

        def fn(batch: pa.Table) -> pa.Table:
            return cached_state(key, lambda: cls(**ctor))(batch)

        return images_ds.map_batches(fn, batch_format="pyarrow",
                                     batch_size=batch_size)
    return images_ds.map_batches(
        cls, fn_constructor_kwargs=ctor or None,
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_stats(images_ds, concurrency=None, batch_size: int = 1024):
    return _stage(images_ds, DecodeStats, batch_size, concurrency, "img/stats")


def resize(images_ds, w: int, h: int, concurrency=None, batch_size: int = 512):
    return _stage(images_ds, Resize, batch_size, concurrency,
                  f"img/resize/{w}x{h}", w=w, h=h)


def average_hash(images_ds, concurrency=None, batch_size: int = 1024):
    return _stage(images_ds, AverageHash, batch_size, concurrency, "img/ahash")


def embed_images(images_ds, concurrency=None, batch_size: int = 512):
    return _stage(images_ds, EmbedImage, batch_size, concurrency, "img/embed")
