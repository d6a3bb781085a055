"""Mergeable sketches — the bounded-memory path for distinct-count
style aggregates a 100 TB corpus cannot answer exactly without a
pair-space shuffle.

HyperLogLog here is the classic Flajolet et al. 2007 estimator with
the standard small-range (linear counting) correction: 2^p byte
registers, register index = low p bits of a 64-bit md5-derived hash,
rank = leading-zero count of the remaining bits + 1.  Registers are
np.maximum-mergeable, so the Ray plan is the guide's sketch pattern:
one serialized sketch row per (key, batch) from map_batches, then a
tiny groupby that merges registers — shuffle volume is
O(keys x blocks x 2^p bytes), independent of value cardinality.

Relative error ~ 1.04 / sqrt(2^p): p=12 (4 KiB) -> ~1.6%.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _hash64_values(values) -> np.ndarray:
    """Process-independent 64-bit hashes (md5 low 8 bytes, LE)."""
    return np.array(
        [int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little")
         for v in values],
        dtype=np.uint64,
    )


def hll_registers(values, p: int = 12) -> np.ndarray:
    """uint8 register vector for one value set (vectorized)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64_values(values)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(p)
    # rank = leading position of the first 1 bit in the (64-p)-bit rest,
    # counted from the LSB side of the shifted value's top: use the
    # standard "number of leading zeros + 1" on the (64-p)-bit field
    nbits = 64 - p
    rank = np.full(len(h), nbits + 1, dtype=np.uint8)
    nz = rest != 0
    # floor(log2(rest)) via float exponent is exact for < 2^53; rest can
    # reach 2^52 at p=12 — keep exact with bit_length per element only
    # for the tail above 2^52
    rl = np.zeros(len(h), dtype=np.int64)
    small = rest < np.uint64(1 << 52)
    with np.errstate(divide="ignore"):
        rl[small & nz] = np.floor(
            np.log2(rest[small & nz].astype(np.float64))
        ).astype(np.int64)
    for i in np.nonzero(~small & nz)[0]:
        rl[i] = int(rest[i]).bit_length() - 1
    rank[nz] = (nbits - 1 - rl[nz] + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with linear-counting small range."""
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_count_distinct(ds, key_cols: list[str], value_col: str,
                          p: int = 12):
    """Approximate COUNT(DISTINCT value) per key group via mergeable
    HLL sketches: one sketch row per (key, batch) -> bucketed merge
    (np.maximum over registers) -> estimate.  Returns a Dataset of
    key_cols + approx_distinct (int64)."""
    from .agg import bucketed_group_apply

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in b.groupby(key_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            rows.append((*key, hll_registers(g[value_col].unique(), p).tobytes()))
        return pd.DataFrame(rows, columns=[*key_cols, "sketch"])

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, grp in g.groupby(key_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            regs = np.zeros(1 << p, dtype=np.uint8)
            for sk in grp["sketch"]:
                regs = np.maximum(regs, np.frombuffer(sk, dtype=np.uint8))
            out.append((*key, int(round(hll_estimate(regs)))))
        return pd.DataFrame(out, columns=[*key_cols, "approx_distinct"])

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_group_apply(partials, key_cols, merge_bucket)
