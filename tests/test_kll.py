"""KLL quantile sketch: rank-error bound, merge accuracy, determinism,
and the grouped distributed path vs exact quantiles."""

import numpy as np
import pandas as pd
import pytest

from go_osm_search_ray.stages.sketch import KLL, grouped_quantiles_sketch


def rank_of(sorted_vals, x):
    return np.searchsorted(sorted_vals, x, side="right") / len(sorted_vals)


def test_kll_rank_error_bound():
    rng = np.random.RandomState(9)
    vals = rng.lognormal(0, 2, 200_000)
    sk = KLL(256)
    for chunk in np.array_split(vals, 37):
        sk.add_many(chunk)
    sv = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = sk.quantile(q)
        assert abs(rank_of(sv, est) - q) < 0.02, q
    assert sk.n == len(vals)
    # bounded memory: total retained items ~ k * levels
    assert sum(len(b) for b in sk.levels) < 256 * 20


def test_kll_merge_matches_single_build_accuracy():
    rng = np.random.RandomState(4)
    a = rng.normal(0, 1, 60_000)
    b = rng.normal(5, 3, 40_000)
    parts = [KLL(256).add_many(x) for x in
             (a[:30_000], a[30_000:], b[:10_000], b[10_000:])]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    sv = np.sort(np.concatenate([a, b]))
    for q in (0.1, 0.5, 0.9):
        assert abs(rank_of(sv, merged.quantile(q)) - q) < 0.025, q
    assert merged.n == 100_000


def test_kll_deterministic_same_order():
    rng = np.random.RandomState(1)
    vals = rng.uniform(0, 1, 50_000)
    q1 = [KLL(128).add_many(vals).quantile(q) for q in (0.5, 0.9)]
    q2 = [KLL(128).add_many(vals).quantile(q) for q in (0.5, 0.9)]
    assert q1 == q2


def test_grouped_quantiles_sketch_vs_exact(ray_session):
    import ray

    rng = np.random.RandomState(2)
    n = 30_000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "v": rng.exponential(10, n),
    })
    out = grouped_quantiles_sketch(
        ray.data.from_pandas(df).repartition(8), ["g"], "v",
        qs=(0.5, 0.9)).set_index("g")
    for g, sub in df.groupby("g"):
        sv = np.sort(sub["v"].to_numpy())
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            assert abs(rank_of(sv, out.loc[g, col]) - q) < 0.03
        assert out.loc[g, "n"] == len(sub)
