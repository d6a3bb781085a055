"""SemDeDup: planted within-cluster duplicates are collapsed to the
min id; near-identical vectors that land in DIFFERENT clusters are
both kept (the cluster-scoped bargain)."""

import numpy as np
import pandas as pd
import pytest

from go_osm_search_ray.stages import embed


def test_semantic_dedup_planted(ray_session):
    import ray

    rng = np.random.RandomState(3)
    d = 16
    # two well-separated cluster centers
    c0 = np.zeros(d); c0[0] = 10.0
    c1 = np.zeros(d); c1[1] = 10.0
    rows = []
    # cluster 0: ids 0..9 tight near-dups (cosine ~1), ids 10..14 spread
    for i in range(10):
        rows.append((i, c0 + rng.normal(0, 0.01, d)))
    for i in range(10, 15):
        v = c0 + rng.normal(0, 3.0, d)
        rows.append((i, v))
    # cluster 1: ids 100..104 independent
    for i in range(100, 105):
        rows.append((i, c1 + rng.normal(0, 3.0, d)))
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows])
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat)})
    cents = np.stack([c0, c1])

    kept = embed.semantic_dedup(
        ray.data.from_pandas(df).repartition(3), cents, threshold=0.99
    ).to_pandas().sort_values("vec_id")

    # the 10 planted dups collapse to id 0; everything else survives
    assert 0 in set(kept["vec_id"])
    assert not (set(range(1, 10)) & set(kept["vec_id"]))
    assert set(range(100, 105)) <= set(kept["vec_id"])
    # cluster column reflects the assignment
    assert (kept.loc[kept["vec_id"] < 100, "cluster"] == 0).all()
    assert (kept.loc[kept["vec_id"] >= 100, "cluster"] == 1).all()


def test_semantic_dedup_cross_cluster_pairs_survive(ray_session):
    import ray

    d = 8
    # two identical vectors placed on opposite sides of the centroid
    # boundary: SemDeDup must NOT compare them (different clusters)
    v = np.ones(d)
    c0 = np.ones(d) * 0.9
    c1 = np.ones(d) * 1.1
    df = pd.DataFrame({
        "vec_id": np.array([1, 2], dtype=np.int64),
        "embedding": [v * 0.95, v * 1.15],  # same direction, cosine 1.0
    })
    kept = embed.semantic_dedup(
        ray.data.from_pandas(df), np.stack([c0, c1]), threshold=0.9
    ).to_pandas()
    assert set(kept["vec_id"]) == {1, 2}


def test_kmeans_lloyd_ds_bit_equals_local(ray_session):
    import ray

    rng = np.random.RandomState(5)
    n, d, k = 400, 12, 6
    mat = rng.normal(0, 1, (n, d)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat)})
    exp = embed.kmeans_lloyd_local(np.asarray(mat, dtype=np.float64),
                                   ids, k, iters=4)
    # different block layouts must produce BIT-IDENTICAL centroids
    for parts in (1, 3, 8):
        got, shifts = embed.kmeans_lloyd_ds(
            ray.data.from_pandas(df).repartition(parts), k, iters=4)
        assert np.array_equal(got, exp)
    assert shifts[0] > 0  # the iterations actually moved the centroids
