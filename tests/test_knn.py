"""KNN vs scipy.spatial.cKDTree — ports the reference's oracle test
strategy (src/test/kdtree_test.cpp brute-force oracle;
python_test.py:200-257 scipy cross-check; kdtree_synthetic_test.cpp
adversarial distributions)."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.ops.knn import KdTree, brute_force_knn_numpy


def _check_vs_scipy(target, query, k, capacity=2048):
    # Pad everything to one static capacity: a single XLA program serves
    # every distribution (the sentinel-padding design), which also keeps
    # this test to one compilation per k.
    tree = KdTree.build(PointCloud.from_points(target, capacity=capacity))
    qpad = np.full((capacity, 3), 1e9)
    qpad[: len(query)] = query
    d, i = tree.knn_search(qpad, k)
    d = np.asarray(d)[: len(query)]
    i = np.asarray(i)[: len(query)]
    ref = cKDTree(target)
    rd, ri = ref.query(query, k=k)
    if k == 1:
        rd, ri = rd[:, None], ri[:, None]
    assert np.allclose(np.sqrt(np.maximum(d, 0.0)), rd, atol=1e-6), "distances differ"
    # Indices may differ only at exact ties (duplicate points /
    # equidistant neighbors): where they mismatch, both candidates must
    # be equidistant from the query.
    mism = i != ri
    if mism.any():
        qrep = np.repeat(query[:, None, :], k, axis=1)  # [Q,k,3]
        d_ours = np.sum((target[i] - qrep) ** 2, axis=-1)
        d_ref = np.sum((target[ri] - qrep) ** 2, axis=-1)
        assert np.allclose(d_ours[mism], d_ref[mism], atol=1e-9), "index mismatch not a tie"


# Synthetic distributions modeled on kdtree_synthetic_test.cpp:26-93.
def _distributions(rng):
    return {
        "uniform": rng.uniform(-10, 10, size=(2000, 3)),
        "large_scale": rng.uniform(-1e4, 1e4, size=(1000, 3)),
        "bimodal": np.concatenate(
            [rng.normal(-5, 0.5, size=(500, 3)), rng.normal(5, 0.5, size=(500, 3))]
        ),
        "duplicated": np.round(rng.uniform(-5, 5, size=(800, 3))),
        "tiny5": rng.normal(size=(5, 3)),
        "tiny10": rng.normal(size=(10, 3)),
    }


@pytest.mark.parametrize("k", [1, 5, 20])
def test_knn_vs_scipy_distributions(rng, k):
    dists = _distributions(rng)
    for name_t, target in dists.items():
        for name_q, query in dists.items():
            if k > len(target):
                continue
            _check_vs_scipy(target, query, k)


def test_knn_padded_target_excluded(rng):
    pts = rng.normal(size=(100, 3))
    padded = KdTree.build(PointCloud.from_points(pts, capacity=256))
    exact = KdTree.build(PointCloud.from_points(pts))
    q = rng.normal(size=(50, 3))
    d1, i1 = padded.knn_search(q, 5)
    d2, i2 = exact.knn_search(q, 5)
    assert np.allclose(np.asarray(d1), np.asarray(d2))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def test_knn_fewer_points_than_k(rng):
    pts = rng.normal(size=(3, 3))
    tree = KdTree.build(PointCloud.from_points(pts, capacity=8))
    d, i = tree.knn_search(rng.normal(size=(4, 3)), 5)
    d = np.asarray(d)
    # First 3 neighbors real, rest are sentinel hits with huge distances.
    assert np.all(d[:, :3] < 1e3)
    assert np.all(d[:, 3:] > 1e16)


@pytest.mark.smoke
def test_single_query(rng):
    pts = rng.normal(size=(50, 3))
    tree = KdTree.build(PointCloud.from_points(pts))
    d, i = tree.knn_search(pts[7], 1)
    assert int(i[0]) == 7
    assert float(d[0]) < 1e-12


@pytest.mark.smoke
def test_nearest_neighbor_matches_knn1(rng):
    pts = rng.normal(size=(300, 3))
    q = rng.normal(size=(100, 3))
    tree = KdTree.build(PointCloud.from_points(pts))
    d1, i1 = tree.nearest_neighbor_search(q)
    d2, i2 = tree.knn_search(q, 1)
    assert np.allclose(np.asarray(d1), np.asarray(d2)[:, 0])
    assert np.array_equal(np.asarray(i1), np.asarray(i2)[:, 0])


def test_numpy_oracle_consistency(rng):
    target = rng.normal(size=(200, 3))
    query = rng.normal(size=(40, 3))
    d_o, i_o = brute_force_knn_numpy(target, query, 3)
    tree = KdTree.build(PointCloud.from_points(target))
    d, i = tree.knn_search(query, 3)
    assert np.allclose(np.asarray(d), d_o, atol=1e-9)
    assert np.array_equal(np.asarray(i), i_o)


@pytest.mark.smoke
def test_knn_sorted_ascending(rng):
    target = rng.normal(size=(500, 3))
    tree = KdTree.build(PointCloud.from_points(target))
    d, _ = tree.knn_search(rng.normal(size=(50, 3)), 10)
    d = np.asarray(d)
    assert np.all(np.diff(d, axis=1) >= -1e-12)
