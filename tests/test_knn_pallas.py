"""Pallas fused 1-NN kernel vs the XLA brute-force oracle.

Runs in Pallas interpreter mode on the CPU test backend (the compiled
kernel needs a real TPU); the kernel logic — tiling, running argmin,
tie-breaking — is identical either way.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from small_gicp_tpu.ops.knn import brute_force_knn_numpy
from small_gicp_tpu.ops.knn_pallas import nearest_neighbor_pallas
from small_gicp_tpu.point_cloud import PAD_SENTINEL


def _pad4(xyz, capacity):
    n = xyz.shape[0]
    out = np.full((capacity, 4), PAD_SENTINEL, np.float32)
    out[:, 3] = 0.0
    out[:n, :3] = xyz
    out[:n, 3] = 1.0
    return out


@pytest.mark.parametrize("n,q", [(1000, 700), (513, 513), (64, 2000)])
def test_pallas_nn_matches_bruteforce(rng, n, q):
    tgt = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    qry = rng.uniform(-50, 50, (q, 3)).astype(np.float32)
    t4 = _pad4(tgt, ((n + 255) // 256) * 256)
    q4 = _pad4(qry, q)

    d, i = nearest_neighbor_pallas(
        jnp.asarray(t4), jnp.asarray(q4), block_q=256, block_m=512,
        interpret=True,
    )
    d_ref, i_ref = brute_force_knn_numpy(tgt.astype(np.float64), qry.astype(np.float64), 1)

    np.testing.assert_array_equal(np.asarray(i), i_ref[:, 0])
    np.testing.assert_allclose(np.asarray(d), d_ref[:, 0], rtol=1e-4, atol=1e-4)


@pytest.mark.smoke
def test_pallas_nn_duplicate_points_tiebreak(rng):
    """Duplicated targets: first index wins, as with jnp.argmin."""
    base = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    tgt = np.concatenate([base, base], axis=0)  # duplicates at i and i+100
    qry = base + rng.normal(scale=1e-4, size=base.shape).astype(np.float32)
    t4 = _pad4(tgt, 256)
    q4 = _pad4(qry, 128)
    d, i = nearest_neighbor_pallas(
        jnp.asarray(t4), jnp.asarray(q4), block_q=128, block_m=256,
        interpret=True,
    )
    i = np.asarray(i)[:100]
    assert np.all(i < 100), "later duplicate must not win a distance tie"
    np.testing.assert_array_equal(i, np.arange(100))


def test_pallas_nn_far_from_origin(rng):
    """Centering guard: clouds far from the origin keep exact argmin."""
    tgt = rng.uniform(995, 1005, (512, 3)).astype(np.float32)
    qry = tgt[:256] + rng.normal(scale=0.01, size=(256, 3)).astype(np.float32)
    d, i = nearest_neighbor_pallas(
        jnp.asarray(_pad4(tgt, 512)), jnp.asarray(_pad4(qry, 256)),
        block_q=128, block_m=256, interpret=True,
    )
    d_ref, i_ref = brute_force_knn_numpy(tgt.astype(np.float64), qry.astype(np.float64), 1)
    np.testing.assert_array_equal(np.asarray(i), i_ref[:, 0])


@pytest.mark.parametrize("k", [2, 5, 20])
def test_pallas_knn_matches_bruteforce(rng, k):
    tgt = rng.uniform(-50, 50, (700, 3)).astype(np.float32)
    qry = rng.uniform(-50, 50, (300, 3)).astype(np.float32)
    t4 = _pad4(tgt, 768)
    q4 = _pad4(qry, 300)

    from small_gicp_tpu.ops.knn_pallas import knn_pallas

    d, i = knn_pallas(
        jnp.asarray(t4), jnp.asarray(q4), k, block_q=128, block_m=256,
        interpret=True,
    )
    d_ref, i_ref = brute_force_knn_numpy(
        tgt.astype(np.float64), qry.astype(np.float64), k
    )
    np.testing.assert_array_equal(np.asarray(i), i_ref)
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.smoke
def test_pallas_knn_duplicates_tie_order(rng):
    base = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    tgt = np.concatenate([base, base], axis=0)  # duplicate at i and i+64
    qry = base
    from small_gicp_tpu.ops.knn_pallas import knn_pallas

    d, i = knn_pallas(
        jnp.asarray(_pad4(tgt, 128)), jnp.asarray(_pad4(qry, 64)),
        2, block_q=64, block_m=64, interpret=True,
    )
    i = np.asarray(i)
    # exact duplicates: neighbor 0 is the lower index, neighbor 1 the copy
    np.testing.assert_array_equal(i[:, 0], np.arange(64))
    np.testing.assert_array_equal(i[:, 1], np.arange(64) + 64)


def test_pallas_knn_small_cloud_padding(rng):
    """k larger than the real cloud: real points come first, pads carry
    sentinel-sized distances (same contract as brute_force_knn)."""
    tgt = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
    qry = tgt
    from small_gicp_tpu.ops.knn_pallas import knn_pallas

    d, i = knn_pallas(
        jnp.asarray(_pad4(tgt, 8)), jnp.asarray(_pad4(qry, 8)),
        5, block_q=8, block_m=8, interpret=True,
    )
    d = np.asarray(d)[:3]
    i = np.asarray(i)[:3]
    assert np.all(d[:, :3] < 100.0)
    assert np.all(d[:, 3:] > 1e16)
    np.testing.assert_array_equal(i[:, 0], np.arange(3))


@pytest.mark.smoke
def test_pruned_knn_matches_bruteforce(rng):
    """knn_pallas_pruned: exact parity with brute force on coherent and
    adversarial clouds (interpret mode; the compiled kernel is covered
    by the TPU lane / bench selfcheck)."""
    from small_gicp_tpu.ops.knn_pallas import knn_pallas_pruned

    # coherent LiDAR-ish target, queries = jittered subset (self-like)
    m, qn, k = 1500, 700, 10
    tp = rng.uniform(-20, 20, size=(m, 3)).astype(np.float32)
    tp[:, 2] = np.sin(tp[:, 0] * 0.4) + 0.05 * rng.normal(size=m)
    qp = tp[rng.permutation(m)[:qn]] + rng.normal(
        scale=0.05, size=(qn, 3)
    ).astype(np.float32)
    d, i = knn_pallas_pruned(
        jnp.asarray(np.c_[tp, np.ones(m, np.float32)]),
        jnp.asarray(np.c_[qp, np.ones(qn, np.float32)]),
        k, interpret=True,
    )
    d_ref, i_ref = brute_force_knn_numpy(
        tp.astype(np.float64), qp.astype(np.float64), k
    )
    assert np.array_equal(np.asarray(i), i_ref)
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.smoke
def test_pruned_knn_duplicates_and_padding(rng):
    from small_gicp_tpu.ops.knn_pallas import knn_pallas_pruned
    from small_gicp_tpu.point_cloud import PointCloud

    # exact duplicates: tie order must match brute force (lowest index)
    base = rng.uniform(-3, 3, size=(40, 3)).astype(np.float32)
    tp = np.concatenate([base, base, base])  # every point x3
    cloud = PointCloud.from_points(tp).with_capacity(160)  # padded target
    q = base[:16] + 0.01
    d, i = knn_pallas_pruned(
        cloud.points, jnp.asarray(np.c_[q, np.ones(16, np.float32)]),
        6, interpret=True,
    )
    d_ref, i_ref = brute_force_knn_numpy(
        tp.astype(np.float64), q.astype(np.float64), 6
    )
    assert np.array_equal(np.asarray(i), i_ref)
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("shape", [(3000, 2300, 20), (1000, 1000, 10)])
def test_knn_pallas_T_matches_reference_kernel(rng, shape):
    """The transposed-layout dense top-k (queries on lanes, sublane
    reductions) must be BIT-identical to knn_pallas — indices and
    distances — including on tie-heavy integer grids."""
    from small_gicp_tpu.ops.knn_pallas import knn_pallas, knn_pallas_T

    m, q, k = shape
    if shape[0] == 1000:  # adversarial: exact duplicate distances
        tp = rng.integers(0, 8, (m, 3)).astype(np.float32)
        qp = tp[:q]
    else:
        tp = rng.uniform(-10, 10, (m, 3)).astype(np.float32)
        qp = rng.uniform(-10, 10, (q, 3)).astype(np.float32)
    t4 = jnp.concatenate(
        [jnp.asarray(tp), jnp.ones((m, 1), jnp.float32)], axis=1
    )
    d_t, i_t = knn_pallas_T(t4, jnp.asarray(qp), k, interpret=True)
    d_r, i_r = knn_pallas(t4, jnp.asarray(qp), k, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_r))
    np.testing.assert_array_equal(np.asarray(d_t), np.asarray(d_r))
