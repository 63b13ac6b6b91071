"""Normal/covariance estimation semantics (reference:
util/normal_estimation.hpp + src/test/normal_estimation_test.cpp)."""

import numpy as np
import jax.numpy as jnp

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.ops.normals import (
    estimate_covariances,
    estimate_normals,
    estimate_normals_covariances,
)


def _plane_cloud(rng, n=500, normal=(0.0, 0.0, 1.0), offset=5.0):
    """Points on a plane at distance `offset` from origin along `normal`."""
    normal = np.asarray(normal) / np.linalg.norm(normal)
    # Tangent basis.
    a = np.array([1.0, 0.0, 0.0])
    if abs(normal[0]) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    u = np.cross(normal, a)
    u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    uv = rng.uniform(-2, 2, size=(n, 2))
    return offset * normal + uv[:, :1] * u + uv[:, 1:] * v


def test_plane_normals(rng):
    plane_n = np.array([1.0, 2.0, 2.0]) / 3.0
    pts = _plane_cloud(rng, normal=plane_n)
    cloud = estimate_normals(PointCloud.from_points(pts), num_neighbors=20)
    normals = cloud.normals_numpy()[:, :3]
    dots = normals @ plane_n
    assert np.all(np.abs(np.abs(dots) - 1.0) < 1e-6)
    # Sign convention: normal·point <= 0 (flipped toward viewpoint origin,
    # normal_estimation.hpp:20-24).
    assert np.all(np.sum(normals * pts, axis=1) <= 1e-9)


def test_plane_covariances(rng):
    pts = _plane_cloud(rng)
    cloud = estimate_covariances(PointCloud.from_points(pts), num_neighbors=20)
    covs = cloud.covs_numpy()
    vals = np.linalg.eigvalsh(covs)
    # Regularized spectrum is exactly (1e-3, 1, 1) (normal_estimation.hpp:41).
    assert np.allclose(vals[:, 0], 1e-3, atol=1e-9)
    assert np.allclose(vals[:, 1:], 1.0, atol=1e-9)


def test_insufficient_neighbors_invalid(rng):
    # 3 points < 5 minimum → zero normal, identity cov
    # (normal_estimation.hpp:71-75).
    pts = rng.normal(size=(3, 3))
    cloud = estimate_normals_covariances(
        PointCloud.from_points(pts, capacity=16), num_neighbors=10
    )
    assert np.allclose(cloud.normals_numpy(), 0.0)
    assert np.allclose(cloud.covs_numpy(), np.eye(3))


def test_both_matches_individual(rng):
    pts = rng.normal(size=(300, 3)) * 2.0
    c0 = PointCloud.from_points(pts)
    both = estimate_normals_covariances(c0, num_neighbors=15)
    n_only = estimate_normals(c0, num_neighbors=15)
    c_only = estimate_covariances(c0, num_neighbors=15)
    assert np.allclose(np.asarray(both.normals), np.asarray(n_only.normals))
    assert np.allclose(np.asarray(both.covs), np.asarray(c_only.covs))


def test_padding_rows_invalid(rng):
    pts = rng.normal(size=(100, 3))
    cloud = estimate_normals_covariances(
        PointCloud.from_points(pts, capacity=256), num_neighbors=10
    )
    normals = np.asarray(cloud.normals)
    covs = np.asarray(cloud.covs)
    assert np.allclose(normals[100:], 0.0)
    assert np.allclose(covs[100:], np.eye(3))


def test_cov_moment_formula(rng):
    """Cross-check the unregularized neighborhood covariance against a
    direct numpy computation on a small cloud (k = all points)."""
    from small_gicp_tpu.ops.eigh3 import eigh3x3
    from small_gicp_tpu.ops.knn import brute_force_knn

    pts = rng.normal(size=(30, 3))
    k = 30
    # Mirror the implementation's masked-moment path.
    d, idx = brute_force_knn(jnp.asarray(pts), jnp.asarray(pts), k)
    neigh = pts[np.asarray(idx)]
    mean = neigh.mean(axis=1)
    cov_np = (
        np.einsum("nkd,nke->nde", neigh, neigh) / k
        - mean[:, :, None] * mean[:, None, :]
    )
    # Each neighborhood = the full cloud, so all covs equal the cloud cov.
    cloud_cov = np.cov(pts.T, bias=True)
    assert np.allclose(cov_np, cloud_cov, atol=1e-9)

    # Regularized covs from the implementation must share eigenvectors.
    cloud = estimate_covariances(PointCloud.from_points(pts), num_neighbors=k)
    covs = cloud.covs_numpy()
    _, vecs_ref = np.linalg.eigh(cloud_cov)
    reg_ref = vecs_ref @ np.diag([1e-3, 1.0, 1.0]) @ vecs_ref.T
    assert np.allclose(covs, reg_ref, atol=1e-7)


def test_fused_moments_mode_matches_exact(rng):
    """neighbor_mode='fused' (ops/cov_fused_pallas list-driven moments
    kernel, interpreter on CPU) must reproduce the exact path's
    covariances and normals."""
    import jax
    import jax.numpy as jnp
    from small_gicp_tpu.ops.normals import _estimate_impl
    from small_gicp_tpu.point_cloud import PointCloud

    n = 1500
    pts = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    pts[:, 2] = np.sin(pts[:, 0] * 0.3) + 0.05 * rng.normal(size=n)
    cloud = PointCloud.from_points(pts, capacity=2048)
    nrm_e, cov_e = _estimate_impl(
        cloud.points, cloud.num_points, 20, True, True,
        neighbor_mode="exact",
    )
    nrm_f, cov_f = _estimate_impl(
        cloud.points, cloud.num_points, 20, True, True,
        neighbor_mode="fused",
    )
    np.testing.assert_allclose(np.asarray(cov_f), np.asarray(cov_e),
                               atol=2e-4)
    # normals match up to sign (sign is fixed by the viewpoint flip, so
    # they should match exactly-ish)
    np.testing.assert_allclose(np.asarray(nrm_f), np.asarray(nrm_e),
                               atol=2e-3)


def test_moments_ti_layout_matches_t(rng):
    """Round-5 "ti" layout (index-only kernel + XLA winner gather) must
    produce identical winners/moments to the 4-scratch "t" layout
    (interpreter mode; auto default picks by cloud size — see
    cov_fused_pallas module docstring)."""
    import jax.numpy as jnp

    from small_gicp_tpu.ops.cov_fused_pallas import knn_moments_pallas

    n = 1500
    xy = rng.uniform(-20, 20, size=(n, 2))
    z = 0.4 * np.sin(0.2 * xy[:, 0]) + 0.02 * rng.normal(size=n)
    pts = np.c_[xy[:, 0], xy[:, 1], z, np.ones(n)].astype(np.float32)
    pts = np.concatenate([pts, np.full((60, 4), 1e9, np.float32)])
    pts[n:, 3] = 0.0
    P = jnp.asarray(pts)
    nump = jnp.asarray(n, jnp.int32)
    m1a, m2a, ca = knn_moments_pallas(P, nump, 10, interpret=True, layout="t")
    m1b, m2b, cb = knn_moments_pallas(P, nump, 10, interpret=True, layout="ti")
    np.testing.assert_array_equal(np.asarray(ca)[:n], np.asarray(cb)[:n])
    np.testing.assert_allclose(np.asarray(m1a)[:n], np.asarray(m1b)[:n],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(m2a)[:n], np.asarray(m2b)[:n],
                               atol=1e-3)
