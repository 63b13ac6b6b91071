"""Fused voxel-moment covariances: agreement with kNN covariances on the
frame that matters (eigenvector/normal directions) and end-to-end
registration within the reference's accuracy bounds."""

import numpy as np
import jax.numpy as jnp
import pytest

import small_gicp_tpu as sgt
from small_gicp_tpu.ops.voxel_covs import voxelgrid_sampling_with_covs
from small_gicp_tpu.point_cloud import PointCloud


def test_normals_match_knn_on_plane(rng):
    # Noisy tilted plane: both estimators must recover its normal.
    g = rng.uniform(-5, 5, size=(20000, 2))
    normal = np.asarray([0.2, -0.3, 1.0])
    normal /= np.linalg.norm(normal)
    basis = np.linalg.svd(normal[None, :])[2][1:]
    pts = g @ basis + rng.normal(scale=0.002, size=(20000, 1)) * normal
    cloud = PointCloud.from_points(pts.astype(np.float32))

    fused = voxelgrid_sampling_with_covs(cloud, 0.5, 2048, need_normals=True)
    nrm = np.asarray(fused.normals[: int(fused.num_points)])[:, :3]
    dots = np.abs(nrm @ normal)
    assert np.quantile(dots, 0.05) > 0.999


def test_cov_frame_matches_knn(bundled_pair, rng):
    t_raw, _, _ = bundled_pair
    cloud = PointCloud.from_points(t_raw.astype(np.float32))
    fused = voxelgrid_sampling_with_covs(cloud, 0.5, 4096, need_normals=True)

    down = sgt.voxelgrid_sampling(cloud, 0.5, max_points=4096)
    knn = sgt.estimate_normals_covariances(down, num_neighbors=20)

    n = int(fused.num_points)
    assert n == int(knn.num_points)
    # Same output points (both are voxel means in the same key order).
    np.testing.assert_allclose(
        np.asarray(fused.points[:n]), np.asarray(knn.points[:n]), rtol=1e-5
    )
    # Normal directions broadly agree (different neighbor sets — fixed
    # 3x3x3 window vs kNN-20 — diverge on non-planar clutter, so this is
    # a distribution check; the functional criterion is the registration
    # bound test below).
    a = np.asarray(fused.normals[:n, :3])
    b = np.asarray(knn.normals[:n, :3])
    valid = (np.linalg.norm(a, axis=1) > 0.5) & (np.linalg.norm(b, axis=1) > 0.5)
    dots = np.abs(np.sum(a[valid] * b[valid], axis=1))
    assert np.median(dots) > 0.9
    assert np.mean(dots > 0.9) > 0.6


def test_registration_with_fused_covs(bundled_pair):
    t_raw, s_raw, T_gt = bundled_pair
    target = voxelgrid_sampling_with_covs(
        PointCloud.from_points(t_raw.astype(np.float32)), 0.4, 8192
    )
    source = voxelgrid_sampling_with_covs(
        PointCloud.from_points(s_raw.astype(np.float32)), 0.4, 8192
    )
    result = sgt.Registration("gicp").align(target, source)
    T = np.asarray(result.T_target_source)
    rot_cos = (np.trace(T[:3, :3].T @ T_gt[:3, :3]) - 1) / 2
    assert np.degrees(np.arccos(np.clip(rot_cos, -1, 1))) < 2.5
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.2


def test_voxel_covs_far_from_origin(rng):
    """Centered-moment regression: covariances must keep the surface
    eigenstructure for clouds hundreds of meters from the origin (raw
    f32 second moments would lose it to cancellation)."""
    from small_gicp_tpu.ops.voxel_covs import voxelgrid_sampling_with_covs
    from small_gicp_tpu.point_cloud import PointCloud

    n = 4000
    base = np.array([300.0, -250.0, 80.0], np.float32)
    g = rng.uniform(-4, 4, size=(n, 2)).astype(np.float32)
    pts = np.c_[g[:, 0], g[:, 1], 0.02 * rng.normal(size=n)].astype(np.float32)
    pts += base  # a near-planar patch far from the origin
    cloud = PointCloud.from_points(pts)
    out = voxelgrid_sampling_with_covs(cloud, 0.5, max_points=512,
                                       need_normals=True)
    m = int(out.num_points)
    assert m > 50
    covs = np.asarray(out.covs[:m], np.float64)
    normals = np.asarray(out.normals[:m, :3], np.float64)
    # plane-regularized covs: eigenvalues ~ (1e-3, 1, 1)
    ev = np.linalg.eigvalsh(covs)
    assert np.all(ev[:, 0] > 5e-4) and np.all(ev[:, 2] < 1.5)
    # normals must recover the plane's z axis
    nz = np.abs(normals[:, 2])
    valid = np.linalg.norm(normals, axis=1) > 0.5
    assert valid.mean() > 0.8
    assert np.quantile(nz[valid], 0.1) > 0.95


def test_voxel_covs_max_points_exceeds_capacity(rng):
    from small_gicp_tpu.ops.voxel_covs import voxelgrid_sampling_with_covs
    from small_gicp_tpu.point_cloud import PointCloud

    pts = rng.uniform(-3, 3, size=(200, 3)).astype(np.float32)
    cloud = PointCloud.from_points(pts)
    out = voxelgrid_sampling_with_covs(cloud, 0.5, max_points=512)
    assert out.points.shape == (512, 4)
    assert int(out.num_points) <= 200
