"""Voxelgrid / random sampling vs a numpy oracle implementing the
reference's serial semantics (util/downsampling.hpp:23-78)."""

import numpy as np
import jax
import jax.numpy as jnp

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.ops.downsampling import random_sampling, voxelgrid_sampling
import pytest

pytestmark = pytest.mark.smoke


def oracle_voxelgrid(points, leaf):
    """Numpy oracle: exact per-voxel mean (reference serial semantics)."""
    coords = np.floor(points / leaf).astype(np.int64) + (1 << 20)
    ok = np.all((coords >= 0) & (coords < (1 << 21)), axis=1)
    keys = (coords[:, 2] << 42) | (coords[:, 1] << 21) | coords[:, 0]
    keys = keys[ok]
    pts = points[ok]
    uniq, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros((len(uniq), 3))
    np.add.at(sums, inv, pts)
    counts = np.bincount(inv, minlength=len(uniq))
    return sums / counts[:, None], uniq


def test_voxelgrid_matches_oracle(rng):
    pts = rng.normal(size=(5000, 3)) * 10.0
    cloud = PointCloud.from_points(pts.astype(np.float64))
    down = voxelgrid_sampling(cloud, 0.5)
    got = down.points_numpy()
    means, keys = oracle_voxelgrid(pts, 0.5)
    assert len(down) == len(means)
    # Output is sorted by voxel key; the oracle's np.unique is too.
    assert np.allclose(got[:, :3], means, atol=1e-12)
    assert np.allclose(got[:, 3], 1.0)


def test_voxelgrid_deterministic(rng):
    pts = rng.normal(size=(3000, 3)) * 5.0
    cloud = PointCloud.from_points(pts)
    a = voxelgrid_sampling(cloud, 0.25)
    b = voxelgrid_sampling(cloud, 0.25)
    assert int(a.num_points) == int(b.num_points)
    assert np.array_equal(np.asarray(a.points), np.asarray(b.points))


def test_voxelgrid_out_of_range_dropped():
    # Points beyond the 21-bit coordinate range are ignored
    # (downsampling.hpp:16-17: min resolution 0.5 mm at 1000 m width).
    pts = np.array([[0.0, 0.0, 0.0], [2e6, 0.0, 0.0], [1.0, 1.0, 1.0]])
    cloud = PointCloud.from_points(pts)
    down = voxelgrid_sampling(cloud, 1.0)
    assert len(down) == 2


def test_voxelgrid_empty():
    cloud = PointCloud.from_points(np.zeros((0, 3)), capacity=16)
    down = voxelgrid_sampling(cloud, 0.5)
    assert len(down) == 0


def test_voxelgrid_padding_excluded(rng):
    pts = rng.normal(size=(100, 3))
    a = voxelgrid_sampling(PointCloud.from_points(pts), 0.2)
    b = voxelgrid_sampling(PointCloud.from_points(pts, capacity=500), 0.2)
    assert int(a.num_points) == int(b.num_points)
    assert np.allclose(a.points_numpy(), b.points_numpy())


def test_voxelgrid_max_points_cap(rng):
    pts = rng.normal(size=(1000, 3)) * 50.0
    cloud = PointCloud.from_points(pts)
    down = voxelgrid_sampling(cloud, 0.01, max_points=64)
    assert int(down.num_points) == 64


def test_voxelgrid_single_voxel_mean(rng):
    pts = rng.uniform(0.1, 0.9, size=(50, 3))
    down = voxelgrid_sampling(PointCloud.from_points(pts), 1.0)
    assert len(down) == 1
    assert np.allclose(down.points_numpy()[0, :3], pts.mean(axis=0), atol=1e-12)


def test_random_sampling(rng):
    pts = rng.normal(size=(500, 3))
    cloud = PointCloud.from_points(pts)
    out = random_sampling(cloud, 100, jax.random.key(0))
    assert len(out) == 100
    got = out.points_numpy()[:, :3]
    # Every sampled point must be one of the inputs, and all distinct.
    d = np.linalg.norm(got[:, None, :] - pts[None, :, :], axis=-1).min(axis=1)
    assert np.all(d < 1e-12)
    assert len(np.unique(got.round(9), axis=0)) == 100


def test_random_sampling_more_than_available(rng):
    pts = rng.normal(size=(10, 3))
    cloud = PointCloud.from_points(pts, capacity=32)
    out = random_sampling(cloud, 20, jax.random.key(1))
    assert len(out) == 10


def test_voxelgrid_max_points_exceeds_capacity(rng):
    pts = rng.uniform(-3, 3, size=(100, 3)).astype(np.float32)
    from small_gicp_tpu.point_cloud import PointCloud
    cloud = PointCloud.from_points(pts)
    down = voxelgrid_sampling(cloud, 0.5, max_points=256)
    assert down.points.shape == (256, 4)
    n = int(down.num_points)
    assert 0 < n <= 100
    assert np.all(np.abs(np.asarray(down.points[:n, :3])) < 10)


def test_nan_and_inf_points_are_dropped():
    """Non-finite coords must map to INVALID keys deterministically:
    XLA's float->int cast is implementation-defined on NaN (it can cast
    to 0, fabricating a valid voxel at the origin). Reference behavior:
    NaN points are skipped at ingest (ros_impl.hpp NaN skip)."""
    import jax.numpy as jnp
    from small_gicp_tpu.ops.downsampling import voxelgrid_sampling
    from small_gicp_tpu.ops.voxel_keys import INVALID_KEY, voxel_keys

    pts = np.array([
        [0.1, 0.1, 0.1],
        [np.nan, 0.0, 0.0],
        [0.0, np.inf, 0.0],
        [0.0, 0.0, -np.inf],
        [5.1, 5.1, 5.1],
    ])
    keys = np.asarray(voxel_keys(jnp.asarray(pts), 1.0))
    assert keys[1] == INVALID_KEY and keys[2] == INVALID_KEY
    assert keys[3] == INVALID_KEY
    assert keys[0] != INVALID_KEY and keys[4] != INVALID_KEY

    down = voxelgrid_sampling(PointCloud.from_points(pts), 1.0)
    assert int(down.num_points) == 2  # only the two finite voxels
    got = np.sort(down.points_numpy()[:, 0])
    assert np.allclose(got, [0.1, 5.1])
