"""ProjectiveSearch: hit-rate and self-consistency tests.

Mirrors the reference's voxelmap-style approximate-search testing
posture (kdtree_test.cpp:107-140): projective search is approximate by
design (one point per pixel, bounded window), so we assert a high
hit-rate against brute force rather than exact equality, plus exact
self-queries.
"""

import numpy as np
import jax.numpy as jnp

from small_gicp_tpu.ops.projective_search import ProjectiveSearch
from small_gicp_tpu.ops.knn import brute_force_knn_numpy
from small_gicp_tpu.point_cloud import PointCloud


def _lidar_scan(rng, n_beams=32, n_az=512):
    """Synthetic spinning-LiDAR scan: rings at varying elevation."""
    az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    el = np.linspace(-0.4, 0.4, n_beams)
    a, e = np.meshgrid(az, el)
    r = 10.0 + rng.normal(scale=0.5, size=a.shape)
    x = r * np.cos(e) * np.cos(a)
    y = r * np.cos(e) * np.sin(a)
    z = r * np.sin(e)
    return np.stack([x, y, z], -1).reshape(-1, 3)


def test_self_query(rng):
    """Self-queries always find a neighbor; points that survived the
    one-point-per-pixel fill (last writer wins, like the reference's
    sequential fill) find themselves exactly."""
    pts = _lidar_scan(rng)
    cloud = PointCloud.from_points(pts.astype(np.float32))
    ps = ProjectiveSearch.build(cloud, width=512, height=64)
    d2, idx, found = ps.nearest_neighbor_search(jnp.asarray(pts, jnp.float32))
    found = np.asarray(found)
    assert found.all()
    img = np.asarray(ps.index_image).reshape(-1)
    survivors = np.zeros(len(pts), bool)
    survivors[img[img >= 0]] = True
    d2 = np.asarray(d2)
    np.testing.assert_allclose(d2[survivors], 0.0, atol=1e-8)
    # Collided points still find a close neighbor (within ~pixel size).
    assert np.quantile(d2[~survivors], 0.95) < 1.5


def test_hit_rate_vs_bruteforce(rng):
    pts = _lidar_scan(rng)
    cloud = PointCloud.from_points(pts.astype(np.float32))
    ps = ProjectiveSearch.build(cloud, width=512, height=64)
    # Perturbed queries from the same sensor geometry.
    q = pts[rng.choice(len(pts), 500, replace=False)]
    q = q + rng.normal(scale=0.05, size=q.shape)
    d2, idx, found = ps.nearest_neighbor_search(jnp.asarray(q, jnp.float32))
    d_ref, i_ref = brute_force_knn_numpy(pts, q, 1)
    found = np.asarray(found)
    assert found.mean() > 0.95
    # Pixel collisions bound accuracy by the pixel footprint (~0.3 m at
    # 10 m range here), so require near-optimality at that scale.
    err = np.asarray(d2)[found] - d_ref[found, 0]
    ok = err <= 0.25
    assert ok.mean() > 0.95


def test_knn_sorted(rng):
    pts = _lidar_scan(rng)
    cloud = PointCloud.from_points(pts.astype(np.float32))
    ps = ProjectiveSearch.build(cloud, width=512, height=64)
    q = pts[:100] + 0.01
    d2, idx, found = ps.knn_search(jnp.asarray(q, jnp.float32), 5)
    d2 = np.asarray(d2)
    assert d2.shape == (100, 5)
    assert np.all(np.diff(d2, axis=1) >= 0)


def test_projective_search_plugs_into_registration(bundled_pair):
    """ProjectiveSearch as the target searcher of a full GICP align on
    the bundled real pair, within the reference's own accuracy bounds
    (reference: any ANN plugs into Registration —
    03_registration_template.cpp:152-179; bounds registration_test.cpp:
    144-145). The pair is a real spinning-LiDAR scan, so the
    equirectangular window search applies as designed."""
    import small_gicp_tpu as sgt
    from small_gicp_tpu.models.registration import Registration
    from small_gicp_tpu.utils.lie import rotation_error_deg

    target_raw, source_raw, T_gt = bundled_pair
    target, _ = sgt.preprocess_points(
        target_raw.astype(np.float32), 0.4, num_neighbors=10, max_points=8192
    )
    source, _ = sgt.preprocess_points(
        source_raw.astype(np.float32), 0.4, num_neighbors=10, max_points=8192
    )
    tree = ProjectiveSearch.build(target)
    reg = Registration(registration_type="gicp")
    result = reg.align(target, source, tree, None)
    T = np.asarray(result.T_target_source)
    rot_err = rotation_error_deg(T[:3, :3], T_gt[:3, :3])
    trans_err = np.linalg.norm(T[:3, 3] - T_gt[:3, 3])
    assert bool(result.converged)
    assert rot_err < 2.5, rot_err
    assert trans_err < 0.2, trans_err


def test_projective_odometry_engine(rng):
    """The small_gicp_projective engine tracks a known translation."""
    from small_gicp_tpu.models.odometry import create_odometry, OdometryParams

    base = rng.uniform(-20, 20, size=(4000, 3)).astype(np.float32)
    # keep points inside the projective FOV (not directly above/below)
    base[:, 2] = np.clip(base[:, 2], -3.0, 3.0)
    scans = []
    for i in range(4):
        shift = np.array([0.3 * i, 0.0, 0.0], np.float32)
        scans.append(base - shift + rng.normal(scale=0.005, size=base.shape
                                               ).astype(np.float32))
    odo = create_odometry("small_gicp_projective", OdometryParams(
        max_scan_points=4096, max_downsampled=4096, map_capacity=4096,
        downsampling_resolution=0.3))
    poses = odo.estimate(scans)
    assert abs(poses[-1][0, 3] - 0.9) < 0.1, poses[-1][:3, 3]
