"""On-chip test lane: compiled (Mosaic, NOT interpreter-mode) Pallas
kernels plus one end-to-end align and one jitted odometry chunk on the
real TPU backend.

Run with:  SGT_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_lane.py

Everything else in the suite exercises these code paths in interpreter
mode / on CPU (tests/test_knn_pallas.py uses interpret=True); this lane
is the only place Mosaic compilation itself is validated outside
bench.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _on_tpu():
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(
    not _on_tpu(), reason="needs a real TPU backend (tunnel not available)"
)


@requires_tpu
def test_knn_pallas_compiled_matches_bruteforce(rng):
    from small_gicp_tpu.ops.knn_pallas import knn_pallas
    from small_gicp_tpu.ops.knn import brute_force_knn

    pts = rng.uniform(-10, 10, size=(4096, 3)).astype(np.float32)
    q = rng.uniform(-10, 10, size=(2048, 3)).astype(np.float32)
    pts4 = jnp.concatenate(
        [jnp.asarray(pts), jnp.ones((4096, 1), jnp.float32)], axis=1
    )
    d, i = knn_pallas(pts4, jnp.asarray(q), 20)  # compiled on device
    d_ref, i_ref = brute_force_knn(jnp.asarray(pts), jnp.asarray(q), 20, 512)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-4)
    assert np.mean(np.asarray(i) == np.asarray(i_ref)) > 0.999  # ties


@requires_tpu
def test_nearest_neighbor_pallas_compiled(rng):
    from small_gicp_tpu.ops.knn_pallas import nearest_neighbor_pallas
    from small_gicp_tpu.ops.knn import brute_force_knn

    pts = rng.uniform(-10, 10, size=(4096, 3)).astype(np.float32)
    q = pts[:1024] + rng.normal(scale=0.01, size=(1024, 3)).astype(np.float32)
    pts4 = jnp.concatenate(
        [jnp.asarray(pts), jnp.ones((4096, 1), jnp.float32)], axis=1
    )
    d, i = nearest_neighbor_pallas(pts4, jnp.asarray(q))
    d_ref, i_ref = brute_force_knn(jnp.asarray(pts), jnp.asarray(q), 1, 512)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref)[:, 0], atol=1e-4)
    assert np.mean(np.asarray(i) == np.asarray(i_ref)[:, 0]) > 0.999


@requires_tpu
def test_e2e_gicp_align_on_chip(bundled_pair):
    import small_gicp_tpu as sgt
    from small_gicp_tpu.utils.lie import rotation_error_deg

    target_raw, source_raw, T_gt = bundled_pair
    result = sgt.align(
        target_raw.astype(np.float32), source_raw.astype(np.float32),
        max_points=8192, downsampling_resolution=0.4,
    )
    T = np.asarray(result.T_target_source)
    assert bool(result.converged)
    assert rotation_error_deg(T[:3, :3], T_gt[:3, :3]) < 2.5
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.2


@requires_tpu
def test_odometry_scan_chunk_on_chip(rng):
    from small_gicp_tpu.models.odometry_scan import JitOdometry
    from small_gicp_tpu.models.odometry import OdometryParams

    base = rng.uniform(-20, 20, size=(6000, 3)).astype(np.float32)
    scans = [
        (base - np.array([0.4 * i, 0, 0], np.float32))
        + rng.normal(scale=0.01, size=base.shape).astype(np.float32)
        for i in range(8)
    ]
    odo = JitOdometry(
        OdometryParams(max_scan_points=8192, max_downsampled=8192,
                       map_capacity=16384),
        engine="gicp_model", chunk_frames=8,
    )
    poses = odo.feed(scans)
    assert abs(poses[-1][0, 3] - 2.8) < 0.2


@requires_tpu
def test_fused_gicp_linearize_compiled(rng):
    """Mosaic-compiled fused search+linearize matches the XLA path."""
    from small_gicp_tpu.point_cloud import PointCloud
    from small_gicp_tpu.models import factors
    from small_gicp_tpu.models.registration import _search_correspondences
    from small_gicp_tpu.ops.gicp_fused_pallas import gicp_linearize_pallas
    from small_gicp_tpu.utils.lie import se3_exp

    m, n = 3000, 2500
    tp = rng.uniform(-8, 8, size=(m, 3)).astype(np.float32)
    sp = tp[rng.permutation(m)[:n]] + rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
    def covs(k):
        a = rng.normal(size=(k, 3, 3)).astype(np.float32) * 0.05
        return np.einsum("nij,nkj->nik", a, a) + np.eye(3, dtype=np.float32) * 0.01
    target = PointCloud.from_points(tp).replace(covs=jnp.asarray(covs(m)))
    source = PointCloud.from_points(sp).replace(covs=jnp.asarray(covs(n)))
    T = se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.1, 0.08], jnp.float32))
    max_d2 = jnp.asarray(1.0, jnp.float32)

    corr = _search_correspondences(
        "gicp", target, None, source.points, source.num_points,
        source.covs, T, max_d2,
    )
    H_ref, b_ref, _ = factors.linearize(corr, T, source.points)
    H, b, mu, W, mask, sq, corr16, sorted_src = gicp_linearize_pallas(
        target.points, target.covs, source.points, source.covs,
        T, source.num_points, max_d2,
    )
    assert np.array_equal(np.asarray(mask), np.asarray(corr.mask))
    scale = max(1.0, float(np.abs(np.asarray(H_ref)).max()))
    np.testing.assert_allclose(np.asarray(H) / scale,
                               np.asarray(H_ref) / scale, atol=1e-3)


@requires_tpu
def test_knn_window_compiled_on_chip(rng):
    """Multi-shift Morton-banded self-kNN compiled for the real backend
    (sorts + windowed gathers + row top-k all lower through Mosaic/XLA:TPU)."""
    from small_gicp_tpu.point_cloud import PointCloud
    from small_gicp_tpu.ops.knn import brute_force_knn_numpy
    from small_gicp_tpu.ops.knn_window import knn_windowed

    pts = rng.uniform(-30, 30, size=(4096, 3)).astype(np.float32)
    pts[:, 2] *= 0.05
    cloud = PointCloud.from_points(pts)
    d, i = knn_windowed(cloud.points, cloud.num_points, 20, cell=0.25)
    d, i = np.asarray(d), np.asarray(i)
    _, i_ref = brute_force_knn_numpy(pts, pts, 20)
    tags = i + np.arange(4096)[:, None] * 4096
    tags_ref = i_ref + np.arange(4096)[:, None] * 4096
    assert np.isin(tags_ref, tags).mean() > 0.95
    assert np.allclose(d[:, 0], 0.0, atol=1e-5)


@requires_tpu
def test_fused_engines_on_chip(rng):
    """gicp_model_fused / vgicp_model_fused / plane_icp_model run
    compiled on the chip and track a simple translation."""
    from small_gicp_tpu.models.odometry import OdometryParams
    from small_gicp_tpu.models.odometry_scan import JitOdometry

    base = rng.uniform(-20, 20, size=(6000, 3)).astype(np.float32)
    base[:, 2] = np.abs(base[:, 2]) * 0.1
    scans = [
        base - np.array([0.4 * i, 0, 0], np.float32) for i in range(6)
    ]
    for engine in ("gicp_model_fused", "vgicp_model_fused", "plane_icp_model"):
        odo = JitOdometry(
            OdometryParams(max_scan_points=8192, max_downsampled=8192,
                           map_capacity=16384),
            engine=engine, chunk_frames=6,
            covariance_mode="knn_window",
        )
        poses = odo.feed(scans)
        assert abs(poses[-1][0, 3] - 2.0) < 0.1, (engine, poses[-1][0, 3])


@requires_tpu
def test_fleet_align_compiled_matches_sequential(bundled_pair):
    """align_fleet (compiled fleet kernels; full-array SMEM rows indexed
    by the lane program id — Mosaic rejects lane-blocked SMEM windows)
    matches the per-problem align_impl scan pose-for-pose on chip."""
    import small_gicp_tpu as sgt
    from small_gicp_tpu.models.registration import align_impl
    from small_gicp_tpu.parallel.fleet import align_fleet
    from small_gicp_tpu.utils.lie import se3_exp

    target_raw, source_raw, _ = bundled_pair
    target, target_tree = sgt.preprocess_points(
        target_raw.astype(np.float32), 0.5, num_neighbors=10,
        max_points=4096,
    )
    source, _ = sgt.preprocess_points(
        source_raw.astype(np.float32), 0.5, num_neighbors=10,
        max_points=4096,
    )
    rng = np.random.default_rng(7)
    P = 6
    poses = jnp.stack([
        se3_exp(jnp.asarray(
            np.r_[rng.normal(size=3) * 0.03, rng.normal(size=3) * 0.2],
            jnp.float32,
        ))
        for _ in range(P)
    ])

    r = align_fleet(target, source, poses, num_lanes=4, interpret=False)

    @jax.jit
    def run_seq(init_Ts):
        def step(c, T0):
            rr = align_impl(target, source, target_tree, T0,
                            registration_type="gicp")
            return c, (rr.converged, rr.iterations, rr.T_target_source)
        _, outs = jax.lax.scan(step, 0, init_Ts)
        return outs

    conv_s, it_s, T_s = jax.device_get(run_seq(poses))
    assert np.array_equal(np.asarray(r.converged), conv_s)
    assert np.array_equal(np.asarray(r.iterations), it_s)
    np.testing.assert_allclose(
        np.asarray(r.T_target_source), T_s, atol=2e-3
    )


@requires_tpu
def test_fused_plane_icp_and_icp_compiled(rng):
    """The generalized fused kernel's plane-ICP / ICP variants,
    COMPILED (Mosaic), must match the XLA path pose-for-pose through a
    full align (interpreter parity is in test_gicp_fused.py)."""
    from small_gicp_tpu.models.registration import align_impl
    from small_gicp_tpu.point_cloud import PointCloud
    from small_gicp_tpu.ops.normals import estimate_normals
    from small_gicp_tpu.utils.lie import se3_exp

    tp = rng.uniform(-8, 8, size=(1500, 3)).astype(np.float32)
    tp[:, 2] = np.sin(tp[:, 0]) * 0.5 + 0.05 * rng.normal(size=1500)
    sp = tp[rng.permutation(1500)[:1200]] + rng.normal(
        scale=0.03, size=(1200, 3)).astype(np.float32)
    target = estimate_normals(PointCloud.from_points(tp, capacity=2048),
                              num_neighbors=10)
    source = PointCloud.from_points(sp, capacity=2048)
    T0 = se3_exp(jnp.asarray([0.01, -0.02, 0.02, 0.05, -0.08, 0.03],
                             jnp.float32))
    for rtype in ("plane_icp", "icp"):
        a = align_impl(target, source, None, T0, registration_type=rtype)
        b = align_impl(target, source, None, T0, registration_type=rtype,
                       use_fused="never")
        a, b = jax.device_get((a, b))
        assert int(a.iterations) == int(b.iterations), rtype
        assert int(a.num_inliers) == int(b.num_inliers), rtype
        np.testing.assert_allclose(
            np.asarray(a.T_target_source), np.asarray(b.T_target_source),
            atol=1e-5, err_msg=rtype,
        )


@requires_tpu
def test_knn_moments_compiled_matches_oracle(rng):
    """The fused covariance-moments kernel (both layouts), COMPILED,
    vs the dense-kNN moment oracle."""
    from small_gicp_tpu.ops.cov_fused_pallas import knn_moments_pallas
    from small_gicp_tpu.ops.knn_pallas import knn_pallas
    from small_gicp_tpu.point_cloud import PointCloud

    n, k = 4096, 20
    pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    pts[:, 2] = np.sin(pts[:, 0] * 0.3) + 0.05 * rng.normal(size=n)
    cloud = PointCloud.from_points(pts)
    d, i = jax.device_get(knn_pallas(cloud.points, cloud.points[:, :3], k))
    valid = d < 1e16
    neigh = np.where(valid[..., None], pts[i] - pts[:, None, :], 0.0)
    m1_ref = neigh.sum(1)
    m2_ref = np.einsum("nkd,nke->nde", neigh, neigh)
    for layout in ("t", "q"):
        m1, m2, cnt = jax.device_get(knn_moments_pallas(
            cloud.points, cloud.num_points, k, layout=layout))
        np.testing.assert_array_equal(cnt, valid.sum(1))
        np.testing.assert_allclose(m1, m1_ref, atol=2e-4, err_msg=layout)
        np.testing.assert_allclose(m2, m2_ref, atol=2e-3, rtol=1e-4,
                                   err_msg=layout)


@requires_tpu
def test_fleet_sharded_single_device_mesh(rng):
    """align_fleet_sharded on a 1-device TPU mesh must equal the plain
    fleet (the shard_map plumbing itself, compiled)."""
    from jax.sharding import Mesh
    from small_gicp_tpu.parallel.fleet import align_fleet, align_fleet_sharded
    from small_gicp_tpu.point_cloud import PointCloud
    from small_gicp_tpu.utils.lie import se3_exp

    tp = rng.uniform(-8, 8, size=(700, 3)).astype(np.float32)
    tp[:, 2] = np.sin(tp[:, 0]) * 0.5
    sp = tp[rng.permutation(700)[:600]] + rng.normal(
        scale=0.03, size=(600, 3)).astype(np.float32)

    def covs(pts, cap):
        a = rng.normal(size=(len(pts), 3, 3)).astype(np.float32) * 0.05
        c = np.einsum("nij,nkj->nik", a, a) + np.eye(3, dtype=np.float32) * 0.01
        out = np.zeros((cap, 3, 3), np.float32)
        out[:len(pts)] = c
        return jnp.asarray(out)

    target = PointCloud.from_points(tp, capacity=1024).replace(
        covs=covs(tp, 1024))
    source = PointCloud.from_points(sp, capacity=1024).replace(
        covs=covs(sp, 1024))
    Ts = jnp.stack([
        se3_exp(jnp.asarray(t, jnp.float32))
        for t in rng.normal(size=(8, 6)) * np.r_[[0.02] * 3, [0.1] * 3]
    ])
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    single = jax.device_get(align_fleet(target, source, Ts, num_lanes=4))
    sharded = jax.device_get(align_fleet_sharded(
        target, source, Ts, mesh, num_lanes_per_device=4))
    np.testing.assert_allclose(
        np.asarray(sharded.T_target_source),
        np.asarray(single.T_target_source), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(sharded.iterations), np.asarray(single.iterations))


@requires_tpu
def test_fused_robust_kernels_compiled(rng):
    """Mosaic-compiled Huber/Cauchy fused path (round 5) matches the
    XLA robust oracle on chip — the linearize weight and the per-pose
    trial re-weighting."""
    from small_gicp_tpu.point_cloud import PointCloud
    from small_gicp_tpu.models import factors
    from small_gicp_tpu.models.registration import _search_correspondences
    from small_gicp_tpu.ops.gicp_fused_pallas import (
        gicp_error_multi_pallas,
        gicp_linearize_pallas,
    )
    from small_gicp_tpu.utils.lie import se3_exp

    m, n = 3000, 2500
    tp = rng.uniform(-8, 8, size=(m, 3)).astype(np.float32)
    sp = tp[rng.permutation(m)[:n]] + rng.normal(
        scale=0.05, size=(n, 3)
    ).astype(np.float32)

    def covs(k):
        a = rng.normal(size=(k, 3, 3)).astype(np.float32) * 0.05
        return np.einsum("nij,nkj->nik", a, a) + np.eye(
            3, dtype=np.float32
        ) * 0.01

    target = PointCloud.from_points(tp).replace(covs=jnp.asarray(covs(m)))
    source = PointCloud.from_points(sp).replace(covs=jnp.asarray(covs(n)))
    T = se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.1, 0.08], jnp.float32))
    max_d2 = jnp.asarray(1.0, jnp.float32)
    corr = _search_correspondences(
        "gicp", target, None, source.points, source.num_points,
        source.covs, T, max_d2,
    )
    for rk, c in (("huber", 0.8), ("cauchy", 0.5)):
        H_ref, b_ref, _ = factors.linearize(corr, T, source.points, rk, c)
        H, b, mu, W, mask, sq, corr16, sorted_src = gicp_linearize_pallas(
            target.points, target.covs, source.points, source.covs,
            T, source.num_points, max_d2, robust=rk, robust_c=c,
        )
        assert np.array_equal(np.asarray(mask), np.asarray(corr.mask))
        scale = max(1.0, float(np.abs(np.asarray(H_ref)).max()))
        np.testing.assert_allclose(np.asarray(H) / scale,
                                   np.asarray(H_ref) / scale, atol=1e-3)
        Ts = jnp.stack([T, jnp.eye(4, dtype=jnp.float32)])
        ref = factors.error_multi(
            factors.Correspondences(
                target_mu=mu, W=W, mask=mask,
                target_idx=jnp.zeros(mask.shape, jnp.int32),
            ),
            Ts, source.points, robust_kernel=rk, robust_c=c,
        )
        got = gicp_error_multi_pallas(
            corr16, sorted_src, Ts, source.num_points, robust=rk, robust_c=c,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4)
