"""Fully-jitted odometry (lax.scan over frames) — must match the
per-frame Python engine and track ground truth."""

import numpy as np
import pytest

from small_gicp_tpu.models.odometry import OdometryParams, create_odometry
from small_gicp_tpu.models.odometry_scan import JitOdometry


def _frames(n_frames=5, step=0.15, seed=3):
    rng = np.random.default_rng(seed)
    g = rng.uniform(-8, 8, size=(1700, 2))
    ground = np.c_[g[:, 0], g[:, 1], 0.3 * np.sin(0.7 * g[:, 0]) + 0.2 * np.cos(0.9 * g[:, 1])]
    w1 = rng.uniform(-8, 8, size=(400, 2))
    wall1 = np.c_[w1[:, 0], np.full(400, -8.0) + 0.05 * np.sin(w1[:, 0]), 1 + w1[:, 1] * 0.2]
    w2 = rng.uniform(-8, 8, size=(400, 2))
    wall2 = np.c_[np.full(400, 8.0) + 0.05 * np.cos(w2[:, 0]), w2[:, 0], 1 + w2[:, 1] * 0.2]
    world = np.concatenate([ground, wall1, wall2])
    return [
        (world - [step * i, 0, 0] + rng.normal(scale=0.005, size=world.shape)
         ).astype(np.float32)
        for i in range(n_frames)
    ]


PARAMS = OdometryParams(
    num_neighbors=10, downsampling_resolution=0.3, voxel_resolution=1.0,
    max_scan_points=4096, max_downsampled=4096, map_capacity=8192,
)


@pytest.mark.parametrize("engine", ["gicp_model", "vgicp_model"])
def test_jit_odometry_tracks(engine):
    frames = _frames()
    odo = JitOdometry(PARAMS, engine=engine)
    poses = odo.feed(frames)
    assert poses.shape == (5, 4, 4)
    assert abs(poses[-1, 0, 3] - 0.6) < 0.05, f"{engine}: x={poses[-1, 0, 3]}"
    assert np.linalg.norm(poses[-1, :3, :3] - np.eye(3)) < 0.02


def test_jit_odometry_chunked_matches_single_feed():
    frames = _frames(6)
    a = JitOdometry(PARAMS)
    poses_a = a.feed(frames)
    b = JitOdometry(PARAMS)
    b.feed(frames[:3])
    poses_b_tail = b.feed(frames[3:])
    np.testing.assert_allclose(poses_a[-1], poses_b_tail[-1], rtol=1e-5, atol=1e-6)


def test_jit_matches_python_engine():
    frames = _frames(4)
    # covariance_mode="knn" reproduces the python engine's preprocessing
    # exactly (the default "voxel" mode uses neighborhood moments).
    jit_odo = JitOdometry(PARAMS, covariance_mode="knn")
    jit_poses = jit_odo.feed(frames)
    py_odo = create_odometry("small_gicp_model", PARAMS)
    py_poses = py_odo.estimate(frames)
    # Same math modulo the python engine's separate jit programs; poses
    # should agree tightly.
    np.testing.assert_allclose(jit_poses[-1], py_poses[-1], atol=1e-3)


def test_preloaded_matches_feed():
    frames = _frames(6)
    a = JitOdometry(PARAMS)
    poses_a = a.feed(frames)
    b = JitOdometry(PARAMS, chunk_frames=4)
    fd, cd = b.preload(frames)
    poses_b = b.feed_preloaded(fd, cd, n_real=len(frames))
    assert poses_b.shape == (6, 4, 4)
    np.testing.assert_allclose(poses_a, poses_b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("engine,rtype", [
    ("gicp_scan", "gicp"), ("plane_icp_scan", "plane_icp"),
])
def test_jit_scan_to_scan_matches_python(engine, rtype):
    frames = _frames(4)
    jit_odo = JitOdometry(PARAMS, engine=engine, chunk_frames=4)
    jit_poses = jit_odo.feed(frames)
    py_odo = create_odometry("small_gicp", OdometryParams(
        **{**PARAMS.__dict__, "registration_type": rtype}))
    py_poses = py_odo.estimate(frames)
    np.testing.assert_allclose(jit_poses[-1], py_poses[-1], rtol=1e-4, atol=1e-5)
    # and it tracks the true motion
    assert abs(jit_poses[-1][0, 3] - 0.45) < 0.05


def test_synthetic_loop_tracking_with_offsets7():
    """Trajectory-scale smoke: the jitted scan-to-model loop tracks a
    curved synthetic LiDAR sequence at cm level when the model map
    searches the 7-voxel neighborhood (see OdometryParams.num_offsets —
    at ~1 m frame motion the reference-default single-voxel pattern has
    a narrower basin than the motion and can slide; the full 600-frame
    result lives in BENCHMARK.md)."""
    from small_gicp_tpu.utils.synthetic import generate_sequence
    from small_gicp_tpu.models.odometry_scan import JitOdometry
    from small_gicp_tpu.models.odometry import OdometryParams

    scans, gt = generate_sequence(n_frames=10, seed=3, rings=24,
                                  azimuth_steps=384)
    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    odo = JitOdometry(
        OdometryParams(max_scan_points=10240, max_downsampled=10240,
                       map_capacity=131072, num_offsets=7),
        engine="gicp_model", chunk_frames=5,
    )
    poses = odo.feed(scans)
    err = np.linalg.norm(poses[:, :3, 3] - gt_rel[:, :3, 3], axis=1)
    assert err.max() < 0.05, err


def test_jit_odometry_knn_window_mode_tracks():
    """The O(N·S·W) windowed-covariance fast path must track the same
    trajectory as the exact-kNN mode (pose differences far below the
    tracking tolerance)."""
    frames = _frames()
    exact = JitOdometry(PARAMS, covariance_mode="knn").feed(frames)
    win = JitOdometry(PARAMS, covariance_mode="knn_window").feed(frames)
    assert abs(win[-1, 0, 3] - 0.6) < 0.05
    # same trajectory to sub-mm: the covariances are interchangeable
    assert np.max(np.abs(win - exact)) < 2e-3, np.max(np.abs(win - exact))


def test_batch_odometry_matches_individual_lanes():
    """B sequences in one vmapped program == each sequence alone
    (exact: lanes never interact)."""
    from small_gicp_tpu.models.odometry_scan import BatchOdometry

    seq_a = _frames(4, step=0.15, seed=3)
    seq_b = _frames(4, step=0.10, seed=7)
    seq_c = _frames(2, step=0.20, seed=11)  # shorter lane → padded tail

    batch = BatchOdometry(3, PARAMS)
    poses = batch.feed([seq_a, seq_b, seq_c])
    assert poses.shape == (3, 4, 4, 4)

    for lane, seq in ((0, seq_a), (1, seq_b), (2, seq_c)):
        solo = JitOdometry(PARAMS, chunk_frames=4).feed(seq)
        np.testing.assert_allclose(
            poses[lane, : len(seq)], solo, rtol=1e-5, atol=1e-6,
            err_msg=f"lane {lane}",
        )
    # padded tail of the short lane repeats its last real pose
    np.testing.assert_allclose(poses[2, 2:], poses[2, 1:2].repeat(2, 0))


def test_batch_odometry_scan_to_scan():
    from small_gicp_tpu.models.odometry_scan import BatchOdometry

    seq = _frames(3)
    batch = BatchOdometry(2, PARAMS, engine="gicp_scan")
    poses = batch.feed([seq, seq])
    np.testing.assert_allclose(poses[0], poses[1], atol=1e-12)
    solo = JitOdometry(PARAMS, engine="gicp_scan", chunk_frames=3).feed(seq)
    np.testing.assert_allclose(poses[0], solo, rtol=1e-5, atol=1e-6)


def test_vgicp_fused_engine_tracks_like_vgicp():
    """vgicp_model_fused (nearest-voxel-mean correspondences on the
    brute-force/fused path) must track the same trajectory class as the
    reference-semantics vgicp_model (voxel-key lookup)."""
    frames = _frames()
    ref = JitOdometry(PARAMS, engine="vgicp_model").feed(frames)
    fus = JitOdometry(PARAMS, engine="vgicp_model_fused").feed(frames)
    assert abs(fus[-1, 0, 3] - 0.6) < 0.05, fus[-1, 0, 3]
    # nearest-mean is a superset of key lookup: same trajectory within
    # the registration noise floor
    assert np.max(np.abs(fus - ref)) < 5e-3, np.max(np.abs(fus - ref))


def test_gicp_fused_engine_tracks_like_gicp_model():
    """gicp_model_fused (exact nearest-stored-point correspondences on
    the brute-force/fused path) must track like gicp_model (7-offset
    voxel-key candidates). Exact NN is a superset of the key lookup, so
    trajectories agree to the registration noise floor."""
    frames = _frames()
    ref = JitOdometry(PARAMS, engine="gicp_model").feed(frames)
    fus = JitOdometry(PARAMS, engine="gicp_model_fused").feed(frames)
    assert abs(fus[-1, 0, 3] - 0.6) < 0.05, fus[-1, 0, 3]
    assert np.max(np.abs(fus - ref)) < 5e-3, np.max(np.abs(fus - ref))


@pytest.mark.parametrize("engine", ["plane_icp_model", "plane_icp_model_fused"])
def test_plane_icp_model_engine_tracks(engine):
    """Point-to-plane scan-to-model (map stores normals — no reference
    counterpart; falls out of the factor/target plumbing)."""
    frames = _frames()
    poses = JitOdometry(PARAMS, engine=engine).feed(frames)
    assert abs(poses[-1, 0, 3] - 0.6) < 0.05, f"{engine}: {poses[-1, 0, 3]}"
    assert np.linalg.norm(poses[-1, :3, :3] - np.eye(3)) < 0.02


def test_covariance_mode_knn_fused_matches_knn():
    """covariance_mode='knn_fused' (the fused moments kernel) must
    produce the same trajectory as the exact 'knn' mode (same exact-kNN
    semantics; interpreter kernels on CPU)."""
    frames = _frames(5)
    p = OdometryParams(
        num_neighbors=10, downsampling_resolution=0.3,
        max_scan_points=2048, max_downsampled=2048, map_capacity=4096,
    )
    a = JitOdometry(p, engine="gicp_model", chunk_frames=5,
                    covariance_mode="knn").feed(frames)
    b = JitOdometry(p, engine="gicp_model", chunk_frames=5,
                    covariance_mode="knn_fused").feed(frames)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_lru_horizon_param_plumbs_to_map():
    """OdometryParams.lru_horizon/lru_clear_cycle reach the model map:
    a tiny horizon evicts old regions, a trajectory-length horizon
    retains them (the implicit-loop-closure configuration)."""
    frames = _frames(8)
    p_keep = OdometryParams(
        num_neighbors=10, downsampling_resolution=0.3,
        max_scan_points=2048, max_downsampled=2048, map_capacity=16384,
        lru_horizon=1000,
    )
    p_evict = OdometryParams(
        num_neighbors=10, downsampling_resolution=0.3,
        max_scan_points=2048, max_downsampled=2048, map_capacity=16384,
        lru_horizon=2, lru_clear_cycle=2,
    )
    keep = JitOdometry(p_keep, engine="gicp_model", chunk_frames=8)
    evict = JitOdometry(p_evict, engine="gicp_model", chunk_frames=8)
    keep.feed(frames)
    evict.feed(frames)
    nk = int(keep.carry[2].num_points_stored)
    ne = int(evict.carry[2].num_points_stored)
    assert nk > ne, (nk, ne)  # retention holds more of the drifting world


def test_max_frame_motion_clamp():
    """The opt-in motion sanity clamp rejects alignments that deviate
    from the constant-velocity prediction and coasts on the prediction
    — a direct step-level check: with an established 0.15 m/frame
    motion estimate, a frame whose true alignment is a 0.45 m jump is
    rejected at band 0.2 (pose = prediction) and accepted at band 1.0
    (pose tracks the jump)."""
    import jax.numpy as jnp
    from small_gicp_tpu.models.odometry_scan import (
        make_initial_carry, odometry_scan_step, stack_frames,
    )

    frames = _frames(3)
    p = OdometryParams(
        num_neighbors=10, downsampling_resolution=0.3,
        max_scan_points=2048, max_downsampled=2048, map_capacity=16384,
    )

    def step(carry, f, band):
        pts, cnt = stack_frames([f], 1, p.max_scan_points, p.dtype)
        return odometry_scan_step(
            carry, jnp.asarray(pts[0]), jnp.asarray(cnt[0]),
            downsampling_resolution=p.downsampling_resolution,
            max_downsampled=p.max_downsampled, num_neighbors=10,
            max_frame_motion=band,
        )

    def run(band):
        carry, _ = make_initial_carry(p, "gicp_model")
        for f in frames:  # establishes T_delta = 0.15 m/frame
            carry, pose = step(carry, f, band)
        # next frame jumps 0.45 m instead of 0.15 (world shifts 3x)
        jumped = frames[-1] - np.asarray([0.45, 0, 0], np.float32)
        carry, pose = step(carry, jumped, band)
        return float(np.asarray(pose)[0, 3])

    x_loose = run(1.0)   # accepted: tracks the 0.45 jump
    x_tight = run(0.2)   # rejected: coasts at prediction (+0.15)
    base = 0.15 * 2      # world pose after the 3 establishing frames
    assert abs(x_loose - (base + 0.45)) < 0.05, x_loose
    assert abs(x_tight - (base + 0.15)) < 0.05, x_tight


def test_compact_cloud_semantics():
    """point_cloud.compact_cloud: live rows keep order, overflow drops
    deterministically, payload columns travel with their rows."""
    import jax.numpy as jnp

    from small_gicp_tpu.point_cloud import PAD_SENTINEL, PointCloud, compact_cloud

    pts = np.full((16, 4), PAD_SENTINEL, np.float32)
    pts[:, 3] = 0.0
    for i, xyz in [(3, (1, 2, 3)), (7, (4, 5, 6)), (12, (7, 8, 9))]:
        pts[i, :3] = xyz
        pts[i, 3] = 1.0
    covs = np.zeros((16, 3, 3), np.float32)
    covs[3, 0, 0], covs[7, 1, 1], covs[12, 2, 2] = 3, 7, 12
    c = PointCloud(points=jnp.asarray(pts), num_points=jnp.asarray(3),
                   covs=jnp.asarray(covs))
    out = compact_cloud(c, 8)
    assert int(out.num_points) == 3
    np.testing.assert_allclose(np.asarray(out.points[:3, :3]),
                               [[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    assert float(out.points[3, 0]) == PAD_SENTINEL  # pad tail
    assert (float(out.covs[0, 0, 0]), float(out.covs[1, 1, 1]),
            float(out.covs[2, 2, 2])) == (3.0, 7.0, 12.0)
    # overflow: first `rows` live rows kept, count clamped
    out2 = compact_cloud(c, 2)
    assert int(out2.num_points) == 2
    np.testing.assert_allclose(np.asarray(out2.points[:, 0]), [1, 4])


def test_model_prepared_rows_equivalent_when_budget_sufficient():
    """⊕ model_prepared_rows (live-row compaction before the fused
    prepare) must not change the trajectory when the budget holds every
    live row."""
    import dataclasses

    rng = np.random.default_rng(0)
    base = rng.uniform(-8, 8, size=(2000, 3)).astype(np.float32)
    base[:, 2] = 0.3 * np.sin(base[:, 0]) + 0.2 * np.cos(base[:, 1])
    w = rng.uniform(-8, 8, size=(400, 2))
    wall = np.c_[w[:, 0], np.full(400, -8.0), 1 + w[:, 1] * 0.2]
    world = np.concatenate([base, wall]).astype(np.float32)
    frames = [(world - [0.15 * i, 0, 0]).astype(np.float32) for i in range(4)]

    p0 = OdometryParams(max_scan_points=4096, max_downsampled=4096,
                        map_capacity=16384, voxel_resolution=1.0,
                        num_neighbors=10)
    p1 = dataclasses.replace(p0, model_prepared_rows=8192)
    t0 = np.asarray(JitOdometry(p0, "gicp_model_fused", chunk_frames=4).feed(frames))
    t1 = np.asarray(JitOdometry(p1, "gicp_model_fused", chunk_frames=4).feed(frames))
    assert np.abs(t1 - t0).max() < 1e-3
