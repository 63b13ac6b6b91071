"""Odometry engines on a synthetic world with known ground-truth motion
(the reference validates odometry via the KITTI benchmark harness,
benchmark_odom.hpp:44-80; here a compact synthetic equivalent)."""

import numpy as np
import pytest

from small_gicp_tpu.models.odometry import (
    ENGINES,
    OdometryParams,
    create_odometry,
    write_trajectory,
)


def _make_frames(n_frames=5, step=0.15, n=2500, seed=3):
    """Static structured world sampled from a sensor translating +x."""
    rng = np.random.default_rng(seed)
    # World: a wavy ground plane + two walls — full 6-DoF constraint.
    g = rng.uniform(-8, 8, size=(n - 800, 2))
    ground = np.c_[g[:, 0], g[:, 1], 0.3 * np.sin(0.7 * g[:, 0]) + 0.2 * np.cos(0.9 * g[:, 1])]
    w1 = rng.uniform(-8, 8, size=(400, 2))
    wall1 = np.c_[w1[:, 0], np.full(400, -8.0) + 0.05 * np.sin(w1[:, 0]), 1 + w1[:, 1] * 0.2]
    w2 = rng.uniform(-8, 8, size=(400, 2))
    wall2 = np.c_[np.full(400, 8.0) + 0.05 * np.cos(w2[:, 0]), w2[:, 0], 1 + w2[:, 1] * 0.2]
    world = np.concatenate([ground, wall1, wall2])

    frames, gt = [], []
    for i in range(n_frames):
        x = step * i
        local = world - [x, 0.0, 0.0]
        local = local + rng.normal(scale=0.005, size=local.shape)
        frames.append(local.astype(np.float32))
        T = np.eye(4)
        T[0, 3] = x
        gt.append(T)
    return frames, np.stack(gt)


PARAMS = OdometryParams(
    num_neighbors=10,
    downsampling_resolution=0.3,
    voxel_resolution=1.0,
    max_scan_points=4096,
    max_downsampled=4096,
    map_capacity=8192,
)


@pytest.mark.parametrize("engine", sorted(ENGINES))
def test_engine_tracks_translation(engine):
    frames, gt = _make_frames()
    odom = create_odometry(engine, PARAMS)
    poses = odom.estimate(frames)
    assert poses.shape == (len(frames), 4, 4)
    # Final pose within 5 cm of ground truth; per-frame drift small.
    err = np.linalg.norm(poses[-1, :3, 3] - gt[-1, :3, 3])
    assert err < 0.05, f"{engine}: final trans err {err:.3f} m"
    rot_dev = np.linalg.norm(poses[-1, :3, :3] - np.eye(3))
    assert rot_dev < 0.02, f"{engine}: final rot deviation {rot_dev:.4f}"


def test_eager_motion_clamp_matches_jitted_semantics():
    """ScanToModelOdometry enforces max_frame_motion like the jitted
    path: deviation from the constant-velocity prediction > threshold
    rejects the alignment and coasts on the prediction (ADVICE r4:
    previously the eager model engines silently ignored the param)."""
    import dataclasses

    import jax.numpy as jnp

    odom = create_odometry(
        "small_gicp_model",
        dataclasses.replace(PARAMS, max_frame_motion=0.5),
    )
    odom.T_world = jnp.eye(4, dtype=jnp.float32)
    T_delta = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.2)
    odom.T_delta = T_delta
    pred = odom.T_world @ T_delta

    # Within threshold: alignment kept.
    ok_pose = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.3)
    np.testing.assert_allclose(odom._motion_clamp(ok_pose), ok_pose)
    # Beyond threshold: coast on the prediction.
    bad_pose = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(1.5)
    np.testing.assert_allclose(odom._motion_clamp(bad_pose), pred)
    # No motion estimate yet (T_delta ~ identity): clamp inactive.
    odom.T_delta = jnp.eye(4, dtype=jnp.float32)
    np.testing.assert_allclose(odom._motion_clamp(bad_pose), bad_pose)


def test_non_model_engine_warns_on_max_frame_motion():
    import dataclasses

    with pytest.warns(UserWarning, match="max_frame_motion"):
        create_odometry(
            "small_gicp", dataclasses.replace(PARAMS, max_frame_motion=0.5)
        )


def test_write_trajectory(tmp_path):
    frames, gt = _make_frames(n_frames=3)
    odom = create_odometry("small_gicp", PARAMS)
    poses = odom.estimate(frames)
    out = tmp_path / "traj.txt"
    write_trajectory(str(out), poses)
    loaded = np.loadtxt(out)
    assert loaded.shape == (3, 12)
    np.testing.assert_allclose(
        loaded.reshape(-1, 3, 4), poses[:, :3, :], rtol=1e-5, atol=1e-6
    )
    assert "msec/scan" in odom.report()
