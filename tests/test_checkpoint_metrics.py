"""Checkpoint/resume round-trips and trajectory metrics."""

import numpy as np
import pytest

from small_gicp_tpu.models.odometry import OdometryParams, create_odometry
from small_gicp_tpu.utils.checkpoint import (
    load_odometry_state,
    load_pytree,
    save_odometry_state,
    save_pytree,
)
from small_gicp_tpu.utils.metrics import (
    ape_translation,
    load_kitti_trajectory,
    rpe_translation,
    umeyama_alignment,
)
from small_gicp_tpu.models.voxelmap import GaussianVoxelMap


PARAMS = OdometryParams(
    num_neighbors=10, downsampling_resolution=0.3, voxel_resolution=1.0,
    max_scan_points=4096, max_downsampled=4096, map_capacity=8192,
)


def _frames(n_frames, seed=3):
    rng = np.random.default_rng(seed)
    g = rng.uniform(-8, 8, size=(1700, 2))
    ground = np.c_[g[:, 0], g[:, 1], 0.3 * np.sin(0.7 * g[:, 0])]
    w = rng.uniform(-8, 8, size=(600, 2))
    wall = np.c_[w[:, 0], np.full(600, -8.0), 1 + w[:, 1] * 0.2]
    world = np.concatenate([ground, wall])
    return [
        (world - [0.15 * i, 0, 0] + rng.normal(scale=0.005, size=world.shape)
         ).astype(np.float32)
        for i in range(n_frames)
    ]


@pytest.mark.smoke
def test_pytree_roundtrip(tmp_path, rng):
    vm = GaussianVoxelMap.empty(1.0, capacity=128)
    path = str(tmp_path / "vm.npz")
    save_pytree(path, vm)
    vm2 = load_pytree(path, GaussianVoxelMap.empty(1.0, capacity=128))
    np.testing.assert_array_equal(
        np.asarray(vm.dir_keys), np.asarray(vm2.dir_keys)
    )
    with pytest.raises(ValueError):
        load_pytree(path, GaussianVoxelMap.empty(1.0, capacity=64))


def test_odometry_resume_matches_continuous(tmp_path):
    frames = _frames(6)
    # Continuous run.
    odo_full = create_odometry("small_gicp_model", PARAMS)
    poses_full = odo_full.estimate(frames)
    # Run 3 frames, checkpoint, resume in a fresh engine, run the rest.
    odo_a = create_odometry("small_gicp_model", PARAMS)
    odo_a.estimate(frames[:3])
    ckpt = str(tmp_path / "odo.npz")
    save_odometry_state(ckpt, odo_a)
    odo_b = create_odometry("small_gicp_model", PARAMS)
    load_odometry_state(ckpt, odo_b)
    poses_b = odo_b.estimate(frames[3:])
    np.testing.assert_allclose(
        poses_b[-1], poses_full[-1], rtol=1e-4, atol=1e-5
    )


@pytest.mark.smoke
def test_metrics(tmp_path, rng):
    # Ground truth: a curve; estimate: GT transformed rigidly + noise.
    t = np.linspace(0, 10, 200)
    gt = np.tile(np.eye(4), (200, 1, 1))
    gt[:, 0, 3] = t
    gt[:, 1, 3] = np.sin(t * 0.3)
    R = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    est = gt.copy()
    est[:, :3, 3] = gt[:, :3, 3] @ R.T + [5, -2, 0.1]
    est[:, :3, :3] = R @ gt[:, :3, :3]
    est[:, :3, 3] += rng.normal(scale=0.01, size=(200, 3))

    mean, std = ape_translation(est, gt, align=True)
    assert mean < 0.05  # alignment removes the rigid offset
    mean_noalign, _ = ape_translation(est, gt, align=False)
    assert mean_noalign > 1.0

    rpe_mean, _ = rpe_translation(est, gt, delta=50)
    assert rpe_mean < 0.05

    # KITTI round-trip via the odometry writer.
    from small_gicp_tpu.models.odometry import write_trajectory

    path = str(tmp_path / "traj.txt")
    write_trajectory(path, gt)
    back = load_kitti_trajectory(path)
    np.testing.assert_allclose(back, gt, atol=1e-6)


@pytest.mark.smoke
def test_umeyama_exact(rng):
    src = rng.normal(size=(50, 3))
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    dst = src @ R.T + [1.0, -2.0, 3.0]
    T = umeyama_alignment(src, dst)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-10)
    np.testing.assert_allclose(src @ T[:3, :3].T + T[:3, 3], dst, atol=1e-10)


def test_jit_odometry_carry_checkpoint_resume(tmp_path):
    """The jitted loop's carry is a plain pytree: snapshot mid-sequence,
    restore into a fresh JitOdometry, and the continuation must match an
    uninterrupted run exactly."""
    from small_gicp_tpu.models.odometry import OdometryParams
    from small_gicp_tpu.models.odometry_scan import JitOdometry
    from small_gicp_tpu.utils.checkpoint import load_pytree, save_pytree

    rng = np.random.default_rng(5)
    base = rng.uniform(-8, 8, size=(1500, 3))
    base[:, 2] = 0.3 * np.sin(base[:, 0])
    frames = [base - [0.15 * i, 0, 0] for i in range(6)]
    P = OdometryParams(max_scan_points=2048, max_downsampled=2048,
                       map_capacity=4096, downsampling_resolution=0.4)

    full = JitOdometry(P, chunk_frames=3).feed(frames)

    a = JitOdometry(P, chunk_frames=3)
    a.feed(frames[:3])
    ckpt = str(tmp_path / "carry.npz")
    save_pytree(ckpt, a.carry)

    b = JitOdometry(P, chunk_frames=3)  # fresh engine, same params
    b.carry = load_pytree(ckpt, b.carry)
    tail = b.feed(frames[3:])
    np.testing.assert_allclose(tail, full[3:], rtol=1e-6, atol=1e-7)


def test_wrong_capacity_checkpoint_raises_clean_error(tmp_path):
    """A checkpoint written at one map_capacity must fail with a clean
    ValueError when restored into a different-capacity engine, not as a
    downstream XLA shape error (VERDICT r2 weak #6)."""
    frames = _frames(3)
    odo = create_odometry("small_gicp_model", PARAMS)
    odo.estimate(frames[:2])
    path = str(tmp_path / "state.npz")
    save_odometry_state(path, odo)

    import dataclasses

    wrong = dataclasses.replace(PARAMS, map_capacity=4096)
    odo2 = create_odometry("small_gicp_model", wrong)
    odo2.estimate(frames[:1])  # warm state, same as the save-side contract
    with pytest.raises(ValueError, match="map_capacity|leaf"):
        load_odometry_state(path, odo2)


def test_resume_survives_treedef_repr_change(tmp_path):
    """Structure checks are by per-leaf key paths (schema v2), NOT by
    str(treedef) — a jax/flax upgrade that changes the treedef repr must
    not brick legitimate resumes. Simulated by corrupting the stored
    (debug-only) __treedef__ bytes: load must still succeed."""
    vm = GaussianVoxelMap.empty(1.0, capacity=128)
    path = str(tmp_path / "vm.npz")
    save_pytree(path, vm)

    data = dict(np.load(path))
    assert int(data["__schema_version__"]) >= 2
    data["__treedef__"] = np.frombuffer(
        b"PyTreeDef(from-some-future-jax-version)", dtype=np.uint8
    )
    np.savez(path, **data)

    vm2 = load_pytree(path, GaussianVoxelMap.empty(1.0, capacity=128))
    np.testing.assert_array_equal(
        np.asarray(vm.dir_keys), np.asarray(vm2.dir_keys)
    )


def test_structure_mismatch_fails_by_leaf_names(tmp_path):
    """A checkpoint whose leaf NAMES differ from the template's must
    hard-fail with a name-level diff, whatever the treedef repr says."""
    path = str(tmp_path / "d.npz")
    save_pytree(path, {"pose": np.eye(4), "stamp": np.zeros(3)})
    with pytest.raises(ValueError, match="leaf names"):
        load_pytree(path, {"pose": np.eye(4), "velocity": np.zeros(3)})


def test_resume_estimate_frame_driven(tmp_path):
    """Resume must be exact for callers that drive estimate_frame()
    directly (no traj maintained): the first-frame flag and the
    motion-prediction state T_delta are checkpointed explicitly, not
    inferred from trajectory length."""
    frames = _frames(6)
    odo = create_odometry("small_gicp_model", PARAMS)
    for f in frames[:3]:
        odo.estimate_frame(f)
    ckpt = str(tmp_path / "odo.npz")
    save_odometry_state(ckpt, odo)
    odo_b = create_odometry("small_gicp_model", PARAMS)
    odo_b.estimate_frame(frames[0])  # warm, then fully overwritten by load
    load_odometry_state(ckpt, odo_b)
    assert odo_b._first is False
    for f in frames[3:]:
        a = odo.estimate_frame(f)
        b = odo_b.estimate_frame(f)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_load_v1_checkpoint_without_optional_leaves(tmp_path):
    """Checkpoints written before the T_delta / first-frame leaves
    existed (v1 layout: leaf_i + __treedef__ only) must still load —
    the loader only includes optional template leaves the checkpoint
    actually carries."""
    import jax

    frames = _frames(4)
    odo = create_odometry("small_gicp_model", PARAMS)
    odo.estimate(frames[:2])

    # Emulate the v1 writer: T_world / traj / voxelmap only, no
    # keypaths, no schema version.
    state = {
        "T_world": odo.T_world,
        "traj": np.stack(odo.traj),
        "voxelmap": odo.voxelmap,
    }
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    path = str(tmp_path / "v1.npz")
    np.savez(path, **arrays)

    odo_b = create_odometry("small_gicp_model", PARAMS)
    load_odometry_state(path, odo_b)
    assert odo_b._first is False  # inferred from non-empty traj
    np.testing.assert_allclose(
        np.asarray(odo_b.T_world), np.asarray(odo.T_world), atol=1e-7
    )
    # and it keeps tracking
    p = odo_b.estimate(frames[2:])
    assert np.isfinite(p[-1]).all()
