"""LiDAR odometry engines (scan-to-scan and scan-to-model).

TPU re-design of the reference's 14 odometry benchmark engines
(src/benchmark/odometry_benchmark_*.cpp; registry benchmark_odom.hpp:29-117).
The OMP/TBB/flow-graph parallel variants collapse into one jitted
per-frame step — a single XLA program per frame covering
downsample → covariance estimation → correspondence search → LM solve →
(for model engines) voxel map insert. The host loop only feeds frames
and collects poses; device state (previous cloud / voxel map / pose)
never leaves HBM.

Engines (reference counterparts):
  * ScanToScanOdometry      — odometry_benchmark_small_gicp{,_omp,_tbb}.cpp
  * ScanToModelOdometry     — odometry_benchmark_small_gicp_model_{omp,tbb}.cpp
                              (IncrementalVoxelMap target, absolute pose)
  * VGICPModelOdometry      — odometry_benchmark_small_vgicp_model_{omp,tbb}.cpp
                              (GaussianVoxelMap target)
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.ops.downsampling import voxelgrid_sampling
from small_gicp_tpu.ops.normals import estimate_covariances
from small_gicp_tpu.models.registration import Registration
from small_gicp_tpu.models.voxelmap import GaussianVoxelMap, IncrementalVoxelMap
from small_gicp_tpu.utils.benchmark import Summarizer


@dataclass
class OdometryParams:
    """Mirror of OdometryEstimationParams (benchmark_odom.hpp:19-27)."""

    num_threads: int = 4  # parity only; XLA decides
    num_neighbors: int = 20
    downsampling_resolution: float = 0.25
    voxel_resolution: float = 1.0
    max_correspondence_distance: float = 1.0
    # TPU-specific static capacities:
    max_scan_points: int = 131072  # raw scan capacity
    max_downsampled: int = 32768  # post-voxelgrid capacity
    map_capacity: int = 131072  # point rows in the model map
    # Voxel slots of the incremental map (None → map_capacity // 4; the
    # per-lookup directory search and per-insert directory sort are O(V),
    # so a tight bound pays directly in ms/scan — live voxels in a
    # LRU-horizon-bounded map run ~2-4 points/voxel).
    map_voxel_capacity: Optional[int] = None
    dtype: str = "float32"
    # Factor used by the scan-to-scan engines (icp / plane_icp / gicp).
    registration_type: str = "gicp"
    # Constant-velocity initial guess (NOT in the reference, which seeds
    # scan-to-model alignment with the raw previous pose —
    # odometry_benchmark_small_gicp_model_tbb.cpp:39). At typical frame
    # motion (~1.2 m) a previous-pose seed sits at the edge of the
    # 1.0 m correspondence basin and can drop into a ground-sliding
    # local minimum; predicting with the previous frame-to-frame delta
    # shrinks the seed error to the motion's second derivative.
    # Off by default for reference parity.
    predict_motion: bool = False
    # Voxel-neighborhood search pattern of the model maps (1, 7 or 27 —
    # reference set_search_offsets, incremental_voxelmap.hpp:157-186).
    # The reference default is 1; at >=1 m frame motion with 1 m voxels
    # the single-voxel basin is narrower than the motion and scan-to-
    # model tracking can drop into ground-sliding minima — 7 restores
    # the full rejector-radius basin (measured on the synthetic loop:
    # max error 2.77 m -> 0.04 m over 64 frames).
    num_offsets: int = 1
    # LRU map bounds (reference set_lru, incremental_voxelmap.hpp:74-86;
    # defaults match its horizon=100 / clear_cycle=10). The horizon
    # decides the map's MEMORY: with the reference default, regions
    # older than 100 frames evict and a loop revisit is pure odometry
    # (~0.2% drift on the synthetic 720 m loop, like the reference's
    # 0.16% on KITTI); with a horizon longer than the trajectory (and
    # capacity to match) the retained map acts as an implicit loop
    # closure on revisits (APE 0.025 m on the same loop) — measured in
    # BENCHMARK.md "Trajectory-scale accuracy".
    lru_horizon: int = 100
    lru_clear_cycle: int = 10
    # ⊕ Motion sanity clamp (off by default — not in the reference): if
    # the aligned pose deviates more than this many meters from the
    # constant-velocity prediction, the alignment is rejected and the
    # engine coasts on the prediction. Catches both overshoot and
    # undershoot (the observed failure was an undershoot — ground
    # sliding; BENCHMARK.md frame-334). Set to ~0.5x the expected
    # per-frame motion; inactive until a motion estimate exists.
    # Enforced by the jitted MODEL engines (gicp_model*, vgicp_model*,
    # plane_icp_model*) AND the eager model engines (ScanToModelOdometry
    # / PlaneICPModelOdometry / VGICPModelOdometry); engines without a
    # motion model (scan-to-scan, flow) warn at construction if it is
    # set.
    max_frame_motion: Optional[float] = None
    # ⊕ Live-row compaction budget for the `_fused` model engines
    # (jitted path only): compact the map-side target to this many live
    # rows before the fused prepare, skipping the dead-slot fraction of
    # the per-frame Morton sort + gathers (round-5 device trace: the
    # largest non-kernel slice). Live rows beyond the budget are
    # DROPPED — size above the LRU-bounded live count (the 600-frame
    # benchmark world holds ~35k live points in a 327k-row map). None =
    # off (full-capacity tables, exact by construction).
    model_prepared_rows: Optional[int] = None
    # Dtype of the optimizer's 6x6 Newton solves ("same" | "float64");
    # see align_impl(solve_dtype=...). f32 Cholesky on a fine-voxel-
    # conditioned H can undershoot (BENCHMARK.md frame-335); the f64
    # solve costs 48 scalars per iteration and consumes the fused
    # kernel's f64-accumulated H before its f32 truncation. Default
    # "same" for round-to-round comparability.
    solve_dtype: str = "same"


class _OdometryBase:
    """Shared frame feeding / timing (OnlineOdometryEstimation,
    benchmark_odom.hpp:44-80)."""

    # Engines maintaining a constant-velocity motion model (T_delta)
    # override this; OdometryParams.max_frame_motion is only enforceable
    # on them.
    _supports_motion_clamp = False

    def __init__(self, params: Optional[OdometryParams] = None):
        self.params = params or OdometryParams()
        self.reg_times = Summarizer()
        self.traj: List[np.ndarray] = []
        if (
            self.params.max_frame_motion is not None
            and not self._supports_motion_clamp
        ):
            import warnings

            warnings.warn(
                f"{type(self).__name__} has no constant-velocity motion "
                "model; max_frame_motion is ignored by this engine "
                "(supported by the scan-to-model engines and the jitted "
                "odometry_scan path)",
                stacklevel=3,
            )

    def _motion_clamp(self, aligned: jax.Array) -> jax.Array:
        """⊕ Motion sanity clamp, identical semantics to the jitted path
        (odometry_scan.py): reject an alignment whose translation
        deviates more than max_frame_motion from the constant-velocity
        prediction T_world·T_delta and coast on the prediction instead.
        Inactive until a motion estimate exists. No-op unless the engine
        maintains T_world/T_delta and the param is set."""
        mfm = self.params.max_frame_motion
        if mfm is None:
            return aligned
        pred = self.T_world @ self.T_delta
        dev = jnp.linalg.norm(aligned[:3, 3] - pred[:3, 3])
        have_motion = jnp.linalg.norm(self.T_delta[:3, 3]) > 1e-6
        reject = have_motion & (dev > jnp.asarray(mfm, aligned.dtype))
        return jnp.where(reject, pred, aligned)

    def _prep_frame(self, points_xyz: np.ndarray) -> PointCloud:
        p = self.params
        cloud = PointCloud.from_points(
            np.asarray(points_xyz, dtype=p.dtype), capacity=p.max_scan_points
        )
        return cloud

    def estimate(self, frames) -> np.ndarray:
        """Run odometry over a list of [N,3] scans; returns [F,4,4] poses."""
        for i, f in enumerate(frames):
            t0 = time.perf_counter()
            T = self.estimate_frame(f)
            self.reg_times.push((time.perf_counter() - t0) * 1e3)
            self.traj.append(np.asarray(T))
        return np.stack(self.traj)

    def estimate_frame(self, points_xyz: np.ndarray) -> jax.Array:
        raise NotImplementedError

    def report(self) -> str:
        return f"registration_time_stats={self.reg_times} [msec/scan]"


class ScanToScanOdometry(_OdometryBase):
    """GICP scan-to-scan odometry
    (odometry_benchmark_small_gicp_omp.cpp:16-43): identity initial guess
    each frame, T_world accumulates relative poses."""

    def __init__(self, params: Optional[OdometryParams] = None,
                 registration_type: Optional[str] = None):
        super().__init__(params)
        p = self.params
        self.registration_type = registration_type or p.registration_type
        self.reg = Registration(
            registration_type=self.registration_type,
            max_correspondence_distance=p.max_correspondence_distance,
            solve_dtype=p.solve_dtype,
        )
        self._prev: Optional[PointCloud] = None
        self.T_world = jnp.eye(4, dtype=p.dtype)

    def _preprocess(self, cloud: PointCloud) -> PointCloud:
        p = self.params
        down = voxelgrid_sampling(
            cloud, p.downsampling_resolution, max_points=p.max_downsampled
        )
        if self.registration_type == "plane_icp":
            from small_gicp_tpu.ops.normals import estimate_normals

            return estimate_normals(down, num_neighbors=p.num_neighbors)
        if self.registration_type == "icp":
            return down
        return estimate_covariances(down, num_neighbors=p.num_neighbors)

    def estimate_frame(self, points_xyz: np.ndarray) -> jax.Array:
        cur = self._preprocess(self._prep_frame(points_xyz))
        if self._prev is None:
            self._prev = cur
            return self.T_world
        result = self.reg.align(self._prev, cur, None, None)
        from small_gicp_tpu.utils.lie import orthonormalize

        # re-project: the running f32 rotation product drifts off SO(3)
        self.T_world = orthonormalize(self.T_world @ result.T_target_source)
        self._prev = cur
        return self.T_world


class ScanToModelOdometry(_OdometryBase):
    """GICP scan-to-model odometry with an incremental voxel map
    (odometry_benchmark_small_gicp_model_tbb.cpp:22-47): the voxelmap is
    target AND search structure; registration solves the absolute pose,
    then the frame is inserted into the map at that pose."""

    _supports_motion_clamp = True

    def __init__(self, params: Optional[OdometryParams] = None):
        super().__init__(params)
        p = self.params
        self.reg = Registration(
            registration_type="gicp",
            max_correspondence_distance=p.max_correspondence_distance,
            solve_dtype=p.solve_dtype,
        )
        self.voxelmap = IncrementalVoxelMap.empty(
            p.voxel_resolution,
            capacity=p.map_capacity,
            dtype=p.dtype,
            has_covs=True,
            cell_capacity=10,
            num_offsets=p.num_offsets,
            lru_horizon=p.lru_horizon,
            lru_clear_cycle=p.lru_clear_cycle,
            voxel_capacity=p.map_voxel_capacity or p.map_capacity // 4,
        )
        self.T_world = jnp.eye(4, dtype=p.dtype)
        self.T_delta = jnp.eye(4, dtype=p.dtype)
        self._first = True

    def _preprocess(self, cloud: PointCloud) -> PointCloud:
        p = self.params
        down = voxelgrid_sampling(
            cloud, p.downsampling_resolution, max_points=p.max_downsampled
        )
        return estimate_covariances(down, num_neighbors=p.num_neighbors)

    def estimate_frame(self, points_xyz: np.ndarray) -> jax.Array:
        from small_gicp_tpu.utils.lie import rigid_inverse

        cur = self._preprocess(self._prep_frame(points_xyz))
        if self._first:
            self.voxelmap = self.voxelmap.insert(cur, self.T_world)
            self._first = False
            return self.T_world
        guess = (self.T_world @ self.T_delta if self.params.predict_motion
                 else self.T_world)
        result = self.reg.align(self.voxelmap, cur, None, guess)
        T_new = self._motion_clamp(result.T_target_source)
        from small_gicp_tpu.utils.lie import orthonormalize

        T_new = orthonormalize(T_new)  # keep the f32 rotation on SO(3)
        self.T_delta = rigid_inverse(self.T_world) @ T_new
        self.T_world = T_new
        self.voxelmap = self.voxelmap.insert(cur, self.T_world)
        return self.T_world


class PlaneICPModelOdometry(ScanToModelOdometry):
    """Point-to-plane scan-to-model odometry: the incremental map stores
    NORMALS (IncrementalVoxelMapNormal payload) and the point-to-plane
    factor runs against the model. No reference counterpart (its model
    engines are GICP/VGICP only); registry parity with the jitted
    `plane_icp_model` engine (models/odometry_scan.py)."""

    def __init__(self, params: Optional[OdometryParams] = None):
        super().__init__(params)
        p = self.params
        self.reg = Registration(
            registration_type="plane_icp",
            max_correspondence_distance=p.max_correspondence_distance,
            solve_dtype=p.solve_dtype,
        )
        self.voxelmap = IncrementalVoxelMap.empty(
            p.voxel_resolution,
            capacity=p.map_capacity,
            dtype=p.dtype,
            has_normals=True,
            cell_capacity=10,
            num_offsets=p.num_offsets,
            lru_horizon=p.lru_horizon,
            lru_clear_cycle=p.lru_clear_cycle,
            voxel_capacity=p.map_voxel_capacity or p.map_capacity // 4,
        )

    def _preprocess(self, cloud: PointCloud) -> PointCloud:
        from small_gicp_tpu.ops.normals import estimate_normals

        p = self.params
        down = voxelgrid_sampling(
            cloud, p.downsampling_resolution, max_points=p.max_downsampled
        )
        return estimate_normals(down, num_neighbors=p.num_neighbors)


class VGICPModelOdometry(_OdometryBase):
    """VGICP scan-to-model odometry with a Gaussian voxel map
    (odometry_benchmark_small_vgicp_model_tbb.cpp:30-45)."""

    _supports_motion_clamp = True

    def __init__(self, params: Optional[OdometryParams] = None):
        super().__init__(params)
        p = self.params
        self.reg = Registration(registration_type="vgicp",
                                solve_dtype=p.solve_dtype)
        self.voxelmap = GaussianVoxelMap.empty(
            p.voxel_resolution, capacity=p.map_capacity, dtype=p.dtype,
            num_offsets=p.num_offsets,
            lru_horizon=p.lru_horizon,
            lru_clear_cycle=p.lru_clear_cycle,
        )
        self.T_world = jnp.eye(4, dtype=p.dtype)
        self.T_delta = jnp.eye(4, dtype=p.dtype)
        self._first = True

    def _preprocess(self, cloud: PointCloud) -> PointCloud:
        p = self.params
        down = voxelgrid_sampling(
            cloud, p.downsampling_resolution, max_points=p.max_downsampled
        )
        return estimate_covariances(down, num_neighbors=p.num_neighbors)

    def estimate_frame(self, points_xyz: np.ndarray) -> jax.Array:
        from small_gicp_tpu.utils.lie import rigid_inverse

        cur = self._preprocess(self._prep_frame(points_xyz))
        if self._first:
            self.voxelmap = self.voxelmap.insert(cur, self.T_world)
            self._first = False
            return self.T_world
        guess = (self.T_world @ self.T_delta if self.params.predict_motion
                 else self.T_world)
        result = self.reg.align(self.voxelmap, cur, None, guess)
        T_new = self._motion_clamp(result.T_target_source)
        from small_gicp_tpu.utils.lie import orthonormalize

        T_new = orthonormalize(T_new)  # keep the f32 rotation on SO(3)
        self.T_delta = rigid_inverse(self.T_world) @ T_new
        self.T_world = T_new
        self.voxelmap = self.voxelmap.insert(cur, self.T_world)
        return self.T_world


class VGICPScanToScanOdometry(_OdometryBase):
    """VGICP scan-to-scan odometry: the previous frame becomes a
    GaussianVoxelMap target each step
    (odometry_benchmark_small_vgicp_{omp,tbb}.cpp)."""

    def __init__(self, params: Optional[OdometryParams] = None):
        super().__init__(params)
        p = self.params
        self.reg = Registration(registration_type="vgicp",
                                solve_dtype=p.solve_dtype)
        self._prev_map: Optional[GaussianVoxelMap] = None
        self.T_world = jnp.eye(4, dtype=p.dtype)

    def _preprocess(self, cloud: PointCloud) -> PointCloud:
        p = self.params
        down = voxelgrid_sampling(
            cloud, p.downsampling_resolution, max_points=p.max_downsampled
        )
        return estimate_covariances(down, num_neighbors=p.num_neighbors)

    def estimate_frame(self, points_xyz: np.ndarray) -> jax.Array:
        p = self.params
        cur = self._preprocess(self._prep_frame(points_xyz))
        cur_map = GaussianVoxelMap.build(
            cur, p.voxel_resolution, capacity=p.max_downsampled
        )
        if self._prev_map is None:
            self._prev_map = cur_map
            return self.T_world
        result = self.reg.align(self._prev_map, cur, None, None)
        from small_gicp_tpu.utils.lie import orthonormalize

        # re-project: the running f32 rotation product drifts off SO(3)
        self.T_world = orthonormalize(self.T_world @ result.T_target_source)
        self._prev_map = cur_map
        return self.T_world


class FlowScanToScanOdometry(ScanToScanOdometry):
    """Pipelined scan-to-scan odometry — the TPU analog of the
    reference's TBB flow-graph engine
    (odometry_benchmark_small_gicp_tbb_flow.cpp:56-141): per-frame poses
    are left on device and never synchronized inside the loop, so host
    preprocessing/feeding of frame i+1 overlaps device registration of
    frame i (XLA's async dispatch is the dataflow graph). Trajectory is
    materialized once at the end."""

    def estimate(self, frames) -> np.ndarray:
        device_traj = []
        t_start = time.perf_counter()
        for f in frames:
            device_traj.append(self.estimate_frame(f))
        # Results complete in dispatch order on the device stream, so the
        # difference between consecutive block_until_ready timestamps is
        # the REAL steady-state pipeline lap for each frame (frames behind
        # the one being waited on keep computing). This gives the
        # Summarizer true per-frame laps with true variance, matching the
        # reference's per-frame stopwatch contract (benchmark_odom.hpp:54-57).
        t_prev = t_start
        for T in device_traj:
            jax.block_until_ready(T)
            t_now = time.perf_counter()
            self.reg_times.push((t_now - t_prev) * 1e3)
            t_prev = t_now
        poses = np.stack([np.asarray(T) for T in device_traj])
        self.traj = [p for p in poses]
        return poses


class ProjectiveScanToScanOdometry(ScanToScanOdometry):
    """GICP scan-to-scan odometry searching correspondences through the
    equirectangular ProjectiveSearch instead of exact NN — the engine
    analog of plugging ProjectiveSearch into the Registration template
    (ann/projective_search.hpp:42-184, 03_registration_template.cpp:152-179).
    The index image is rebuilt per frame from the previous cloud (an
    O(N) scatter), so per-frame cost trades exactness for a
    construction-free, window-bounded search."""

    def estimate_frame(self, points_xyz: np.ndarray) -> jax.Array:
        from small_gicp_tpu.ops.projective_search import ProjectiveSearch

        cur = self._preprocess(self._prep_frame(points_xyz))
        if self._prev is None:
            self._prev = cur
            return self.T_world
        tree = ProjectiveSearch.build(self._prev)
        result = self.reg.align(self._prev, cur, tree, None)
        from small_gicp_tpu.utils.lie import orthonormalize

        # re-project: the running f32 rotation product drifts off SO(3)
        self.T_world = orthonormalize(self.T_world @ result.T_target_source)
        self._prev = cur
        return self.T_world


def _scan_to_scan_factory(rtype):
    def make(params=None):
        return ScanToScanOdometry(params, registration_type=rtype)

    return make


ENGINES = {
    "small_gicp": ScanToScanOdometry,
    "small_icp": _scan_to_scan_factory("icp"),
    "small_plane_icp": _scan_to_scan_factory("plane_icp"),
    "small_vgicp": VGICPScanToScanOdometry,
    "small_gicp_model": ScanToModelOdometry,
    "small_plane_icp_model": PlaneICPModelOdometry,
    "small_vgicp_model": VGICPModelOdometry,
    "small_gicp_flow": FlowScanToScanOdometry,
    "small_gicp_projective": ProjectiveScanToScanOdometry,
}


def create_odometry(engine: str, params: Optional[OdometryParams] = None):
    """Engine registry (benchmark_odom.hpp:112-116)."""
    if engine not in ENGINES:
        raise ValueError(f"unknown engine {engine!r}; have {sorted(ENGINES)}")
    return ENGINES[engine](params)


def write_trajectory(path: str, poses: np.ndarray):
    """KITTI-format trajectory (3x4 rows) — evo-compatible output
    (odometry_benchmark.cpp:82-94)."""
    with open(path, "w") as f:
        for T in poses:
            row = np.asarray(T)[:3, :].reshape(-1)
            f.write(" ".join(f"{v:.9g}" for v in row) + "\n")
