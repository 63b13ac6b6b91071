"""Fully-jitted odometry: the whole scan-to-model loop as ONE XLA program.

This is the TPU-native end state sketched in SURVEY.md §3.3: state =
(T_world, voxel-map arrays) lives in HBM, and one `lax.scan` step =
downsample → covariance estimation → batched KNN vs map → vmapped
linearize → 6x6 solve → exp-update → scatter-insert. The host only
supplies stacked frames and receives poses — zero per-frame dispatch,
which matters doubly on tunneled TPU setups where every dispatch costs
milliseconds.

The per-frame Python engines in models/odometry.py remain the streaming
API; this module is the throughput path (process a whole sequence, or
chunk a long one with `JitOdometry.feed`).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from small_gicp_tpu.point_cloud import PAD_SENTINEL, PointCloud, transform_covs
from small_gicp_tpu.ops.downsampling import _voxelgrid_sampling_impl
from small_gicp_tpu.ops.normals import _estimate_impl
from small_gicp_tpu.ops.voxel_covs import voxelgrid_sampling_with_covs_impl
from small_gicp_tpu.models.registration import align_impl
from small_gicp_tpu.utils.lie import rigid_inverse
from small_gicp_tpu.models.voxelmap import GaussianVoxelMap, IncrementalVoxelMap
from small_gicp_tpu.models.odometry import OdometryParams


@partial(
    jax.jit,
    static_argnames=(
        "max_downsampled", "num_neighbors", "covariance_mode",
        "predict_motion", "model_nn", "model_rtype", "max_frame_motion",
        "model_prepared_rows", "solve_dtype",
    ),
)
def odometry_scan_step(
    carry,
    frame_points: jax.Array,  # [N,4] padded homogeneous
    frame_count: jax.Array,  # scalar int32
    downsampling_resolution: float = 0.25,
    max_correspondence_distance: float = 1.0,
    max_downsampled: int = 8192,
    num_neighbors: int = 20,
    covariance_mode: str = "knn",
    predict_motion: bool = False,
    model_nn: str = "voxel",
    model_rtype: str = "gicp",
    max_frame_motion: float = 0.0,
    model_prepared_rows: int = 0,
    solve_dtype: str = "same",
):
    """One odometry step; carry = (T_world [4,4], T_delta [4,4],
    voxelmap, is_first). T_delta is the last frame-to-frame motion; with
    predict_motion=True the alignment is seeded with the
    constant-velocity prediction T_world @ T_delta instead of the raw
    previous pose (see OdometryParams.predict_motion — not in the
    reference, off by default).

    covariance_mode: "knn" (default) reproduces the reference's kNN
    covariances; "knn_fused" keeps the same exact-kNN semantics through
    the single fused moments kernel (ops/cov_fused_pallas.py — no
    [N,k] neighbor gather); "voxel" uses fused 27-voxel neighborhood
    moments (ops/voxel_covs.py) — fewer FLOPs but gather-bound on
    current TPUs, so "knn" is faster there; "knn_window" uses the
    multi-shift Morton-banded approximate self-kNN (ops/knn_window.py)
    — O(N·S·W) instead of the O(N²) exact search, ≥97% neighbor recall
    with covariances tested indistinguishable (tests/test_knn_window.py).
    """
    T_world, T_delta, vm, is_first = carry
    dtype = frame_points.dtype

    if covariance_mode not in ("knn", "knn_fused", "knn_window", "voxel"):
        raise ValueError(
            f"unknown covariance_mode {covariance_mode!r}; "
            "have 'knn', 'knn_fused', 'knn_window', 'voxel'"
        )
    if model_rtype == "plane_icp":
        # Point-to-plane scan-to-model: the map stores NORMALS, not
        # covariances (IncrementalVoxelMapNormal payload). No reference
        # engine does this (its model engines are GICP/VGICP only) —
        # it falls out of the factor/target plumbing here.
        pts, n = _voxelgrid_sampling_impl(
            frame_points,
            frame_count,
            jnp.asarray(downsampling_resolution, dtype),
            max_downsampled,
        )
        normals, _ = _estimate_impl(
            pts, n, num_neighbors, True, False,
            neighbor_mode=(
                "window" if covariance_mode == "knn_window"
                else "fused" if covariance_mode == "knn_fused"
                else "exact"
            ),
            window_cell=downsampling_resolution,
        )
        cloud = PointCloud(points=pts, num_points=n, normals=normals)
    elif covariance_mode == "voxel":
        pts, n, covs, _ = voxelgrid_sampling_with_covs_impl(
            frame_points,
            frame_count,
            jnp.asarray(downsampling_resolution, dtype),
            max_downsampled,
        )
        cloud = PointCloud(points=pts, num_points=n, covs=covs)
    else:
        pts, n = _voxelgrid_sampling_impl(
            frame_points,
            frame_count,
            jnp.asarray(downsampling_resolution, dtype),
            max_downsampled,
        )
        _, covs = _estimate_impl(
            pts, n, num_neighbors, False, True,
            neighbor_mode=(
                "window" if covariance_mode == "knn_window"
                else "fused" if covariance_mode == "knn_fused"
                else "exact"
            ),
            # the multi-shift union carries the recall; the downsampled
            # point spacing is the natural quantization cell
            window_cell=downsampling_resolution,
        )
        cloud = PointCloud(points=pts, num_points=n, covs=covs)

    # Registration vs the map (solves the absolute pose, like the
    # reference's model engines). On the first frame the map is empty:
    # every correspondence is masked out, H=0, all lambda trials accept a
    # zero delta, and the selected pose below falls back to T_world.
    guess = T_world @ T_delta if predict_motion else T_world
    target = vm
    if model_nn == "bruteforce":
        # TPU-native model variant: correspondence = exact nearest
        # stored element (voxel mean for GVM, stored point for IVM)
        # over the WHOLE map, as MXU brute force / the 2-kernel fused
        # Pallas path — instead of the reference's voxel-key candidate
        # lookup. Semantically a superset of the key lookup (never
        # misses a candidate the key search would find within
        # max_correspondence_distance); trajectories are
        # equivalence-tested against the "voxel" mode. The slot-table
        # cloud views are exactly the fused kernel's target layout;
        # dead/stale slots carry sentinel coords, so the distance
        # rejector masks them on every path.
        from small_gicp_tpu.models.voxelmap import ivm_as_cloud, voxelmap_as_cloud

        needs = "has_normals" if model_rtype == "plane_icp" else "has_covs"
        if isinstance(vm, GaussianVoxelMap):
            target = voxelmap_as_cloud(vm)
        elif isinstance(vm, IncrementalVoxelMap) and getattr(vm, needs):
            target = ivm_as_cloud(vm)
        else:
            raise ValueError(
                "model_nn='bruteforce' needs a GaussianVoxelMap or an "
                f"IncrementalVoxelMap with {needs}"
            )
        if 0 < model_prepared_rows < target.points.shape[0]:
            # ⊕ Live-row compaction before the fused prepare (round-5
            # device trace: the map-capacity-sized Morton sort + gathers
            # were the largest non-kernel slice at ~10% live rows). See
            # point_cloud.compact_cloud for the drop semantics.
            from small_gicp_tpu.point_cloud import compact_cloud

            target = compact_cloud(target, model_prepared_rows)
    result = align_impl(
        target,
        cloud,
        None,
        guess,
        registration_type=model_rtype,
        max_dist_sq=max_correspondence_distance**2,
        solve_dtype=solve_dtype,
    )
    real = frame_count > 0
    from small_gicp_tpu.utils.lie import orthonormalize

    aligned = result.T_target_source
    if max_frame_motion > 0.0:
        # ⊕ Motion sanity clamp (OdometryParams.max_frame_motion): a
        # single wrong-minimum alignment otherwise throws the whole
        # downstream trajectory (BENCHMARK.md frame-334 — an UNDERSHOOT:
        # est motion 0.49 m vs 1.2 m real, classic ground sliding, so a
        # seed-relative max test cannot catch it). The test is deviation
        # from the constant-velocity PREDICTION T_world·T_delta; on
        # violation the engine COASTS on the prediction — both
        # overshoots and undershoots reject, and the map still advances
        # at the predicted pose. Inactive until a motion estimate
        # exists (|T_delta| ≈ 0: first frames / stationary starts).
        pred = T_world @ T_delta
        dev = jnp.linalg.norm(aligned[:3, 3] - pred[:3, 3])
        have_motion = jnp.linalg.norm(T_delta[:3, 3]) > 1e-6
        reject = have_motion & (dev > jnp.asarray(max_frame_motion, dtype))
        aligned = jnp.where(reject, pred, aligned)
    # Re-project the estimated rotation onto SO(3) each frame: f32 pose
    # composition (guess = previous pose, hundreds of frames) otherwise
    # drifts off-manifold — drift the f64 reference never accumulates.
    T_new = jnp.where(
        is_first | ~real, T_world, orthonormalize(aligned)
    )
    delta_new = jnp.where(
        is_first | ~real, T_delta, rigid_inverse(T_world) @ T_new
    )
    vm = vm.insert(cloud, T_new)
    is_first_new = jnp.where(real, False, is_first)
    return (T_new, delta_new, vm, is_first_new), T_new


@partial(
    jax.jit,
    static_argnames=(
        "max_downsampled", "num_neighbors", "registration_type", "predict_motion"
    ),
)
def odometry_scan_step_s2s(
    carry,
    frame_points: jax.Array,  # [N,4] padded homogeneous
    frame_count: jax.Array,  # scalar int32
    downsampling_resolution: float = 0.25,
    max_correspondence_distance: float = 1.0,
    max_downsampled: int = 8192,
    num_neighbors: int = 20,
    registration_type: str = "gicp",
    predict_motion: bool = False,
):
    """One scan-to-scan step (BASELINE config 3 / the reference's
    small_gicp engines, odometry_benchmark_small_gicp_omp.cpp:16-43):
    identity initial guess (or the previous relative motion when
    predict_motion=True), align current frame against the PREVIOUS
    frame, accumulate the relative pose.

    carry = (T_world [4,4], T_delta [4,4], prev PointCloud, is_first).
    The previous frame rides in the carry as a fixed-capacity cloud, so
    the whole trajectory runs as one lax.scan program.
    """
    T_world, T_delta, prev, is_first = carry
    dtype = frame_points.dtype

    pts, n = _voxelgrid_sampling_impl(
        frame_points,
        frame_count,
        jnp.asarray(downsampling_resolution, dtype),
        max_downsampled,
    )
    if registration_type == "plane_icp":
        normals, _ = _estimate_impl(pts, n, num_neighbors, True, False)
        cur = PointCloud(points=pts, num_points=n, normals=normals)
    elif registration_type == "icp":
        cur = PointCloud(points=pts, num_points=n)
    else:
        _, covs = _estimate_impl(pts, n, num_neighbors, False, True)
        cur = PointCloud(points=pts, num_points=n, covs=covs)

    guess = T_delta if predict_motion else jnp.eye(4, dtype=dtype)
    result = align_impl(
        prev,
        cur,
        None,
        guess,
        registration_type=registration_type,
        max_dist_sq=max_correspondence_distance**2,
    )
    # First frame: the "previous" cloud is empty → every correspondence
    # masks out and the relative pose stays at the guess; force identity.
    real = frame_count > 0
    T_rel = jnp.where(
        is_first | ~real, jnp.eye(4, dtype=dtype), result.T_target_source
    )
    from small_gicp_tpu.utils.lie import orthonormalize

    # The running product T_world·T_rel accumulates f32 off-manifold
    # drift even faster than the scan-to-model path (a fresh rotation
    # multiplies in every frame); re-project each step.
    T_new = orthonormalize(T_world @ T_rel)
    delta_new = jnp.where(is_first | ~real, T_delta, T_rel)
    # Empty (padded-tail) frames are no-ops: keep the previous cloud so a
    # later real frame still has a target.
    prev_new = jax.tree_util.tree_map(
        lambda a, b: jnp.where(real, a, b), cur, prev
    )
    is_first_new = jnp.where(real, False, is_first)
    return (T_new, delta_new, prev_new, is_first_new), T_new


@partial(
    jax.jit,
    static_argnames=(
        "max_downsampled", "num_neighbors", "registration_type", "predict_motion"
    ),
)
def odometry_scan_s2s(
    carry,
    frames: jax.Array,  # [F,N,4]
    counts: jax.Array,  # [F]
    downsampling_resolution: float = 0.25,
    max_correspondence_distance: float = 1.0,
    max_downsampled: int = 8192,
    num_neighbors: int = 20,
    registration_type: str = "gicp",
    predict_motion: bool = False,
):
    """Scan-to-scan odometry over a chunk of frames in one program."""

    def step(c, xs):
        pts, cnt = xs
        return odometry_scan_step_s2s(
            c,
            pts,
            cnt,
            downsampling_resolution=downsampling_resolution,
            max_correspondence_distance=max_correspondence_distance,
            max_downsampled=max_downsampled,
            num_neighbors=num_neighbors,
            registration_type=registration_type,
            predict_motion=predict_motion,
        )

    return jax.lax.scan(step, carry, (frames, counts))


@partial(
    jax.jit,
    static_argnames=(
        "max_downsampled", "num_neighbors", "covariance_mode",
        "predict_motion", "model_nn", "model_rtype", "max_frame_motion",
        "model_prepared_rows", "solve_dtype",
    ),
)
def odometry_scan(
    carry,
    frames: jax.Array,  # [F,N,4]
    counts: jax.Array,  # [F]
    downsampling_resolution: float = 0.25,
    max_correspondence_distance: float = 1.0,
    max_downsampled: int = 8192,
    num_neighbors: int = 20,
    covariance_mode: str = "knn",
    predict_motion: bool = False,
    model_nn: str = "voxel",
    model_rtype: str = "gicp",
    max_frame_motion: float = 0.0,
    model_prepared_rows: int = 0,
    solve_dtype: str = "same",
):
    """Run a chunk of frames through the odometry loop in one program.

    Returns (carry, poses [F,4,4]).
    """

    def step(c, xs):
        pts, cnt = xs
        return odometry_scan_step(
            c,
            pts,
            cnt,
            downsampling_resolution=downsampling_resolution,
            max_correspondence_distance=max_correspondence_distance,
            max_downsampled=max_downsampled,
            num_neighbors=num_neighbors,
            covariance_mode=covariance_mode,
            predict_motion=predict_motion,
            model_nn=model_nn,
            model_rtype=model_rtype,
            max_frame_motion=max_frame_motion,
            model_prepared_rows=model_prepared_rows,
            solve_dtype=solve_dtype,
        )

    return jax.lax.scan(step, carry, (frames, counts))


def stack_frames(frames, n_slots: int, max_scan_points: int, dtype):
    """Host-side stack+pad of [N,3] scans into ([n_slots, max_scan_points, 4]
    padded homogeneous frames, [n_slots] counts). The single source of
    truth for the frame padding convention (sentinel xyz, w=0 padding,
    silent truncation at max_scan_points) shared by JitOdometry and
    BatchOdometry."""
    stacked = np.full((n_slots, max_scan_points, 4), PAD_SENTINEL, dtype)
    stacked[:, :, 3] = 0.0
    counts = np.zeros((n_slots,), np.int32)
    for i, f in enumerate(frames):
        f = np.asarray(f, dtype=dtype)[:max_scan_points]
        stacked[i, : len(f), :3] = f
        stacked[i, : len(f), 3] = 1.0
        counts[i] = len(f)
    return stacked, counts


def _model_nn_for(engine: str) -> str:
    """Correspondence mode implied by the engine name (see
    odometry_scan_step's model_nn)."""
    return "bruteforce" if engine.endswith("_fused") else "voxel"


def _model_rtype_for(engine: str) -> str:
    """Model-path factor type implied by the engine name."""
    return "plane_icp" if engine.startswith("plane_icp_model") else "gicp"


def make_initial_carry(params: OdometryParams, engine: str):
    """(carry, registration_type) for an odometry loop of `engine`.

    carry = (T_world, T_delta, model, is_first); the model pytree type
    (IncrementalVoxelMap / GaussianVoxelMap / PointCloud) selects the
    engine behavior inside the jitted step. registration_type is None
    for the model engines (always GICP) and the factor name for
    scan-to-scan engines.
    """
    p = params
    dtype = jnp.dtype(p.dtype)
    rtype = None
    if engine in ("gicp_model", "gicp_model_fused"):
        # "_fused": same IVM model, correspondence = exact nearest
        # stored point on the brute-force/fused path
        # (odometry_scan_step model_nn="bruteforce").
        vm = IncrementalVoxelMap.empty(
            p.voxel_resolution,
            capacity=p.map_capacity,
            dtype=dtype,
            has_covs=True,
            num_offsets=p.num_offsets,
            lru_horizon=p.lru_horizon,
            lru_clear_cycle=p.lru_clear_cycle,
            voxel_capacity=p.map_voxel_capacity or p.map_capacity // 4,
        )
    elif engine in ("plane_icp_model", "plane_icp_model_fused"):
        # Point-to-plane scan-to-model (no reference counterpart): the
        # map stores normals; correspondences via voxel-key lookup or,
        # for "_fused", exact nearest stored point.
        vm = IncrementalVoxelMap.empty(
            p.voxel_resolution,
            capacity=p.map_capacity,
            dtype=dtype,
            has_normals=True,
            num_offsets=p.num_offsets,
            lru_horizon=p.lru_horizon,
            lru_clear_cycle=p.lru_clear_cycle,
            voxel_capacity=p.map_voxel_capacity or p.map_capacity // 4,
        )
    elif engine in ("vgicp_model", "vgicp_model_fused"):
        # "_fused": same GVM model, but correspondence = nearest voxel
        # mean via MXU brute force / the fused Pallas kernels
        # (odometry_scan_step model_nn="bruteforce").
        vm = GaussianVoxelMap.empty(
            p.voxel_resolution, capacity=p.map_capacity, dtype=dtype,
            num_offsets=p.num_offsets,
            lru_horizon=p.lru_horizon,
            lru_clear_cycle=p.lru_clear_cycle,
        )
    elif engine in ("gicp_scan", "plane_icp_scan", "icp_scan"):
        # Scan-to-scan: the "map" is the previous frame, carried as a
        # fixed-capacity cloud (empty on the first frame).
        rtype = engine[: -len("_scan")]
        pad = jnp.asarray(
            [PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], dtype
        )
        vm = PointCloud(
            points=jnp.broadcast_to(pad, (p.max_downsampled, 4)).copy(),
            num_points=jnp.asarray(0, jnp.int32),
            normals=(jnp.zeros((p.max_downsampled, 4), dtype)
                     if rtype == "plane_icp" else None),
            covs=(jnp.zeros((p.max_downsampled, 3, 3), dtype)
                  if rtype == "gicp" else None),
        )
    else:
        raise ValueError(f"unknown engine {engine!r}")
    carry = (
        jnp.eye(4, dtype=dtype),
        jnp.eye(4, dtype=dtype),
        vm,
        jnp.asarray(True),
    )
    return carry, rtype


class JitOdometry:
    """Chunked driver around odometry_scan: feed [F,N,3] numpy frame
    blocks, collect poses; device state persists across chunks.

    Frames are processed in fixed-size chunks of `chunk_frames` (the
    tail chunk padded with empty frames, which are exact no-ops: zero
    points insert nothing and the pose carries through) so ONE compiled
    program serves any sequence length.
    """

    def __init__(self, params: Optional[OdometryParams] = None,
                 engine: str = "gicp_model", chunk_frames: int = 8,
                 covariance_mode: str = "knn"):
        self.chunk_frames = chunk_frames
        self.covariance_mode = covariance_mode
        self.chunk_times_ms: list = []  # wall ms per chunk (first includes compile)
        self.params = params or OdometryParams()
        self.engine = engine
        # Loud param drops (advisor r5): scan-to-scan engines have no
        # motion model, and the compaction knob only applies on the
        # bruteforce/fused model path — don't let either silently no-op.
        if engine.endswith("_scan"):
            if self.params.max_frame_motion is not None:
                import warnings

                warnings.warn(
                    f"JitOdometry({engine!r}) is scan-to-scan and has no "
                    "constant-velocity motion model; max_frame_motion is "
                    "ignored (supported by the jitted MODEL engines)",
                    stacklevel=2,
                )
        if (
            self.params.model_prepared_rows
            and _model_nn_for(engine) != "bruteforce"
        ):
            import warnings

            warnings.warn(
                f"JitOdometry({engine!r}): model_prepared_rows only "
                "applies to the _fused (bruteforce-NN) model engines and "
                "is ignored here",
                stacklevel=2,
            )
        self.carry, rtype = make_initial_carry(self.params, engine)
        if rtype is not None:
            self.registration_type = rtype
        self.poses = []

    def _stack_frames(self, frames, n_slots: int):
        p = self.params
        return stack_frames(frames, n_slots, p.max_scan_points, p.dtype)

    def _run_chunk(self, frames_dev, counts_dev):
        p = self.params
        if self.engine.endswith("_scan"):
            self.carry, poses = odometry_scan_s2s(
                self.carry,
                frames_dev,
                counts_dev,
                downsampling_resolution=p.downsampling_resolution,
                max_correspondence_distance=p.max_correspondence_distance,
                max_downsampled=p.max_downsampled,
                num_neighbors=p.num_neighbors,
                registration_type=self.registration_type,
                predict_motion=p.predict_motion,
            )
            return poses
        # The voxelmap pytree type in `carry` selects gicp-model vs
        # vgicp-model behavior (align_impl dispatches on target type).
        self.carry, poses = odometry_scan(
            self.carry,
            frames_dev,
            counts_dev,
            downsampling_resolution=p.downsampling_resolution,
            max_correspondence_distance=p.max_correspondence_distance,
            max_downsampled=p.max_downsampled,
            num_neighbors=p.num_neighbors,
            covariance_mode=self.covariance_mode,
            predict_motion=p.predict_motion,
            model_nn=_model_nn_for(self.engine),
            model_rtype=_model_rtype_for(self.engine),
            max_frame_motion=float(p.max_frame_motion or 0.0),
            model_prepared_rows=int(p.model_prepared_rows or 0),
            solve_dtype=p.solve_dtype,
        )
        return poses

    def preload(self, frames) -> Tuple[jax.Array, jax.Array]:
        """Stack+pad [N,3] scans on the host and transfer them to the
        device ONCE, padded to a whole number of chunks.

        Returns (frames_dev [F',N,4], counts_dev [F']) for
        `feed_preloaded`. This is the analog of the reference benchmark
        preloading the KITTI dataset into RAM before timing
        (src/benchmark/benchmark_odom.* reads all scans first): per-scan
        timing should measure the pipeline, not the host link.
        """
        fc = self.chunk_frames
        f_pad = (len(frames) + fc - 1) // fc * fc
        stacked, counts = self._stack_frames(frames, f_pad)
        return jnp.asarray(stacked), jnp.asarray(counts)

    def feed_preloaded(self, frames_dev: jax.Array, counts_dev: jax.Array,
                       n_real: Optional[int] = None) -> np.ndarray:
        """Run the odometry loop over device-resident frames (see
        `preload`); returns the real frames' [F,4,4] poses. Padded tail
        frames have zero points and are exact no-ops; by default they
        are trimmed by dropping trailing zero-count entries (pass
        n_real explicitly if trailing real frames can be empty)."""
        fc = self.chunk_frames
        f_pad = frames_dev.shape[0]
        if n_real is None:
            counts_host = np.asarray(counts_dev)
            nz = np.nonzero(counts_host > 0)[0]
            n_real = int(nz[-1]) + 1 if nz.size else 0
        out = []
        import time as _time

        for start in range(0, f_pad, fc):
            t0 = _time.perf_counter()
            poses_chunk = self._run_chunk(
                jax.lax.dynamic_slice_in_dim(frames_dev, start, fc),
                jax.lax.dynamic_slice_in_dim(counts_dev, start, fc),
            )
            # device_get of one scalar, not block_until_ready: the
            # tunneled dev runtime's block_until_ready can return before
            # remote execution finishes, which silently voids the
            # per-chunk timing (a 4-byte fetch forces a real sync and is
            # noise on any runtime).
            jax.device_get(poses_chunk[-1, 3, 3])
            self.chunk_times_ms.append((_time.perf_counter() - t0) * 1e3)
            out.append(poses_chunk)
        if out:
            poses = np.concatenate([np.asarray(b) for b in out])[:n_real]
        else:
            poses = np.zeros((0, 4, 4), self.params.dtype)
        self.poses.extend(poses)
        return poses

    def feed(self, frames) -> np.ndarray:
        """Process [N,3] scans; returns their [F,4,4] poses."""
        fc = self.chunk_frames
        out = []
        for start in range(0, len(frames), fc):
            block = frames[start:start + fc]
            stacked, counts = self._stack_frames(block, fc)
            poses = self._run_chunk(jnp.asarray(stacked), jnp.asarray(counts))
            out.append(np.asarray(poses)[:len(block)])
        poses = (np.concatenate(out) if out
                 else np.zeros((0, 4, 4), self.params.dtype))
        self.poses.extend(poses)
        return poses


# ======================================================================
# Batch-parallel odometry: B independent sequences in ONE program
# ======================================================================


@partial(
    jax.jit,
    static_argnames=(
        "max_downsampled", "num_neighbors", "covariance_mode",
        "predict_motion", "registration_type", "model_nn", "model_rtype",
    ),
)
def odometry_scan_batch(
    carries,
    frames: jax.Array,  # [B,F,N,4]
    counts: jax.Array,  # [B,F]
    downsampling_resolution: float = 0.25,
    max_correspondence_distance: float = 1.0,
    max_downsampled: int = 8192,
    num_neighbors: int = 20,
    covariance_mode: str = "knn",
    predict_motion: bool = False,
    registration_type: Optional[str] = None,
    model_nn: str = "voxel",
    model_rtype: str = "gicp",
):
    """B independent odometry loops, vmapped into one program.

    No reference counterpart (the CPU library runs one sequence at a
    time): batch-parallel odometry is the TPU-native throughput shape —
    a fleet of sequences mapped simultaneously, with the lane axis
    shardable over a device mesh (see BatchOdometry(mesh=...)). Each
    lane carries its own map; lanes never interact, so sharding the
    batch axis moves zero bytes between chips during the loop.

    carries: lane-stacked pytree from make_initial_carry (leading dim B).
    registration_type: None for model engines; factor name for
    scan-to-scan lanes.
    Returns (carries, poses [B,F,4,4]).
    """

    if registration_type is None:
        def run(c, f, n):
            return odometry_scan(
                c, f, n,
                downsampling_resolution=downsampling_resolution,
                max_correspondence_distance=max_correspondence_distance,
                max_downsampled=max_downsampled,
                num_neighbors=num_neighbors,
                covariance_mode=covariance_mode,
                predict_motion=predict_motion,
                model_nn=model_nn,
                model_rtype=model_rtype,
            )
    else:
        def run(c, f, n):
            return odometry_scan_s2s(
                c, f, n,
                downsampling_resolution=downsampling_resolution,
                max_correspondence_distance=max_correspondence_distance,
                max_downsampled=max_downsampled,
                num_neighbors=num_neighbors,
                registration_type=registration_type,
                predict_motion=predict_motion,
            )

    return jax.vmap(run)(carries, frames, counts)


class BatchOdometry:
    """Fleet odometry: B sequences tracked simultaneously in one jitted
    program, each lane with its own model map.

    With `mesh`, the lane axis is sharded over the devices (pure data
    parallelism — zero inter-chip traffic during the loop); without it,
    all lanes run on the default device. Lane results are numerically
    equivalent to running each sequence through JitOdometry alone
    (tested to 1e-5/1e-6; vmap may change fusion/reduction layouts, so
    bit-exactness is not guaranteed).
    """

    def __init__(self, num_lanes: int,
                 params: Optional[OdometryParams] = None,
                 engine: str = "gicp_model",
                 covariance_mode: str = "knn",
                 mesh=None, axis_name: str = "data"):
        self.params = params or OdometryParams()
        self.engine = engine
        self.covariance_mode = covariance_mode
        self.num_lanes = num_lanes
        carry0, self.registration_type = make_initial_carry(
            self.params, engine
        )
        carries = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                x, (num_lanes,) + jnp.shape(x)
            ).copy(),
            carry0,
        )
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = int(np.prod(list(mesh.shape.values())))
            if num_lanes % n_dev != 0:
                raise ValueError(
                    f"num_lanes={num_lanes} must be a multiple of the "
                    f"mesh size {n_dev} to shard the lane axis evenly"
                )

            def shard(x):
                spec = P(axis_name, *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))

            carries = jax.tree_util.tree_map(shard, carries)
            self._sharding = shard
        self.carries = carries

    def feed(self, sequences) -> np.ndarray:
        """sequences: length-B list of lists of [N,3] scans (sequences
        may have different lengths — shorter lanes pad with empty
        no-op frames). Returns [B, F_max, 4, 4] poses; a padded tail
        repeats the lane's last real pose."""
        p = self.params
        if len(sequences) != self.num_lanes:
            raise ValueError(
                f"expected {self.num_lanes} sequences, got {len(sequences)}"
            )
        f_max = max(len(s) for s in sequences)
        lanes = [
            stack_frames(seq, f_max, p.max_scan_points, p.dtype)
            for seq in sequences
        ]
        frames = np.stack([f for f, _ in lanes])
        counts = np.stack([c for _, c in lanes])
        if self._sharding is not None:
            # device_put shards the HOST array directly — never commit
            # the full [B,F,N,4] block to one device first (at fleet
            # scale that would OOM device 0 and double-transfer).
            frames = self._sharding(frames)
            counts = self._sharding(counts)
        else:
            frames = jnp.asarray(frames)
            counts = jnp.asarray(counts)
        self.carries, poses = odometry_scan_batch(
            self.carries, frames, counts,
            downsampling_resolution=p.downsampling_resolution,
            max_correspondence_distance=p.max_correspondence_distance,
            max_downsampled=p.max_downsampled,
            num_neighbors=p.num_neighbors,
            covariance_mode=self.covariance_mode,
            predict_motion=p.predict_motion,
            registration_type=self.registration_type,
            model_nn=_model_nn_for(self.engine),
            model_rtype=_model_rtype_for(self.engine),
        )
        return np.asarray(poses)
