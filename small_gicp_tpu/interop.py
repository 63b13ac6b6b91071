"""Interop layer: stateful drop-in registration class + array conversion.

The reference ships a PCL drop-in (`RegistrationPCL`,
pcl/pcl_registration.hpp:15-112) and ROS PointCloud2 converters
(ros/ros_impl.hpp:45-171). The TPU framework's interop targets are the
array ecosystems a JAX user actually meets — numpy, torch, and
PointCloud2-like structured buffers — plus a stateful `RegistrationTPU`
class with the exact RegistrationPCL workflow: set inputs, lazily build
trees/covariances/voxelmaps, align with a guess, reuse augmented data
across calls, swapSourceAndTarget, getFinalHessian.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.ops.knn import KdTree
from small_gicp_tpu.ops.normals import estimate_covariances
from small_gicp_tpu.models.registration import Registration, RegistrationResult
from small_gicp_tpu.models.voxelmap import GaussianVoxelMap


class RegistrationTPU:
    """Stateful GICP/VGICP registration, mirroring RegistrationPCL
    (pcl/pcl_registration.hpp:15-112; impl pcl_registration_impl.hpp:202-246).

    Augmented data (trees, covariances, voxelmaps) are computed lazily at
    align() and cached per input cloud, so repeated alignments and
    source/target swaps don't recompute them — the same reuse contract as
    the PCL class.
    """

    def __init__(self):
        self._num_threads = 4  # parity only
        self._k_correspondences = 20  # pcl_registration.hpp ctor default
        self._rotation_epsilon = 2e-3
        self._transformation_epsilon = 5e-4
        self._voxel_resolution = 1.0
        self._max_correspondence_distance = 1.0
        self._registration_type = "GICP"
        self._max_iterations = 64
        self._verbose = False

        self._source: Optional[PointCloud] = None
        self._target: Optional[PointCloud] = None
        self._source_tree: Optional[KdTree] = None
        self._target_tree: Optional[KdTree] = None
        self._source_voxelmap: Optional[GaussianVoxelMap] = None
        self._target_voxelmap: Optional[GaussianVoxelMap] = None
        self._result: Optional[RegistrationResult] = None

    # -- setters (RegistrationPCL names, snake_case also accepted) -----
    def setNumThreads(self, n: int):
        self._num_threads = n

    def setCorrespondenceRandomness(self, k: int):
        self.setNumNeighborsForCovariance(k)

    def setNumNeighborsForCovariance(self, k: int):
        self._k_correspondences = k

    def setVoxelResolution(self, r: float):
        self._voxel_resolution = r

    def setRotationEpsilon(self, eps: float):
        self._rotation_epsilon = eps

    def setTransformationEpsilon(self, eps: float):
        self._transformation_epsilon = eps

    def setMaximumIterations(self, n: int):
        self._max_iterations = n

    def setMaxCorrespondenceDistance(self, d: float):
        self._max_correspondence_distance = d

    def setRegistrationType(self, t: str):
        if t.upper() not in ("GICP", "VGICP"):
            raise ValueError("registration type must be 'GICP' or 'VGICP'")
        self._registration_type = t.upper()

    def setVerbosity(self, v: bool):
        self._verbose = v

    # -- inputs ---------------------------------------------------------
    def setInputSource(self, cloud):
        self._source = as_point_cloud(cloud)
        self._source_tree = None
        self._source_voxelmap = None

    def setInputTarget(self, cloud):
        self._target = as_point_cloud(cloud)
        self._target_tree = None
        self._target_voxelmap = None

    def setSourceCovariances(self, covs):
        self._source = self._source.replace(covs=_as_covs(covs, self._source))

    def setTargetCovariances(self, covs):
        self._target = self._target.replace(covs=_as_covs(covs, self._target))

    def getSourceCovariances(self) -> np.ndarray:
        return self._source.covs_numpy()

    def getTargetCovariances(self) -> np.ndarray:
        return self._target.covs_numpy()

    def swapSourceAndTarget(self):
        """Swap clouds AND their augmented data (pcl_registration_impl.hpp
        swapSourceAndTarget)."""
        self._source, self._target = self._target, self._source
        self._source_tree, self._target_tree = self._target_tree, self._source_tree
        self._source_voxelmap, self._target_voxelmap = (
            self._target_voxelmap,
            self._source_voxelmap,
        )

    def clearSource(self):
        self._source = None
        self._source_tree = None
        self._source_voxelmap = None

    def clearTarget(self):
        self._target = None
        self._target_tree = None
        self._target_voxelmap = None

    # -- results ---------------------------------------------------------
    def getFinalHessian(self) -> np.ndarray:
        return np.asarray(self._result.H)

    def getRegistrationResult(self) -> RegistrationResult:
        return self._result

    def hasConverged(self) -> bool:
        return bool(self._result.converged)

    def getFinalTransformation(self) -> np.ndarray:
        return np.asarray(self._result.T_target_source)

    # -- align -----------------------------------------------------------
    def _ensure_covs(self, which: str):
        cloud = getattr(self, f"_{which}")
        if cloud is None:
            raise RuntimeError(f"input {which} not set")
        if cloud.covs is None:
            # Lazy covariance estimation (pcl_registration_impl.hpp:210-215).
            cloud = estimate_covariances(
                cloud, num_neighbors=self._k_correspondences
            )
            setattr(self, f"_{which}", cloud)

    def align(self, guess=None) -> np.ndarray:
        """Run registration; returns the aligned 4x4 transform
        (target <- source), like RegistrationPCL::align + getFinalTransformation."""
        self._ensure_covs("source")
        self._ensure_covs("target")
        if guess is None:
            guess = jnp.eye(4, dtype=self._source.dtype)

        if self._registration_type == "GICP":
            if self._target_tree is None:
                self._target_tree = KdTree.build(self._target)
            reg = Registration(
                registration_type="gicp",
                max_iterations=self._max_iterations,
                rotation_eps=self._rotation_epsilon,
                translation_eps=self._transformation_epsilon,
                max_correspondence_distance=self._max_correspondence_distance,
            )
            self._result = reg.align(
                self._target, self._source, self._target_tree,
                jnp.asarray(guess, self._source.dtype),
            )
        else:  # VGICP
            if self._target_voxelmap is None:
                self._target_voxelmap = GaussianVoxelMap.build(
                    self._target, self._voxel_resolution
                )
            reg = Registration(
                registration_type="vgicp",
                max_iterations=self._max_iterations,
                rotation_eps=self._rotation_epsilon,
                translation_eps=self._transformation_epsilon,
            )
            self._result = reg.align(
                self._target_voxelmap, self._source, None,
                jnp.asarray(guess, self._source.dtype),
            )
        return self.getFinalTransformation()


# ----------------------------------------------------------------------
# Array conversion (ROS PointCloud2 / torch / numpy structured buffers)
# ----------------------------------------------------------------------


def as_point_cloud(obj, capacity: Optional[int] = None) -> PointCloud:
    """Coerce numpy/jax arrays, torch tensors, or structured xyz records
    into a PointCloud."""
    if isinstance(obj, PointCloud):
        return obj
    if hasattr(obj, "detach"):  # torch tensor without importing torch
        obj = obj.detach().cpu().numpy()
    arr = np.asarray(obj)
    if arr.dtype.names:  # structured array (incl. PCL binary layouts)
        from small_gicp_tpu.pcl_interop import from_pcl

        return from_pcl(arr, capacity=capacity)
    return PointCloud.from_points(arr, capacity=capacity)


def from_pointcloud2(fields: dict, data: bytes, point_step: int,
                     capacity: Optional[int] = None) -> PointCloud:
    """Parse a ROS PointCloud2-like buffer: `fields` maps name -> byte
    offset (x/y/z float32 required), `data` is the packed buffer
    (reference: ros/ros_impl.hpp:45-120, incl. NaN skipping)."""
    n = len(data) // point_step
    raw = np.frombuffer(data, dtype=np.uint8).reshape(n, point_step)
    xyz = np.empty((n, 3), np.float32)
    for i, name in enumerate(("x", "y", "z")):
        off = fields[name]
        xyz[:, i] = raw[:, off:off + 4].copy().view(np.float32)[:, 0]
    xyz = xyz[np.isfinite(xyz).all(axis=1)]
    return PointCloud.from_points(xyz, capacity=capacity)


def to_pointcloud2(cloud: PointCloud) -> dict:
    """PointCloud -> PointCloud2-like dict (fields/point_step/data),
    inverse of from_pointcloud2 (reference: ros/ros_impl.hpp:123-171)."""
    xyz = cloud.points_numpy()[:, :3].astype(np.float32)
    return {
        "fields": {"x": 0, "y": 4, "z": 8},
        "point_step": 12,
        "width": xyz.shape[0],
        "data": xyz.tobytes(),
    }


def from_ros_msg(msg, capacity: Optional[int] = None) -> PointCloud:
    """sensor_msgs/PointCloud2 message instance → PointCloud.

    Duck-typed over the attributes ROS1 and ROS2 share (`fields` with
    name/offset entries, `data`, `point_step`), so the SAME function
    accepts either generation's message class — the capability of the
    reference's ros1.hpp/ros2.hpp pair (ros/ros_impl.hpp:45-120) without
    importing any ROS distribution. NaN points are skipped, like the
    reference.
    """
    offsets = {f.name: f.offset for f in msg.fields}
    for req in ("x", "y", "z"):
        if req not in offsets:
            raise ValueError(
                f"PointCloud2 message lacks field {req!r}; "
                f"have {sorted(offsets)}"
            )
    return from_pointcloud2(
        offsets, bytes(msg.data), int(msg.point_step), capacity=capacity
    )


def to_ros_msg(cloud: PointCloud, msg=None, frame_id: str = "map"):
    """PointCloud → sensor_msgs/PointCloud2 (reference:
    ros/ros_impl.hpp:123-171; xyz always, normals when present).

    Pass a freshly constructed ROS1 or ROS2 PointCloud2 instance as
    `msg` to fill it in place (the PointField class is resolved from the
    message's own module, so both generations work); with msg=None a
    duck-typed SimpleNamespace with the same attribute layout is
    returned — enough for from_ros_msg round-trips and for tests
    without a ROS installation.
    """
    import types

    xyz = cloud.points_numpy()[:, :3].astype(np.float32)
    names = ["x", "y", "z"]
    cols = [xyz]
    if cloud.normals is not None:
        nrm = np.asarray(cloud.normals)[: len(cloud), :3].astype(np.float32)
        names += ["normal_x", "normal_y", "normal_z"]
        cols.append(nrm)
    packed = np.concatenate(cols, axis=1)
    point_step = 4 * packed.shape[1]

    field_cls = None
    if msg is not None:
        import sys as _sys

        mod = _sys.modules.get(type(msg).__module__)
        pkg = getattr(mod, "__package__", None) or ""
        try:  # sensor_msgs.msg.PointField lives next to PointCloud2
            import importlib

            field_cls = getattr(importlib.import_module(pkg), "PointField")
        except Exception:
            field_cls = None

    def make_field(name, offset):
        if field_cls is not None:
            f = field_cls()
            f.name, f.offset, f.datatype, f.count = name, offset, 7, 1
            return f
        return types.SimpleNamespace(
            name=name, offset=offset, datatype=7, count=1  # FLOAT32
        )

    out = msg if msg is not None else types.SimpleNamespace()
    out.height = 1
    out.width = packed.shape[0]
    out.fields = [make_field(n, 4 * i) for i, n in enumerate(names)]
    out.is_bigendian = False
    out.point_step = point_step
    out.row_step = point_step * packed.shape[0]
    out.data = packed.tobytes()
    out.is_dense = True
    if hasattr(out, "header") and hasattr(out.header, "frame_id"):
        out.header.frame_id = frame_id
    elif msg is None:
        out.header = types.SimpleNamespace(frame_id=frame_id)
    return out


def to_torch(cloud: PointCloud):
    """PointCloud xyz -> torch tensor (cpu)."""
    import torch

    return torch.from_numpy(cloud.points_numpy()[:, :3].copy())


def _as_covs(covs, cloud: PointCloud) -> jnp.ndarray:
    covs = np.asarray(covs)
    if covs.ndim == 3 and covs.shape[1:] == (4, 4):
        covs = covs[:, :3, :3]  # the reference stores 4x4-padded covs
    if covs.shape != (len(cloud), 3, 3):
        raise ValueError(f"expected [{len(cloud)},3,3] covs, got {covs.shape}")
    out = np.zeros((cloud.capacity, 3, 3), np.asarray(cloud.points).dtype)
    out[: len(cloud)] = covs
    return jnp.asarray(out)
