"""High-level one-call API, mirroring the reference's compiled helper
(src/small_gicp/registration/registration_helper.cpp:22-137) and its
Python binding surface (src/python/align.cpp:95-106): raw numpy/jax
points in, RegistrationResult out.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.ops.downsampling import voxelgrid_sampling
from small_gicp_tpu.ops.knn import KdTree
from small_gicp_tpu.ops.normals import estimate_normals_covariances
from small_gicp_tpu.models.registration import Registration, RegistrationResult
from small_gicp_tpu.models.voxelmap import GaussianVoxelMap

_M_PI = 3.141592653589793


@dataclass
class RegistrationSetting:
    """Mirror of the reference RegistrationSetting
    (registration_helper.hpp:37-49), defaults identical."""

    type: str = "gicp"  # "icp" | "plane_icp" | "gicp" | "vgicp"
    voxel_resolution: float = 1.0
    downsampling_resolution: float = 0.25
    max_correspondence_distance: float = 1.0
    rotation_eps: float = 0.1 * _M_PI / 180.0
    translation_eps: float = 1e-3
    num_threads: int = 4  # accepted for parity; XLA decides parallelism
    max_iterations: int = 20
    verbose: bool = False


def preprocess_points(
    points,
    downsampling_resolution: float = 0.25,
    num_neighbors: int = 10,
    num_threads: int = 4,
    max_points: Optional[int] = None,
) -> Tuple[PointCloud, KdTree]:
    """Downsample → build searcher → estimate normals+covariances.

    Reference: registration_helper.cpp:22-47 (same defaults; the
    num_threads switch between serial/OMP collapses into one
    deterministic XLA program here).
    """
    if isinstance(points, PointCloud):
        cloud = points
    else:
        cloud = PointCloud.from_points(np.asarray(points))
    down = voxelgrid_sampling(cloud, downsampling_resolution, max_points=max_points)
    tree = KdTree.build(down)
    down = estimate_normals_covariances(down, tree, num_neighbors=num_neighbors)
    return down, tree


def create_gaussian_voxelmap(
    cloud: PointCloud, voxel_resolution: float = 1.0
) -> GaussianVoxelMap:
    """Reference: registration_helper.cpp:50-54."""
    return GaussianVoxelMap.build(cloud, voxel_resolution)


def align(
    target,
    source,
    target_tree: Optional[KdTree] = None,
    init_T_target_source=None,
    registration_type: str = "gicp",
    voxel_resolution: float = 1.0,
    downsampling_resolution: float = 0.25,
    max_correspondence_distance: float = 1.0,
    num_threads: int = 4,
    max_iterations: int = 20,
    rotation_eps: float = 0.1 * _M_PI / 180.0,
    translation_eps: float = 1e-3,
    verbose: bool = False,
    max_points: Optional[int] = None,
    rotation_epsilon: Optional[float] = None,
    translation_epsilon: Optional[float] = None,
) -> RegistrationResult:
    """One-shot align, covering all three reference overloads
    (registration_helper.cpp:57-137; Python surface align.cpp:95-106):

      * raw [N,3]/[N,4] arrays → full preprocessing → align
      * preprocessed PointClouds (+ optional KdTree) → align
      * GaussianVoxelMap target + PointCloud source → VGICP align

    rotation_epsilon/translation_epsilon are the reference bindings'
    spellings (align.cpp:104-105) and take precedence over the short
    rotation_eps/translation_eps forms when given.
    """
    if rotation_epsilon is not None:
        rotation_eps = rotation_epsilon
    if translation_epsilon is not None:
        translation_eps = translation_epsilon
    registration_type = registration_type.lower()
    if registration_type not in ("icp", "plane_icp", "gicp", "vgicp"):
        raise ValueError(f"unknown registration type {registration_type!r}")

    if isinstance(target, GaussianVoxelMap):
        # VGICP path: the voxelmap is both target model and searcher
        # (registration_helper.cpp:136). NOTE: the reference does not set
        # the rejector's max_dist_sq here — it stays at the default 1.0
        # (rejector.hpp:19-28) — reproduced faithfully, but unlike the
        # reference we at least SAY so when a non-default value is dropped.
        if max_correspondence_distance != 1.0:
            import warnings

            warnings.warn(
                "align(): max_correspondence_distance is ignored on the "
                "VGICP/voxelmap path (the reference keeps the rejector at "
                "its default 1.0 m — registration_helper.cpp:125-137); use "
                "Registration(registration_type='vgicp', "
                "max_correspondence_distance=...) for a custom rejector.",
                stacklevel=2,
            )
        reg = Registration(
            registration_type="vgicp",
            max_iterations=max_iterations,
            rotation_eps=rotation_eps,
            translation_eps=translation_eps,
            max_correspondence_distance=1.0,
            verbose=verbose,
        )
        return reg.align(target, _as_cloud(source), None, init_T_target_source)

    target_cloud = _as_cloud_or_none(target)
    source_cloud = _as_cloud_or_none(source)

    if target_cloud is None or source_cloud is None or not _is_preprocessed(
        target_cloud, source_cloud, registration_type
    ):
        # Raw-points path (registration_helper.cpp:57-69): preprocess both
        # with k=10 neighbors, then dispatch.
        target_cloud, target_tree = preprocess_points(
            target, downsampling_resolution, num_neighbors=10,
            num_threads=num_threads, max_points=max_points,
        )
        source_cloud, _ = preprocess_points(
            source, downsampling_resolution, num_neighbors=10,
            num_threads=num_threads, max_points=max_points,
        )
        # fall through to the common vgicp/point dispatch below

    if registration_type == "vgicp":
        voxelmap = create_gaussian_voxelmap(target_cloud, voxel_resolution)
        return align(
            voxelmap,
            source_cloud,
            init_T_target_source=init_T_target_source,
            registration_type="vgicp",
            max_iterations=max_iterations,
            rotation_eps=rotation_eps,
            translation_eps=translation_eps,
            verbose=verbose,
            # forwarded ONLY so the voxelmap branch can warn that it is
            # dropped (reference semantics keep the rejector at 1.0 m).
            max_correspondence_distance=max_correspondence_distance,
        )

    reg = Registration(
        registration_type=registration_type,
        max_correspondence_distance=max_correspondence_distance,
        rotation_eps=rotation_eps,
        translation_eps=translation_eps,
        max_iterations=max_iterations,
        verbose=verbose,
    )
    if target_tree is None:
        target_tree = KdTree.build(target_cloud)
    return reg.align(target_cloud, source_cloud, target_tree, init_T_target_source)


def _as_cloud(x) -> PointCloud:
    if isinstance(x, PointCloud):
        return x
    return PointCloud.from_points(np.asarray(x))


def _as_cloud_or_none(x) -> Optional[PointCloud]:
    return x if isinstance(x, PointCloud) else None


def _is_preprocessed(target: PointCloud, source: PointCloud, rtype: str) -> bool:
    if rtype == "icp":
        return True
    if rtype == "plane_icp":
        return target.normals is not None
    # gicp / vgicp need covariances.
    return target.covs is not None and source.covs is not None
