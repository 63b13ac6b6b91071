"""small_gicp_tpu — a TPU-native point-cloud registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
koide3/small_gicp (reference: /root/reference): voxelgrid downsampling,
batched nearest-neighbor search, normal/covariance estimation, and
ICP / point-to-plane ICP / GICP / VGICP registration driven by
Gauss-Newton / Levenberg-Marquardt optimizers with SE(3) exp-map updates.

Everything is built on fixed-shape batched arrays (padding + masks), jitted
end-to-end, and scales over TPU meshes with jax.sharding collectives.

Public API mirrors the reference's Python binding surface
(reference: src/python/python.cpp:16-27, align.cpp:95-106).
"""

import jax as _jax

# The voxel-key layer packs 3x21-bit coordinates into int64 (same
# encoding as the reference, util/downsampling.hpp:30-49), which
# requires x64 support. All float arrays carry explicit dtypes, so
# enabling x64 here does not change any float math in the library.
_jax.config.update("jax_enable_x64", True)

# TPU matmuls default to ONE bf16 pass (8-bit mantissa). Geometry math
# cannot survive that: R·C·Rᵀ noise (~4e-3 on unit entries) makes the
# plane-regularized GICP covariance sums (min eigenvalue 2e-3) go
# indefinite, their 3x3 inverses explode, and the optimizer's Hessian
# loses the signal that drives the convergence test. Force full-f32
# dot products everywhere; the critical einsums also pass an explicit
# Precision.HIGHEST so library math stays correct even if an embedding
# application later overrides this global.
_jax.config.update("jax_default_matmul_precision", "float32")

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.utils.lie import se3_exp, so3_exp, skew
from small_gicp_tpu.utils.io import read_ply, write_ply, read_kitti_bin
from small_gicp_tpu.ops.downsampling import voxelgrid_sampling, random_sampling
from small_gicp_tpu.ops.knn import KdTree, knn_search, nearest_neighbor_search
from small_gicp_tpu.ops.normals import (
    estimate_normals,
    estimate_covariances,
    estimate_normals_covariances,
)
from small_gicp_tpu.models.registration import (
    RegistrationResult,
    Registration,
    align_points,
)
from small_gicp_tpu.models.factors import (
    ICPFactor,
    PointToPlaneICPFactor,
    GICPFactor,
    DistanceRejector,
)
from small_gicp_tpu.models.voxelmap import (
    GaussianVoxelMap,
    IncrementalVoxelMap,
    IncrementalVoxelMapNormal,
    IncrementalVoxelMapCov,
    IncrementalVoxelMapNormalCov,
)
from small_gicp_tpu.ops.projective_search import ProjectiveSearch
from small_gicp_tpu.interop import (
    RegistrationTPU,
    as_point_cloud,
    from_pointcloud2,
    to_pointcloud2,
    from_ros_msg,
    to_ros_msg,
)
from small_gicp_tpu.pcl_interop import (
    pcl_dtype,
    from_pcl,
    to_pcl,
    PCL_POINT_XYZ,
    PCL_POINT_NORMAL,
    PCL_POINT_COVARIANCE,
    PCL_POINT_NORMAL_COVARIANCE,
)
from small_gicp_tpu.models.helper import (
    RegistrationSetting,
    preprocess_points,
    create_gaussian_voxelmap,
    align,
)

__version__ = "0.1.0"

__all__ = [
    "PointCloud",
    "se3_exp",
    "so3_exp",
    "skew",
    "read_ply",
    "write_ply",
    "read_kitti_bin",
    "voxelgrid_sampling",
    "random_sampling",
    "KdTree",
    "knn_search",
    "nearest_neighbor_search",
    "estimate_normals",
    "estimate_covariances",
    "estimate_normals_covariances",
    "RegistrationResult",
    "ICPFactor",
    "PointToPlaneICPFactor",
    "GICPFactor",
    "DistanceRejector",
    "Registration",
    "align_points",
    "GaussianVoxelMap",
    "IncrementalVoxelMap",
    "IncrementalVoxelMapNormal",
    "IncrementalVoxelMapCov",
    "IncrementalVoxelMapNormalCov",
    "ProjectiveSearch",
    "RegistrationTPU",
    "as_point_cloud",
    "from_pointcloud2",
    "to_pointcloud2",
    "from_ros_msg",
    "to_ros_msg",
    "pcl_dtype",
    "from_pcl",
    "to_pcl",
    "PCL_POINT_XYZ",
    "PCL_POINT_NORMAL",
    "PCL_POINT_COVARIANCE",
    "PCL_POINT_NORMAL_COVARIANCE",
    "RegistrationSetting",
    "preprocess_points",
    "create_gaussian_voxelmap",
    "align",
]
