"""Normal / covariance estimation from k nearest neighbors.

Fully-batched equivalent of the reference's estimate_normals /
estimate_covariances / estimate_normals_covariances family
(include/small_gicp/util/normal_estimation.hpp:65-173 and the OMP/TBB
variants): one batched kNN over the whole cloud, a masked moment
accumulation, and one batched 3x3 eigendecomposition replace the
per-point serial/OMP loops.

Semantics preserved exactly:
  * neighbor count < 5 → invalid: normal = 0, cov = identity
    (normal_estimation.hpp:71-75 + setters :15,:33-37)
  * cov of neighbors = E[ppᵀ] − mean·meanᵀ, biased 1/n (:85-86)
  * normal = smallest-eigenvalue eigenvector, sign-flipped so that
    normal·point < 0 (toward viewpoint origin, :18-25)
  * cov (GICP plane regularization) = V·diag(1e-3, 1, 1)·Vᵀ (:40-45)
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.ops.knn import KdTree, brute_force_knn
from small_gicp_tpu.ops.eigh3 import smallest_eigvec3x3

# Squared distances above this are hits on sentinel padding rows, i.e. the
# neighbor does not exist (cloud smaller than k).
_VALID_NEIGHBOR_SQ_DIST = 1e16
_MIN_NEIGHBORS = 5


@partial(
    jax.jit,
    static_argnames=(
        "num_neighbors", "need_normals", "need_covs", "neighbor_mode",
    ),
)
def _estimate_impl(
    points: jax.Array,
    num_points: jax.Array,
    num_neighbors: int,
    need_normals: bool,
    need_covs: bool,
    neighbor_mode: str = "exact",
    window_cell: float = 0.25,
):
    n = points.shape[0]
    dtype = points.dtype
    xyz = points[:, :3]

    if neighbor_mode == "exact" and (
        dtype == jnp.float32
        and jax.default_backend() == "tpu"
        and num_neighbors <= 64
        and n <= 1_048_576
    ):
        # Same exact-kNN semantics, measured faster on chip (13.0 vs
        # 13.7 ms at 16k/k=20, 2026-08-20): the transposed-layout
        # moments kernel carries the winners' query-centered offsets,
        # so the [N,k] neighbor gather is never paid. Above 256k rows
        # the kernel raises the Mosaic scoped-VMEM limit (round 5) —
        # fused covariance stays active to ~1M rows.
        neighbor_mode = "fused"
    if neighbor_mode == "fused":
        # One fused kernel for the whole self-kNN + moment stage: the
        # list-driven kernel scans only target tiles within each
        # block's Morton-window kth-distance bound and accumulates
        # query-centered moments in-kernel (ops/cov_fused_pallas.py).
        if not (dtype == jnp.float32 and num_neighbors <= 64):
            raise ValueError(
                "neighbor_mode='fused' needs f32 points and k<=64"
            )
        from small_gicp_tpu.ops.cov_fused_pallas import knn_moments_pallas

        m1, m2, counts = knn_moments_pallas(
            points, num_points, num_neighbors,
            interpret=jax.default_backend() != "tpu",
        )
        m1 = m1.astype(dtype)
        m2 = m2.astype(dtype)
        counts = counts.astype(dtype)
        safe_counts = jnp.maximum(counts, 1.0)
        mean = m1 / safe_counts[:, None]
        cov = (
            m2 / safe_counts[:, None, None]
            - mean[:, :, None] * mean[:, None, :]
        )
    else:
        if neighbor_mode == "window":
            # O(N·W) Morton-banded self-search (ops/knn_window.py) — the
            # odometry fast path; recall/covariance quality bounded in
            # tests/test_knn_window.py.
            from small_gicp_tpu.ops.knn_window import knn_windowed

            sq_dists, idx = knn_windowed(
                points, num_points, num_neighbors, cell=window_cell
            )
        elif neighbor_mode != "exact":
            raise ValueError(
                f"unknown neighbor_mode {neighbor_mode!r}; "
                "have 'exact', 'window', 'fused'"
            )
        else:
            # Route through the KdTree dispatcher so the Pallas-vs-XLA
            # choice lives in exactly one place (ops/knn.py).
            sq_dists, idx = KdTree(
                points=points, num_points=num_points
            ).knn_search(xyz, num_neighbors)
        neighbor_valid = sq_dists < _VALID_NEIGHBOR_SQ_DIST  # [N,k]
        w = neighbor_valid.astype(dtype)
        counts = jnp.sum(w, axis=-1)  # [N]

        # Center neighbors on the query point before accumulating
        # moments: the covariance is translation-invariant, and centering
        # avoids the f32 cancellation in E[ppᵀ] − μμᵀ that the reference
        # never sees because it accumulates in f64
        # (normal_estimation.hpp:77-86).
        neigh = xyz[idx] - xyz[:, None, :]  # [N,k,3]
        neigh = jnp.where(neighbor_valid[..., None], neigh, 0.0)
        safe_counts = jnp.maximum(counts, 1.0)
        mean = jnp.sum(neigh, axis=1) / safe_counts[:, None]  # [N,3]
        sum_cross = jnp.einsum("nkd,nke->nde", neigh, neigh,
                              precision=jax.lax.Precision.HIGHEST)  # [N,3,3]
        cov = (
            sum_cross / safe_counts[:, None, None]
            - mean[:, :, None] * mean[:, None, :]
        )

    # Only the smallest eigenvector is ever needed: the normal IS that
    # vector, and the plane regularization V·diag(1e-3,1,1)·Vᵀ equals
    # I − (1−1e-3)·v₀v₀ᵀ (the two unit eigenvalues make the complement
    # subspace isotropic). Closed-form solver = one fused kernel instead
    # of 18 Jacobi rotation steps.
    v0 = smallest_eigvec3x3(cov)

    point_valid = (jnp.arange(n) < num_points) & (counts >= _MIN_NEIGHBORS)

    normals = None
    covs = None
    if need_normals:
        flip = jnp.sum(xyz * v0, axis=-1) > 0.0
        normal = jnp.where(flip[:, None], -v0, v0)
        normal = jnp.where(point_valid[:, None], normal, 0.0)
        normals = jnp.concatenate(
            [normal, jnp.zeros((n, 1), dtype)], axis=-1
        )
    if need_covs:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3))
        reg = eye - (1.0 - 1e-3) * v0[:, :, None] * v0[:, None, :]
        covs = jnp.where(point_valid[:, None, None], reg, eye)

    return normals, covs


def estimate_normals_covariances(
    cloud: PointCloud,
    tree: Optional[KdTree] = None,
    num_neighbors: int = 20,
    num_threads: int = 1,
) -> PointCloud:
    """Estimate both normals and GICP-regularized covariances.

    The `tree` argument is accepted for reference API parity
    (normal_estimation.hpp:170-173) but ignored: search is exact brute
    force over the cloud itself either way.
    """
    del num_threads  # parity only
    normals, covs = _estimate_impl(
        cloud.points, cloud.num_points, num_neighbors, True, True
    )
    return cloud.replace(normals=normals, covs=covs)


def estimate_normals(
    cloud: PointCloud,
    tree: Optional[KdTree] = None,
    num_neighbors: int = 20,
    num_threads: int = 1,
) -> PointCloud:
    del num_threads  # parity only
    normals, _ = _estimate_impl(
        cloud.points, cloud.num_points, num_neighbors, True, False
    )
    return cloud.replace(normals=normals)


def estimate_covariances(
    cloud: PointCloud,
    tree: Optional[KdTree] = None,
    num_neighbors: int = 20,
    num_threads: int = 1,
) -> PointCloud:
    del num_threads  # parity only
    _, covs = _estimate_impl(
        cloud.points, cloud.num_points, num_neighbors, False, True
    )
    return cloud.replace(covs=covs)
