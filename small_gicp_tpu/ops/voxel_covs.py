"""Fused voxelgrid downsampling + neighborhood-moment covariances.

TPU-native alternative to the reference's preprocess pipeline
(downsample, then kNN + eigendecomposition per point,
registration_helper.cpp:22-47): the voxelgrid sort already produces
per-voxel statistics, so the local surface covariance of each output
point can be assembled from the RAW first/second moments of its
27-voxel neighborhood — one sorted-key lookup per neighbor instead of a
kNN over the downsampled cloud. This is the same neighborhood-moment
idea VGICP uses for its voxel distributions (and what the reference's
GaussianVoxel accumulates, ann/gaussian_voxelmap.hpp:32-53), applied at
preprocessing time.

Compared to kNN-20 covariances the neighbor SET differs (fixed-radius
neighborhood vs k nearest), but GICP's plane regularization keeps only
the eigenvector frame (normal_estimation.hpp:40-45), which both
estimators recover on locally planar geometry — registration accuracy
bounds hold identically in the test suite. FLOP count is ~10x lower
than kNN covariances (no [Q, M] top-k), but the 27 stat lookups are
random gathers, which current TPUs serve at ~per-row cost — so on TPU
the kNN path is faster in practice and remains the default; this
estimator is the better fit for gather-friendly backends and for very
large raw scans (its cost scales with voxels, not points^2).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from small_gicp_tpu.point_cloud import PAD_SENTINEL, PointCloud
from small_gicp_tpu.ops.voxel_keys import (
    INVALID_KEY,
    neighbor_offsets,
    pack_coords,
    segment_ids,
    unpack_key,
    voxel_coords,
    voxel_keys,
)
from small_gicp_tpu.ops.eigh3 import smallest_eigvec3x3

_MIN_NEIGHBOR_POINTS = 5  # same invalid threshold as normal_estimation.hpp:71


@partial(jax.jit, static_argnames=("max_points",))
def voxelgrid_sampling_with_covs_impl(
    points: jax.Array,  # [N,4]
    num_points: jax.Array,
    leaf_size: jax.Array,
    max_points: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (out_points [max_points,4], out_n, covs [max_points,3,3],
    normals [max_points,4])."""
    n = points.shape[0]
    dtype = points.dtype
    _HI = jax.lax.Precision.HIGHEST

    inv_leaf = (jnp.asarray(1.0, dtype) / leaf_size).astype(dtype)
    vcoords = voxel_coords(points[:, :3], inv_leaf)  # [n,3] int32
    keys = pack_coords(vcoords)
    keys = jnp.where(jnp.arange(n) < num_points, keys, INVALID_KEY)

    order = jnp.argsort(keys)
    keys_s = keys[order]
    pts_s = points[order]
    # Center each point on its OWN voxel corner before accumulating
    # moments: raw p·pᵀ second moments are ~range² while the voxel-local
    # covariance is ~leaf², so the uncentered E[ppᵀ]−μμᵀ form loses all
    # signal to f32 cancellation beyond ~100 m range. The centered
    # moments are shifted to the query voxel's corner at combine time
    # via the parallel-axis identity with EXACT integer-offset deltas.
    corner_s = vcoords[order].astype(dtype) * jnp.asarray(leaf_size, dtype)
    rel_s = pts_s[:, :3] - corner_s  # [n,3], O(leaf)

    valid, _, seg, num_voxels = segment_ids(keys_s)

    # Per-voxel centered moments: count, Σr, Σrrᵀ (r = p − voxel corner).
    w = valid.astype(dtype)
    rel_w = rel_s * w[:, None]
    sums3 = jax.ops.segment_sum(rel_w, seg, num_segments=n)  # [n,3]
    counts_v = jax.ops.segment_sum(w, seg, num_segments=n)  # [n]
    outer = jax.ops.segment_sum(
        jnp.einsum("ni,nj->nij", rel_s, rel_w, precision=_HI),
        seg,
        num_segments=n,
    )  # [n,3,3]
    vox_keys = jax.ops.segment_max(
        jnp.where(valid, keys_s, jnp.int64(-1)), seg, num_segments=n
    )
    vox_keys = jnp.where(jnp.arange(n) < num_voxels, vox_keys, INVALID_KEY)

    # Output points: voxel means = corner + centered mean.
    vox_corner = unpack_key(vox_keys).astype(dtype) * jnp.asarray(
        leaf_size, dtype
    )  # [n,3]
    safe_cv = jnp.maximum(counts_v, 1.0)
    means3 = vox_corner + sums3 / safe_cv[:, None]
    means = jnp.concatenate([means3, jnp.ones((n, 1), dtype)], axis=1)

    m = max_points
    if m > n:
        means = jnp.concatenate([means, jnp.zeros((m - n, 4), dtype)], axis=0)
        vox_keys_out = jnp.concatenate(
            [vox_keys, jnp.full((m - n,), INVALID_KEY, jnp.int64)]
        )
    else:
        vox_keys_out = vox_keys
    row = jnp.arange(m)
    out_valid = row < jnp.minimum(num_voxels, m)
    pad = jnp.asarray([PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], dtype)
    out_points = jnp.where(out_valid[:, None], means[:m], pad)
    out_keys = vox_keys_out[:m]

    # 27-neighborhood moment accumulation per output voxel, combining the
    # per-voxel centered moments with the parallel-axis shift:
    #   Σ_k (p−c₀)    = Σ_k r + n_k·δ_k
    #   Σ_k (p−c₀)⊗(p−c₀) = Σ rrᵀ + δ_k⊗Σr + Σr⊗δ_k + n_k·δ_k⊗δ_k
    # with δ_k = (corner_k − corner₀) = offset_k·leaf (exact).
    coords = unpack_key(out_keys)  # [m,3]
    offs = neighbor_offsets(27)  # [27,3]
    cand = pack_coords(coords[:, None, :] + offs[None, :, :])  # [m,27]
    pos = jnp.clip(
        jnp.searchsorted(vox_keys, cand.reshape(-1), method="sort").reshape(
            m, 27
        ), 0, n - 1
    )
    hit = (vox_keys[pos] == cand) & (cand != INVALID_KEY) & out_valid[:, None]
    hw = hit.astype(dtype)

    delta = offs.astype(dtype) * jnp.asarray(leaf_size, dtype)  # [27,3]
    s_k = sums3[pos]  # [m,27,3]
    n_k = counts_v[pos]  # [m,27]
    o_k = outer[pos]  # [m,27,3,3]

    hn = hw * n_k  # [m,27]
    nb_count = jnp.sum(hn, axis=1)
    nb_sums = (
        jnp.einsum("mk,mki->mi", hw, s_k, precision=_HI)
        + jnp.einsum("mk,ki->mi", hn, delta, precision=_HI)
    )  # [m,3]
    cross = jnp.einsum("mk,ki,mkj->mij", hw, delta, s_k, precision=_HI)
    nb_outer = (
        jnp.einsum("mk,mkij->mij", hw, o_k, precision=_HI)
        + cross
        + jnp.swapaxes(cross, -1, -2)
        + jnp.einsum("mk,ki,kj->mij", hn, delta, delta, precision=_HI)
    )  # [m,3,3]
    safe = jnp.maximum(nb_count, 1.0)
    mu = nb_sums / safe[:, None]
    cov = nb_outer / safe[:, None, None] - mu[:, :, None] * mu[:, None, :]

    v0 = smallest_eigvec3x3(cov)
    enough = (nb_count >= _MIN_NEIGHBOR_POINTS) & out_valid

    # GICP plane regularization (normal_estimation.hpp:40-45):
    # V·diag(1e-3,1,1)·Vᵀ ≡ I − (1−1e-3)·v₀v₀ᵀ, so only the smallest
    # eigenvector is needed (see ops/eigh3.py:smallest_eigvec3x3).
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m, 3, 3))
    reg = eye - (1.0 - 1e-3) * v0[:, :, None] * v0[:, None, :]
    out_covs = jnp.where(enough[:, None, None], reg, eye)

    # Normals: smallest-eigvec, flipped toward the origin
    # (normal_estimation.hpp:18-25).
    normal = v0
    flip = jnp.sum(out_points[:, :3] * normal, axis=-1) > 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    normal = jnp.where(enough[:, None], normal, 0.0)
    out_normals = jnp.concatenate([normal, jnp.zeros((m, 1), dtype)], axis=-1)

    return out_points, jnp.minimum(num_voxels, m), out_covs, out_normals


def voxelgrid_sampling_with_covs(
    cloud: PointCloud,
    leaf_size: float,
    max_points: int,
    need_normals: bool = False,
) -> PointCloud:
    """Downsample + estimate covariances (and optionally normals) in one
    fused pass over the raw cloud's voxel statistics."""
    pts, n, covs, normals = voxelgrid_sampling_with_covs_impl(
        cloud.points,
        cloud.num_points,
        jnp.asarray(leaf_size, cloud.dtype),
        max_points,
    )
    return PointCloud(
        points=pts,
        num_points=n,
        covs=covs,
        normals=normals if need_normals else None,
    )
