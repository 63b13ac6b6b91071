"""Voxelgrid and random downsampling (jit-friendly, deterministic).

TPU-native re-design of the reference's voxelgrid samplers
(include/small_gicp/util/downsampling.hpp:23-78 serial,
downsampling_omp.hpp:26-95, downsampling_tbb.hpp:26-93): the algorithm is
already "compute 63-bit voxel keys → sort → segment mean", which maps 1:1
onto XLA's sort + segment_sum. One implementation replaces all three
reference variants and — unlike the OMP/TBB ones, which are documented as
±10% nondeterministic (downsampling_omp.hpp:17-18) — is exact and
deterministic at any parallelism.

Fixed-shape contract: input capacity N in, output capacity
`max_points` (default N) out, with `num_points` giving the true voxel
count. Output points are sorted by voxel key (Morton-ish spatial order),
which improves locality for the downstream KNN gather.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from small_gicp_tpu.point_cloud import PAD_SENTINEL, PointCloud
from small_gicp_tpu.ops.voxel_keys import INVALID_KEY, sort_segments, voxel_keys


@partial(jax.jit, static_argnames=("max_points",))
def _voxelgrid_sampling_impl(points, num_points, leaf_size, max_points: int):
    n = points.shape[0]
    dtype = points.dtype

    keys = voxel_keys(points[:, :3], leaf_size)
    # Padding rows carry the sentinel coordinate, which is out of the 21-bit
    # range, so they are already INVALID; this guard is belt-and-braces.
    keys = jnp.where(jnp.arange(n) < num_points, keys, INVALID_KEY)

    order, keys_s, valid, seg_id, num_voxels = sort_segments(keys)
    pts_s = points[order]

    # Segment mean. The homogeneous w=1 column sums to the per-voxel count,
    # giving the same "divide the Vector4d sum by count" as the reference
    # (downsampling.hpp:59-75).
    sums = jax.ops.segment_sum(pts_s, seg_id, num_segments=n)
    counts = jnp.maximum(sums[:, 3:4], 1.0)
    means = sums / counts
    means = means.at[:, 3].set(1.0)

    out_n = jnp.minimum(num_voxels, max_points)
    row = jnp.arange(max_points)
    out_valid = row < out_n
    if max_points > n:
        # Output capacity above the input capacity: pad the means table.
        means = jnp.concatenate(
            [means, jnp.zeros((max_points - n, 4), dtype)], axis=0
        )
    out = jnp.where(
        out_valid[:, None],
        means[:max_points],
        jnp.asarray([PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], dtype),
    )
    return out, out_n


def voxelgrid_sampling(
    cloud,
    leaf_size: float,
    max_points: Optional[int] = None,
    num_threads: int = 1,
) -> PointCloud:
    """Exact-mean voxelgrid downsampling.

    Equivalent of the reference `voxelgrid_sampling` family; deterministic
    (matches the *serial* reference semantics, downsampling.hpp:23-78).
    Accepts a PointCloud or a raw [N,3]/[N,4] array, like the reference
    bindings (src/python/preprocess.cpp); num_threads is parity-only.

    Args:
      cloud: input cloud (normals/covs are dropped, as in the reference).
      leaf_size: voxel edge length. Min usable resolution at 1000 m extent
        is ~0.5 mm, set by the 21-bit coordinates (README.md:442).
      max_points: static output capacity; defaults to the input capacity.
        If more voxels exist than capacity, the lowest-key voxels are kept.
    """
    del num_threads  # XLA decides parallelism
    if not isinstance(cloud, PointCloud):
        cloud = PointCloud.from_points(cloud)
    cap = max_points if max_points is not None else cloud.capacity
    pts, n = _voxelgrid_sampling_impl(
        cloud.points, cloud.num_points, jnp.asarray(leaf_size, cloud.dtype), cap
    )
    return PointCloud(points=pts, num_points=n)


@partial(jax.jit, static_argnames=("num_samples",))
def _random_sampling_impl(points, num_points, key, num_samples: int):
    n = points.shape[0]
    dtype = points.dtype
    # Random scores; padding gets +inf so it sorts last. Taking the
    # `num_samples` smallest scores = uniform sampling without replacement,
    # same contract as std::sample (downsampling.hpp:85-110).
    scores = jax.random.uniform(key, (n,))
    scores = jnp.where(jnp.arange(n) < num_points, scores, jnp.inf)
    idx = jnp.argsort(scores)[:num_samples]
    out = points[idx]
    out_n = jnp.minimum(jnp.asarray(num_samples, jnp.int32), num_points)
    row_valid = jnp.arange(num_samples) < out_n
    pad = jnp.asarray([PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], dtype)
    out = jnp.where(row_valid[:, None], out, pad)
    return out, out_n


def random_sampling(cloud: PointCloud, num_samples: int, key: jax.Array) -> PointCloud:
    """Uniform random subsampling without replacement.

    Reference: util/downsampling.hpp:85-110 (std::sample with user RNG);
    here the RNG is a jax PRNG key.
    """
    pts, n = _random_sampling_impl(cloud.points, cloud.num_points, key, num_samples)
    return PointCloud(points=pts, num_points=n)
