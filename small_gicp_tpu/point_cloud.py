"""Fixed-capacity point cloud pytree.

TPU-native replacement for the reference's trait-based SoA container
(reference: include/small_gicp/points/point_cloud.hpp:15-94,
points/traits.hpp:11-79). Instead of compile-time traits over arbitrary
containers, every pipeline stage consumes one batched array schema:

  points  [N, 4] homogeneous (x, y, z, 1);   padded rows = (SENTINEL,)*3 + (0,)
  normals [N, 4] (nx, ny, nz, 0)
  covs    [N, 3, 3] (the reference pads to 4x4 for SIMD; the 3x3 block is the
                     only part ever read — see gicp_factor.hpp:59-60)
  num_points: scalar int32 — valid entries are compacted to the front.

Capacity N is static (shape), occupancy is dynamic (num_points). Padded
points carry a huge coordinate sentinel so distance-based ops (KNN, voxel
hashing) exclude them for free with no masking inside hot kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Coordinate assigned to padding rows. Distances to these points are ~1e18,
# which always loses a nearest-neighbor race but stays comfortably inside
# float32 range (3.4e38).
PAD_SENTINEL = 1.0e9


@struct.dataclass
class PointCloud:
    """Fixed-capacity point cloud (pytree).

    Mirrors the reference's ``small_gicp::PointCloud``
    (points/point_cloud.hpp:15-94) with static-capacity arrays.
    """

    points: jax.Array  # [N, 4]
    num_points: jax.Array  # scalar int32
    normals: Optional[jax.Array] = None  # [N, 4]
    covs: Optional[jax.Array] = None  # [N, 3, 3]

    def __repr__(self):
        try:
            return (
                f"PointCloud(num_points={int(self.num_points)}, "
                f"capacity={self.capacity}, "
                f"normals={self.normals is not None}, "
                f"covs={self.covs is not None}, dtype={self.dtype})"
            )
        except Exception:  # abstract tracers inside jit
            return object.__repr__(self)

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    @property
    def dtype(self):
        return self.points.dtype

    def valid_mask(self) -> jax.Array:
        """[N] bool — True for real points, False for padding."""
        return jnp.arange(self.capacity) < self.num_points

    def xyz(self) -> jax.Array:
        """[N, 3] coordinates."""
        return self.points[:, :3]

    @property
    def has_normals(self) -> bool:
        return self.normals is not None

    @property
    def has_covs(self) -> bool:
        return self.covs is not None

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------

    @staticmethod
    def from_points(
        points,
        capacity: Optional[int] = None,
        dtype=None,
    ) -> "PointCloud":
        """Build from an [M, 3] or [M, 4] array (numpy or jax).

        Equivalent of the reference's numpy ctor
        (src/python/pointcloud.cpp semantics: Nx3 or Nx4 accepted).
        """
        points = np.asarray(points) if not isinstance(points, jax.Array) else points
        if points.ndim != 2 or points.shape[1] not in (3, 4):
            raise ValueError(f"points must be [N,3] or [N,4], got {points.shape}")
        m = points.shape[0]
        n = capacity if capacity is not None else m
        if n < m:
            raise ValueError(f"capacity {n} < number of points {m}")
        dt = dtype if dtype is not None else (
            points.dtype if jnp.issubdtype(points.dtype, jnp.floating) else jnp.float32
        )
        xyz = jnp.asarray(points[:, :3], dtype=dt)
        buf = jnp.full((n, 4), PAD_SENTINEL, dtype=dt)
        buf = buf.at[:, 3].set(0.0)
        buf = buf.at[:m, :3].set(xyz)
        buf = buf.at[:m, 3].set(1.0)
        return PointCloud(points=buf, num_points=jnp.asarray(m, dtype=jnp.int32))

    def with_capacity(self, capacity: int) -> "PointCloud":
        """Grow/shrink static capacity (keeps the first `capacity` rows)."""
        n = self.capacity
        if capacity == n:
            return self

        def pad_or_trim(a, fill):
            if a is None:
                return None
            if capacity <= n:
                return a[:capacity]
            pad_shape = (capacity - n,) + a.shape[1:]
            return jnp.concatenate([a, jnp.full(pad_shape, fill, a.dtype)], axis=0)

        pts = pad_or_trim(self.points, PAD_SENTINEL)
        if capacity > n:
            pts = pts.at[n:, 3].set(0.0)
        return PointCloud(
            points=pts,
            num_points=jnp.minimum(self.num_points, capacity).astype(jnp.int32),
            normals=pad_or_trim(self.normals, 0.0),
            covs=pad_or_trim(self.covs, 0.0),
        )

    def astype(self, dtype) -> "PointCloud":
        return PointCloud(
            points=self.points.astype(dtype),
            num_points=self.num_points,
            normals=None if self.normals is None else self.normals.astype(dtype),
            covs=None if self.covs is None else self.covs.astype(dtype),
        )

    # ------------------------------------------------------------------
    # Host-side views (for tests / interop)
    # ------------------------------------------------------------------

    def points_numpy(self) -> np.ndarray:
        """[num_points, 4] valid points as numpy (host transfer)."""
        n = int(self.num_points)
        return np.asarray(self.points[:n])

    def normals_numpy(self) -> np.ndarray:
        n = int(self.num_points)
        return np.asarray(self.normals[:n])

    def covs_numpy(self) -> np.ndarray:
        n = int(self.num_points)
        return np.asarray(self.covs[:n])

    def __len__(self) -> int:
        return int(self.num_points)

    # Bindings-parity accessors (pointcloud.cpp: size/empty and the
    # singular point(i)/normal(i)/cov(i)). Host-side conveniences; bulk
    # device access goes through the .points/.normals/.covs arrays.
    def size(self) -> int:
        return int(self.num_points)

    def empty(self) -> bool:
        return int(self.num_points) == 0

    def _check_index(self, i: int) -> int:
        # Explicit bounds check: jax gathers clamp out-of-range indices
        # silently, and rows in [num_points, capacity) are sentinel
        # padding — both must raise like the reference bindings do.
        n = int(self.num_points)
        i = int(i)
        if not 0 <= i < n:
            raise IndexError(f"index {i} out of range [0, {n})")
        return i

    def point(self, i: int) -> np.ndarray:
        """i-th point as a homogeneous 4-vector (numpy)."""
        return np.asarray(self.points[self._check_index(i)])

    def normal(self, i: int) -> np.ndarray:
        """i-th normal as a 4-vector (numpy)."""
        return np.asarray(self.normals[self._check_index(i)])

    def cov(self, i: int) -> np.ndarray:
        """i-th covariance as 3x3 (numpy; the reference stores 4x4
        zero-padded for SIMD — padding is a CPU artifact, not carried)."""
        return np.asarray(self.covs[self._check_index(i)])


def transform_points(T: jax.Array, points: jax.Array) -> jax.Array:
    """Apply a 4x4 rigid transform to [N,4] homogeneous points.

    Padding rows have w=0, so the translation is not applied and the
    sentinel coordinate survives (stays "far away").
    """
    return jnp.einsum("na,ba->nb", points, T,
                      precision=jax.lax.Precision.HIGHEST)


def transform_covs(T: jax.Array, covs: jax.Array) -> jax.Array:
    """R C Rᵀ for [N,3,3] covariances (reference: gicp_factor.hpp:59)."""
    R = T[:3, :3]
    return jnp.einsum("ij,njk,lk->nil", R, covs, R,
                      precision=jax.lax.Precision.HIGHEST)


def compact_cloud(cloud: "PointCloud", rows: int) -> "PointCloud":
    """⊕ Compact a sentinel-padded cloud's LIVE rows into a smaller
    fixed-capacity cloud (one fused scatter — O(capacity) row traffic).

    Motivation (round-5 device trace): the scan-to-model engines hand
    the fused registration path a slot-table cloud view whose capacity
    is the MAP's payload capacity (e.g. 327k rows at ~10% live), and
    `gicp_prepare` then Morton-sorts and permutes the whole padded
    table every frame. Compacting live rows first shrinks the prepare
    sort, its permutation gathers, and the kernel's VMEM tables by the
    dead-row factor — and below 64k rows the kernel takes its faster
    row-major layout.

    Liveness = homogeneous w > 0.5 (slot-table views set w=0 on
    dead/sentinel rows). Live rows KEEP their relative order; rows
    beyond the first `rows` live ones are DROPPED deterministically —
    size the budget above the map's LRU-bounded live count (the
    odometry engines expose it as OdometryParams.model_prepared_rows
    and leave it OFF by default for exactness-by-construction).
    """
    p = cloud.points
    cap = p.shape[0]
    live = p[:, 3] > 0.5
    rank = jnp.cumsum(live.astype(jnp.int32)) - live.astype(jnp.int32)
    dst = jnp.where(live & (rank < rows), rank, rows)

    cols = [p]
    n_off = c_off = None
    off = 4
    if cloud.normals is not None:
        n_off = off
        cols.append(cloud.normals)
        off += 4
    if cloud.covs is not None:
        c_off = off
        cols.append(cloud.covs.reshape(cap, 9))
        off += 9
    fused = jnp.concatenate(cols, axis=1)

    pad = jnp.zeros((off,), p.dtype).at[0:3].set(PAD_SENTINEL)
    out = jnp.broadcast_to(pad, (rows, off)).copy().at[dst].set(
        fused, mode="drop"
    )
    return PointCloud(
        points=out[:, 0:4],
        num_points=jnp.minimum(
            jnp.sum(live.astype(jnp.int32)), jnp.int32(rows)
        ),
        normals=None if n_off is None else out[:, n_off:n_off + 4],
        covs=None if c_off is None else out[:, c_off:c_off + 9].reshape(
            rows, 3, 3
        ),
    )
