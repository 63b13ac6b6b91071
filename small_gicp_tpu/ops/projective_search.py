"""Projective (KdTree-free) nearest-neighbor search.

TPU re-design of the reference's ProjectiveSearch
(ann/projective_search.hpp:13-219): target points are scattered into an
equirectangular (azimuth, elevation) index image; a query looks only at
a fixed search window around its own projection, with horizontal wrap
and vertical clamp border handling. Intended for spinning-LiDAR scans
where one beam ~= one image row.

Array redesign: the reference stores one point index per pixel
(last-writer-wins, projective_search.hpp:74-88) and scans a
(2*h+1)x(2*v+1) window per query. Here the index image is a [H, W]
int32 array built with one scatter, and the window search is a batched
gather of the window pixels per query + masked argmin — the same
candidate-set semantics, fully vectorized.

Default window (h=10, v=5) and image geometry match ProjectiveSearch's
defaults (projective_search.hpp:43-52).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from small_gicp_tpu.point_cloud import PointCloud

_FAR = 1.0e18


@struct.dataclass
class ProjectiveSearch:
    """Equirectangular index-image NN searcher (pytree).

    Reference: UnsafeProjectiveSearch + EquirectangularProjection
    (ann/projective_search.hpp:13-148).
    """

    points: jax.Array  # [N,4] target points (padded)
    index_image: jax.Array  # [H,W] int32, -1 = empty pixel
    width: int = struct.field(pytree_node=False, default=1024)
    height: int = struct.field(pytree_node=False, default=64)
    window_h: int = struct.field(pytree_node=False, default=10)
    window_v: int = struct.field(pytree_node=False, default=5)
    vertical_fov: float = struct.field(pytree_node=False, default=2.0944)

    @staticmethod
    def build(
        cloud: PointCloud,
        width: int = 1024,
        height: int = 64,
        window_h: int = 10,
        window_v: int = 5,
        vertical_fov: float = 2.0944,  # 120 deg, projective_search.hpp:20
    ) -> "ProjectiveSearch":
        uv = _project(cloud.points[:, :3], width, height, vertical_fov)
        n = cloud.capacity
        valid = cloud.valid_mask() & _in_bounds(uv, width, height)
        flat = uv[:, 1] * width + uv[:, 0]
        flat = jnp.where(valid, flat, width * height)  # out-of-range -> dropped
        img = jnp.full((width * height,), -1, jnp.int32)
        # Last writer wins, like the reference's sequential fill
        # (projective_search.hpp:84-86).
        img = img.at[flat].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop"
        )
        return ProjectiveSearch(
            points=cloud.points,
            index_image=img.reshape(height, width),
            width=width,
            height=height,
            window_h=window_h,
            window_v=window_v,
            vertical_fov=vertical_fov,
        )

    def nearest_neighbor_search(
        self, query_xyz: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """[Q,3] -> (sq_dists [Q], indices [Q], found [Q])."""
        return _ps_nn(self, jnp.asarray(query_xyz))

    def knn_search(self, query_xyz: jax.Array, k: int):
        """[Q,3] -> (sq_dists [Q,k], indices [Q,k], found [Q,k])."""
        return _ps_knn(self, jnp.asarray(query_xyz), k)


def _project(xyz: jax.Array, width: int, height: int, vfov: float) -> jax.Array:
    """Equirectangular projection to integer (u, v)
    (projective_search.hpp:16-26)."""
    dist = jnp.linalg.norm(xyz, axis=-1)
    azimuth = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    elevation = jnp.arcsin(xyz[:, 2] / jnp.maximum(dist, 1e-12))
    u = (azimuth + jnp.pi) / (2.0 * jnp.pi) * width
    v = (elevation / vfov + 0.5) * height
    return jnp.stack(
        [jnp.floor(u).astype(jnp.int32), jnp.floor(v).astype(jnp.int32)], axis=-1
    )


def _in_bounds(uv: jax.Array, width: int, height: int) -> jax.Array:
    return (
        (uv[:, 0] >= 0)
        & (uv[:, 0] < width)
        & (uv[:, 1] >= 0)
        & (uv[:, 1] < height)
    )


def _window_candidates(ps: ProjectiveSearch, query_xyz: jax.Array):
    """Gather the window's candidate indices/distances for each query.

    Returns (d2 [Q, WIN], idx [Q, WIN]) with _FAR distance on empty or
    out-of-window pixels. Horizontal coordinate wraps, vertical clamps
    (projective_search.hpp:116-140).
    """
    q = query_xyz.shape[0]
    uv = _project(query_xyz, ps.width, ps.height, ps.vertical_fov)
    du = jnp.arange(-ps.window_h, ps.window_h + 1)
    dv = jnp.arange(-ps.window_v, ps.window_v + 1)
    uu = jnp.mod(uv[:, 0, None] + du[None, :], ps.width)  # [Q, WU] wrap
    vv = jnp.clip(uv[:, 1, None] + dv[None, :], 0, ps.height - 1)  # [Q, WV]
    # [Q, WV, WU] pixel grid -> flat candidate indices
    pix = vv[:, :, None] * ps.width + uu[:, None, :]
    cand = ps.index_image.reshape(-1)[pix.reshape(q, -1)]  # [Q, WIN]
    safe = jnp.maximum(cand, 0)
    tpts = ps.points[safe][..., :3]
    diff = tpts - query_xyz[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand >= 0, d2, _FAR)
    return d2, safe


@jax.jit
def _ps_nn(ps: ProjectiveSearch, query_xyz: jax.Array):
    d2, idx = _window_candidates(ps, query_xyz)
    best = jnp.argmin(d2, axis=-1)
    rows = jnp.arange(query_xyz.shape[0])
    bd = d2[rows, best]
    return bd, idx[rows, best], bd < _FAR


@partial(jax.jit, static_argnames=("k",))
def _ps_knn(ps: ProjectiveSearch, query_xyz: jax.Array, k: int):
    d2, idx = _window_candidates(ps, query_xyz)
    neg, sel = jax.lax.top_k(-d2, k)
    rows = jnp.arange(query_xyz.shape[0])[:, None]
    return -neg, idx[rows, sel], (-neg) < _FAR
