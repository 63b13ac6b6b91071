"""Batched nearest-neighbor search.

The reference's ANN layer is a nanoflann-style recursive KdTree
(include/small_gicp/ann/kdtree.hpp:56-303). Pointer-chasing trees are the
wrong shape for a TPU, so this module replaces them with **exact tiled
brute-force KNN expressed as a matmul**: squared distances
‖q−t‖² = ‖q‖² − 2·q·tᵀ + ‖t‖² put the O(Q·M) work on the MXU, and a
top-k (or argmin for k=1) reduction runs on the VPU. For the post-
downsampling cloud sizes this library operates on (~10-70k points), this
is both exact (like the reference's KdTree, unlike approximate voxel
search) and fast — the 2·Q·M·3 FLOP distance matrix is tiny for a
systolic array.

Padded rows in either cloud carry the PAD_SENTINEL coordinate, so their
distances are ~1e18 and they can never win a neighbor race: no masks in
the hot loop.

The `KdTree` class name is kept for API parity with the reference Python
bindings (src/python/kdtree.cpp: KdTree, batch_knn_search,
batch_nearest_neighbor_search).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from small_gicp_tpu.point_cloud import PointCloud

DEFAULT_QUERY_BLOCK = 2048


def _use_pallas() -> bool:
    """Route k=1 searches to the Pallas kernel on TPU backends.

    Evaluated at trace time; CPU-simulated test meshes keep the portable
    XLA path (Pallas TPU kernels don't lower for the CPU backend).
    """
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pad_queries(q: jax.Array, block: int) -> Tuple[jax.Array, int]:
    n = q.shape[0]
    padded = (n + block - 1) // block * block
    if padded != n:
        q = jnp.concatenate(
            [q, jnp.zeros((padded - n,) + q.shape[1:], q.dtype)], axis=0
        )
    return q, n


@partial(jax.jit, static_argnames=("k", "block"))
def brute_force_knn(
    target_xyz: jax.Array,
    query_xyz: jax.Array,
    k: int,
    block: int = DEFAULT_QUERY_BLOCK,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k-nearest-neighbor search.

    Args:
      target_xyz: [M,3] target coordinates (padding = sentinel).
      query_xyz:  [Q,3] query coordinates.
      k: number of neighbors (static).
      block: query tile size (static); one [block, M] distance tile is
        alive at a time.

    Returns:
      (sq_dists [Q,k], indices [Q,k]) sorted ascending by distance —
      the same contract as the reference's KdTree::knn_search
      (ann/kdtree.hpp:194-233).
    """
    m = target_xyz.shape[0]
    q, n_query = _pad_queries(query_xyz, block)

    # Subtract a reference center to keep |x|² small: improves f32 accuracy
    # of the matmul distance expansion (catastrophic cancellation guard).
    # The sentinel rows would poison a mean, so take a masked median-ish
    # proxy: mean of entries with |x| < 1e8.
    finite = jnp.all(jnp.abs(target_xyz) < 1e8, axis=-1, keepdims=True)
    denom = jnp.maximum(jnp.sum(finite), 1)
    center = jnp.sum(jnp.where(finite, target_xyz, 0.0), axis=0) / denom
    t = target_xyz - center
    q = q - center

    t_sq = jnp.sum(t * t, axis=-1)  # [M]

    def tile_fn(q_blk):
        d2 = (
            jnp.sum(q_blk * q_blk, axis=-1, keepdims=True)
            - 2.0 * jnp.einsum("qa,ma->qm", q_blk, t,
                               precision=jax.lax.Precision.HIGHEST)
            + t_sq[None, :]
        )
        d2 = jnp.maximum(d2, 0.0)
        if k == 1:
            idx = jnp.argmin(d2, axis=-1)
            return d2[jnp.arange(d2.shape[0]), idx][:, None], idx[:, None]
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    q_tiles = q.reshape(-1, block, 3)
    dists, idx = jax.lax.map(tile_fn, q_tiles)
    dists = dists.reshape(-1, k)[:n_query]
    idx = idx.reshape(-1, k)[:n_query].astype(jnp.int32)
    return dists, idx


@struct.dataclass
class KdTree:
    """Nearest-neighbor searcher over a point cloud (pytree).

    API-parity stand-in for the reference KdTree (the implementation is
    exact brute force on the MXU — see module docstring). Like the
    reference, results over valid queries are exact.
    """

    points: jax.Array  # [M,4] homogeneous, padded with sentinel
    num_points: jax.Array  # scalar int32

    @staticmethod
    def build(cloud, num_threads: int = 1) -> "KdTree":
        """Accepts a PointCloud or a raw [N,3]/[N,4] array, matching the
        reference constructor (kdtree.cpp:20-53). num_threads is parity
        only — "build" is an O(1) store here (no tree)."""
        del num_threads
        if not isinstance(cloud, PointCloud):
            # from_points handles numpy AND device-resident jax arrays;
            # no host round trip for the latter.
            cloud = PointCloud.from_points(cloud)
        return KdTree(points=cloud.points, num_points=cloud.num_points)

    def knn_search(
        self,
        query_xyz,
        k: int,
        block: int = DEFAULT_QUERY_BLOCK,
        method: str = "exact",
        window_cell: float = 1.0,
    ):
        """Batch kNN: [Q,3] (or a single [3]) → (sq_dists [Q,k], idx [Q,k]).

        Covers both knn_search and batch_knn_search of the reference
        bindings (src/python/kdtree.cpp:122-213).

        `method`:
          * "exact" (default) — exact brute force, O(Q·M) on the
            MXU/Pallas paths; the same result contract as the
            reference's KdTree (ann/kdtree.hpp:194-233).
          * "window" — sub-quadratic Morton-banded approximate search
            (ops/knn_window.knn_windowed_query): O((M+Q)·log + Q·S·W).
            ≥97% set-recall at the defaults on spatially coherent
            clouds; missed slots return sq_dist=inf. Use this at
            raw-scan scales (M ≳ 10⁵) where exact O(Q·M) stops being
            free — the honest analog of the reference's
            `KnnSetting.epsilon` approximate knob (knn_result.hpp:18-22).
            `window_cell` is the Morton quantization cell (any value
            within a few orders of the point spacing works).

        `block` tunes the query tiling of the XLA brute-force path only;
        the Pallas path (TPU, f32, 1 < k <= 64) uses its own fixed VMEM
        block sizes and ignores it.
        """
        query_xyz = jnp.asarray(query_xyz)
        single = query_xyz.ndim == 1
        if single:
            query_xyz = query_xyz[None, :]
        if method == "window":
            from small_gicp_tpu.ops.knn_window import knn_windowed_query

            d, i = knn_windowed_query(
                self.points, self.num_points, query_xyz[:, :3], k,
                cell=window_cell,
            )
        elif method != "exact":
            raise ValueError(
                f"unknown method {method!r}; have 'exact', 'window'"
            )
        elif (
            _use_pallas() and self.points.dtype == jnp.float32 and 1 < k <= 64
        ):
            from small_gicp_tpu.ops.knn_pallas import knn_pallas

            d, i = knn_pallas(self.points, query_xyz[:, :3], k)
        else:
            d, i = brute_force_knn(
                self.points[:, :3], query_xyz[:, :3], k, block
            )
        if single:
            return d[0], i[0]
        return d, i

    # Aliases matching the reference Python bindings' names
    # (src/python/kdtree.cpp:122-213).
    def batch_knn_search(self, query_xyz, k: int, num_threads: int = 1):
        del num_threads  # parity only; XLA decides parallelism
        return self.knn_search(query_xyz, k)

    def batch_nearest_neighbor_search(self, query_xyz, num_threads: int = 1):
        del num_threads
        return self.nearest_neighbor_search(query_xyz)

    def nearest_neighbor_search(self, query_xyz, block: int = DEFAULT_QUERY_BLOCK):
        """k=1 special case (argmin reduction instead of top-k).

        On a TPU backend with f32 data this routes to the fused Pallas
        distance+argmin kernel (ops/knn_pallas.py), which keeps the
        [Q, M] distance matrix in VMEM instead of round-tripping it
        through HBM; results are identical to the XLA path.
        """
        query_xyz = jnp.asarray(query_xyz)
        single = query_xyz.ndim == 1
        if single:
            query_xyz = query_xyz[None, :]
        if _use_pallas() and self.points.dtype == jnp.float32:
            from small_gicp_tpu.ops.knn_pallas import nearest_neighbor_pallas

            q4 = jnp.concatenate(
                [
                    query_xyz[:, :3].astype(jnp.float32),
                    jnp.ones((query_xyz.shape[0], 1), jnp.float32),
                ],
                axis=1,
            )
            d, i = nearest_neighbor_pallas(self.points, q4)
        else:
            d, i = self.knn_search(query_xyz, 1, block)
            d, i = d[..., 0], i[..., 0]
        if single:
            return d[0], i[0]
        return d, i


def knn_search(target: PointCloud, query_xyz, k: int):
    """Functional one-shot kNN against a cloud."""
    return KdTree.build(target).knn_search(query_xyz, k)


def nearest_neighbor_search(target: PointCloud, query_xyz):
    return KdTree.build(target).nearest_neighbor_search(query_xyz)


def brute_force_knn_numpy(target_xyz: np.ndarray, query_xyz: np.ndarray, k: int):
    """Host-side oracle used by tests (mirrors the reference test strategy
    of checking trees against brute force, src/test/kdtree_test.cpp:167)."""
    d2 = (
        np.sum(query_xyz**2, axis=1, keepdims=True)
        - 2.0 * query_xyz @ target_xyz.T
        + np.sum(target_xyz**2, axis=1)[None, :]
    )
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx
