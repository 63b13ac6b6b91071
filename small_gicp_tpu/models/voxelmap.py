"""Voxel maps: Gaussian (VGICP) and incremental scan-to-model maps.

The reference builds these around a CPU hash table
(ann/incremental_voxelmap.hpp:38-203: unordered_map<Vector3i,size_t> +
flat voxel vector, LRU eviction) and a per-voxel Gaussian accumulator
(ann/gaussian_voxelmap.hpp:15-91). On TPU the hash table becomes a
**sorted int64 key array + binary search**: construction is the same
sort + segment_sum kernel as voxelgrid downsampling, and lookup is a
vectorized jnp.searchsorted over [Q, K] neighbor-offset keys. Everything
is fixed capacity; `num_voxels` tracks occupancy.

Key properties preserved from the reference:
  * voxel mean = mean of inserted points, voxel cov = mean of inserted
    point covariances (gaussian_voxelmap.hpp:32-53)
  * NN lookup checks the query's voxel plus `search_offsets` ∈ {1,7,27}
    neighbors and returns the closest voxel mean
    (incremental_voxelmap.hpp:99-119; default offsets = 1)
  * global index = (voxel_id << 32 | point_id) packing
    (incremental_voxelmap.hpp:151) — for the Gaussian map point_id = 0,
    so indices here are plain voxel ids.
  * LRU-horizon eviction for the incremental variant
    (incremental_voxelmap.hpp:74-86) — implemented as masked re-sort.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from small_gicp_tpu.point_cloud import PAD_SENTINEL, PointCloud, transform_covs
from small_gicp_tpu.ops.voxel_keys import (
    INVALID_KEY,
    neighbor_offsets,
    pack_coords,
    voxel_coords,
)

_FAR = 1e18


@struct.dataclass
class GaussianVoxelMap:
    """VGICP Gaussian voxel map (pytree).

    Fixed-capacity equivalent of the reference's
    GaussianVoxelMap = IncrementalVoxelMap<GaussianVoxel>.
    `keys` is sorted ascending with INVALID_KEY padding at the tail, so
    binary search doubles as the hash lookup.
    """

    keys: jax.Array  # [V] int64 sorted voxel keys (INVALID_KEY padded)
    means: jax.Array  # [V,4] voxel means (homogeneous)
    covs: jax.Array  # [V,3,3] voxel covariances
    counts: jax.Array  # [V] number of points accumulated per voxel
    num_voxels: jax.Array  # scalar int32
    lru: jax.Array  # [V] int32 last-touch stamps
    lru_counter: jax.Array  # scalar int32
    leaf_size: jax.Array  # scalar

    # Static configuration (not traced).
    num_offsets: int = struct.field(pytree_node=False, default=1)
    lru_horizon: int = struct.field(pytree_node=False, default=100)
    lru_clear_cycle: int = struct.field(pytree_node=False, default=10)

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    # ------------------------------------------------------------------

    @staticmethod
    def empty(
        leaf_size: float,
        capacity: int,
        dtype=jnp.float32,
        num_offsets: int = 1,
        lru_horizon: int = 100,
        lru_clear_cycle: int = 10,
    ) -> "GaussianVoxelMap":
        return GaussianVoxelMap(
            keys=jnp.full((capacity,), INVALID_KEY, jnp.int64),
            means=jnp.zeros((capacity, 4), dtype),
            covs=jnp.zeros((capacity, 3, 3), dtype),
            counts=jnp.zeros((capacity,), dtype),
            num_voxels=jnp.asarray(0, jnp.int32),
            lru=jnp.zeros((capacity,), jnp.int32),
            lru_counter=jnp.asarray(0, jnp.int32),
            leaf_size=jnp.asarray(leaf_size, dtype),
            num_offsets=num_offsets,
            lru_horizon=lru_horizon,
            lru_clear_cycle=lru_clear_cycle,
        )

    @staticmethod
    def build(
        cloud: PointCloud,
        leaf_size: float,
        capacity: Optional[int] = None,
        num_offsets: int = 1,
    ) -> "GaussianVoxelMap":
        """One-shot construction from a cloud with covariances
        (reference: create_gaussian_voxelmap, registration_helper.cpp:50-54)."""
        if cloud.covs is None:
            raise ValueError("GaussianVoxelMap.build requires covariances")
        cap = capacity if capacity is not None else cloud.capacity
        vmap_ = GaussianVoxelMap.empty(
            leaf_size, cap, cloud.dtype, num_offsets=num_offsets
        )
        return vmap_.insert(cloud)

    # ------------------------------------------------------------------

    def insert(self, cloud: PointCloud, T: Optional[jax.Array] = None) -> "GaussianVoxelMap":
        """Insert a cloud (optionally transformed by T) and re-finalize.

        Merges the new points' per-voxel sums with the existing voxel
        sums — numerically identical to the reference's un-finalize /
        re-accumulate / finalize dance (gaussian_voxelmap.hpp:32-53) —
        then runs the LRU eviction cycle (incremental_voxelmap.hpp:74-86).
        """
        points = cloud.points
        covs = cloud.covs
        if covs is None:
            covs = jnp.zeros((cloud.capacity, 3, 3), cloud.dtype)
        if T is not None:
            points = points @ T.T
            covs = transform_covs(T, covs)
        return _gvm_insert(self, points, covs, cloud.num_points)

    def nearest_neighbor_search(self, query_xyz: jax.Array):
        """Batched NN: [Q,3] → (sq_dists [Q], voxel_idx [Q], found [Q])."""
        return _gvm_nn(self, query_xyz)

    # Flat-cloud views (reference traits voxel_points/voxel_covs,
    # incremental_voxelmap.hpp:255-291).
    def voxel_points(self) -> jax.Array:
        return self.means

    def voxel_covs(self) -> jax.Array:
        return self.covs

    def valid_mask(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.num_voxels


@jax.jit
def _gvm_insert(vm: GaussianVoxelMap, points, covs, num_points) -> GaussianVoxelMap:
    cap = vm.capacity
    n = points.shape[0]
    dtype = vm.means.dtype

    inv_leaf = 1.0 / vm.leaf_size
    keys_new = pack_coords(voxel_coords(points[:, :3], inv_leaf.astype(points.dtype)))
    keys_new = jnp.where(jnp.arange(n) < num_points, keys_new, INVALID_KEY)

    # Segment-reduce the incoming points by voxel key.
    order = jnp.argsort(keys_new)
    keys_s = keys_new[order]
    pts_s = points[order].astype(dtype)
    covs_s = covs[order].astype(dtype)
    valid = keys_s != INVALID_KEY
    prev = jnp.concatenate([jnp.asarray([INVALID_KEY], keys_s.dtype), keys_s[:-1]])
    is_new = (keys_s != prev) & valid
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    seg = jnp.where(valid, seg, n - 1)
    n_new = jnp.sum(is_new).astype(jnp.int32)

    new_keys = jax.ops.segment_max(
        jnp.where(valid, keys_s, jnp.int64(-1)), seg, num_segments=n
    )
    new_keys = jnp.where(jnp.arange(n) < n_new, new_keys, INVALID_KEY)
    sum_pts = jax.ops.segment_sum(pts_s * valid[:, None].astype(dtype), seg, num_segments=n)
    sum_covs = jax.ops.segment_sum(
        covs_s * valid[:, None, None].astype(dtype), seg, num_segments=n
    )
    new_counts = jax.ops.segment_sum(valid.astype(dtype), seg, num_segments=n)

    # Existing voxels as sums (un-finalize, gaussian_voxelmap.hpp:33-37).
    old_counts = vm.counts
    old_sum_pts = vm.means * old_counts[:, None]
    old_sum_covs = vm.covs * old_counts[:, None, None]

    # Merge: concatenate (old cap + new n) candidate voxels, sort by key,
    # and segment-sum duplicates. Keys are unique within each side, so a
    # segment has at most 2 members.
    all_keys = jnp.concatenate([vm.keys, new_keys])
    all_pts = jnp.concatenate([old_sum_pts, sum_pts])
    all_covs = jnp.concatenate([old_sum_covs, sum_covs])
    all_counts = jnp.concatenate([old_counts, new_counts])
    # LRU: the new side carries the current counter, so the segment_max in
    # the merge below stamps every touched voxel with it while untouched
    # voxels keep their old stamp (incremental_voxelmap.hpp:70).
    all_lru = jnp.concatenate([vm.lru, jnp.full((n,), vm.lru_counter, jnp.int32)])

    m = cap + n
    order2 = jnp.argsort(all_keys)
    k2 = all_keys[order2]
    valid2 = k2 != INVALID_KEY
    prev2 = jnp.concatenate([jnp.asarray([INVALID_KEY], k2.dtype), k2[:-1]])
    is_new2 = (k2 != prev2) & valid2
    seg2 = jnp.cumsum(is_new2.astype(jnp.int32)) - 1
    seg2 = jnp.where(valid2, seg2, m - 1)
    total = jnp.sum(is_new2).astype(jnp.int32)

    w2 = valid2.astype(dtype)
    merged_keys = jax.ops.segment_max(
        jnp.where(valid2, k2, jnp.int64(-1)), seg2, num_segments=m
    )
    merged_pts = jax.ops.segment_sum(all_pts[order2] * w2[:, None], seg2, num_segments=m)
    merged_covs = jax.ops.segment_sum(
        all_covs[order2] * w2[:, None, None], seg2, num_segments=m
    )
    merged_counts = jax.ops.segment_sum(all_counts[order2] * w2, seg2, num_segments=m)
    merged_lru = jax.ops.segment_max(
        jnp.where(valid2, all_lru[order2], jnp.iinfo(jnp.int32).min),
        seg2,
        num_segments=m,
    )

    row = jnp.arange(m)
    in_range = row < total
    merged_keys = jnp.where(in_range, merged_keys, INVALID_KEY)

    # LRU eviction every lru_clear_cycle inserts: drop voxels with
    # lru + horizon < counter (incremental_voxelmap.hpp:74-79).
    counter = vm.lru_counter + 1
    do_clear = (counter % vm.lru_clear_cycle) == 0
    expired = (merged_lru.astype(jnp.int64) + vm.lru_horizon) < counter.astype(jnp.int64)
    evict = do_clear & expired & in_range
    merged_keys = jnp.where(evict, INVALID_KEY, merged_keys)

    # Capacity overflow policy: keep the most recently used voxels.
    alive = merged_keys != INVALID_KEY
    n_alive = jnp.sum(alive).astype(jnp.int32)
    overflow = n_alive > cap
    # Rank voxels by LRU (desc) and keep the top `cap` when overflowing.
    lru_rank = jnp.argsort(
        jnp.where(alive, -merged_lru.astype(jnp.int64), jnp.iinfo(jnp.int64).max)
    )
    keep_rank = jnp.zeros((m,), bool).at[lru_rank[:cap]].set(True)
    keep = alive & jnp.where(overflow, keep_rank, True)
    merged_keys = jnp.where(keep, merged_keys, INVALID_KEY)

    # Compact back to capacity: sort by key (invalid last), take first cap.
    order3 = jnp.argsort(merged_keys)[:cap]
    out_keys = merged_keys[order3]
    out_counts = merged_counts[order3]
    safe = jnp.maximum(out_counts, 1.0)
    out_means = merged_pts[order3] / safe[:, None]
    out_covs = merged_covs[order3] / safe[:, None, None]
    out_lru = merged_lru[order3]
    out_n = jnp.sum(out_keys != INVALID_KEY).astype(jnp.int32)

    return vm.replace(
        keys=out_keys,
        means=out_means,
        covs=out_covs,
        counts=jnp.where(out_keys != INVALID_KEY, out_counts, 0.0),
        num_voxels=out_n,
        lru=out_lru,
        lru_counter=counter,
    )


@jax.jit
def _gvm_nn(vm: GaussianVoxelMap, query_xyz: jax.Array):
    cap = vm.capacity
    q = query_xyz.shape[0]
    offsets = neighbor_offsets(vm.num_offsets)  # [K,3]
    inv_leaf = (1.0 / vm.leaf_size).astype(query_xyz.dtype)
    center = voxel_coords(query_xyz, inv_leaf)  # [Q,3]
    cand_coords = center[:, None, :] + offsets[None, :, :]  # [Q,K,3]
    cand_keys = pack_coords(cand_coords)  # [Q,K]

    pos = jnp.searchsorted(vm.keys, cand_keys.reshape(-1)).reshape(q, -1)
    pos = jnp.clip(pos, 0, cap - 1)
    found = (vm.keys[pos] == cand_keys) & (cand_keys != INVALID_KEY)

    mu = vm.means[pos][..., :3]  # [Q,K,3]
    diff = mu - query_xyz[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(found, d2, _FAR)

    best = jnp.argmin(d2, axis=-1)  # [Q]
    rows = jnp.arange(q)
    return d2[rows, best], pos[rows, best].astype(jnp.int32), found[rows, best]


def IncrementalVoxelMapNormal(leaf_size, capacity, **kw):
    """Alias factory matching the reference binding names
    (src/python/voxelmap.cpp:70-151: IncrementalVoxelMap{,Normal,Cov,NormalCov})."""
    return IncrementalVoxelMap.empty(leaf_size, capacity, has_normals=True, **kw)


def IncrementalVoxelMapCov(leaf_size, capacity, **kw):
    return IncrementalVoxelMap.empty(leaf_size, capacity, has_covs=True, **kw)


def IncrementalVoxelMapNormalCov(leaf_size, capacity, **kw):
    return IncrementalVoxelMap.empty(
        leaf_size, capacity, has_normals=True, has_covs=True, **kw
    )


def voxelmap_as_cloud(vm: GaussianVoxelMap) -> PointCloud:
    """Expose voxel means/covs as a point cloud (the reference passes the
    voxelmap as the *target cloud* too — registration_helper.cpp:136;
    SequentialVoxelMapAccessor equivalent)."""
    pts = vm.means
    pad = jnp.asarray(
        [PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], vm.means.dtype
    )
    pts = jnp.where(vm.valid_mask()[:, None], pts, pad)
    return PointCloud(points=pts, num_points=vm.num_voxels, covs=vm.covs)


# ======================================================================
# Incremental voxel map (scan-to-model): linear-iVox equivalent
# ======================================================================


def _merge_keys(old_keys, old_lru, new_keys, new_valid, counter, horizon,
                clear_cycle, cap):
    """Merge sorted old keys with new (unsorted, unique) keys.

    Returns (out_keys [cap] sorted, out_lru [cap]). Applies the LRU
    eviction cycle and, on capacity overflow, keeps the most recently
    used voxels (the reference grows unboundedly between eviction
    cycles — incremental_voxelmap.hpp:74-86; fixed capacity forces an
    explicit overflow policy here).
    """
    n = new_keys.shape[0]
    m = cap + n
    all_keys = jnp.concatenate([old_keys, jnp.where(new_valid, new_keys, INVALID_KEY)])
    all_lru = jnp.concatenate([old_lru, jnp.full((n,), counter, jnp.int32)])

    order = jnp.argsort(all_keys)
    k = all_keys[order]
    lru = all_lru[order]
    valid = k != INVALID_KEY
    prev = jnp.concatenate([jnp.asarray([INVALID_KEY], k.dtype), k[:-1]])
    is_new = (k != prev) & valid
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    seg = jnp.where(valid, seg, m - 1)
    total = jnp.sum(is_new).astype(jnp.int32)

    int32_min = jnp.iinfo(jnp.int32).min
    merged_keys = jax.ops.segment_max(
        jnp.where(valid, k, jnp.int64(-1)), seg, num_segments=m
    )
    merged_lru = jax.ops.segment_max(
        jnp.where(valid, lru, int32_min), seg, num_segments=m
    )
    row = jnp.arange(m)
    in_range = row < total
    merged_keys = jnp.where(in_range, merged_keys, INVALID_KEY)

    do_clear = (counter % clear_cycle) == 0
    expired = (merged_lru.astype(jnp.int64) + horizon) < counter.astype(jnp.int64)
    merged_keys = jnp.where(do_clear & expired & in_range, INVALID_KEY, merged_keys)

    alive = merged_keys != INVALID_KEY
    overflow = jnp.sum(alive) > cap
    lru_rank = jnp.argsort(
        jnp.where(alive, -merged_lru.astype(jnp.int64), jnp.iinfo(jnp.int64).max)
    )
    keep_rank = jnp.zeros((m,), bool).at[lru_rank[:cap]].set(True)
    keep = alive & jnp.where(overflow, keep_rank, True)
    merged_keys = jnp.where(keep, merged_keys, INVALID_KEY)

    order2 = jnp.argsort(merged_keys)[:cap]
    return merged_keys[order2], merged_lru[order2]


@struct.dataclass
class IncrementalVoxelMap:
    """Incremental scan-to-model voxel map (pytree).

    TPU equivalent of IncrementalVoxelMap<FlatContainer<...>>
    (ann/incremental_voxelmap.hpp:38-203 + ann/flat_container.hpp:20-154,
    i.e. "linear iVox" from Faster-LIO): a fixed set of V voxels, each a
    fixed [C]-slot point bucket. The CPU hash table becomes a sorted key
    array + binary search; per-voxel linear-scan KNN becomes a batched
    gather of the offset-neighborhood buckets + masked top-k.

    Semantics preserved: per-cell capacity (default 10) and min-distance
    dedup (default 0.1 m, flat_container.hpp:24-27; here enforced by a
    fine sub-grid of that resolution, a deterministic batched
    approximation of the reference's sequential check), LRU horizon
    eviction (100/10), offset search patterns 1/7/27, global point id =
    voxel_id * C + slot (the reference packs voxel_id<<32|point_id —
    incremental_voxelmap.hpp:151).
    """

    keys: jax.Array  # [V] sorted int64
    points: jax.Array  # [V, C, 4]
    cell_counts: jax.Array  # [V] int32
    num_voxels: jax.Array  # scalar int32
    lru: jax.Array  # [V] int32
    lru_counter: jax.Array  # scalar int32
    leaf_size: jax.Array  # scalar
    normals: Optional[jax.Array] = None  # [V, C, 4]
    covs: Optional[jax.Array] = None  # [V, C, 3, 3]

    cell_capacity: int = struct.field(pytree_node=False, default=10)
    num_offsets: int = struct.field(pytree_node=False, default=1)
    lru_horizon: int = struct.field(pytree_node=False, default=100)
    lru_clear_cycle: int = struct.field(pytree_node=False, default=10)
    min_sq_dist_in_cell: float = struct.field(pytree_node=False, default=0.01)

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @staticmethod
    def empty(
        leaf_size: float,
        capacity: int,
        dtype=jnp.float32,
        has_normals: bool = False,
        has_covs: bool = False,
        cell_capacity: int = 10,
        num_offsets: int = 1,
        lru_horizon: int = 100,
        lru_clear_cycle: int = 10,
        min_sq_dist_in_cell: float = 0.01,
    ) -> "IncrementalVoxelMap":
        v, c = capacity, cell_capacity
        pad = jnp.asarray([PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], dtype)
        return IncrementalVoxelMap(
            keys=jnp.full((v,), INVALID_KEY, jnp.int64),
            points=jnp.broadcast_to(pad, (v, c, 4)).copy(),
            cell_counts=jnp.zeros((v,), jnp.int32),
            num_voxels=jnp.asarray(0, jnp.int32),
            lru=jnp.zeros((v,), jnp.int32),
            lru_counter=jnp.asarray(0, jnp.int32),
            leaf_size=jnp.asarray(leaf_size, dtype),
            normals=jnp.zeros((v, c, 4), dtype) if has_normals else None,
            covs=jnp.zeros((v, c, 3, 3), dtype) if has_covs else None,
            cell_capacity=cell_capacity,
            num_offsets=num_offsets,
            lru_horizon=lru_horizon,
            lru_clear_cycle=lru_clear_cycle,
            min_sq_dist_in_cell=min_sq_dist_in_cell,
        )

    def insert(self, cloud: PointCloud, T: Optional[jax.Array] = None) -> "IncrementalVoxelMap":
        """Insert a cloud transformed by T (incremental_voxelmap.hpp:55-92;
        normals/covs are rotated into the map frame like
        flat_container.hpp:52-57)."""
        dtype = self.points.dtype
        points = cloud.points.astype(dtype)
        T = jnp.eye(4, dtype=dtype) if T is None else jnp.asarray(T, dtype)
        normals = cloud.normals
        covs = cloud.covs
        if self.normals is not None:
            if normals is None:
                normals = jnp.zeros((cloud.capacity, 4), dtype)
            normals = normals.astype(dtype) @ T.T
        else:
            normals = None
        if self.covs is not None:
            if covs is None:
                covs = jnp.zeros((cloud.capacity, 3, 3), dtype)
            covs = transform_covs(T, covs.astype(dtype))
        else:
            covs = None
        return _ivm_insert(self, points @ T.T, normals, covs, cloud.num_points)

    def knn_search(self, query_xyz: jax.Array, k: int):
        """Batched kNN over the offset neighborhood
        (incremental_voxelmap.hpp:127-148): returns
        (sq_dists [Q,k], flat_idx [Q,k], found [Q,k])."""
        return _ivm_knn(self, query_xyz, k)

    def nearest_neighbor_search(self, query_xyz: jax.Array):
        d, i, f = _ivm_knn(self, query_xyz, 1)
        return d[:, 0], i[:, 0], f[:, 0]

    # Flat [V*C] views — the analog of traits::voxel_points/normals/covs
    # (incremental_voxelmap.hpp:255-291); flat_idx indexes these.
    def points_flat(self) -> jax.Array:
        return self.points.reshape(-1, 4)

    def normals_flat(self) -> Optional[jax.Array]:
        return None if self.normals is None else self.normals.reshape(-1, 4)

    def covs_flat(self) -> Optional[jax.Array]:
        return None if self.covs is None else self.covs.reshape(-1, 3, 3)

    def size(self) -> jax.Array:
        """Total number of stored points."""
        return jnp.sum(self.cell_counts)


@jax.jit
def _ivm_insert(vm: IncrementalVoxelMap, points, normals, covs, num_points):
    capV = vm.capacity
    C = vm.cell_capacity
    n = points.shape[0]
    dtype = vm.points.dtype
    counter = vm.lru_counter + 1

    inv_leaf = (1.0 / vm.leaf_size).astype(points.dtype)
    keys = pack_coords(voxel_coords(points[:, :3], inv_leaf))
    keys = jnp.where(jnp.arange(n) < num_points, keys, INVALID_KEY)

    # --- Fine-grid dedup at min-dist resolution (batched stand-in for the
    # sequential min_sq_dist_in_cell check, flat_container.hpp:43-50).
    # Fine cells are identified by a mixed 64-bit hash of the unbounded
    # integer fine coordinates (not the 21-bit packing, whose range the
    # fine grid easily overflows); a hash collision at worst drops one
    # extra point from the dedup — harmless for a dedup approximation.
    if vm.min_sq_dist_in_cell > 0.0:
        fine_leaf = jnp.sqrt(jnp.asarray(vm.min_sq_dist_in_cell, points.dtype))
        fc = jnp.floor(points[:, :3] / fine_leaf).astype(jnp.int64)
        h = (
            fc[:, 0] * jnp.int64(-7046029254386353131)   # 0x9E3779B97F4A7C15
            + fc[:, 1] * jnp.int64(-4417276706812531889)  # 0xC2B2AE3D27D4EB4F
            + fc[:, 2] * jnp.int64(1609587929392839161)   # 0x165667B19E3779F9
        )
        h = h ^ (h >> 29)
        h = h * jnp.int64(-4658895280553007687)  # 0xBF58476D1CE4E5B9
        h = h ^ (h >> 32)
        fine_keys = jnp.where(keys != INVALID_KEY, h, INVALID_KEY)
        forder = jnp.argsort(fine_keys, stable=True)
        fsorted = fine_keys[forder]
        fprev = jnp.concatenate(
            [jnp.asarray([INVALID_KEY], fsorted.dtype), fsorted[:-1]]
        )
        f_first = (fsorted != fprev) & (fsorted != INVALID_KEY)
        keep_mask = jnp.zeros((n,), bool).at[forder].set(f_first)
        keys = jnp.where(keep_mask, keys, INVALID_KEY)

    # --- Sort incoming by coarse key; compute per-voxel unique keys and
    # within-voxel arrival ranks.
    order = jnp.argsort(keys, stable=True)
    k_s = keys[order]
    valid = k_s != INVALID_KEY
    prev = jnp.concatenate([jnp.asarray([INVALID_KEY], k_s.dtype), k_s[:-1]])
    is_new = (k_s != prev) & valid
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    seg = jnp.where(valid, seg, n - 1)
    # rank within segment = position − segment start
    pos = jnp.arange(n)
    seg_start = jax.ops.segment_min(
        jnp.where(valid, pos, n), seg, num_segments=n
    )
    rank = pos - seg_start[seg]

    uniq_keys = jax.ops.segment_max(
        jnp.where(valid, k_s, jnp.int64(-1)), seg, num_segments=n
    )
    n_uniq = jnp.sum(is_new).astype(jnp.int32)
    uniq_valid = jnp.arange(n) < n_uniq
    uniq_keys = jnp.where(uniq_valid, uniq_keys, INVALID_KEY)

    # --- Merge key sets with LRU/eviction, then remap old payload.
    out_keys, out_lru = _merge_keys(
        vm.keys, vm.lru, uniq_keys, uniq_valid, counter,
        vm.lru_horizon, vm.lru_clear_cycle, capV,
    )
    old_pos = jnp.clip(jnp.searchsorted(vm.keys, out_keys), 0, capV - 1)
    old_found = (vm.keys[old_pos] == out_keys) & (out_keys != INVALID_KEY)

    pad = jnp.asarray([PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], dtype)
    out_points = jnp.where(
        old_found[:, None, None], vm.points[old_pos], jnp.broadcast_to(pad, (capV, C, 4))
    )
    out_counts = jnp.where(old_found, vm.cell_counts[old_pos], 0)
    out_normals = None
    out_covs = None
    if vm.normals is not None:
        out_normals = jnp.where(
            old_found[:, None, None], vm.normals[old_pos], 0.0
        )
    if vm.covs is not None:
        out_covs = jnp.where(
            old_found[:, None, None, None], vm.covs[old_pos], 0.0
        )

    # --- Insert the deduped new points.
    pts_s = points[order].astype(dtype)
    vidx = jnp.clip(jnp.searchsorted(out_keys, k_s), 0, capV - 1)
    voxel_found = (out_keys[vidx] == k_s) & valid

    # Min-dist check vs the existing (pre-insert) cell occupants.
    cell_pts = out_points[vidx][..., :3]  # [n, C, 3]
    slot_ids = jnp.arange(C)[None, :]
    occupied = slot_ids < out_counts[vidx][:, None]
    diff = cell_pts - pts_s[:, None, :3]
    d2 = jnp.sum(diff * diff, axis=-1)
    too_close = jnp.any(occupied & (d2 < vm.min_sq_dist_in_cell), axis=-1)

    want = voxel_found & ~too_close
    # Re-rank among surviving points in each voxel: number of survivors
    # strictly before this row within its segment.
    want_i = want.astype(jnp.int32)
    csum = jnp.cumsum(want_i)
    seg_base = jax.ops.segment_min(
        jnp.where(valid, csum - want_i, n), seg, num_segments=n
    )
    surv_rank = csum - want_i - seg_base[seg]
    slot = out_counts[vidx] + surv_rank
    do_write = want & (slot < C)
    slot = jnp.clip(slot, 0, C - 1)
    # Route suppressed writes to a scratch voxel row far in the padding...
    # simpler: mask by writing to voxel capV-1 slot C-1 only when that is
    # safe is fishy — instead scatter with explicit drop via where on idx.
    w_vidx = jnp.where(do_write, vidx, capV)  # capV = out-of-bounds → dropped
    out_points = out_points.at[w_vidx, slot].set(pts_s, mode="drop")
    if out_normals is not None:
        out_normals = out_normals.at[w_vidx, slot].set(
            normals[order].astype(dtype), mode="drop"
        )
    if out_covs is not None:
        out_covs = out_covs.at[w_vidx, slot].set(
            covs[order].astype(dtype), mode="drop"
        )
    added = jax.ops.segment_sum(
        do_write.astype(jnp.int32), w_vidx, num_segments=capV + 1
    )[:capV]
    out_counts = jnp.minimum(out_counts + added, C)

    return vm.replace(
        keys=out_keys,
        points=out_points,
        normals=out_normals,
        covs=out_covs,
        cell_counts=out_counts,
        num_voxels=jnp.sum(out_keys != INVALID_KEY).astype(jnp.int32),
        lru=out_lru,
        lru_counter=counter,
    )


@partial(jax.jit, static_argnames=("k",))
def _ivm_knn(vm: IncrementalVoxelMap, query_xyz, k: int):
    capV = vm.capacity
    C = vm.cell_capacity
    q = query_xyz.shape[0]
    offsets = neighbor_offsets(vm.num_offsets)  # [K,3]
    K = offsets.shape[0]

    inv_leaf = (1.0 / vm.leaf_size).astype(query_xyz.dtype)
    center = voxel_coords(query_xyz, inv_leaf)
    cand_keys = pack_coords(center[:, None, :] + offsets[None, :, :])  # [Q,K]
    pos = jnp.clip(
        jnp.searchsorted(vm.keys, cand_keys.reshape(-1)).reshape(q, K), 0, capV - 1
    )
    vfound = (vm.keys[pos] == cand_keys) & (cand_keys != INVALID_KEY)  # [Q,K]

    cand_pts = vm.points[pos][..., :3]  # [Q,K,C,3]
    slot_ids = jnp.arange(C)[None, None, :]
    occ = slot_ids < vm.cell_counts[pos][:, :, None]  # [Q,K,C]
    usable = occ & vfound[:, :, None]

    diff = cand_pts - query_xyz[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # [Q,K,C]
    d2 = jnp.where(usable, d2, _FAR).reshape(q, K * C)
    flat_idx = (pos[:, :, None] * C + slot_ids).reshape(q, K * C)

    if k == 1:
        best = jnp.argmin(d2, axis=-1)
        rows = jnp.arange(q)
        bd = d2[rows, best]
        return (
            bd[:, None],
            flat_idx[rows, best].astype(jnp.int32)[:, None],
            (bd < _FAR)[:, None],
        )
    neg, sel = jax.lax.top_k(-d2, k)
    rows = jnp.arange(q)[:, None]
    return (
        -neg,
        flat_idx[rows, sel].astype(jnp.int32),
        (-neg) < _FAR,
    )
