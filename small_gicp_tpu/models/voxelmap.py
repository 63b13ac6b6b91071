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
    segment_ids,
    sort_segments,
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
            raise ValueError(
                "GaussianVoxelMap.insert requires a cloud with covariances "
                "(run estimate_covariances / preprocess_points first)"
            )
        if T is not None:
            points = points @ T.T
            covs = transform_covs(T, covs)
        return _gvm_insert(self, points, covs, cloud.num_points)

    def set_lru(self, horizon: int = 100, clear_cycle: int = 10):
        """Returns a map with new LRU parameters (Python-bindings parity:
        src/python/voxelmap.cpp set_lru)."""
        return self.replace(
            lru_horizon=int(horizon), lru_clear_cycle=int(clear_cycle)
        )

    def size(self) -> jax.Array:
        """Number of occupied voxels (bindings parity: voxelmap.cpp)."""
        return self.num_voxels

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
    order, keys_s, valid, seg, n_new = sort_segments(keys_new)
    pts_s = points[order].astype(dtype)
    covs_s = covs[order].astype(dtype)

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
    order2, k2, valid2, seg2, total = sort_segments(all_keys)

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
    # lru + horizon < counter (incremental_voxelmap.hpp:74-79). Empty
    # inserts (zero valid points, e.g. padding frames in the jitted
    # odometry scan) do not advance the LRU clock.
    counter = jnp.where(num_points > 0, vm.lru_counter + 1, vm.lru_counter)
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


def _key_bit_cols(keys: jax.Array, dtype) -> Tuple[jax.Array, int]:
    """[V] int64 keys as bit-pattern columns of `dtype` (for fusing the
    key column into a float gather table; TPU gather cost is per-row, so
    one wide row beats separate key/payload gathers). Returns
    ([V, n] cols, n) with n = 1 for f64, 2 for f32."""
    if dtype == jnp.float64:
        return jax.lax.bitcast_convert_type(keys, jnp.float64)[:, None], 1
    return jax.lax.bitcast_convert_type(keys, jnp.float32), 2


def _bits_to_key(bits: jax.Array) -> jax.Array:
    """Bit-pattern columns ([...,1] f64 or [...,2] f32) back to int64
    (the f32→int64 bitcast consumes the trailing size-2 dim)."""
    if bits.dtype == jnp.float64:
        return jax.lax.bitcast_convert_type(bits[..., 0], jnp.int64)
    return jax.lax.bitcast_convert_type(bits, jnp.int64)


@jax.jit
def _gvm_nn(vm: GaussianVoxelMap, query_xyz: jax.Array):
    cap = vm.capacity
    q = query_xyz.shape[0]
    dtype = vm.means.dtype
    offsets = neighbor_offsets(vm.num_offsets)  # [K,3]
    inv_leaf = (1.0 / vm.leaf_size).astype(query_xyz.dtype)
    center = voxel_coords(query_xyz, inv_leaf)  # [Q,3]
    cand_coords = center[:, None, :] + offsets[None, :, :]  # [Q,K,3]
    cand_keys = pack_coords(cand_coords)  # [Q,K]

    # method="sort": the default binary-search lowering does ~17
    # sequential gather steps; the sort-based lowering is ~9x faster on
    # TPU for large query batches.
    pos = jnp.searchsorted(
        vm.keys, cand_keys.reshape(-1), method="sort"
    ).reshape(q, -1)
    pos = jnp.clip(pos, 0, cap - 1)

    # ONE fused gather of [key bits | mean] rows; the table concat is
    # loop-invariant across optimizer iterations and hoisted. (Folding
    # the 9 covariance columns in as well measures 8x SLOWER — the wide
    # [Q,K,14] gather hits a bad XLA path — so payload gathers stay in
    # the caller.)
    keycols, nk = _key_bit_cols(vm.keys, dtype)
    table = jnp.concatenate([keycols, vm.means[:, :3]], axis=1)
    rows_g = table[pos]  # [Q,K,nk+3]

    gkeys = _bits_to_key(rows_g[..., 0:nk])
    found = (gkeys == cand_keys) & (cand_keys != INVALID_KEY)

    mu = rows_g[..., nk:nk + 3].astype(query_xyz.dtype)  # [Q,K,3]
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


@struct.dataclass
class IncrementalVoxelMap:
    """Incremental scan-to-model voxel map (pytree).

    TPU equivalent of IncrementalVoxelMap<FlatContainer<...>>
    (ann/incremental_voxelmap.hpp:38-203 + ann/flat_container.hpp:20-154,
    i.e. "linear iVox" from Faster-LIO). The CPU design is a hash table
    into per-voxel point buckets; the TPU design is a **flat point table
    sorted by voxel key**: a voxel is a contiguous run of rows, found by
    binary search. Insertion is two stable multi-operand sorts plus
    segment reductions — no scatter/gather over bucket tables, which are
    pathologically slow on TPU (~us per row); everything streams through
    the sort at HBM bandwidth.

    Semantics preserved from the reference:
      * per-voxel point cap (default 10, arrival order kept — stable
        sort keeps earlier points first, flat_container.hpp:43-58)
      * min-distance dedup (default 0.1 m, flat_container.hpp:24-27),
        enforced by a fine-grid hash at that resolution — a batched
        deterministic approximation of the sequential distance check
      * LRU-horizon voxel eviction (100/10,
        incremental_voxelmap.hpp:74-86); empty inserts don't advance
        the LRU clock
      * offset search patterns 1/7/27 (incremental_voxelmap.hpp:157-186)

    `capacity` is the maximum number of STORED POINTS (the reference's
    total bucket budget; overflow drops highest-key rows).
    """

    point_keys: jax.Array  # [P] int64 voxel key per point, sorted, INVALID pad
    points: jax.Array  # [P,4]
    stamps: jax.Array  # [P] int32 lru stamp of the point's voxel
    num_points_stored: jax.Array  # scalar int32
    num_voxels: jax.Array  # scalar int32
    lru_counter: jax.Array  # scalar int32
    leaf_size: jax.Array  # scalar
    normals: Optional[jax.Array] = None  # [P,4]
    covs: Optional[jax.Array] = None  # [P,3,3]

    cell_capacity: int = struct.field(pytree_node=False, default=10)
    num_offsets: int = struct.field(pytree_node=False, default=1)
    lru_horizon: int = struct.field(pytree_node=False, default=100)
    lru_clear_cycle: int = struct.field(pytree_node=False, default=10)
    min_sq_dist_in_cell: float = struct.field(pytree_node=False, default=0.01)

    @property
    def capacity(self) -> int:
        return self.point_keys.shape[0]

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
        p = capacity
        pad = jnp.asarray([PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], dtype)
        return IncrementalVoxelMap(
            point_keys=jnp.full((p,), INVALID_KEY, jnp.int64),
            points=jnp.broadcast_to(pad, (p, 4)).copy(),
            stamps=jnp.zeros((p,), jnp.int32),
            num_points_stored=jnp.asarray(0, jnp.int32),
            num_voxels=jnp.asarray(0, jnp.int32),
            lru_counter=jnp.asarray(0, jnp.int32),
            leaf_size=jnp.asarray(leaf_size, dtype),
            normals=jnp.zeros((p, 4), dtype) if has_normals else None,
            covs=jnp.zeros((p, 3, 3), dtype) if has_covs else None,
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

    def set_lru(self, horizon: int = 100, clear_cycle: int = 10):
        """Returns a map with new LRU parameters (Python-bindings parity:
        src/python/voxelmap.cpp set_lru). Static pytree fields — using
        the returned map triggers one recompile of dependent programs."""
        return self.replace(
            lru_horizon=int(horizon), lru_clear_cycle=int(clear_cycle)
        )

    def knn_search(self, query_xyz: jax.Array, k: int):
        """Batched kNN over the offset neighborhood
        (incremental_voxelmap.hpp:127-148): returns
        (sq_dists [Q,k], flat_idx [Q,k], found [Q,k]); flat_idx indexes
        the points_flat()/covs_flat() views."""
        return _ivm_knn(self, query_xyz, k)

    def nearest_neighbor_search(self, query_xyz: jax.Array):
        d, i, f = _ivm_knn(self, query_xyz, 1)
        return d[:, 0], i[:, 0], f[:, 0]

    # Flat views (analog of traits::voxel_points/normals/covs,
    # incremental_voxelmap.hpp:255-291); valid rows are compacted to the
    # front and sorted by voxel key.
    def points_flat(self) -> jax.Array:
        return self.points

    def normals_flat(self) -> Optional[jax.Array]:
        return self.normals

    def covs_flat(self) -> Optional[jax.Array]:
        return self.covs

    def size(self) -> jax.Array:
        """Total number of stored points."""
        return self.num_points_stored

    def valid_points_mask(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.num_points_stored


def _fine_hash(xyz: jax.Array, fine_leaf) -> jax.Array:
    """Mixed 64-bit hash of fine-grid integer coords (dedup cell id).

    Hash collisions at worst drop one extra point from the dedup —
    harmless for a dedup approximation.
    """
    fc = jnp.floor(xyz / fine_leaf).astype(jnp.int64)
    h = (
        fc[:, 0] * jnp.int64(-7046029254386353131)   # 0x9E3779B97F4A7C15
        + fc[:, 1] * jnp.int64(-4417276706812531889)  # 0xC2B2AE3D27D4EB4F
        + fc[:, 2] * jnp.int64(1609587929392839161)   # 0x165667B19E3779F9
    )
    h = h ^ (h >> 29)
    h = h * jnp.int64(-4658895280553007687)  # 0xBF58476D1CE4E5B9
    return h ^ (h >> 32)


@jax.jit
def _ivm_insert(vm: IncrementalVoxelMap, points, normals, covs, num_points):
    P = vm.capacity
    C = vm.cell_capacity
    n = points.shape[0]
    dtype = vm.points.dtype
    m = P + n
    # Empty inserts do not advance the LRU clock.
    counter = jnp.where(num_points > 0, vm.lru_counter + 1, vm.lru_counter)

    inv_leaf = (1.0 / vm.leaf_size).astype(points.dtype)
    new_keys = pack_coords(voxel_coords(points[:, :3], inv_leaf))
    new_keys = jnp.where(jnp.arange(n) < num_points, new_keys, INVALID_KEY)

    # ------------------------------------------------------------------
    # Combined table: old rows first (arrival order ties in the stable
    # sorts below resolve old-before-new, matching the reference's
    # sequential insert).
    all_keys = jnp.concatenate([vm.point_keys, new_keys])
    all_stamps = jnp.concatenate([vm.stamps, jnp.full((n,), counter, jnp.int32)])
    is_new_row = jnp.concatenate(
        [jnp.zeros((P,), jnp.int32), jnp.ones((n,), jnp.int32)]
    )
    row_id = jnp.arange(m, dtype=jnp.int32)

    # ------------------------------------------------------------------
    # Min-dist dedup at the fine grid: stable-sort (hash, row) and keep
    # only the first row of each fine cell — old rows sort first, so a
    # new point landing in an occupied fine cell is dropped, like the
    # reference's distance check against existing occupants
    # (flat_container.hpp:43-50).
    if vm.min_sq_dist_in_cell > 0.0:
        fine_leaf = jnp.sqrt(jnp.asarray(vm.min_sq_dist_in_cell, points.dtype))
        all_xyz3 = jnp.concatenate([vm.points[:, :3], points[:, :3].astype(dtype)])
        fh = _fine_hash(all_xyz3, fine_leaf)
        fh = jnp.where(all_keys != INVALID_KEY, fh, INVALID_KEY)
        fh_s, row_s = jax.lax.sort((fh, row_id), num_keys=1)
        first = jnp.concatenate(
            [jnp.asarray([True]), fh_s[1:] != fh_s[:-1]]
        ) & (fh_s != INVALID_KEY)
        keep_fine = jnp.zeros((m,), bool).at[row_s].set(first)
        # Old rows always survive (their fine cells are unique by
        # construction); only new duplicates are dropped.
        keep_fine = keep_fine | (is_new_row == 0)
        all_keys = jnp.where(
            keep_fine, all_keys, INVALID_KEY
        )

    # ------------------------------------------------------------------
    # Main stable sort by voxel key, carrying all payload columns.
    pts_all = jnp.concatenate([vm.points, points.astype(dtype)])
    ops = [all_keys, all_stamps, row_id] + [pts_all[:, i] for i in range(4)]
    nrm_all = cov_all = None
    if vm.normals is not None:
        nrm_all = jnp.concatenate([vm.normals, normals.astype(dtype)])
        ops += [nrm_all[:, i] for i in range(4)]
    if vm.covs is not None:
        cov_all = jnp.concatenate(
            [vm.covs.reshape(P, 9), covs.reshape(n, 9).astype(dtype)]
        )
        ops += [cov_all[:, i] for i in range(9)]
    sorted_ops = jax.lax.sort(tuple(ops), num_keys=1, is_stable=True)
    k_s, stamp_s = sorted_ops[0], sorted_ops[1]
    payload_s = list(sorted_ops[3:])

    valid, seg_first, seg, _ = segment_ids(k_s)
    pos = jnp.arange(m, dtype=jnp.int32)

    # Voxel LRU stamp = max over the run (new points refresh the voxel).
    vox_stamp = jax.ops.segment_max(
        jnp.where(valid, stamp_s, jnp.iinfo(jnp.int32).min), seg, num_segments=m
    )
    stamp_of_point = vox_stamp[seg]

    # Per-voxel cap by arrival rank (stable sort kept arrival order).
    seg_start = jax.ops.segment_min(
        jnp.where(valid, pos, m), seg, num_segments=m
    )
    rank = pos - seg_start[seg]
    keep = valid & (rank < C)

    # LRU eviction cycle.
    do_clear = (counter % vm.lru_clear_cycle) == 0
    expired = (
        stamp_of_point.astype(jnp.int64) + vm.lru_horizon
    ) < counter.astype(jnp.int64)
    keep = keep & ~(do_clear & expired)

    # ------------------------------------------------------------------
    # Compaction: second stable sort pushes dropped rows to the tail.
    k_keep = jnp.where(keep, k_s, INVALID_KEY)
    ops2 = [k_keep, stamp_of_point] + payload_s
    sorted2 = jax.lax.sort(tuple(ops2), num_keys=1, is_stable=True)
    out_keys = sorted2[0][:P]
    out_stamps = sorted2[1][:P]
    cols = sorted2[2:]
    out_points = jnp.stack([c[:P] for c in cols[0:4]], axis=1)
    off = 4
    out_normals = None
    out_covs = None
    if vm.normals is not None:
        out_normals = jnp.stack([c[:P] for c in cols[off:off + 4]], axis=1)
        off += 4
    if vm.covs is not None:
        out_covs = jnp.stack(
            [c[:P] for c in cols[off:off + 9]], axis=1
        ).reshape(P, 3, 3)

    out_valid = out_keys != INVALID_KEY
    pad = jnp.asarray([PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], dtype)
    out_points = jnp.where(out_valid[:, None], out_points, pad)
    prev_o = jnp.concatenate(
        [jnp.asarray([INVALID_KEY], out_keys.dtype), out_keys[:-1]]
    )
    n_vox = jnp.sum((out_keys != prev_o) & out_valid).astype(jnp.int32)

    return vm.replace(
        point_keys=out_keys,
        points=out_points,
        normals=out_normals,
        covs=out_covs,
        stamps=jnp.where(out_valid, out_stamps, 0),
        num_points_stored=jnp.sum(out_valid).astype(jnp.int32),
        num_voxels=n_vox,
        lru_counter=counter,
    )


@partial(jax.jit, static_argnames=("k",))
def _ivm_knn(vm: IncrementalVoxelMap, query_xyz, k: int):
    P = vm.capacity
    C = vm.cell_capacity
    q = query_xyz.shape[0]
    offsets = neighbor_offsets(vm.num_offsets)  # [K,3]
    K = offsets.shape[0]

    inv_leaf = (1.0 / vm.leaf_size).astype(query_xyz.dtype)
    center = voxel_coords(query_xyz, inv_leaf)
    cand_keys = pack_coords(center[:, None, :] + offsets[None, :, :])  # [Q,K]

    # A voxel is a contiguous run; its start row by binary search, then a
    # C-row window gather (runs are capped at C rows by insert).
    # method="sort": see _gvm_nn.
    start = jnp.searchsorted(
        vm.point_keys, cand_keys.reshape(-1), method="sort"
    ).reshape(q, K)
    raw_idx = start[:, :, None] + jnp.arange(C)[None, None, :]
    idx = jnp.clip(raw_idx, 0, P - 1)

    # One fused [P, keybits+3] gather for keys and coordinates (see
    # _gvm_nn: per-row gather cost dominates, so fuse the columns).
    keycols, nk = _key_bit_cols(vm.point_keys, vm.points.dtype)
    table = jnp.concatenate([keycols, vm.points[:, :3]], axis=1)
    rows_g = table[idx]  # [Q,K,C,nk+3]
    gkeys = _bits_to_key(rows_g[..., 0:nk])  # [Q,K,C]
    usable = (
        (gkeys == cand_keys[:, :, None])
        & (cand_keys != INVALID_KEY)[:, :, None]
        # Window rows clipped at the table end would duplicate row P-1
        # (same key, same run, if the last run is short) — mask them.
        & (raw_idx < P)
    )

    cand_pts = rows_g[..., nk:nk + 3]  # [Q,K,C,3]
    diff = cand_pts - query_xyz[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(usable, d2, _FAR).reshape(q, K * C)
    flat_idx = idx.reshape(q, K * C)

    if k == 1:
        best = jnp.argmin(d2, axis=-1)
        rows = jnp.arange(q)
        bd = d2[rows, best]
        return (
            bd[:, None],
            flat_idx[rows, best].astype(jnp.int32)[:, None],
            (bd < _FAR)[:, None],
        )
    # At most K*C candidates exist; for larger k pad with not-found
    # slots (the reference's knn returns however many exist).
    kk = min(k, K * C)
    neg, sel = jax.lax.top_k(-d2, kk)
    rows = jnp.arange(q)[:, None]
    d_out = -neg
    i_out = flat_idx[rows, sel].astype(jnp.int32)
    if kk < k:
        d_out = jnp.concatenate(
            [d_out, jnp.full((q, k - kk), _FAR, d_out.dtype)], axis=1
        )
        i_out = jnp.concatenate(
            [i_out, jnp.zeros((q, k - kk), jnp.int32)], axis=1
        )
    return d_out, i_out, d_out < _FAR
