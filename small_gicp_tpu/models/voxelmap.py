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
  * LRU-horizon eviction with the reference's exact stamp timing
    (pre-increment stamps, post-increment eviction test,
    incremental_voxelmap.hpp:63,70,74-86).

Capacity overflow (no reference analog — its maps are unbounded hash
tables) drops the highest-key merged rows/voxels for both map types;
size capacities so the LRU horizon, not overflow, bounds the map.
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

    def set_search_offsets(self, num_offsets: int):
        """Returns a map searching the 1/7/27-voxel neighborhood
        (incremental_voxelmap.hpp:157-186). Static pytree field — using
        the returned map triggers one recompile of dependent programs."""
        return self.replace(num_offsets=int(num_offsets))

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
    """O(scan) Gaussian-map insert: sort only the incoming scan, then
    merge into the already-sorted voxel table.

    The first implementation concatenated map+scan and re-sorted all
    cap+n rows with full payload every insert (~22 ms at 131k capacity /
    16k scan on a v5e chip, dominated by multi-operand sort passes and
    segment scatters). TPU scatters serialize per row, so this version
    is built from sorts, gathers, prefix sums and binary searches ONLY:
      1. sort the scan by voxel key (one n-row sort) and reduce each
         voxel run with prefix-sum differences (no segment scatter),
      2. for runs whose voxel already exists, GATHER the old voxel's
         sums into the run total (un-finalize/re-accumulate/finalize of
         gaussian_voxelmap.hpp:33-53 as running sums) and mark the old
         row dead,
      3. merge surviving old rows and new per-voxel rows with ONE
         stable 2-operand sort of (key, source-id) over cap+n rows, and
      4. materialize the table with one fused payload gather.

    LRU semantics match the reference exactly: every voxel receiving
    points this insert is stamped with the PRE-increment counter
    (incremental_voxelmap.hpp:63,70), the counter increments after the
    scan, and eviction on clear cycles drops voxels with
    stamp + horizon < counter (:74-79). Empty inserts (padding frames in
    the jitted odometry scan) are full no-ops and do not advance the
    clock.

    Capacity overflow drops the highest-key merged voxels (the merged
    table's tail) — same documented policy as the IncrementalVoxelMap.
    """
    V = vm.capacity
    n = points.shape[0]
    dtype = vm.means.dtype

    stamp_val = vm.lru_counter  # PRE-increment stamp
    nonempty = num_points > 0
    counter = jnp.where(nonempty, vm.lru_counter + 1, vm.lru_counter)

    inv_leaf = 1.0 / vm.leaf_size
    keys_new = pack_coords(voxel_coords(points[:, :3], inv_leaf.astype(points.dtype)))
    keys_new = jnp.where(jnp.arange(n) < num_points, keys_new, INVALID_KEY)

    # --- 1. sort the scan; per-run sums via prefix differences ---------
    pos32 = jnp.arange(n, dtype=jnp.int32)
    k_s, ord32 = jax.lax.sort((keys_new, pos32), num_keys=1, is_stable=True)
    pts_s = points[ord32].astype(dtype)
    covs_s = covs[ord32].astype(dtype)
    valid = k_s != INVALID_KEY
    prev = jnp.concatenate([jnp.asarray([INVALID_KEY]), k_s[:-1]])
    seg_first = (k_s != prev) & valid

    w = valid.astype(dtype)
    allc = jnp.concatenate(
        [pts_s * w[:, None], covs_s.reshape(n, 9) * w[:, None], w[:, None]],
        axis=1,
    )  # [n, 14] = sum_pts(4) | sum_covs(9) | count(1)
    pref = jnp.concatenate(
        [jnp.zeros((1, 14), dtype), jnp.cumsum(allc, axis=0)], axis=0
    )  # exclusive boundaries [n+1, 14]
    # end of each run = next run head strictly after this row (or n)
    nxt = jax.lax.cummin(jnp.where(seg_first, pos32, n), reverse=True)
    run_end = jnp.concatenate([nxt[1:], jnp.asarray([n], jnp.int32)])
    u_sum = pref[jnp.where(seg_first, run_end, pos32)] - pref[pos32]
    # (non-head rows give zero rows; only head rows are ever gathered)

    # --- 2. fold existing voxels into the new rows (gather direction) --
    # method="sort": the default binary-search lowering is a sequential
    # while_loop (measured 8-28 ms at these sizes); the sort-based
    # lowering is a single 2-operand sort (~1 ms).
    lo = jnp.searchsorted(vm.keys, k_s, method="sort")
    lo_c = jnp.clip(lo, 0, V - 1)
    exists = seg_first & (vm.keys[lo_c] == k_s)
    old_tab = jnp.concatenate(
        [
            vm.means * vm.counts[:, None],
            vm.covs.reshape(V, 9) * vm.counts[:, None],
            vm.counts[:, None],
        ],
        axis=1,
    )  # [V, 14] un-finalized sums
    u_sum = u_sum + jnp.where(exists[:, None], old_tab[lo_c], 0.0)

    # --- 3. keep masks + one stable merge sort -------------------------
    # old rows matched by the scan live on as folded new rows (stamped
    # with the current counter, like the reference's info.lru refresh)
    posm = jnp.searchsorted(k_s, vm.keys, method="sort")
    posm_c = jnp.clip(posm, 0, n - 1)
    touched = (k_s[posm_c] == vm.keys) & (vm.keys != INVALID_KEY)

    do_clear = nonempty & ((counter % vm.lru_clear_cycle) == 0)
    expired = (vm.lru.astype(jnp.int64) + vm.lru_horizon) < counter.astype(jnp.int64)
    keep_old = (vm.keys != INVALID_KEY) & ~touched & ~(do_clear & expired)
    born_expired = do_clear & (
        (stamp_val.astype(jnp.int64) + vm.lru_horizon) < counter.astype(jnp.int64)
    )
    keep_new = seg_first & ~born_expired

    mk = jnp.concatenate(
        [
            jnp.where(keep_old, vm.keys, INVALID_KEY),
            jnp.where(keep_new, k_s, INVALID_KEY),
        ]
    )
    msrc = jnp.concatenate(
        [jnp.arange(V, dtype=jnp.int32), V + pos32]
    )
    sk, ssrc = jax.lax.sort((mk, msrc), num_keys=1, is_stable=True)
    out_keys = sk[:V]
    g = ssrc[:V]
    empty = out_keys == INVALID_KEY

    # --- 4. fused payload gather + finalize ----------------------------
    ftab = jnp.concatenate([old_tab, u_sum], axis=0)
    rows = ftab[g]
    ltab = jnp.concatenate([vm.lru, jnp.full((n,), stamp_val, jnp.int32)])
    out_lru = jnp.where(empty, 0, ltab[g])
    out_cnt = jnp.where(empty, 0.0, rows[:, 13])
    safe = jnp.maximum(out_cnt, 1.0)
    out_means = jnp.where(empty[:, None], 0.0, rows[:, 0:4]) / safe[:, None]
    out_covs = jnp.where(empty[:, None], 0.0, rows[:, 4:13]).reshape(V, 3, 3) / safe[
        :, None, None
    ]
    total = jnp.sum(keep_old).astype(jnp.int32) + jnp.sum(keep_new).astype(jnp.int32)

    return vm.replace(
        keys=out_keys,
        means=out_means,
        covs=out_covs,
        counts=out_cnt,
        num_voxels=jnp.minimum(total, V),
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
    binary search. Insertion is O(scan): only the incoming scan is
    sorted; it merges into the sorted table via prefix-sum rank
    arithmetic plus one id scatter and one fused payload gather
    (see _ivm_insert).

    Semantics preserved from the reference:
      * per-voxel point cap (default 10, arrival order kept,
        flat_container.hpp:43-58)
      * min-distance dedup (default 0.1 m, flat_container.hpp:24-27):
        EXACT distance test against the voxel's stored occupants; only
        the within-scan (same insert call) check uses a per-voxel
        fine-grid approximation — divergence from the sequential
        reference is bounded in tests/test_voxelmap_oracle.py
      * LRU-horizon voxel eviction (100/10) with the reference's exact
        stamp timing: pre-increment stamps, post-increment eviction test
        (incremental_voxelmap.hpp:63,70,74-86); empty inserts don't
        advance the LRU clock
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

    def set_search_offsets(self, num_offsets: int):
        """Returns a map searching the 1/7/27-voxel neighborhood
        (incremental_voxelmap.hpp:157-186). Static pytree field — using
        the returned map triggers one recompile of dependent programs."""
        return self.replace(num_offsets=int(num_offsets))

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


def _fine_hash(xyz: jax.Array, fine_leaf, coarse_keys: jax.Array) -> jax.Array:
    """Mixed 64-bit hash of (coarse voxel key, fine-grid integer coords).

    Used for the within-scan dedup approximation. Folding the coarse key
    in scopes the dedup cells to a single voxel, matching the reference's
    per-voxel distance check (flat_container.hpp:43-50) even when
    leaf_size is not an integer multiple of the dedup distance. Hash
    collisions at worst drop one extra point — harmless for a dedup
    approximation.
    """
    fc = jnp.floor(xyz / fine_leaf).astype(jnp.int64)
    h = (
        fc[:, 0] * jnp.int64(-7046029254386353131)   # 0x9E3779B97F4A7C15
        + fc[:, 1] * jnp.int64(-4417276706812531889)  # 0xC2B2AE3D27D4EB4F
        + fc[:, 2] * jnp.int64(1609587929392839161)   # 0x165667B19E3779F9
        + coarse_keys * jnp.int64(-8796714831421723037)  # 0x85EBCA77C2B2AE63
    )
    h = h ^ (h >> 29)
    h = h * jnp.int64(-4658895280553007687)  # 0xBF58476D1CE4E5B9
    return h ^ (h >> 32)


@jax.jit
def _ivm_insert(vm: IncrementalVoxelMap, points, normals, covs, num_points):
    """O(scan) incremental-map insert: sort only the incoming scan and
    merge it into the already-sorted flat point table.

    The first implementation re-sorted map+scan (P+n rows) with every
    payload column as a sort operand, twice — O(map·payload) data
    movement per insert (~8 ms at 131k map / 16k scan on a v5e chip).
    TPU scatters serialize per row, so this version is built from sorts,
    gathers, prefix sums and binary searches ONLY: the n scan rows are
    sorted (2-3 small sorts), per-voxel occupancy and the exact dedup
    test come from a C-row window gather at each query's binary-search
    position, and the merge is ONE stable 2-operand sort of
    (key, source-id) over P+n rows followed by one fused payload gather.

    Reference-semantics notes (incremental_voxelmap.hpp:55-92 +
    flat_container.hpp:43-58):
      * dedup against OLD voxel occupants is EXACT: each new point
        gathers its voxel's stored rows and tests real squared
        distances — the reference's min-dist check verbatim. Only the
        within-scan (same-batch) dedup uses the fine-grid approximation,
        scoped per voxel via `_fine_hash`.
      * per-voxel cap admits new points in arrival order until
        occupants + admitted == cell_capacity.
      * every valid point stamps its voxel with the PRE-increment
        counter, even points the cap/dedup rejects (:69-71); the counter
        increments after the scan; clear cycles evict voxels with
        stamp + horizon < counter (:74-79). Empty inserts are no-ops.
      * capacity overflow drops the highest-key merged rows.
    """
    P = vm.capacity
    C = vm.cell_capacity
    n = points.shape[0]
    dtype = vm.points.dtype

    stamp_val = vm.lru_counter  # PRE-increment stamp
    nonempty = num_points > 0
    counter = jnp.where(nonempty, vm.lru_counter + 1, vm.lru_counter)

    inv_leaf = (1.0 / vm.leaf_size).astype(points.dtype)
    new_keys = pack_coords(voxel_coords(points[:, :3], inv_leaf))
    new_keys = jnp.where(jnp.arange(n) < num_points, new_keys, INVALID_KEY)
    pts_new = points.astype(dtype)

    # --- sort scan rows by (key, arrival) ------------------------------
    arrival = jnp.arange(n, dtype=jnp.int32)
    k_s, a_s = jax.lax.sort((new_keys, arrival), num_keys=1, is_stable=True)
    xyz_s = pts_new[a_s, :3]
    valid_new = k_s != INVALID_KEY

    # --- old-occupant window: occupancy count + exact dedup ------------
    # method="sort": see _gvm_insert — the binary-search lowering is a
    # sequential while_loop, ~8 ms at these sizes vs ~1 ms for the sort.
    lo = jnp.searchsorted(vm.point_keys, k_s, method="sort")
    win = lo[:, None] + jnp.arange(C)[None, :]  # voxel runs are <= C rows
    winc = jnp.clip(win, 0, P - 1)
    keycols, nk = _key_bit_cols(vm.point_keys, dtype)
    otab = jnp.concatenate([keycols, vm.points[:, :3]], axis=1)
    orows = otab[winc]  # [n, C, nk+3]
    okeys = _bits_to_key(orows[..., 0:nk])
    in_voxel = (okeys == k_s[:, None]) & (win < P) & valid_new[:, None]
    occ = jnp.sum(in_voxel, axis=-1).astype(jnp.int32)  # old points per voxel

    if vm.min_sq_dist_in_cell > 0.0:
        diff = orows[..., nk:nk + 3] - xyz_s[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(in_voxel, d2, _FAR)
        ok = valid_new & (jnp.min(d2, axis=-1) >= vm.min_sq_dist_in_cell)
        # Within-scan dedup approximation: keep the first arrival per
        # per-voxel fine cell. Sort (hash, arrival) to find run heads,
        # then sort back by position (scatter-free inverse).
        fine_leaf = jnp.sqrt(jnp.asarray(vm.min_sq_dist_in_cell, dtype))
        fh = _fine_hash(xyz_s, fine_leaf, k_s)
        fh = jnp.where(ok, fh, INVALID_KEY)
        pos32 = jnp.arange(n, dtype=jnp.int32)
        fh_s, _, pos_s = jax.lax.sort((fh, a_s, pos32), num_keys=2)
        first = jnp.concatenate(
            [jnp.asarray([True]), fh_s[1:] != fh_s[:-1]]
        ) & (fh_s != INVALID_KEY)
        _, first_b = jax.lax.sort(
            (pos_s, first.astype(jnp.int32)), num_keys=1
        )
        ok = ok & first_b.astype(bool)
    else:
        ok = valid_new

    # --- per-voxel cap: arrival rank among accepted new rows -----------
    pos = jnp.arange(n, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.asarray([INVALID_KEY]), k_s[:-1]])
    seg_first = (k_s != prev) & valid_new
    run_start = jax.lax.cummax(jnp.where(seg_first, pos, -1))
    okf = ok.astype(jnp.int32)
    ex = jnp.cumsum(okf) - okf  # exclusive prefix of accepted rows
    base = ex[jnp.clip(run_start, 0, n - 1)]
    rank = ex - base
    keep_new = ok & (occ + rank < C)

    # --- old rows: stamp refresh + eviction ----------------------------
    posm = jnp.searchsorted(k_s, vm.point_keys, method="sort")
    posm_c = jnp.clip(posm, 0, n - 1)
    touched = (k_s[posm_c] == vm.point_keys) & (vm.point_keys != INVALID_KEY)
    old_stamps = jnp.where(touched, stamp_val, vm.stamps)

    do_clear = nonempty & ((counter % vm.lru_clear_cycle) == 0)
    expired = (
        old_stamps.astype(jnp.int64) + vm.lru_horizon
    ) < counter.astype(jnp.int64)
    keep_old = (vm.point_keys != INVALID_KEY) & ~(do_clear & expired)
    born_expired = do_clear & (
        (stamp_val.astype(jnp.int64) + vm.lru_horizon) < counter.astype(jnp.int64)
    )
    keep_new = keep_new & ~born_expired

    # --- merge: ONE stable (key, src) sort over P+n rows ---------------
    # stable ⇒ equal keys keep input order: old rows (first block, in
    # stored order) precede new rows (arrival order within a voxel) —
    # exactly the reference's sequential arrival semantics.
    mk = jnp.concatenate(
        [
            jnp.where(keep_old, vm.point_keys, INVALID_KEY),
            jnp.where(keep_new, k_s, INVALID_KEY),
        ]
    )
    msrc = jnp.concatenate([jnp.arange(P, dtype=jnp.int32), P + a_s])
    sk, ssrc = jax.lax.sort((mk, msrc), num_keys=1, is_stable=True)
    out_keys = sk[:P]
    g = ssrc[:P]
    empty = out_keys == INVALID_KEY

    # --- fused payload gather ------------------------------------------
    # new-side tables are in ORIGINAL arrival frame (src = P + a_s)
    stab = jnp.concatenate([old_stamps, jnp.full((n,), stamp_val, jnp.int32)])
    out_stamps = jnp.where(empty, 0, stab[g])

    fcols = [jnp.concatenate([vm.points, pts_new], axis=0)]
    if vm.normals is not None:
        fcols.append(jnp.concatenate([vm.normals, normals.astype(dtype)], axis=0))
    if vm.covs is not None:
        fcols.append(
            jnp.concatenate(
                [vm.covs.reshape(P, 9), covs.reshape(n, 9).astype(dtype)], axis=0
            )
        )
    rows = jnp.concatenate(fcols, axis=1)[g]
    pad = jnp.asarray([PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], dtype)
    out_points = jnp.where(empty[:, None], pad, rows[:, 0:4])
    off = 4
    out_normals = None
    out_covs = None
    if vm.normals is not None:
        out_normals = jnp.where(empty[:, None], 0.0, rows[:, off:off + 4])
        off += 4
    if vm.covs is not None:
        out_covs = jnp.where(
            empty[:, None], 0.0, rows[:, off:off + 9]
        ).reshape(P, 3, 3)

    prev_o = jnp.concatenate(
        [jnp.asarray([INVALID_KEY], out_keys.dtype), out_keys[:-1]]
    )
    n_vox = jnp.sum((out_keys != prev_o) & ~empty).astype(jnp.int32)
    total = jnp.sum(keep_old).astype(jnp.int32) + jnp.sum(keep_new).astype(jnp.int32)

    return vm.replace(
        point_keys=out_keys,
        points=out_points,
        normals=out_normals,
        covs=out_covs,
        stamps=out_stamps,
        num_points_stored=jnp.minimum(total, P),
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
