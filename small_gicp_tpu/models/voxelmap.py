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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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
    GaussianVoxelMap = IncrementalVoxelMap<GaussianVoxel>. Same
    slot-table design as the IncrementalVoxelMap below: each voxel
    lives at a fixed slot whose fused [mean|cov|count] payload row is
    updated in place (a scan-row scatter-add of per-voxel moment sums),
    and a narrow sorted key→slot directory — rebuilt per insert with one
    [V]-row sort — serves binary-search lookup. Insert payload traffic
    is O(scan); nothing map-sized moves.
    """

    dir_keys: jax.Array  # [V] int64 occupied voxel keys sorted, INVALID pad
    dir_vals: jax.Array  # [V] int32 slot id per directory entry
    vox_keys: jax.Array  # [V] int64 key of the voxel at each slot; INVALID = free
    payload: jax.Array  # [V,14] fused finalized rows: mean(4) | cov(9) | count(1)
    lru: jax.Array  # [V] int32 last-touch stamp per slot
    num_voxels: jax.Array  # scalar int32
    lru_counter: jax.Array  # scalar int32
    leaf_size: jax.Array  # scalar

    # Static configuration (not traced).
    num_offsets: int = struct.field(pytree_node=False, default=1)
    lru_horizon: int = struct.field(pytree_node=False, default=100)
    lru_clear_cycle: int = struct.field(pytree_node=False, default=10)

    @property
    def capacity(self) -> int:
        return self.vox_keys.shape[0]

    # Field views kept from the compact-table era (voxel rows live at
    # slot positions; mask with valid_mask()).
    @property
    def means(self) -> jax.Array:
        return self.payload[:, 0:4]

    @property
    def covs(self) -> jax.Array:
        return self.payload[:, 4:13].reshape(-1, 3, 3)

    @property
    def counts(self) -> jax.Array:
        return self.payload[:, 13]

    # ------------------------------------------------------------------

    @staticmethod
    def empty(
        leaf_size: float,
        capacity: int = 131072,
        dtype=jnp.float32,
        num_offsets: int = 1,
        lru_horizon: int = 100,
        lru_clear_cycle: int = 10,
    ) -> "GaussianVoxelMap":
        v = -(-capacity // 8) * 8  # multiple of 8: mesh shardability
        return GaussianVoxelMap(
            dir_keys=jnp.full((v,), INVALID_KEY, jnp.int64),
            dir_vals=jnp.arange(v, dtype=jnp.int32),
            vox_keys=jnp.full((v,), INVALID_KEY, jnp.int64),
            payload=jnp.zeros((v, 14), dtype),
            lru=jnp.zeros((v,), jnp.int32),
            num_voxels=jnp.asarray(0, jnp.int32),
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


    # Inspection accessors (bindings parity: voxelmap.cpp voxel_points/
    # voxel_covs return only the LIVE voxels, compacted —
    # incremental_voxelmap.hpp:255-291). Host-side; for device-resident
    # views use the raw `means`/`covs` tables with `valid_mask()`.
    def voxel_points(self) -> np.ndarray:
        """[num_voxels, 4] live voxel means (homogeneous), numpy."""
        live = np.asarray(self.valid_mask())
        return np.asarray(self.means)[live]

    def voxel_covs(self) -> np.ndarray:
        """[num_voxels, 3, 3] live voxel covariances, numpy."""
        live = np.asarray(self.valid_mask())
        return np.asarray(self.covs)[live]

    def __len__(self) -> int:
        return int(self.num_voxels)

    def valid_mask(self) -> jax.Array:
        return self.vox_keys != INVALID_KEY


@jax.jit
def _gvm_insert(vm: GaussianVoxelMap, points, covs, num_points) -> GaussianVoxelMap:
    """O(scan) slot-table Gaussian-map insert: voxel rows update in
    place; nothing map-sized moves (the merged-sort predecessor gathered
    the full [V, 14] payload every insert).

      1. sort the scan by voxel key (one n-row sort) and reduce each
         voxel run to moment sums with prefix-sum differences,
      2. directory-lookup each run; for existing voxels GATHER the old
         slot's row, un-finalize (row * count), add the run sums, and
         re-finalize — gaussian_voxelmap.hpp:33-53 as running sums,
      3. refresh stamps of hit slots and evict expired voxels (freeing
         their slots for this very insert),
      4. allocate free slots to new voxels in ascending-key order,
      5. scatter the finalized rows at their slots (head rows only — a
         scan-sized scatter), and
      6. re-sort the [V]-row directory.

    LRU semantics match the reference exactly: every voxel receiving
    points this insert is stamped with the PRE-increment counter
    (incremental_voxelmap.hpp:63,70), the counter increments after the
    scan, and eviction on clear cycles drops voxels with
    stamp + horizon < counter (:74-79) — uniformly covering voxels born
    this call. Empty inserts (padding frames in the jitted odometry
    scan) are full no-ops and do not advance the clock.

    Slot exhaustion drops NEW voxels from the highest-key end; existing
    voxels are untouched (same documented policy as IncrementalVoxelMap).
    """
    V = vm.capacity
    n = points.shape[0]
    dtype = vm.payload.dtype
    imax = jnp.iinfo(jnp.int32).max

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
    # The prefix runs over the WHOLE scan (~1e6 magnitude at 100 m
    # coordinates x 16k points), so an f32 cumsum would put ~0.1 m of
    # rounding into every run difference — accumulate in f64 (x64 is
    # always enabled by the package) and round once after the subtract.
    pref = jnp.concatenate(
        [
            jnp.zeros((1, 14), jnp.float64),
            jnp.cumsum(allc.astype(jnp.float64), axis=0),
        ],
        axis=0,
    )  # exclusive boundaries [n+1, 14]
    # end of each run = next run head strictly after this row (or n)
    nxt = jax.lax.cummin(jnp.where(seg_first, pos32, n), reverse=True)
    run_end = jnp.concatenate([nxt[1:], jnp.asarray([n], jnp.int32)])
    u_sum = (pref[jnp.where(seg_first, run_end, pos32)] - pref[pos32]).astype(dtype)
    # (non-head rows give zero rows; only head rows are ever gathered)

    # --- 2. fold existing voxels into the run sums ---------------------
    # method="sort": the default binary-search lowering is a sequential
    # while_loop (measured 8-28 ms at these sizes); the sort-based
    # lowering is a single 2-operand sort (~1 ms).
    lo = jnp.searchsorted(vm.dir_keys, k_s, method="sort")
    lo_c = jnp.clip(lo, 0, V - 1)
    hit = (vm.dir_keys[lo_c] == k_s) & valid
    slot_hit = jnp.where(hit, vm.dir_vals[lo_c], 0)
    orow = vm.payload[slot_hit]  # [n, 14] finalized old rows
    old_unfin = orow[:, 0:13] * orow[:, 13:14]
    u_sum = u_sum + jnp.where(
        (hit & seg_first)[:, None],
        jnp.concatenate([old_unfin, orow[:, 13:14]], axis=1),
        0.0,
    )

    # --- 3. LRU eviction BEFORE allocation -----------------------------
    # The reference inserts into an unbounded hash table and then
    # flushes expired voxels (incremental_voxelmap.hpp:74-79); with
    # bounded slots the same net effect requires freeing expired slots
    # FIRST, so a full map never drops the scan that triggers the flush.
    # Voxels hit by this scan refresh their stamp to the pre-increment
    # counter and can therefore never expire (horizon >= 1) — the kill
    # set is identical to a post-insert flush.
    hslot = jnp.where(hit & seg_first, slot_hit, V)
    lru = vm.lru.at[hslot].set(
        jnp.full((n,), stamp_val, jnp.int32), mode="drop"
    )
    do_clear = nonempty & ((counter % vm.lru_clear_cycle) == 0)
    expired = (lru.astype(jnp.int64) + vm.lru_horizon) < counter.astype(jnp.int64)
    kill = do_clear & expired & (vm.vox_keys != INVALID_KEY)
    vox_keys0 = jnp.where(kill, INVALID_KEY, vm.vox_keys)

    # --- 4. allocate free slots to new voxels (ascending-key order) ----
    new_head = seg_first & ~hit
    free = vox_keys0 == INVALID_KEY
    fslot = jnp.where(free, jnp.arange(V, dtype=jnp.int32), imax)
    fsorted = jax.lax.sort(fslot)
    nh = new_head.astype(jnp.int32)
    r = jnp.cumsum(nh) - nh
    num_free = jnp.sum(free).astype(jnp.int32)
    cand = fsorted[jnp.clip(r, 0, V - 1)]
    alloc = jnp.where(new_head & (r < num_free) & (cand != imax), cand, V)
    slot_all = jnp.where(hit, slot_hit, alloc)
    write_head = seg_first & (slot_all < V)

    # --- 5. finalize + scatter head rows; directory rebuild ------------
    cnt = jnp.maximum(u_sum[:, 13:14], 1.0)
    fin = jnp.concatenate([u_sum[:, 0:13] / cnt, u_sum[:, 13:14]], axis=1)
    tslot = jnp.where(write_head, slot_all, V)
    payload = vm.payload.at[tslot].set(fin, mode="drop")
    vox_keys = vox_keys0.at[tslot].set(k_s, mode="drop")
    lru = lru.at[tslot].set(
        jnp.full((n,), stamp_val, jnp.int32), mode="drop"
    )
    occupied = vox_keys != INVALID_KEY

    dk, dv = jax.lax.sort(
        (vox_keys, jnp.arange(V, dtype=jnp.int32)), num_keys=1
    )

    return vm.replace(
        dir_keys=dk,
        dir_vals=dv,
        vox_keys=vox_keys,
        payload=payload,
        lru=lru,
        num_voxels=jnp.sum(occupied).astype(jnp.int32),
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

    # method="sort": the default binary-search lowering does ~17
    # sequential gather steps; the sort-based lowering is ~9x faster on
    # TPU for large query batches.
    pos = jnp.searchsorted(
        vm.dir_keys, cand_keys.reshape(-1), method="sort"
    ).reshape(q, -1)
    pos = jnp.clip(pos, 0, cap - 1)

    # ONE fused [V, 3]-i32 directory gather (key bits + slot bits), then
    # a [Q,K,3] mean gather at the slots. (Folding the 9 covariance
    # columns into the query-side gather measures 8x SLOWER — the wide
    # [Q,K,14] gather hits a bad XLA path — so payload gathers stay in
    # the caller.) The carrier MUST be an integer type: routing the bit
    # patterns through float32 flushes denormal patterns (any value
    # < 2^23, i.e. every slot id) to zero on TPU (FTZ), silently
    # emptying the map — CPU has no FTZ, so only chip runs see it.
    dtable = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(vm.dir_keys, jnp.int32),
            vm.dir_vals[:, None],
        ],
        axis=1,
    )
    drows = dtable[pos]  # [Q,K,3] int32
    gkeys = jax.lax.bitcast_convert_type(drows[..., 0:2], jnp.int64)
    slot = drows[..., 2]
    found = (gkeys == cand_keys) & (cand_keys != INVALID_KEY)
    slot = jnp.where(found, slot, 0)

    mu = vm.payload[:, 0:3][slot].astype(query_xyz.dtype)  # [Q,K,3]
    diff = mu - query_xyz[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(found, d2, _FAR)

    best = jnp.argmin(d2, axis=-1)  # [Q]
    rows = jnp.arange(q)
    return d2[rows, best], slot[rows, best], found[rows, best]


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


def ivm_as_cloud(vm: "IncrementalVoxelMap") -> PointCloud:
    """Expose an incremental map's stored points (+covs) as a point
    cloud: the IVM analog of voxelmap_as_cloud / the reference's
    SequentialVoxelMapAccessor. Dead/stale slot rows get sentinel
    coords, so distance-masked consumers (NN, registration rejector)
    never select them; `num_points` carries the live count (rows are
    scattered, not compacted — address with the sentinel mask)."""
    pad = jnp.asarray(
        [PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], vm.payload.dtype
    )
    live = vm.valid_points_mask()
    return PointCloud(
        points=jnp.where(live[:, None], vm.points_flat(), pad),
        num_points=vm.num_points_stored,
        normals=vm.normals_flat(),
        covs=vm.covs_flat(),
    )


# ======================================================================
# Incremental voxel map (scan-to-model): linear-iVox equivalent
# ======================================================================


@struct.dataclass
class IncrementalVoxelMap:
    """Incremental scan-to-model voxel map (pytree).

    TPU equivalent of IncrementalVoxelMap<FlatContainer<...>>
    (ann/incremental_voxelmap.hpp:38-203 + ann/flat_container.hpp:20-154,
    i.e. "linear iVox" from Faster-LIO). The CPU design is a hash table
    into per-voxel point buckets; the TPU design is a **voxel-slot
    table**: voxel slot v permanently owns payload rows
    [v*C, (v+1)*C) — rows NEVER move once written — and a narrow sorted
    **directory** (voxel key → slot, occupancy) is rebuilt per insert.
    Lookup is binary search in the directory; insertion touches only
    scan-sized data (one small sort + one scan-row scatter) plus a
    V-row directory re-sort, making insert O(scan) in payload traffic
    instead of O(map) (the previous flat-sorted-table design moved the
    whole [P, 17-column] payload through a gather every insert — ~24 ms
    at 786k rows on a v5e chip; this design moves none of it).

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

    `capacity` sets the default number of voxel slots V (rounded up to
    a multiple of 8 for mesh shardability); stored points are bounded by
    V*cell_capacity. Pass `voxel_capacity` to decouple the two — a
    smaller V shrinks the per-lookup directory search and the per-insert
    directory re-sort (both O(V)), at the cost of capping live voxels.
    Overflow (no reference analog — its maps are unbounded hash tables)
    drops NEW voxels in descending key order once all slots are taken;
    existing voxels are unaffected.
    """

    # Directory: occupied voxel keys sorted ascending (INVALID_KEY pad),
    # rebuilt by every insert; the binary-search target of all lookups.
    dir_keys: jax.Array  # [V] int64
    dir_vals: jax.Array  # [V] int32 (slot << 8) | occupancy
    # Slot table: per-slot state + payload rows pinned at slot*C..slot*C+C-1.
    vox_keys: jax.Array  # [V] int64 key of the voxel at each slot; INVALID = free
    occ: jax.Array  # [V] int32 stored points per slot
    stamps: jax.Array  # [V] int32 LRU stamp per slot
    payload: jax.Array  # [V*C, D] fused rows: point(4) | normal(4)? | cov(9)?
    num_points_stored: jax.Array  # scalar int32
    num_voxels: jax.Array  # scalar int32
    lru_counter: jax.Array  # scalar int32
    leaf_size: jax.Array  # scalar

    has_normals: bool = struct.field(pytree_node=False, default=False)
    has_covs: bool = struct.field(pytree_node=False, default=False)
    cell_capacity: int = struct.field(pytree_node=False, default=10)
    num_offsets: int = struct.field(pytree_node=False, default=1)
    lru_horizon: int = struct.field(pytree_node=False, default=100)
    lru_clear_cycle: int = struct.field(pytree_node=False, default=10)
    min_sq_dist_in_cell: float = struct.field(pytree_node=False, default=0.01)

    @property
    def voxel_capacity(self) -> int:
        return self.vox_keys.shape[0]

    @property
    def capacity(self) -> int:
        """Payload-row capacity (max stored points = V * cell_capacity)."""
        return self.payload.shape[0]

    @property
    def point_keys(self) -> jax.Array:
        """Per-payload-row voxel key view (INVALID_KEY on unused rows).
        Computed from the slot table; kept for the flat-table-era
        interface (tests, interop)."""
        keys = jnp.repeat(self.vox_keys, self.cell_capacity)
        return jnp.where(self.valid_points_mask(), keys, INVALID_KEY)

    @staticmethod
    def empty(
        leaf_size: float,
        capacity: int = 131072,
        dtype=jnp.float32,
        has_normals: bool = False,
        has_covs: bool = False,
        cell_capacity: int = 10,
        num_offsets: int = 1,
        lru_horizon: int = 100,
        lru_clear_cycle: int = 10,
        min_sq_dist_in_cell: float = 0.01,
        voxel_capacity: Optional[int] = None,
    ) -> "IncrementalVoxelMap":
        if not (0 < cell_capacity < 256):
            raise ValueError("cell_capacity must be in [1, 255] "
                             "(packed with the slot id in the directory)")
        v = voxel_capacity if voxel_capacity is not None else capacity
        v = -(-v // 8) * 8  # multiple of 8: shardable over small meshes
        if v >= (1 << 23):
            raise ValueError(
                f"voxel_capacity {v} exceeds 2^23 slots (the directory "
                "packs (slot << 8) | occupancy into int32)"
            )
        d = 4 + (4 if has_normals else 0) + (9 if has_covs else 0)
        pad_row = jnp.concatenate(
            [
                jnp.asarray([PAD_SENTINEL, PAD_SENTINEL, PAD_SENTINEL, 0.0], dtype),
                jnp.zeros((d - 4,), dtype),
            ]
        )
        return IncrementalVoxelMap(
            dir_keys=jnp.full((v,), INVALID_KEY, jnp.int64),
            dir_vals=(jnp.arange(v, dtype=jnp.int32) << 8),
            vox_keys=jnp.full((v,), INVALID_KEY, jnp.int64),
            occ=jnp.zeros((v,), jnp.int32),
            stamps=jnp.zeros((v,), jnp.int32),
            payload=jnp.broadcast_to(pad_row, (v * cell_capacity, d)).copy(),
            num_points_stored=jnp.asarray(0, jnp.int32),
            num_voxels=jnp.asarray(0, jnp.int32),
            lru_counter=jnp.asarray(0, jnp.int32),
            leaf_size=jnp.asarray(leaf_size, dtype),
            has_normals=has_normals,
            has_covs=has_covs,
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
        dtype = self.payload.dtype
        points = cloud.points.astype(dtype)
        T = jnp.eye(4, dtype=dtype) if T is None else jnp.asarray(T, dtype)
        normals = cloud.normals
        covs = cloud.covs
        if self.has_normals:
            if normals is None:
                normals = jnp.zeros((cloud.capacity, 4), dtype)
            normals = normals.astype(dtype) @ T.T
        else:
            normals = None
        if self.has_covs:
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
    # incremental_voxelmap.hpp:255-291); rows live at fixed slot
    # positions — use valid_points_mask() / the kNN flat indices to
    # address live rows (knn only ever returns live rows).
    def points_flat(self) -> jax.Array:
        return self.payload[:, :4]

    def normals_flat(self) -> Optional[jax.Array]:
        if not self.has_normals:
            return None
        return self.payload[:, 4:8]

    def covs_flat(self) -> Optional[jax.Array]:
        if not self.has_covs:
            return None
        off = 8 if self.has_normals else 4
        return self.payload[:, off:off + 9].reshape(-1, 3, 3)

    def size(self) -> jax.Array:
        """Number of occupied voxels (reference contract:
        incremental_voxelmap.hpp:49 / voxelmap.cpp size binding —
        `size()` counts VOXELS; use num_points() for stored points)."""
        return self.num_voxels

    def num_points(self) -> jax.Array:
        """Total number of stored points across all voxels."""
        return self.num_points_stored

    def __len__(self) -> int:
        return int(self.num_voxels)

    def valid_points_mask(self) -> jax.Array:
        c = self.cell_capacity
        j = jnp.arange(self.capacity, dtype=jnp.int32) % c
        return j < jnp.repeat(self.occ, c)

    # Inspection accessors (bindings parity: voxelmap.cpp voxel_points/
    # voxel_normals/voxel_covs — live points only, compacted; reference
    # traits extraction incremental_voxelmap.hpp:255-291). Host-side
    # numpy; device code uses points_flat()/valid_points_mask().
    def voxel_points(self) -> np.ndarray:
        """[num_points, 4] stored points (homogeneous), numpy."""
        live = np.asarray(self.valid_points_mask())
        return np.asarray(self.points_flat())[live]

    def voxel_normals(self) -> Optional[np.ndarray]:
        """[num_points, 4] stored normals, or None (no-normal payload)."""
        if not self.has_normals:
            return None
        live = np.asarray(self.valid_points_mask())
        return np.asarray(self.normals_flat())[live]

    def voxel_covs(self) -> Optional[np.ndarray]:
        """[num_points, 3, 3] stored covariances, or None."""
        if not self.has_covs:
            return None
        live = np.asarray(self.valid_points_mask())
        return np.asarray(self.covs_flat())[live]


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
    """O(scan) slot-table insert: payload rows never move.

    The flat-sorted-table predecessor moved the WHOLE map payload
    through one [P+n, 17-column] gather per insert (~24 ms of the 34 ms
    insert at 786k rows on a v5e chip). Here the only O(map) work is a
    [V]-row directory re-sort (V = P/C slots of (int64, int32) — ~0.5 ms
    at 100k slots); everything payload-sized is scan-sized:
      1. sort the scan by (voxel key, arrival) — one n-row sort,
      2. binary-search the directory for each scan voxel: slot id + old
         occupancy ride in one packed int32,
      3. EXACT dedup against old occupants via a [n, C, 3] window gather
         at slot*C (flat_container.hpp:43-50 verbatim); within-scan
         dedup keeps the fine-grid approximation scoped per voxel,
      4. per-voxel cap by prefix-sum arrival rank,
      5. allocate free slots to new voxels in ascending-key order (one
         V-row int32 sort), and
      6. scatter the accepted rows at slot*C + occupancy + rank — a
         scan-row scatter into pinned rows.

    Reference-semantics notes (incremental_voxelmap.hpp:55-92 +
    flat_container.hpp:43-58):
      * per-voxel cap admits new points in arrival order until
        occupants + admitted == cell_capacity.
      * every valid point stamps its voxel with the PRE-increment
        counter, even points the cap/dedup rejects (:69-71); the counter
        increments after the scan; clear cycles evict voxels with
        stamp + horizon < counter (:74-79) — covering voxels born this
        call. Empty inserts are no-ops.
      * slot exhaustion drops NEW voxels from the highest-key end;
        existing voxels are untouched (documented overflow policy —
        the reference's hash table never overflows).
    """
    V = vm.vox_keys.shape[0]
    C = vm.cell_capacity
    VC = V * C
    n = points.shape[0]
    dtype = vm.payload.dtype
    imax = jnp.iinfo(jnp.int32).max

    stamp_val = vm.lru_counter  # PRE-increment stamp
    nonempty = num_points > 0
    counter = jnp.where(nonempty, vm.lru_counter + 1, vm.lru_counter)

    inv_leaf = (1.0 / vm.leaf_size).astype(points.dtype)
    new_keys = pack_coords(voxel_coords(points[:, :3], inv_leaf))
    new_keys = jnp.where(jnp.arange(n) < num_points, new_keys, INVALID_KEY)

    # --- sort scan rows by (key, arrival); fused payload rows ----------
    arrival = jnp.arange(n, dtype=jnp.int32)
    k_s, a_s = jax.lax.sort((new_keys, arrival), num_keys=1, is_stable=True)
    cols = [points.astype(dtype)]
    if vm.has_normals:
        cols.append(normals.astype(dtype))
    if vm.has_covs:
        cols.append(covs.reshape(n, 9).astype(dtype))
    rows_new = jnp.concatenate(cols, axis=1)[a_s]  # [n, D] sorted order
    xyz_s = rows_new[:, :3]
    valid_new = k_s != INVALID_KEY

    # --- directory lookup: slot + pre-insert occupancy -----------------
    # method="sort": the binary-search lowering is a sequential
    # while_loop (~8 ms at map scale); the sort lowering is ~1 ms.
    lo = jnp.searchsorted(vm.dir_keys, k_s, method="sort")
    lo_c = jnp.clip(lo, 0, V - 1)
    hit = (vm.dir_keys[lo_c] == k_s) & valid_new
    dval = vm.dir_vals[lo_c]
    slot_hit = jnp.where(hit, dval >> 8, 0)
    occ_base = jnp.where(hit, dval & 0xFF, 0)

    # --- exact dedup against old occupants (window gather at the slot) -
    if vm.min_sq_dist_in_cell > 0.0:
        win = jnp.clip(
            slot_hit[:, None] * C + jnp.arange(C)[None, :], 0, VC - 1
        )
        oxyz = vm.payload[:, :3][win]  # [n, C, 3]
        in_vox = hit[:, None] & (jnp.arange(C)[None, :] < occ_base[:, None])
        diff = oxyz - xyz_s[:, None, :]
        d2 = jnp.where(in_vox, jnp.sum(diff * diff, axis=-1), _FAR)
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
    rs = jnp.clip(run_start, 0, n - 1)
    okf = ok.astype(jnp.int32)
    ex = jnp.cumsum(okf) - okf  # exclusive prefix of accepted rows
    rank = ex - ex[rs]
    keep_new = ok & (occ_base + rank < C)

    # --- LRU eviction BEFORE allocation ---------------------------------
    # The reference inserts into an unbounded hash table and then
    # flushes expired voxels (incremental_voxelmap.hpp:74-79); with
    # bounded slots the same net effect requires freeing expired slots
    # FIRST, so a full map never drops the scan that triggers the flush.
    # Every voxel receiving scan keys this insert (even keys whose
    # points the dedup/cap rejects, :69-71) refreshes its stamp to the
    # pre-increment counter and can therefore never expire
    # (horizon >= 1) — the kill set is identical to a post-insert flush.
    hslot = jnp.where(hit & seg_first, slot_hit, V)
    stamps = vm.stamps.at[hslot].set(
        jnp.full((n,), stamp_val, jnp.int32), mode="drop"
    )
    do_clear = nonempty & ((counter % vm.lru_clear_cycle) == 0)
    expired = (
        stamps.astype(jnp.int64) + vm.lru_horizon
    ) < counter.astype(jnp.int64)
    kill = do_clear & expired & (vm.vox_keys != INVALID_KEY)
    vox_keys0 = jnp.where(kill, INVALID_KEY, vm.vox_keys)
    occ0 = jnp.where(kill, 0, vm.occ)

    # --- allocate free slots to new voxels (ascending-key order) -------
    new_head = seg_first & ~hit
    free = vox_keys0 == INVALID_KEY
    fslot = jnp.where(free, jnp.arange(V, dtype=jnp.int32), imax)
    fsorted = jax.lax.sort(fslot)  # free slot ids ascending, imax tail
    nh = new_head.astype(jnp.int32)
    r = jnp.cumsum(nh) - nh  # exclusive rank among new voxels
    num_free = jnp.sum(free).astype(jnp.int32)
    cand = fsorted[jnp.clip(r, 0, V - 1)]
    # r < num_free guards the all-free case where fsorted has no imax
    # sentinel and a clipped rank would collide on the last slot.
    alloc_head = jnp.where(new_head & (r < num_free) & (cand != imax), cand, V)
    slot_all = jnp.where(hit, slot_hit, alloc_head[rs])
    keep_new = keep_new & (slot_all < V)

    # --- scatter accepted rows into their pinned payload rows ----------
    dst = jnp.where(keep_new, slot_all * C + occ_base + rank, VC)
    payload = vm.payload.at[dst].set(rows_new, mode="drop")

    # --- per-run added count at the head row ---------------------------
    kf = keep_new.astype(jnp.int32)
    ck = jnp.cumsum(kf)
    nxt = jax.lax.cummin(jnp.where(seg_first, pos, n), reverse=True)
    run_end = jnp.concatenate([nxt[1:], jnp.asarray([n], jnp.int32)])
    added = ck[jnp.maximum(run_end - 1, 0)] - (ck - kf)

    # --- slot metadata updates (head rows hit unique slots) ------------
    touched_head = seg_first & (slot_all < V)
    tslot = jnp.where(touched_head, slot_all, V)
    vox_keys = vox_keys0.at[tslot].set(k_s, mode="drop")
    occ_new = occ0.at[tslot].set(occ_base + added, mode="drop")
    stamps = stamps.at[tslot].set(
        jnp.full((n,), stamp_val, jnp.int32), mode="drop"
    )
    occupied = vox_keys != INVALID_KEY

    # --- rebuild the directory: ONE V-row (key, packed val) sort -------
    dvals = (jnp.arange(V, dtype=jnp.int32) << 8) | occ_new
    dk, dv = jax.lax.sort((vox_keys, dvals), num_keys=1)

    return vm.replace(
        dir_keys=dk,
        dir_vals=dv,
        vox_keys=vox_keys,
        occ=occ_new,
        stamps=stamps,
        payload=payload,
        num_points_stored=jnp.sum(occ_new).astype(jnp.int32),
        num_voxels=jnp.sum(occupied).astype(jnp.int32),
        lru_counter=counter,
    )



@partial(jax.jit, static_argnames=("k",))
def _ivm_knn(vm: IncrementalVoxelMap, query_xyz, k: int):
    V = vm.vox_keys.shape[0]
    C = vm.cell_capacity
    q = query_xyz.shape[0]
    offsets = neighbor_offsets(vm.num_offsets)  # [K,3]
    K = offsets.shape[0]

    inv_leaf = (1.0 / vm.leaf_size).astype(query_xyz.dtype)
    center = voxel_coords(query_xyz, inv_leaf)
    cand_keys = pack_coords(center[:, None, :] + offsets[None, :, :])  # [Q,K]

    # Directory binary search over V entries (NOT the P = V*C point
    # rows — at C=10 this makes the dominant searchsorted sort 10x
    # smaller than the flat-table design). method="sort": see _gvm_nn.
    pos = jnp.searchsorted(
        vm.dir_keys, cand_keys.reshape(-1), method="sort"
    ).reshape(q, K)
    pos = jnp.clip(pos, 0, V - 1)

    # One fused [V, 3]-i32 directory gather: key bits (2 cols) + packed
    # (slot, occupancy) bits (1 col); per-row gather cost dominates, so
    # the three lookups share one row. Integer carrier, NOT float32:
    # f32 routing flushes denormal bit patterns (every (slot<<8)|occ
    # value < 2^23, and key low-halves) to zero on TPU — see _gvm_nn.
    dtable = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(vm.dir_keys, jnp.int32),
            vm.dir_vals[:, None],
        ],
        axis=1,
    )
    drows = dtable[pos]  # [Q,K,3] int32
    gkeys = jax.lax.bitcast_convert_type(drows[..., 0:2], jnp.int64)
    dval = drows[..., 2]
    found = (gkeys == cand_keys) & (cand_keys != INVALID_KEY)
    slot = jnp.where(found, dval >> 8, 0)
    occv = jnp.where(found, dval & 0xFF, 0)

    # Payload window at the voxel's pinned rows; validity = row index
    # within occupancy (no key re-check needed — slots are exact).
    idx = slot[:, :, None] * C + jnp.arange(C)[None, None, :]  # [Q,K,C]
    usable = jnp.arange(C)[None, None, :] < occv[:, :, None]

    cand_pts = vm.payload[:, :3][idx]  # [Q,K,C,3]
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
