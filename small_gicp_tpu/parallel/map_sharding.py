"""Map-block sharding: voxel maps distributed across a device mesh.

SURVEY.md §2/§5 scale-out piece: for maps too large for one chip's HBM
(city-scale scan-to-model), the map's voxel axis is sharded across the
mesh. Keys are globally sorted, so contiguous shards hold disjoint key
ranges; a batched NN query runs on every shard against its local block
(same binary-search + window-gather kernel as single-chip) and the
per-shard winners are combined with two tiny collectives (min + argmin
over the mesh axis) — the query set is replicated, only 2x[Q] floats
cross ICI.

A voxel run straddling a shard boundary is covered jointly: the left
shard scans until its block ends, the right shard's binary search lands
on the continuation rows; the cross-shard min picks the true winner.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # moved to jax.shard_map in newer JAX
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from small_gicp_tpu.models.voxelmap import GaussianVoxelMap, IncrementalVoxelMap
from small_gicp_tpu.ops.voxel_keys import (
    INVALID_KEY,
    neighbor_offsets,
    pack_coords,
    voxel_coords,
)

_FAR = 1.0e18
_IMAX = jnp.iinfo(jnp.int32).max


def shard_gaussian_voxelmap(vm: GaussianVoxelMap, mesh: Mesh) -> GaussianVoxelMap:
    """Place the voxel axis of a GaussianVoxelMap across the mesh's first
    axis (scalars replicated)."""
    axis = mesh.axis_names[0]
    vox = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == vm.capacity:
            return jax.device_put(x, vox)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, vm)


def shard_incremental_voxelmap(vm: IncrementalVoxelMap, mesh: Mesh) -> IncrementalVoxelMap:
    """Place the point axis of an IncrementalVoxelMap across the mesh."""
    axis = mesh.axis_names[0]
    rows = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == vm.capacity:
            return jax.device_put(x, rows)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, vm)


def _combine_across_shards(axis: str, d2, idx):
    """Cross-shard argmin: [Q] local bests -> [Q] global bests."""
    gmin = jax.lax.pmin(d2, axis)
    cand = jnp.where(d2 <= gmin, idx, _IMAX)
    gidx = jax.lax.pmin(cand, axis)
    return gmin, gidx


def sharded_gvm_nn(
    vm: GaussianVoxelMap, query_xyz: jax.Array, mesh: Mesh
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """NN over a voxel-axis-sharded GaussianVoxelMap.

    Returns (sq_dists [Q], GLOBAL voxel idx [Q], found [Q]); results are
    identical to the single-device vm.nearest_neighbor_search.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    local_v = vm.capacity // n_dev
    offsets = neighbor_offsets(vm.num_offsets)

    def local(keys, means, leaf, q):
        shard_id = jax.lax.axis_index(axis)
        inv_leaf = (1.0 / leaf).astype(q.dtype)
        cand_keys = pack_coords(
            voxel_coords(q, inv_leaf)[:, None, :] + offsets[None, :, :]
        )  # [Q,K]
        pos = jnp.clip(
            jnp.searchsorted(keys, cand_keys.reshape(-1), method="sort"),
            0,
            local_v - 1,
        ).reshape(q.shape[0], -1)
        found = (keys[pos] == cand_keys) & (cand_keys != INVALID_KEY)
        mu = means[pos][..., :3]
        diff = mu - q[:, None, :]
        d2 = jnp.where(found, jnp.sum(diff * diff, axis=-1), _FAR)
        best = jnp.argmin(d2, axis=-1)
        rows = jnp.arange(q.shape[0])
        bd = d2[rows, best]
        bidx = (pos[rows, best] + shard_id * local_v).astype(jnp.int32)
        bidx = jnp.where(bd < _FAR, bidx, _IMAX)
        return _combine_across_shards(axis, bd, bidx)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
    )
    d2, idx = fn(vm.keys, vm.means, vm.leaf_size, query_xyz)
    found = d2 < _FAR
    return d2, jnp.where(found, idx, 0), found


def sharded_ivm_nn(
    vm: IncrementalVoxelMap, query_xyz: jax.Array, mesh: Mesh
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """NN over a point-axis-sharded IncrementalVoxelMap (global flat
    point indices returned)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    local_p = vm.capacity // n_dev
    C = vm.cell_capacity
    offsets = neighbor_offsets(vm.num_offsets)

    def local(point_keys, points, leaf, q):
        shard_id = jax.lax.axis_index(axis)
        nq = q.shape[0]
        inv_leaf = (1.0 / leaf).astype(q.dtype)
        cand_keys = pack_coords(
            voxel_coords(q, inv_leaf)[:, None, :] + offsets[None, :, :]
        )  # [Q,K]
        start = jnp.searchsorted(
            point_keys, cand_keys.reshape(-1), method="sort"
        ).reshape(nq, -1)
        idx = jnp.clip(
            start[:, :, None] + jnp.arange(C)[None, None, :], 0, local_p - 1
        )
        gkeys = point_keys[idx]
        usable = (gkeys == cand_keys[:, :, None]) & (
            cand_keys != INVALID_KEY
        )[:, :, None]
        pts = points[idx][..., :3]
        diff = pts - q[:, None, None, :]
        d2 = jnp.where(usable, jnp.sum(diff * diff, axis=-1), _FAR)
        d2 = d2.reshape(nq, -1)
        flat = idx.reshape(nq, -1)
        best = jnp.argmin(d2, axis=-1)
        rows = jnp.arange(nq)
        bd = d2[rows, best]
        bidx = (flat[rows, best] + shard_id * local_p).astype(jnp.int32)
        bidx = jnp.where(bd < _FAR, bidx, _IMAX)
        return _combine_across_shards(axis, bd, bidx)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
    )
    d2, idx = fn(vm.point_keys, vm.points, vm.leaf_size, query_xyz)
    found = d2 < _FAR
    return d2, jnp.where(found, idx, 0), found
