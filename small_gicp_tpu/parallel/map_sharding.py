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
from flax import struct
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
    """Place the voxel-slot axis of a GaussianVoxelMap across the mesh's
    first axis (scalars replicated). Sharded search rebuilds shard-local
    directories from the slot keys, so the row-split of the globally
    sorted directory is harmless."""
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
    """Place the voxel-slot axis of an IncrementalVoxelMap across the
    mesh: slot arrays ([V]) and the pinned payload rows ([V*C]) split
    into contiguous slot blocks; scalars replicated. The globally sorted
    directory is row-split too but sharded search ignores it — each
    shard builds a directory over its LOCAL slots (see sharded_ivm_nn)."""
    axis = mesh.axis_names[0]
    rows = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    v = vm.vox_keys.shape[0]

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] in (v, vm.capacity):
            return jax.device_put(x, rows)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, vm)


def _combine_across_shards(axis: str, d2, idx):
    """Cross-shard argmin: [Q] local bests -> [Q] global bests."""
    gmin = jax.lax.pmin(d2, axis)
    cand = jnp.where(d2 <= gmin, idx, _IMAX)
    gidx = jax.lax.pmin(cand, axis)
    return gmin, gidx


def _local_gvm_search(vox_keys, payload, leaf, q, offsets):
    """Shard-local GVM NN: build a directory over the LOCAL slots (one
    [V_local]-row sort) and search it like the single-device kernel.
    Returns (d2 [Q,K], local slot [Q,K], found [Q,K])."""
    local_v = vox_keys.shape[0]
    nq = q.shape[0]
    dk, dv = jax.lax.sort(
        (vox_keys, jnp.arange(local_v, dtype=jnp.int32)), num_keys=1
    )
    inv_leaf = (1.0 / leaf).astype(q.dtype)
    cand_keys = pack_coords(
        voxel_coords(q, inv_leaf)[:, None, :] + offsets[None, :, :]
    )  # [Q,K]
    pos = jnp.clip(
        jnp.searchsorted(dk, cand_keys.reshape(-1), method="sort"),
        0,
        local_v - 1,
    ).reshape(nq, -1)
    found = (dk[pos] == cand_keys) & (cand_keys != INVALID_KEY)
    slot = jnp.where(found, dv[pos], 0)
    mu = payload[:, 0:3][slot]
    diff = mu - q[:, None, :]
    d2 = jnp.where(found, jnp.sum(diff * diff, axis=-1), _FAR)
    return d2, slot, found


def sharded_gvm_nn(
    vm: GaussianVoxelMap, query_xyz: jax.Array, mesh: Mesh
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """NN over a slot-axis-sharded GaussianVoxelMap.

    Returns (sq_dists [Q], GLOBAL voxel slot [Q], found [Q]); results
    are identical to the single-device vm.nearest_neighbor_search.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    local_v = vm.capacity // n_dev
    offsets = neighbor_offsets(vm.num_offsets)

    def local(vox_keys, payload, leaf, q):
        shard_id = jax.lax.axis_index(axis)
        d2, slot, _ = _local_gvm_search(vox_keys, payload, leaf, q, offsets)
        best = jnp.argmin(d2, axis=-1)
        rows = jnp.arange(q.shape[0])
        bd = d2[rows, best]
        bidx = (slot[rows, best] + shard_id * local_v).astype(jnp.int32)
        bidx = jnp.where(bd < _FAR, bidx, _IMAX)
        return _combine_across_shards(axis, bd, bidx)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
    )
    d2, idx = fn(vm.vox_keys, vm.payload, vm.leaf_size, query_xyz)
    found = d2 < _FAR
    return d2, jnp.where(found, idx, 0), found


def _local_ivm_search(vox_keys, occ, payload, leaf, q, C, offsets):
    """Shard-local IVM NN: build a directory over the LOCAL slots (one
    [V_local]-row sort — the slot blocks are disjoint, so the union of
    the local directories covers the map) and search it exactly like the
    single-device kernel. Returns (d2 [Q, K*C], local flat idx)."""
    local_v = vox_keys.shape[0]
    nq = q.shape[0]
    slot32 = jnp.arange(local_v, dtype=jnp.int32)
    dk, dv = jax.lax.sort((vox_keys, (slot32 << 8) | occ), num_keys=1)
    inv_leaf = (1.0 / leaf).astype(q.dtype)
    cand_keys = pack_coords(
        voxel_coords(q, inv_leaf)[:, None, :] + offsets[None, :, :]
    )  # [Q,K]
    pos = jnp.clip(
        jnp.searchsorted(dk, cand_keys.reshape(-1), method="sort"),
        0,
        local_v - 1,
    ).reshape(nq, -1)
    found = (dk[pos] == cand_keys) & (cand_keys != INVALID_KEY)
    dval = dv[pos]
    slot = jnp.where(found, dval >> 8, 0)
    occv = jnp.where(found, dval & 0xFF, 0)
    idx = slot[:, :, None] * C + jnp.arange(C)[None, None, :]
    usable = jnp.arange(C)[None, None, :] < occv[:, :, None]
    pts = payload[:, :3][idx]
    diff = pts - q[:, None, None, :]
    d2 = jnp.where(usable, jnp.sum(diff * diff, axis=-1), _FAR)
    return d2.reshape(nq, -1), idx.reshape(nq, -1)


def sharded_ivm_nn(
    vm: IncrementalVoxelMap, query_xyz: jax.Array, mesh: Mesh
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """NN over a slot-axis-sharded IncrementalVoxelMap (global flat
    payload-row indices returned, identical numbering to the
    single-device map)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    local_p = vm.capacity // n_dev
    C = vm.cell_capacity
    offsets = neighbor_offsets(vm.num_offsets)

    def local(vox_keys, occ, payload, leaf, q):
        shard_id = jax.lax.axis_index(axis)
        d2, flat = _local_ivm_search(vox_keys, occ, payload, leaf, q, C, offsets)
        best = jnp.argmin(d2, axis=-1)
        rows = jnp.arange(q.shape[0])
        bd = d2[rows, best]
        bidx = (flat[rows, best] + shard_id * local_p).astype(jnp.int32)
        bidx = jnp.where(bd < _FAR, bidx, _IMAX)
        return _combine_across_shards(axis, bd, bidx)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
    )
    d2, idx = fn(vm.vox_keys, vm.occ, vm.payload, vm.leaf_size, query_xyz)
    found = d2 < _FAR
    return d2, jnp.where(found, idx, 0), found


@struct.dataclass
class ShardedVoxelMapTarget:
    """Registration-target wrapper marking a voxel map as mesh-sharded.

    Passing this as the `target` of align_impl routes correspondence
    search through the sharded NN kernels below (the end-to-end
    "voxelmap-as-target" call stack of registration_helper.cpp:136, but
    with the map's row axis living across the mesh). The (H,b,e)
    reduction downstream stays replicated — the collective cost per
    optimizer iteration is the [Q,12] winner-payload psum here plus two
    [Q] pmins, all riding ICI.
    """

    vm: object  # GaussianVoxelMap | IncrementalVoxelMap (pytree)
    mesh: Mesh = struct.field(pytree_node=False)


def sharded_nn_payload(vm, query_xyz: jax.Array, mesh: Mesh):
    """NN + winner payload over a sharded voxel map.

    Returns (sq_dists [Q], found [Q], mu [Q,3], covs [Q,3,3] or None,
    normals [Q,4] or None), bitwise identical to the single-device
    search + payload gather. The winner's payload row is selected inside
    each shard and combined with a masked psum (the global-argmin winner
    is unique, so the sum IS the winner's row).
    """
    if isinstance(vm, GaussianVoxelMap):
        d2, found, pay = _sharded_gvm_nn_payload(vm, query_xyz, mesh)
        mu = pay[:, :3]
        covs = pay[:, 3:12].reshape(-1, 3, 3)
        return d2, found, mu, covs, None
    if isinstance(vm, IncrementalVoxelMap):
        d2, found, pay = _sharded_ivm_nn_payload(vm, query_xyz, mesh)
        mu = pay[:, :3]
        off = 3
        covs = normals = None
        if vm.has_covs:
            covs = pay[:, off:off + 9].reshape(-1, 3, 3)
            off += 9
        if vm.has_normals:
            normals = pay[:, off:off + 4]
        return d2, found, mu, covs, normals
    raise TypeError(f"unsupported sharded map type {type(vm)!r}")


def _sharded_gvm_nn_payload(vm: GaussianVoxelMap, query_xyz, mesh: Mesh):
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    local_v = vm.capacity // n_dev
    offsets = neighbor_offsets(vm.num_offsets)

    def local(vox_keys, payload, leaf, q):
        nq = q.shape[0]
        d2, slot, _ = _local_gvm_search(vox_keys, payload, leaf, q, offsets)
        best = jnp.argmin(d2, axis=-1)
        rows = jnp.arange(nq)
        bd = d2[rows, best]
        slot_b = slot[rows, best]
        shard_id = jax.lax.axis_index(axis)
        bidx = (slot_b + shard_id * local_v).astype(jnp.int32)
        bidx = jnp.where(bd < _FAR, bidx, _IMAX)
        gmin, gidx = _combine_across_shards(axis, bd, bidx)
        prow = payload[slot_b]  # [Q,14] fused winner rows
        pay_cols = jnp.concatenate([prow[:, 0:3], prow[:, 4:13]], axis=1)
        win = (bidx == gidx) & (bd < _FAR)
        pay = jax.lax.psum(jnp.where(win[:, None], pay_cols, 0.0), axis)
        return gmin, pay

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
    )
    d2, pay = fn(vm.vox_keys, vm.payload, vm.leaf_size, query_xyz)
    return d2, d2 < _FAR, pay


def _sharded_ivm_nn_payload(vm: IncrementalVoxelMap, query_xyz, mesh: Mesh):
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    local_p = vm.capacity // n_dev
    C = vm.cell_capacity
    offsets = neighbor_offsets(vm.num_offsets)
    # Winner payload layout: xyz(3) | cov(9)? | normal(4)? — reordered
    # from the map's fused [point|normal|cov] rows to match
    # sharded_nn_payload's unpacking order.
    n_off = 4 if vm.has_normals else None
    c_off = (8 if vm.has_normals else 4) if vm.has_covs else None

    def local(vox_keys, occ, payload, leaf, q):
        nq = q.shape[0]
        d2, flat = _local_ivm_search(vox_keys, occ, payload, leaf, q, C, offsets)
        best = jnp.argmin(d2, axis=-1)
        rows = jnp.arange(nq)
        bd = d2[rows, best]
        row_b = flat[rows, best]
        shard_id = jax.lax.axis_index(axis)
        bidx = (row_b + shard_id * local_p).astype(jnp.int32)
        bidx = jnp.where(bd < _FAR, bidx, _IMAX)
        gmin, gidx = _combine_across_shards(axis, bd, bidx)
        prow = payload[row_b]  # [Q, D] fused winner rows
        cols = [prow[:, :3]]
        if c_off is not None:
            cols.append(prow[:, c_off:c_off + 9])
        if n_off is not None:
            cols.append(prow[:, n_off:n_off + 4])
        pay_cols = jnp.concatenate(cols, axis=1)
        win = (bidx == gidx) & (bd < _FAR)
        pay = jax.lax.psum(jnp.where(win[:, None], pay_cols, 0.0), axis)
        return gmin, pay

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
    )
    d2, pay = fn(vm.vox_keys, vm.occ, vm.payload, vm.leaf_size, query_xyz)
    return d2, d2 < _FAR, pay


def sharded_model_align(vm, source, init_T=None, mesh: Mesh = None, **kwargs):
    """End-to-end registration against a mesh-sharded voxel map.

    Shards the map across `mesh`, wraps it as a ShardedVoxelMapTarget
    and runs the standard Registration engine — correspondence search
    happens shard-locally with two [Q] pmins + one [Q,12] psum per
    optimizer iteration; results match the single-device
    voxelmap-as-target align.
    """
    from small_gicp_tpu.models.registration import Registration

    if mesh is None:
        raise ValueError("sharded_model_align requires a mesh")
    if isinstance(vm, GaussianVoxelMap):
        vm_sharded = shard_gaussian_voxelmap(vm, mesh)
        kwargs.setdefault("registration_type", "vgicp")
    elif isinstance(vm, IncrementalVoxelMap):
        vm_sharded = shard_incremental_voxelmap(vm, mesh)
        kwargs.setdefault("registration_type", "gicp")
    else:
        raise TypeError(f"unsupported map type {type(vm)!r}")
    target = ShardedVoxelMapTarget(vm=vm_sharded, mesh=mesh)
    return Registration(**kwargs).align(target, source, None, init_T)
