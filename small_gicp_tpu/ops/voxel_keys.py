"""63-bit voxel key packing shared by downsampling and voxel maps.

Same integer encoding as the reference (include/small_gicp/util/
downsampling.hpp:30-49): each axis coordinate is floor(p/leaf) offset by
2^20 into 21 unsigned bits, packed (z<<42 | y<<21 | x). Coordinates
outside [0, 2^21) make the point invalid (reference drops them with a
warning). Invalid/padded points get key INVALID_KEY, which sorts last.

This single representation serves three reference components at once:
voxelgrid downsampling, GaussianVoxelMap, and IncrementalVoxelMap
(ann/incremental_voxelmap.hpp uses an unordered_map keyed by the same
integer voxel coordinates with an XOR hash — on TPU a sorted key array +
binary search replaces the hash table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

COORD_BITS = 21
COORD_OFFSET = 1 << (COORD_BITS - 1)  # 2^20, see downsampling.hpp:36
COORD_RANGE = 1 << COORD_BITS
INVALID_KEY = jnp.iinfo(jnp.int64).max


def voxel_coords(points_xyz: jax.Array, inv_leaf: jax.Array) -> jax.Array:
    """[N,3] float coords → [N,3] int32 voxel coords (floor(p/leaf)).

    Non-finite coords (NaN scans) and out-of-int32 magnitudes (the
    PAD_SENTINEL rows) are forced to 2^30 BEFORE the int cast: XLA's
    float→int conversion is implementation-defined on NaN/overflow
    (NaN casts to 0 on some backends, which would fabricate a VALID
    voxel key at the origin), and 2^30 is far outside the 21-bit range
    so pack_coords maps these rows to INVALID_KEY deterministically.
    """
    c = jnp.floor(points_xyz * inv_leaf)
    big = jnp.asarray(2.0**30, c.dtype)
    c = jnp.where(jnp.isfinite(c), jnp.clip(c, -big, big), big)
    return c.astype(jnp.int32)


def pack_coords(coords: jax.Array) -> jax.Array:
    """[N,3] int voxel coords → [N] int64 packed keys; out-of-range → INVALID.

    Bit layout matches downsampling.hpp:41-49 (x low bits, z high bits).
    """
    shifted = coords.astype(jnp.int64) + COORD_OFFSET
    in_range = jnp.all((shifted >= 0) & (shifted < COORD_RANGE), axis=-1)
    key = (
        (shifted[..., 2] << (2 * COORD_BITS))
        | (shifted[..., 1] << COORD_BITS)
        | shifted[..., 0]
    )
    return jnp.where(in_range, key, INVALID_KEY)


def voxel_keys(points_xyz: jax.Array, leaf_size) -> jax.Array:
    """[N,3] points → [N] int64 voxel keys at the given leaf size."""
    inv_leaf = jnp.asarray(1.0, dtype=points_xyz.dtype) / leaf_size
    return pack_coords(voxel_coords(points_xyz, inv_leaf))


def unpack_key(keys: jax.Array) -> jax.Array:
    """[N] int64 keys → [N,3] int32 voxel coords (inverse of pack_coords)."""
    mask = COORD_RANGE - 1
    x = (keys & mask) - COORD_OFFSET
    y = ((keys >> COORD_BITS) & mask) - COORD_OFFSET
    z = ((keys >> (2 * COORD_BITS)) & mask) - COORD_OFFSET
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def neighbor_offsets(num_offsets: int) -> jax.Array:
    """Voxel neighborhood offset table, [K,3] int32.

    Matches the reference's 1/7/27-voxel search patterns
    (ann/incremental_voxelmap.hpp:157-186).
    """
    if num_offsets == 1:
        offs = [(0, 0, 0)]
    elif num_offsets == 7:
        offs = [
            (0, 0, 0),
            (1, 0, 0), (-1, 0, 0),
            (0, 1, 0), (0, -1, 0),
            (0, 0, 1), (0, 0, -1),
        ]
    elif num_offsets == 27:
        offs = [
            (x, y, z)
            for z in (-1, 0, 1)
            for y in (-1, 0, 1)
            for x in (-1, 0, 1)
        ]
    else:
        raise ValueError("num_offsets must be 1, 7, or 27")
    return jnp.asarray(offs, dtype=jnp.int32)


def segment_ids(keys_sorted: jax.Array):
    """Segment a SORTED key array into per-voxel runs.

    The canonical boundary idiom shared by downsampling, the fused
    covariance estimator, and both voxel maps: mark the first row of
    each run of equal valid keys, number runs by cumsum, and dump
    invalid (INVALID_KEY) rows into the last slot N-1 so segment
    reductions with num_segments=N ignore them.

    Returns (valid [N] bool, seg_first [N] bool, seg_id [N] int32,
    num_segments scalar int32).
    """
    n = keys_sorted.shape[0]
    valid = keys_sorted != INVALID_KEY
    prev = jnp.concatenate(
        [jnp.asarray([INVALID_KEY], keys_sorted.dtype), keys_sorted[:-1]]
    )
    seg_first = (keys_sorted != prev) & valid
    seg = jnp.cumsum(seg_first.astype(jnp.int32)) - 1
    num = jnp.sum(seg_first).astype(jnp.int32)
    seg = jnp.where(valid, seg, n - 1)
    return valid, seg_first, seg, num


def sort_segments(keys: jax.Array):
    """argsort keys (INVALID_KEY padding sorts last) and segment the
    result; returns (order, keys_sorted, valid, seg_id, num_segments)."""
    order = jnp.argsort(keys)
    keys_s = keys[order]
    valid, _, seg, num = segment_ids(keys_s)
    return order, keys_s, valid, seg, num
