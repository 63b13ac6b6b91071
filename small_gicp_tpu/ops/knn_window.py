"""Multi-shift Morton-banded self-kNN: O(N·S·W) neighborhoods.

TPU-first alternative to the exact O(N·M) brute force for SELF-kNN on
spatially coherent clouds (the per-frame covariance estimation in
odometry is a 16k-point self-kNN — the single largest slice of the
per-scan budget after the O(scan) voxel-map insert). The classic
shifted-z-order construction [Chan, "Approximate Nearest Neighbor
Queries Revisited"; Connor & Kumar, IEEE TVCG 2010]:

  * sort the points along S z-order (Morton) curves, each over a grid
    translated by a fixed offset;
  * each point's candidate set is the union of the ±W bands around it
    on every curve — a single quadrant boundary can break locality on
    one curve, but the probability it breaks on ALL shifted curves
    decays geometrically with S;
  * exact distances inside the ≤ S·(2W+1) candidate set, dedup, top-k.

Everything is sorts, shifted slices, and row-wise top-k — no [N,N]
matrix, no data-dependent shapes, MXU/VPU-friendly. This is
APPROXIMATE: tests/test_knn_window.py measures ≥97% set-recall @ k=20
with the defaults (S=4, W=64) on LiDAR-like geometry, and bounds the
effect on the downstream plane-regularized covariances (which is what
odometry consumes — the reference itself ships an approximate searcher,
ann/projective_search.hpp, for the same latency trade). The exact path
stays the default everywhere; odometry opts in via
covariance_mode="knn_window".

No reference counterpart (the CPU KdTree makes exact kNN cheap at these
sizes); the consumer contract is util/normal_estimation.hpp:66-92.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Fixed grid translations (units of `cell`), spanning several octree
# levels so no candidate pair sits on the same quadrant boundary in
# every curve. Low-discrepancy constants — NOT tunable knobs; any
# irrational-ratio offsets of this magnitude behave identically.
_SHIFTS = (
    (0.0, 0.0, 0.0),
    (39.55, 24.45, 15.11),
    (14.33, 45.76, 26.17),
    (54.62, 8.13, 35.89),
    (21.71, 33.28, 51.43),
    (47.06, 52.99, 7.61),
)


def _dilate21(x: jax.Array) -> jax.Array:
    """Spread the low 21 bits of int64 x to every 3rd bit (z-order)."""
    x = x & 0x1FFFFF
    x = (x | (x << 32)) & 0x1F00000000FFFF
    x = (x | (x << 16)) & 0x1F0000FF0000FF
    x = (x | (x << 8)) & 0x100F00F00F00F00F
    x = (x | (x << 4)) & 0x10C30C30C30C30C3
    x = (x | (x << 2)) & 0x1249249249249249
    return x


def morton_codes(points_xyz: jax.Array, cell) -> jax.Array:
    """[N,3] float coords → [N] int64 Morton codes at `cell` resolution.

    Same 21-bit/axis offset-2^20 integerization as the voxel keys
    (ops/voxel_keys.py) but bit-interleaved instead of concatenated, so
    curve order preserves 3-D locality in all axes at every scale.
    Out-of-range / non-finite coords get the max code (sort last).
    """
    inv = jnp.asarray(1.0, points_xyz.dtype) / cell
    c = jnp.floor(points_xyz * inv)
    ci = c.astype(jnp.int64) + (1 << 20)
    in_range = jnp.all(
        (ci >= 0) & (ci < (1 << 21)) & jnp.isfinite(c), axis=-1
    )
    code = (
        (_dilate21(ci[..., 2]) << 2)
        | (_dilate21(ci[..., 1]) << 1)
        | _dilate21(ci[..., 0])
    )
    return jnp.where(in_range, code, jnp.iinfo(jnp.int64).max)


def _dilate10_32(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of int32 x to every 3rd bit (z-order)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_codes32(points_xyz: jax.Array, cell, origin=None) -> jax.Array:
    """[N,3] float coords → [N] int32 Morton codes at `cell` resolution.

    x64-free variant of `morton_codes` for consumers that must run with
    jax_enable_x64 off (the fused registration kernel's pre-sort): 10
    bits/axis. `origin` anchors cell 0 — pass the cloud's min corner so
    the code space is used from 0 upward; the default origin −512·cell
    puts the TOP-LEVEL Morton quadrant boundary at coordinate 0, and a
    cloud straddling it gets giant curve jumps through its middle
    (which destroys the spatial compactness of sorted blocks — the
    whole point of the sort). Coordinates outside the 1024-cell range
    CLAMP to the boundary cell (coarse but still sorted near their side
    of the cloud); only non-finite rows get the max code (sort last).
    The clamp preserves the valid-rows-first prefix for every real
    point, which the fused wrapper's validity masking relies on.
    """
    inv = jnp.asarray(1.0, points_xyz.dtype) / cell
    if origin is None:
        rel = points_xyz * inv + 512.0
    else:
        rel = (points_xyz - origin) * inv
    c = jnp.floor(rel)
    finite = jnp.all(jnp.isfinite(c), axis=-1)
    ci = jnp.clip(jnp.where(jnp.isfinite(c), c, 0.0).astype(jnp.int32), 0, 1023)
    code = (
        (_dilate10_32(ci[..., 2]) << 2)
        | (_dilate10_32(ci[..., 1]) << 1)
        | _dilate10_32(ci[..., 0])
    )
    return jnp.where(finite, code, jnp.iinfo(jnp.int32).max)


@partial(jax.jit, static_argnames=("k", "window", "shifts"))
def knn_windowed(
    points: jax.Array,
    num_points: jax.Array,
    k: int,
    window: int = 64,
    cell: float = 1.0,
    shifts: int = 4,
):
    """Approximate self-kNN of a padded cloud.

    Args:
      points: [N,4] homogeneous (or [N,3]); rows ≥ num_points are padding.
      num_points: scalar int32 — valid prefix length.
      k: neighbors per point (includes the point itself at distance 0,
        like the exact self-search).
      window: band half-width W along each curve (static).
      cell: Morton quantization cell (any value within a few orders of
        the point spacing works — the multi-shift union, not the cell,
        carries the recall).
      shifts: number of shifted curves S (static, ≤ len(_SHIFTS)).

    Returns:
      (sq_dists [N,k], idx [N,k]) in ORIGINAL point order, ascending by
      distance, no duplicate indices. Missed/padded slots have
      sq_dist=inf (the covariance estimator's invalid marker).
    """
    n = points.shape[0]
    dtype = points.dtype
    xyz = points[:, :3]
    w = int(window)
    s = int(shifts)
    if not 1 <= s <= len(_SHIFTS):
        raise ValueError(f"shifts must be in [1, {len(_SHIFTS)}]")
    band = 2 * w + 1
    if k > s * band:
        raise ValueError(f"k={k} exceeds total candidates {s * band}")

    valid = jnp.arange(n) < num_points
    big = jnp.asarray(jnp.inf, dtype)
    xyz_m = jnp.where(valid[:, None], xyz, big)
    rows = jnp.arange(n, dtype=jnp.int32)

    d_all = []
    i_all = []
    for si in range(s):
        shift = jnp.asarray(_SHIFTS[si], dtype) * jnp.asarray(cell, dtype)
        codes = jnp.where(
            valid, morton_codes(xyz + shift, cell), jnp.iinfo(jnp.int64).max
        )
        _, perm = jax.lax.sort((codes, rows), num_keys=1)
        xs = xyz_m[perm]  # curve-ordered, padding rows = +inf

        # Band distances: slot o ∈ [0, 2W] pairs curve row i with curve
        # row i+o-W. One windowed gather of consecutive rows (im2col
        # over the W-padded table), one subtract, one reduce.
        xp = jnp.concatenate(
            [jnp.full((w, 3), big, dtype), xs, jnp.full((w, 3), big, dtype)]
        )
        win = xp[rows[:, None] + jnp.arange(band)[None, :]]  # [N,band,3]
        d = win - xs[:, None, :]
        d2 = jnp.sum(d * d, axis=-1)
        d2 = jnp.where(jnp.isfinite(d2), d2, big)

        src = jnp.clip(rows[:, None] + jnp.arange(band)[None, :] - w, 0, n - 1)
        idx = perm[src]  # [N,band] original ids, rows in curve order

        # back to original row order
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(rows)
        d_all.append(d2[inv])
        i_all.append(idx[inv])

    d_cat = jnp.concatenate(d_all, axis=1)  # [N, S*band]
    i_cat = jnp.concatenate(i_all, axis=1)

    # Dedup across curves. Each distinct candidate appears at most S
    # times (once per curve, plus edge-clipped repeats at +inf), so the
    # k distinct nearest always survive a top-(S·k) cut — dedup then
    # runs on [N, S·k] instead of the full [N, S·band] (a 6x smaller
    # row sort at the defaults). Sort the survivors by (id, distance) —
    # two keys so the kept copy of a repeated id is its minimum — mask
    # repeats, top-k by distance. All static shapes.
    cut = min(s * k, d_cat.shape[1])
    neg_c, pos_c = jax.lax.top_k(-d_cat, cut)
    d_cut = -neg_c
    i_cut = jnp.take_along_axis(i_cat, pos_c, axis=1)
    i_srt, d_srt = jax.lax.sort((i_cut, d_cut), num_keys=2, dimension=1)
    dup = jnp.concatenate(
        [
            jnp.zeros((n, 1), bool),
            i_srt[:, 1:] == i_srt[:, :-1],
        ],
        axis=1,
    )
    d_srt = jnp.where(dup, big, d_srt)

    neg, pos = jax.lax.top_k(-d_srt, k)
    return -neg, jnp.take_along_axis(i_srt, pos, axis=1)


@partial(jax.jit, static_argnames=("k", "window", "shifts"))
def knn_windowed_query(
    target_points: jax.Array,
    target_num: jax.Array,
    query_xyz: jax.Array,
    k: int,
    window: int = 64,
    cell: float = 1.0,
    shifts: int = 4,
):
    """Approximate kNN of arbitrary queries in a padded target cloud.

    The query≠target generalization of `knn_windowed`: targets are
    sorted along S shifted Morton curves once; each query is located on
    every curve with a searchsorted and its candidate set is the union
    of the ±W bands around those positions. O((M+Q)·log + Q·S·W) versus
    the exact searcher's O(Q·M) — this is the sub-quadratic option the
    public `KdTree.knn_search(..., method="window")` routes to for
    raw-scan-scale clouds where the reference would use its tree
    (ann/kdtree.hpp:194-233). Same recall contract as `knn_windowed`
    (≥97% set-recall at the defaults on LiDAR-like geometry,
    tests/test_knn_window.py); missed slots have sq_dist=inf.

    Returns (sq_dists [Q,k], idx [Q,k]) ascending, no duplicate indices.
    """
    m = target_points.shape[0]
    nq = query_xyz.shape[0]
    dtype = target_points.dtype
    txyz = target_points[:, :3]
    qxyz = query_xyz[:, :3].astype(dtype)
    w = int(window)
    s = int(shifts)
    if not 1 <= s <= len(_SHIFTS):
        raise ValueError(f"shifts must be in [1, {len(_SHIFTS)}]")
    band = 2 * w + 1
    if k > s * band:
        raise ValueError(f"k={k} exceeds total candidates {s * band}")

    valid_t = jnp.arange(m) < target_num
    big = jnp.asarray(jnp.inf, dtype)
    txyz_m = jnp.where(valid_t[:, None], txyz, big)
    trows = jnp.arange(m, dtype=jnp.int32)
    qrows = jnp.arange(nq, dtype=jnp.int32)

    d_all = []
    i_all = []
    for si in range(s):
        shift = jnp.asarray(_SHIFTS[si], dtype) * jnp.asarray(cell, dtype)
        codes_t = jnp.where(
            valid_t, morton_codes(txyz + shift, cell), jnp.iinfo(jnp.int64).max
        )
        codes_sorted, perm = jax.lax.sort((codes_t, trows), num_keys=1)
        xs = txyz_m[perm]  # curve-ordered targets, padding = +inf

        codes_q = morton_codes(qxyz + shift, cell)
        pos = jnp.searchsorted(codes_sorted, codes_q).astype(jnp.int32)  # [Q]

        # Band rows ∈ [pos−W, pos+W]; xs row i lives at xp[i+W], so the
        # window starts at xp[pos] (same im2col construction as the self
        # variant, with searchsorted supplying the anchor).
        xp = jnp.concatenate(
            [jnp.full((w, 3), big, dtype), xs, jnp.full((w, 3), big, dtype)]
        )
        win = xp[pos[:, None] + jnp.arange(band)[None, :]]  # [Q,band,3]
        d = win - qxyz[:, None, :]
        d2 = jnp.sum(d * d, axis=-1)
        d2 = jnp.where(jnp.isfinite(d2), d2, big)

        src = jnp.clip(pos[:, None] + jnp.arange(band)[None, :] - w, 0, m - 1)
        d_all.append(d2)
        i_all.append(perm[src])

    d_cat = jnp.concatenate(d_all, axis=1)  # [Q, S*band]
    i_cat = jnp.concatenate(i_all, axis=1)

    # Same dedup as knn_windowed: top-(S·k) cut, (id, dist) sort, mask
    # repeats, top-k.
    cut = min(s * k, d_cat.shape[1])
    neg_c, pos_c = jax.lax.top_k(-d_cat, cut)
    d_cut = -neg_c
    i_cut = jnp.take_along_axis(i_cat, pos_c, axis=1)
    i_srt, d_srt = jax.lax.sort((i_cut, d_cut), num_keys=2, dimension=1)
    dup = jnp.concatenate(
        [jnp.zeros((nq, 1), bool), i_srt[:, 1:] == i_srt[:, :-1]], axis=1
    )
    d_srt = jnp.where(dup, big, d_srt)

    neg, pos = jax.lax.top_k(-d_srt, k)
    return -neg, jnp.take_along_axis(i_srt, pos, axis=1)
