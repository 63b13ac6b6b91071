"""Pallas TPU kernel: one fused GICP correspondence-search + linearize.

A GICP optimizer iteration on the XLA path is a chain of separate
kernels — Pallas 1-NN, a [N,12] payload gather, the mahalanobis
weights (3x3 inverse), the Jacobian einsums, and the masked (H, b)
contraction. On the tunneled dev runtime each serialized kernel group
costs a fixed ~0.15 ms, so the chain, not the math, dominates a
6.6k-point registration (~0.6 ms/iteration for ~0.1 ms of compute).
This kernel does the whole linearization in ONE pallas_call:

  grid = (query_blocks, target_tiles), target axis innermost
  per (query block, target tile):
    * VPU difference-form distances (same as ops/knn_pallas.py)
    * running (best d2, best payload) in VMEM scratch; the winner's
      [mu | C_target] row is extracted with a one-hot MXU matmul
      against the tile — no gather instruction exists on TPU, the
      systolic array IS the gather
  Layout note: the per-point axis lives on the LANE dimension
  ([1, BQ] row vectors) — the kernel holds ~150 live per-point scalar
  temporaries, and a [BQ, 1] column pads to a full (BQ, 128) vreg tile
  (128 KB each at BQ=256, instant VMEM OOM) while a [1, BQ] row pads to
  (8, BQ) = 8 KB. Targets ride the sublane axis of a [BM, BQ] distance
  tile.
  on the last target tile:
    * T·p, r = mu − T·p, W = (C_t + R C_s Rᵀ)⁻¹ (adjugate inverse,
      identical guard to ops/eigh3.inv3x3), rejector mask
    * J = [R·skew(p) | −R], per-point Jᵀ W J and Jᵀ W r expanded in
      scalar registers over the block's lanes
    * block reduction of [H(36) | b(6) | e | inliers] via one
      ones-vector MXU matmul; per-block partial rows are summed by the
      caller (13 rows at N=6.6k — f64 where it matters)
    * the frozen Correspondences buffer [mu | W | mask | d2] is written
      for the LM trial error evaluations

Restrictions: f32, GICP factor, no robust kernel (the robust variants
re-weight by per-point error and keep the XLA path). Semantics match
factors.make_weights + factors.linearize exactly; parity is pinned by
tests/test_gicp_fused.py in interpreter mode and the on-chip lane.

Reference semantics covered: gicp_factor.hpp:49-72 (NN of transformed
source, mahalanobis, H/b/e), rejector.hpp:19-28, reduction.hpp:11-63.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _fused_kernel(
    nt_ref, tb_ref, t_ref, q_ref, corr_ref, acc_ref, best_d, best_pay, qbb
):
    """nt_ref: SMEM [1, 20] = [R row-major 9 | t 3 | max_dist_sq | pad]
    (2-D so the auto-batching rule's squeezed leading block dim keeps the
    last two block dims equal to the array dims — vmap adds a leading
    grid axis and this kernel batches as-is);
    tb_ref: SMEM [1, n_mtiles*8] per-target-tile bboxes
    [xlo ylo zlo xhi yhi zhi pad pad] over the tile's FINITE rows;
    t_ref: VMEM [BM, 16] target tile (cols 0-2 xyz, 3-11 cov row-major);
    q_ref: VMEM [16, BQ] source block (rows 0-2 p, 3-11 C_s, 12
    row-valid); corr_ref: [16, BQ] out; acc_ref: [8, 128] out;
    best_d/best_pay: VMEM scratch [8, BQ] (row 0 used) / [16, BQ];
    qbb: SMEM scratch [8] — the query block's transformed bbox.

    Tile pruning: a [BM, BQ] tile whose target bbox is farther than
    max_dist from the query block's bbox cannot produce an ACCEPTED
    correspondence (the rejector masks everything beyond max_dist —
    rejector.hpp:19-28), so its distance scan is skipped entirely. With
    both clouds Morton-sorted (wrapper), blocks are spatially compact
    and most (query, target) tile pairs prune. Exact within the rejector
    radius: a pruned tile's points would all have been masked out.
    """
    mi = pl.program_id(1)
    n_mi = pl.num_programs(1)
    bq = q_ref.shape[1]

    r00, r01, r02 = nt_ref[0, 0], nt_ref[0, 1], nt_ref[0, 2]
    r10, r11, r12 = nt_ref[0, 3], nt_ref[0, 4], nt_ref[0, 5]
    r20, r21, r22 = nt_ref[0, 6], nt_ref[0, 7], nt_ref[0, 8]
    tx, ty, tz = nt_ref[0, 9], nt_ref[0, 10], nt_ref[0, 11]
    max_d2 = nt_ref[0, 12]

    px = q_ref[0:1, :]
    py = q_ref[1:2, :]
    pz = q_ref[2:3, :]
    # transformed source point (gicp_factor.hpp:49)
    qx = r00 * px + r01 * py + r02 * pz + tx
    qy = r10 * px + r11 * py + r12 * pz + ty
    qz = r20 * px + r21 * py + r22 * pz + tz

    @pl.when(mi == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, _BIG)
        best_pay[:] = jnp.zeros_like(best_pay)
        # Transformed bbox over VALID lanes only (invalid/padding lanes
        # carry sentinel coords that would blow the box up and kill
        # pruning; they can never be inliers). All-invalid block =>
        # inverted box => every tile prunes; the final write still runs
        # and masks everything out.
        val = q_ref[12:13, :] > 0.5
        qbb[0] = jnp.min(jnp.where(val, qx, _BIG))
        qbb[1] = jnp.min(jnp.where(val, qy, _BIG))
        qbb[2] = jnp.min(jnp.where(val, qz, _BIG))
        qbb[3] = jnp.max(jnp.where(val, qx, -_BIG))
        qbb[4] = jnp.max(jnp.where(val, qy, -_BIG))
        qbb[5] = jnp.max(jnp.where(val, qz, -_BIG))

    o = mi * 8
    zero = jnp.float32(0.0)
    gx = jnp.maximum(
        zero, jnp.maximum(tb_ref[0, o + 0] - qbb[3], qbb[0] - tb_ref[0, o + 3])
    )
    gy = jnp.maximum(
        zero, jnp.maximum(tb_ref[0, o + 1] - qbb[4], qbb[1] - tb_ref[0, o + 4])
    )
    gz = jnp.maximum(
        zero, jnp.maximum(tb_ref[0, o + 2] - qbb[5], qbb[2] - tb_ref[0, o + 5])
    )
    gap2 = gx * gx + gy * gy + gz * gz
    # NaN-safe: only prune on a definite "too far" (comparisons with NaN
    # are False, so a NaN gap keeps the tile).
    live = ~(gap2 > max_d2)

    @pl.when(live)
    def _():
        dx = qx - t_ref[:, 0:1]  # [BM, BQ]
        dy = qy - t_ref[:, 1:2]
        dz = qz - t_ref[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz  # [BM, BQ]

        bm, bq = d2.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (bm, bq), 0)
        tile_min = jnp.min(d2, axis=0, keepdims=True)  # [1, BQ]
        tile_row = jnp.min(
            jnp.where(d2 <= tile_min, row, jnp.int32(2**30)),
            axis=0, keepdims=True,
        )
        better = tile_min < best_d[0:1, :]
        # winner payload column via one-hot matmul (the TPU's gather)
        onehot = (row == tile_row).astype(jnp.float32)  # [BM, BQ]
        pay = jax.lax.dot_general(
            t_ref[:], onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # Explicit: a one-pass bf16 dot would quantize the payload
            # rows (target means/covs) to 8-bit mantissa even though the
            # one-hot side is exact — don't depend on the package-level
            # global (__init__.py:24-32) surviving an embedding app's
            # override.
            precision=jax.lax.Precision.HIGHEST,
        )  # [16, BQ]
        best_d[0:1, :] = jnp.where(better, tile_min, best_d[0:1, :])
        best_pay[:] = jnp.where(better, pay, best_pay[:])

    @pl.when(mi == n_mi - 1)
    def _():
        d = best_d[0:1, :]
        mask = (
            (d <= max_d2) & (d < _BIG / 2.0) & (q_ref[12:13, :] > 0.5)
        ).astype(jnp.float32)

        mux = best_pay[0:1, :]
        muy = best_pay[1:2, :]
        muz = best_pay[2:3, :]
        rx = mux - qx
        ry = muy - qy
        rz = muz - qz

        # A = R C_s; B = A Rᵀ; M = C_t + B  (gicp_factor.hpp:59)
        c = [q_ref[3 + k:4 + k, :] for k in range(9)]  # C_s row-major
        a00 = r00 * c[0] + r01 * c[3] + r02 * c[6]
        a01 = r00 * c[1] + r01 * c[4] + r02 * c[7]
        a02 = r00 * c[2] + r01 * c[5] + r02 * c[8]
        a10 = r10 * c[0] + r11 * c[3] + r12 * c[6]
        a11 = r10 * c[1] + r11 * c[4] + r12 * c[7]
        a12 = r10 * c[2] + r11 * c[5] + r12 * c[8]
        a20 = r20 * c[0] + r21 * c[3] + r22 * c[6]
        a21 = r20 * c[1] + r21 * c[4] + r22 * c[7]
        a22 = r20 * c[2] + r21 * c[5] + r22 * c[8]
        m00 = best_pay[3:4, :] + a00 * r00 + a01 * r01 + a02 * r02
        m01 = best_pay[4:5, :] + a00 * r10 + a01 * r11 + a02 * r12
        m02 = best_pay[5:6, :] + a00 * r20 + a01 * r21 + a02 * r22
        m10 = best_pay[6:7, :] + a10 * r00 + a11 * r01 + a12 * r02
        m11 = best_pay[7:8, :] + a10 * r10 + a11 * r11 + a12 * r12
        m12 = best_pay[8:9, :] + a10 * r20 + a11 * r21 + a12 * r22
        m20 = best_pay[9:10, :] + a20 * r00 + a21 * r01 + a22 * r02
        m21 = best_pay[10:11, :] + a20 * r10 + a21 * r11 + a22 * r12
        m22 = best_pay[11:12, :] + a20 * r20 + a21 * r21 + a22 * r22

        # adjugate inverse, same det guard as ops/eigh3.inv3x3
        co00 = m11 * m22 - m12 * m21
        co01 = m02 * m21 - m01 * m22
        co02 = m01 * m12 - m02 * m11
        co10 = m12 * m20 - m10 * m22
        co11 = m00 * m22 - m02 * m20
        co12 = m02 * m10 - m00 * m12
        co20 = m10 * m21 - m11 * m20
        co21 = m01 * m20 - m00 * m21
        co22 = m00 * m11 - m01 * m10
        det = m00 * co00 + m01 * co10 + m02 * co20
        bad = jnp.abs(det) < 1e-30
        inv_det = jnp.where(bad, 0.0, 1.0 / jnp.where(bad, 1.0, det))
        w00 = co00 * inv_det
        w01 = co01 * inv_det
        w02 = co02 * inv_det
        w10 = co10 * inv_det
        w11 = co11 * inv_det
        w12 = co12 * inv_det
        w20 = co20 * inv_det
        w21 = co21 * inv_det
        w22 = co22 * inv_det

        # Wr, e = ½ rᵀWr
        wr0 = w00 * rx + w01 * ry + w02 * rz
        wr1 = w10 * rx + w11 * ry + w12 * rz
        wr2 = w20 * rx + w21 * ry + w22 * rz
        e_i = 0.5 * (rx * wr0 + ry * wr1 + rz * wr2)

        # J = [R·skew(p) | −R]  (factors.geometric_jacobian)
        j = [[None] * 6 for _ in range(3)]
        j[0][0] = r01 * pz - r02 * py
        j[0][1] = r02 * px - r00 * pz
        j[0][2] = r00 * py - r01 * px
        j[1][0] = r11 * pz - r12 * py
        j[1][1] = r12 * px - r10 * pz
        j[1][2] = r10 * py - r11 * px
        j[2][0] = r21 * pz - r22 * py
        j[2][1] = r22 * px - r20 * pz
        j[2][2] = r20 * py - r21 * px
        rmat = ((r00, r01, r02), (r10, r11, r12), (r20, r21, r22))
        ones = jnp.ones_like(px)
        for i in range(3):
            for k in range(3):
                j[i][3 + k] = -rmat[i][k] * ones

        w = ((w00, w01, w02), (w10, w11, w12), (w20, w21, w22))
        # WJ[i][b] = Σ_k W[i][k] J[k][b]
        wj = [
            [
                w[i][0] * j[0][b] + w[i][1] * j[1][b] + w[i][2] * j[2][b]
                for b in range(6)
            ]
            for i in range(3)
        ]
        wr = (wr0, wr1, wr2)
        rows = []
        # H row-major, all 36 entries (symmetric but the XLA-side
        # consumer expects the full matrix; redundancy is cheap)
        for a in range(6):
            for b_ in range(6):
                h_ab = (
                    j[0][a] * wj[0][b_]
                    + j[1][a] * wj[1][b_]
                    + j[2][a] * wj[2][b_]
                )
                rows.append(h_ab * mask)
        for a in range(6):
            b_a = j[0][a] * wr[0] + j[1][a] * wr[1] + j[2][a] * wr[2]
            rows.append(b_a * mask)
        rows.append(e_i * mask)
        rows.append(mask)
        rows += [jnp.zeros_like(px)] * (128 - len(rows))
        v = jnp.concatenate(rows, axis=0)  # [128, BQ]
        ones8 = jnp.ones((8, bq), jnp.float32)
        # [8, 128] = ones8 · vᵀ (contract the BQ lane axes): every row of
        # the tile carries the identical block sum; caller divides by 8.
        acc_ref[:] = jax.lax.dot_general(
            ones8, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        corr = jnp.concatenate(
            [
                mux, muy, muz,
                w00, w01, w02, w10, w11, w12, w20, w21, w22,
                mask, d,
                jnp.zeros_like(px), jnp.zeros_like(px),
            ],
            axis=0,
        )  # [16, BQ]
        corr_ref[:] = corr


@jax.jit
def morton_presort(
    target_points: jax.Array,  # [M,4]
    target_covs: jax.Array,  # [M,3,3]
    source_points: jax.Array,  # [N,4]
    source_covs: jax.Array,  # [N,3,3]
    num_points: jax.Array,  # scalar int32 (valid source rows)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Morton-sort both clouds ONCE for the fused kernel's tile pruning.

    Callers running the kernel in an optimizer loop use this before the
    loop and pass sort=False to gicp_linearize_pallas, so the sorts are
    structurally outside the loop (no reliance on XLA hoisting). The
    sorted source keeps its valid-rows-first prefix (invalid/padding →
    max code — morton_codes32), so num_points masking stays correct; H,
    b, error, and the inlier count are permutation-invariant, which is
    all the optimizer consumes.
    """
    from small_gicp_tpu.ops.knn_window import morton_codes32

    m = target_points.shape[0]
    n = source_points.shape[0]
    txyz = jnp.clip(target_points[:, :3].astype(jnp.float32), -1e12, 1e12)
    # Anchor the code space at the cloud's own min corner: a cloud
    # straddling the default origin would sit ON the top-level Morton
    # quadrant boundary and lose all block compactness (see
    # morton_codes32). Sentinel rows (~1e12) are excluded from the min.
    t_finite = jnp.all(jnp.abs(txyz) < 1.0e8, axis=-1, keepdims=True)
    t_origin = jnp.min(jnp.where(t_finite, txyz, jnp.inf), axis=0)
    t_origin = jnp.where(jnp.isfinite(t_origin), t_origin, 0.0)
    tcode = morton_codes32(txyz, 1.0, origin=t_origin)
    _, tperm = jax.lax.sort((tcode, jnp.arange(m, dtype=jnp.int32)), num_keys=1)
    valid = jnp.arange(n) < num_points
    sxyz = jnp.where(
        valid[:, None], source_points[:, :3].astype(jnp.float32), jnp.inf
    )
    s_origin = jnp.min(jnp.where(jnp.isfinite(sxyz), sxyz, jnp.inf), axis=0)
    s_origin = jnp.where(jnp.isfinite(s_origin), s_origin, 0.0)
    scode = morton_codes32(sxyz, 1.0, origin=s_origin)
    _, sperm = jax.lax.sort((scode, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    return (
        target_points[tperm],
        target_covs[tperm],
        source_points[sperm],
        source_covs[sperm],
    )


@partial(jax.jit, static_argnames=("block_q", "block_m", "interpret", "sort"))
def gicp_linearize_pallas(
    target_points: jax.Array,  # [M,4]
    target_covs: jax.Array,  # [M,3,3]
    source_points: jax.Array,  # [N,4]
    source_covs: jax.Array,  # [N,3,3]
    T: jax.Array,  # [4,4]
    num_points: jax.Array,  # scalar int32 (valid source rows)
    max_dist_sq,
    block_q: int = 512,
    block_m: int = 1024,
    interpret: bool = False,
    sort: bool = True,
) -> Tuple[jax.Array, ...]:
    """Fused GICP search+linearize.

    Returns (H [6,6], b [6], target_mu [N,3], W [N,3,3], mask [N] bool,
    sq_dists [N], corr16 [16,QP] raw lane-major correspondence buffer
    for gicp_error_multi_pallas, sorted_source [QP,4] the Morton-sorted
    padded source points corr16 is aligned with) — H/b match
    factors.linearize over the correspondences that
    _search_correspondences would produce with an exact NN (up to f32
    reduction order). mu/W/mask/sq are in ORIGINAL source row order.

    sort=True Morton-sorts both clouds so the kernel's bbox tile
    pruning fires (spatially compact blocks); the sorts depend only on
    loop-invariant cloud data, so XLA hoists them out of the optimizer's
    while loop — per-iteration cost is the kernel alone. Pruning is
    exact within the rejector radius (see _fused_kernel docstring).
    """
    m = target_points.shape[0]
    n = source_points.shape[0]

    tc = jnp.clip(target_points[:, :3].astype(jnp.float32), -1.0e12, 1.0e12)
    block_m = min(block_m, (m + 511) // 512 * 512)
    block_q = min(block_q, (n + 127) // 128 * 128)
    mp = (m + block_m - 1) // block_m * block_m
    qp = (n + block_q - 1) // block_q * block_q

    valid = (jnp.arange(n, dtype=jnp.int32) < num_points).astype(jnp.float32)
    sperm = jnp.arange(n, dtype=jnp.int32)
    if sort:
        from small_gicp_tpu.ops.knn_window import morton_codes32

        # Cell size ~ the rejector radius: block extents then sit at the
        # pruning length scale. Sentinel/invalid coords map to the max
        # code and sort last (their tiles carry inverted bboxes). Codes
        # are anchored at each cloud's min corner (see morton_codes32 on
        # why straddling the default origin destroys compactness).
        # NOTE: callers inside an optimizer loop should pre-sort ONCE
        # and pass sort=False — these sorts depend only on the clouds,
        # but relying on XLA's loop-invariant code motion to hoist them
        # out of a while loop is not a given (align_impl pre-sorts).
        t_finite = jnp.all(jnp.abs(tc) < 1.0e8, axis=-1, keepdims=True)
        t_origin = jnp.min(jnp.where(t_finite, tc, jnp.inf), axis=0)
        t_origin = jnp.where(jnp.isfinite(t_origin), t_origin, 0.0)
        tcode = morton_codes32(tc, 1.0, origin=t_origin)
        _, tperm = jax.lax.sort(
            (tcode, jnp.arange(m, dtype=jnp.int32)), num_keys=1
        )
        tc = tc[tperm]
        target_covs = target_covs[tperm]
        sxyz = jnp.where(
            valid[:, None] > 0.5,
            source_points[:, :3].astype(jnp.float32),
            jnp.inf,
        )
        s_origin = jnp.min(jnp.where(jnp.isfinite(sxyz), sxyz, jnp.inf), axis=0)
        s_origin = jnp.where(jnp.isfinite(s_origin), s_origin, 0.0)
        scode = morton_codes32(sxyz, 1.0, origin=s_origin)
        _, sperm = jax.lax.sort(
            (scode, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        source_points = source_points[sperm]
        source_covs = source_covs[sperm]
        valid = valid[sperm]

    ttab = jnp.concatenate(
        [tc, target_covs.reshape(m, 9).astype(jnp.float32),
         jnp.zeros((m, 4), jnp.float32)],
        axis=1,
    )  # [M, 16]
    if mp != m:
        padrow = jnp.zeros((mp - m, 16), jnp.float32).at[:, :3].set(1.0e12)
        ttab = jnp.concatenate([ttab, padrow], axis=0)

    # Per-target-tile bboxes over finite rows (sentinel rows excluded —
    # they can never be accepted correspondences, so a tile of them may
    # prune).
    n_mt = mp // block_m
    tcoord = ttab[:, :3].reshape(n_mt, block_m, 3)
    finite = jnp.all(jnp.abs(tcoord) < 1.0e8, axis=-1, keepdims=True)
    lo = jnp.min(jnp.where(finite, tcoord, _BIG), axis=1)  # [n_mt,3]
    hi = jnp.max(jnp.where(finite, tcoord, -_BIG), axis=1)
    tb = jnp.concatenate(
        [lo, hi, jnp.zeros((n_mt, 2), jnp.float32)], axis=1
    ).reshape(1, n_mt * 8)

    qtab = jnp.concatenate(
        [
            source_points[:, :3].astype(jnp.float32),
            source_covs.reshape(n, 9).astype(jnp.float32),
            valid[:, None],
            jnp.zeros((n, 3), jnp.float32),
        ],
        axis=1,
    )
    if qp != n:
        qtab = jnp.concatenate([qtab, jnp.zeros((qp - n, 16), jnp.float32)], axis=0)
    qtab = qtab.T  # [16, QP]

    Tf = T.astype(jnp.float32)
    nt = jnp.concatenate(
        [
            Tf[:3, :3].reshape(-1),
            Tf[:3, 3],
            jnp.asarray(max_dist_sq, jnp.float32).reshape(-1)[:1],
            jnp.zeros((7,), jnp.float32),
        ]
    )[None, :]  # [1, 20] (2-D so vmap's squeezed batch dim lowers — see kernel)

    grid = (qp // block_q, mp // block_m)
    with jax.enable_x64(False):
        corr, acc = pl.pallas_call(
            _fused_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (block_m, 16), lambda qi, mi: (mi, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (16, block_q), lambda qi, mi: (0, qi),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (16, block_q), lambda qi, mi: (0, qi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, 128), lambda qi, mi: (qi, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((16, qp), jnp.float32),
                jax.ShapeDtypeStruct((qp // block_q * 8, 128), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((8, block_q), jnp.float32),
                pltpu.VMEM((16, block_q), jnp.float32),
                pltpu.SMEM((8,), jnp.float32),
            ],
            interpret=interpret,
        )(nt, tb, ttab, qtab)

    dtype = source_points.dtype
    sums = jnp.sum(acc, axis=0) / 8.0  # 8 replicated rows per block
    H = sums[:36].reshape(6, 6).astype(dtype)
    b = sums[36:42].astype(dtype)
    corr16 = corr
    sorted_src = source_points
    if qp != n:
        sorted_src = jnp.concatenate(
            [sorted_src, jnp.zeros((qp - n, 4), sorted_src.dtype)], axis=0
        )
    corr = corr[:, :n].T  # [N, 16] in sorted order
    if sort:
        inv = jnp.zeros((n,), jnp.int32).at[sperm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        corr = corr[inv]  # back to original source row order
    mu = corr[:, 0:3].astype(dtype)
    W = corr[:, 3:12].reshape(n, 3, 3).astype(dtype)
    mask = corr[:, 12] > 0.5
    sq = corr[:, 13].astype(dtype)
    return H, b, mu, W, mask, sq, corr16, sorted_src


def _trials_kernel(ps_ref, c_ref, q_ref, acc_ref):
    """All LM trial errors in one pass.

    ps_ref: SMEM [1, 12*(K+1)] rows of [R row-major 9 | t 3] per pose
    (2-D for the same vmap-batching reason as _fused_kernel's nt_ref);
    c_ref: VMEM [16, BQ] frozen correspondence block (rows 0-2 mu,
    3-11 W row-major, 12 mask); q_ref: VMEM [16, BQ] source block
    (rows 0-2 p); acc_ref: [8, 128] out — cols 0..K hold the block's
    error sums for each pose (8 replicated rows, caller divides).
    """
    k1 = ps_ref.shape[1] // 12

    px = q_ref[0:1, :]
    py = q_ref[1:2, :]
    pz = q_ref[2:3, :]
    mux = c_ref[0:1, :]
    muy = c_ref[1:2, :]
    muz = c_ref[2:3, :]
    w = [c_ref[3 + k:4 + k, :] for k in range(9)]
    mask = c_ref[12:13, :]

    rows = []
    for k in range(k1):
        o = 12 * k
        p_ = lambda j: ps_ref[0, o + j]
        qx = p_(0) * px + p_(1) * py + p_(2) * pz + p_(9)
        qy = p_(3) * px + p_(4) * py + p_(5) * pz + p_(10)
        qz = p_(6) * px + p_(7) * py + p_(8) * pz + p_(11)
        rx = mux - qx
        ry = muy - qy
        rz = muz - qz
        wr0 = w[0] * rx + w[1] * ry + w[2] * rz
        wr1 = w[3] * rx + w[4] * ry + w[5] * rz
        wr2 = w[6] * rx + w[7] * ry + w[8] * rz
        rows.append(0.5 * (rx * wr0 + ry * wr1 + rz * wr2) * mask)
    rows += [jnp.zeros_like(px)] * (128 - len(rows))
    v = jnp.concatenate(rows, axis=0)  # [128, BQ]
    bq = px.shape[1]
    ones8 = jnp.ones((8, bq), jnp.float32)
    acc_ref[:] = jax.lax.dot_general(
        ones8, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("block_q", "interpret"))
def gicp_error_multi_pallas(
    corr16: jax.Array,  # [16, QP] raw buffer from gicp_linearize_pallas
    source_points: jax.Array,  # [N,4]
    Ts: jax.Array,  # [K1,4,4] poses (current pose first, then trials)
    num_points: jax.Array,  # scalar int32
    block_q: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """[K1] total frozen-correspondence errors, one kernel group.

    Equivalent to factors.error_multi over the fused kernel's
    correspondences; per-block sums are f32 (<= block_q terms), the
    cross-block reduction runs in f64 like _error_accum_dtype
    (optimizer.hpp:121's accept test is noise-sensitive near
    convergence).
    """
    k1 = Ts.shape[0]
    if k1 > 100:
        raise ValueError("at most 100 poses per call")
    n = source_points.shape[0]
    qp = corr16.shape[1]
    block_q = min(block_q, qp)

    valid = (jnp.arange(n, dtype=jnp.int32) < num_points).astype(jnp.float32)
    qtab = jnp.concatenate(
        [
            source_points[:, :3].astype(jnp.float32),
            valid[:, None],
            jnp.zeros((n, 12), jnp.float32),
        ],
        axis=1,
    )
    if qp != n:
        qtab = jnp.concatenate(
            [qtab, jnp.zeros((qp - n, 16), jnp.float32)], axis=0
        )
    qtab = qtab.T  # [16, QP]

    Tf = Ts.astype(jnp.float32)
    ps = jnp.concatenate(
        [
            jnp.concatenate([Tf[k, :3, :3].reshape(-1), Tf[k, :3, 3]])
            for k in range(k1)
        ]
    )[None, :]  # [1, 12*K1]

    grid = (qp // block_q,)
    with jax.enable_x64(False):
        acc = pl.pallas_call(
            _trials_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (16, block_q), lambda qi: (0, qi), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (16, block_q), lambda qi: (0, qi), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (8, 128), lambda qi: (qi, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (qp // block_q * 8, 128), jnp.float32
            ),
            interpret=interpret,
        )(ps, corr16, qtab)

    from small_gicp_tpu.models.factors import _error_accum_dtype

    acc_dt = _error_accum_dtype(source_points.dtype)
    per_block = acc[::8, :k1].astype(acc_dt)  # one row per block
    return jnp.sum(per_block, axis=0).astype(acc_dt)
