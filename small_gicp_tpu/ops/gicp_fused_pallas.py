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

Restrictions: f32. All three point factors (gicp / plane_icp / icp) and
the Huber/Cauchy robust kernels run fused: the robust weight w(√e_i) is
a few extra VPU ops applied at finalize (e_i is already in registers)
and recomputed per trial pose in the trial-error kernel — exactly the
reference's RobustFactor semantics (robust_kernel.hpp:85,97 re-weights
on every linearize AND every error evaluation). Semantics match
factors.make_weights + factors.linearize + factors.robust_weight
exactly; parity is pinned by tests/test_gicp_fused.py in interpreter
mode and the on-chip lane.

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
# Default thin-tile row count for in-kernel bbox pruning; the wrapper
# doubles it until the tb_ref SMEM table stays small (≤384 tiles).
_TS_DEFAULT = 256
# Grid-swept fallback superblock cap: a [BM,16] VMEM window pads its 16
# lanes to 128 under (8,128) tiling, so the double-buffered window costs
# BM*128*4*2 bytes — 48 MB at 49152 rows (128 MB VMEM total). The
# fallback only serves targets beyond the list-driven path's cap.
_BM_CAP = 49152
# List-driven path cap: the whole [16, MP] f32 table stays VMEM-resident
# (dense layout, no padding waste) — 96 MB at 1.5M rows.
_LISTED_MP_CAP = 1_572_864

# Robust kernels the fused path supports (factors/robust_kernel.hpp).
ROBUST_KERNELS = ("huber", "cauchy")


def _robust_w(robust: str, c, e):
    """In-kernel robust weight w(√e), bit-matching factors.robust_weight
    (robust_kernel.hpp:24-47): Huber min(1, c/√e), Cauchy c/(c+e) — the
    kernel argument is x = √e, and Cauchy's c/(c+x²) folds back to e.
    `e` is the per-point UNweighted error; negative fp noise clamps to 0
    exactly like the XLA path's sqrt(max(e, 0))."""
    e0 = jnp.maximum(e, 0.0)
    if robust == "huber":
        x = jnp.sqrt(e0)
        safe = jnp.maximum(x, 1e-30)
        return jnp.where(x < c, jnp.ones_like(x), c / safe)
    if robust == "cauchy":
        return c / (c + e0)
    raise ValueError(f"unknown robust kernel {robust!r}")


def _fused_kernel(
    nt_ref, tb_ref, t_ref, q_ref, corr_ref, acc_ref, best_d, best_pay, qbb,
    *, ts: int, factor: str = "gicp", robust: str = None,
):
    """nt_ref: SMEM [1, 20] = [R row-major 9 | t 3 | max_dist_sq |
    robust_c | pad]
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

    Tile pruning: the [BM, BQ] superblock is scanned as BM/TS THIN tiles
    by an in-kernel fori loop; a thin tile whose target bbox is farther
    than max_dist from the query block's bbox cannot produce an ACCEPTED
    correspondence (the rejector masks everything beyond max_dist —
    rejector.hpp:19-28), so its distance scan is skipped for the cost of
    one scalar branch. The in-kernel loop keeps pruning granularity
    (~TS rows) decoupled from the DMA/grid granularity (BM rows): thin
    tiles would otherwise explode the grid-step count. With both clouds
    Morton-sorted (wrapper), blocks are spatially compact and most
    (query, thin-tile) pairs prune. Exact within the rejector radius: a
    pruned tile's points would all have been masked out.
    """
    mi = pl.program_id(1)
    n_mi = pl.num_programs(1)
    bq = q_ref.shape[1]
    bm = t_ref.shape[0]
    n_thin = bm // ts

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

    qlo_x, qlo_y, qlo_z = qbb[0], qbb[1], qbb[2]
    qhi_x, qhi_y, qhi_z = qbb[3], qbb[4], qbb[5]
    zero = jnp.float32(0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (ts, bq), 0)

    def thin_tile(t, carry):
        j = mi * n_thin + t  # global thin-tile id into tb_ref
        o = j * 8
        gx = jnp.maximum(
            zero, jnp.maximum(tb_ref[0, o + 0] - qhi_x, qlo_x - tb_ref[0, o + 3])
        )
        gy = jnp.maximum(
            zero, jnp.maximum(tb_ref[0, o + 1] - qhi_y, qlo_y - tb_ref[0, o + 4])
        )
        gz = jnp.maximum(
            zero, jnp.maximum(tb_ref[0, o + 2] - qhi_z, qlo_z - tb_ref[0, o + 5])
        )
        gap2 = gx * gx + gy * gy + gz * gz
        # NaN-safe: only prune on a definite "too far" (comparisons with
        # NaN are False, so a NaN gap keeps the tile).
        live = ~(gap2 > max_d2)

        @pl.when(live)
        def _():
            rows = t_ref[pl.ds(t * ts, ts), :]  # [TS, 16]
            dx = qx - rows[:, 0:1]  # [TS, BQ]
            dy = qy - rows[:, 1:2]
            dz = qz - rows[:, 2:3]
            d2 = dx * dx + dy * dy + dz * dz  # [TS, BQ]

            tile_min = jnp.min(d2, axis=0, keepdims=True)  # [1, BQ]
            tile_row = jnp.min(
                jnp.where(d2 <= tile_min, row, jnp.int32(2**30)),
                axis=0, keepdims=True,
            )
            better = tile_min < best_d[0:1, :]
            # winner payload column via one-hot matmul (the TPU's gather)
            onehot = (row == tile_row).astype(jnp.float32)  # [TS, BQ]
            pay = jax.lax.dot_general(
                rows, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # Explicit: a one-pass bf16 dot would quantize the
                # payload rows (target means/covs) to 8-bit mantissa
                # even though the one-hot side is exact — don't depend
                # on the package-level global (__init__.py:24-32)
                # surviving an embedding app's override.
                precision=jax.lax.Precision.HIGHEST,
            )  # [16, BQ]
            best_d[0:1, :] = jnp.where(better, tile_min, best_d[0:1, :])
            best_pay[:] = jnp.where(better, pay, best_pay[:])

        return carry

    # unroll=1: with a static trip count Mosaic otherwise unrolls the
    # loop and allocates every iteration's [ts, BQ] temporaries as
    # separate VMEM stack slots (observed 64 MB scoped-vmem OOM at map
    # scale); a rolled loop reuses one iteration's worth.
    jax.lax.fori_loop(0, n_thin, thin_tile, 0, unroll=1)

    @pl.when(mi == n_mi - 1)
    def _():
        _fused_finalize(
            best_d, best_pay, q_ref, corr_ref, acc_ref,
            (r00, r01, r02, r10, r11, r12, r20, r21, r22),
            (qx, qy, qz), (px, py, pz), max_d2, factor,
            robust, nt_ref[0, 13],
        )


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




def _fused_finalize(
    best_d, best_pay, q_ref, corr_ref, acc_ref, rmat9, qxyz, pxyz, max_d2,
    factor: str = "gicp", robust: str = None, robust_c=None,
    exact_d: bool = False,
):
    """Per-query-block linearization from the winning correspondences:
    per-point weight W, rejector mask, J = [R·skew(p) | −R], the
    [H|b|e|inliers] block reduction via one ones-vector MXU matmul, and
    the frozen-correspondence buffer write. Shared by the grid-swept
    (_fused_kernel) and list-driven (_fused_kernel_listed) variants.

    `robust` applies the Huber/Cauchy re-weighting multiplicatively to
    the per-point (H_i, b_i, e_i) — RobustFactor::linearize
    (robust_kernel.hpp:80-91) with w = w(√e_i) from `robust_c`; the
    inlier count stays UNweighted (RobustFactor::inlier defers to the
    base factor, robust_kernel.hpp:101).

    `factor` selects W — the three reference factors share the weighted
    least-squares form H = JᵀWJ, b = JᵀWr, e = ½rᵀWr
    (factors.make_weights):
      * "gicp": mahalanobis (C_t + R C_s Rᵀ)⁻¹ — payload rows 3-11 carry
        C_t row-major (gicp_factor.hpp:59-60); adjugate inverse with the
        same det guard as ops/eigh3.inv3x3.
      * "plane_icp": diag(n∘n) — payload rows 3-5 carry the target
        normal (plane_icp_factor.hpp:43-54: err = n⊙r ⇒ W = diag(n)ᵀdiag(n)).
      * "icp": identity (icp_factor.hpp:34-53).
    """
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = rmat9
    qx, qy, qz = qxyz
    px, py, pz = pxyz
    bq = q_ref.shape[1]
    d = best_d[0:1, :]

    mux = best_pay[0:1, :]
    muy = best_pay[1:2, :]
    muz = best_pay[2:3, :]
    rx = mux - qx
    ry = muy - qy
    rz = muz - qz

    if exact_d:
        # mxu_dist path: best_d carries the MXU score ‖t‖² − 2 t·q
        # (per-query constant off true d²) — recompute the winner's
        # EXACT d² from its payload so the rejector test and the frozen
        # corr buffer keep the VPU path's contract. The no-winner case
        # stays on the raw score (init _BIG).
        d = jnp.where(
            d < _BIG / 2.0, rx * rx + ry * ry + rz * rz, d
        )
    mask = (
        (d <= max_d2) & (d < _BIG / 2.0) & (q_ref[12:13, :] > 0.5)
    ).astype(jnp.float32)

    if factor == "gicp":
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
    elif factor == "plane_icp":
        # W = diag(n∘n): payload rows 3-5 carry the winning target
        # normal (plane_icp_factor.hpp:43-54).
        nx = best_pay[3:4, :]
        ny = best_pay[4:5, :]
        nz = best_pay[5:6, :]
        zero = jnp.zeros_like(nx)
        w00, w11, w22 = nx * nx, ny * ny, nz * nz
        w01 = w02 = w10 = w12 = w20 = w21 = zero
    elif factor == "icp":
        one = jnp.ones_like(rx)
        zero = jnp.zeros_like(rx)
        w00 = w11 = w22 = one
        w01 = w02 = w10 = w12 = w20 = w21 = zero
    else:
        raise ValueError(f"unknown fused factor {factor!r}")

    # Wr, e = ½ rᵀWr
    wr0 = w00 * rx + w01 * ry + w02 * rz
    wr1 = w10 * rx + w11 * ry + w12 * rz
    wr2 = w20 * rx + w21 * ry + w22 * rz
    e_i = 0.5 * (rx * wr0 + ry * wr1 + rz * wr2)

    # Robust re-weighting (robust_kernel.hpp:85-88): e_i is live in
    # registers — a handful of VPU ops scale the whole per-point system.
    wm = mask if robust is None else mask * _robust_w(robust, robust_c, e_i)

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
            rows.append(h_ab * wm)
    for a in range(6):
        b_a = j[0][a] * wr[0] + j[1][a] * wr[1] + j[2][a] * wr[2]
        rows.append(b_a * wm)
    rows.append(e_i * wm)
    rows.append(mask)  # inlier count stays unweighted (robust_kernel.hpp:101)
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

def _fused_kernel_listed(
    nt_ref, lists_ref, counts_ref, t_ref, q_ref, corr_ref, acc_ref,
    best_d, best_pay, *, ts: int, L: int, transposed: bool, qdim: int = 0,
    factor: str = "gicp", robust: str = None, mxu_dist: bool = False,
):
    """List-driven variant of _fused_kernel: the WHOLE (Morton-sorted)
    target is VMEM-resident, grid = (query_blocks,), and each block
    walks ONLY its live thin tiles — a per-(block, tile) index list the
    caller computed from bbox gaps vs the rejector radius. This is the
    pruning mechanism that actually skips work on TPU: `pl.when` inside
    a rolled loop PREDICATES the body (measured: a fully-prunable
    problem ran at ~85% of the dense time), while a dynamic trip count
    over a compact list never issues the dead tiles at all.

    nt_ref: SMEM [1,20] pose row (see _fused_kernel);
    lists_ref: SMEM [1, nQB*L] live thin-tile ids per query block;
    counts_ref: SMEM [1, nQB] live counts — a count > L means the
    block overflowed the list and scans ALL tiles (exact fallback);
    t_ref: VMEM [MP,16]; q_ref: VMEM [16,BQ]; outputs as _fused_kernel.

    qdim: which grid axis is the query-block axis (0 for the single-pair
    grid=(n_qb,) path; 1 for the fleet grid=(lanes, n_qb) path). On the
    fleet path the SMEM operands arrive as FULL [B, ...] arrays and the
    kernel picks its lane's row with program_id(0): Mosaic rejects
    lane-blocked SMEM windows (block shape (1, w) over [B, w] fails the
    "second-to-last dim divisible by 8 or full" rule), and SMEM scalar
    reads at a dynamic row offset are free anyway.
    """
    qi = pl.program_id(qdim)
    li = pl.program_id(0) if qdim else 0
    bq = q_ref.shape[1]
    mp = t_ref.shape[1] if transposed else t_ref.shape[0]
    n_tt = mp // ts

    r00, r01, r02 = nt_ref[li, 0], nt_ref[li, 1], nt_ref[li, 2]
    r10, r11, r12 = nt_ref[li, 3], nt_ref[li, 4], nt_ref[li, 5]
    r20, r21, r22 = nt_ref[li, 6], nt_ref[li, 7], nt_ref[li, 8]
    tx, ty, tz = nt_ref[li, 9], nt_ref[li, 10], nt_ref[li, 11]
    max_d2 = nt_ref[li, 12]

    px = q_ref[0:1, :]
    py = q_ref[1:2, :]
    pz = q_ref[2:3, :]
    qx = r00 * px + r01 * py + r02 * pz + tx
    qy = r10 * px + r11 * py + r12 * pz + ty
    qz = r20 * px + r21 * py + r22 * pz + tz

    best_d[:] = jnp.full_like(best_d, _BIG)
    best_pay[:] = jnp.zeros_like(best_pay)

    cnt = counts_ref[li, qi]
    use_list = cnt <= L
    n_iter = jnp.where(use_list, cnt, jnp.int32(n_tt))
    row = jax.lax.broadcasted_iota(jnp.int32, (ts, bq), 0)

    if mxu_dist and not transposed:
        # MXU-distance experiment (round-5 roofline, VERDICT r4 #3):
        # the kernel is VPU-bound (51% VPU / 14% MXU load measured), so
        # evaluate the distance tile on the MXU instead: ONE K=16 dot
        # of the raw tile rows against [−2q | … | 1@12 | …] yields
        # ‖t‖² − 2·t·q (gicp_prepare writes ‖t‖² into ttab col 12).
        # That score orders targets identically to true d² for a fixed
        # query (it differs by the per-query constant ‖q‖²), so argmin
        # and best-d comparisons are unchanged; the finalize recomputes
        # the WINNER's exact d² from its payload row, keeping the
        # rejector test and the frozen corr buffer exact.
        q16_rows = [(-2.0) * qx, (-2.0) * qy, (-2.0) * qz]
        q16_rows += [jnp.zeros_like(qx)] * 9
        q16_rows += [jnp.ones_like(qx)]
        q16_rows += [jnp.zeros_like(qx)] * 3
        q16 = jnp.concatenate(q16_rows, axis=0)  # [16, BQ]

    def tile_body(t, carry):
        jl = jnp.where(
            use_list,
            lists_ref[li, qi * L + jnp.minimum(t, L - 1)],
            t.astype(jnp.int32),
        )
        if transposed:
            # Dense [16, MP] layout (map scale: a [MP,16] VMEM window
            # pads 16 lanes to 128 — 8x waste). Coordinate rows become
            # [TS,1] columns via three tiny vector transposes per tile.
            t16 = t_ref[:, pl.ds(jl * ts, ts)]  # [16, TS]
            tx_ = jnp.transpose(t16[0:1, :], (1, 0))
            ty_ = jnp.transpose(t16[1:2, :], (1, 0))
            tz_ = jnp.transpose(t16[2:3, :], (1, 0))
            dx = qx - tx_
            dy = qy - ty_
            dz = qz - tz_
            d2 = dx * dx + dy * dy + dz * dz  # [TS, BQ]
        else:
            # Row-major [MP,16] layout: no per-tile transposes; the 8x
            # VMEM padding is affordable below ~64k rows and measures
            # ~20% faster at scan scale.
            rows_t = t_ref[pl.ds(jl * ts, ts), :]  # [TS, 16]
            if mxu_dist:
                # HIGHEST (6-pass f32) is forced: Mosaic rejects
                # Precision.HIGH (3-pass), and 1-pass bf16 scores are
                # too coarse for NN decisions. Measured SLOWER than the
                # VPU difference form — see BENCHMARK.md negative
                # results ("MXU-distance experiment").
                d2 = jax.lax.dot_general(
                    rows_t, q16, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [TS, BQ] = ‖t‖² − 2 t·q (exact-d recomputed at finalize)
            else:
                tx_ = rows_t[:, 0:1]
                ty_ = rows_t[:, 1:2]
                tz_ = rows_t[:, 2:3]
                dx = qx - tx_
                dy = qy - ty_
                dz = qz - tz_
                d2 = dx * dx + dy * dy + dz * dz  # [TS, BQ]
        tile_min = jnp.min(d2, axis=0, keepdims=True)
        tile_row = jnp.min(
            jnp.where(d2 <= tile_min, row, jnp.int32(2**30)),
            axis=0, keepdims=True,
        )
        better = tile_min < best_d[0:1, :]
        onehot = (row == tile_row).astype(jnp.float32)
        if transposed:
            pay = jax.lax.dot_general(
                t16, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            pay = jax.lax.dot_general(
                rows_t, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        best_d[0:1, :] = jnp.where(better, tile_min, best_d[0:1, :])
        best_pay[:] = jnp.where(better, pay, best_pay[:])
        return carry

    jax.lax.fori_loop(0, n_iter, tile_body, 0, unroll=1)

    # --- final per-block linearization (identical to _fused_kernel) ---
    _fused_finalize(
        best_d, best_pay, q_ref, corr_ref, acc_ref,
        (r00, r01, r02, r10, r11, r12, r20, r21, r22), (qx, qy, qz),
        (px, py, pz), max_d2, factor,
        robust, nt_ref[li, 13],
        exact_d=mxu_dist and not transposed,
    )


def _sizes(m: int, n: int, block_q: int, block_m: int,
           ts: int = _TS_DEFAULT):
    """Static tiling decisions shared by prepare and linearize.

    Thin-tile size: smallest ts (starting from the requested one) that
    keeps the SMEM bbox table ≤384 tiles; superblock = whole target up
    to the VMEM cap (the in-kernel fori walks it in ts-row tiles, so
    DMA steps stay few while pruning stays fine-grained).
    """
    mp0 = (m + ts - 1) // ts * ts
    while mp0 // ts > 384:
        ts *= 2
    block_m = min(max(block_m, _BM_CAP), (m + ts - 1) // ts * ts)
    block_m = (block_m + ts - 1) // ts * ts
    block_q = min(block_q, (n + 127) // 128 * 128)
    mp = (m + block_m - 1) // block_m * block_m
    qp = (n + block_q - 1) // block_q * block_q
    return ts, block_m, block_q, mp, qp


@partial(jax.jit, static_argnames=("block_q", "block_m", "sort", "ts", "factor"))
def gicp_prepare(
    target_points: jax.Array,  # [M,4]
    target_covs: jax.Array,  # [M,3,3] (GICP) or None
    source_points: jax.Array,  # [N,4]
    source_covs: jax.Array,  # [N,3,3] (GICP) or None
    num_points: jax.Array,  # scalar int32 (valid source rows)
    block_q: int = 512,
    block_m: int = 1024,
    sort: bool = True,
    ts: int = _TS_DEFAULT,
    factor: str = "gicp",
    target_normals: jax.Array = None,  # [M,4] (plane_icp)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """ONE-TIME per-align preparation for the fused kernel.

    Morton-sorts both clouds (anchored at each cloud's min corner — see
    morton_codes32 on why straddling the default origin destroys block
    compactness), builds the kernel-format tables and the per-thin-tile
    bbox array. Everything here depends only on the clouds, so callers
    running the kernel inside an optimizer loop call this once before
    the loop (no reliance on XLA loop-invariant hoisting) and feed the
    tables to gicp_linearize_tables each iteration.

    `factor` picks the target payload (cols 3-11): "gicp" = C_t
    row-major, "plane_icp" = target normal in cols 3-5 (rest zero),
    "icp" = zeros. The source table carries C_s only for "gicp".

    Returns (ttab [MP,16], tb [1,n_tt*8], qtab [16,QP],
    sorted_src [QP,4], sperm [N] — the source permutation applied, for
    callers that need per-point outputs in original order, ttab_T
    [16,MP] — the transposed table the list-driven kernel keeps
    VMEM-resident: [MP,16] windows pad their 16 lanes to 128 under the
    TPU's (8,128) tiling, an 8x VMEM waste that OOMs at map scale).
    """
    from small_gicp_tpu.ops.knn_window import morton_codes32

    m = target_points.shape[0]
    n = source_points.shape[0]
    ts, block_m, block_q, mp, qp = _sizes(m, n, block_q, block_m, ts)

    if factor == "gicp":
        t_payload = target_covs.reshape(m, 9).astype(jnp.float32)
    elif factor == "plane_icp":
        t_payload = jnp.concatenate(
            [target_normals[:, :3].astype(jnp.float32),
             jnp.zeros((m, 6), jnp.float32)],
            axis=1,
        )
    elif factor == "icp":
        t_payload = jnp.zeros((m, 9), jnp.float32)
    else:
        raise ValueError(f"unknown fused factor {factor!r}")
    s_payload = (
        source_covs.reshape(n, 9).astype(jnp.float32)
        if factor == "gicp" else jnp.zeros((n, 9), jnp.float32)
    )

    tc = jnp.clip(target_points[:, :3].astype(jnp.float32), -1.0e12, 1.0e12)
    valid = (jnp.arange(n, dtype=jnp.int32) < num_points).astype(jnp.float32)
    sperm = jnp.arange(n, dtype=jnp.int32)
    # Build the fused row tables BEFORE sorting so each permutation is
    # ONE wide gather: TPU gather cost is per-row, and the round-5
    # device trace showed the map-scale prepare paying two separate
    # [M,3]/[M,9] permutation gathers (~3.5 ms/frame at 327k rows) —
    # one [M,12] gather halves that.
    trows = jnp.concatenate([tc, t_payload], axis=1)  # [M, 12]
    if sort:
        # Cell size ~ the rejector radius: block extents then sit at the
        # pruning length scale. Sentinel/invalid coords map to the max
        # code and sort last (their tiles carry inverted bboxes).
        t_finite = jnp.all(jnp.abs(tc) < 1.0e8, axis=-1, keepdims=True)
        t_origin = jnp.min(jnp.where(t_finite, tc, jnp.inf), axis=0)
        t_origin = jnp.where(jnp.isfinite(t_origin), t_origin, 0.0)
        tcode = morton_codes32(tc, 1.0, origin=t_origin)
        _, tperm = jax.lax.sort(
            (tcode, jnp.arange(m, dtype=jnp.int32)), num_keys=1
        )
        trows = trows[tperm]
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
        # One fused [N,14] source gather (points 4 | payload 9 | valid 1)
        # instead of three.
        srows = jnp.concatenate(
            [source_points.astype(jnp.float32), s_payload, valid[:, None]],
            axis=1,
        )[sperm]
        source_points = srows[:, 0:4].astype(source_points.dtype)
        s_payload = srows[:, 4:13]
        valid = srows[:, 13]

    ttab = jnp.concatenate(
        [trows, jnp.zeros((m, 4), jnp.float32)],
        axis=1,
    )  # [M, 16]
    if mp != m:
        padrow = jnp.zeros((mp - m, 16), jnp.float32).at[:, :3].set(1.0e12)
        ttab = jnp.concatenate([ttab, padrow], axis=0)
    # Col 12 = ‖t‖² (computed AFTER padding so sentinel rows score huge):
    # the mxu_dist kernel variant reads it to form ‖t‖² − 2 t·q with one
    # K=16 MXU dot of the raw tile (see _fused_kernel_listed). Unused by
    # the VPU-distance path; the one-hot payload extraction only
    # consumes rows 0-11.
    ttab = ttab.at[:, 12].set(jnp.sum(ttab[:, :3] ** 2, axis=1))

    # Per-thin-tile bboxes over finite rows (sentinel rows excluded —
    # they can never be accepted correspondences, so a tile of them may
    # prune).
    n_tt = mp // ts
    tcoord = ttab[:, :3].reshape(n_tt, ts, 3)
    finite = jnp.all(jnp.abs(tcoord) < 1.0e8, axis=-1, keepdims=True)
    lo = jnp.min(jnp.where(finite, tcoord, _BIG), axis=1)  # [n_tt,3]
    hi = jnp.max(jnp.where(finite, tcoord, -_BIG), axis=1)
    tb = jnp.concatenate(
        [lo, hi, jnp.zeros((n_tt, 2), jnp.float32)], axis=1
    ).reshape(1, n_tt * 8)

    qtab = jnp.concatenate(
        [
            source_points[:, :3].astype(jnp.float32),
            s_payload,
            valid[:, None],
            jnp.zeros((n, 3), jnp.float32),
        ],
        axis=1,
    )
    if qp != n:
        qtab = jnp.concatenate([qtab, jnp.zeros((qp - n, 16), jnp.float32)], axis=0)
    qtab = qtab.T  # [16, QP]

    sorted_src = source_points
    if qp != n:
        sorted_src = jnp.concatenate(
            [sorted_src, jnp.zeros((qp - n, 4), sorted_src.dtype)], axis=0
        )
    return ttab, tb, qtab, sorted_src, sperm, ttab.T.copy()


@partial(jax.jit, static_argnames=(
    "block_q", "block_m", "interpret", "factor", "robust", "mxu_dist"))
def gicp_linearize_tables(
    ttab: jax.Array,  # [MP,16] from gicp_prepare
    tb: jax.Array,  # [1, n_tt*8]
    qtab: jax.Array,  # [16, QP]
    T: jax.Array,  # [4,4]
    max_dist_sq,
    ttab_T: jax.Array = None,  # [16,MP] (gicp_prepare; for the listed path)
    block_q: int = 512,
    block_m: int = 1024,
    interpret: bool = False,
    factor: str = "gicp",
    robust: str = None,
    robust_c=1.0,
    mxu_dist: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-iteration fused search+linearize over prepared tables.

    mxu_dist=True evaluates the distance tiles on the MXU (score form
    ‖t‖² − 2 t·q with the winner's exact d² recomputed at finalize) —
    the round-5 roofline experiment; only active on the row-major
    list-driven path (mp ≤ 64k). Near-exact: an argmin between two
    targets whose d² differ by less than the f32 score rounding
    (~‖q‖²·2⁻²⁴) may pick the other, exactly the tolerance class of
    the XLA brute-force oracle's matmul form (ops/knn.py).

    Returns (H [6,6] f32, b [6] f32, num_inliers f32 scalar,
    corr16 [16,QP]) — the ONLY quantities an optimizer iteration needs
    (all permutation-invariant or opaque), so no per-point
    post-processing runs in the loop. The inlier count rides in the
    kernel's own acc reduction (row 43 = mask sum).
    """
    mp = ttab.shape[0]
    qp = qtab.shape[1]
    n_tt = tb.shape[1] // 8
    ts = mp // n_tt
    _, block_m, block_q, mp2, qp2 = _sizes(mp, qp, block_q, block_m, ts)
    assert mp2 == mp and qp2 == qp, "tables not produced by gicp_prepare"

    Tf = T.astype(jnp.float32)
    nt = jnp.concatenate(
        [
            Tf[:3, :3].reshape(-1),
            Tf[:3, 3],
            jnp.asarray(max_dist_sq, jnp.float32).reshape(-1)[:1],
            jnp.asarray(robust_c, jnp.float32).reshape(-1)[:1],
            jnp.zeros((6,), jnp.float32),
        ]
    )[None, :]  # [1, 20] (2-D so vmap's squeezed batch dim lowers — see kernel)

    n_qb = qp // block_q
    if ttab_T is None:
        ttab_T = ttab.T
    if mp <= _LISTED_MP_CAP:
        # Single-superblock fast path: the whole target is VMEM-resident
        # and each query block iterates ONLY its live thin tiles. The
        # live set is a few hundred scalar bbox gap tests — computed
        # here in XLA per iteration (transformed query-block bboxes vs
        # tb), because in-kernel `pl.when` pruning PREDICATES instead of
        # branching (see _fused_kernel_listed).
        L = min(n_tt, 96)
        qf = qtab.astype(jnp.float32)
        R = Tf[:3, :3]
        tvec = Tf[:3, 3]
        txq = R @ qf[0:3, :] + tvec[:, None]  # [3, QP] transformed
        valid = qf[12:13, :] > 0.5
        qb = txq.reshape(3, n_qb, block_q)
        vb = valid.reshape(1, n_qb, block_q)
        lo = jnp.min(jnp.where(vb, qb, _BIG), axis=2)  # [3, n_qb]
        hi = jnp.max(jnp.where(vb, qb, -_BIG), axis=2)
        tbr = tb.reshape(n_tt, 8)
        gaps = jnp.maximum(
            0.0,
            jnp.maximum(
                tbr[None, :, 0:3] - hi.T[:, None, :],
                lo.T[:, None, :] - tbr[None, :, 3:6],
            ),
        )  # [n_qb, n_tt, 3]
        gap2 = jnp.sum(gaps * gaps, axis=-1)
        live = ~(
            gap2 > jnp.asarray(max_dist_sq, jnp.float32)
        )  # NaN-safe keep
        counts = jnp.sum(live, axis=1).astype(jnp.int32)  # [n_qb]
        key = jnp.where(live, jnp.arange(n_tt, dtype=jnp.int32), jnp.int32(2**30))
        lists = jnp.sort(key, axis=1)[:, :L].reshape(1, n_qb * L)
        counts = counts[None, :]

        # Row-major target below 64k rows (no per-tile transposes; the
        # (8,128)-tiling 8x padding still fits VMEM), dense transposed
        # layout above (padding would OOM the 128 MB VMEM).
        use_T = mp > 65536
        t_in = ttab_T if use_T else ttab
        t_spec = (
            pl.BlockSpec((16, mp), lambda qi: (0, 0), memory_space=pltpu.VMEM)
            if use_T
            else pl.BlockSpec(
                (mp, 16), lambda qi: (0, 0), memory_space=pltpu.VMEM
            )
        )
        grid = (n_qb,)
        with jax.enable_x64(False):
            corr, acc = pl.pallas_call(
                partial(_fused_kernel_listed, ts=ts, L=L, transposed=use_T,
                        factor=factor, robust=robust, mxu_dist=mxu_dist),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    t_spec,
                    pl.BlockSpec(
                        (16, block_q), lambda qi: (0, qi),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (16, block_q), lambda qi: (0, qi),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (8, 128), lambda qi: (qi, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((16, qp), jnp.float32),
                    jax.ShapeDtypeStruct((n_qb * 8, 128), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((8, block_q), jnp.float32),
                    pltpu.VMEM((16, block_q), jnp.float32),
                ],
                interpret=interpret,
            )(nt, lists, counts, t_in, qtab)
    else:
        grid = (n_qb, mp // block_m)
        with jax.enable_x64(False):
            corr, acc = pl.pallas_call(
                partial(_fused_kernel, ts=ts, factor=factor, robust=robust),
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
                        (8, 128), lambda qi, mi: (qi, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((16, qp), jnp.float32),
                    jax.ShapeDtypeStruct((n_qb * 8, 128), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((8, block_q), jnp.float32),
                    pltpu.VMEM((16, block_q), jnp.float32),
                    pltpu.SMEM((8,), jnp.float32),
                ],
                interpret=interpret,
            )(nt, tb, ttab, qtab)

    # Cross-block accumulation in f64 (when available), like the
    # reference's double reduction accumulators (reduction.hpp); per-
    # block sums are f32 over ≤block_q terms inside the kernel.
    from small_gicp_tpu.models.factors import _error_accum_dtype

    acc_dt = _error_accum_dtype(jnp.float32)
    sums = jnp.sum(acc.astype(acc_dt), axis=0) / 8.0  # 8 replicated rows
    H = sums[:36].reshape(6, 6).astype(jnp.float32)
    b = sums[36:42].astype(jnp.float32)
    inliers = sums[43].astype(jnp.float32)
    return H, b, inliers, corr


@partial(jax.jit, static_argnames=(
    "block_q", "block_m", "interpret", "sort", "factor", "robust"))
def gicp_linearize_pallas(
    target_points: jax.Array,  # [M,4]
    target_covs: jax.Array,  # [M,3,3] (GICP) or None
    source_points: jax.Array,  # [N,4]
    source_covs: jax.Array,  # [N,3,3] (GICP) or None
    T: jax.Array,  # [4,4]
    num_points: jax.Array,  # scalar int32 (valid source rows)
    max_dist_sq,
    block_q: int = 512,
    block_m: int = 1024,
    interpret: bool = False,
    sort: bool = True,
    factor: str = "gicp",
    target_normals: jax.Array = None,  # [M,4] (plane_icp)
    robust: str = None,
    robust_c=1.0,
) -> Tuple[jax.Array, ...]:
    """Fused GICP search+linearize (standalone convenience entry:
    gicp_prepare + gicp_linearize_tables + per-point output extraction).
    Optimizer loops should call the two stages directly so preparation
    runs once, not per iteration.

    Returns (H [6,6], b [6], target_mu [N,3], W [N,3,3], mask [N] bool,
    sq_dists [N], corr16 [16,QP] raw lane-major correspondence buffer
    for gicp_error_multi_pallas, sorted_source [QP,4] the Morton-sorted
    padded source points corr16 is aligned with) — H/b match
    factors.linearize over the correspondences that
    _search_correspondences would produce with an exact NN (up to f32
    reduction order). mu/W/mask/sq are in ORIGINAL source row order.

    Pruning is exact within the rejector radius (see _fused_kernel
    docstring).
    """
    n = source_points.shape[0]
    dtype = source_points.dtype

    ttab, tb, qtab, sorted_src, sperm, ttab_T = gicp_prepare(
        target_points, target_covs, source_points, source_covs, num_points,
        block_q=block_q, block_m=block_m, sort=sort, factor=factor,
        target_normals=target_normals,
    )
    H, b, _inliers, corr16 = gicp_linearize_tables(
        ttab, tb, qtab, T, max_dist_sq, ttab_T,
        block_q=block_q, block_m=block_m, interpret=interpret, factor=factor,
        robust=robust, robust_c=robust_c,
    )
    H = H.astype(dtype)
    b = b.astype(dtype)
    corr = corr16[:, :n].T  # [N, 16] in sorted order
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


def _trials_kernel(ps_ref, c_ref, q_ref, acc_ref, lane: bool = False,
                   robust: str = None, rc_ref=None):
    """All LM trial errors in one pass.

    ps_ref: SMEM [1, 12*(K+1)] rows of [R row-major 9 | t 3] per pose
    (2-D for the same vmap-batching reason as _fused_kernel's nt_ref);
    c_ref: VMEM [16, BQ] frozen correspondence block (rows 0-2 mu,
    3-11 W row-major, 12 mask); q_ref: VMEM [16, BQ] source block
    (rows 0-2 p); acc_ref: [8, 128] out — cols 0..K hold the block's
    error sums for each pose (8 replicated rows, caller divides).

    lane=True is the fleet path: ps_ref is the FULL [B, 12*K1] SMEM
    array (lane-blocked SMEM windows fail Mosaic's block-shape check)
    and the kernel reads its lane's row at program_id(0).

    robust/rc_ref: Huber/Cauchy re-weighting w(√e_i)·e_i recomputed at
    EVERY pose — RobustFactor::error semantics (robust_kernel.hpp:95-97:
    the weight tracks the trial pose's own error, not the linearization
    pose's). rc_ref is a [1,1] SMEM scalar holding c.
    """
    li = pl.program_id(0) if lane else 0
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
        p_ = lambda j: ps_ref[li, o + j]
        qx = p_(0) * px + p_(1) * py + p_(2) * pz + p_(9)
        qy = p_(3) * px + p_(4) * py + p_(5) * pz + p_(10)
        qz = p_(6) * px + p_(7) * py + p_(8) * pz + p_(11)
        rx = mux - qx
        ry = muy - qy
        rz = muz - qz
        wr0 = w[0] * rx + w[1] * ry + w[2] * rz
        wr1 = w[3] * rx + w[4] * ry + w[5] * rz
        wr2 = w[6] * rx + w[7] * ry + w[8] * rz
        e_k = 0.5 * (rx * wr0 + ry * wr1 + rz * wr2)
        if robust is not None:
            e_k = _robust_w(robust, rc_ref[0, 0], e_k) * e_k
        rows.append(e_k * mask)
    rows += [jnp.zeros_like(px)] * (128 - len(rows))
    v = jnp.concatenate(rows, axis=0)  # [128, BQ]
    bq = px.shape[1]
    ones8 = jnp.ones((8, bq), jnp.float32)
    acc_ref[:] = jax.lax.dot_general(
        ones8, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("block_q", "interpret", "robust"))
def gicp_error_multi_pallas(
    corr16: jax.Array,  # [16, QP] raw buffer from gicp_linearize_pallas
    source_points: jax.Array,  # [N,4]
    Ts: jax.Array,  # [K1,4,4] poses (current pose first, then trials)
    num_points: jax.Array,  # scalar int32
    block_q: int = 512,
    interpret: bool = False,
    robust: str = None,
    robust_c=1.0,
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
    if robust is not None:
        kernel = lambda ps_r, rc_r, c_r, q_r, a_r: _trials_kernel(
            ps_r, c_r, q_r, a_r, robust=robust, rc_ref=rc_r
        )
        extra_in = [jnp.asarray(robust_c, jnp.float32).reshape(1, 1)]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    else:
        kernel = _trials_kernel
        extra_in, extra_specs = [], []
    with jax.enable_x64(False):
        acc = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *extra_specs,
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
        )(ps, *extra_in, corr16, qtab)

    from small_gicp_tpu.models.factors import _error_accum_dtype

    acc_dt = _error_accum_dtype(source_points.dtype)
    per_block = acc[::8, :k1].astype(acc_dt)  # one row per block
    return jnp.sum(per_block, axis=0).astype(acc_dt)


# ======================================================================
# Fleet variants: B resident lanes over U unique prepared pairs.
#
# The persistent-lane scheduler (parallel/fleet.py) keeps B lanes busy
# on a queue of P registration problems; a lane that retires one
# problem immediately loads the next, so the batch never runs lockstep
# to its slowest member (the vmapped batch's 1.5x waste). Lanes address
# their pair's tables IN PLACE through a scalar-prefetch indirection —
# the lane->pair id rides in SMEM and the BlockSpec index_maps consume
# it, so switching a lane's problem moves ZERO table bytes.
# ======================================================================


@partial(jax.jit, static_argnames=("block_q", "block_m", "ts", "factor"))
def gicp_fleet_prepare(
    target_points: jax.Array,  # [U,M,4]
    target_covs: jax.Array,  # [U,M,3,3] (GICP) or None
    source_points: jax.Array,  # [U,N,4]
    source_covs: jax.Array,  # [U,N,3,3] (GICP) or None
    num_points: jax.Array,  # [U] valid source rows
    block_q: int = 512,
    block_m: int = 1024,
    ts: int = _TS_DEFAULT,
    factor: str = "gicp",
    target_normals: jax.Array = None,  # [U,M,4] (plane_icp)
) -> Tuple[jax.Array, ...]:
    """gicp_prepare over U stacked pairs + per-query-block bboxes.

    `factor` selects the per-pair payload exactly as in gicp_prepare
    ("gicp" needs covs, "plane_icp" target normals, "icp" neither).

    Returns (ttabs [U,MP,16], tbs [U,n_tt*8], qtabs [U,16,QP],
    qbbs [U,n_qb,6]). qbbs are the UNtransformed per-block source
    bboxes over valid rows; the fleet linearize transforms their 8
    corners per lane pose (a superset of the per-point transformed
    bbox, so tile pruning stays exactness-preserving) instead of
    re-reducing QP transformed points every round.
    """
    if factor == "gicp":
        ttabs, tbs, qtabs, _srcs, _sperm, _ttabTs = jax.vmap(
            lambda tp, tc, sp, sc, n: gicp_prepare(
                tp, tc, sp, sc, n, block_q=block_q, block_m=block_m, ts=ts
            )
        )(target_points, target_covs, source_points, source_covs,
          num_points)
    elif factor == "plane_icp":
        ttabs, tbs, qtabs, _srcs, _sperm, _ttabTs = jax.vmap(
            lambda tp, tn, sp, n: gicp_prepare(
                tp, None, sp, None, n, block_q=block_q, block_m=block_m,
                ts=ts, factor="plane_icp", target_normals=tn,
            )
        )(target_points, target_normals, source_points, num_points)
    elif factor == "icp":
        ttabs, tbs, qtabs, _srcs, _sperm, _ttabTs = jax.vmap(
            lambda tp, sp, n: gicp_prepare(
                tp, None, sp, None, n, block_q=block_q, block_m=block_m,
                ts=ts, factor="icp",
            )
        )(target_points, source_points, num_points)
    else:
        raise ValueError(f"unknown fused factor {factor!r}")
    tbs = tbs.reshape(tbs.shape[0], -1)  # [U,1,n_tt*8] -> [U,n_tt*8]

    u, _, qp = qtabs.shape
    # gicp_prepare clamps block_q to the (128-rounded) capacity; mirror
    # that here — qp IS the clamped block size when capacity < block_q.
    block_q = min(block_q, qp)
    n_qb = qp // block_q
    xyz = qtabs[:, 0:3, :].reshape(u, 3, n_qb, block_q)
    val = (qtabs[:, 12:13, :] > 0.5).reshape(u, 1, n_qb, block_q)
    lo = jnp.min(jnp.where(val, xyz, _BIG), axis=-1)  # [U,3,n_qb]
    hi = jnp.max(jnp.where(val, xyz, -_BIG), axis=-1)
    qbbs = jnp.concatenate(
        [lo.transpose(0, 2, 1), hi.transpose(0, 2, 1)], axis=-1
    )  # [U,n_qb,6]
    return ttabs, tbs, qtabs, qbbs


def _fleet_live_lists(tbs, qbbs, uids, Ts, max_dist_sq, active, L):
    """Per-lane live thin-tile lists from bbox gap tests (XLA side).

    Transforms each query block's 8 bbox corners by the lane pose — a
    superset of the transformed per-point bbox, so pruning on it is
    exactness-preserving — and keeps tiles whose gap to that box is
    within the rejector radius. Inactive lanes get empty lists (their
    kernel trip count is 0; the finalize masks everything out)."""
    f32 = jnp.float32
    Tf = Ts.astype(f32)
    R = Tf[:, :3, :3]  # [B,3,3]
    tv = Tf[:, :3, 3]  # [B,3]
    qbb = qbbs[uids]  # [B,n_qb,6]
    lo, hi = qbb[..., :3], qbb[..., 3:]
    ok_blk = jnp.all(lo <= hi, axis=-1)  # [B,n_qb]; inverted = no valid rows
    # 8 corners [B,n_qb,8,3]
    combo = jnp.asarray(
        [[(c >> a) & 1 for a in range(3)] for c in range(8)], f32
    )  # [8,3]
    corners = (
        lo[:, :, None, :] * (1.0 - combo)[None, None]
        + hi[:, :, None, :] * combo[None, None]
    )
    tc = (
        jnp.einsum("bij,bqcj->bqci", R, corners,
                   precision=jax.lax.Precision.HIGHEST)
        + tv[:, None, None, :]
    )
    tlo = jnp.where(ok_blk[..., None], jnp.min(tc, axis=2), _BIG)
    thi = jnp.where(ok_blk[..., None], jnp.max(tc, axis=2), -_BIG)

    b, n_tt = tbs[uids].shape[0], tbs.shape[1] // 8
    tbr = tbs[uids].reshape(b, n_tt, 8)
    gaps = jnp.maximum(
        0.0,
        jnp.maximum(
            tbr[:, None, :, 0:3] - thi[:, :, None, :],
            tlo[:, :, None, :] - tbr[:, None, :, 3:6],
        ),
    )  # [B,n_qb,n_tt,3]
    gap2 = jnp.sum(gaps * gaps, axis=-1)
    live = ~(gap2 > jnp.asarray(max_dist_sq, f32))  # NaN-safe keep
    live = live & active[:, None, None]
    counts = jnp.sum(live, axis=-1).astype(jnp.int32)  # [B,n_qb]
    key = jnp.where(
        live, jnp.arange(n_tt, dtype=jnp.int32), jnp.int32(2**30)
    )
    lists = jnp.sort(key, axis=-1)[..., :L].reshape(b, -1)
    return lists, counts


@partial(jax.jit, static_argnames=("block_q", "interpret", "robust", "factor"))
def gicp_linearize_fleet(
    ttabs: jax.Array,  # [U,MP,16] from gicp_fleet_prepare
    tbs: jax.Array,  # [U,n_tt*8]
    qtabs: jax.Array,  # [U,16,QP]
    qbbs: jax.Array,  # [U,n_qb,6]
    uids: jax.Array,  # [B] lane -> pair id
    Ts: jax.Array,  # [B,4,4]
    max_dist_sq,
    active: jax.Array,  # [B] bool
    block_q: int = 512,
    interpret: bool = False,
    robust: str = None,
    robust_c=1.0,
    factor: str = "gicp",
) -> Tuple[jax.Array, ...]:
    """Per-round fused search+linearize for B lanes over U pairs.

    One pallas_call with grid (B, n_qb): lane b's target/source table
    blocks are DMA'd straight from ttabs[uids[b]] / qtabs[uids[b]] via
    scalar-prefetch index_maps (no gather materializes per-lane
    copies). Returns (H [B,6,6] f32, b [B,6], inliers [B],
    corr16 [B,16,QP]) — per-lane, same contract as
    gicp_linearize_tables.
    """
    u, mp, _ = ttabs.shape
    qp = qtabs.shape[2]
    n_tt = tbs.shape[1] // 8
    ts = mp // n_tt
    block_q = min(block_q, qp)  # small-capacity pairs (see fleet_prepare)
    n_qb = qp // block_q
    bsz = uids.shape[0]
    if mp > 65536:
        raise ValueError(
            "gicp_linearize_fleet keeps row-major [MP,16] targets "
            f"VMEM-resident; MP={mp} exceeds the 65536-row cap "
            "(use the single-pair map-scale path)"
        )
    L = min(n_tt, 96)

    lists, counts = _fleet_live_lists(
        tbs, qbbs, uids, Ts, max_dist_sq, active, L
    )

    Tf = Ts.astype(jnp.float32)
    nt = jnp.concatenate(
        [
            Tf[:, :3, :3].reshape(bsz, 9),
            Tf[:, :3, 3],
            jnp.broadcast_to(
                jnp.asarray(max_dist_sq, jnp.float32).reshape(1, 1),
                (bsz, 1),
            ),
            jnp.broadcast_to(
                jnp.asarray(robust_c, jnp.float32).reshape(1, 1),
                (bsz, 1),
            ),
            jnp.zeros((bsz, 6), jnp.float32),
        ],
        axis=1,
    )  # [B,20]

    kernel = partial(
        _fused_kernel_listed, ts=ts, L=L, transposed=False, qdim=1,
        robust=robust, factor=factor,
    )

    def fleet_kernel(uids_ref, nt_ref, lists_ref, counts_ref, t_ref,
                     q_ref, corr_ref, acc_ref, best_d, best_pay):
        del uids_ref  # consumed by the index_maps
        kernel(nt_ref, lists_ref, counts_ref, t_ref, q_ref, corr_ref,
               acc_ref, best_d, best_pay)

    # The three per-lane operands ride in SMEM as FULL [B, ...] arrays
    # (the kernel indexes its lane's row with program_id(0)): Mosaic
    # rejects lane-blocked SMEM windows — block (1, w) over [B, w]
    # fails the "second-to-last dim divisible by 8 or full" check.
    # SMEM footprint is dominated by lists: B * n_qb * L i32.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_qb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, mp, 16), lambda b, qi, u: (u[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 16, block_q), lambda b, qi, u: (u[b], 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, 16, block_q), lambda b, qi, u: (b, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda b, qi, u: (b * n_qb + qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((16, block_q), jnp.float32),
        ],
    )
    with jax.enable_x64(False):
        corr, acc = pl.pallas_call(
            fleet_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((bsz, 16, qp), jnp.float32),
                jax.ShapeDtypeStruct((bsz * n_qb * 8, 128), jnp.float32),
            ],
            interpret=interpret,
        )(uids.astype(jnp.int32), nt, lists, counts, ttabs, qtabs)

    from small_gicp_tpu.models.factors import _error_accum_dtype

    acc_dt = _error_accum_dtype(jnp.float32)
    sums = (
        jnp.sum(acc.reshape(bsz, n_qb * 8, 128).astype(acc_dt), axis=1)
        / 8.0
    )  # [B,128]; 8 replicated rows per block; f64 cross-block like the
    # reference's double reduction accumulators
    H = sums[:, :36].reshape(bsz, 6, 6).astype(jnp.float32)
    b = sums[:, 36:42].astype(jnp.float32)
    inliers = sums[:, 43].astype(jnp.float32)
    return H, b, inliers, corr


@partial(jax.jit, static_argnames=("block_q", "interpret", "robust"))
def gicp_error_multi_fleet(
    corr16: jax.Array,  # [B,16,QP] from gicp_linearize_fleet
    qtabs: jax.Array,  # [U,16,QP] (rows 0-2 = source xyz)
    uids: jax.Array,  # [B]
    Ts: jax.Array,  # [B,K1,4,4] per-lane poses (current first)
    block_q: int = 512,
    interpret: bool = False,
    robust: str = None,
    robust_c=1.0,
) -> jax.Array:
    """[B,K1] frozen-correspondence errors for B lanes in one kernel.

    Per-lane equivalent of gicp_error_multi_pallas; the source xyz rows
    are read from the lane's pair table via scalar prefetch, and the
    mask rides in corr16 row 12 (it already includes validity).
    """
    bsz, k1 = Ts.shape[0], Ts.shape[1]
    if k1 > 100:
        raise ValueError("at most 100 poses per call")
    qp = corr16.shape[2]
    block_q = min(block_q, qp)
    n_qb = qp // block_q

    Tf = Ts.astype(jnp.float32)
    ps = jnp.concatenate(
        [Tf[:, :, :3, :3].reshape(bsz, k1, 9), Tf[:, :, :3, 3]], axis=-1
    ).reshape(bsz, k1 * 12)  # [B, 12*K1]

    if robust is not None:
        def fleet_kernel(uids_ref, ps_ref, rc_ref, c_ref, q_ref, acc_ref):
            del uids_ref
            _trials_kernel(ps_ref, c_ref, q_ref, acc_ref, lane=True,
                           robust=robust, rc_ref=rc_ref)

        extra_in = [jnp.asarray(robust_c, jnp.float32).reshape(1, 1)]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    else:
        def fleet_kernel(uids_ref, ps_ref, c_ref, q_ref, acc_ref):
            del uids_ref
            _trials_kernel(ps_ref, c_ref, q_ref, acc_ref, lane=True)

        extra_in, extra_specs = [], []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_qb),
        in_specs=[
            # Full [B, 12*K1] SMEM row table (see _trials_kernel lane=True).
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *extra_specs,
            pl.BlockSpec((None, 16, block_q), lambda b, qi, u: (b, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 16, block_q), lambda b, qi, u: (u[b], 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, 128), lambda b, qi, u: (b * n_qb + qi, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    with jax.enable_x64(False):
        acc = pl.pallas_call(
            fleet_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (bsz * n_qb * 8, 128), jnp.float32
            ),
            interpret=interpret,
        )(uids.astype(jnp.int32), ps, *extra_in, corr16, qtabs)

    from small_gicp_tpu.models.factors import _error_accum_dtype

    acc_dt = _error_accum_dtype(jnp.float32)
    per_block = acc.reshape(bsz, n_qb, 8, 128)[:, :, 0, :k1].astype(acc_dt)
    return jnp.sum(per_block, axis=1)
