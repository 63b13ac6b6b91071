"""Pallas TPU kernel: fused exact self-kNN + covariance moments.

The covariance-estimation stage (reference: estimate_covariances,
util/normal_estimation.hpp:66-92 — kNN-20 per point, then neighbor
moments and a 3x3 eigendecomposition) was the last unfused hot loop of
the scan-to-model odometry step: the dense Pallas top-k kernel
(ops/knn_pallas.knn_pallas) measures ~14 ms at 16k self-kNN because it
scans all Q·M pairs and pays ~20 extraction passes per target tile.
This kernel keeps the exact-kNN semantics but only scans tiles that can
contain a top-k member:

  1. Morton-sort the cloud once (anchored at its min corner).
  2. XLA bound pass: each query's kth-distance UPPER BOUND from its
     Morton window (the 2W sorted neighbors via jnp.roll — any
     candidate subset's kth-best bounds the true kth-best from above,
     so pruning with it is exactness-preserving).
  3. XLA live lists: per 256-query block, the thin target tiles whose
     bbox gap to the block bbox is within the block's worst bound —
     the same outside-the-kernel pruning mechanism as the fused GICP
     kernel (in-kernel `pl.when` predicates instead of skipping;
     measured, see ops/gicp_fused_pallas._fused_kernel_listed).
  4. ONE list-driven kernel: per live tile, k extraction passes over
     the [BQ, TS] distance tile, maintaining per-lane top-k slots of
     (d², dx, dy, dz) — the winning candidates' QUERY-CENTERED offsets
     ride along, so the neighbor-gather that the XLA path pays
     (points[idx], a [N,k]-row gather) never happens. The kernel's
     output is the per-query moment row [Σd, Σddᵀ, count, d_k]; the
     caller finishes mean/cov/eigh exactly as ops/normals._estimate_impl
     (centering at the query is what the XLA path does too — it is what
     makes f32 second moments safe at map-scale coordinates).

Exact within fp tie-handling: ties are kept lexicographically by
(distance, sorted row id); an exact tie at the kth distance may select
a different member than the XLA path's original-id order — identical
moments up to the tied points' coordinates (they differ only when two
distinct points are exactly equidistant).

Round-5 layout "ti" (index-only kernel + XLA winner gather): the
k-scaling measurement showed extraction passes dominate (1.86 ms at
k=1 → 7.91 at k=20, 16k rows), and 6 of the ~10 [ts,BQ]-sized vector
ops per pass were the masked coordinate sums feeding the 4-scratch
payload carry. Carrying only (d², winner index) and paying the
[N,k]-row winner gather in XLA — the very gather the original design
avoided — measures FASTER standalone (5.98 vs 7.93 ms at 16k/k=20,
399 vs 503 ms at 393k; identical winners) but ~1.4 ms/scan SLOWER
inside the composed odometry program (29.8 vs 31.2 — the gather pays
the usual composition tax). The auto default therefore picks "t" at
scan scale (≤256k rows) and "ti" at map scale.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38
# Matches ops/normals._VALID_NEIGHBOR_SQ_DIST: beyond this the "neighbor"
# is a sentinel padding row.
_VALID_SQ = 1e16


def _make_moments_kernel(k: int, ts: int, L: int):
    def kernel(lists_ref, counts_ref, t_ref, q_ref, out_ref,
               rd, rdx, rdy, rdz):
        """lists_ref: SMEM [1, nQB*L] live tile ids; counts_ref: SMEM
        [1, nQB] (count > L => full scan); t_ref: VMEM [8, MP] rows
        x,y,z; q_ref: VMEM [BQ, 8] cols x,y,z; out_ref: VMEM [BQ, 16]
        moment rows; rd/rdx/rdy/rdz: VMEM scratch [BQ, k] top-k slots
        (squared distance + query-centered offsets of the winner)."""
        qi = pl.program_id(0)
        mp = t_ref.shape[1]
        n_tt = mp // ts
        bq = q_ref.shape[0]

        cnt = counts_ref[0, qi]
        use_list = cnt <= L
        n_iter = jnp.where(use_list, cnt, jnp.int32(n_tt))

        rd[:] = jnp.full_like(rd, _BIG)
        rdx[:] = jnp.zeros_like(rdx)
        rdy[:] = jnp.zeros_like(rdy)
        rdz[:] = jnp.zeros_like(rdz)

        qx = q_ref[:, 0:1]
        qy = q_ref[:, 1:2]
        qz = q_ref[:, 2:3]
        col0 = jax.lax.broadcasted_iota(jnp.int32, (bq, ts), 1)

        def visit(t, carry):
            jl = jnp.where(
                use_list,
                lists_ref[0, qi * L + jnp.minimum(t, L - 1)],
                t.astype(jnp.int32),
            )
            base = jl * ts
            dx = t_ref[0:1, pl.ds(base, ts)] - qx  # p − q, [BQ, ts]
            dy = t_ref[1:2, pl.ds(base, ts)] - qy
            dz = t_ref[2:3, pl.ds(base, ts)] - qz
            d2 = dx * dx + dy * dy + dz * dz
            col = col0 + base

            run_d, run_x, run_y, run_z = rd[:], rdx[:], rdy[:], rdz[:]
            for _ in range(k):
                m = jnp.min(d2, axis=1, keepdims=True)  # [BQ,1]
                midx = jnp.min(
                    jnp.where(d2 <= m, col, jnp.int32(2**30)),
                    axis=1, keepdims=True,
                )
                sel = col == midx
                wx = jnp.sum(jnp.where(sel, dx, 0.0), axis=1, keepdims=True)
                wy = jnp.sum(jnp.where(sel, dy, 0.0), axis=1, keepdims=True)
                wz = jnp.sum(jnp.where(sel, dz, 0.0), axis=1, keepdims=True)
                d2 = jnp.where(sel, _BIG, d2)
                # Lexicographic (d, slot-payload) insert: the slot's
                # "index" role is played by the winner's offsets — ties
                # are resolved by visit order, which the lex insert on
                # (d, col-extraction order) keeps deterministic. Shift
                # all four arrays with the same gt masks.
                gt = run_d > m
                prev_d = jnp.concatenate(
                    [jnp.full_like(run_d[:, :1], -_BIG), run_d[:, :-1]],
                    axis=1,
                )
                prev_x = jnp.concatenate([run_x[:, :1], run_x[:, :-1]], axis=1)
                prev_y = jnp.concatenate([run_y[:, :1], run_y[:, :-1]], axis=1)
                prev_z = jnp.concatenate([run_z[:, :1], run_z[:, :-1]], axis=1)
                prev_gt = prev_d > m
                run_d = jnp.where(gt, jnp.where(prev_gt, prev_d, m), run_d)
                run_x = jnp.where(gt, jnp.where(prev_gt, prev_x, wx), run_x)
                run_y = jnp.where(gt, jnp.where(prev_gt, prev_y, wy), run_y)
                run_z = jnp.where(gt, jnp.where(prev_gt, prev_z, wz), run_z)
            rd[:] = run_d
            rdx[:] = run_x
            rdy[:] = run_y
            rdz[:] = run_z
            return carry

        jax.lax.fori_loop(0, n_iter, visit, 0, unroll=1)

        # Per-lane moments over valid slots (same validity threshold as
        # ops/normals: beyond _VALID_SQ the hit is a sentinel pad row).
        run_d, run_x, run_y, run_z = rd[:], rdx[:], rdy[:], rdz[:]
        v = (run_d < _VALID_SQ).astype(jnp.float32)
        vx = run_x * v
        vy = run_y * v
        vz = run_z * v
        cols = [
            jnp.sum(vx, axis=1, keepdims=True),
            jnp.sum(vy, axis=1, keepdims=True),
            jnp.sum(vz, axis=1, keepdims=True),
            jnp.sum(vx * run_x, axis=1, keepdims=True),
            jnp.sum(vx * run_y, axis=1, keepdims=True),
            jnp.sum(vx * run_z, axis=1, keepdims=True),
            jnp.sum(vy * run_y, axis=1, keepdims=True),
            jnp.sum(vy * run_z, axis=1, keepdims=True),
            jnp.sum(vz * run_z, axis=1, keepdims=True),
            jnp.sum(v, axis=1, keepdims=True),
            run_d[:, k - 1:k],  # kth distance (diagnostic)
        ]
        cols += [jnp.zeros_like(cols[0])] * (16 - len(cols))
        out_ref[:] = jnp.concatenate(cols, axis=1)

    return kernel


def _make_moments_kernel_T(k: int, ts: int, L: int, kp: int):
    """Transposed-layout variant: queries on the LANE axis, targets on
    sublanes — the layout that makes the fused GICP kernel fast
    (ops/gicp_fused_pallas.py): every per-pass reduction (min / argmin /
    winner-select) runs along SUBLANES, which the VPU reduces with a few
    shuffle steps, instead of along 128 lanes. Top-k slots live as
    [kp, BQ] scratch rows (kp = k padded to a sublane multiple) and
    insertion shifts along the sublane axis.

    lists_ref: SMEM [1, nQB*L]; counts_ref: SMEM [1, nQB];
    t_ref: VMEM [8, MP] dense rows x,y,z (a [MP, 8] row-major window
    would pad its 8 lanes to 128 — an 8x VMEM waste that blew the 16 MB
    scoped limit at 16k; instead each tile pays three thin [1,ts]→[ts,1]
    transposes, the same trade the fused GICP kernel's transposed mode
    makes); q_ref: VMEM [8, BQ] rows x,y,z; out_ref: VMEM [16, BQ]
    moment rows.
    """

    def kernel(lists_ref, counts_ref, t_ref, q_ref, out_ref,
               rd, rdx, rdy, rdz):
        qi = pl.program_id(0)
        mp = t_ref.shape[1]
        n_tt = mp // ts
        bq = q_ref.shape[1]

        cnt = counts_ref[0, qi]
        use_list = cnt <= L
        n_iter = jnp.where(use_list, cnt, jnp.int32(n_tt))

        rd[:] = jnp.full_like(rd, _BIG)
        rdx[:] = jnp.zeros_like(rdx)
        rdy[:] = jnp.zeros_like(rdy)
        rdz[:] = jnp.zeros_like(rdz)

        qx = q_ref[0:1, :]
        qy = q_ref[1:2, :]
        qz = q_ref[2:3, :]
        row0 = jax.lax.broadcasted_iota(jnp.int32, (ts, bq), 0)

        def visit(t, carry):
            jl = jnp.where(
                use_list,
                lists_ref[0, qi * L + jnp.minimum(t, L - 1)],
                t.astype(jnp.int32),
            )
            t16 = t_ref[:, pl.ds(jl * ts, ts)]  # [8, ts]
            tx_ = jnp.transpose(t16[0:1, :], (1, 0))  # [ts, 1]
            ty_ = jnp.transpose(t16[1:2, :], (1, 0))
            tz_ = jnp.transpose(t16[2:3, :], (1, 0))
            dx = tx_ - qx  # p − q, [ts, BQ]
            dy = ty_ - qy
            dz = tz_ - qz
            d2 = dx * dx + dy * dy + dz * dz

            run_d, run_x, run_y, run_z = rd[:], rdx[:], rdy[:], rdz[:]
            for _ in range(k):
                m = jnp.min(d2, axis=0, keepdims=True)  # [1, BQ]
                midx = jnp.min(
                    jnp.where(d2 <= m, row0, jnp.int32(2**30)),
                    axis=0, keepdims=True,
                )
                sel = row0 == midx
                wx = jnp.sum(jnp.where(sel, dx, 0.0), axis=0, keepdims=True)
                wy = jnp.sum(jnp.where(sel, dy, 0.0), axis=0, keepdims=True)
                wz = jnp.sum(jnp.where(sel, dz, 0.0), axis=0, keepdims=True)
                d2 = jnp.where(sel, _BIG, d2)
                gt = run_d > m  # [kp, BQ], sorted rows: False then True
                prev_d = jnp.concatenate(
                    [jnp.full_like(run_d[:1], -_BIG), run_d[:-1]], axis=0
                )
                prev_x = jnp.concatenate([run_x[:1], run_x[:-1]], axis=0)
                prev_y = jnp.concatenate([run_y[:1], run_y[:-1]], axis=0)
                prev_z = jnp.concatenate([run_z[:1], run_z[:-1]], axis=0)
                prev_gt = prev_d > m
                run_d = jnp.where(gt, jnp.where(prev_gt, prev_d, m), run_d)
                run_x = jnp.where(gt, jnp.where(prev_gt, prev_x, wx), run_x)
                run_y = jnp.where(gt, jnp.where(prev_gt, prev_y, wy), run_y)
                run_z = jnp.where(gt, jnp.where(prev_gt, prev_z, wz), run_z)
            rd[:] = run_d
            rdx[:] = run_x
            rdy[:] = run_y
            rdz[:] = run_z
            return carry

        jax.lax.fori_loop(0, n_iter, visit, 0, unroll=1)

        run_d, run_x, run_y, run_z = rd[:], rdx[:], rdy[:], rdz[:]
        slot = jax.lax.broadcasted_iota(jnp.int32, (kp, bq), 0)
        v = ((run_d < _VALID_SQ) & (slot < k)).astype(jnp.float32)
        vx = run_x * v
        vy = run_y * v
        vz = run_z * v
        rows_out = [
            jnp.sum(vx, axis=0, keepdims=True),
            jnp.sum(vy, axis=0, keepdims=True),
            jnp.sum(vz, axis=0, keepdims=True),
            jnp.sum(vx * run_x, axis=0, keepdims=True),
            jnp.sum(vx * run_y, axis=0, keepdims=True),
            jnp.sum(vx * run_z, axis=0, keepdims=True),
            jnp.sum(vy * run_y, axis=0, keepdims=True),
            jnp.sum(vy * run_z, axis=0, keepdims=True),
            jnp.sum(vz * run_z, axis=0, keepdims=True),
            jnp.sum(v, axis=0, keepdims=True),
            run_d[k - 1:k, :],
        ]
        rows_out += [jnp.zeros_like(rows_out[0])] * (16 - len(rows_out))
        out_ref[:] = jnp.concatenate(rows_out, axis=0)

    return kernel


def _make_topk_idx_kernel_T(k: int, ts: int, L: int, kp: int):
    """Index-only variant of the transposed moments kernel (round-5
    pass-cost experiment): the k-scaling measurement (1.86 ms at k=1 →
    7.91 ms at k=20, 16k rows) shows extraction passes dominate, and
    within a pass the three masked coordinate sums are 6 of the ~10
    [ts, BQ]-sized vector ops. This kernel keeps only (d², global row
    index) in the top-k scratch — per pass: one min, one masked
    index-min, one invalidate — and leaves the winner-coordinate
    gather + moment sums to XLA (one [N,k]-row gather, the cost the
    4-scratch kernel was designed to avoid; at k=20 the trade measures
    in the caller's favor — see BENCHMARK.md)."""

    def kernel(lists_ref, counts_ref, t_ref, q_ref, out_ref, rd, ri):
        qi = pl.program_id(0)
        mp = t_ref.shape[1]
        n_tt = mp // ts
        bq = q_ref.shape[1]

        cnt = counts_ref[0, qi]
        use_list = cnt <= L
        n_iter = jnp.where(use_list, cnt, jnp.int32(n_tt))

        rd[:] = jnp.full_like(rd, _BIG)
        # Unfilled-slot marker: 2^25 survives the f32 output exactly and
        # is distinguishable from any real row id (mp ≤ 2^20).
        ri[:] = jnp.full_like(ri, jnp.int32(1 << 25))

        qx = q_ref[0:1, :]
        qy = q_ref[1:2, :]
        qz = q_ref[2:3, :]
        row0 = jax.lax.broadcasted_iota(jnp.int32, (ts, bq), 0)

        def visit(t, carry):
            jl = jnp.where(
                use_list,
                lists_ref[0, qi * L + jnp.minimum(t, L - 1)],
                t.astype(jnp.int32),
            )
            t16 = t_ref[:, pl.ds(jl * ts, ts)]  # [8, ts]
            tx_ = jnp.transpose(t16[0:1, :], (1, 0))
            ty_ = jnp.transpose(t16[1:2, :], (1, 0))
            tz_ = jnp.transpose(t16[2:3, :], (1, 0))
            dx = tx_ - qx
            dy = ty_ - qy
            dz = tz_ - qz
            d2 = dx * dx + dy * dy + dz * dz  # [ts, BQ]
            gidx = row0 + jl * ts

            run_d, run_i = rd[:], ri[:]
            for _ in range(k):
                m = jnp.min(d2, axis=0, keepdims=True)  # [1, BQ]
                midx = jnp.min(
                    jnp.where(d2 <= m, gidx, jnp.int32(2**30)),
                    axis=0, keepdims=True,
                )
                d2 = jnp.where(gidx == midx, _BIG, d2)
                gt = run_d > m  # [kp, BQ]
                prev_d = jnp.concatenate(
                    [jnp.full_like(run_d[:1], -_BIG), run_d[:-1]], axis=0
                )
                prev_i = jnp.concatenate([run_i[:1], run_i[:-1]], axis=0)
                prev_gt = prev_d > m
                run_d = jnp.where(gt, jnp.where(prev_gt, prev_d, m), run_d)
                run_i = jnp.where(
                    gt, jnp.where(prev_gt, prev_i, midx), run_i
                )
            rd[:] = run_d
            ri[:] = run_i
            return carry

        jax.lax.fori_loop(0, n_iter, visit, 0, unroll=1)

        run_d, run_i = rd[:], ri[:]
        rows_out = [
            # winner indices as exact f32 (mp ≤ 1M < 2^24)
            run_i[j:j + 1, :].astype(jnp.float32) for j in range(k)
        ]
        rows_out.append(run_d[k - 1:k, :])  # kth distance (diagnostic)
        outr = (k + 8) // 8 * 8  # k idx rows + 1 dist, sublane-padded
        rows_out += [jnp.zeros_like(rows_out[0])] * (outr - len(rows_out))
        out_ref[:] = jnp.concatenate(rows_out, axis=0)

    return kernel


@partial(
    jax.jit,
    static_argnames=("k", "block_q", "ts", "window", "interpret", "layout"),
)
def knn_moments_pallas(
    points: jax.Array,  # [N,4] padded homogeneous
    num_points: jax.Array,  # scalar int32
    k: int,
    block_q: int = 256,  # chip sweep: 256 beats 512 (12.7 vs 16.0 ms @16k)
    ts: int = 1024,
    window: int = 0,  # 0 = auto
    interpret: bool = False,
    layout: str = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact self-kNN moments: returns (m1 [N,3] = Σ(p−q) over the k
    nearest, m2 [N,3,3] = Σ(p−q)(p−q)ᵀ, counts [N]) in ORIGINAL row
    order. Membership matches brute-force kNN (ties may resolve to a
    different but exactly-equidistant member — see module docstring).

    f32 TPU path; the sorted cloud stays VMEM-resident as a dense
    [8, MP] block (MP·32 B). Under the default ~16 MB scoped-VMEM
    budget that caps at ≈256k rows; above that (round-5 tiling item)
    the call raises the Mosaic scoped-VMEM limit to 100 MB (the
    chip has 128 MB) and bumps block_q to 512 so the SMEM live-tile
    lists stay bounded — practical ceiling ≈ 1M rows, enforced below
    (the table is 32 MB and the [ts, BQ] visit temporaries ~8 MB each
    at that size).
    """
    if layout is None:
        # Auto default (round-5 measurements): the 4-scratch "t" kernel
        # wins IN COMPOSITION at scan scale (odometry 29.8 vs 31.2
        # ms/scan — the "ti" winner gather pays the same composition
        # tax as every other big gather in this codebase), while the
        # index-only "ti" kernel wins at map scale where extraction
        # passes dominate (399 vs 503 ms at 393k standalone).
        layout = "t" if points.shape[0] <= 262_144 else "ti"
    if k > 64:
        raise ValueError(f"knn_moments_pallas supports k<=64, got {k}")
    if window and window < k:
        # The bound pass takes the kth smallest of the window's
        # distances; w < k would fail deep inside top_k with an obscure
        # trace-time error.
        raise ValueError(f"window must be >= k (got window={window}, k={k})")
    if points.shape[0] > 1_048_576:
        raise ValueError(
            "knn_moments_pallas keeps the whole sorted cloud VMEM-"
            f"resident; N={points.shape[0]} exceeds the ~1M-row VMEM "
            "envelope (use the dense knn path for larger clouds)"
        )
    big = points.shape[0] > 262_144
    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        if big else None
    )
    if big:
        block_q = max(block_q, 512)
    from small_gicp_tpu.ops.knn_window import morton_codes32

    n = points.shape[0]
    while (n + ts - 1) // ts > 384:
        ts *= 2
    mp = (n + ts - 1) // ts * ts
    block_q = min(block_q, (n + 127) // 128 * 128)
    qp = (n + block_q - 1) // block_q * block_q
    w = window or max(64, 2 * k + 24)

    xyz = jnp.clip(points[:, :3].astype(jnp.float32), -1.0e12, 1.0e12)
    finite = jnp.all(jnp.abs(xyz) < 1.0e8, axis=-1)
    origin = jnp.min(jnp.where(finite[:, None], xyz, jnp.inf), axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    code = morton_codes32(
        jnp.where(finite[:, None], xyz, jnp.inf), 1.0, origin=origin
    )
    _, perm = jax.lax.sort((code, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    sc = xyz[perm]  # sorted coords; invalid (sentinel) rows last

    # ---- bound pass: kth-distance upper bound from the Morton window.
    # Any ≥k-member candidate subset's kth-best ≥ the true kth-best, so
    # the window bound is a valid pruning radius. Rolled (wrapped)
    # candidates and sentinel rows only loosen it.
    d2w = []
    for s in range(-(w // 2), w - w // 2):
        sh = jnp.roll(sc, s, axis=0)
        d = sc - sh
        d2w.append(jnp.sum(d * d, axis=-1))
    d2w = jnp.stack(d2w, axis=1)  # [N, w]
    # kth smallest per row (includes self at shift 0 with d2=0, exactly
    # like the self-kNN the XLA path runs).
    neg_topk, _ = jax.lax.top_k(-d2w, k)
    ub = -neg_topk[:, k - 1]  # [N], sorted order
    # Invalid rows sort last (sentinel → max Morton code), so in sorted
    # order "first num_points rows" IS the valid mask; zeroing invalid
    # lanes keeps their garbage bounds out of the per-block max.
    ub = jnp.where(jnp.arange(n) < num_points, ub, 0.0)

    if mp != n:
        sc_p = jnp.concatenate(
            [sc, jnp.full((mp - n, 3), 1.0e12, jnp.float32)], axis=0
        )
        ub_p = jnp.concatenate([ub, jnp.zeros((mp - n,), jnp.float32)])
    else:
        sc_p, ub_p = sc, ub

    # ---- live tile lists (XLA; same shape as the fused GICP path) ----
    n_tt = mp // ts
    tcoord = sc_p.reshape(n_tt, ts, 3)
    tfinite = jnp.all(jnp.abs(tcoord) < 1.0e8, axis=-1, keepdims=True)
    tlo = jnp.min(jnp.where(tfinite, tcoord, _BIG), axis=1)  # [n_tt,3]
    thi = jnp.max(jnp.where(tfinite, tcoord, -_BIG), axis=1)

    qpad = qp - n
    scq = (
        jnp.concatenate([sc, jnp.full((qpad, 3), 1.0e12, jnp.float32)], axis=0)
        if qpad else sc
    )
    ubq = (
        jnp.concatenate([ub, jnp.zeros((qpad,), jnp.float32)])
        if qpad else ub
    )
    n_qb = qp // block_q
    qb = scq.reshape(n_qb, block_q, 3)
    qvalid = (jnp.arange(qp) < num_points).reshape(n_qb, block_q, 1)
    qlo = jnp.min(jnp.where(qvalid, qb, _BIG), axis=1)  # [n_qb,3]
    qhi = jnp.max(jnp.where(qvalid, qb, -_BIG), axis=1)
    ub_block = jnp.max(ubq.reshape(n_qb, block_q), axis=1)  # [n_qb]

    gaps = jnp.maximum(
        0.0,
        jnp.maximum(
            tlo[None, :, :] - qhi[:, None, :],
            qlo[:, None, :] - thi[None, :, :],
        ),
    )  # [n_qb, n_tt, 3]
    gap2 = jnp.sum(gaps * gaps, axis=-1)
    live = ~(gap2 > ub_block[:, None])  # NaN-safe keep
    counts = jnp.sum(live, axis=1).astype(jnp.int32)
    L = min(n_tt, 64)
    key = jnp.where(live, jnp.arange(n_tt, dtype=jnp.int32), jnp.int32(2**30))
    lists = jnp.sort(key, axis=1)[:, :L].reshape(1, n_qb * L)

    if layout == "ti":
        # Index-only kernel + XLA winner gather (round-5 experiment —
        # see _make_topk_idx_kernel_T). Same exact-kNN membership; the
        # moments are computed XLA-side from the gathered winners.
        kp = (k + 7) // 8 * 8
        outr = (k + 8) // 8 * 8
        t = jnp.concatenate([sc_p, jnp.zeros((mp, 5), jnp.float32)], axis=1).T
        q = jnp.concatenate([scq, jnp.zeros((qp, 5), jnp.float32)], axis=1).T
        with jax.enable_x64(False):
            out_t = pl.pallas_call(
                _make_topk_idx_kernel_T(k, ts, L, kp),
                grid=(n_qb,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((8, mp), lambda qi: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, block_q), lambda qi: (0, qi),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((outr, block_q), lambda qi: (0, qi),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((outr, qp), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((kp, block_q), jnp.float32),
                    pltpu.VMEM((kp, block_q), jnp.int32),
                ],
                interpret=interpret,
                compiler_params=compiler_params,
            )(lists, counts[None, :], t, q)
        raw = out_t[:k, :n].T  # [N, k] winner rows as f32 (sorted order)
        filled = raw < float(1 << 24)
        idx = jnp.clip(raw.astype(jnp.int32), 0, mp - 1)
        nb = sc_p[idx] - sc[:, None, :]  # [N, k, 3] query-centered
        d2w_ = jnp.sum(nb * nb, axis=-1)
        # sentinel winners and unfilled slots drop
        v = (filled & (d2w_ < _VALID_SQ)).astype(jnp.float32)
        nbv = nb * v[:, :, None]
        m1s = jnp.sum(nbv, axis=1)  # [N, 3]
        m2s = jnp.einsum("nka,nkb->nab", nbv, nb)
        cnts = jnp.sum(v, axis=1)
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        return m1s[inv], m2s[inv], cnts[inv]

    if layout == "t":
        # Transposed layout: queries on lanes, targets on sublanes.
        kp = (k + 7) // 8 * 8
        t = jnp.concatenate([sc_p, jnp.zeros((mp, 5), jnp.float32)], axis=1).T
        q = jnp.concatenate([scq, jnp.zeros((qp, 5), jnp.float32)], axis=1).T
        with jax.enable_x64(False):
            out_t = pl.pallas_call(
                _make_moments_kernel_T(k, ts, L, kp),
                grid=(n_qb,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((8, mp), lambda qi: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, block_q), lambda qi: (0, qi),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((16, block_q), lambda qi: (0, qi),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((16, qp), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((kp, block_q), jnp.float32),
                    pltpu.VMEM((kp, block_q), jnp.float32),
                    pltpu.VMEM((kp, block_q), jnp.float32),
                    pltpu.VMEM((kp, block_q), jnp.float32),
                ],
                interpret=interpret,
                compiler_params=compiler_params,
            )(lists, counts[None, :], t, q)
        out = out_t.T
    elif layout == "q":
        t = jnp.concatenate([sc_p, jnp.zeros((mp, 5), jnp.float32)], axis=1).T
        q = jnp.concatenate([scq, jnp.zeros((qp, 5), jnp.float32)], axis=1)

        with jax.enable_x64(False):
            out = pl.pallas_call(
                _make_moments_kernel(k, ts, L),
                grid=(n_qb,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((8, mp), lambda qi: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_q, 8), lambda qi: (qi, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((block_q, 16), lambda qi: (qi, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((qp, 16), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((block_q, k), jnp.float32),
                    pltpu.VMEM((block_q, k), jnp.float32),
                    pltpu.VMEM((block_q, k), jnp.float32),
                    pltpu.VMEM((block_q, k), jnp.float32),
                ],
                interpret=interpret,
                compiler_params=compiler_params,
            )(lists, counts[None, :], t, q)
    else:
        raise ValueError(f"unknown layout {layout!r} (use 't', 'ti' or 'q')")

    # Unsort ONE compact [N,16] row table (the only gather this path
    # pays; the XLA pipeline gathers [N,k] neighbor rows instead).
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    rows = out[:n][inv]
    m1 = rows[:, 0:3]
    m2 = jnp.stack(
        [
            rows[:, 3], rows[:, 4], rows[:, 5],
            rows[:, 4], rows[:, 6], rows[:, 7],
            rows[:, 5], rows[:, 7], rows[:, 8],
        ],
        axis=1,
    ).reshape(n, 3, 3)
    cnt = rows[:, 9]
    return m1, m2, cnt
