"""Pallas TPU kernel: fused distance + argmin nearest-neighbor search.

The XLA path in ops/knn.py materializes the [Q, M] squared-distance
matrix to HBM and reads it back for the argmin — ~2·Q·M·4 bytes of HBM
traffic per search, the dominant cost of a GICP iteration (the reference
does this NN search once per source point per optimizer iteration,
gicp_factor.hpp:53). This kernel tiles the distance computation over
(query, target) blocks and keeps the running (min distance, argmin
index) resident in VMEM, so the distance matrix never leaves the chip:
HBM traffic drops from O(Q·M) to O(Q + M).

Tie-breaking matches jnp.argmin (first index wins): within a tile the
smallest column index at the minimum is taken, and across tiles a later
tile only wins with a strictly smaller distance.

The kernel returns indices only; the caller recomputes the exact
squared distance with one gather (numerically cleaner than the
|q|^2 - 2 q.t + |t|^2 expansion the kernel uses for speed, whose f32
cancellation error could otherwise leak into the rejector threshold).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # python float: jnp scalars would be captured tracers


def _nn1_kernel_vpu(t_ref, q_ref, idx_ref, dist_ref):
    """Direct-difference distance kernel: d2 = (q-t)² on the VPU.

    The matmul formulation (_nn1_kernel) runs the MXU at K=8 — 6% of the
    systolic depth — so the distance computation is MXU-latency-bound.
    Nine VPU ops per (query, target) pair beat that wall: dx²+dy²+dz²
    with [BQ,1] x [1,BM] broadcasting never touches the MXU, and the
    difference form is exact (no |q|²−2qt+|t|² cancellation), so the
    caller needs no distance-recompute gather.

    t_ref: [8, BM] target block, rows 0..2 = x,y,z (rest zero).
    q_ref: [BQ, 8] query block, cols 0..2 = x,y,z.
    """
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _():
        dist_ref[:] = jnp.full_like(dist_ref, _BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    dx = q_ref[:, 0:1] - t_ref[0:1, :]
    dy = q_ref[:, 1:2] - t_ref[1:2, :]
    dz = q_ref[:, 2:3] - t_ref[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz  # [BQ, BM]

    bq, bm = d2.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bm), 1) + mi * bm
    tile_min = jnp.min(d2, axis=1, keepdims=True)  # [BQ, 1]
    tile_idx = jnp.min(
        jnp.where(d2 <= tile_min, col, jnp.int32(2**30)), axis=1, keepdims=True
    )
    better = tile_min < dist_ref[:]
    dist_ref[:] = jnp.where(better, tile_min, dist_ref[:])
    idx_ref[:] = jnp.where(better, tile_idx, idx_ref[:])


def _insert_sorted(run_d, run_i, m, mi):
    """Insert one candidate (m [BQ,1], mi [BQ,1]) into a row-sorted
    ascending top-k list (run_d/run_i [BQ,K]); returns the new lists.

    Elements strictly greater than the candidate shift one lane right;
    the candidate lands at the first such slot. Ties keep the incumbent
    (incumbents were extracted earlier ⇒ have smaller index — matching
    jnp.argmin/top_k tie order).
    """
    gt = run_d > m  # [BQ,K]; False-prefix then True-suffix (sorted rows)
    prev_d = jnp.concatenate([jnp.full_like(run_d[:, :1], -_BIG), run_d[:, :-1]], axis=1)
    prev_i = jnp.concatenate([run_i[:, :1], run_i[:, :-1]], axis=1)
    # prev_gt[l] = gt[l-1]; derived from the shifted floats because
    # Mosaic cannot concatenate i1 vregs (lane 0's -BIG sentinel makes
    # prev_gt[0] False, matching the zero-pad a bool shift would give).
    prev_gt = prev_d > m
    new_d = jnp.where(gt, jnp.where(prev_gt, prev_d, m), run_d)
    new_i = jnp.where(gt, jnp.where(prev_gt, prev_i, mi), run_i)
    return new_d, new_i


def _insert_sorted_lex(run_d, run_i, m, mi):
    """`_insert_sorted` with LEXICOGRAPHIC (distance, index) ordering, so
    the resulting list is independent of candidate arrival order — the
    pruned kernel visits tiles outward from a spatial anchor, not in
    index order, and exact-tie candidates must still land in
    brute-force order (ascending distance, then ascending index)."""
    if run_d.shape[1] == 1:  # k=1: no shift; plain lexicographic min
        better = (m < run_d) | ((m == run_d) & (mi < run_i))
        return jnp.where(better, m, run_d), jnp.where(better, mi, run_i)
    gt = (run_d > m) | ((run_d == m) & (run_i > mi))
    prev_d = jnp.concatenate(
        [jnp.full_like(run_d[:, :1], -_BIG), run_d[:, :-1]], axis=1
    )
    prev_i = jnp.concatenate([run_i[:, :1], run_i[:, :-1]], axis=1)
    prev_gt = (prev_d > m) | ((prev_d == m) & (prev_i > mi))
    # Exact-duplicate guard: a candidate equal to an incumbent (same d
    # AND same index — an out-of-range revisit would produce this) must
    # not be inserted twice; the caller never revisits a tile, so equal
    # (d, i) can only come from the same target row, which each tile
    # extraction emits once.
    new_d = jnp.where(gt, jnp.where(prev_gt, prev_d, m), run_d)
    new_i = jnp.where(gt, jnp.where(prev_gt, prev_i, mi), run_i)
    return new_d, new_i


def _make_knn_listed_kernel(k: int, ts: int, L: int):
    """List-driven exact kNN kernel: ONE grid step per query block, the
    Morton-sorted target VMEM-resident, fori over a caller-computed
    compact list of thin tiles (dynamic trip count). The caller runs it
    twice: a SEED pass over each block's anchor neighborhood, then —
    after deriving each block's kth-distance bound in XLA and selecting
    the remaining tiles whose bbox gap is within it — a COMPLETION pass
    seeded with the pass-1 state. Exact: any candidate that could enter
    a row's top-k lies within the block's max kth distance, hence in a
    listed (or already-seeded) tile. In-kernel `pl.when` pruning is NOT
    used — it predicates instead of branching in Mosaic rolled loops
    (measured; see ops/gicp_fused_pallas._fused_kernel_listed).

    A block whose count exceeds L rescans ALL tiles from a FRESH state
    (the seed results are discarded so no candidate is inserted twice).
    Ties are kept in brute-force order by the lexicographic insert, so
    the result is independent of tile visit order.
    """

    def kernel(
        lists_ref, counts_ref, t_ref, q_ref, d0_ref, i0_ref,
        idx_ref, dist_ref, rd, ri,
    ):
        """lists_ref: SMEM [1, nQB*L] tile ids; counts_ref: SMEM
        [1, nQB] (count > L => fresh full scan); t_ref: VMEM [8, MP];
        q_ref: VMEM [BQ, 8]; d0_ref/i0_ref: VMEM [BQ, k] initial state;
        outputs [BQ, k]; rd/ri: VMEM scratch [BQ, k]."""
        qi = pl.program_id(0)
        mp = t_ref.shape[1]
        n_tt = mp // ts
        bq = q_ref.shape[0]

        cnt = counts_ref[0, qi]
        use_list = cnt <= L
        n_iter = jnp.where(use_list, cnt, jnp.int32(n_tt))
        rd[:] = jnp.where(use_list, d0_ref[:], jnp.float32(_BIG))
        ri[:] = jnp.where(use_list, i0_ref[:], jnp.int32(2**30))

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
            dx = qx - t_ref[0:1, pl.ds(base, ts)]
            dy = qy - t_ref[1:2, pl.ds(base, ts)]
            dz = qz - t_ref[2:3, pl.ds(base, ts)]
            d2 = dx * dx + dy * dy + dz * dz  # [BQ, ts]
            col = col0 + base
            run_d = rd[:]
            run_i = ri[:]
            for _ in range(k):
                m = jnp.min(d2, axis=1, keepdims=True)
                midx = jnp.min(
                    jnp.where(d2 <= m, col, jnp.int32(2**30)),
                    axis=1, keepdims=True,
                )
                d2 = jnp.where(col == midx, _BIG, d2)
                run_d, run_i = _insert_sorted_lex(run_d, run_i, m, midx)
            rd[:] = run_d
            ri[:] = run_i
            return carry

        # unroll=1: Mosaic would otherwise unroll and stack every
        # iteration's [BQ, ts] temporaries in VMEM.
        jax.lax.fori_loop(0, n_iter, visit, 0, unroll=1)
        dist_ref[:] = rd[:]
        idx_ref[:] = ri[:]

    return kernel


@partial(jax.jit, static_argnames=("k", "block_q", "interpret"))
def knn_pallas_pruned(
    target_points: jax.Array,
    query_points: jax.Array,
    k: int,
    block_q: int = 128,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN with Morton-sorted bbox tile pruning.

    Same result contract as `knn_pallas` / brute force (ascending
    distance, ties by lower original index), but the per-query work
    scales with the LOCAL point density instead of M: the target is
    Morton-sorted once, each 128-query block walks thin tiles outward
    from its spatial anchor, and stops paying compute as soon as the
    block's worst kth distance is closer than the remaining tiles'
    bboxes. On spatially coherent clouds (any real scan) this is the
    self-kNN covariance-estimation engine (the reference runs N KdTree
    queries — util/normal_estimation.hpp:66-92).

    f32 TPU path; target must fit VMEM ([8, M] f32 — M ≤ ~400k rows).
    """
    if k > 64:
        raise ValueError(f"knn_pallas_pruned supports k<=64, got {k}")
    from small_gicp_tpu.ops.knn_window import morton_codes32

    m = target_points.shape[0]
    q = query_points.shape[0]
    ts = 256
    while (m + ts - 1) // ts > 384:
        ts *= 2
    mp = (m + ts - 1) // ts * ts
    block_q = min(block_q, (q + 63) // 64 * 64)
    qp = (q + block_q - 1) // block_q * block_q

    tc = jnp.clip(target_points[:, :3].astype(jnp.float32), -1.0e12, 1.0e12)
    t_finite = jnp.all(jnp.abs(tc) < 1.0e8, axis=-1, keepdims=True)
    t_origin = jnp.min(jnp.where(t_finite, tc, jnp.inf), axis=0)
    t_origin = jnp.where(jnp.isfinite(t_origin), t_origin, 0.0)
    tcode = morton_codes32(tc, 1.0, origin=t_origin)
    tcode_s, tperm = jax.lax.sort(
        (tcode, jnp.arange(m, dtype=jnp.int32)), num_keys=1
    )
    tc = tc[tperm]
    if mp != m:
        tc = jnp.concatenate(
            [tc, jnp.full((mp - m, 3), 1.0e12, jnp.float32)], axis=0
        )

    # Thin-tile bboxes over finite rows.
    n_tt = mp // ts
    tcoord = tc.reshape(n_tt, ts, 3)
    finite = jnp.all(jnp.abs(tcoord) < 1.0e8, axis=-1, keepdims=True)
    lo = jnp.min(jnp.where(finite, tcoord, _BIG), axis=1)
    hi = jnp.max(jnp.where(finite, tcoord, -_BIG), axis=1)
    tb = jnp.concatenate(
        [lo, hi, jnp.zeros((n_tt, 2), jnp.float32)], axis=1
    ).reshape(1, n_tt * 8)

    # Per-query-block anchors: median Morton insertion position → tile.
    qc_f = query_points[:, :3].astype(jnp.float32)
    qvalid = jnp.all(jnp.abs(qc_f) < 1.0e8, axis=-1)
    qcode = morton_codes32(
        jnp.where(qvalid[:, None], qc_f, jnp.inf), 1.0, origin=t_origin
    )
    pos = jnp.clip(
        jnp.searchsorted(tcode_s, qcode).astype(jnp.int32), 0, m - 1
    )
    if qp != q:
        pos = jnp.concatenate([pos, jnp.zeros((qp - q,), jnp.int32)], axis=0)
    pos_blocks = jnp.sort(pos.reshape(qp // block_q, block_q), axis=1)
    anchors = (
        pos_blocks[:, block_q // 2] // jnp.int32(ts)
    ).astype(jnp.int32)[None, :]  # [1, nQB]

    qc = jnp.where(qvalid[:, None], qc_f, 0.0)
    qtab = jnp.concatenate(
        [qc, qvalid[:, None].astype(jnp.float32),
         jnp.zeros((q, 4), jnp.float32)],
        axis=1,
    )
    if qp != q:
        qtab = jnp.concatenate(
            [qtab, jnp.zeros((qp - q, 8), jnp.float32)], axis=0
        )

    t = jnp.concatenate([tc, jnp.zeros((mp, 5), jnp.float32)], axis=1).T

    n_qb = qp // block_q
    grid = (n_qb,)

    def run_pass(lists, counts, L, d0, i0):
        with jax.enable_x64(False):
            return pl.pallas_call(
                _make_knn_listed_kernel(k, ts, L),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(
                        (8, mp), lambda qi: (0, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (block_q, 8), lambda qi: (qi, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (block_q, k), lambda qi: (qi, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (block_q, k), lambda qi: (qi, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (block_q, k), lambda qi: (qi, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (block_q, k), lambda qi: (qi, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((qp, k), jnp.int32),
                    jax.ShapeDtypeStruct((qp, k), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_q, k), jnp.float32),
                    pltpu.VMEM((block_q, k), jnp.int32),
                ],
                interpret=interpret,
            )(lists, counts, t, qtab, d0, i0)

    # --- pass 1: seed each block from its anchor neighborhood ---------
    n_seed = min(5, n_tt)
    anc = anchors[0]  # [nQB]
    cand = anc[:, None] + jnp.arange(-(n_seed // 2), (n_seed + 1) // 2)[None, :]
    seed_valid = (cand >= 0) & (cand < n_tt)
    seed_key = jnp.where(seed_valid, cand, jnp.int32(2**30))
    seed_lists = jnp.sort(seed_key, axis=1).astype(jnp.int32)  # packed
    seed_counts = jnp.sum(seed_valid, axis=1).astype(jnp.int32)
    big_d = jnp.full((qp, k), _BIG, jnp.float32)
    big_i = jnp.full((qp, k), jnp.int32(2**30), jnp.int32)
    i1, d1 = run_pass(
        seed_lists.reshape(1, -1), seed_counts[None, :], n_seed, big_d, big_i
    )

    # --- XLA: per-block kth-distance bound -> live-tile lists ---------
    r = jnp.max(d1[:, k - 1].reshape(n_qb, block_q), axis=1)  # [nQB]
    # Query-block bboxes (valid rows only) for gap tests.
    qb = qtab[:, :3].reshape(n_qb, block_q, 3)
    vb = (qtab[:, 3] > 0.5).reshape(n_qb, block_q, 1)
    lo_q = jnp.min(jnp.where(vb, qb, _BIG), axis=1)  # [nQB, 3]
    hi_q = jnp.max(jnp.where(vb, qb, -_BIG), axis=1)
    tbr = tb.reshape(n_tt, 8)
    gaps = jnp.maximum(
        0.0,
        jnp.maximum(
            tbr[None, :, 0:3] - hi_q[:, None, :],
            lo_q[:, None, :] - tbr[None, :, 3:6],
        ),
    )
    gap2 = jnp.sum(gaps * gaps, axis=-1)  # [nQB, n_tt]
    seeded = jnp.zeros((n_qb, n_tt), bool).at[
        jnp.arange(n_qb)[:, None], jnp.clip(cand, 0, n_tt - 1)
    ].set(True)
    live = ~(gap2 > r[:, None]) & ~seeded  # NaN-safe keep
    counts2 = jnp.sum(live, axis=1).astype(jnp.int32)
    L2 = min(n_tt, 96)
    key2 = jnp.where(live, jnp.arange(n_tt, dtype=jnp.int32), jnp.int32(2**30))
    lists2 = jnp.sort(key2, axis=1)[:, :L2].reshape(1, n_qb * L2)

    # --- pass 2: complete from the seeded state over listed tiles -----
    idx, dist = run_pass(lists2, counts2[None, :], L2, d1, i1)

    # Map sorted-frame winners back to original target row ids.
    idx = tperm[jnp.minimum(idx[:q], m - 1)]
    return dist[:q].astype(query_points.dtype), idx


def _make_knn_kernel_T(k: int, kp: int):
    """Transposed-layout dense top-k: queries on LANES, targets on
    SUBLANES — every per-pass reduction (min / argmin / mask) runs
    along the sublane axis, which the VPU reduces with a few shuffle
    steps instead of a full cross-lane tree (the layout lesson from the
    fused GICP kernel). Top-k slots are [kp, BQ] rows (kp = k padded to
    a sublane multiple); insertion shifts along sublanes.

    t_ref: [8, BM] rows x,y,z (transposed per tile into [BM,1] coord
    columns — three thin transposes); q_ref: [8, BQ] rows x,y,z;
    outputs idx/dist [kp, BQ] blocks revisited across target steps.
    """

    def kernel(t_ref, q_ref, idx_ref, dist_ref):
        mi = pl.program_id(1)

        @pl.when(mi == 0)
        def _():
            dist_ref[:] = jnp.full_like(dist_ref, _BIG)
            idx_ref[:] = jnp.zeros_like(idx_ref)

        bm = t_ref.shape[1]
        bq = q_ref.shape[1]
        tx = jnp.transpose(t_ref[0:1, :], (1, 0))  # [BM, 1]
        ty = jnp.transpose(t_ref[1:2, :], (1, 0))
        tz = jnp.transpose(t_ref[2:3, :], (1, 0))
        dx = tx - q_ref[0:1, :]
        dy = ty - q_ref[1:2, :]
        dz = tz - q_ref[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz  # [BM, BQ]
        row = jax.lax.broadcasted_iota(jnp.int32, (bm, bq), 0)
        col_global = row + mi * bm

        run_d = dist_ref[:]
        run_i = idx_ref[:]
        for _ in range(k):
            m = jnp.min(d2, axis=0, keepdims=True)  # [1, BQ]
            midx = jnp.min(
                jnp.where(d2 <= m, col_global, jnp.int32(2**30)),
                axis=0, keepdims=True,
            )
            d2 = jnp.where(col_global == midx, _BIG, d2)
            # sublane-axis insert (same semantics as _insert_sorted:
            # strict >, incumbents keep ties — tiles are visited in
            # index order so ties resolve to the lower index)
            gt = run_d > m
            prev_d = jnp.concatenate(
                [jnp.full_like(run_d[:1], -_BIG), run_d[:-1]], axis=0
            )
            prev_i = jnp.concatenate([run_i[:1], run_i[:-1]], axis=0)
            prev_gt = prev_d > m
            run_d = jnp.where(gt, jnp.where(prev_gt, prev_d, m), run_d)
            run_i = jnp.where(gt, jnp.where(prev_gt, prev_i, midx), run_i)
        dist_ref[:] = run_d
        idx_ref[:] = run_i

    return kernel


@partial(
    jax.jit, static_argnames=("k", "block_q", "block_m", "interpret")
)
def knn_pallas_T(
    target_points: jax.Array,
    query_points: jax.Array,
    k: int,
    block_q: int = 512,
    block_m: int = 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Transposed-layout exact kNN (same contract as knn_pallas)."""
    if k > 64:
        raise ValueError(f"knn_pallas_T supports k<=64, got {k}")
    m = target_points.shape[0]
    q = query_points.shape[0]
    kp = (k + 7) // 8 * 8

    block_m = min(block_m, (m + 511) // 512 * 512)
    block_q = min(block_q, (q + 127) // 128 * 128)

    tc = jnp.clip(target_points[:, :3].astype(jnp.float32), -1.0e12, 1.0e12)
    qc = query_points[:, :3].astype(jnp.float32)

    mp = (m + block_m - 1) // block_m * block_m
    qp = (q + block_q - 1) // block_q * block_q
    if mp != m:
        tc = jnp.concatenate(
            [tc, jnp.full((mp - m, 3), 1.0e12, jnp.float32)], axis=0
        )
    if qp != q:
        qc = jnp.concatenate([qc, jnp.zeros((qp - q, 3), jnp.float32)], axis=0)

    t = jnp.concatenate([tc, jnp.zeros((mp, 5), jnp.float32)], axis=1).T
    qq = jnp.concatenate([qc, jnp.zeros((qp, 5), jnp.float32)], axis=1).T

    n_qb = qp // block_q
    grid = (n_qb, mp // block_m)
    with jax.enable_x64(False):
        idx, dist = pl.pallas_call(
            _make_knn_kernel_T(k, kp),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (8, block_m), lambda qi, mi: (0, mi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, block_q), lambda qi, mi: (0, qi),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (kp, block_q), lambda qi, mi: (qi, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (kp, block_q), lambda qi, mi: (qi, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_qb * kp, block_q), jnp.int32),
                jax.ShapeDtypeStruct((n_qb * kp, block_q), jnp.float32),
            ],
            interpret=interpret,
        )(t, qq)

    # [n_qb*kp, BQ] -> [Q, k]
    idx = idx.reshape(n_qb, kp, block_q).transpose(0, 2, 1).reshape(qp, kp)
    dist = dist.reshape(n_qb, kp, block_q).transpose(0, 2, 1).reshape(qp, kp)
    idx = jnp.minimum(idx[:q, :k], m - 1)
    return dist[:q, :k].astype(query_points.dtype), idx


def _make_knn_kernel(k: int):
    """Fused kNN kernel: k extraction passes over a VMEM-resident
    distance tile, merging into a running sorted [BQ, k] top-k list.

    Per (query, target) tile: d2 = (q−t)² on the VPU (see
    _nn1_kernel_vpu), then k rounds of (min, first-argmin, mask-out).
    The [BQ, BM] distance matrix never leaves VMEM, so HBM traffic is
    O(Q·k + M) instead of the O(Q·M) the XLA top_k path pays — and the
    VPU passes replace XLA's full per-row sort.
    """

    def kernel(t_ref, q_ref, idx_ref, dist_ref):
        mi_prog = pl.program_id(1)

        @pl.when(mi_prog == 0)
        def _():
            dist_ref[:] = jnp.full_like(dist_ref, _BIG)
            idx_ref[:] = jnp.zeros_like(idx_ref)

        dx = q_ref[:, 0:1] - t_ref[0:1, :]
        dy = q_ref[:, 1:2] - t_ref[1:2, :]
        dz = q_ref[:, 2:3] - t_ref[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz  # [BQ, BM]

        bq, bm = d2.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bm), 1) + mi_prog * bm

        run_d = dist_ref[:]
        run_i = idx_ref[:]
        # (Tile values above the current k-th best can never enter the
        # list, but per-row skipping doesn't help a SIMD machine, so
        # just run the k passes.)
        for _ in range(k):
            m = jnp.min(d2, axis=1, keepdims=True)  # [BQ,1]
            midx = jnp.min(
                jnp.where(d2 <= m, col, jnp.int32(2**30)),
                axis=1,
                keepdims=True,
            )
            d2 = jnp.where(col == midx, _BIG, d2)
            run_d, run_i = _insert_sorted(run_d, run_i, m, midx)
        dist_ref[:] = run_d
        idx_ref[:] = run_i

    return kernel


@partial(
    jax.jit, static_argnames=("k", "block_q", "block_m", "interpret")
)
def knn_pallas(
    target_points: jax.Array,
    query_points: jax.Array,
    k: int,
    block_q: int = 128,
    block_m: int = 8192,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN: ([M,4] targets, [Q,4] queries) -> ([Q,k] d², [Q,k] idx),
    ascending by distance with ties broken by lower index — the same
    order as brute_force_knn / the reference KdTree (ann/kdtree.hpp).

    f32 TPU fast path; k must be small (≤ 64) — the kernel does k
    extraction passes over each VMEM distance tile.
    """
    if k > 64:
        raise ValueError(f"knn_pallas supports k<=64, got {k}")
    m = target_points.shape[0]
    q = query_points.shape[0]

    # Wide target tiles amortize the per-tile top-k merge (measured ~1.7x
    # at 16k points), but don't let the block exceed the padded problem.
    block_m = min(block_m, (m + 511) // 512 * 512)
    block_q = min(block_q, (q + 63) // 64 * 64)

    tc = target_points[:, :3].astype(jnp.float32)
    qc = query_points[:, :3].astype(jnp.float32)
    tc = jnp.clip(tc, -1.0e12, 1.0e12)

    mp = (m + block_m - 1) // block_m * block_m
    qp = (q + block_q - 1) // block_q * block_q
    if mp != m:
        tc = jnp.concatenate(
            [tc, jnp.full((mp - m, 3), 1.0e12, jnp.float32)], axis=0
        )
    if qp != q:
        qc = jnp.concatenate([qc, jnp.zeros((qp - q, 3), jnp.float32)], axis=0)

    t = jnp.concatenate([tc, jnp.zeros((mp, 5), jnp.float32)], axis=1).T
    qq = jnp.concatenate([qc, jnp.zeros((qp, 5), jnp.float32)], axis=1)

    grid = (qp // block_q, mp // block_m)
    with jax.enable_x64(False):
        idx, dist = pl.pallas_call(
            _make_knn_kernel(k),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (8, block_m), lambda qi, mi: (0, mi), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (block_q, 8), lambda qi, mi: (qi, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (block_q, k), lambda qi, mi: (qi, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (block_q, k), lambda qi, mi: (qi, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((qp, k), jnp.int32),
                jax.ShapeDtypeStruct((qp, k), jnp.float32),
            ],
            interpret=interpret,
        )(t, qq)

    idx = jnp.minimum(idx[:q], m - 1)
    return dist[:q].astype(query_points.dtype), idx


def _nn1_kernel(t_ref, q_ref, idx_ref, dist_ref):
    """Grid = (num_query_tiles, num_target_tiles); target axis innermost.

    t_ref: [8, BM] augmented transposed target block
    ([tx,ty,tz,|t|^2,1,0,0,0] rows), q_ref: [BQ, 8] augmented query
    block [-2qx,-2qy,-2qz,1,|q|^2,0,0,0]
    (same block for all target-tile steps), so the inner product IS the
    squared distance — ONE MXU matmul per tile, no elementwise distance
    arithmetic on the VPU. Outputs [BQ, 1] are revisited across target
    steps (they stay VMEM-resident while the query tile is fixed).
    """
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _():
        dist_ref[:] = jnp.full_like(dist_ref, _BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # d2[i,j] = q_aug[i] . t_aug[:, j] = |q-t|^2 (over xyz). The target
    # block is pre-transposed to [8, BM] so the MXU consumes it without a
    # per-tile transpose.
    d2 = jnp.dot(q_ref[:], t_ref[:], preferred_element_type=jnp.float32)

    bq, bm = d2.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bm), 1) + mi * bm
    tile_min = jnp.min(d2, axis=1, keepdims=True)  # [BQ, 1]
    # First column index attaining the tile minimum (jnp.argmin order).
    tile_idx = jnp.min(
        jnp.where(d2 <= tile_min, col, jnp.int32(2**30)), axis=1, keepdims=True
    )
    better = tile_min < dist_ref[:]
    dist_ref[:] = jnp.where(better, tile_min, dist_ref[:])
    idx_ref[:] = jnp.where(better, tile_idx, idx_ref[:])


@partial(
    jax.jit, static_argnames=("block_q", "block_m", "interpret", "variant")
)
def nearest_neighbor_pallas(
    target_points: jax.Array,
    query_points: jax.Array,
    block_q: int = 512,
    block_m: int = 2048,
    interpret: bool = False,
    variant: str = "vpu",
) -> Tuple[jax.Array, jax.Array]:
    """Exact 1-NN: ([M,4] targets, [Q,4] queries) -> (sq_dists [Q], idx [Q]).

    Inputs are homogeneous padded points (PAD_SENTINEL coords in padding
    rows keep them from ever winning). M and Q are padded to the block
    sizes internally. f32 only (the TPU fast path); callers with f64
    parity requirements use the XLA path in ops/knn.py.

    variant: "vpu" (default) = direct-difference distances on the VPU;
    "mxu" = |q|²−2qt+|t|² as one K=8 matmul (kept for comparison — the
    VPU path measures ~2x faster because a K=8 matmul uses 6% of the
    systolic depth).
    """
    m = target_points.shape[0]
    q = query_points.shape[0]

    # Center to keep |x|^2 small: bounds the f32 cancellation error of
    # the matmul distance expansion. (The VPU difference form doesn't
    # need it for accuracy, but it keeps pad-row arithmetic tame.)
    finite = jnp.all(jnp.abs(target_points[:, :3]) < 1e8, axis=-1, keepdims=True)
    denom = jnp.maximum(jnp.sum(finite), 1)
    center = jnp.sum(jnp.where(finite, target_points[:, :3], 0.0), axis=0) / denom

    tc = (target_points[:, :3] - center).astype(jnp.float32)
    qc = (query_points[:, :3] - center).astype(jnp.float32)
    # Clamp sentinel pads to a finite far value so |t|^2 stays
    # representable after squaring in f32.
    tc = jnp.clip(tc, -1.0e12, 1.0e12)

    mp = (m + block_m - 1) // block_m * block_m
    qp = (q + block_q - 1) // block_q * block_q
    if mp != m:
        tc = jnp.concatenate(
            [tc, jnp.full((mp - m, 3), 1.0e12, jnp.float32)], axis=0
        )
    if qp != q:
        qc = jnp.concatenate([qc, jnp.zeros((qp - q, 3), jnp.float32)], axis=0)

    if variant == "vpu":
        t = jnp.concatenate(
            [tc, jnp.zeros((mp, 5), jnp.float32)], axis=1
        ).T  # [8, MP] rows x,y,z,0...
        qq = jnp.concatenate(
            [qc, jnp.zeros((qp, 5), jnp.float32)], axis=1
        )  # [QP, 8] cols x,y,z,0...
        kernel = _nn1_kernel_vpu
    elif variant == "mxu":
        t = jnp.concatenate(
            [
                tc,
                jnp.sum(tc * tc, axis=1, keepdims=True),
                jnp.ones((mp, 1), jnp.float32),
                jnp.zeros((mp, 3), jnp.float32),
            ],
            axis=1,
        ).T  # [8, MP]
        qq = jnp.concatenate(
            [
                -2.0 * qc,
                jnp.ones((qp, 1), jnp.float32),
                jnp.sum(qc * qc, axis=1, keepdims=True),
                jnp.zeros((qp, 3), jnp.float32),
            ],
            axis=1,
        )  # [QP, 8]
        kernel = _nn1_kernel
    else:
        raise ValueError(f"unknown variant {variant!r} (use 'vpu' or 'mxu')")

    grid = (qp // block_q, mp // block_m)
    # Mosaic rejects kernels traced in x64 mode (index arithmetic comes
    # out 64-bit); everything here is explicitly 32-bit, so trace the
    # pallas_call with x64 off regardless of the global setting.
    with jax.enable_x64(False):
        idx, _dist = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (8, block_m), lambda qi, mi: (0, mi), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (block_q, 8), lambda qi, mi: (qi, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (block_q, 1), lambda qi, mi: (qi, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (block_q, 1), lambda qi, mi: (qi, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((qp, 1), jnp.int32),
                jax.ShapeDtypeStruct((qp, 1), jnp.float32),
            ],
            interpret=interpret,
        )(t, qq)

    idx = jnp.minimum(idx[:q, 0], m - 1)
    if variant == "vpu":
        # The difference-form distance is already exact.
        sq = _dist[:q, 0]
    else:
        # Exact squared distance via gather (the matmul expansion's f32
        # cancellation error must not leak into the rejector threshold).
        diff = query_points[:, :3] - target_points[idx, :3]
        sq = jnp.sum(diff * diff, axis=-1)
    return sq.astype(query_points.dtype), idx
