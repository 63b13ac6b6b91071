"""Persistent-lane fleet registration: a work queue of P problems
streamed through B resident lanes.

The vmapped batch (parallel/sharding.align_batch) runs all lanes in
LOCKSTEP: every batch pays its slowest member's iteration count (mean
3.4 vs max ~6 on the bundled-pair noise poses — a ~1.5x waste), and a
new batch cannot start until the old one fully drains. This module is
the TPU-native fix, the same idea as the reference's TBB flow-graph
keeping ~128 threads busy across frames
(src/benchmark/odometry_benchmark_small_gicp_tbb_flow.cpp:56-141):

  * P registration problems = (pair id, initial pose) form a queue;
  * B lanes each run ONE LM iteration per round (one fused Pallas
    linearize + one trial-error kernel across all lanes);
  * a lane whose problem converged / failed / hit max_iterations
    retires its RegistrationResult into the output slot and loads the
    next problem in the SAME round — lanes never idle in lockstep;
  * lanes address their pair's prepared tables IN PLACE via a
    scalar-prefetch indirection (ops/gicp_fused_pallas.py fleet
    kernels), so a problem switch moves zero table bytes.

Iteration semantics per problem are identical to align_impl's LM path
(models/registration.py): per-iteration correspondence re-search,
batched lambda trials with frozen correspondences, accept iff
new_e <= e, convergence on the accepted delta, abort when all trials
fail (optimizer.hpp:100-144 semantics). Exactness vs per-problem
align_impl is pinned by tests/test_fleet.py.

Restrictions (the fused-kernel contract): LM optimizer, f32 clouds,
no DoF mask. All three point factors run fused
(registration_type="gicp"/"plane_icp"/"icp" — GICP needs covariances
on both clouds, plane-ICP needs target normals), as do the
Huber/Cauchy robust kernels (robust_kernel=/robust_c= — the weight is
applied inside the linearize and trial-error kernels, same semantics
as align_impl).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.models.registration import RegistrationResult
from small_gicp_tpu.models import factors
from small_gicp_tpu.ops.eigh3 import solve6x6
from small_gicp_tpu.utils.lie import se3_exp


def _stack_single(cloud: PointCloud) -> PointCloud:
    """Add a leading U=1 axis to a single pair's pytree leaves."""
    return jax.tree_util.tree_map(lambda x: x[None], cloud)


@partial(
    jax.jit,
    static_argnames=(
        "num_lanes",
        "max_iterations",
        "max_inner_iterations",
        "block_q",
        "interpret",
        "robust_kernel",
        "registration_type",
    ),
)
def _fleet_run(
    ttabs,
    tbs,
    qtabs,
    qbbs,
    pair_ids,  # [P] int32
    init_Ts,  # [P,4,4]
    max_dist_sq,
    num_lanes: int,
    max_iterations: int,
    max_inner_iterations: int,
    rotation_eps,
    translation_eps,
    init_lambda,
    lambda_factor,
    block_q: int,
    interpret: bool,
    robust_kernel: str = None,
    robust_c=1.0,
    registration_type: str = "gicp",
):
    from small_gicp_tpu.ops.gicp_fused_pallas import (
        gicp_error_multi_fleet,
        gicp_linearize_fleet,
    )

    f32 = jnp.float32
    P = init_Ts.shape[0]
    U = ttabs.shape[0]
    B = num_lanes
    K = max_inner_iterations
    e_dt = factors._error_accum_dtype(f32)

    md2 = jnp.asarray(max_dist_sq, f32)
    rot_eps = jnp.asarray(rotation_eps, f32)
    trans_eps = jnp.asarray(translation_eps, f32)
    lam0 = jnp.asarray(init_lambda, f32)
    lfac = jnp.asarray(lambda_factor, f32)

    lane0 = jnp.arange(B, dtype=jnp.int32)
    pid0 = jnp.where(lane0 < P, lane0, -1)
    safe0 = jnp.clip(pid0, 0, P - 1)

    state0 = dict(
        pid=pid0,
        uid=pair_ids[safe0],
        T=init_Ts[safe0].astype(f32),
        lam=jnp.full((B,), init_lambda, f32),
        i=jnp.zeros((B,), jnp.int32),
        next=jnp.asarray(min(B, P), jnp.int32),
        out_T=jnp.tile(jnp.eye(4, dtype=f32), (P, 1, 1)),
        out_conv=jnp.zeros((P,), bool),
        out_iters=jnp.zeros((P,), jnp.int32),
        out_inliers=jnp.zeros((P,), jnp.int32),
        out_H=jnp.zeros((P, 6, 6), f32),
        out_b=jnp.zeros((P, 6), f32),
        out_err=jnp.zeros((P,), e_dt),
    )

    def cond(s):
        return jnp.any(s["pid"] >= 0)

    def body(s):
        active = s["pid"] >= 0
        uids = jnp.clip(s["uid"], 0, U - 1)

        H, b, inliers, corr = gicp_linearize_fleet(
            ttabs, tbs, qtabs, qbbs, uids, s["T"], md2, active,
            block_q=block_q, interpret=interpret,
            robust=robust_kernel, robust_c=robust_c,
            factor=registration_type,
        )

        # Batched LM lambda trials (identical semantics to align_impl's
        # fused LM body, vectorized over lanes).
        lambdas = s["lam"][:, None] * lfac ** jnp.arange(K, dtype=f32)
        deltas = jax.vmap(
            lambda Hb, bb, ls: jax.vmap(lambda l: solve6x6(Hb, -bb, l))(ls)
        )(H, b, lambdas)  # [B,K,6]
        Ts_trial = jnp.einsum(
            "bxy,bkyz->bkxz",
            s["T"],
            jax.vmap(jax.vmap(se3_exp))(deltas),
            precision=jax.lax.Precision.HIGHEST,
        )  # [B,K,4,4]
        all_poses = jnp.concatenate([s["T"][:, None], Ts_trial], axis=1)
        errs_all = gicp_error_multi_fleet(
            corr, qtabs, uids, all_poses, block_q=block_q,
            interpret=interpret,
            robust=robust_kernel, robust_c=robust_c,
        )  # [B,K+1]
        e0 = errs_all[:, 0]
        errs = errs_all[:, 1:]
        ok = errs <= e0[:, None]
        accepted = jnp.any(ok, axis=1)
        j = jnp.argmax(ok, axis=1)
        take = lambda a, idx: jnp.take_along_axis(
            a, idx.reshape((-1,) + (1,) * (a.ndim - 1)), axis=1
        )[:, 0]
        T_f = jnp.where(accepted[:, None, None], take(Ts_trial, j), s["T"])
        e_f = jnp.where(accepted, take(errs, j), e0)
        delta_f = jnp.where(accepted[:, None], take(deltas, j), 0.0)
        lam_f = jnp.where(
            accepted, take(lambdas, j) / lfac, s["lam"] * lfac**K
        )
        conv = accepted & (
            (jnp.linalg.norm(delta_f[:, :3], axis=1) <= rot_eps)
            & (jnp.linalg.norm(delta_f[:, 3:], axis=1) <= trans_eps)
        )
        failed = ~accepted

        i_now = s["i"]  # result.iterations = index of last executed iter
        i_next = i_now + 1
        continuing = active & ~conv & ~failed & (i_next < max_iterations)
        done = active & ~continuing

        # Retire finished lanes into their problem's output slot.
        sidx = jnp.where(done, s["pid"], P)  # P = out of range -> dropped
        out_T = s["out_T"].at[sidx].set(T_f, mode="drop")
        out_conv = s["out_conv"].at[sidx].set(conv, mode="drop")
        out_iters = s["out_iters"].at[sidx].set(i_now, mode="drop")
        out_inliers = s["out_inliers"].at[sidx].set(
            inliers.astype(jnp.int32), mode="drop"
        )
        out_H = s["out_H"].at[sidx].set(H, mode="drop")
        out_b = s["out_b"].at[sidx].set(b, mode="drop")
        out_err = s["out_err"].at[sidx].set(e_f.astype(e_dt), mode="drop")

        # Refill retired lanes from the queue (rank = order among this
        # round's retirees; assignment order is lane order, which keeps
        # the schedule deterministic).
        ranks = jnp.cumsum(done.astype(jnp.int32)) - 1
        cand = s["next"] + ranks
        refill = done & (cand < P)
        pid_new = jnp.where(refill, cand, jnp.where(done, -1, s["pid"]))
        safe_cand = jnp.clip(cand, 0, P - 1)
        uid_new = jnp.where(refill, pair_ids[safe_cand], s["uid"])
        T_new = jnp.where(
            refill[:, None, None],
            init_Ts[safe_cand].astype(f32),
            T_f,
        )
        lam_new = jnp.where(refill, lam0, lam_f)
        i_new = jnp.where(refill, 0, i_next)

        # Inactive lanes must be pure no-ops on their own state.
        keep = ~active
        return dict(
            pid=jnp.where(keep, s["pid"], pid_new),
            uid=jnp.where(keep, s["uid"], uid_new),
            T=jnp.where(keep[:, None, None], s["T"], T_new),
            lam=jnp.where(keep, s["lam"], lam_new),
            i=jnp.where(keep, s["i"], i_new),
            next=(s["next"] + jnp.sum(done.astype(jnp.int32))).astype(
                jnp.int32
            ),
            out_T=out_T,
            out_conv=out_conv,
            out_iters=out_iters,
            out_inliers=out_inliers,
            out_H=out_H,
            out_b=out_b,
            out_err=out_err,
        )

    final = jax.lax.while_loop(cond, body, state0)
    return RegistrationResult(
        T_target_source=final["out_T"],
        converged=final["out_conv"],
        iterations=final["out_iters"],
        num_inliers=final["out_inliers"],
        H=final["out_H"],
        b=final["out_b"],
        error=final["out_err"],
    )


def fleet_prepare(targets: PointCloud, sources: PointCloud,
                  block_q: int = 512, registration_type: str = "gicp"):
    """Prepare U stacked pairs' fused-kernel tables once (see
    ops/gicp_fused_pallas.gicp_fleet_prepare). targets/sources may be a
    single pair (no leading axis) or [U]-stacked pytrees.
    registration_type selects the factor: "gicp" (both clouds need
    covariances), "plane_icp" (targets need normals), "icp"."""
    from small_gicp_tpu.ops.gicp_fused_pallas import gicp_fleet_prepare

    if targets.points.ndim == 2:
        targets = _stack_single(targets)
    if sources.points.ndim == 2:
        sources = _stack_single(sources)
    if registration_type == "gicp" and (
        targets.covs is None or sources.covs is None
    ):
        raise ValueError("GICP fleet registration: both clouds need covs")
    if registration_type == "plane_icp" and targets.normals is None:
        raise ValueError("plane-ICP fleet registration: targets need normals")
    if targets.points.dtype != jnp.float32:
        raise ValueError("fleet registration runs the f32 fused kernels")
    num = jnp.broadcast_to(
        jnp.asarray(sources.num_points, jnp.int32),
        (sources.points.shape[0],),
    )
    return gicp_fleet_prepare(
        targets.points, targets.covs, sources.points, sources.covs, num,
        block_q=block_q, factor=registration_type,
        target_normals=targets.normals,
    )


def align_fleet(
    targets: PointCloud,
    sources: PointCloud,
    init_Ts: jax.Array,
    pair_ids: Optional[jax.Array] = None,
    num_lanes: int = 32,
    max_iterations: int = 20,
    max_inner_iterations: int = 10,
    max_correspondence_distance: float = 1.0,
    rotation_eps: float = 0.1 * np.pi / 180.0,
    translation_eps: float = 1e-3,
    init_lambda: float = 1e-3,
    lambda_factor: float = 10.0,
    block_q: int = 512,
    prepared=None,
    interpret: Optional[bool] = None,
    robust_kernel: Optional[str] = None,
    robust_c: float = 1.0,
    registration_type: str = "gicp",
) -> RegistrationResult:
    """Register P registration problems through B persistent lanes.

    Args:
      targets/sources: one pair (2-D leaves) or [U]-stacked pairs. All
        pairs share the capacity (pad with PointCloud.with_capacity).
      init_Ts: [P,4,4] initial guesses — one problem per row.
      pair_ids: [P] which pair each problem registers (default: all 0
        for a single pair, else arange(U) requiring P == U). Multiple
        problems per pair is the multi-hypothesis / loop-closure
        verification shape: candidates share the pair's prepared
        tables at zero copy cost.
      num_lanes: resident lanes B (the round's parallel width).
      prepared: optional result of fleet_prepare(targets, sources) to
        reuse across calls. IMPORTANT for callers that wrap align_fleet
        in their own jax.jit: pass prepared tables produced by a
        SEPARATE call — fusing the preparation into the same XLA
        program as the persistent-lane while loop costs ~3.4x wall time
        (measured 287 vs 1252 reg/s on the bundled pair at P=256, B=32;
        the prepare computation itself is ~27 ms — this is a scheduling
        cliff, not compute). Called un-jitted, align_fleet already
        stages preparation as its own program.
      interpret: force the Pallas interpreter (default: off on TPU, on
        elsewhere so CPU tests run the same code path).
      robust_kernel/robust_c: optional Huber/Cauchy robustification —
        runs INSIDE the fused kernels (same accept/reject semantics as
        align_impl with the same arguments).

    Returns a RegistrationResult with leading [P] axis, each row equal
    to align_impl(target, source, None, init_T) for that problem.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if prepared is None:
        prepared = fleet_prepare(targets, sources, block_q=block_q,
                                 registration_type=registration_type)
    ttabs, tbs, qtabs, qbbs = prepared

    init_Ts = jnp.asarray(init_Ts, jnp.float32)
    if init_Ts.ndim == 2:
        init_Ts = init_Ts[None]
    P = init_Ts.shape[0]
    U = ttabs.shape[0]
    if pair_ids is None:
        if U == 1:
            pair_ids = jnp.zeros((P,), jnp.int32)
        elif P == U:
            pair_ids = jnp.arange(P, dtype=jnp.int32)
        else:
            raise ValueError(
                f"pair_ids required when P={P} problems != U={U} pairs"
            )
    pair_ids = jnp.asarray(pair_ids, jnp.int32)
    if pair_ids.shape != (P,):
        raise ValueError(f"pair_ids must be [P]={P}, got {pair_ids.shape}")

    return _fleet_run(
        ttabs,
        tbs,
        qtabs,
        qbbs,
        pair_ids,
        init_Ts,
        max_correspondence_distance**2,
        num_lanes=int(num_lanes),
        max_iterations=int(max_iterations),
        max_inner_iterations=int(max_inner_iterations),
        rotation_eps=rotation_eps,
        translation_eps=translation_eps,
        init_lambda=init_lambda,
        lambda_factor=lambda_factor,
        block_q=int(block_q),
        interpret=bool(interpret),
        robust_kernel=robust_kernel,
        robust_c=robust_c,
        registration_type=registration_type,
    )


def align_fleet_sharded(
    targets: PointCloud,
    sources: PointCloud,
    init_Ts: jax.Array,
    mesh,
    pair_ids: Optional[jax.Array] = None,
    axis_name: str = "data",
    num_lanes_per_device: int = 32,
    prepared=None,
    interpret: Optional[bool] = None,
    **kwargs,
) -> RegistrationResult:
    """Fleet registration with lanes sharded over a device mesh.

    The problem queue [P] splits into D contiguous shards; each device
    runs an INDEPENDENT persistent-lane fleet (num_lanes_per_device
    resident lanes, device-local refill) over its shard, with the
    prepared pair tables replicated. The per-device while loop has no
    collectives in its body, so devices drain their queues
    asynchronously — the multi-chip shape where the fleet's saturation
    argument inverts (one 6.6k-pair problem already saturates a single
    chip's VPU, so extra lanes only pay off on extra chips). This is
    the scale-out analog of the reference's flow-graph odometry keeping
    ~128 threads busy (odometry_benchmark_small_gicp_tbb_flow.cpp:56-141).

    P must divide evenly by the mesh size (pad the queue with repeated
    problems and drop the extras if needed). Per-problem results are
    EXACTLY align_fleet's (scheduling never changes a problem's
    iterates), so they equal align_impl row-for-row.

    kwargs forward to the single-device fleet (max_iterations, eps, ...).
    """
    from jax.sharding import PartitionSpec as P_

    try:  # moved to jax.shard_map in newer JAX
        from jax import shard_map
    except ImportError:  # pragma: no cover - older JAX spelling
        from jax.experimental.shard_map import shard_map

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if prepared is None:
        prepared = fleet_prepare(targets, sources,
                                 block_q=kwargs.get("block_q", 512))
    ttabs, tbs, qtabs, qbbs = prepared

    init_Ts = jnp.asarray(init_Ts, jnp.float32)
    if init_Ts.ndim == 2:
        init_Ts = init_Ts[None]
    P = init_Ts.shape[0]
    U = ttabs.shape[0]
    n_dev = int(np.prod(list(mesh.shape.values())))
    if P % n_dev != 0:
        raise ValueError(
            f"P={P} problems must divide evenly over {n_dev} devices"
        )
    if pair_ids is None:
        if U == 1:
            pair_ids = jnp.zeros((P,), jnp.int32)
        elif P == U:
            pair_ids = jnp.arange(P, dtype=jnp.int32)
        else:
            raise ValueError(
                f"pair_ids required when P={P} problems != U={U} pairs"
            )
    pair_ids = jnp.asarray(pair_ids, jnp.int32)

    def device_fleet(tt, tb, qt, qb, pids, Ts):
        return align_fleet(
            None, None, Ts,
            pair_ids=pids,
            num_lanes=num_lanes_per_device,
            prepared=(tt, tb, qt, qb),
            interpret=interpret,
            **kwargs,
        )

    rep = P_()  # replicated pair tables
    shd = P_(axis_name)  # problem axis sharded
    out_specs = RegistrationResult(
        T_target_source=shd, converged=shd, iterations=shd,
        num_inliers=shd, H=shd, b=shd, error=shd,
    )
    try:
        fn = shard_map(
            device_fleet, mesh=mesh,
            in_specs=(rep, rep, rep, rep, shd, shd), out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older JAX spelling
        fn = shard_map(
            device_fleet, mesh=mesh,
            in_specs=(rep, rep, rep, rep, shd, shd), out_specs=out_specs,
            check_rep=False,
        )
    return fn(ttabs, tbs, qtabs, qbbs, pair_ids, init_Ts)
