"""Registration engine: correspondence search + GN/LM optimization.

TPU re-design of the reference's Registration template
(registration/registration.hpp:17-54) and optimizers
(registration/optimizer.hpp:12-156). The C++ template plug points
(PointFactor / Reduction / GeneralFactor / Rejector / Optimizer) become
static configuration of one jitted `align` function; the whole optimizer
— including per-iteration NN re-search and the LM lambda trials with
frozen correspondences — runs as nested `lax.while_loop`s inside a
single XLA program, so a full registration is one device launch.

Iteration semantics are kept bit-compatible with the reference:
  * outer loop ≤ max_iterations, stops on convergence (LM also stops when
    all inner trials fail — optimizer.hpp:141-143)
  * correspondences re-searched at every linearization against the
    *currently transformed* source (gicp_factor.hpp:49-53), rejected when
    sq_dist > max_dist_sq (rejector.hpp:19-28)
  * LM inner loop evaluates candidate poses with FROZEN correspondences
    and weight matrices (optimizer.hpp:113), accepts iff new_e <= e
  * convergence: ‖δ_rot‖ ≤ rotation_eps AND ‖δ_trans‖ ≤ translation_eps
    (termination_criteria.hpp:17)
  * GN applies the update even on the converging iteration
    (optimizer.hpp:52-53)
  * result.iterations is the index of the last executed outer iteration
    (optimizer.hpp:54,136), H/b are from the last linearization.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import struct

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.ops.knn import KdTree
from small_gicp_tpu.ops.eigh3 import solve6x6
from small_gicp_tpu.utils.lie import se3_exp
from small_gicp_tpu.models import factors
from small_gicp_tpu.models.factors import Correspondences, GICP, ICP, PLANE_ICP
from small_gicp_tpu.models.voxelmap import GaussianVoxelMap, IncrementalVoxelMap
from small_gicp_tpu.ops.projective_search import ProjectiveSearch


@struct.dataclass
class RegistrationResult:
    """Pytree mirror of the reference RegistrationResult
    (registration/registration_result.hpp:11-30)."""

    T_target_source: jax.Array  # [4,4]
    converged: jax.Array  # bool
    iterations: jax.Array  # int32
    num_inliers: jax.Array  # int32
    H: jax.Array  # [6,6]
    b: jax.Array  # [6]
    error: jax.Array  # scalar

    def __repr__(self):  # compact, like the reference result printout
        try:
            import numpy as _np

            T = _np.array2string(
                _np.asarray(self.T_target_source), precision=4,
                suppress_small=True, prefix="  T=")
            return (
                f"RegistrationResult(converged={bool(self.converged)}, "
                f"iterations={int(self.iterations)}, "
                f"num_inliers={int(self.num_inliers)}, "
                f"error={float(self.error):.6g},\n  T={T})"
            )
        except Exception:  # abstract tracers inside jit
            return object.__repr__(self)


def _search_correspondences(
    factor_type: str,
    target: Union[PointCloud, GaussianVoxelMap],
    target_tree,
    source_points: jax.Array,
    source_num: jax.Array,
    source_covs: Optional[jax.Array],
    T: jax.Array,
    max_dist_sq,
) -> Correspondences:
    """NN of transformed source points in the target + weight matrices."""
    transed = jnp.einsum("na,ba->nb", source_points, T,
                         precision=jax.lax.Precision.HIGHEST)  # [N,4]
    n = source_points.shape[0]

    # Late import: parallel/ is optional at registration-module load.
    from small_gicp_tpu.parallel.map_sharding import (
        ShardedVoxelMapTarget,
        sharded_nn_payload,
    )

    if isinstance(target, ShardedVoxelMapTarget):
        # Map-block scale-out: correspondence search against a
        # mesh-sharded voxel map (SURVEY §5; end-to-end analog of the
        # reference's voxelmap-as-target stack, registration_helper.cpp:136).
        sq_dists, found, mu, t_covs, t_normals = sharded_nn_payload(
            target.vm, transed[:, :3], target.mesh
        )
        idx = jnp.zeros((n,), jnp.int32)  # payload already gathered
    elif isinstance(target, GaussianVoxelMap):
        sq_dists, idx, found = target.nearest_neighbor_search(transed[:, :3])
        # The slot-table payload is already one fused [mean|cov|count]
        # row table — one gather per iteration, no concat. NOTE: fusing
        # this INTO the NN's own [Q,K,*] gather measures 8x slower — the
        # wide 3-D gather hits a bad XLA path — so it stays separate.
        rows = target.payload[idx]
        mu = rows[:, :3]
        t_normals = None
        t_covs = rows[:, 4:13].reshape(-1, 3, 3)
    elif isinstance(target, IncrementalVoxelMap):
        sq_dists, idx, found = target.nearest_neighbor_search(transed[:, :3])
        # The slot-table payload is already one fused
        # [point | normal? | cov?] row table — one gather, no concat.
        rows = target.payload[idx]
        mu = rows[:, :3]
        off = 4
        t_normals = None
        if target.has_normals:
            t_normals = rows[:, off:off + 4]
            off += 4
        t_covs = None
        if target.has_covs:
            t_covs = rows[:, off:off + 9].reshape(-1, 3, 3)
    else:
        # Any ANN structure plugs in as the target searcher, like the
        # reference's Registration template (03_registration_template.cpp:
        # 152-179 swaps KdTree / voxelmap / brute force freely).
        if isinstance(target_tree, ProjectiveSearch):
            sq_dists, idx, found = target_tree.nearest_neighbor_search(
                transed[:, :3]
            )
        else:
            tree = target_tree if target_tree is not None else KdTree.build(target)
            sq_dists, idx = tree.nearest_neighbor_search(transed[:, :3])
            found = jnp.ones_like(sq_dists, dtype=bool)
        m = target.points.shape[0]
        if factor_type == GICP and target.covs is not None:
            # One fused [N,12] gather instead of separate point and cov
            # gathers: TPU gather cost is per-row, so halving the row
            # count halves the dominant non-NN cost of the iteration.
            # The concat is loop-invariant (target is constant across LM
            # iterations) and gets hoisted out of the while loop by XLA.
            table = jnp.concatenate(
                [target.points[:, :3], target.covs.reshape(m, 9)], axis=1
            )
            rows = table[idx]
            mu = rows[:, :3]
            t_normals = None
            t_covs = rows[:, 3:12].reshape(-1, 3, 3)
        else:
            mu = target.points[idx][:, :3]
            t_normals = (
                target.normals[idx] if target.normals is not None else None
            )
            t_covs = target.covs[idx] if target.covs is not None else None

    mask = (
        found
        & (sq_dists <= max_dist_sq)
        & (jnp.arange(n) < source_num)
    )
    W = factors.make_weights(factor_type, T, n, source_covs, t_normals, t_covs)
    # Zero out padding contributions defensively (mask already guards sums).
    return Correspondences(
        target_mu=mu, W=W, mask=mask, target_idx=idx.astype(jnp.int32)
    )


@struct.dataclass
class _OptState:
    T: jax.Array
    lam: jax.Array
    last_e: jax.Array
    H: jax.Array
    b: jax.Array
    iterations: jax.Array
    converged: jax.Array
    failed: jax.Array
    num_inliers: jax.Array
    i: jax.Array


def _converged(delta, rotation_eps, translation_eps):
    rot = jnp.linalg.norm(delta[:3])
    trans = jnp.linalg.norm(delta[3:])
    return (rot <= rotation_eps) & (trans <= translation_eps)


@partial(
    jax.jit,
    static_argnames=(
        "registration_type",
        "optimizer",
        "robust_kernel",
        "max_iterations",
        "max_inner_iterations",
        "verbose",
        "use_fused",
        "psum_axis",
        "solve_dtype",
    ),
)
def align_impl(
    target: Union[PointCloud, GaussianVoxelMap],
    source: PointCloud,
    target_tree,
    init_T: jax.Array,
    registration_type: str = GICP,
    optimizer: str = "lm",
    robust_kernel: Optional[str] = None,
    robust_c: float = 1.0,
    max_iterations: int = 20,
    max_inner_iterations: int = 10,
    max_dist_sq: float = 1.0,
    rotation_eps: float = 0.1 * jnp.pi / 180.0,
    translation_eps: float = 1e-3,
    init_lambda: float = 1e-3,
    lambda_factor: float = 10.0,
    gn_lambda: float = 1e-6,
    dof_mask: Optional[jax.Array] = None,
    dof_lambda: float = 1e9,
    verbose: bool = False,
    use_fused: str = "auto",
    psum_axis: Optional[str] = None,
    solve_dtype: str = "same",
) -> RegistrationResult:
    """Jitted registration. See module docstring for semantics.

    verbose=True prints one line per optimizer iteration
    (iter / error / lambda / |dt| / |dr|, like optimizer.hpp:48-49 and
    :116-118) through jax.debug.print — it works inside the jitted loop
    and under the device tunnel, at the cost of host sync per line.

    psum_axis: set by align_point_sharded's shard_map — the source point
    axis is sharded across this mesh axis, and every reduced quantity
    the optimizer consumes (H, b, e, trial errors, inlier count) is
    psum'd over it, so all devices take identical optimizer decisions.
    This is the explicit-collective form of the reference's per-thread
    accumulator + join (reduction_omp.hpp:32-58): 43 floats + K trial
    errors per iteration ride the interconnect, nothing else.

    solve_dtype: dtype of the 6x6 Newton solves. "same" (default) solves
    in the cloud dtype; "float64" factors (H + λI) in f64 — the
    reference's native solve precision (optimizer.hpp:46,109 LDLT over
    Eigen doubles). At fine voxel sizes the Mahalanobis weights make H
    ill-conditioned enough (κ ~ 1/σ² of the thinnest voxel) that an f32
    Cholesky loses the small-pivot directions and the step UNDERSHOOTS;
    the f64 solve is 48 scalars on the optimizer's critical path
    (emulated f64, nanoseconds) and on the fused path consumes the
    kernel's f64-accumulated H *before* its f32 truncation.

    use_fused: "auto" routes the plain-cloud / f32 / TPU case (any
    factor, optionally Huber/Cauchy-robustified)
    through the single fused Pallas search+linearize kernel
    (ops/gicp_fused_pallas.py — one kernel group per iteration instead
    of the NN + gather + weights + einsum chain); "never" keeps the XLA
    path (callers that vmap this function pass "never": pallas_call
    with scratch does not batch).
    """
    dtype = source.points.dtype
    init_T = jnp.asarray(init_T, dtype)
    max_dist_sq = jnp.asarray(max_dist_sq, dtype)

    if solve_dtype == "same":
        _solve_dt = dtype
    else:
        _solve_dt = jnp.dtype(solve_dtype)
        if _solve_dt == jnp.float64 and not factors._X64_AVAILABLE_AT_IMPORT:
            _solve_dt = dtype  # x64 unavailable: degrade gracefully

    def _solve(H, b, lam):
        """(H + λI)·x = b in solve_dtype, result cast back to dtype."""
        return solve6x6(
            H.astype(_solve_dt), b.astype(_solve_dt),
            lam.astype(_solve_dt),
        ).astype(dtype)

    source_covs = source.covs if registration_type == GICP else None

    def search(T):
        return _search_correspondences(
            registration_type,
            target,
            target_tree,
            source.points,
            source.num_points,
            source_covs,
            T,
            max_dist_sq,
        )

    def _dof(H):
        if dof_mask is not None:
            # RestrictDoFFactor: H += λ·diag(|mask−1|)
            # (factors/general_factor.hpp:57-67).
            H = H + jnp.asarray(dof_lambda, dtype) * jnp.diag(
                jnp.abs(jnp.asarray(dof_mask, dtype) - 1.0)
            )
        return H

    # Factor-specific payload availability for the fused kernel: the
    # three reference factors share one weighted-LS kernel
    # (ops/gicp_fused_pallas._fused_finalize), and the Huber/Cauchy
    # robust kernels fuse too — w(√e_i) is applied at the kernel's
    # finalize and recomputed per trial pose in the trial-error kernel
    # (RobustFactor semantics, robust_kernel.hpp:85,97). See
    # docs/API.md "fused-path exclusions" for what still leaves the
    # fast path and its cost.
    from small_gicp_tpu.ops.gicp_fused_pallas import ROBUST_KERNELS

    _is_cloud = isinstance(target, PointCloud)
    _fused_factor_ok = _is_cloud and (
        (registration_type == GICP
         and target.covs is not None and source.covs is not None)
        or (registration_type == PLANE_ICP and target.normals is not None)
        or registration_type == ICP
    )
    fused_ok = (
        use_fused == "auto"
        and _fused_factor_ok
        and (robust_kernel is None or robust_kernel in ROBUST_KERNELS)
        and isinstance(target_tree, (KdTree, type(None)))
        and dtype == jnp.float32
        and psum_axis is None
        and jax.default_backend() == "tpu"
    )

    if fused_ok:
        # ONE-TIME preparation, structurally outside the optimizer loop:
        # Morton sort + kernel tables + thin-tile bboxes
        # (ops/gicp_fused_pallas.gicp_prepare). The optimizer only
        # consumes permutation-invariant quantities (H, b, error, inlier
        # COUNT), so sorted order is free, and no per-point
        # post-processing runs inside the loop at all.
        from small_gicp_tpu.ops.gicp_fused_pallas import (
            gicp_linearize_tables,
            gicp_prepare,
        )

        f_ttab, f_tb, f_qtab, f_src, _, f_ttab_T = gicp_prepare(
            target.points, target.covs, source.points, source.covs,
            source.num_points, factor=registration_type,
            target_normals=target.normals,
        )

    def search_linearize(T):
        """One optimizer linearization at T:
        (H, b, e, num_inliers, fused_buf). e is None on the fused path
        (the LM body folds the current-pose error into the batched trial
        kernel; the GN body evaluates it through the same kernel);
        fused_buf is the (corr16, sorted_source) pair the trial-error
        kernel consumes (None on the XLA path)."""
        if fused_ok:
            H, b, inliers, corr16 = gicp_linearize_tables(
                f_ttab, f_tb, f_qtab, T, max_dist_sq, f_ttab_T,
                factor=registration_type,
                robust=robust_kernel, robust_c=robust_c,
            )
            # With an f64 solve, hand the kernel's f64-accumulated H/b
            # to the solver UN-truncated (the f32 rounding of H alone
            # costs eps32·κ(H) relative step error, which is what the
            # wider solve is here to avoid).
            return (
                _dof(H.astype(_solve_dt)),
                b.astype(_solve_dt),
                None,
                inliers.astype(jnp.int32),
                (corr16, f_src),
            )
        corr = search(T)
        H, b, e = factors.linearize(
            corr, T, source.points, robust_kernel, robust_c
        )
        inl = jnp.sum(corr.mask).astype(jnp.int32)
        if psum_axis is not None:
            H, b, e, inl = jax.lax.psum((H, b, e, inl), psum_axis)
        return _dof(H), b, e, inl, (corr, None)

    def err_multi(corr, Ts):
        errs = factors.error_multi(
            corr, Ts, source.points, robust_kernel, robust_c
        )
        if psum_axis is not None:
            errs = jax.lax.psum(errs, psum_axis)
        return errs

    zero6 = jnp.zeros((6,), dtype)
    init_state = _OptState(
        T=init_T,
        lam=jnp.asarray(init_lambda, dtype),
        last_e=jnp.asarray(0.0, factors._error_accum_dtype(dtype)),
        H=jnp.zeros((6, 6), dtype),
        b=zero6,
        iterations=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
        failed=jnp.asarray(False),
        num_inliers=jnp.asarray(0, jnp.int32),
        i=jnp.asarray(0, jnp.int32),
    )

    rot_eps = jnp.asarray(rotation_eps, dtype)
    trans_eps = jnp.asarray(translation_eps, dtype)

    # Loop bodies are fully MASKED: when a state is inactive (converged /
    # failed), the body is an identity map. This makes vmap(while_loop)
    # exact — under vmap the loop runs while ANY lane is active and the
    # body executes for all lanes, so inactive lanes must be no-ops. This
    # is what lets the same code serve single-pair (data-dependent early
    # exit) and batched/sharded registration (parallel/batch.py).

    def _sel(active, new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(active, a, b), new, old
        )

    if optimizer == "gn":

        def body(s: _OptState) -> _OptState:
            active = (~s.converged) & (s.i < max_iterations)
            H, b, e, inliers, fused_buf = search_linearize(s.T)
            if e is None:
                # Fused path: evaluate the current-pose error through
                # the frozen-correspondence trial kernel (K=1).
                from small_gicp_tpu.ops.gicp_fused_pallas import (
                    gicp_error_multi_pallas,
                )

                corr16, sorted_src = fused_buf
                e = gicp_error_multi_pallas(
                    corr16, sorted_src, s.T[None], source.num_points,
                    robust=robust_kernel, robust_c=robust_c,
                )[0]
            e = e.astype(factors._error_accum_dtype(dtype))
            delta = _solve(H, -b, jnp.asarray(gn_lambda, dtype))
            H, b = H.astype(dtype), b.astype(dtype)
            conv = _converged(delta, rot_eps, trans_eps)
            # GN applies the update even on the converging iteration
            # (optimizer.hpp:52-53).
            T_new = s.T @ se3_exp(delta)
            if verbose:
                # Fixed GN damping, not an LM schedule — label it so the
                # log can't be misread as evolving lambda (optimizer.hpp:48).
                jax.debug.print(
                    "iter={i} e={e} gn_lambda={l} dr={dr} dt={dt}",
                    i=s.i, e=e, l=jnp.asarray(gn_lambda, dtype),
                    dr=jnp.linalg.norm(delta[:3]),
                    dt=jnp.linalg.norm(delta[3:]),
                )
            new = s.replace(
                T=T_new,
                H=H,
                b=b,
                last_e=e,
                converged=conv,
                iterations=s.i,
                num_inliers=inliers,
                i=s.i + 1,
            )
            return _sel(active, new, s)

        def cond(s: _OptState):
            return (s.i < max_iterations) & (~s.converged)

        final = jax.lax.while_loop(cond, body, init_state)

    elif optimizer == "lm":

        def body(s: _OptState) -> _OptState:
            active = (~s.converged) & (~s.failed) & (s.i < max_iterations)
            H, b, e0, inliers, fused_buf = search_linearize(s.T)

            # Inner lambda trials (optimizer.hpp:107-134), BATCHED: the
            # reference tries lambdas sequentially, but trial j's lambda
            # is deterministic (lam * factor^j), so all max_inner trials
            # are solved and error-evaluated in one batched pass and the
            # first non-increasing trial is selected — identical
            # accept/reject semantics, ~10x fewer sequential kernels on
            # the optimizer's critical path.
            K = max_inner_iterations
            lambdas = s.lam * jnp.asarray(lambda_factor, dtype) ** jnp.arange(
                K, dtype=dtype
            )
            deltas = jax.vmap(lambda l: _solve(H, -b, l))(lambdas)  # [K,6]
            H, b = H.astype(dtype), b.astype(dtype)
            Ts = jnp.einsum("ab,kbc->kac", s.T, jax.vmap(se3_exp)(deltas),
                               precision=jax.lax.Precision.HIGHEST)
            if e0 is None:
                # Fused path: current-pose error rides in the same
                # batched kernel as the K trials (one pallas_call, same
                # precision on both sides of the accept test). corr16 is
                # in Morton-sorted order; pair it with the sorted source
                # rows it was produced from.
                from small_gicp_tpu.ops.gicp_fused_pallas import (
                    gicp_error_multi_pallas,
                )

                corr16, sorted_src = fused_buf
                errs_all = gicp_error_multi_pallas(
                    corr16,
                    sorted_src,
                    jnp.concatenate([s.T[None], Ts], axis=0),
                    source.num_points,
                    robust=robust_kernel, robust_c=robust_c,
                )
                e0 = errs_all[0]
                errs = errs_all[1:]
            else:
                corr, _ = fused_buf
                errs = err_multi(corr, Ts)  # [K]
            ok = errs <= e0
            accepted = jnp.any(ok)
            j = jnp.argmax(ok)  # first accepted trial
            T_f = jnp.where(accepted, Ts[j], s.T)
            e_f = jnp.where(accepted, errs[j], e0)
            delta_f = jnp.where(accepted, deltas[j], zero6)
            # Accept at trial j: lam = (lam*f^j)/f; all-reject: lam*f^K
            # (reference multiplies by factor on every rejected trial).
            lam_f = jnp.where(
                accepted,
                lambdas[j] / lambda_factor,
                s.lam * jnp.asarray(lambda_factor, dtype) ** K,
            )
            conv = accepted & _converged(delta_f, rot_eps, trans_eps)
            if verbose:
                jax.debug.print(
                    "iter={i} e={e} new_e={ne} lambda={l} dr={dr} dt={dt}",
                    i=s.i, e=e0, ne=e_f, l=lam_f,
                    dr=jnp.linalg.norm(delta_f[:3]),
                    dt=jnp.linalg.norm(delta_f[3:]),
                )
            new = s.replace(
                T=T_f,
                lam=lam_f,
                H=H,
                b=b,
                last_e=e_f,
                converged=conv,
                failed=~accepted,
                iterations=s.i,
                num_inliers=inliers,
                i=s.i + 1,
            )
            return _sel(active, new, s)

        def cond(s: _OptState):
            return (s.i < max_iterations) & (~s.converged) & (~s.failed)

        final = jax.lax.while_loop(cond, body, init_state)

    else:
        raise ValueError(f"unknown optimizer {optimizer!r} (use 'gn' or 'lm')")

    return RegistrationResult(
        T_target_source=final.T,
        converged=final.converged,
        iterations=final.iterations,
        num_inliers=final.num_inliers,
        H=final.H,
        b=final.b,
        error=final.last_e,
    )


class Registration:
    """Configured registration pipeline (reference Registration template,
    registration/registration.hpp:17-54, with factor / optimizer /
    rejector / robust kernel selected by config instead of C++ types)."""

    def __init__(
        self,
        registration_type: str = GICP,
        optimizer: str = "lm",
        robust_kernel: Optional[str] = None,
        robust_c: float = 1.0,
        max_iterations: int = 20,
        max_inner_iterations: int = 10,
        max_correspondence_distance: float = 1.0,
        rotation_eps: float = 0.1 * 3.141592653589793 / 180.0,
        translation_eps: float = 1e-3,
        dof_rotation_mask=None,
        dof_translation_mask=None,
        verbose: bool = False,
        solve_dtype: str = "same",
    ):
        if registration_type not in (ICP, PLANE_ICP, GICP, "vgicp"):
            raise ValueError(f"unknown registration type {registration_type!r}")
        self.registration_type = registration_type
        self.optimizer = optimizer
        self.robust_kernel = robust_kernel
        self.robust_c = robust_c
        self.max_iterations = max_iterations
        self.max_inner_iterations = max_inner_iterations
        self.max_correspondence_distance = max_correspondence_distance
        self.rotation_eps = rotation_eps
        self.translation_eps = translation_eps
        self.verbose = verbose
        self.solve_dtype = solve_dtype
        if dof_rotation_mask is not None or dof_translation_mask is not None:
            rm = [1.0, 1.0, 1.0] if dof_rotation_mask is None else list(dof_rotation_mask)
            tm = [1.0, 1.0, 1.0] if dof_translation_mask is None else list(dof_translation_mask)
            self.dof_mask = jnp.asarray(rm + tm)
        else:
            self.dof_mask = None

    def align(
        self,
        target: Union[PointCloud, GaussianVoxelMap],
        source: PointCloud,
        target_tree=None,
        init_T=None,
    ) -> RegistrationResult:
        dtype = source.points.dtype
        if init_T is None:
            init_T = jnp.eye(4, dtype=dtype)
        factor = self.registration_type
        if factor == "vgicp":
            factor = GICP  # VGICP = GICP factor with a voxelmap target
        return align_impl(
            target,
            source,
            target_tree,
            init_T,
            registration_type=factor,
            optimizer=self.optimizer,
            robust_kernel=self.robust_kernel,
            robust_c=self.robust_c,
            max_iterations=self.max_iterations,
            max_inner_iterations=self.max_inner_iterations,
            max_dist_sq=self.max_correspondence_distance**2,
            rotation_eps=self.rotation_eps,
            translation_eps=self.translation_eps,
            dof_mask=self.dof_mask,
            verbose=self.verbose,
            solve_dtype=self.solve_dtype,
        )


def align_points(
    target: Union[PointCloud, GaussianVoxelMap],
    source: PointCloud,
    target_tree=None,
    init_T=None,
    **kwargs,
) -> RegistrationResult:
    """Functional one-shot align over preprocessed clouds."""
    return Registration(**kwargs).align(target, source, target_tree, init_T)
