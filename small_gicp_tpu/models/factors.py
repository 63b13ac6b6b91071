"""Per-point error factors (ICP / point-to-plane / GICP) — fully batched.

The reference implements one C++ struct per factor with a scalar
linearize()/error() pair invoked per source point under OMP/TBB
(factors/icp_factor.hpp:14-70, plane_icp_factor.hpp:14-75,
gicp_factor.hpp:14-97). On TPU the three unify into a single batched
formulation: every factor is

    r_i = mu_i − T·p_i              (3-vector residual)
    e_i = ½ r_iᵀ W_i r_i
    J_i = [R·skew(p_i) | −R]        (3x6 geometric Jacobian)
    H_i = J_iᵀ W_i J_i,   b_i = J_iᵀ W_i r_i

with a per-point 3x3 weight matrix W_i that carries the factor type:

    ICP        W = I                      (icp_factor.hpp:34-53)
    PLANE_ICP  W = diag(n ∘ n)            (the reference's element-wise
               n⊙r residual — plane_icp_factor.hpp:46-54 — expands to
               exactly this quadratic form)
    GICP       W = (C_target + R C_source Rᵀ)⁻¹   (gicp_factor.hpp:59-60)

Correspondences (NN index, inlier mask, W) are the state the reference
caches inside each factor object; here they are arrays, frozen between
linearizations exactly as the reference freezes them for the LM inner
error evaluations (optimizer.hpp:113 reuses stored indices/mahalanobis).

Robust kernels (factors/robust_kernel.hpp): weight = huber(√e) or
cauchy(√e) applied multiplicatively to (H, b, e) at linearize, and
recomputed from the new per-point error at every error() call
(robust_kernel.hpp:85,97).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from small_gicp_tpu.utils.lie import skew

# Full-f32 dot products: geometry math does not survive the TPU default
# of one-pass bf16 matmuls (see package __init__).
_HI = jax.lax.Precision.HIGHEST

ICP = "icp"
PLANE_ICP = "plane_icp"
GICP = "gicp"

FACTOR_TYPES = (ICP, PLANE_ICP, GICP)


@struct.dataclass
class Correspondences:
    """Frozen per-source-point correspondence state (pytree).

    Equivalent to the reference's vector<Factor> state: target_index,
    inlier flag, and the cached weight/mahalanobis matrix
    (gicp_factor.hpp:94-96).
    """

    target_mu: jax.Array  # [N,3] corresponding target point (gathered)
    W: jax.Array  # [N,3,3] weight matrix (I / diag(n²) / mahalanobis)
    mask: jax.Array  # [N] bool inlier mask
    target_idx: jax.Array  # [N] int32 (for introspection/tests)


def make_weights(
    factor_type: str,
    T: jax.Array,
    num_points: int,
    source_covs: Optional[jax.Array],
    target_normals: Optional[jax.Array],
    target_covs: Optional[jax.Array],
) -> jax.Array:
    """Build the per-point [N,3,3] weight matrices for a factor type."""
    from small_gicp_tpu.ops.eigh3 import inv3x3

    if factor_type == ICP:
        return jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), (num_points, 3, 3))
    if factor_type == PLANE_ICP:
        if target_normals is None:
            raise ValueError("point-to-plane ICP requires target normals")
        n = target_normals[:, :3]
        w = n * n  # diag entries of diag(n)ᵀdiag(n)
        out = jnp.zeros((n.shape[0], 3, 3), dtype=n.dtype)
        out = out.at[:, 0, 0].set(w[:, 0])
        out = out.at[:, 1, 1].set(w[:, 1])
        out = out.at[:, 2, 2].set(w[:, 2])
        return out
    if factor_type == GICP:
        if source_covs is None or target_covs is None:
            raise ValueError("GICP requires source and target covariances")
        R = T[:3, :3]
        rcr = target_covs + jnp.einsum("ij,njk,lk->nil", R, source_covs, R, precision=_HI)
        return inv3x3(rcr)
    raise ValueError(f"unknown factor type {factor_type!r}")


def robust_weight(kernel: Optional[str], c, e: jax.Array) -> jax.Array:
    """w(√e) per robust_kernel.hpp: Huber min(1, c/|x|), Cauchy c/(c+x²).

    `e` is the per-point error BEFORE weighting; the kernel argument is
    √e (robust_kernel.hpp:85).
    """
    if kernel is None:
        return jnp.ones_like(e)
    x = jnp.sqrt(jnp.maximum(e, 0.0))
    if kernel == "huber":
        safe = jnp.maximum(x, 1e-30)
        return jnp.where(x < c, jnp.ones_like(x), c / safe)
    if kernel == "cauchy":
        return c / (c + x * x)
    raise ValueError(f"unknown robust kernel {kernel!r}")


# Captured at import (the package __init__ enables x64 before this module
# loads) so that an embedding application toggling jax_enable_x64 later
# cannot silently revert error accumulation to f32 — the same
# capture-at-import approach as the Precision.HIGHEST guard in __init__.
_X64_AVAILABLE_AT_IMPORT = bool(jax.config.jax_enable_x64)


def _error_accum_dtype(dtype):
    """Accumulation dtype for total-error sums.

    The reference accumulates e (and H, b) in f64 everywhere
    (reduction.hpp uses double). On TPU the hot path stores f32, but the
    LM accept test `new_e <= e` (optimizer.hpp:121) compares two sums
    over N points whose f32 accumulation noise (~sqrt(N)·eps·e) swamps
    the real error change near convergence — trials get rejected by
    noise and the optimizer aborts early. Summing per-point f32 errors
    into f64 (one emulated-f64 reduction per call, negligible) restores
    the reference's decision precision.
    """
    if dtype == jnp.float32 and _X64_AVAILABLE_AT_IMPORT:
        return jnp.float64
    return dtype


def geometric_jacobian(T: jax.Array, source_xyz: jax.Array) -> jax.Array:
    """[N,3,6] J = [R·skew(p) | −R], d(residual)/d(twist) at T
    (gicp_factor.hpp:64-66; twist is [rx ry rz tx ty tz])."""
    R = T[:3, :3]
    Jr = jnp.einsum("ij,njk->nik", R, skew(source_xyz), precision=_HI)  # [N,3,3]
    Jt = jnp.broadcast_to(-R, (source_xyz.shape[0], 3, 3))
    return jnp.concatenate([Jr, Jt], axis=-1)


def linearize(
    corr: Correspondences,
    T: jax.Array,
    source_points: jax.Array,
    robust_kernel: Optional[str] = None,
    robust_c: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Masked reduction of (H [6,6], b [6], e scalar) over all factors.

    Equivalent to SerialReduction / ParallelReductionOMP / TBB
    (registration/reduction.hpp:11-63 and parallel variants): the
    per-thread accumulator pattern becomes one flattened [6,3N]x[3N,6]
    matmul on the MXU.
    """
    n = source_points.shape[0]
    transed = jnp.einsum("na,ba->nb", source_points, T, precision=_HI)  # [N,4]
    r = corr.target_mu - transed[:, :3]  # [N,3]
    J = geometric_jacobian(T, source_points[:, :3])  # [N,3,6]

    Wr = jnp.einsum("nij,nj->ni", corr.W, r, precision=_HI)  # [N,3]
    e_i = 0.5 * jnp.sum(r * Wr, axis=-1)  # [N]
    w = robust_weight(robust_kernel, robust_c, e_i) * corr.mask.astype(r.dtype)

    WJ = jnp.einsum("nij,njk->nik", corr.W, J, precision=_HI)  # [N,3,6]
    WJw = WJ * w[:, None, None]
    # H = Σ JᵀWJ as one [6,3N]·[3N,6] contraction (MXU-friendly).
    H = jnp.einsum("nij,nik->jk", J, WJw, precision=_HI)
    b = jnp.einsum("nij,ni->j", J, Wr * w[:, None], precision=_HI)
    e = jnp.sum((e_i * w).astype(_error_accum_dtype(r.dtype)))
    return H, b, e


def error(
    corr: Correspondences,
    T: jax.Array,
    source_points: jax.Array,
    robust_kernel: Optional[str] = None,
    robust_c: float = 1.0,
) -> jax.Array:
    """Total error at T with frozen correspondences (reduction error path,
    reduction.hpp:44-62; per-factor error gicp_factor.hpp:81-89)."""
    transed = jnp.einsum("na,ba->nb", source_points, T, precision=_HI)
    r = corr.target_mu - transed[:, :3]
    Wr = jnp.einsum("nij,nj->ni", corr.W, r, precision=_HI)
    e_i = 0.5 * jnp.sum(r * Wr, axis=-1)
    w = robust_weight(robust_kernel, robust_c, e_i) * corr.mask.astype(r.dtype)
    return jnp.sum((e_i * w).astype(_error_accum_dtype(r.dtype)))


def linearize_per_point(
    corr: Correspondences,
    T: jax.Array,
    source_points: jax.Array,
    robust_kernel: Optional[str] = None,
    robust_c: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-point (H_i [N,6,6], b_i [N,6], e_i [N]) — masked rows are zero.

    This is the per-factor view the reference exposes through its Python
    bindings (src/python/factors.cpp:44-224: ICPFactor/GICPFactor etc.
    with a per-point linearize); summing over i reproduces linearize().
    """
    transed = jnp.einsum("na,ba->nb", source_points, T, precision=_HI)
    r = corr.target_mu - transed[:, :3]
    J = geometric_jacobian(T, source_points[:, :3])
    Wr = jnp.einsum("nij,nj->ni", corr.W, r, precision=_HI)
    e_i = 0.5 * jnp.sum(r * Wr, axis=-1)
    w = robust_weight(robust_kernel, robust_c, e_i) * corr.mask.astype(r.dtype)
    WJ = jnp.einsum("nij,njk->nik", corr.W, J, precision=_HI)
    H_i = jnp.einsum("nij,nik->njk", J, WJ, precision=_HI) * w[:, None, None]
    b_i = jnp.einsum("nij,ni->nj", J, Wr, precision=_HI) * w[:, None]
    return H_i, b_i, e_i * w


class _FactorBase:
    """Per-point factor objects mirroring the reference's Python factor
    classes (src/python/factors.cpp). linearize() searches the
    correspondence of every source point at pose T and returns the
    per-point linearized system + inlier mask."""

    factor_type: str = ICP
    robust_kernel: Optional[str] = None
    robust_c: float = 1.0

    def __init__(self, robust_kernel: Optional[str] = None, robust_c: float = 1.0):
        self.robust_kernel = robust_kernel
        self.robust_c = robust_c

    def linearize(
        self,
        target,
        source,
        target_tree,
        T,
        source_index=None,
        rejector=None,
        max_dist_sq=1.0,
    ):
        """Linearize the factor(s) at pose T.

        Batched by default — returns (H [N,6,6], b [N,6], e [N],
        mask [N]) for every source point in one pass (the TPU shape of
        the reference's per-factor loop). With `source_index` it
        reproduces the reference binding exactly (factors.cpp:53-103):
        returns (success, H 6x6, b 6, e) for that single point, at
        O(M) cost (only that point is searched/linearized).
        `rejector` (DistanceRejector) overrides max_dist_sq.
        """
        from small_gicp_tpu.models.registration import _search_correspondences

        if source_index is not None and not isinstance(
            source_index, (int, np.integer)
        ):
            # Guards the positional-argument hazard: this slot used to
            # be max_dist_sq, so a legacy call like linearize(..., 0.25)
            # must fail loudly instead of binding a float as an index.
            raise TypeError(
                f"source_index must be an int, got {type(source_index).__name__}"
            )
        if rejector is not None:
            max_dist_sq = rejector.max_dist_sq
        T = jnp.asarray(T, source.points.dtype)

        src_points = source.points
        src_covs = source.covs if self.factor_type == GICP else None
        src_n = source.num_points
        if source_index is not None:
            i = int(source_index)
            if not 0 <= i < int(source.num_points):
                raise IndexError(
                    f"source_index {i} out of range [0, {int(source.num_points)})"
                )
            # Single-point slice: the per-point search/linearize is
            # independent, so the reference's one-index call costs O(M)
            # here too, not a full batched pass.
            src_points = src_points[i:i + 1]
            src_covs = None if src_covs is None else src_covs[i:i + 1]
            src_n = jnp.asarray(1, jnp.int32)

        corr = _search_correspondences(
            self.factor_type,
            target,
            target_tree,
            src_points,
            src_n,
            src_covs,
            T,
            jnp.asarray(max_dist_sq, source.points.dtype),
        )
        H_i, b_i, e_i = linearize_per_point(
            corr, T, src_points, self.robust_kernel, self.robust_c
        )
        if source_index is not None:
            return bool(corr.mask[0]), H_i[0], b_i[0], float(e_i[0])
        return H_i, b_i, e_i, corr.mask


class DistanceRejector:
    """Correspondence rejector (registration/rejector.hpp:19-28): mask out
    pairs with squared distance above max_dist_sq. In the batched engine
    this is just the mask computation; the class exists for API parity
    with the reference bindings (align.cpp factors/rejector arguments)."""

    def __init__(self, max_dist: float = 1.0):
        self.max_dist_sq = max_dist * max_dist

    def set_max_distance(self, dist: float) -> None:
        """Binding parity: factors.cpp:29-41."""
        self.max_dist_sq = dist * dist

    def __call__(self, sq_dists: jax.Array) -> jax.Array:
        return sq_dists <= self.max_dist_sq


class ICPFactor(_FactorBase):
    """Point-to-point (factors/icp_factor.hpp:14-70)."""

    factor_type = ICP


class PointToPlaneICPFactor(_FactorBase):
    """Point-to-plane (factors/plane_icp_factor.hpp:14-75)."""

    factor_type = PLANE_ICP


class GICPFactor(_FactorBase):
    """Distribution-to-distribution (factors/gicp_factor.hpp:14-97)."""

    factor_type = GICP


def error_multi(
    corr: Correspondences,
    Ts: jax.Array,
    source_points: jax.Array,
    robust_kernel: Optional[str] = None,
    robust_c: float = 1.0,
) -> jax.Array:
    """Total error at K candidate poses at once: [K,4,4] -> [K].

    Used to evaluate ALL of the LM inner loop's lambda trials in one
    batched pass (the trial-j lambda is deterministic, lambda0*factor^j,
    so the reference's sequential solve/evaluate trials —
    optimizer.hpp:107-134 — collapse into one kernel with identical
    accept/reject semantics). Keeps the optimizer latency-bound chains of
    tiny ops off the TPU's critical path.
    """
    transed = jnp.einsum("kab,nb->kna", Ts, source_points, precision=_HI)  # [K,N,4]
    r = corr.target_mu[None, :, :] - transed[..., :3]  # [K,N,3]
    Wr = jnp.einsum("nij,knj->kni", corr.W, r, precision=_HI)
    e_i = 0.5 * jnp.sum(r * Wr, axis=-1)  # [K,N]
    w = robust_weight(robust_kernel, robust_c, e_i) * corr.mask.astype(r.dtype)
    return jnp.sum((e_i * w).astype(_error_accum_dtype(r.dtype)), axis=-1)
