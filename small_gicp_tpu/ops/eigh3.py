"""Batched 3x3 symmetric eigendecomposition (cyclic Jacobi, branch-free).

TPU-native replacement for the reference's per-point
Eigen::SelfAdjointEigenSolver<Matrix3d>::computeDirect
(util/normal_estimation.hpp:88-89). A fixed number of cyclic Jacobi
sweeps is unconditionally robust (no degenerate-case branches, unlike
closed-form solvers), converges quadratically (6 sweeps ≈ machine
precision for 3x3), and vectorizes perfectly over the point axis: every
step is a batched 3x3 matmul / elementwise op on the VPU.

Returns eigenvalues ascending with matching eigenvector columns —
identical ordering contract to Eigen's solver, which the normal/cov
setters rely on (normal = col 0 = smallest).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_JACOBI_PAIRS = ((0, 1), (0, 2), (1, 2))


def _jacobi_rotation(app, aqq, apq, eps):
    """Classic Jacobi angle: returns (c, s) zeroing A[p,q]."""
    # tau = (aqq - app) / (2 apq); t = sign(tau)/(|tau| + sqrt(1+tau^2))
    small = jnp.abs(apq) <= eps
    safe_apq = jnp.where(small, jnp.ones_like(apq), apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    # sign(0) == 0 would give t == 0 spuriously; tau==0 means a 45° rotation.
    t = jnp.where(tau == 0.0, jnp.ones_like(t), t)
    t = jnp.where(small, jnp.zeros_like(t), t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return c, s


@partial(jax.jit, static_argnames=("sweeps",))
def eigh3x3(A: jax.Array, sweeps: int = 6) -> Tuple[jax.Array, jax.Array]:
    """Eigendecomposition of symmetric [..., 3, 3] matrices.

    Returns (eigenvalues [..., 3] ascending, eigenvectors [..., 3, 3] with
    eigenvectors in columns, orthonormal).
    """
    dtype = A.dtype
    eps = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-20, dtype)
    batch = A.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    V = eye
    # Symmetrize defensively (accumulated covs can be slightly asymmetric).
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))

    for _ in range(sweeps):
        for p, q in _JACOBI_PAIRS:
            c, s = _jacobi_rotation(A[..., p, p], A[..., q, q], A[..., p, q], eps)
            # G = I with [[c, s], [-s, c]] in the (p, q) plane.
            G = eye
            G = G.at[..., p, p].set(c)
            G = G.at[..., q, q].set(c)
            G = G.at[..., p, q].set(s)
            G = G.at[..., q, p].set(-s)
            A = jnp.swapaxes(G, -1, -2) @ A @ G
            V = V @ G

    vals = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    order = jnp.argsort(vals, axis=-1)
    vals = jnp.take_along_axis(vals, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return vals, V


@jax.jit
def smallest_eigvec3x3(A: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of symmetric
    [..., 3, 3] matrices, in closed form.

    This is the hot path of normal/covariance estimation: the GICP
    plane regularization V·diag(1e-3,1,1)·Vᵀ only depends on the
    smallest eigenvector (it equals I − (1−1e-3)·v₀v₀ᵀ) and the normal
    IS that vector, so the full decomposition is never needed. The
    analytic method (same math as the reference's
    Eigen::SelfAdjointEigenSolver::computeDirect,
    util/normal_estimation.hpp:88-89) is pure elementwise arithmetic —
    XLA fuses it into ONE kernel, vs 18 batched rotation steps for the
    cyclic-Jacobi `eigh3x3`.

    Method: scale A, get the smallest root of the characteristic cubic
    via the trigonometric formula, then extract the (1-D) kernel of
    A − λ₀I as the largest cross product of its rows (pivoting keeps the
    extraction well-conditioned). Degenerate cases:
      * A ≈ c·I (no deviatoric part): returns e₀ = (1,0,0), matching
        Jacobi/Eigen on an identity-like input.
      * λ₀ ≈ λ₁ (linear/isotropic neighborhoods): the direction within
        the degenerate eigenplane is arbitrary — for the reference too —
        but the result stays orthogonal to the well-separated largest
        eigenvector to first order (the leading terms of the row cross
        products cancel exactly).
    """
    dtype = A.dtype
    tiny = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-20, dtype)
    eye = jnp.eye(3, dtype=dtype)
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))

    # Scale to unit max-entry for conditioning of the cubic.
    scale = jnp.max(jnp.abs(A), axis=(-1, -2), keepdims=True)
    s = jnp.where(scale > tiny, scale, 1.0)
    As = A / s

    q = (As[..., 0, 0] + As[..., 1, 1] + As[..., 2, 2]) / 3.0
    B = As - q[..., None, None] * eye
    p2 = jnp.sum(B * B, axis=(-1, -2)) / 6.0  # tr(B²)/6, B symmetric
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    safe_p = jnp.where(p > tiny, p, 1.0)
    r = jnp.clip(detB / (2.0 * safe_p**3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Roots: q + 2p·cos(phi + 2πk/3); phi ∈ [0, π/3] ⇒ k=1 is smallest.
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    C = As - lam0[..., None, None] * eye
    c01 = jnp.cross(C[..., 0, :], C[..., 1, :])
    c02 = jnp.cross(C[..., 0, :], C[..., 2, :])
    c12 = jnp.cross(C[..., 1, :], C[..., 2, :])
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    v = jnp.where(
        ((n01 >= n02) & (n01 >= n12))[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    nv = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    ok = (nv > tiny) & (p > tiny)[..., None]
    e0 = jnp.zeros_like(v).at[..., 0].set(1.0)
    return jnp.where(ok, v / jnp.where(ok, nv, 1.0), e0)


def inv3x3(A: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse via adjugate (reference computes
    RCR.block<3,3>().inverse() per point — gicp_factor.hpp:60)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    safe_det = jnp.where(jnp.abs(det) < 1e-30, jnp.ones_like(det), det)
    inv_det = jnp.where(jnp.abs(det) < 1e-30, jnp.zeros_like(det), 1.0 / safe_det)
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co10, co11, co12], axis=-1),
            jnp.stack([co20, co21, co22], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def solve6x6(H: jax.Array, b: jax.Array, damping: jax.Array) -> jax.Array:
    """Solve (H + damping·I) x = b for 6x6 symmetric H via Cholesky.

    Matches the reference's LDLT solve (optimizer.hpp:46,109); Cholesky is
    the XLA-friendly equivalent for the SPD damped system.
    """
    A = H + damping * jnp.eye(6, dtype=H.dtype)
    return _cholesky_solve6(A, b)


def _cholesky_solve6(A: jax.Array, b: jax.Array) -> jax.Array:
    """Unrolled 6x6 Cholesky solve in plain jnp.

    jax.scipy's cho_factor lowers to a separate (non-fusible) Cholesky
    kernel; for a fixed tiny system the unrolled scalar recurrence fuses
    into the surrounding optimizer computation instead of paying two
    extra kernel dispatches per LM iteration. Guards: a non-positive
    pivot (indefinite H from f32 noise) is clamped to a tiny positive
    value, which matches LDLT's behavior of producing a large-but-finite
    step that the LM accept test then rejects.
    """
    n = 6
    eps = jnp.asarray(1e-30, A.dtype)
    # L (lower) columns built one at a time; everything static-shape.
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j, j]
        for kk in range(j):
            s = s - L[j][kk] * L[j][kk]
        diag = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = diag
        inv_diag = 1.0 / diag
        for i in range(j + 1, n):
            s = A[i, j]
            for kk in range(j):
                s = s - L[i][kk] * L[j][kk]
            L[i][j] = s * inv_diag
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for kk in range(i):
            s = s - L[i][kk] * y[kk]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for kk in range(i + 1, n):
            s = s - L[kk][i] * x[kk]
        x[i] = s / L[i][i]
    return jnp.stack(x)
