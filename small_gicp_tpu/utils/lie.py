"""SE(3)/SO(3) exponential maps and skew operator (pure jnp, branch-free).

Semantics match the reference's Sophus-derived implementations
(reference: include/small_gicp/util/lie.hpp:13-96): twist ordering is
[rx ry rz tx ty tz] (rotation first) and pose updates right-multiply,
T ← T · se3_exp(delta) (reference: registration/optimizer.hpp:53,112).

The reference branches on a small-angle threshold; on TPU we compute both
the exact trigonometric coefficients and their Taylor expansions and
select with jnp.where on a safe (clamped) angle, which is fully
vectorizable and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL_ANGLE = 1e-5
_C_TAYLOR_ANGLE = 1e-2  # switch point for the cancellation-prone c coeff


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector (reference: lie.hpp skew).

    Batched: accepts [..., 3] and returns [..., 3, 3].
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _rotation_coeffs(theta_sq: jax.Array):
    """(sinθ/θ, (1−cosθ)/θ², (θ−sinθ)/θ³) with small-angle Taylor fallback.

    Numerical notes:
      * (1−cosθ) is computed as 2·sin²(θ/2): cancellation-free, and it
        avoids jnp.cos entirely — XLA's cos approximation is only
        f32-accurate (~2.5e-8 abs error) even under x64, while sin is
        correctly rounded.
      * (θ−sinθ)/θ³ cancels catastrophically for small θ, so its Taylor
        branch kicks in below θ=0.01 where the series (3 terms) is
        already at machine precision.
    """
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    small = theta < _SMALL_ANGLE
    # Clamp so the "exact" branch never divides by ~0 (result is discarded
    # where the Taylor branch is selected).
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    safe_sq = safe_theta * safe_theta

    sin_t = jnp.sin(safe_theta)
    sin_half = jnp.sin(0.5 * safe_theta)
    a_exact = sin_t / safe_theta
    b_exact = 2.0 * sin_half * sin_half / safe_sq

    a_taylor = 1.0 - theta_sq / 6.0 * (1.0 - theta_sq / 20.0)
    b_taylor = 0.5 - theta_sq / 24.0 * (1.0 - theta_sq / 30.0)

    a = jnp.where(small, a_taylor, a_exact)
    b = jnp.where(small, b_taylor, b_exact)

    small_c = theta < _C_TAYLOR_ANGLE
    safe_theta_c = jnp.where(small_c, jnp.ones_like(theta), theta)
    c_exact = (safe_theta_c - jnp.sin(safe_theta_c)) / (
        safe_theta_c * safe_theta_c * safe_theta_c
    )
    c_taylor = (1.0 / 6.0) * (1.0 - theta_sq / 20.0 * (1.0 - theta_sq / 42.0))
    c = jnp.where(small_c, c_taylor, c_exact)
    return a, b, c


def so3_exp(omega: jax.Array) -> jax.Array:
    """Rotation matrix exp of an so(3) vector [..., 3] → [..., 3, 3].

    Rodrigues form; equals the reference's quaternion-based so3_exp
    (lie.hpp:13-47) exactly.
    """
    theta_sq = jnp.sum(omega * omega, axis=-1)
    a, b, _ = _rotation_coeffs(theta_sq)
    W = skew(omega)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def se3_exp(twist: jax.Array) -> jax.Array:
    """SE(3) exp of a twist [..., 6] = [rx ry rz tx ty tz] → [..., 4, 4].

    Rotation-first ordering and left-Jacobian translation, matching the
    reference (lie.hpp:77-96).
    """
    omega = twist[..., :3]
    nu = twist[..., 3:]
    theta_sq = jnp.sum(omega * omega, axis=-1)
    a, b, c = _rotation_coeffs(theta_sq)

    W = skew(omega)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=twist.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, nu)

    batch = twist.shape[:-1]
    T = jnp.zeros(batch + (4, 4), dtype=twist.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def so3_log(R: jax.Array) -> jax.Array:
    """Inverse of so3_exp: [..., 3, 3] → [..., 3]. Used for error metrics.

    θ is recovered with atan2(sinθ, cosθ) rather than arccos (XLA's
    arccos/cos are only f32-accurate). Valid for θ < π (sufficient for
    pose-error metrics; θ ≈ π has a removable axis ambiguity anyway).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )  # = 2 sinθ · axis
    sin_theta = 0.5 * jnp.linalg.norm(w, axis=-1)
    cos_theta = 0.5 * (trace - 1.0)
    theta = jnp.arctan2(sin_theta, cos_theta)
    small = theta < _SMALL_ANGLE
    safe_sin = jnp.where(small, jnp.ones_like(sin_theta), sin_theta)
    scale_exact = theta / (2.0 * safe_sin)
    scale_taylor = 0.5 + theta * theta / 12.0
    scale = jnp.where(small, scale_taylor, scale_exact)
    return w * scale[..., None]


def rotation_error_deg(Ra: jax.Array, Rb: jax.Array) -> jax.Array:
    """Angle between two rotations in degrees (test utility; mirrors
    Eigen::AngleAxisd(T_a.inverse()*T_b) in registration_test.cpp:139-151)."""
    dR = jnp.swapaxes(Ra, -1, -2) @ Rb
    return jnp.linalg.norm(so3_log(dR), axis=-1) * (180.0 / jnp.pi)


def rigid_inverse(T):
    """Closed-form inverse of a rigid transform [R t; 0 1]."""
    import jax.numpy as jnp

    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-R.T @ t)
    return Ti


def orthonormalize(T):
    """Re-project the rotation block of a rigid transform onto SO(3)
    (symmetric orthogonalization via one SVD-free Newton-ish sweep:
    R ← R·(3I − RᵀR)/2, quadratically convergent near SO(3)).

    f32 pose composition accumulates off-manifold drift over long
    odometry runs (hundreds of T·exp(δ) compositions) that the
    reference never sees because its poses are f64
    (Eigen::Isometry3d); one sweep restores orthogonality to ~f32
    roundoff for inputs within ~1e-3 of SO(3). The translation is
    untouched.
    """
    import jax.numpy as jnp

    R = T[..., :3, :3]
    RtR = jnp.swapaxes(R, -1, -2) @ R
    eye3 = jnp.eye(3, dtype=T.dtype)
    R = R @ (1.5 * eye3 - 0.5 * RtR)
    return T.at[..., :3, :3].set(R)
