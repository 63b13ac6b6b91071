"""Lie-group ops vs scipy matrix-exponential oracle."""

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from small_gicp_tpu.utils.lie import se3_exp, skew, so3_exp, so3_log, rotation_error_deg
import pytest

pytestmark = pytest.mark.smoke


def _se3_hat(twist):
    """4x4 matrix form of a twist [rx ry rz tx ty tz]."""
    m = np.zeros((4, 4))
    w = twist[:3]
    m[:3, :3] = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
    )
    m[:3, 3] = twist[3:]
    return m


def test_skew():
    v = np.array([1.0, 2.0, 3.0])
    S = np.asarray(skew(jnp.asarray(v)))
    assert np.allclose(S, -S.T)
    assert np.allclose(S @ v, 0.0)
    u = np.array([0.3, -0.5, 0.7])
    assert np.allclose(S @ u, np.cross(v, u))


# XLA's sin/cos are only ~f32-accurate for O(1) arguments, so exp maps of
# large rotations carry ~3e-8 absolute error (the small-angle regime that
# optimizer updates live in is machine-exact; see lie.py numerical notes).
def _tol(scale):
    return 1e-13 if scale <= 0.1 else 1e-6


def test_so3_exp_matches_expm(rng):
    for scale in (1e-10, 1e-6, 1e-3, 0.1, 1.0, 3.0):
        w = rng.normal(size=3) * scale
        R = np.asarray(so3_exp(jnp.asarray(w)))
        R_ref = scipy.linalg.expm(_se3_hat(np.concatenate([w, np.zeros(3)]))[:3, :3])
        assert np.allclose(R, R_ref, atol=_tol(scale)), f"scale={scale}"
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-7)


def test_se3_exp_matches_expm(rng):
    for scale in (1e-10, 1e-5, 0.01, 0.5, 2.0):
        t = rng.normal(size=6) * scale
        T = np.asarray(se3_exp(jnp.asarray(t)))
        T_ref = scipy.linalg.expm(_se3_hat(t))
        assert np.allclose(T, T_ref, atol=_tol(scale)), f"scale={scale}"
        assert np.allclose(T[3], [0, 0, 0, 1])


def test_se3_exp_batched(rng):
    tw = rng.normal(size=(7, 6)) * 0.3
    Ts = np.asarray(se3_exp(jnp.asarray(tw)))
    for i in range(7):
        assert np.allclose(Ts[i], np.asarray(se3_exp(jnp.asarray(tw[i]))))


def test_so3_log_roundtrip(rng):
    for scale in (1e-8, 1e-3, 0.5, 2.5):
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * scale
        R = so3_exp(jnp.asarray(w))
        w_back = np.asarray(so3_log(R))
        assert np.allclose(w_back, w, atol=1e-7), f"scale={scale}"


def test_rotation_error_deg():
    w = np.array([0.0, 0.0, np.deg2rad(5.0)])
    Ra = jnp.eye(3)
    Rb = so3_exp(jnp.asarray(w))
    err = float(rotation_error_deg(Ra, Rb))
    assert abs(err - 5.0) < 1e-9


def test_orthonormalize():
    """One Newton sweep restores a near-SO(3) rotation to orthonormal
    within f32 roundoff; exact rotations are fixed points."""
    import jax.numpy as jnp
    from small_gicp_tpu.utils.lie import orthonormalize, so3_exp

    rng = np.random.default_rng(0)
    R = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R + rng.normal(scale=3e-4, size=(3, 3))  # off-manifold
    T[:3, 3] = [1.0, -2.0, 0.5]
    out = np.asarray(orthonormalize(jnp.asarray(T)))
    RtR = out[:3, :3].T @ out[:3, :3]
    assert np.abs(RtR - np.eye(3)).max() < 2e-6
    np.testing.assert_allclose(out[:3, 3], T[:3, 3])  # translation intact
    # fixed point on an exact rotation
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, :3] = R
    out2 = np.asarray(orthonormalize(jnp.asarray(T2)))
    np.testing.assert_allclose(out2, T2, atol=1e-6)
