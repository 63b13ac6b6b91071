"""Jacobi 3x3 eigensolver vs numpy.linalg.eigh."""

import numpy as np
import jax.numpy as jnp

from small_gicp_tpu.ops.eigh3 import eigh3x3, inv3x3, solve6x6


def _random_sym(rng, n, scale=1.0):
    A = rng.normal(size=(n, 3, 3)) * scale
    return 0.5 * (A + np.swapaxes(A, 1, 2))


def test_eigh3x3_random(rng):
    A = _random_sym(rng, 500)
    vals, vecs = eigh3x3(jnp.asarray(A))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref_vals, _ = np.linalg.eigh(A)
    assert np.allclose(vals, ref_vals, atol=1e-10)
    # Ascending order + eigen equation + orthonormality.
    assert np.all(np.diff(vals, axis=1) >= -1e-12)
    recon = np.einsum("nij,nj,nkj->nik", vecs, vals, vecs)
    assert np.allclose(recon, A, atol=1e-10)
    eye = np.einsum("nij,nik->njk", vecs, vecs)
    assert np.allclose(eye, np.eye(3), atol=1e-12)


def test_eigh3x3_degenerate():
    cases = np.stack(
        [
            np.eye(3),  # fully degenerate
            np.diag([1.0, 1.0, 2.0]),  # repeated pair
            np.diag([0.0, 0.0, 0.0]),  # zero
            np.diag([1e-12, 1.0, 1e12]),  # extreme spread
            np.full((3, 3), 1.0),  # rank one
        ]
    )
    vals, vecs = eigh3x3(jnp.asarray(cases))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref_vals, _ = np.linalg.eigh(cases)
    assert np.allclose(vals, ref_vals, atol=1e-9, rtol=1e-9)
    recon = np.einsum("nij,nj,nkj->nik", vecs, vals, vecs)
    assert np.allclose(recon, cases, atol=1e-6)


def test_eigh3x3_planar_covariances(rng):
    # The actual use case: covariance of nearly-planar neighborhoods.
    n = 200
    pts = rng.normal(size=(n, 50, 3))
    pts[..., 2] *= 1e-4  # squash to a plane
    covs = np.einsum("nkd,nke->nde", pts, pts) / 50
    vals, vecs = eigh3x3(jnp.asarray(covs))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref_vals, _ = np.linalg.eigh(covs)
    assert np.allclose(vals, ref_vals, atol=1e-10)
    # Smallest-eigvec should be ±z.
    assert np.all(np.abs(np.abs(vecs[:, 2, 0]) - 1.0) < 1e-4)


def test_inv3x3(rng):
    A = _random_sym(rng, 100) + 3.0 * np.eye(3)
    Ainv = np.asarray(inv3x3(jnp.asarray(A)))
    assert np.allclose(np.einsum("nij,njk->nik", A, Ainv), np.eye(3), atol=1e-9)


def test_solve6x6(rng):
    M = rng.normal(size=(6, 6))
    H = M @ M.T + np.eye(6)
    b = rng.normal(size=6)
    x = np.asarray(solve6x6(jnp.asarray(H), jnp.asarray(b), jnp.asarray(1e-6)))
    ref = np.linalg.solve(H + 1e-6 * np.eye(6), b)
    assert np.allclose(x, ref, atol=1e-9)
