"""Jacobi 3x3 eigensolver vs numpy.linalg.eigh."""

import numpy as np
import jax.numpy as jnp

from small_gicp_tpu.ops.eigh3 import eigh3x3, inv3x3, solve6x6
import pytest

pytestmark = pytest.mark.smoke


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


def test_smallest_eigvec3x3_random(rng):
    from small_gicp_tpu.ops.eigh3 import smallest_eigvec3x3

    A = _random_sym(rng, 500)
    v0 = np.asarray(smallest_eigvec3x3(jnp.asarray(A)))
    ref_vals, ref_vecs = np.linalg.eigh(A)
    # Unit norm + matches numpy's smallest eigenvector up to sign.
    assert np.allclose(np.linalg.norm(v0, axis=-1), 1.0, atol=1e-12)
    dots = np.abs(np.einsum("ni,ni->n", v0, ref_vecs[:, :, 0]))
    assert np.all(dots > 1.0 - 1e-8), dots.min()


def test_smallest_eigvec3x3_f32_planar(rng):
    """f32 closed-form solver on the actual workload: covariances of
    near-planar neighborhoods. The regularized covariance
    I − (1−1e-3)·v₀v₀ᵀ must match the Jacobi-built V·diag(1e-3,1,1)·Vᵀ."""
    from small_gicp_tpu.ops.eigh3 import smallest_eigvec3x3

    n = 300
    pts = rng.normal(size=(n, 50, 3))
    pts[..., 2] *= 1e-3
    # random rotations so the plane normal isn't axis-aligned
    q = rng.normal(size=(n, 3, 3))
    R = np.linalg.qr(q)[0]
    pts = np.einsum("nij,nkj->nki", R, pts)
    covs = (np.einsum("nkd,nke->nde", pts, pts) / 50).astype(np.float32)

    v0 = np.asarray(smallest_eigvec3x3(jnp.asarray(covs)))
    vals_j, vecs_j = eigh3x3(jnp.asarray(covs))
    vecs_j = np.asarray(vecs_j)
    dots = np.abs(np.einsum("ni,ni->n", v0, vecs_j[:, :, 0]))
    assert np.all(dots > 1.0 - 1e-5), dots.min()

    reg_closed = np.eye(3, dtype=np.float32) - (1 - 1e-3) * np.einsum(
        "ni,nj->nij", v0, v0
    )
    reg_jacobi = np.einsum(
        "nij,j,nkj->nik", vecs_j, np.array([1e-3, 1, 1], np.float32), vecs_j
    )
    assert np.allclose(reg_closed, reg_jacobi, atol=2e-5)


def test_smallest_eigvec3x3_degenerate():
    from small_gicp_tpu.ops.eigh3 import smallest_eigvec3x3

    cases = np.stack(
        [
            np.eye(3),  # isotropic: arbitrary vector, must be unit
            np.diag([1.0, 1.0, 2.0]),  # smallest pair repeated
            np.zeros((3, 3)),  # zero matrix
            np.diag([1e-12, 1.0, 1e12]),  # extreme spread
            np.full((3, 3), 1.0),  # rank one: kernel is a 2-plane
            np.diag([2.0, 1.0, 1.0]),  # largest... smallest pair repeated
        ]
    )
    v0 = np.asarray(smallest_eigvec3x3(jnp.asarray(cases)))
    assert np.allclose(np.linalg.norm(v0, axis=-1), 1.0, atol=1e-9)
    # Where the smallest eigenvalue is simple, the vector must match.
    ref_vals, ref_vecs = np.linalg.eigh(cases)
    simple = (ref_vals[:, 1] - ref_vals[:, 0]) > 1e-6 * np.maximum(
        np.abs(ref_vals[:, 2]), 1.0
    )
    dots = np.abs(np.einsum("ni,ni->n", v0, ref_vecs[:, :, 0]))
    assert np.all(dots[simple] > 1.0 - 1e-6), (simple, dots)
    # Where it is degenerate, the vector must at least lie in the
    # smallest-eigenvalue eigenspace (orthogonal to well-separated
    # larger eigenvectors).
    assert abs(v0[1] @ ref_vecs[1][:, 2]) < 1e-6  # diag(1,1,2): ⊥ e_z
    assert abs(v0[5] @ ref_vecs[5][:, 2]) < 1e-6  # diag(2,1,1): ⊥ e_x


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
