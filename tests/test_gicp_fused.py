"""Parity of the fused GICP linearize kernel vs the XLA reference path
(interpreter mode; the compiled kernel is covered by the tpu lane)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.models import factors
from small_gicp_tpu.models.registration import _search_correspondences
from small_gicp_tpu.ops.gicp_fused_pallas import gicp_linearize_pallas
from small_gicp_tpu.utils.lie import se3_exp


def _pair(rng, n=700, m=900):
    tp = rng.uniform(-8, 8, size=(m, 3)).astype(np.float32)
    tp[:, 2] = np.sin(tp[:, 0]) * 0.5 + 0.05 * rng.normal(size=m)
    sp = tp[rng.permutation(m)[:n]] + rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
    def covs(k):
        a = rng.normal(size=(k, 3, 3)).astype(np.float32) * 0.05
        return np.einsum("nij,nkj->nik", a, a) + np.eye(3, dtype=np.float32) * 0.01
    target = PointCloud.from_points(tp).replace(covs=jnp.asarray(covs(m)))
    source = PointCloud.from_points(sp).replace(covs=jnp.asarray(covs(n)))
    return target, source


@pytest.mark.smoke
def test_fused_matches_xla_linearize(rng):
    target, source = _pair(rng)
    T = se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.1, 0.08], jnp.float32))
    max_d2 = jnp.asarray(1.0, jnp.float32)

    corr = _search_correspondences(
        "gicp", target, None, source.points, source.num_points,
        source.covs, T, max_d2,
    )
    H_ref, b_ref, e_ref = factors.linearize(corr, T, source.points)

    H, b, mu, W, mask, sq, corr16, sorted_src = gicp_linearize_pallas(
        target.points, target.covs, source.points, source.covs,
        T, source.num_points, max_d2, interpret=True,
    )
    assert np.array_equal(np.asarray(mask), np.asarray(corr.mask))
    np.testing.assert_allclose(np.asarray(mu)[np.asarray(mask)],
                               np.asarray(corr.target_mu)[np.asarray(mask)],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(W)[np.asarray(mask)],
                               np.asarray(corr.W)[np.asarray(mask)],
                               rtol=2e-3, atol=2e-3)
    scale = max(1.0, float(np.abs(np.asarray(H_ref)).max()))
    np.testing.assert_allclose(np.asarray(H) / scale,
                               np.asarray(H_ref) / scale, atol=5e-4)
    bscale = max(1.0, float(np.abs(np.asarray(b_ref)).max()))
    np.testing.assert_allclose(np.asarray(b) / bscale,
                               np.asarray(b_ref) / bscale, atol=5e-4)
    # frozen-correspondence error through the shared err_multi path
    e_multi = factors.error_multi(
        factors.Correspondences(target_mu=mu, W=W, mask=mask,
                                target_idx=jnp.zeros_like(mask, jnp.int32)),
        T[None], source.points,
    )[0]
    np.testing.assert_allclose(float(e_multi), float(e_ref), rtol=1e-4)


def test_fused_handles_padding_and_empty(rng):
    target, source = _pair(rng, n=200, m=300)
    # mark most source rows invalid
    source = source.replace(num_points=jnp.asarray(37, jnp.int32))
    T = jnp.eye(4, dtype=jnp.float32)
    H, b, mu, W, mask, sq, corr16, sorted_src = gicp_linearize_pallas(
        target.points, target.covs, source.points, source.covs,
        T, source.num_points, jnp.asarray(1.0, jnp.float32), interpret=True,
    )
    assert int(np.asarray(mask)[37:].sum()) == 0
    assert np.isfinite(np.asarray(H)).all() and np.isfinite(np.asarray(b)).all()

    # fully empty source: zero system
    H, b, mu, W, mask, sq, corr16, sorted_src = gicp_linearize_pallas(
        target.points, target.covs, source.points, source.covs,
        T, jnp.asarray(0, jnp.int32), jnp.asarray(1.0, jnp.float32),
        interpret=True,
    )
    assert not bool(np.asarray(mask).any())
    assert np.allclose(np.asarray(H), 0.0) and np.allclose(np.asarray(b), 0.0)


def test_trials_kernel_matches_error_multi(rng):
    from small_gicp_tpu.ops.gicp_fused_pallas import gicp_error_multi_pallas

    target, source = _pair(rng)
    T = se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.1, 0.08], jnp.float32))
    H, b, mu, W, mask, sq, corr16, sorted_src = gicp_linearize_pallas(
        target.points, target.covs, source.points, source.covs,
        T, source.num_points, jnp.asarray(1.0, jnp.float32), interpret=True,
    )
    corr = factors.Correspondences(
        target_mu=mu, W=W, mask=mask,
        target_idx=jnp.zeros(mask.shape, jnp.int32),
    )
    Ts = jnp.stack([
        T,
        se3_exp(jnp.asarray([0.01, 0.0, -0.02, 0.02, 0.03, -0.05], jnp.float32)),
        jnp.eye(4, dtype=jnp.float32),
    ])
    ref = factors.error_multi(corr, Ts, source.points)
    got = gicp_error_multi_pallas(
        corr16, sorted_src, Ts, source.num_points, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)


@pytest.mark.parametrize("factor", ["plane_icp", "icp"])
def test_fused_other_factors_match_xla(rng, factor):
    """The fused kernel's plane-ICP (W = diag(n∘n),
    plane_icp_factor.hpp:43-54) and point-to-point ICP (W = I,
    icp_factor.hpp:34-53) variants match the XLA correspondence +
    linearize path."""
    target, source = _pair(rng)
    if factor == "plane_icp":
        nrm = rng.normal(size=(len(np.asarray(target.points)), 3))
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        n4 = np.zeros((nrm.shape[0], 4), np.float32)
        n4[:, :3] = nrm
        target = target.replace(normals=jnp.asarray(n4))
    T = se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.1, 0.08], jnp.float32))
    max_d2 = jnp.asarray(1.0, jnp.float32)

    corr = _search_correspondences(
        factor, target, None, source.points, source.num_points,
        None, T, max_d2,
    )
    H_ref, b_ref, e_ref = factors.linearize(corr, T, source.points)

    H, b, mu, W, mask, sq, corr16, sorted_src = gicp_linearize_pallas(
        target.points, None, source.points, None,
        T, source.num_points, max_d2, interpret=True, factor=factor,
        target_normals=target.normals,
    )
    assert np.array_equal(np.asarray(mask), np.asarray(corr.mask))
    np.testing.assert_allclose(np.asarray(W)[np.asarray(mask)],
                               np.asarray(corr.W)[np.asarray(mask)],
                               rtol=2e-3, atol=2e-3)
    scale = max(1.0, float(np.abs(np.asarray(H_ref)).max()))
    np.testing.assert_allclose(np.asarray(H) / scale,
                               np.asarray(H_ref) / scale, atol=5e-4)
    bscale = max(1.0, float(np.abs(np.asarray(b_ref)).max()))
    np.testing.assert_allclose(np.asarray(b) / bscale,
                               np.asarray(b_ref) / bscale, atol=5e-4)
    # frozen-correspondence trial errors flow through the same generic
    # W rows of corr16 — pin them against factors.error_multi too.
    from small_gicp_tpu.ops.gicp_fused_pallas import gicp_error_multi_pallas

    Ts = jnp.stack([T, se3_exp(jnp.asarray(
        [0.01, 0.0, -0.02, 0.1, 0.0, -0.05], jnp.float32)) @ T])
    errs = gicp_error_multi_pallas(
        corr16, sorted_src, Ts, source.num_points, interpret=True
    )
    e_multi = factors.error_multi(
        factors.Correspondences(target_mu=mu, W=W, mask=mask,
                                target_idx=jnp.zeros_like(mask, jnp.int32)),
        Ts, source.points,
    )
    np.testing.assert_allclose(np.asarray(errs), np.asarray(e_multi),
                               rtol=1e-4)


@pytest.mark.parametrize("robust,c", [("huber", 0.5), ("cauchy", 0.3)])
def test_fused_robust_matches_xla(rng, robust, c):
    """Fused Huber/Cauchy (VERDICT r4 #1): the robust weight applied at
    the kernel's finalize matches factors.linearize(robust_kernel=...)
    — RobustFactor::linearize semantics (robust_kernel.hpp:80-91) — and
    the trial-error kernel recomputes w(√e) per pose like
    RobustFactor::error (robust_kernel.hpp:95-97)."""
    from small_gicp_tpu.ops.gicp_fused_pallas import gicp_error_multi_pallas

    target, source = _pair(rng)
    T = se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.1, 0.08], jnp.float32))
    max_d2 = jnp.asarray(1.0, jnp.float32)

    corr = _search_correspondences(
        "gicp", target, None, source.points, source.num_points,
        source.covs, T, max_d2,
    )
    H_ref, b_ref, e_ref = factors.linearize(
        corr, T, source.points, robust_kernel=robust, robust_c=c
    )

    H, b, mu, W, mask, sq, corr16, sorted_src = gicp_linearize_pallas(
        target.points, target.covs, source.points, source.covs,
        T, source.num_points, max_d2, interpret=True,
        robust=robust, robust_c=c,
    )
    assert np.array_equal(np.asarray(mask), np.asarray(corr.mask))
    scale = max(1.0, float(np.abs(np.asarray(H_ref)).max()))
    np.testing.assert_allclose(np.asarray(H) / scale,
                               np.asarray(H_ref) / scale, atol=5e-4)
    bscale = max(1.0, float(np.abs(np.asarray(b_ref)).max()))
    np.testing.assert_allclose(np.asarray(b) / bscale,
                               np.asarray(b_ref) / bscale, atol=5e-4)
    # the robust H must differ from the plain H (the weight is real)
    H_plain, *_ = gicp_linearize_pallas(
        target.points, target.covs, source.points, source.covs,
        T, source.num_points, max_d2, interpret=True,
    )
    assert not np.allclose(np.asarray(H), np.asarray(H_plain), rtol=1e-3)

    # trial errors: recomputed per pose, matching factors.error_multi
    Ts = jnp.stack([
        T,
        se3_exp(jnp.asarray([0.01, 0.0, -0.02, 0.02, 0.03, -0.05],
                            jnp.float32)) @ T,
        jnp.eye(4, dtype=jnp.float32),
    ])
    ref = factors.error_multi(
        factors.Correspondences(
            target_mu=mu, W=W, mask=mask,
            target_idx=jnp.zeros(mask.shape, jnp.int32),
        ),
        Ts, source.points, robust_kernel=robust, robust_c=c,
    )
    got = gicp_error_multi_pallas(
        corr16, sorted_src, Ts, source.num_points, interpret=True,
        robust=robust, robust_c=c,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4)


def test_mxu_dist_variant_matches_vpu_form(rng):
    """The MXU-distance experimental flag (round-5 roofline, documented
    negative result in BENCHMARK.md) must stay correct: identical masks
    and near-identical H/b/corr vs the default VPU difference form."""
    from small_gicp_tpu.ops.gicp_fused_pallas import (
        gicp_linearize_tables,
        gicp_prepare,
    )

    target, source = _pair(rng)
    T = se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.1, 0.08], jnp.float32))
    ttab, tb, qtab, _ssrc, _sp, ttabT = gicp_prepare(
        target.points, target.covs, source.points, source.covs,
        source.num_points,
    )
    outs = {}
    for mx in (False, True):
        H, b, inl, corr = gicp_linearize_tables(
            ttab, tb, qtab, T, jnp.float32(1.0), ttabT,
            interpret=True, mxu_dist=mx,
        )
        outs[mx] = (np.asarray(H), np.asarray(b), float(inl), np.asarray(corr))
    H0, b0, i0, c0 = outs[False]
    H1, b1, i1, c1 = outs[True]
    assert i0 == i1
    m0, m1 = c0[12] > 0.5, c1[12] > 0.5
    # near-exact: ties at the score-rounding level may flip membership
    assert (m0 != m1).mean() < 0.01
    scale = max(1.0, np.abs(H0).max())
    np.testing.assert_allclose(H1 / scale, H0 / scale, atol=5e-4)
    both = m0 & m1
    np.testing.assert_allclose(c1[13][both], c0[13][both], atol=1e-4)


@pytest.mark.parametrize("factor", ["plane_icp", "icp"])
def test_fused_robust_composes_with_other_factors(rng, factor):
    """Robust weighting composes with the plane-ICP / ICP fused factors
    exactly as with GICP (the weighted-LS form is shared)."""
    target, source = _pair(rng)
    if factor == "plane_icp":
        nrm = rng.normal(size=(len(np.asarray(target.points)), 3))
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        n4 = np.zeros((nrm.shape[0], 4), np.float32)
        n4[:, :3] = nrm
        target = target.replace(normals=jnp.asarray(n4))
    T = se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.1, 0.08], jnp.float32))
    max_d2 = jnp.asarray(1.0, jnp.float32)
    corr = _search_correspondences(
        factor, target, None, source.points, source.num_points,
        None, T, max_d2,
    )
    H_ref, b_ref, _ = factors.linearize(
        corr, T, source.points, robust_kernel="huber", robust_c=0.4
    )
    H, b, mu, W, mask, sq, corr16, sorted_src = gicp_linearize_pallas(
        target.points, None, source.points, None,
        T, source.num_points, max_d2, interpret=True, factor=factor,
        target_normals=target.normals, robust="huber", robust_c=0.4,
    )
    assert np.array_equal(np.asarray(mask), np.asarray(corr.mask))
    scale = max(1.0, float(np.abs(np.asarray(H_ref)).max()))
    np.testing.assert_allclose(np.asarray(H) / scale,
                               np.asarray(H_ref) / scale, atol=5e-4)
