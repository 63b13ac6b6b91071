"""Per-point factor consistency — ports the reference's python_test.py
factor test (python_test.py:143-166): the sum of per-point (H, b, e)
must reproduce the linearized system the registration reports."""

import numpy as np
import jax.numpy as jnp
import pytest

import small_gicp_tpu as sgt
from small_gicp_tpu.models import factors
from small_gicp_tpu.models.factors import (
    GICPFactor,
    ICPFactor,
    PointToPlaneICPFactor,
    linearize_per_point,
)
from small_gicp_tpu.models.registration import _search_correspondences
from small_gicp_tpu.ops.knn import KdTree


@pytest.fixture(scope="module")
def small_pair(bundled_pair):
    t_raw, s_raw, T_gt = bundled_pair
    target, tree = sgt.preprocess_points(
        t_raw.astype(np.float64), 0.5, num_neighbors=10, max_points=4096
    )
    source, _ = sgt.preprocess_points(
        s_raw.astype(np.float64), 0.5, num_neighbors=10, max_points=4096
    )
    return target, tree, source


@pytest.mark.parametrize("cls", [ICPFactor, PointToPlaneICPFactor, GICPFactor])
def test_per_point_sums_match_registration(small_pair, cls):
    target, tree, source = small_pair
    reg = sgt.Registration(registration_type=cls.factor_type)
    result = reg.align(target, source, tree)
    T = result.T_target_source

    H_i, b_i, e_i, mask = cls().linearize(target, source, tree, T)
    assert H_i.shape == (source.capacity, 6, 6)
    H_sum = np.asarray(jnp.sum(H_i, axis=0))
    H_res = np.asarray(result.H)
    # Reference tolerance: sums within 5% of the registration's H
    # (python_test.py:160-166). result.H comes from the LAST linearization
    # point, which equals T only up to the final (converged, tiny) delta.
    rel = np.abs(H_sum - H_res) / (np.abs(H_res).max() + 1e-12)
    assert rel.max() < 0.05, f"{cls.__name__}: rel dev {rel.max():.4f}"
    # result.num_inliers counts the LAST linearization (pre-update pose);
    # re-searching at the final pose may differ by a few boundary points.
    n_here, n_res = int(jnp.sum(mask)), int(result.num_inliers)
    assert abs(n_here - n_res) <= max(5, 0.01 * n_res)


@pytest.mark.smoke
def test_per_point_matches_total(small_pair):
    target, tree, source = small_pair
    T = jnp.eye(4, dtype=source.points.dtype)
    corr = _search_correspondences(
        "gicp", target, tree, source.points, source.num_points,
        source.covs, T, jnp.asarray(1.0, source.points.dtype),
    )
    H, b, e = factors.linearize(corr, T, source.points)
    H_i, b_i, e_i = linearize_per_point(corr, T, source.points)
    np.testing.assert_allclose(np.asarray(jnp.sum(H_i, 0)), np.asarray(H), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(jnp.sum(b_i, 0)), np.asarray(b), rtol=1e-9)
    np.testing.assert_allclose(float(jnp.sum(e_i)), float(e), rtol=1e-9)


def test_factor_single_index_linearize_matches_batched(small_pair):
    """Reference binding form (factors.cpp:53-103): per-point
    linearize(target, source, tree, T, source_index, rejector) returns
    (success, H 6x6, b 6, e) equal to row i of the batched call."""
    from small_gicp_tpu.models.factors import DistanceRejector

    target, tree, source = small_pair
    T = np.eye(4)
    f = GICPFactor()
    H_i, b_i, e_i, mask = f.linearize(target, source, tree, T)
    rej = DistanceRejector(2.0)
    rej.set_max_distance(1.0)  # parity setter
    for i in (0, 3, 7):
        ok, H, b, e = f.linearize(target, source, tree, T,
                                  source_index=i, rejector=rej)
        assert ok == bool(mask[i])
        np.testing.assert_allclose(np.asarray(H), np.asarray(H_i[i]))
        np.testing.assert_allclose(np.asarray(b), np.asarray(b_i[i]))
        assert np.isclose(e, float(e_i[i]))


def test_factor_single_index_guards(small_pair):
    from small_gicp_tpu.models.factors import GICPFactor

    target, tree, source = small_pair
    f = GICPFactor()
    # legacy positional max_dist_sq must fail loudly, not bind as index
    with pytest.raises(TypeError):
        f.linearize(target, source, tree, np.eye(4), 0.25)
    with pytest.raises(IndexError):
        f.linearize(target, source, tree, np.eye(4),
                    source_index=int(source.num_points))
