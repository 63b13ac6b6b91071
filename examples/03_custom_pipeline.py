#!/usr/bin/env python3
"""Composing the pieces yourself — the TPU-native analog of the
reference's src/example/03_registration_template.cpp, where users plug
custom containers / search structures / factors into the Registration
template. Here the plug points are arrays and function arguments.

Shows:
  * building PointClouds from raw numpy (any source: sensors, torch, ROS)
  * running the searcher layer directly (exact batched kNN)
  * the per-point factor API (per-factor H_i, b_i, e_i like the
    reference's Python factor bindings, src/python/factors.cpp)
  * batched multi-pair registration on a device mesh
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import small_gicp_tpu as sgt
from small_gicp_tpu.models.factors import GICPFactor
from small_gicp_tpu.parallel.sharding import align_batch, make_mesh


def make_pair(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    pts[:, 2] = 0.3 * np.sin(pts[:, 0]) + 0.2 * np.cos(1.3 * pts[:, 1])
    c, s = np.cos(0.02), np.sin(0.02)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    src = pts @ R.T + np.array([0.1, -0.05, 0.02], np.float32)
    return pts, src.astype(np.float32)


def run_knn_layer(target_xyz):
    cloud = sgt.PointCloud.from_points(target_xyz)
    tree = sgt.KdTree.build(cloud)
    d, i = tree.knn_search(target_xyz[:16], k=5)
    print("kNN(5) of first 16 points: dists[0] =", np.asarray(d)[0].round(4))


def run_per_point_factors(target_xyz, source_xyz):
    target, tree = sgt.preprocess_points(target_xyz, 0.5, max_points=1024)
    source, _ = sgt.preprocess_points(source_xyz, 0.5, max_points=1024)
    factor = GICPFactor()
    H_i, b_i, e_i, mask = factor.linearize(
        target, source, tree, jnp.eye(4, dtype=jnp.float32))
    H = np.asarray(jnp.sum(H_i, axis=0))
    print("sum of per-point Hessians, diag:", np.diag(H).round(1),
          " inliers:", int(mask.sum()))


def run_batched_mesh(target_xyz, source_xyz):
    """[B] independent pairs sharded over all visible devices."""
    mesh = make_mesh()  # uses every device jax can see
    B = mesh.devices.size
    target, _ = sgt.preprocess_points(target_xyz, 0.5, max_points=1024)
    source, _ = sgt.preprocess_points(source_xyz, 0.5, max_points=1024)
    stack = lambda c: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)
    init = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    res = align_batch(stack(target), stack(source), init, mesh=mesh)
    print(f"batched align over {B} device(s): errors =",
          np.asarray(res.error).round(3))


if __name__ == "__main__":
    tgt, src = make_pair()
    run_knn_layer(tgt)
    run_per_point_factors(tgt, src)
    run_batched_mesh(tgt, src)
