#!/usr/bin/env python3
"""Basic registration examples (TPU-native analog of the reference's
src/example/basic_registration.py — same user journey, JAX API).

Run: python examples/01_basic_registration.py [target.ply source.ply]
Defaults to the reference's bundled pair if no arguments are given.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import small_gicp_tpu as sgt


def example_one_shot(target_xyz, source_xyz):
    """One call: downsample -> covariances -> GICP with LM."""
    result = sgt.align(
        target_xyz,
        source_xyz,
        downsampling_resolution=0.25,
        max_points=8192,  # static padded capacity (compile-time shape)
    )
    print("--- one-shot GICP ---")
    print("T_target_source:\n", np.asarray(result.T_target_source))
    print("converged:", bool(result.converged),
          "iterations:", int(result.iterations),
          "inliers:", int(result.num_inliers))
    return result


def example_preprocess_then_align(target_xyz, source_xyz):
    """Preprocess once, align many times (the preprocessed clouds and
    the searcher are device-resident pytrees)."""
    target, target_tree = sgt.preprocess_points(
        target_xyz, downsampling_resolution=0.25, num_neighbors=10,
        max_points=8192)
    source, _ = sgt.preprocess_points(
        source_xyz, downsampling_resolution=0.25, num_neighbors=10,
        max_points=8192)

    reg = sgt.Registration(registration_type="gicp")
    result = reg.align(target, source, target_tree)
    print("--- preprocess + align ---")
    print("error:", float(result.error), "iterations:", int(result.iterations))
    return result


def example_vgicp(target_xyz, source_xyz):
    """VGICP: the target is a Gaussian voxel map (one Gaussian per
    voxel); the same GICP factor runs against voxel distributions."""
    target, _ = sgt.preprocess_points(target_xyz, 0.25, max_points=8192)
    source, _ = sgt.preprocess_points(source_xyz, 0.25, max_points=8192)
    voxelmap = sgt.create_gaussian_voxelmap(target, voxel_resolution=1.0)
    result = sgt.Registration("vgicp").align(voxelmap, source)
    print("--- VGICP ---")
    print("T:\n", np.asarray(result.T_target_source).round(4))
    return result


def example_robust_and_dof(target_xyz, source_xyz):
    """Robust kernels and DoF restriction (reference factors/robust_kernel.hpp
    and general_factor.hpp): Cauchy-weighted GICP constrained to planar
    motion (z, roll, pitch frozen)."""
    target, tree = sgt.preprocess_points(target_xyz, 0.25, max_points=8192)
    source, _ = sgt.preprocess_points(source_xyz, 0.25, max_points=8192)
    reg = sgt.Registration(
        registration_type="gicp",
        robust_kernel="cauchy",
        robust_c=1.0,
        # mask = 1 keeps an axis free, 0 freezes it: [rx ry rz tx ty tz]
        dof_rotation_mask=[0.0, 0.0, 1.0],
        dof_translation_mask=[1.0, 1.0, 0.0],
    )
    result = reg.align(target, source, tree)
    print("--- Cauchy + planar DoF ---")
    print("T:\n", np.asarray(result.T_target_source).round(4))
    return result


if __name__ == "__main__":
    if len(sys.argv) >= 3:
        target_xyz = sgt.read_ply(sys.argv[1])
        source_xyz = sgt.read_ply(sys.argv[2])
    else:
        target_xyz = sgt.read_ply("/root/reference/data/target.ply")
        source_xyz = sgt.read_ply("/root/reference/data/source.ply")
    target_xyz = target_xyz.astype(np.float32)
    source_xyz = source_xyz.astype(np.float32)

    example_one_shot(target_xyz, source_xyz)
    example_preprocess_then_align(target_xyz, source_xyz)
    example_vgicp(target_xyz, source_xyz)
    example_robust_and_dof(target_xyz, source_xyz)
