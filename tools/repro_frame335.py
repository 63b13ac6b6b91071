"""Frame-335 fine-voxel undershoot: reproduce + numerics attribution.

BENCHMARK.md (round 4/5): at v=1.0 on the clean 600-frame dump,
gicp_model_fused's trajectory is destroyed by ONE undershooting
alignment (~frame 335: est motion ~0.49 m vs 1.2 m real, ground
sliding); the kernel's correspondences were adversarially verified
EXACT, and the f64 reference rides the same frame out. This script
pins WHERE f32 loses it by replaying the exact failing align from the
exact map state under controlled numeric variants:

  base        the shipping fused f32 path
  f64solve    f32 everything, but the 6x6 Newton solves in f64 on the
              kernel's f64-accumulated H (align_impl solve_dtype)
  recenter    f32 fused, world coordinates recentered to the current
              pose (tests the |coord|*eps32 cancellation hypothesis)
  xla64       full f64 align (XLA path, emulated) — the "reference
              numerics" control

Usage:  python tools/repro_frame335.py /tmp/s600 [--window 325 345]
Writes one line per (frame, variant): est step vs gt step.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="600-frame dump dir (dump_synthetic_kitti)")
    ap.add_argument("--window", nargs=2, type=int, default=(325, 345),
                    help="frame range to single-step with variants")
    ap.add_argument("--xla64-thresh", type=float, default=0.3,
                    help="run the (slow, emulated) f64 control only on "
                         "frames whose base step error exceeds this")
    ap.add_argument("--carry", default=None,
                    help="checkpoint path for the warmed odometry state: "
                         "loaded if it exists, saved after warmup "
                         "otherwise (skips the ~320-frame warmup on "
                         "re-runs)")
    ap.add_argument("--deep", action="store_true",
                    help="at each window frame, additionally probe "
                         "target-table variants (live count, compacted "
                         "target through the FUSED path, compacted "
                         "f32 XLA) to separate content from path")
    args = ap.parse_args(argv)
    lo, hi = args.window

    import jax
    import jax.numpy as jnp

    from small_gicp_tpu.models.odometry import OdometryParams
    from small_gicp_tpu.models import odometry_scan as osc
    from small_gicp_tpu.models.odometry_scan import JitOdometry
    from small_gicp_tpu.models.registration import align_impl
    from small_gicp_tpu.models.voxelmap import ivm_as_cloud
    from small_gicp_tpu.point_cloud import PointCloud
    from small_gicp_tpu.utils.io import list_kitti_scans, read_kitti_bin
    from small_gicp_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    # Ground-truth step sizes.
    gt = np.loadtxt(f"{args.dataset}/gt.txt").reshape(-1, 3, 4)
    gt_t = gt[:, :, 3]

    # Identical config to the published v=1.0 row (odometry_benchmark
    # CLI defaults + --voxel_resolution 1.0, clamp off).
    params = OdometryParams(
        downsampling_resolution=0.25, voxel_resolution=1.0,
        max_scan_points=131072, max_downsampled=32768,
        map_capacity=131072, num_offsets=1,
    )
    odom = JitOdometry(params, engine="gicp_model_fused", chunk_frames=16)

    paths = list_kitti_scans(args.dataset)[: hi + 1]
    frames = [read_kitti_bin(p) for p in paths]
    n_warm = (lo // 16) * 16  # whole chunks up to the window

    poses = []
    if args.carry and os.path.exists(args.carry):
        from small_gicp_tpu.utils.checkpoint import load_pytree

        odom.carry = load_pytree(args.carry, odom.carry)
        print(f"loaded warmed state from {args.carry}", file=sys.stderr)
    else:
        stacked, counts = odom._stack_frames(frames[:n_warm], n_warm)
        stacked = jnp.asarray(stacked)
        counts = jnp.asarray(counts)
        for c in range(n_warm // 16):
            p = odom._run_chunk(stacked[c * 16:(c + 1) * 16],
                                counts[c * 16:(c + 1) * 16])
            poses.append(np.asarray(p))
            print(f"warmed frames 0..{(c + 1) * 16 - 1}", file=sys.stderr)
        poses = list(np.concatenate(poses)) if poses else []
        if args.carry:
            from small_gicp_tpu.utils.checkpoint import save_pytree

            save_pytree(args.carry, odom.carry)
            print(f"saved warmed state to {args.carry}", file=sys.stderr)

    def prep_cloud(i):
        """The step's own preprocessing (covariance_mode='knn')."""
        f, c = odom._stack_frames(frames[i:i + 1], 1)
        pts, n = osc._voxelgrid_sampling_impl(
            jnp.asarray(f[0]), jnp.asarray(c[0]),
            jnp.asarray(params.downsampling_resolution, jnp.float32),
            params.max_downsampled,
        )
        _, covs = osc._estimate_impl(
            pts, n, params.num_neighbors, False, True,
            neighbor_mode="exact",
            window_cell=params.downsampling_resolution,
        )
        return PointCloud(points=pts, num_points=n, covs=covs), f, c

    def step_err(T_world, T_res, i):
        est = float(np.linalg.norm(
            np.asarray(T_res)[:3, 3] - np.asarray(T_world)[:3, 3]))
        real = float(np.linalg.norm(gt_t[i] - gt_t[i - 1]))
        return est, real

    def cast64(cl: PointCloud) -> PointCloud:
        return PointCloud(
            points=cl.points.astype(jnp.float64),
            num_points=cl.num_points,
            covs=None if cl.covs is None else cl.covs.astype(jnp.float64),
        )

    ALIGN_KW = dict(registration_type="gicp", max_dist_sq=1.0)

    for i in range(n_warm, hi + 1):
        T_world, T_delta, vm, is_first = odom.carry
        in_window = i >= lo
        if in_window:
            cloud, f, c = prep_cloud(i)
            target = ivm_as_cloud(vm)
            guess = T_world

            def report(name, r, T_res):
                e_est, real = step_err(T_world, T_res, i)
                print(f"frame={i} variant={name} est_step={e_est:.4f} "
                      f"gt_step={real:.4f} iters={int(r.iterations)} "
                      f"converged={bool(r.converged)} "
                      f"inliers={int(r.num_inliers)} "
                      f"error={float(r.error):.4f}", flush=True)
                return e_est, real

            res = align_impl(target, cloud, None, guess, **ALIGN_KW)
            est, real = report("base", res, res.T_target_source)

            res64s = align_impl(target, cloud, None, guess,
                                solve_dtype="float64", **ALIGN_KW)
            report("f64solve", res64s, res64s.T_target_source)

            cshift = jnp.concatenate(
                [T_world[:3, 3], jnp.zeros((1,), jnp.float32)])
            tr = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(-T_world[:3, 3])
            t_rc = PointCloud(points=target.points - cshift,
                              num_points=target.num_points, covs=target.covs)
            res_rc = align_impl(t_rc, cloud, None, tr @ guess, **ALIGN_KW)
            T_rc = jnp.linalg.inv(tr) @ res_rc.T_target_source
            report("recenter", res_rc, T_rc)

            if args.deep:
                from small_gicp_tpu.point_cloud import compact_cloud

                live = int(np.asarray(target.num_points))
                print(f"frame={i} live_rows={live} "
                      f"capacity={target.points.shape[0]}", flush=True)
                # Knife-edge test: a 1 mm guess perturbation through the
                # IDENTICAL fused program. If the basin flips, the frame
                # is a bimodal landscape at the seed's basin edge and
                # sub-ulp arithmetic details pick the minimum — not a
                # numerics defect in any one path.
                for dz in (1e-3, -1e-3, 1e-2):
                    g2 = guess.at[2, 3].add(jnp.float32(dz))
                    r_j = align_impl(target, cloud, None, g2, **ALIGN_KW)
                    report(f"jitter_z{dz:+g}", r_j, r_j.T_target_source)
                # Compacted target through the FUSED path: same content
                # as compact32/xla64 (if live <= budget), same code
                # path as base — separates content from path.
                t_small = compact_cloud(target, 49152)
                res_cf = align_impl(t_small, cloud, None, guess,
                                    **ALIGN_KW)
                report("compact_fused", res_cf, res_cf.T_target_source)

            if abs(est - real) > args.xla64_thresh:
                # f64 control: the full-capacity brute-force distance
                # matrix would be ~21 GB, so compact the slot table to
                # its live rows first (dead slots carry sentinel coords
                # and can never win the NN anyway); the compact32
                # control shows compaction itself is behavior-neutral.
                from small_gicp_tpu.point_cloud import compact_cloud

                t_small = compact_cloud(target, 49152)
                res_c32 = align_impl(t_small, cloud, None, guess,
                                     use_fused="never", **ALIGN_KW)
                report("compact32", res_c32, res_c32.T_target_source)
                res64 = align_impl(
                    cast64(t_small), cast64(cloud), None,
                    guess.astype(jnp.float64), use_fused="never",
                    **ALIGN_KW)
                report("xla64", res64, res64.T_target_source)

        # Advance the real engine by one frame regardless.
        f1, c1 = odom._stack_frames(frames[i:i + 1], 1)
        p = odom._run_chunk(jnp.asarray(f1), jnp.asarray(c1))
        poses.append(np.asarray(p)[0])

    return 0


if __name__ == "__main__":
    sys.exit(main())
