"""Dump the synthetic LiDAR world to KITTI-format files on disk.

Closes the real-data loop (no KITTI data ships on this machine): the
jitted raycaster's frames are written as `NNNNNN.bin` float32
x,y,z,intensity scans plus a `gt.txt` KITTI 3x4-row ground-truth
trajectory — exactly the on-disk layout the reference's KittiDataset
consumes (benchmark/benchmark.hpp:96-144, read_points.hpp:15-46). The
file-driven pipeline is then exercised end-to-end with the same two
commands the reference runs on KITTI 00
(src/benchmark/odometry_benchmark.cpp:6-94 + scripts/
plot_odometry_accuracy.py:25-36):

    python -m small_gicp_tpu.apps.dump_synthetic_kitti /tmp/synth --frames 300
    python -m small_gicp_tpu.apps.odometry_benchmark /tmp/synth /tmp/out.txt \
        --engine small_gicp_model
    python -m small_gicp_tpu.apps.odometry_accuracy /tmp/synth/gt.txt /tmp/out.txt
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="dump_synthetic_kitti")
    p.add_argument("out_dir", help="output directory for *.bin + gt.txt")
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--radius", type=float, default=80.0)
    p.add_argument("--frame-dist", type=float, default=1.2)
    p.add_argument("--noise", type=float, default=0.012,
                   help="Gaussian range-noise sigma in meters")
    p.add_argument("--dropout", type=float, default=0.0,
                   help="per-ray no-return probability")
    p.add_argument("--dynamic", type=int, default=0,
                   help="number of moving cylinder objects in the scene")
    args = p.parse_args(argv)

    import numpy as np

    from small_gicp_tpu.models.odometry import write_trajectory
    from small_gicp_tpu.utils.io import write_kitti_bin
    from small_gicp_tpu.utils.synthetic import generate_sequence_device

    os.makedirs(args.out_dir, exist_ok=True)
    frames_dev, counts, gt = generate_sequence_device(
        n_frames=args.frames, seed=args.seed, radius=args.radius,
        frame_dist=args.frame_dist, noise=args.noise,
        dropout=args.dropout, n_dynamic=args.dynamic,
    )
    frames = np.asarray(frames_dev)
    counts = np.asarray(counts)
    for i in range(args.frames):
        write_kitti_bin(
            os.path.join(args.out_dir, f"{i:06d}.bin"),
            frames[i, : counts[i], :3],
        )
    # Ground truth relative to the first frame, matching the estimated
    # trajectory's convention (T_world starts at identity).
    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    write_trajectory(os.path.join(args.out_dir, "gt.txt"), gt_rel)
    print(
        f"wrote {args.frames} scans ({counts.sum()} points) + gt.txt to "
        f"{args.out_dir}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
