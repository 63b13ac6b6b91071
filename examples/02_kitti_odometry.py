#!/usr/bin/env python3
"""LiDAR odometry over a scan directory (KITTI .bin or .ply scans) —
TPU-native analog of the reference's src/example/kitti_odometry.py.

Three ways to run the same pipeline:
  * scan-to-scan   : GICP against the previous frame
  * scan-to-model  : GICP against an incremental voxel map (iVox)
  * jit            : the whole scan-to-model loop as one compiled
                     lax.scan program with frames preloaded in HBM —
                     the throughput path.

Usage:
  python examples/02_kitti_odometry.py /data/kitti00/velodyne out.txt \
      --engine jit --num_frames 200
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

from small_gicp_tpu.models.odometry import (
    OdometryParams,
    create_odometry,
    write_trajectory,
)
from small_gicp_tpu.models.odometry_scan import JitOdometry
from small_gicp_tpu.apps.odometry_benchmark import load_scans


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset_path")
    p.add_argument("output_path")
    p.add_argument("--engine", default="jit",
                   choices=["scan_to_scan", "scan_to_model", "jit"])
    p.add_argument("--num_frames", type=int, default=None)
    p.add_argument("--downsampling_resolution", type=float, default=0.25)
    args = p.parse_args()

    # load_scans returns the native prefetching stream; materialize it
    # here since the jit path wants all frames up front for preload().
    scans = [np.asarray(f) for f in load_scans(args.dataset_path,
                                               limit=args.num_frames)]
    print(f"{len(scans)} scans loaded")

    params = OdometryParams(
        downsampling_resolution=args.downsampling_resolution)

    t0 = time.perf_counter()
    if args.engine == "jit":
        odo = JitOdometry(params, engine="gicp_model", covariance_mode="knn")
        frames_dev, counts_dev = odo.preload(scans)
        poses = odo.feed_preloaded(frames_dev, counts_dev, n_real=len(scans))
    else:
        engine = ("small_gicp" if args.engine == "scan_to_scan"
                  else "small_gicp_model")
        odo = create_odometry(engine, params)
        poses = np.stack([np.asarray(T) for T in odo.estimate(scans)])
    dt = time.perf_counter() - t0
    print(f"total={dt:.2f}s  {dt / len(scans) * 1e3:.1f} ms/scan")

    write_trajectory(args.output_path, poses)
    print("trajectory written to", args.output_path,
          "(evo-compatible; score with apps/odometry_accuracy.py)")


if __name__ == "__main__":
    main()
