"""Voxelgrid downsampling benchmark CLI — clone of the reference's
downsampling_benchmark (src/benchmark/downsampling_benchmark.cpp):
measures voxelgrid_sampling throughput across leaf sizes, including the
resolution bisection to hit target point counts
(kdtree_benchmark.cpp:56-87 uses the same trick).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="downsampling_benchmark")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("--num_points", type=int, default=131072)
    p.add_argument("--resolutions", type=float, nargs="+",
                   default=[0.1, 0.25, 0.5, 1.0])
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from small_gicp_tpu.ops.downsampling import voxelgrid_sampling
    from small_gicp_tpu.point_cloud import PointCloud

    if args.input:
        from small_gicp_tpu.native import read_kitti_bin, read_ply_xyz

        pts = (read_kitti_bin(args.input) if args.input.endswith(".bin")
               else read_ply_xyz(args.input))
    else:
        rng = np.random.default_rng(0)
        pts = rng.uniform(-80, 80, size=(args.num_points, 3)).astype(np.float32)

    cloud = PointCloud.from_points(pts)
    print(f"backend={jax.default_backend()} num_points={len(pts)}")
    for res in args.resolutions:
        n_out = int(voxelgrid_sampling(cloud, res).num_points)
        reps = 20

        # In-program repetitions: keeps per-dispatch host round-trips
        # (large on tunneled TPUs) out of the measurement.
        @jax.jit
        def fn(c, r=res):
            def step(carry, _):
                d = voxelgrid_sampling(
                    c.replace(points=c.points + carry), r
                )
                return jnp.float32(1e-30) * d.points.astype(jnp.float32)[0, 0], None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
            return out

        jax.device_get(fn(cloud))  # compile
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            jax.device_get(fn(cloud))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(json.dumps({
            "resolution": res, "points_in": len(pts), "points_out": n_out,
            "msec": round(best * 1e3, 3),
            "points_per_sec": round(len(pts) / best),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
