"""KNN search-structure benchmark CLI — clone of the reference's
kdtree_benchmark (src/benchmark/kdtree_benchmark.cpp:56-160): loads one
scan (or generates one), measures search-structure construction and
batched kNN query throughput across point-count scales.

On TPU the "construction" of the brute-force searcher is free (the
cloud IS the structure), so the interesting numbers are query
throughput (points/sec) at k=1 and k=20 — the two shapes the GICP
pipeline uses.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kdtree_benchmark")
    p.add_argument("input", nargs="?", default=None,
                   help="scan file (.ply/.bin); synthetic cloud if omitted")
    p.add_argument("--num_points", type=int, default=65536)
    p.add_argument("--ks", type=int, nargs="+", default=[1, 10, 20])
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[4096, 8192, 16384, 32768])
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from small_gicp_tpu.ops.knn import KdTree
    from small_gicp_tpu.point_cloud import PointCloud

    if args.input:
        from small_gicp_tpu.native import read_kitti_bin, read_ply_xyz

        pts = (read_kitti_bin(args.input) if args.input.endswith(".bin")
               else read_ply_xyz(args.input))
    else:
        rng = np.random.default_rng(0)
        pts = rng.uniform(-80, 80, size=(args.num_points, 3)).astype(np.float32)

    print(f"backend={jax.default_backend()} num_points={len(pts)}")
    for n in args.sizes:
        sub = pts[np.random.default_rng(1).choice(len(pts), min(n, len(pts)),
                                                  replace=False)]
        cloud = PointCloud.from_points(sub, capacity=n)
        tree = KdTree.build(cloud)
        q = jnp.asarray(sub, jnp.float32)
        for k in args.ks:
            reps = 20

            # Repetitions run inside one program (lax.scan) so the
            # number isn't swamped by per-dispatch host round-trips
            # (significant on tunneled TPU setups).
            @jax.jit
            def fn(q, k=k):
                def step(carry, _):
                    if k == 1:
                        d, _i = tree.nearest_neighbor_search(q + carry)
                    else:
                        d, _i = tree.knn_search(q + carry, k)
                    return jnp.float32(1e-30) * d.astype(jnp.float32).ravel()[0], None

                out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
                return out

            jax.device_get(fn(q))  # compile
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                jax.device_get(fn(q))
                best = min(best, (time.perf_counter() - t0) / reps)
            print(json.dumps({
                "n": n, "k": k, "msec": round(best * 1e3, 3),
                "queries_per_sec": round(len(sub) / best),
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
