"""Multi-device scaling measurement on the virtual CPU mesh.

No multi-chip TPU hardware exists on this machine, so the ≥80% scaling
target (BASELINE.md) cannot be measured for real — but the *overhead*
side of the claim can: on an N-virtual-device CPU mesh
(`--xla_force_host_platform_device_count`), all shards execute
sequentially on the same core, so with FIXED total work the ideal
sharded wall time equals the unsharded one and every measured increase
is partition + collective overhead. This app records that curve for the
three parallel modes (batch/dp, point/sp, sharded-map) against mesh
sizes 1..N — the simulated evidence VERDICT r2 asked for (next-round
#5), complementing the bytes-per-collective model in
parallel/multihost.py.

Usage:
  JAX_PLATFORMS=cpu python -m small_gicp_tpu.apps.scaling_benchmark \
      --devices 8 --points 8192
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="scaling_benchmark")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--points", type=int, default=8192,
                    help="total source points (fixed across mesh sizes)")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from __graft_entry__ import _make_pair
    from small_gicp_tpu.models.registration import align_impl
    from small_gicp_tpu.models.voxelmap import GaussianVoxelMap
    from small_gicp_tpu.parallel.map_sharding import sharded_model_align
    from small_gicp_tpu.parallel.sharding import (
        align_batch,
        align_point_sharded,
        make_mesh,
    )

    n_total = args.points
    meshes = [1]
    while meshes[-1] * 2 <= args.devices:
        meshes.append(meshes[-1] * 2)

    def timeit(f):
        f()
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    results = {}

    # --- batch/dp: args.devices pairs of n_total/devices points each,
    # lane axis sharded over 1..N devices (fixed total work).
    b = args.devices
    targets, sources = _make_pair(n_total // b, b=b)
    init_Ts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    curve = {}
    for nd in meshes:
        mesh = make_mesh(nd)
        curve[nd] = round(timeit(lambda: jax.block_until_ready(
            align_batch(targets, sources, init_Ts, mesh=mesh,
                        registration_type="gicp").T_target_source
        )), 2)
    results["batch_dp"] = curve

    # --- point/sp: ONE registration of n_total points, source axis
    # sharded; the (H,b,e) psum is the only collective (43 floats).
    target, source = _make_pair(n_total)
    curve = {1: round(timeit(lambda: jax.block_until_ready(
        align_impl(target, source, None, jnp.eye(4, dtype=jnp.float32),
                   registration_type="gicp",
                   use_fused="never").T_target_source
    )), 2)}
    for nd in meshes[1:]:
        mesh = make_mesh(nd)
        curve[nd] = round(timeit(lambda: jax.block_until_ready(
            align_point_sharded(target, source,
                                jnp.eye(4, dtype=jnp.float32), mesh,
                                registration_type="gicp").T_target_source
        )), 2)
    results["point_sp"] = curve

    # --- sharded map: registration against a mesh-distributed voxel map
    # (two pmins + one psum per iteration).
    vm = GaussianVoxelMap.build(target, 1.0, capacity=512 * args.devices)
    curve = {1: round(timeit(lambda: jax.block_until_ready(
        align_impl(vm, source, None, jnp.eye(4, dtype=jnp.float32),
                   registration_type="gicp").T_target_source
    )), 2)}
    for nd in meshes[1:]:
        mesh = make_mesh(nd)
        curve[nd] = round(timeit(lambda: jax.block_until_ready(
            sharded_model_align(vm, source, jnp.eye(4, dtype=jnp.float32),
                                mesh).T_target_source
        )), 2)
    results["sharded_map"] = curve

    print(f"fixed total work: {n_total} source points; mesh sizes {meshes}")
    print(f"{'mode':14s} " + " ".join(f"{nd:>8d}dev" for nd in meshes) +
          "   overhead@max")
    for mode, curve in results.items():
        t1 = curve[1]
        tn = curve[meshes[-1]]
        row = " ".join(f"{curve[nd]:>10.1f}" for nd in meshes)
        print(f"{mode:14s} {row}   {tn / t1:.2f}x")
    print(json.dumps({"points": n_total, "ms_by_devices": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
