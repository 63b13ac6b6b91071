"""Pod-scale scaling benchmark — the ≥80% north star, one command away.

BASELINE.md's third target (≥80% scaling efficiency at N≥2 hosts)
cannot be measured on this machine (one chip, no pod). This app makes
the claim one command on real hardware: it brings up
`multihost.initialize()` (auto-discovery on TPU pods), builds the
process-spanning mesh, runs the framework's parallel modes with FIXED
WORK PER DEVICE (weak scaling — ideal wall time is flat as devices
grow), and prints one JSON line per mode:

    {"mode": "batch", "devices": 8, "units": 256, "wall_ms": ...,
     "throughput": ..., "per_device": ..., "efficiency": ...}

Workflow on a pod:
    # 1 host / 1 chip (or --devices 1): record the baseline
    python -m small_gicp_tpu.apps.pod_scaling --save-baseline /tmp/base.json
    # N hosts, same flags (launched per-process by the pod runtime):
    python -m small_gicp_tpu.apps.pod_scaling --baseline-json /tmp/base.json
`efficiency` = per-device throughput / baseline per-device throughput;
≥0.8 is the target. Modes:

  * batch — [B] independent registrations, batch axis sharded
    (parallel/sharding.align_batch); zero inter-chip traffic.
  * point — ONE registration, source point axis sharded with psum'd
    (H, b, e) (align_point_sharded); 43 floats + K trial errors per
    iteration on the interconnect.
  * fleet — persistent-lane fleet, problem queue sharded per device
    (parallel/fleet.align_fleet_sharded); device-local refill.

The same script dry-runs in the repo's 2-process CPU harness
(tests/test_multihost.py::test_two_process_pod_scaling) — identical
orchestration path, gRPC loopback instead of DCN.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pod_scaling")
    ap.add_argument("--modes", default="batch,point,fleet")
    ap.add_argument("--points", type=int, default=4096,
                    help="source points per device (point mode) / per pair")
    ap.add_argument("--problems-per-device", type=int, default=8,
                    help="registrations per device (batch/fleet modes)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--baseline-json", default=None,
                    help="per-device baseline from --save-baseline")
    ap.add_argument("--save-baseline", default=None)
    ap.add_argument("--coordinator", default=None,
                    help="host:port (else auto-discovered / env)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)

    from small_gicp_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    proc_idx, n_proc, _ = multihost.process_info()
    mesh = multihost.global_mesh("data")
    n_dev = int(mesh.devices.size)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from __graft_entry__ import _make_pair
    from small_gicp_tpu.parallel.fleet import align_fleet_sharded
    from small_gicp_tpu.parallel.sharding import (
        align_batch,
        align_point_sharded,
    )
    from small_gicp_tpu.utils.lie import se3_exp

    rng = np.random.default_rng(0)

    def noise(p):
        tw = np.c_[rng.normal(size=(p, 3)) * 0.02,
                   rng.normal(size=(p, 3)) * 0.1].astype(np.float32)
        return jnp.stack([se3_exp(jnp.asarray(t)) for t in tw])

    baseline = {}
    if args.baseline_json:
        with open(args.baseline_json) as f:
            baseline = json.load(f)

    # Cross-mesh barrier: block_until_ready on a result waits only for
    # the LOCAL process's addressable shards, so in collective-free
    # modes (batch, fleet) a straggling host would be excluded from the
    # measured wall time and efficiency overstated. A psum over the
    # whole mesh forces every device to have drained its queue before
    # the clock reads.
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older JAX spelling
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as _P

    _bar = jax.jit(shard_map(
        lambda x: jax.lax.psum(x, "data"),
        mesh=mesh, in_specs=_P("data"), out_specs=_P(),
    ))
    _bar_in = jnp.ones((n_dev,), jnp.float32)

    def barrier():
        _bar(_bar_in).block_until_ready()

    def measure(name, units, run):
        run()  # warmup/compile
        barrier()
        t0 = time.perf_counter()
        for _ in range(args.reps):
            run()
        barrier()  # global drain: the slowest device closes the clock
        wall = (time.perf_counter() - t0) / args.reps
        thr = units / wall
        per_dev = thr / n_dev
        rec = {
            "mode": name,
            "devices": n_dev,
            "processes": n_proc,
            "units": units,
            "wall_ms": round(wall * 1e3, 2),
            "throughput": round(thr, 3),
            "per_device": round(per_dev, 3),
        }
        if name in baseline:
            rec["efficiency"] = round(per_dev / baseline[name], 3)
        if proc_idx == 0:
            print(json.dumps(rec), flush=True)
        return name, per_dev

    results = {}
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]

    if "batch" in modes:
        B = args.problems_per_device * n_dev
        t1, s1 = _make_pair(args.points, b=B)
        Ts = noise(B)

        def run_batch():
            r = align_batch(t1, s1, Ts, mesh=mesh,
                            registration_type="gicp")
            r.T_target_source.block_until_ready()

        k, v = measure("batch", B, run_batch)
        results[k] = v

    if "point" in modes:
        # TRUE weak scaling: the per-device work must stay constant as
        # devices grow. The SOURCE (the sharded axis) scales with the
        # mesh; the TARGET (replicated, searched by every device) stays
        # at the baseline size — otherwise per-query search cost grows
        # with N and "efficiency" conflates algorithmic growth with
        # scaling loss.
        n = args.points * n_dev
        t2, s_small = _make_pair(args.points)
        # Source = the transformed copy tiled n_dev times (still overlaps
        # the target, so the optimizer does real work on every device).
        from small_gicp_tpu.point_cloud import PointCloud as _PC

        s2 = _PC(
            points=jnp.tile(s_small.points, (n_dev, 1)),
            num_points=jnp.asarray(n, jnp.int32),
            covs=jnp.tile(s_small.covs, (n_dev, 1, 1)),
        )

        def run_point():
            r = align_point_sharded(
                t2, s2, jnp.eye(4, dtype=jnp.float32), mesh,
                registration_type="gicp",
            )
            r.T_target_source.block_until_ready()

        # Unit = source points processed (weak scaling over the point axis).
        k, v = measure("point", n, run_point)
        results[k] = v

    if "fleet" in modes:
        P = args.problems_per_device * n_dev
        t3, s3 = _make_pair(args.points)
        Ts = noise(P)

        def run_fleet():
            r = align_fleet_sharded(
                t3, s3, Ts, mesh,
                num_lanes_per_device=min(8, args.problems_per_device),
            )
            r.T_target_source.block_until_ready()

        k, v = measure("fleet", P, run_fleet)
        results[k] = v

    if args.save_baseline and proc_idx == 0:
        with open(args.save_baseline, "w") as f:
            json.dump(results, f)
        print(f"# baseline saved to {args.save_baseline}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
