#!/usr/bin/env python3
"""Fleet odometry: track B independent scan sequences in ONE program.

No reference counterpart — the CPU library processes one sequence at a
time. On TPU the batch axis is the cheapest parallelism there is: every
lane (sequence) carries its own incremental voxel map inside the same
vmapped program, and with a device mesh the lane axis shards across
chips with zero inter-chip traffic during the loop.

Run:  python examples/04_fleet_odometry.py [num_lanes]
      (on a multi-chip host, lanes shard over all devices)
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_sequence(seed: int, n_frames: int = 6, step: float = 0.25):
    """A simple world scanned from a moving pose (distinct per lane)."""
    rng = np.random.default_rng(seed)
    g = rng.uniform(-10, 10, size=(2500, 2))
    world = np.c_[g[:, 0], g[:, 1],
                  0.4 * np.sin(0.5 * g[:, 0]) + 0.3 * np.cos(0.8 * g[:, 1])]
    walls = rng.uniform(-10, 10, size=(600, 2))
    world = np.concatenate([
        world,
        np.c_[walls[:, 0], np.full(600, -10.0), 1.0 + 0.3 * walls[:, 1]],
    ])
    return [
        (world - [step * i, 0.03 * step * i, 0]
         + rng.normal(scale=0.004, size=world.shape)).astype(np.float32)
        for i in range(n_frames)
    ], step


def main():
    import jax
    from small_gicp_tpu.models.odometry import OdometryParams
    from small_gicp_tpu.models.odometry_scan import BatchOdometry
    from small_gicp_tpu.parallel.sharding import make_mesh

    num_lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    params = OdometryParams(
        max_scan_points=4096, max_downsampled=4096, map_capacity=8192,
        downsampling_resolution=0.3,
    )

    sequences, steps = [], []
    for lane in range(num_lanes):
        seq, step = make_sequence(seed=lane, step=0.2 + 0.05 * lane)
        sequences.append(seq)
        steps.append(step)

    mesh = make_mesh() if jax.device_count() > 1 else None
    where = (f"{jax.device_count()} devices (lane axis sharded)"
             if mesh is not None else "1 device")
    print(f"tracking {num_lanes} sequences on {where} ...")

    fleet = BatchOdometry(num_lanes, params, mesh=mesh,
                          covariance_mode="knn_window")
    poses = fleet.feed(sequences)  # [B, F, 4, 4]

    for lane in range(num_lanes):
        got = poses[lane, -1, 0, 3]
        want = steps[lane] * (len(sequences[lane]) - 1)
        print(f"lane {lane}: final x = {got:+.3f} m "
              f"(ground truth {want:+.3f}, err {abs(got - want) * 1e3:.1f} mm)")


if __name__ == "__main__":
    main()
