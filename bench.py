"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: GICP scan-pair registrations/sec on one chip, measured on the
reference's bundled real pair (data/{target,source}.ply, downsample
0.25 m → ~15k points each, full preprocessing excluded, per the
reference's registration_time_stats contract). vs_baseline compares
against the reference's single-thread CPU time on the same pair
(~60 ms/registration ⇒ ~17 reg/s, measured from small_gicp's own
odometry benchmark class of machines; BASELINE.md north star is 10x).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_SINGLE_THREAD_REG_PER_SEC = 17.0  # see module docstring
DATA = "/root/reference/data"


def main():
    import jax

    # int64 voxel keys need x64 enabled (the TPU backend handles s64;
    # all float arrays in this benchmark are explicitly float32, so no
    # f64 compute lands on the chip).
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import small_gicp_tpu as sgt
    from small_gicp_tpu.models.registration import align_impl

    dtype = np.float32
    target_raw = sgt.read_ply(os.path.join(DATA, "target.ply")).astype(dtype)
    source_raw = sgt.read_ply(os.path.join(DATA, "source.ply")).astype(dtype)

    # 0.25 m downsampling of the bundled pair yields ~6.2k points; pad to
    # the next power of two — padded capacity directly scales the KNN cost.
    target, target_tree = sgt.preprocess_points(
        target_raw, 0.25, num_neighbors=10, max_points=8192
    )
    source, _ = sgt.preprocess_points(
        source_raw, 0.25, num_neighbors=10, max_points=8192
    )

    # Noise poses so each registration does real work (~10 LM iterations).
    rng = np.random.default_rng(0)
    def noise():
        from small_gicp_tpu.utils.lie import se3_exp
        tw = np.r_[rng.normal(size=3) * 0.03, rng.normal(size=3) * 0.2]
        return se3_exp(jnp.asarray(tw, dtype))

    def run(T0):
        return align_impl(
            target, source, target_tree, T0, registration_type="gicp"
        ).T_target_source

    # Warmup / compile. NOTE: on the tunneled TPU platform
    # block_until_ready() can return before remote execution finishes, so
    # the sync points force a device->host materialization
    # (jax.device_get) — the only reliable barrier. Each registration's
    # result feeds an accumulator so all N executions are ordered on
    # device; one final device_get measures sustained device throughput
    # without paying the host<->tunnel round-trip per call.
    jax.device_get(run(noise()))

    n_iters = 20
    poses = [noise() for _ in range(n_iters)]
    acc = jnp.zeros((4, 4), dtype)
    t0 = time.perf_counter()
    for T0 in poses:
        acc = acc + run(T0)
    jax.device_get(acc)
    dt = time.perf_counter() - t0
    reg_per_sec = n_iters / dt

    print(
        json.dumps(
            {
                "metric": "gicp_registrations_per_sec_single_chip",
                "value": round(reg_per_sec, 3),
                "unit": "registrations/s (bundled pair, 0.25m downsample)",
                "vs_baseline": round(reg_per_sec / REFERENCE_SINGLE_THREAD_REG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
