"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: GICP scan-pair registrations/sec on one chip, measured on the
reference's bundled real pair (data/{target,source}.ply, downsample
0.25 m -> ~6.2k points each, full preprocessing excluded, per the
reference's registration_time_stats contract). Two modes are measured:
a sequential lax.scan of single registrations (latency mode, each
registration early-exits at its own convergence) and a vmapped batch
(throughput mode, lanes run lockstep to the slowest lane); the headline
is the better of the two.

vs_baseline compares against the reference built and MEASURED ON THIS
HOST: bench_reference/bench_reference.cpp compiles the header-only
reference (Eigen from the tensorflow wheel) and times single-thread
GICP on the same pair with the same noise poses — 61.2 reg/s
(16.3 ms/registration, mean 3.4 LM iterations). Run
  g++ -O3 -march=native -mno-avx512fp16 -std=c++17 \
      -I/root/reference/include \
      -I/opt/venv/lib/python3.12/site-packages/tensorflow/include \
      bench_reference/bench_reference.cpp -o /tmp/bref && /tmp/bref
to reproduce. BASELINE.md north star is 10x single-thread.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_SINGLE_THREAD_REG_PER_SEC = 61.21  # measured; see module docstring
DATA = "/root/reference/data"


class _Watchdog:
    """The tunneled TPU backend can hang ANY device interaction
    indefinitely when the tunnel degrades — observed failure modes are
    jax.devices() never returning (round 2, multi-hour outage) and
    backend init succeeding while every computation stalls with zero
    CPU use (round 3). Rather than hang the driver, each phase of this
    benchmark arms a deadline; if the phase doesn't complete in time, a
    diagnostic JSON line (value=null, the phase name) is printed and
    the process exits non-zero so the round records WHY there is no
    number."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._deadline = None  # (monotonic deadline, phase label)
        threading.Thread(target=self._watch, daemon=True).start()

    def phase(self, label: str, seconds: float):
        with self._lock:
            self._deadline = (time.monotonic() + seconds, label, seconds)

    def cancel(self):
        with self._lock:
            self._deadline = None

    def _watch(self):
        while True:
            time.sleep(2.0)
            with self._lock:
                d = self._deadline
            if d is not None and time.monotonic() > d[0]:
                print(
                    json.dumps(
                        {
                            "metric": "gicp_registrations_per_sec_single_chip",
                            "value": None,
                            "unit": "registrations/s (bundled pair, 0.25m downsample)",
                            "vs_baseline": None,
                            "error": (
                                f"TPU stalled in phase '{d[1]}' "
                                f"(> {d[2]:.0f}s; tunnel degraded?)"
                            ),
                        }
                    ),
                    flush=True,
                )
                os._exit(3)


def main():
    dog = _Watchdog()
    dog.phase("backend init", 240)
    import jax

    # int64 voxel keys need x64 enabled (the TPU backend handles s64;
    # all float arrays in this benchmark are explicitly float32, so no
    # f64 compute lands on the chip).
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from small_gicp_tpu.utils.profiling import enable_compilation_cache

    # Cold compiles of the two benchmark programs have been observed to
    # take minutes over the dev tunnel; the persistent cache makes every
    # run after the first load them in <1 s.
    enable_compilation_cache()

    import small_gicp_tpu as sgt
    from small_gicp_tpu.models.registration import align_impl

    jax.devices()  # force backend init while the watchdog is armed

    # Probe that the chip actually EXECUTES (init alone can succeed on
    # a degraded tunnel that then stalls every computation), and measure
    # the tunnel's per-sync latency: the degraded-tunnel failure mode of
    # 2026-08-20 is a healthy compute path with ~100 s PER device_get.
    # Every timed phase below ends in exactly one device_get, so the
    # sync latency is measured per rep and subtracted when it dominates
    # (recorded in the output JSON either way).
    # The FIRST device_get of a process has been observed to take 100-460 s
    # on a degraded tunnel (one-time transfer-path setup, worse under
    # concurrent device users); later syncs drop back to ~30 ms. The probe
    # budget covers that one-time cost; lam below measures the steady state.
    dog.phase("device compute probe", 600)
    probe = jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256), np.float32))
    float(jax.device_get(probe))

    def sync_latency():
        t0 = time.perf_counter()
        float(jax.device_get(probe))  # cached 4-byte fetch: pure transport
        return time.perf_counter() - t0

    lam = min(sync_latency(), sync_latency())
    degraded = lam > 1.0
    if degraded:
        print(
            f"# tunnel degraded: {lam:.1f}s per device sync — timing "
            "reps will subtract per-rep sync latency",
            file=sys.stderr, flush=True,
        )

    raw_elapsed: dict = {}  # mode label -> uncorrected wall times

    def timed_reps(fn, n_reps=3, label="unlabeled"):
        """Returns (best_raw, best_corrected) over reps. fn() must end
        in one device_get.

        best_raw is the min UNcorrected wall time — the HEADLINE always
        uses it, so published throughput never depends on a subtraction.
        best_corrected additionally subtracts the per-rep tunnel sync
        latency when the tunnel is degraded (median of three samples,
        clamped to ≤90% of elapsed) and is emitted as a supplemental
        field only."""
        best_raw = float("inf")
        best_corr = float("inf")
        for _ in range(n_reps):
            t0 = time.perf_counter()
            fn()
            elapsed = time.perf_counter() - t0
            raw_elapsed.setdefault(label, []).append(round(elapsed, 4))
            best_raw = min(best_raw, elapsed)
            if degraded:
                syncs = sorted(sync_latency() for _ in range(3))
                elapsed = elapsed - min(syncs[1], 0.9 * elapsed)
            best_corr = min(best_corr, elapsed)
        return best_raw, best_corr

    def budget(base, n_syncs):
        return base + lam * n_syncs * 2.5  # 2.5x headroom on observed latency

    dtype = np.float32
    target_raw = sgt.read_ply(os.path.join(DATA, "target.ply")).astype(dtype)
    source_raw = sgt.read_ply(os.path.join(DATA, "source.ply")).astype(dtype)

    # 0.25 m downsampling of the bundled pair yields ~6.2k points; pad to
    # the next 512 boundary (+ a little headroom) — padded capacity
    # directly scales the quadratic KNN cost, so don't round up to a
    # power of two.
    from small_gicp_tpu.ops.downsampling import voxelgrid_sampling

    n_est = max(
        int(voxelgrid_sampling(sgt.PointCloud.from_points(target_raw), 0.25).num_points),
        int(voxelgrid_sampling(sgt.PointCloud.from_points(source_raw), 0.25).num_points),
    )
    max_points = (n_est + 256 + 511) // 512 * 512
    target, target_tree = sgt.preprocess_points(
        target_raw, 0.25, num_neighbors=10, max_points=max_points
    )
    source, _ = sgt.preprocess_points(
        source_raw, 0.25, num_neighbors=10, max_points=max_points
    )

    # Noise poses so each registration does real work (~10 LM iterations).
    rng = np.random.default_rng(0)
    def noise():
        from small_gicp_tpu.utils.lie import se3_exp
        tw = np.r_[rng.normal(size=3) * 0.03, rng.normal(size=3) * 0.2]
        return se3_exp(jnp.asarray(tw, dtype))

    # --- Selfcheck: the compiled (Mosaic) kernels are asserted against
    # XLA oracles ON THIS CHIP before any timing, so a Pallas regression
    # cannot hide behind a still-plausible headline number (VERDICT r2
    # "promote the on-chip lane to the default driver path"). Failure
    # reports value=None + the failing check and exits non-zero.
    def selfcheck():
        from small_gicp_tpu.ops.knn import brute_force_knn
        from small_gicp_tpu.ops.knn_pallas import (
            knn_pallas,
            nearest_neighbor_pallas,
        )
        from small_gicp_tpu.models import factors
        from small_gicp_tpu.models.registration import (
            _search_correspondences,
        )
        from small_gicp_tpu.ops.gicp_fused_pallas import (
            gicp_linearize_pallas,
        )

        t_xyz = target.points[:, :3]
        q_sub = source.points[:512]

        # Launch every check's programs first, then fetch ALL results in
        # ONE device_get (async host copies pipeline through the tunnel,
        # so the per-sync latency is paid once, not once per array —
        # essential when the tunnel degrades to ~100 s per round trip).

        # 1) Pallas kNN k=20 vs XLA brute force. The XLA oracle's
        #    centered matmul expansion itself carries ~7e-5 absolute d2
        #    error at this cloud's 20 m extent (measured; the Pallas
        #    difference form is 3.5e-7 from the f64 oracle with ZERO
        #    index mismatches), so the tolerances below are set above
        #    the ORACLE's noise floor, not the kernel's: atol 2e-4,
        #    mismatch fraction 1% (observed 0.08%, all near-ties).
        def _knn_diverges(d_a, i_a, d_b, i_b, what):
            d_a, i_a = np.asarray(d_a), np.asarray(i_a)
            d_b, i_b = np.asarray(d_b), np.asarray(i_b)
            if not np.allclose(d_a, d_b, rtol=1e-2, atol=2e-4):
                return f"{what}: distances diverge from XLA brute force"
            mm = i_a != i_b
            if mm.mean() > 0.01:
                return (f"{what}: {mm.mean():.1%} index mismatches vs XLA "
                        "brute force (fp near-ties explain <1%)")
            if mm.any() and not np.allclose(
                d_a[mm], d_b[mm], rtol=1e-2, atol=2e-4
            ):
                return f"{what}: index mismatches not distance-explained"
            return None

        d_p, i_p = knn_pallas(target.points, q_sub[:, :3], 20)
        d_x, i_x = brute_force_knn(t_xyz, q_sub[:, :3], 20)
        d1, i1 = nearest_neighbor_pallas(target.points, q_sub)

        from small_gicp_tpu.utils.lie import se3_exp as _exp
        T0 = _exp(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.1, 0.08], dtype))
        md2 = jnp.asarray(1.0, dtype)
        corr = _search_correspondences(
            "gicp", target, None, source.points, source.num_points,
            source.covs, T0, md2,
        )
        H_ref, b_ref, _ = factors.linearize(corr, T0, source.points)
        H_f, b_f, _mu, _W, mask_f, _sq, _c16, _ss = gicp_linearize_pallas(
            target.points, target.covs, source.points, source.covs,
            T0, source.num_points, md2,
        )
        reg = align_impl(target, source, target_tree, T0,
                         registration_type="gicp")

        v = jax.device_get({
            "d_p": d_p, "i_p": i_p, "d_x": d_x, "i_x": i_x,
            "d1": d1, "i1": i1,
            "mask_f": mask_f, "mask": corr.mask,
            "H_f": H_f, "H_ref": H_ref,
            "Tr": reg.T_target_source, "conv": reg.converged,
        })

        # 1) Pallas kNN k=20 vs XLA brute force.
        r = _knn_diverges(v["d_p"], v["i_p"], v["d_x"], v["i_x"],
                          "knn_pallas k=20")
        if r:
            return r

        # 2) Pallas 1-NN vs XLA.
        r = _knn_diverges(v["d1"], v["i1"], v["d_x"][:, 0], v["i_x"][:, 0],
                          "nearest_neighbor_pallas")
        if r:
            return r

        # 3) Fused search+linearize vs the XLA correspondence+linearize
        #    oracle at a perturbed pose.
        if not np.array_equal(v["mask_f"], v["mask"]):
            return "fused kernel mask diverges from XLA correspondence search"
        scale = max(1.0, float(np.abs(v["H_ref"]).max()))
        if not np.allclose(
            v["H_f"] / scale, v["H_ref"] / scale, atol=5e-4
        ):
            return "fused kernel H diverges from XLA linearize"

        # 4) One end-to-end align within the reference's own test bound
        #    (registration_test.cpp:144-145).
        T_gt = np.loadtxt(os.path.join(DATA, "T_target_source.txt"))
        Tr = v["Tr"]
        dR = Tr[:3, :3] @ T_gt[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        dt = np.linalg.norm(Tr[:3, 3] - T_gt[:3, 3])
        if not (bool(v["conv"]) and ang < 2.5 and dt < 0.2):
            return (f"E2E align out of reference bounds: {ang:.2f} deg / "
                    f"{dt:.3f} m / converged={bool(v['conv'])}")
        return None

    # Cold compiles over the tunnel can take minutes; warm-cache runs
    # take seconds. The budgets below are sized for cold compiles.
    dog.phase("selfcheck (Pallas kernels vs XLA oracles)", budget(900, 14))
    fail = selfcheck()
    if fail is not None:
        print(json.dumps({
            "metric": "gicp_registrations_per_sec_single_chip",
            "value": None,
            "unit": "registrations/s (bundled pair, 0.25m downsample)",
            "vs_baseline": None,
            "selfcheck": f"fail: {fail}",
        }), flush=True)
        sys.exit(4)

    # All registrations run inside ONE jitted lax.scan program so the
    # measurement is pure device throughput: the tunneled TPU platform
    # adds milliseconds of host round-trip per dispatch/device_get
    # (and block_until_ready can return before remote execution
    # finishes), which would otherwise swamp the per-registration time.
    # The tunnel adds ~30 ms of fixed per-program-call latency, so run
    # enough registrations per call that the fixed cost is noise
    # (256 regs x ~1.7 ms >> 30 ms).
    n_iters = 256

    @jax.jit
    def run_many(init_Ts):
        def step(acc, T0):
            r = align_impl(
                target, source, target_tree, T0, registration_type="gicp"
            )
            return acc + r.T_target_source, r.iterations

        acc, iters = jax.lax.scan(
            step, jnp.zeros((4, 4), dtype), init_Ts
        )
        return acc, iters

    n_reps = 2 if degraded else 3
    dog.phase("sequential scan mode (compile + runs)", budget(900, n_reps * 2 + 2))
    poses = jnp.stack([noise() for _ in range(n_iters)])
    jax.device_get(run_many(poses))  # warmup / compile

    scan_t_raw, scan_t_corr = timed_reps(
        lambda: jax.device_get(run_many(poses)[0]), n_reps, label="scan"
    )
    scan_reg_per_sec = n_iters / scan_t_raw
    scan_corr = n_iters / scan_t_corr

    # Batched (throughput) mode: vmapped lanes with distinct noise poses.
    from small_gicp_tpu.parallel.sharding import _batched_align_fn

    B, BREPS = 32, 8
    targets = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), target
    )
    sources = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), source
    )
    bfn = _batched_align_fn(registration_type="gicp")

    @jax.jit
    def run_batched(init_Ts_all):
        def step(acc, Ts):
            r = bfn(targets, sources, Ts)
            return acc + jnp.sum(r.T_target_source, axis=0), r.iterations

        acc, iters = jax.lax.scan(step, jnp.zeros((4, 4), dtype), init_Ts_all)
        return acc, iters

    dog.phase("batched mode (compile + runs)", budget(900, n_reps * 2 + 2))
    bposes = jnp.stack(
        [jnp.stack([noise() for _ in range(B)]) for _ in range(BREPS)]
    )
    jax.device_get(run_batched(bposes))
    batch_t_raw, batch_t_corr = timed_reps(
        lambda: jax.device_get(run_batched(bposes)[0]), n_reps, label="batch"
    )
    batch_reg_per_sec = B * BREPS / batch_t_raw
    batch_corr = B * BREPS / batch_t_corr

    # Fleet (persistent-lane) mode: P problems streamed through B
    # resident lanes — no lockstep (a converged lane refills from the
    # queue the same round) and the pair's prepared tables are shared
    # by every lane at zero copy cost (parallel/fleet.py). The tables
    # are prepared ONCE, in their own program, exactly like the
    # reference benchmark builds trees/covariances once before its
    # timing loop (bench_reference.cpp): fusing the preparation into
    # the while-loop program costs ~3.4x (measured 287 vs 1252 reg/s —
    # an XLA scheduling cliff, not compute; see parallel/fleet.py).
    from small_gicp_tpu.parallel.fleet import align_fleet, fleet_prepare

    # P=512 amortizes the queue drain tail better than 256 (measured
    # 1316 vs 1218 reg/s at B=32; lane count is flat 16..64 — the
    # kernel is VPU-saturated either way).
    P = 2 * n_iters
    fposes = jnp.stack([noise() for _ in range(P)])
    fleet_prepared = jax.block_until_ready(fleet_prepare(target, source))

    @jax.jit
    def run_fleet(init_Ts, tt, tb, qt, qb):
        r = align_fleet(target, source, init_Ts, num_lanes=B,
                        prepared=(tt, tb, qt, qb))
        return jnp.sum(r.T_target_source, axis=0), r.iterations

    dog.phase("fleet mode (compile + runs)", budget(900, n_reps * 2 + 2))
    jax.device_get(run_fleet(fposes, *fleet_prepared))
    fleet_t_raw, fleet_t_corr = timed_reps(
        lambda: jax.device_get(run_fleet(fposes, *fleet_prepared)[0]),
        n_reps, label="fleet"
    )
    fleet_reg_per_sec = P / fleet_t_raw
    fleet_corr = P / fleet_t_corr

    dog.cancel()
    reg_per_sec = max(scan_reg_per_sec, batch_reg_per_sec, fleet_reg_per_sec)
    print(
        json.dumps(
            {
                "metric": "gicp_registrations_per_sec_single_chip",
                "value": round(reg_per_sec, 3),
                "unit": "registrations/s (bundled pair, 0.25m downsample)",
                "vs_baseline": round(reg_per_sec / REFERENCE_SINGLE_THREAD_REG_PER_SEC, 3),
                "scan_mode": round(scan_reg_per_sec, 3),
                "batch_mode_b32": round(batch_reg_per_sec, 3),
                "fleet_mode_b32": round(fleet_reg_per_sec, 3),
                "baseline_reg_per_sec_measured_this_host": REFERENCE_SINGLE_THREAD_REG_PER_SEC,
                "selfcheck": "pass",
                **(
                    {
                        "tunnel_sync_latency_s": round(lam, 2),
                        "uncorrected_elapsed_s": raw_elapsed,
                        "sync_corrected_reg_per_sec": {
                            "scan": round(scan_corr, 3),
                            "batch": round(batch_corr, 3),
                            "fleet": round(fleet_corr, 3),
                        },
                        "timing_note": (
                            "tunnel degraded: the HEADLINE value is the "
                            "UNcorrected wall-time number; "
                            "sync_corrected_reg_per_sec additionally "
                            "subtracts per-rep device sync latency "
                            "(median of 3 samples, clamped to ≤90% of "
                            "elapsed) as a supplemental estimate"
                        ),
                    }
                    if degraded
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
