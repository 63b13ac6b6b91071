"""Profiling / tracing utilities.

The reference's observability is manual Stopwatch/Summarizer timers
(benchmark/benchmark.hpp:18-94). The TPU equivalents here add what a
compiled-async runtime needs:

  * `trace(logdir)` — context manager around jax.profiler for
    XLA-op-level traces viewable in TensorBoard/Perfetto.
  * `StageTimer` — named-stage wall-clock accumulator that forces a
    device sync (jax.device_get) at each stage boundary, so stage times
    are real on asynchronous backends; prints the reference's
    "mean ± std (median)" format per stage.
  * `nan_guard()` — enables jax_debug_nans (the TPU-side analog of the
    sanitizer slot in SURVEY.md §5: no shared-memory races exist under
    JAX, numeric poison is the failure mode to trap instead).
  * `enable_compilation_cache()` — persistent XLA executable cache so
    benchmark/driver processes skip recompiles (on the tunneled dev
    backend a cold compile of the fused registration program has been
    observed to take minutes; with the cache a fresh process reloads it
    in <1 s).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax

from small_gicp_tpu.utils.benchmark import Summarizer


def enable_compilation_cache(
    cache_dir: str = None,
    min_compile_secs: float = 0.5,
) -> None:
    """Turn on JAX's persistent compilation cache.

    Compiled executables are keyed by HLO hash and reloaded across
    processes, so repeated benchmark/driver invocations pay the (tunnel-
    dependent, sometimes minutes-long) XLA compile exactly once. Call
    before the first jit execution; safe to call repeatedly.

    cache_dir defaults to SGT_JAX_CACHE_DIR if set, else `.jax_cache`
    next to the package checkout (NOT a hardcoded absolute path — the
    cache must follow the checkout it belongs to).

    The cache is namespaced per HOST FINGERPRINT (see host_fingerprint):
    jax's cache key does not include the executing machine's CPU
    features, and XLA:CPU AOT executables compiled on a different host
    DO load here ("machine type ... doesn't match ... could lead to
    SIGILL" in stderr) with subtly different numerics — observed as a
    2e-4 pose divergence between a cache-hit program and a freshly
    compiled one in the same process (round-5 full-suite flake).
    """
    import os

    if cache_dir is None:
        cache_dir = os.environ.get("SGT_JAX_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    cache_dir = os.path.join(cache_dir, host_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )


def host_fingerprint() -> str:
    """Short stable id of this host's CPU capability set, for
    namespacing persistent-cache directories (cross-host XLA:CPU AOT
    reuse is unsound — see enable_compilation_cache)."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(
        (platform.machine() + "|" + feats).encode()
    ).hexdigest()[:12]
    return f"host-{h}"


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    """Raise on NaN production inside jitted code while active."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StageTimer:
    """Per-stage timers with device-sync boundaries.

    Usage:
        timer = StageTimer()
        with timer.stage("preprocess"):
            cloud = preprocess(...)          # result synced at exit
        print(timer.report())
    """

    def __init__(self):
        self.stages: Dict[str, Summarizer] = {}
        self._result = None

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        box = {}
        yield box
        # Sync whatever the stage stored (or the implicit dispatch queue
        # via a trivial barrier array).
        if box:
            jax.device_get(jax.tree_util.tree_leaves(box)[-1])
        self.stages.setdefault(name, Summarizer()).push(
            (time.perf_counter() - t0) * 1e3
        )

    def report(self) -> str:
        lines = [
            f"{name}={s} [msec]" for name, s in self.stages.items()
        ]
        return "\n".join(lines)
