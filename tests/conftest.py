"""Test configuration.

Tests run on CPU with 8 virtual devices (so sharding/collective paths are
exercised without a TPU pod — the mesh-on-CPU strategy from SURVEY.md §4)
and with x64 enabled so parity tests can match the reference's
double-precision math.
"""

import os

# Opt-in on-device lane: SGT_TPU_TESTS=1 pytest -m tpu tests/
# keeps the real TPU backend; default runs force the 8-device CPU mesh.
_TPU_LANE = os.environ.get("SGT_TPU_TESTS", "") not in ("", "0")

if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _TPU_LANE:
    # The environment may pre-register a TPU backend and force
    # jax_platforms via sitecustomize (overriding the JAX_PLATFORMS env
    # var), so pin the platform through the config API, which wins.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Single-core CI box: persistent compilation cache makes re-runs cheap.
# Namespaced per host fingerprint (the ONE implementation lives in
# utils/profiling.host_fingerprint): cross-host XLA:CPU AOT cache reuse
# is unsound — foreign blobs load with "machine type mismatch ...
# SIGILL" warnings and subtly different numerics.
from small_gicp_tpu.utils.profiling import host_fingerprint

jax.config.update(
    "jax_compilation_cache_dir",
    f"/root/.cache/jax/{host_fingerprint()}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="session")
def bundled_pair():
    """The reference's bundled real scan pair + ground truth
    (data/{target,source}.ply, T_target_source.txt)."""
    from small_gicp_tpu.utils.io import read_ply, read_pose_matrix

    target = read_ply(os.path.join(DATA_DIR, "target.ply"))
    source = read_ply(os.path.join(DATA_DIR, "source.ply"))
    T_gt = read_pose_matrix(os.path.join(DATA_DIR, "T_target_source.txt"))
    return target, source, T_gt


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Clear JAX's in-process executable caches after each test module.

    Round-5 finding: the full suite accumulates enough compiled XLA:CPU
    executables in one process to exhaust `vm.max_map_count` (watched:
    ~57k of the 65530 default mid-suite), at which point mmap fails and
    the NEXT compile segfaults inside the XLA compiler — deterministic
    at whichever test crosses the limit, invisible in isolation.
    Clearing per module bounds live executables; the persistent
    compilation cache keeps the re-compiles cheap."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: runs compiled (non-interpreted) kernels on the real TPU chip; "
        "opt-in via SGT_TPU_TESTS=1 pytest -m tpu",
    )
    config.addinivalue_line(
        "markers",
        "smoke: fast correctness tier (<60 s total on a laptop-class CPU); "
        "run on every push via `pytest -m smoke` — the full suite runs "
        "nightly (.github/workflows/test.yml)",
    )


def pytest_collection_modifyitems(config, items):
    if _TPU_LANE:
        return
    skip_tpu = pytest.mark.skip(
        reason="TPU lane is opt-in: SGT_TPU_TESTS=1 pytest -m tpu tests/"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
