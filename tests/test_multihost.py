"""Multi-host scaffolding tests.

Single-process pieces (no-op initialize, mesh construction, 2-D mesh
factorization) run on the suite's 8-virtual-device CPU mesh. On top of
those, `test_two_process_psum` actually launches TWO OS processes,
brings up `jax.distributed` between them (parallel/multihost.py), builds
the process-spanning mesh, and runs the framework's core collective —
the psum'd (H, b, e) normal-equation reduction shape — across the
process boundary. This is the CPU stand-in for a 2-host TPU slice: the
orchestration path (coordinator, global device enumeration, SPMD
execution of one jitted program from every process) is identical; only
the transport differs (gRPC loopback here, DCN there).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
import pytest

from small_gicp_tpu.parallel import multihost


def test_initialize_noop_single_process():
    multihost.initialize()  # must not raise in a single-process session
    idx, count, local = multihost.process_info()
    assert idx == 0 and count == 1 and local == len(jax.devices())


def test_global_mesh_covers_all_devices():
    mesh = multihost.global_mesh("data")
    assert mesh.devices.size == len(jax.devices())

    # a psum over the mesh: the collective path every parallel mode uses
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    n = mesh.devices.size

    def local(x):
        return jax.lax.psum(jnp.sum(x), "data")

    fn = shard_map(local, mesh=mesh, in_specs=P("data"), out_specs=P())
    out = fn(jnp.arange(n * 4, dtype=jnp.float32))
    assert float(out) == float(np.arange(n * 4).sum())


def test_global_mesh_2d_factorization():
    mesh = multihost.global_mesh_2d(("host", "chip"))
    assert mesh.devices.shape == (1, len(jax.devices()))
    assert mesh.axis_names == ("host", "chip")

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from small_gicp_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=sys.argv[2], num_processes=2, process_id=proc_id
)
pi, pc, local = multihost.process_info()
assert pc == 2, pc
assert local == 4, local
mesh = multihost.global_mesh("data")
assert mesh.devices.size == 8, mesh

# The framework's core cross-device collective: every shard produces a
# local (H, b, e) block and the global normal equations are one psum
# (parallel/sharding.py's point-axis reduction). 8 shards x 43 floats.
def local_hbe(x):
    # x: [N/8, 6] local rows; H = x^T x, b = x^T 1, e = sum(x^2)
    h = x.T @ x
    b = jnp.sum(x, axis=0)
    e = jnp.sum(x * x)
    h = jax.lax.psum(h, "data")
    b = jax.lax.psum(b, "data")
    e = jax.lax.psum(e, "data")
    return h, b, e

n = 1024
full = np.arange(n * 6, dtype=np.float64).reshape(n, 6) / (n * 6.0)

fn = shard_map(
    local_hbe, mesh=mesh, in_specs=P("data"), out_specs=(P(), P(), P())
)
fn = jax.jit(fn, out_shardings=None)

# Each process supplies ONLY its local shards of the global array.
from jax.sharding import NamedSharding
sharding = NamedSharding(mesh, P("data"))
garr = jax.make_array_from_callback(
    (n, 6), sharding, lambda idx: full[idx]
)
h, b, e = fn(garr)
h = np.asarray(jax.device_get(h))
b = np.asarray(jax.device_get(b))
e = float(e)

ref_h = full.T @ full
ref_b = full.sum(axis=0)
ref_e = float((full * full).sum())
assert np.allclose(h, ref_h, atol=1e-9), (h, ref_h)
assert np.allclose(b, ref_b, atol=1e-9)
assert abs(e - ref_e) < 1e-9
print(f"proc {pi}: psum over 2 processes OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum(tmp_path):
    """Two OS processes form one 8-device mesh and psum across it."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # Make the repo importable from the subprocess regardless of cwd.
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=220)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "psum over 2 processes OK" in out, out


def test_initialize_pod_markers_fall_back_gracefully():
    """Pod env markers without a reachable coordinator (pod-flavored
    single-host sandboxes) must fall back to single-process instead of
    raising — and explicit args must still raise. Run in a subprocess so
    the env/jax.distributed state can't leak into this session."""
    import subprocess
    import sys

    code = """
import os
os.environ["CLOUD_TPU_TASK_ID"] = "0"
import jax
jax.config.update("jax_platforms", "cpu")
from small_gicp_tpu.parallel import multihost
multihost.initialize()   # pod markers, no coordinator -> no-op fallback
assert multihost.process_info()[1] == 1
print("FALLBACK_OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert "FALLBACK_OK" in r.stdout, (r.stdout, r.stderr)


def test_two_process_pod_scaling(tmp_path):
    """The pod-ready scaling benchmark (apps/pod_scaling.py) runs
    end-to-end across a real process boundary: two OS processes form an
    8-device mesh and measure the batch mode; process 0 must emit the
    JSON record. This is the CI-path stand-in for the one-command pod
    run the ≥80% north star calls for."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        .replace("--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    runner = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; from small_gicp_tpu.apps.pod_scaling import main; "
        "sys.exit(main(sys.argv[1:]))"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", runner,
             "--modes", "batch,fleet", "--points", "256",
             "--problems-per-device", "1", "--reps", "1",
             "--coordinator", coord, "--num-processes", "2",
             "--process-id", str(i),
             "--save-baseline", str(tmp_path / "base.json")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=220)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("pod_scaling workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    import json as _json

    rec_lines = [
        l for l in outs[0].splitlines() if l.startswith("{")
    ]
    recs = {r["mode"]: r for r in map(_json.loads, rec_lines)}
    assert set(recs) == {"batch", "fleet"}, outs[0]
    for rec in recs.values():
        assert rec["devices"] == 8 and rec["processes"] == 2
        assert rec["throughput"] > 0
    assert (tmp_path / "base.json").exists()
