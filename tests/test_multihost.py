"""Multi-host scaffolding smoke tests (single-process, 8-device CPU mesh).

Real multi-host hardware isn't available here; these validate the
process-agnostic pieces: no-op initialize in a single-process session,
globally-consistent mesh construction, the 2-D (host, chip) mesh
factorization, and a collective over the global mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

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
