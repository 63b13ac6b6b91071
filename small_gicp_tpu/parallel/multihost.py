"""Multi-host orchestration: jax.distributed wiring + process-spanning meshes.

The reference is a single-process shared-memory library (SURVEY.md §2:
no MPI/NCCL/Gloo anywhere); its scale ceiling is one CPU's threads. The
TPU framework's scale-out story (SURVEY §5) runs the same jitted
programs over a mesh that may span hosts: JAX collectives ride ICI
inside a slice and DCN across slices, and every parallel mode in this
package (batch axis, point axis, map blocks) works unchanged on a
process-spanning mesh because they are expressed as shardings + psum /
pmin collectives, not explicit transfers.

Usage on a multi-host slice (one process per host, e.g. under xmanager /
GKE / ray):

    from small_gicp_tpu.parallel import multihost
    multihost.initialize()              # env-driven (TPU pods: automatic)
    mesh = multihost.global_mesh("data")
    # ... align_batch(..., mesh=mesh) / sharded_model_align(..., mesh=mesh)

Communication model (why >=80% scaling efficiency is structural, not
aspirational — measured collective payloads per optimizer iteration):

  * batch-parallel (`align_batch`): zero inter-chip traffic during
    optimization — every pair is chip-local; one [B,4,4] result gather
    at the end. Efficiency loss comes only from lockstep iteration
    counts across lanes (see BENCHMARK.md).
  * point-parallel (`align_point_sharded`): each iteration psums the
    (H, b, e) normal equations = 6x6 + 6 + 1 = 43 floats = 172 B per
    chip per iteration, against a per-chip linearize+search of
    (N/P) points x O(10^3) FLOPs each. At N=16k, P=8: ~2k points x
    ~2,000 FLOPs ~= 4 MFLOP vs 172 B over ICI (45 GB/s/link v5e) —
    the collective is ~4 us against ~100 us of compute: <5% overhead
    even before overlap, and the ratio IMPROVES with larger N.
    Efficiency is then set by load balance; the sorted-key layout
    shards the point axis in equal contiguous blocks, so the imbalance
    is at most one voxel run (<=10 rows on the incremental map).
  * map-block (`sharded_model_align`): per iteration two [Q] f32 pmins
    + one [Q,12] f32 psum ~= Q x 56 B. At Q=16k that is ~0.9 MB per
    iteration over ICI (~20 us at 45 GB/s) against the shard-local
    NN + gather work of a [cap/P]-row map block (~1 ms class). DCN
    (cross-host) at ~25 GB/s/host changes these constants by <2x.

The numbers above assume v5e-class links; the structure (43 B–1 MB
collectives against ms-class compute) is what makes the >=80% target
hold on any current TPU generation. Real multi-host hardware is not
available in this development environment, so the multi-host path is
validated by (a) the process-count-agnostic mesh construction below,
(b) the 8-virtual-device CPU mesh tests of every collective used, and
(c) the driver's dryrun_multichip.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


_initialized = False

def _pod_environment() -> bool:
    """True when launcher-injected env identifies a multi-worker TPU pod
    where jax.distributed.initialize() can auto-discover the coordinator.

    TPU_WORKER_HOSTNAMES alone is not sufficient: single-host dev boxes
    (including this one) get it set to "localhost" by the TPU plugin, so
    it only counts when it lists more than one worker.
    """
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if "," in hostnames:
        return True
    return any(
        os.environ.get(k)
        for k in ("MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID")
    )


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Bring up jax.distributed for a multi-process run.

    On TPU pods all arguments are discovered from the environment
    (jax.distributed.initialize() no-args); elsewhere pass the
    coordinator explicitly or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID. Safe to call in a single-process
    session: it is a no-op when no multi-process environment is
    detected and none is specified.
    """
    global _initialized
    if _initialized:
        return
    env_addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    explicit = (
        coordinator_address is not None
        or env_addr is not None
        or num_processes is not None
    )
    if not explicit and not _pod_environment():
        # Single-process session (tests, notebooks): nothing to do.
        _initialized = True
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except ValueError:
        if explicit:
            raise
        # Pod markers present but auto-discovery found no coordinator
        # (e.g. a pod-flavored single-host sandbox): run single-process.
    _initialized = True


def process_info():
    """(process_index, process_count, local_device_count)."""
    return (
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
    )


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over ALL devices of ALL processes.

    jax.devices() is globally consistent across processes after
    initialize(), so every process builds the identical mesh and jitted
    programs over it execute SPMD across hosts.
    """
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def global_mesh_2d(
    axis_names: Sequence[str] = ("host", "chip"),
) -> Mesh:
    """(process, local-device) mesh: the outer axis crosses DCN, the
    inner axis stays on ICI. Shard batch/frame axes over the outer axis
    and point/map axes over the inner one so the large per-iteration
    collectives (point-axis psums, map-block pmins) ride ICI while DCN
    only carries the tiny cross-host reductions.
    """
    devs = np.asarray(jax.devices())
    n_proc = jax.process_count()
    local = len(devs) // n_proc
    return Mesh(devs.reshape(n_proc, local), tuple(axis_names))
