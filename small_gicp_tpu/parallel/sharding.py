"""Multi-chip scaling: batched and point-sharded registration.

The reference's parallelism is intra-process OpenMP/TBB over factors
(registration/reduction_omp.hpp:21-73, reduction_tbb.hpp:11-139). The
TPU equivalents, per SURVEY.md §2/§5:

  * **Batch (data) parallel** — [B] independent scan pairs vmapped and
    sharded over a device mesh axis; embarrassingly parallel, one result
    gather. The analog of the reference's TBB flow-graph throughput mode
    (odometry_benchmark_small_gicp_tbb_flow.cpp:56-141).
  * **Point (sequence) parallel** — ONE registration whose source point
    axis is sharded across chips. The per-thread (H,b,e) accumulator +
    join pattern of reduction_omp.hpp:32-58 maps 1:1 to XLA's psum over
    ICI: each chip linearizes its point shard, the 6x6+6+1 reduction is
    the only collective (43 floats — tiny).

Both are expressed as shardings on the SAME jitted align function
(models/registration.py): GSPMD inserts the collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from small_gicp_tpu.point_cloud import PointCloud
from small_gicp_tpu.models.registration import RegistrationResult, align_impl


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the first `num_devices` devices."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def _batched_align_fn(**static_kwargs):
    """vmap align_impl over (target, source, init_T). Safe because the
    optimizer loop bodies are masked no-ops for inactive lanes (see
    models/registration.py). The fused Pallas search+linearize kernel
    batches under vmap (its SMEM operands are 2-D so the auto-batching
    rule can add a leading grid axis — ops/gicp_fused_pallas.py), so
    lanes keep the single-kernel-per-iteration fast path."""

    def one(target, source, init_T):
        return align_impl(target, source, None, init_T, **static_kwargs)

    return jax.vmap(one)


def align_batch(
    targets: PointCloud,
    sources: PointCloud,
    init_Ts: jax.Array,
    mesh: Optional[Mesh] = None,
    **kwargs,
) -> RegistrationResult:
    """Register B scan pairs at once.

    Args:
      targets/sources: PointCloud pytrees with a leading batch axis
        ([B,N,4] points, [B] num_points, ...).
      init_Ts: [B,4,4] initial guesses.
      mesh: optional 1-D mesh; the batch axis is sharded across it.
      kwargs: static align options (registration_type, optimizer, ...).

    Returns a RegistrationResult with leading [B] axis.
    """
    fn = _batched_align_fn(**kwargs)
    if mesh is None:
        return jax.jit(fn)(targets, sources, init_Ts)

    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))

    def shard_cloud(c: PointCloud):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard), c
        )

    targets = shard_cloud(targets)
    sources = shard_cloud(sources)
    init_Ts = jax.device_put(init_Ts, shard)

    # shard_map, not bare GSPMD: pallas_call is opaque to the SPMD
    # partitioner, so sharded lanes must be split into per-device vmapped
    # calls explicitly — each device runs the fused kernels on its local
    # lane block, zero collectives (lanes are independent).
    try:  # moved to jax.shard_map in newer JAX
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    in_specs = jax.tree_util.tree_map(
        lambda _: P(axis), (targets, sources, init_Ts)
    )
    out_specs = jax.tree_util.tree_map(
        lambda _: P(axis), jax.eval_shape(fn, targets, sources, init_Ts)
    )
    try:
        # check_vma=False: the optimizer's while_loop carry starts from
        # unvarying literals (eye/zeros), which the varying-manual-axes
        # checker rejects against the varying loop outputs; lanes are
        # independent, so the check buys nothing here.
        sharded_fn = shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older JAX spelling
        sharded_fn = shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )
    return jax.jit(sharded_fn)(targets, sources, init_Ts)


def align_point_sharded(
    target: PointCloud,
    source: PointCloud,
    init_T: jax.Array,
    mesh: Mesh,
    **kwargs,
) -> RegistrationResult:
    """One registration with the SOURCE point axis sharded across chips.

    The target is replicated; each chip searches correspondences for its
    source shard and contributes a partial (H, b, e); GSPMD reduces them
    with a psum over ICI (the collective analog of the OMP per-thread
    accumulator join, reduction_omp.hpp:32-58).
    """
    axis = mesh.axis_names[0]
    point_shard = NamedSharding(mesh, P(axis))  # shard axis 0 = points
    repl = NamedSharding(mesh, P())

    source = source.replace(
        points=jax.device_put(source.points, point_shard),
        normals=None
        if source.normals is None
        else jax.device_put(source.normals, point_shard),
        covs=None if source.covs is None else jax.device_put(source.covs, point_shard),
        num_points=jax.device_put(source.num_points, repl),
    )
    target = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), target)
    init_T = jax.device_put(jnp.asarray(init_T), repl)

    def fn(t, s, T0):
        # use_fused="never": like _batched_align_fn above, the fused
        # Pallas kernel's pallas_call cannot be partitioned by GSPMD
        # along the sharded point axis — on a TPU mesh the auto-routing
        # would otherwise either fail to compile or silently all-gather
        # the source onto every chip.
        return align_impl(t, s, None, T0, use_fused="never", **kwargs)

    return jax.jit(fn)(target, source, init_T)


def stack_clouds(clouds) -> PointCloud:
    """Stack same-capacity PointClouds into one batched pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *clouds)
