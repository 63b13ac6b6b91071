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

    Explicit shard_map + psum, not GSPMD auto-partitioning: each chip
    searches correspondences for its local source shard against the
    replicated target and contributes a partial (H, b, e, inliers, LM
    trial errors); align_impl psums them over the mesh axis
    (psum_axis), so every chip takes identical optimizer decisions —
    the collective analog of the OMP per-thread accumulator join
    (reduction_omp.hpp:32-58), with 43 floats + K trial errors per
    iteration as the ONLY inter-chip traffic. (The auto-partitioned
    form measured up to 5.5x replicated-work overhead on the virtual
    mesh — apps/scaling_benchmark.py — which explicit collectives
    eliminate.)
    """
    axis = mesh.axis_names[0]
    n = source.points.shape[0]
    n_dev = int(np.prod(list(mesh.shape.values())))
    if n % n_dev != 0:
        raise ValueError(
            f"source capacity {n} must be a multiple of the mesh size "
            f"{n_dev} (pad the cloud with PointCloud.with_capacity)"
        )
    try:  # moved to jax.shard_map in newer JAX
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def fn(t, s, T0):
        # Per-shard valid prefix: global validity is a row prefix, so
        # shard k's local count is clamp(num_points - k*rows, 0, rows).
        rows = s.points.shape[0]
        k = jax.lax.axis_index(axis)
        local_num = jnp.clip(
            s.num_points - k.astype(jnp.int32) * rows, 0, rows
        ).astype(jnp.int32)
        s = s.replace(num_points=local_num)
        return align_impl(
            t, s, None, T0, use_fused="never", psum_axis=axis, **kwargs
        )

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(), target),
        # shard array leaves on their first axis; num_points replicated
        jax.tree_util.tree_map(lambda _: P(axis), source).replace(
            num_points=P()
        ),
        P(),
    )
    init_T = jnp.asarray(init_T)
    out_specs = jax.tree_util.tree_map(
        lambda _: P(),
        jax.eval_shape(
            lambda t, s, T0: align_impl(
                t, s, None, T0, use_fused="never", **kwargs
            ),
            target, source, init_T,
        ),
    )
    try:
        fn_sharded = shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older JAX spelling
        fn_sharded = shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )
    return jax.jit(fn_sharded)(target, source, init_T)


def stack_clouds(clouds) -> PointCloud:
    """Stack same-capacity PointClouds into one batched pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *clouds)
