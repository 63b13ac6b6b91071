"""Checkpoint / resume for odometry state.

The reference has no checkpointing (SURVEY.md §5) — its nearest analog
is trajectory text output. Long TPU odometry runs (full KITTI sequences)
want resumable state, and every piece of state here is a pytree of
arrays (pose, voxel-map arrays, trajectory), so checkpointing is one
flatten + savez. Static pytree structure (capacities, flags) comes from
a template at load time, which also guards against resuming with a
mismatched configuration.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Serialize a pytree of arrays to an .npz file."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_pytree(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_pytree.

    `template` supplies the pytree structure (and static fields of
    flax.struct dataclasses); its array leaves are replaced by the
    checkpoint's. Raises if the leaf count or any shape/dtype disagrees —
    i.e. the checkpoint was written with a different configuration.
    """
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    saved_str = bytes(data["__treedef__"]).decode()
    if saved_str != str(treedef):
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  saved:    {saved_str}\n  template: {treedef}"
        )
    n = len(leaves)
    new_leaves = []
    for i, tmpl in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        tmpl = np.asarray(tmpl)
        if arr.shape != tmpl.shape or arr.dtype != tmpl.dtype:
            raise ValueError(
                f"leaf {i}: checkpoint {arr.shape}/{arr.dtype} vs "
                f"template {tmpl.shape}/{tmpl.dtype}"
            )
        new_leaves.append(arr)
    if n != sum(1 for k in data.files if k.startswith("leaf_")):
        raise ValueError("checkpoint leaf count mismatch")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_odometry_state(path: str, odom) -> None:
    """Snapshot an odometry engine's resumable state (pose, map/prev
    cloud, trajectory so far)."""
    state = {
        "T_world": odom.T_world,
        "traj": np.stack(odom.traj) if odom.traj else np.zeros((0, 4, 4)),
    }
    if hasattr(odom, "voxelmap"):
        state["voxelmap"] = odom.voxelmap
    if getattr(odom, "_prev", None) is not None:
        state["prev"] = odom._prev
    if getattr(odom, "_prev_map", None) is not None:
        state["prev_map"] = odom._prev_map
    save_pytree(path, state)


def load_odometry_state(path: str, odom) -> None:
    """Restore state saved by save_odometry_state into a freshly
    constructed engine of the same type and parameters."""
    template = {
        "T_world": odom.T_world,
        "traj": np.zeros((0, 4, 4)),
    }
    if hasattr(odom, "voxelmap"):
        template["voxelmap"] = odom.voxelmap
    if getattr(odom, "_prev", None) is not None:
        template["prev"] = odom._prev
    if getattr(odom, "_prev_map", None) is not None:
        template["prev_map"] = odom._prev_map

    # The trajectory length is unknown to the template, so load_pytree's
    # blanket shape check can't be used — but every OTHER leaf is
    # fixed-shape and must match, or a wrong-capacity checkpoint
    # surfaces later as an opaque XLA shape error instead of a clean
    # ValueError here. Validate per-leaf, exempting only `traj`.
    data = np.load(path)
    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    saved = [data[f"leaf_{i}"] for i in range(len(
        [k for k in data.files if k.startswith("leaf_")]
    ))]
    if len(saved) != len(path_leaves):
        raise ValueError(
            "checkpoint/template mismatch — construct the engine with the "
            "same parameters and warm state (e.g. first frame) as when saving"
        )
    saved_str = bytes(data["__treedef__"]).decode()
    if saved_str != str(treedef):
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  saved:    {saved_str}\n  template: {treedef}"
        )
    for i, (kp, tmpl) in enumerate(path_leaves):
        if any(getattr(p, "key", None) == "traj" for p in kp):
            if saved[i].ndim != 3 or saved[i].shape[1:] != (4, 4):
                raise ValueError(
                    f"trajectory leaf has shape {saved[i].shape}, "
                    "expected [F,4,4]"
                )
            continue
        tmpl = np.asarray(tmpl)
        if saved[i].shape != tmpl.shape or saved[i].dtype != tmpl.dtype:
            raise ValueError(
                f"checkpoint leaf {i} ({jax.tree_util.keystr(kp)}): saved "
                f"{saved[i].shape}/{saved[i].dtype} vs engine "
                f"{tmpl.shape}/{tmpl.dtype} — construct the engine with "
                "the same parameters (e.g. map_capacity) as when saving"
            )
    restored = jax.tree_util.tree_unflatten(treedef, saved)
    odom.T_world = jax.numpy.asarray(restored["T_world"])
    odom.traj = [p for p in restored["traj"]]
    if "voxelmap" in restored:
        odom.voxelmap = restored["voxelmap"]
        odom._first = len(odom.traj) == 0
    if "prev" in restored:
        odom._prev = restored["prev"]
    if "prev_map" in restored:
        odom._prev_map = restored["prev_map"]
