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

from typing import Any, List

import jax
import numpy as np

# Bumped whenever the on-disk layout changes. v2 replaced the brittle
# str(treedef) equality check with per-leaf key-path names: treedef
# Python reprs are not stable across jax/flax versions, so a v1-style
# comparison hard-failed legitimate resumes after an environment
# upgrade. Key paths (rendered by _keystr below, NOT jax's keystr — its
# formatting is also version-dependent) identify each leaf by name, so
# structure checks survive repr churn while still catching real
# mismatches (different engine config, missing/renamed state).
SCHEMA_VERSION = 2


def _keystr(kp) -> str:
    """Version-stable rendering of a jax key path: the dict key /
    sequence index / attribute name at each level, joined by '/'."""
    parts: List[str] = []
    for p in kp:
        for attr in ("key", "idx", "name"):
            if hasattr(p, attr):
                parts.append(str(getattr(p, attr)))
                break
        else:
            parts.append(str(p))
    return "/".join(parts)


def _flatten_named(tree: Any):
    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    names = [_keystr(kp) for kp, _ in path_leaves]
    leaves = [x for _, x in path_leaves]
    return names, leaves, treedef


def save_pytree(path: str, tree: Any) -> None:
    """Serialize a pytree of arrays to an .npz file."""
    names, leaves, treedef = _flatten_named(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__schema_version__"] = np.asarray(SCHEMA_VERSION)
    arrays["__keypaths__"] = np.asarray(names)
    # Kept for human debugging only — never compared (repr is unstable
    # across jax versions).
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def _check_keypaths(data, template_names, template_treedef=None) -> None:
    """Raise with a name-level diff when the checkpoint's leaves don't
    match the template's. v1 checkpoints (no __keypaths__) get the
    leaf-count check plus a soft (warning-only) treedef-repr comparison
    — shape/dtype validation still runs downstream."""
    version = (
        int(data["__schema_version__"])
        if "__schema_version__" in data.files else 1
    )
    if version < 2:
        # Best-effort v1 check: leaf count is verified downstream, but a
        # v1 file with coincident leaf count/shapes and DIFFERENT
        # structure would unflatten silently into the wrong fields. The
        # old str(treedef) comparison survives as a soft warning (repr
        # churn across jax/flax versions is why it can't hard-fail).
        import warnings

        if "__treedef__" in data.files and template_treedef is not None:
            saved_repr = bytes(data["__treedef__"]).decode(errors="replace")
            if saved_repr != str(template_treedef):
                # Repr equality IS a structural check when it holds —
                # only warn when it doesn't (repr churn across jax/flax
                # versions is why this can't hard-fail).
                warnings.warn(
                    "v1 checkpoint: saved treedef repr DIFFERS from the "
                    "template's (may be jax version churn — verify the "
                    "engine config matches the one that saved this "
                    "file); structure otherwise verified only by leaf "
                    "count/shape/dtype",
                    stacklevel=3,
                )
        else:
            warnings.warn(
                "v1 checkpoint without treedef record: structure "
                "verified only by leaf count/shape/dtype",
                stacklevel=3,
            )
        return
    saved_names = [str(s) for s in data["__keypaths__"]]
    if saved_names != list(template_names):
        missing = sorted(set(template_names) - set(saved_names))
        extra = sorted(set(saved_names) - set(template_names))
        raise ValueError(
            "checkpoint structure mismatch (by leaf names):\n"
            f"  in engine but not checkpoint: {missing}\n"
            f"  in checkpoint but not engine: {extra}\n"
            "construct the engine with the same parameters and warm "
            "state as when saving"
        )


def load_pytree(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_pytree.

    `template` supplies the pytree structure (and static fields of
    flax.struct dataclasses); its array leaves are replaced by the
    checkpoint's. Raises if the leaf names, count, or any shape/dtype
    disagree — i.e. the checkpoint was written with a different
    configuration. Structure comparison is by per-leaf key paths, which
    survive jax/flax upgrades that change treedef reprs.
    """
    data = np.load(path)
    names, leaves, treedef = _flatten_named(template)
    _check_keypaths(data, names, treedef)
    n = len(leaves)
    if n != sum(1 for k in data.files if k.startswith("leaf_")):
        raise ValueError("checkpoint leaf count mismatch")
    new_leaves = []
    for i, (name, tmpl) in enumerate(zip(names, leaves)):
        arr = data[f"leaf_{i}"]
        tmpl = np.asarray(tmpl)
        if arr.shape != tmpl.shape or arr.dtype != tmpl.dtype:
            raise ValueError(
                f"leaf {i} ({name}): checkpoint {arr.shape}/{arr.dtype} "
                f"vs template {tmpl.shape}/{tmpl.dtype}"
            )
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_odometry_state(path: str, odom) -> None:
    """Snapshot an odometry engine's resumable state (pose, map/prev
    cloud, trajectory so far)."""
    state = {
        "T_world": odom.T_world,
        "traj": np.stack(odom.traj) if odom.traj else np.zeros((0, 4, 4)),
    }
    if hasattr(odom, "T_delta"):
        # Motion-prediction state: without it a resume under
        # predict_motion starts from an identity-velocity guess and the
        # resumed trajectory can diverge from the continuous run.
        state["T_delta"] = odom.T_delta
    if hasattr(odom, "voxelmap"):
        state["voxelmap"] = odom.voxelmap
    if hasattr(odom, "_first"):
        # Stored explicitly: inferring it from len(traj) at load time is
        # wrong for callers that drive estimate_frame() directly (traj is
        # only maintained by the estimate() wrapper).
        state["first"] = np.asarray(odom._first)
    if getattr(odom, "_prev", None) is not None:
        state["prev"] = odom._prev
    if getattr(odom, "_prev_map", None) is not None:
        state["prev_map"] = odom._prev_map
    save_pytree(path, state)


def load_odometry_state(path: str, odom) -> None:
    """Restore state saved by save_odometry_state into a freshly
    constructed engine of the same type and parameters.

    Backward compatible with checkpoints written before the optional
    T_delta / first-frame leaves existed: the template only includes an
    optional leaf when the CHECKPOINT carries it (by saved key-path
    name for v2; v1 checkpoints never have them), so old files keep
    loading and simply fall back to the inferred first-frame flag."""
    data = np.load(path)
    saved_names = (
        {str(s) for s in data["__keypaths__"]}
        if "__keypaths__" in data.files else None  # v1: no optional leaves
    )

    def saved_has(name):
        return saved_names is not None and name in saved_names

    template = {
        "T_world": odom.T_world,
        "traj": np.zeros((0, 4, 4)),
    }
    if hasattr(odom, "T_delta") and saved_has("T_delta"):
        template["T_delta"] = odom.T_delta
    if hasattr(odom, "voxelmap"):
        template["voxelmap"] = odom.voxelmap
    if hasattr(odom, "_first") and saved_has("first"):
        template["first"] = np.asarray(odom._first)
    if getattr(odom, "_prev", None) is not None:
        template["prev"] = odom._prev
    if getattr(odom, "_prev_map", None) is not None:
        template["prev_map"] = odom._prev_map

    # The trajectory length is unknown to the template, so load_pytree's
    # blanket shape check can't be used — but every OTHER leaf is
    # fixed-shape and must match, or a wrong-capacity checkpoint
    # surfaces later as an opaque XLA shape error instead of a clean
    # ValueError here. Validate per-leaf, exempting only `traj`.
    names, _, treedef = _flatten_named(template)
    path_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    saved = [data[f"leaf_{i}"] for i in range(len(
        [k for k in data.files if k.startswith("leaf_")]
    ))]
    if len(saved) != len(path_leaves):
        raise ValueError(
            "checkpoint/template mismatch — construct the engine with the "
            "same parameters and warm state (e.g. first frame) as when saving"
        )
    _check_keypaths(data, names)
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
    if "T_delta" in restored:
        odom.T_delta = jax.numpy.asarray(restored["T_delta"])
    if "voxelmap" in restored:
        odom.voxelmap = restored["voxelmap"]
        odom._first = (
            bool(restored["first"]) if "first" in restored
            else len(odom.traj) == 0  # pre-v2 checkpoints
        )
    if "prev" in restored:
        odom._prev = restored["prev"]
    if "prev_map" in restored:
        odom._prev_map = restored["prev_map"]
