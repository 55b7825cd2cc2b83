"""Checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5): its state is the
user-owned coordinate matrix (mutated in place, reference SVGD.hpp:393) plus
optimizer moments. Here the whole SVGD state is one pytree
{coords, opt_state, kernel_params, model_params}, saved as a portable,
dependency-free .npz + JSON metadata. Arrays are gathered to host first —
single-process only; on a multi-host pod, checkpoint per host or use orbax
directly on the state pytree.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def _flatten_with_paths(tree) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path
        )
        # No host conversion here: restore passes GLOBAL (non-addressable)
        # exemplar leaves through this just to enumerate keys; save converts
        # via _to_host before flattening.
        flat[key] = leaf
    return flat


def _to_host(x):
    """Fetch a leaf to host memory.

    Multi-process global arrays (shards on non-addressable devices) are
    materialized with a cross-process allgather so every process holds the
    full logical array — the standard shared-filesystem checkpoint shape.
    """
    if (
        hasattr(x, "sharding")
        and not getattr(x.sharding, "is_fully_addressable", True)
    ):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def save_checkpoint(path, state, step: int = 0):
    """Save an SVGD state pytree + step counter to ``<path>.npz``/``.json``.

    Device/sharded arrays are gathered to host first; in a multi-process
    run every process participates in the gather but only process 0 writes
    (shared filesystem assumed, as with orbax).
    """
    path = Path(path)
    host_state = jax.tree.map(_to_host, state)
    if jax.process_index() == 0:
        path.parent.mkdir(parents=True, exist_ok=True)
        flat = _flatten_with_paths(host_state)
        np.savez(str(path.with_suffix(".npz")), **flat)
        treedef = jax.tree_util.tree_structure(host_state)
        meta = {"step": int(step), "treedef": str(treedef), "keys": sorted(flat)}
        path.with_suffix(".json").write_text(json.dumps(meta))
    return str(path.with_suffix(".npz"))


def restore_checkpoint(path, state_like):
    """Restore into the structure of ``state_like``; returns (state, step).

    ``state_like`` provides the pytree structure (e.g. a freshly built
    initial state); leaves are replaced by the saved arrays.
    """
    path = Path(path)
    data = np.load(str(path.with_suffix(".npz")))
    meta = json.loads(path.with_suffix(".json").read_text())

    flat_like = _flatten_with_paths(state_like)
    missing = set(flat_like) - set(data.files)
    if missing:
        raise KeyError(f"checkpoint missing keys: {sorted(missing)}")

    leaves_paths = jax.tree_util.tree_flatten_with_path(state_like)
    restored_leaves = []
    for path_entry, leaf in leaves_paths[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path_entry
        )
        arr = data[key]
        # Keep the exemplar's MESH sharding for distributed leaves. Leaves
        # on a single device are left as host arrays (uncommitted): pinning
        # them to their exemplar device would conflict under jit with the
        # mesh-sharded leaves' device set.
        if (
            hasattr(leaf, "sharding")
            and len(leaf.sharding.device_set) > 1
        ):
            if getattr(leaf.sharding, "is_fully_addressable", True):
                arr = jax.device_put(arr, leaf.sharding)
            else:
                # Multi-process: every process loads the full logical array
                # and contributes its local rows.
                host = np.asarray(arr)
                arr = jax.make_array_from_callback(
                    host.shape, leaf.sharding, lambda idx, h=host: h[idx]
                )
        restored_leaves.append(arr)
    state = jax.tree_util.tree_unflatten(leaves_paths[1], restored_leaves)
    return state, int(meta["step"])
