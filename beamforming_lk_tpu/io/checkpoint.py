"""Checkpoint / resume of pipeline state.

The reference has none: ``Pipeline::save_pipeline`` is a stub with the
write commented out (``src/fpga/pipeline.cpp:300-315``), and a restart
loses ring history, tracker swarm state and track stores.  Here any state
pytree (AwpuState, SwarmState, fusion tracks) round-trips through a single
``.npz`` file — no extra dependencies, works for sharded arrays (they are
gathered on save and re-placed by the caller's sharding on load).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_state(path: str, tree: Any) -> None:
    """Serialize a state pytree to ``path`` (.npz)."""
    arrays, _ = _flatten_with_paths(tree)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template: Any) -> Any:
    """Load a pytree saved by :func:`save_state`, shaped like ``template``.

    Leaves are matched by tree structure (template order); dtypes/shapes
    must agree with what was saved.
    """
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path_elems, leaf in flat:
        key = "/".join(str(p) for p in path_elems)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        saved = data[key]
        want = np.shape(leaf)
        if tuple(saved.shape) != tuple(want):
            raise ValueError(
                f"checkpoint leaf {key!r} shape {saved.shape} != {want}"
            )
        leaves.append(saved)
    return jax.tree_util.tree_unflatten(treedef, leaves)
