"""Checkpoint / resume for block-engine states.

The reference has no checkpointing (SURVEY.md §5); its closest analogs are
seek and position tracking. The block engine's whole playback position IS a
state pytree, so checkpointing falls out naturally: save the pytree, resume
by re-building the (declarative, cheap) node graph and loading the state —
"resume at block k" exactly, including every filter tail, envelope, ring
index, and resampler phase.
"""
from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np


def save_state(path: str, state: Any, *, metadata: dict = None) -> None:
    """Save a state pytree to an .npz with its tree structure."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps({
            "treedef": str(treedef),
            "n_leaves": len(leaves),
            "metadata": metadata or {},
        }).encode(), dtype=np.uint8,
    )
    np.savez(path, **arrays)


def load_state(path: str, like: Any) -> Any:
    """Load a state saved by save_state into the structure of ``like``
    (the freshly-initialized state of the same graph)."""
    data = np.load(path)
    meta = json.loads(bytes(data["__treedef__"]).decode())
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    n = meta["n_leaves"]
    if n != len(like_leaves):
        raise ValueError(
            f"checkpoint has {n} leaves; graph state has {len(like_leaves)} "
            "(graph structure changed?)"
        )
    if meta.get("treedef") is not None and meta["treedef"] != str(treedef):
        raise ValueError(
            "checkpoint tree structure does not match graph state "
            "(graph restructured?):\n"
            f"  saved:   {meta['treedef']}\n"
            f"  current: {treedef}"
        )
    leaves = []
    for i, ref in enumerate(like_leaves):
        arr = data[f"leaf_{i}"]
        ref_arr = np.asarray(ref)
        if arr.shape != ref_arr.shape:
            raise ValueError(
                f"leaf {i} shape mismatch: {arr.shape} vs {ref_arr.shape}"
            )
        leaves.append(jax.numpy.asarray(arr.astype(ref_arr.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_metadata(path: str) -> dict:
    data = np.load(path)
    return json.loads(bytes(data["__treedef__"]).decode())["metadata"]
