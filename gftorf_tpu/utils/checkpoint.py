"""Pytree checkpointing via npz (keys = tree paths).

Replaces the reference's torch.save of GaussianModel.capture()
(gaussian_model.py:75-121, train.py:480-482). The full training state
(params, aux, Adam moments, deform MLP, step counters) round-trips
losslessly; resuming re-jits and continues bit-identically given the
same seed stream.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[dict, Any]:
    leaves, treedef = jax.tree.flatten(tree)
    return {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}, treedef


def save_pytree(path: str, tree, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays, _ = _flatten(tree)
    if meta:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    np.savez(path, **arrays)


def load_pytree(path: str, like) -> Tuple[Any, dict]:
    """Load into the structure of `like` (a template pytree)."""
    data = np.load(path, allow_pickle=False)
    meta = {}
    if "__meta__" in data:
        meta = json.loads(bytes(data["__meta__"]).decode())
    leaves, treedef = jax.tree.flatten(like)
    out = []
    for i, template in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        out.append(arr)
    return jax.tree.unflatten(treedef, out), meta
