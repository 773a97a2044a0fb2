"""Parameter (de)serialization for the network families.

Checkpoints are flat ``npz`` archives keyed by ``/``-joined pytree paths —
the TPU-native replacement for the reference's torch ``.pth`` state dicts
with ``module.`` DataParallel prefix stripping (flownet.py:46-53): a flat
pytree needs no prefix hacks (SURVEY.md P4).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def flatten_params(params: Any) -> dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def unflatten_params(template: Any, flat: dict[str, np.ndarray]) -> Any:
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(p.key if hasattr(p, "key") else str(p.idx) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing parameter '{key}'")
        arr = flat[key]
        if arr.shape != leaf.shape:
            raise ValueError(f"parameter '{key}': checkpoint {arr.shape} != model {leaf.shape}")
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_params(path: str | Path, params: Any) -> None:
    np.savez_compressed(path, **flatten_params(params))


def load_params(path: str | Path, template: Any) -> Any:
    with np.load(path) as data:
        return unflatten_params(template, dict(data))
