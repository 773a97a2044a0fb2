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
        out[_join_path(path)] = np.asarray(leaf)
    return out


def _join_path(path: tuple) -> str:
    # Key entries vary by node registration: DictKey(.key), GetAttrKey(.name),
    # SequenceKey/FlattenedIndexKey(.idx/.key int) — normalize all to str.
    parts = []
    for p in path:
        for attr in ("key", "name", "idx"):
            if hasattr(p, attr):
                parts.append(str(getattr(p, attr)))
                break
        else:
            parts.append(str(p))
    return "/".join(parts)


def unflatten_params(template: Any, flat: dict[str, np.ndarray]) -> Any:
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = _join_path(path)
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


def save_train_state(path: str | Path, state: Any) -> None:
    """Full-state autosave (params + optimizer state + step) so an unattended
    training chain can resume after a dead session with the LR schedule and
    Adam moments intact (VERDICT r3 weak #4: params-only autosaves forced a
    restart from step 0). Works on any pytree; written atomically."""
    path = Path(path)
    # np.savez appends ".npz" to names that lack it, so the temp file must
    # keep the extension for the atomic-rename dance to work.
    tmp = path.with_name(path.stem + ".tmp.npz")
    np.savez_compressed(tmp, **flatten_params(state))
    tmp.replace(path)


def load_train_state(path: str | Path, template: Any) -> Any:
    with np.load(path) as data:
        return unflatten_params(template, dict(data))
