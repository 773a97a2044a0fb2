"""Torch ``.pth`` -> flax npz checkpoint conversion for FlowFormerCov.

The reference ships torch ``state_dict`` checkpoints (consumed via
``load_ddp_state_dict`` with ``module.`` prefix stripping,
Module/Network/FlowFormerCov/flownet.py:46-53). This module converts the
blocks whose architecture matches this repo's flax re-implementation
one-to-one — the in-tree covariance branch (covhead.py:8-43: SepConvGRU,
4-conv CovHead, 2-conv mask head) and any plain Conv/Dense stacks — into the
flat npz pytree format of ``weights.py``.

Scope note: blocks re-designed for TPU (window-8 Twins attention, linear
positional encoding, matmul cost sampling) have IDENTICAL parameter shapes in
most places but deliberately different computation; converting their weights
is possible but produces different activations — only the cov-branch mapping
below is activation-parity-tested (tests/test_torch_convert.py).

Weight layout conventions:
* torch Conv2d ``(out, in, kh, kw)`` -> flax ``(kh, kw, in, out)``
* torch Linear ``(out, in)``          -> flax ``(in, out)``
* biases carry over unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np


def strip_ddp_prefix(state: Mapping[str, Any]) -> dict[str, Any]:
    """Strip the ``module.`` DataParallel prefix (flownet.py:46-53)."""
    return {(k[7:] if k.startswith("module.") else k): v for k, v in state.items()}


def _to_numpy(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _join(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def convert_conv(state: Mapping[str, Any], torch_name: str) -> dict[str, np.ndarray]:
    """One torch Conv2d -> flax {'kernel','bias'} dict."""
    w = _to_numpy(state[f"{torch_name}.weight"])
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if f"{torch_name}.bias" in state:
        out["bias"] = _to_numpy(state[f"{torch_name}.bias"])
    return out


def convert_linear(state: Mapping[str, Any], torch_name: str) -> dict[str, np.ndarray]:
    w = _to_numpy(state[f"{torch_name}.weight"])
    out = {"kernel": np.transpose(w, (1, 0))}
    if f"{torch_name}.bias" in state:
        out["bias"] = _to_numpy(state[f"{torch_name}.bias"])
    return out


# SepConvGRU layer naming: torch convz1/convr1/convq1 (1x5 horizontal) and
# convz2/convr2/convq2 (5x1 vertical) -> flax h_z/h_r/h_q/v_z/v_r/v_q
# (reference: PWCNet/pwc_cov/gru.py:90-120; consumed by covhead.py:29).
_GRU_MAP = {
    "convz1": "h_z", "convr1": "h_r", "convq1": "h_q",
    "convz2": "v_z", "convr2": "v_r", "convq2": "v_q",
}


def convert_sepconv_gru(state: Mapping[str, Any], prefix: str) -> dict[str, Any]:
    return {ours: convert_conv(state, _join(prefix, theirs)) for theirs, ours in _GRU_MAP.items()}


def convert_cov_head(state: Mapping[str, Any], prefix: str) -> dict[str, Any]:
    """4-conv CovHead (covhead.py:8-21)."""
    return {f"conv{i}": convert_conv(state, _join(prefix, f"conv{i}")) for i in range(1, 5)}


def convert_mask_head(state: Mapping[str, Any], prefix: str) -> dict[str, Any]:
    """nn.Sequential(Conv 3x3, ReLU, Conv 1x1) mask head (covhead.py:33-37):
    sequential indices 0 and 2 -> conv1/conv2."""
    return {
        "conv1": convert_conv(state, _join(prefix, "0")),
        "conv2": convert_conv(state, _join(prefix, "2")),
    }


def convert_cov_update_block(state: Mapping[str, Any], prefix: str = "memory_decoder.cov_update") -> dict[str, Any]:
    """The full in-tree CovUpdateBlock (covhead.py:24-43) -> the flax decoder
    iteration's cov branch: {cov_gru, cov_head, cov_mask} subtrees."""
    return {
        "cov_gru": convert_sepconv_gru(state, _join(prefix, "gru")),
        "cov_head": convert_cov_head(state, _join(prefix, "cov_head")),
        "cov_mask": convert_mask_head(state, _join(prefix, "mask")),
    }


def convert_cov_branch_tree(state: Mapping[str, Any],
                            prefix: str = "memory_decoder.cov_update") -> dict[str, Any]:
    """Cov branch placed at the flax model's ACTUAL parameter paths: the mask
    head lives once at memory_decoder/cov_mask (applied after the scan), while
    the GRU + head are scanned per-iteration under memory_decoder/iteration
    (decoder refactor: decoder.py MemoryCovDecoder)."""
    block = convert_cov_update_block(state, prefix)
    cov_mask = block.pop("cov_mask")
    return {"memory_decoder": {"cov_mask": cov_mask, "iteration": block}}


def load_torch_checkpoint(path: str | Path) -> dict[str, Any]:
    """Load a .pth state dict (weights_only, DDP prefix stripped)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return strip_ddp_prefix(state)


def convert_cov_branch_pth(pth_path: str | Path, npz_path: str | Path,
                           prefix: str = "memory_decoder.cov_update") -> dict[str, np.ndarray]:
    """CLI-facing: .pth -> npz containing the cov branch under the flax
    decoder-iteration paths (mergeable into a full checkpoint)."""
    from .weights import flatten_params

    state = load_torch_checkpoint(pth_path)
    tree = convert_cov_branch_tree(state, prefix)
    flat = flatten_params(tree)
    np.savez_compressed(npz_path, **flat)
    return flat


def merge_into_params(params: Any, subtree: Mapping[str, Any]) -> Any:
    """Recursively overwrite matching paths of ``params`` with ``subtree``
    (shape-checked)."""

    def rec(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"converted path '{path}/{k}' not in model params")
            if isinstance(v, Mapping):
                out[k] = rec(dst[k], v, f"{path}/{k}")
            else:
                arr = np.asarray(v)
                if tuple(arr.shape) != tuple(np.shape(dst[k])):
                    raise ValueError(
                        f"'{path}/{k}': converted {arr.shape} != model {np.shape(dst[k])}")
                out[k] = arr.astype(np.asarray(dst[k]).dtype)
        return out

    return rec(params, subtree)
