"""Matplotlib figure builders (reference: Utility/Visualize/Matplotlib_Visualize.py:37-328).

Grid figures for matcher / stereo / full-pipeline outputs plus trajectory
plots, saved as numbered PNGs through the gated registry (viz/interface.py).
"""

from __future__ import annotations

import numpy as np

from .interface import fig_plt
from .plot_axes import flow_to_color, plot_correspondences, plot_scalar_map


def _np(x):
    return None if x is None else np.asarray(x)


def _save_or_show(fig, save_path):
    import matplotlib.pyplot as plt

    if save_path is not None:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return save_path


@fig_plt.register
def plot_imatcher(match_out, frame0, frame1, mode=None, save_path=None):
    """Flow / flow-cov grid (reference: Matplotlib_Visualize.py plot_imatcher)."""
    import matplotlib.pyplot as plt

    flow = _np(match_out.flow)[0]
    cov = _np(match_out.cov)
    fig, axes = plt.subplots(2, 2, figsize=(10, 6))
    axes[0, 0].imshow(_np(frame0.imageL)[0])
    axes[0, 0].set_title("image t")
    axes[0, 0].axis("off")
    axes[0, 1].imshow(_np(frame1.imageL)[0])
    axes[0, 1].set_title("image t+1")
    axes[0, 1].axis("off")
    axes[1, 0].imshow(flow_to_color(flow))
    axes[1, 0].set_title("flow")
    axes[1, 0].axis("off")
    if cov is not None:
        plot_scalar_map(axes[1, 1], cov[0, ..., 0] + cov[0, ..., 1], "flow cov (tr)")
    else:
        axes[1, 1].axis("off")
    return _save_or_show(fig, save_path)


@fig_plt.register
def plot_istereo(depth_out, frame, mode=None, save_path=None):
    """Depth / depth-cov grid (reference: plot_istereo)."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].imshow(_np(frame.imageL)[0])
    axes[0].set_title("imageL")
    axes[0].axis("off")
    plot_scalar_map(axes[1], _np(depth_out.depth)[0, ..., 0], "depth", cmap="turbo")
    if depth_out.cov is not None:
        plot_scalar_map(axes[2], np.log10(np.maximum(_np(depth_out.cov)[0, ..., 0], 1e-9)),
                        "log10 depth cov")
    else:
        axes[2].axis("off")
    return _save_or_show(fig, save_path)


@fig_plt.register
def plot_macvo(obs: dict, frame0, frame1, mode=None, save_path=None):
    """Tracked-keypoint correspondence overlay (reference: plot_macvo)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 5))
    plot_correspondences(
        ax, _np(frame0.imageL)[0], _np(frame1.imageL)[0],
        _np(obs["pixel1_uv"]), _np(obs["pixel2_uv"]),
    )
    return _save_or_show(fig, save_path)


@fig_plt.register
def plot_trajectory(trajectories: dict, mode=None, save_path=None):
    """Top-down (x-y) trajectory comparison (reference: Utility/Plot/PlotTraj.py)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    for name, poses in trajectories.items():
        poses = _np(poses)
        ax.plot(poses[:, 0], poses[:, 1], label=name, lw=1.2)
    ax.set_aspect("equal")
    ax.legend()
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    return _save_or_show(fig, save_path)
