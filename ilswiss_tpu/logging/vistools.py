"""Plotting / video utilities.

Rebuild of the reference visualization helpers (rlkit/core/vistools.py,
630 LoC of matplotlib/seaborn plots, + run_scripts/video.py's mp4
writer): learning-curve plots straight from `progress.csv`, return
histograms, and rollout-video export via imageio.
"""

from __future__ import annotations

import csv
import os
from typing import Iterable, Sequence

import numpy as np


def _load_progress(csv_path: str) -> dict:
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    cols: dict = {}
    for row in rows:
        for k, v in row.items():
            try:
                cols.setdefault(k, []).append(float(v))
            except (TypeError, ValueError):
                pass
    return {k: np.asarray(v) for k, v in cols.items()}


def plot_learning_curves(csv_paths: Sequence[str], key: str,
                         labels: Sequence[str] | None = None,
                         x_key: str = "Epoch",
                         save_path: str = "curve.png",
                         title: str | None = None) -> str:
    """Reference plot_returns_on_same_plot equivalent
    (vistools.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for i, path in enumerate(csv_paths):
        cols = _load_progress(path)
        if key not in cols:
            continue
        x = cols.get(x_key, np.arange(len(cols[key])))
        label = labels[i] if labels else os.path.basename(
            os.path.dirname(path))
        ax.plot(x[: len(cols[key])], cols[key], label=label)
    ax.set_xlabel(x_key)
    ax.set_ylabel(key)
    if title:
        ax.set_title(title)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def plot_histogram(values: Iterable[float], save_path: str,
                   title: str = "") -> str:
    """Reference plot_histogram (vistools.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(np.asarray(list(values)), bins=40)
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def save_video(frames: np.ndarray, save_path: str, fps: int = 30) -> str:
    """[T, H, W, C] uint8/float frames -> mp4/gif (reference
    run_scripts/video.py:12-29, skvideo replaced by imageio; falls back
    to gif when no ffmpeg backend is installed)."""
    import imageio

    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    if frames.shape[-1] == 1:
        frames = np.repeat(frames, 3, axis=-1)
    try:
        imageio.mimwrite(save_path, list(frames), fps=fps)
    except (ValueError, OSError):
        save_path = os.path.splitext(save_path)[0] + ".gif"
        imageio.mimwrite(save_path, list(frames), fps=fps)
    return save_path
