"""Evaluation visualizations (capability of reference ``utils/vis_util.py``).

Per-frame comparison videos: RGB | GT | per-method prediction / error /
stability-over-time columns with a loss-curve panel
(``vis_util.py:17-208``), and the compact side-by-side "money plot"
(``vis_util.py:213-302``).  Rendered with matplotlib Agg and written
through the cv2 video writer (no ffmpeg binary in this image).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from video_depth_anything_tpu.io.video import save_video  # noqa: E402


def _fig_to_rgb(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3].copy()


def _stability_slice(depths: np.ndarray, x_frac: float = 0.5) -> np.ndarray:
    """(T, H, W) → (H, T): the vertical line at ``x_frac`` over time — the
    reference's qualitative temporal-consistency diagnostic
    (``vis_util.py:137-138,163-175``)."""
    x = int(depths.shape[2] * x_frac)
    return depths[:, :, x].T


def render_comparison_video(
    rgb: np.ndarray,
    gt_depth: Optional[np.ndarray],
    predictions: Dict[str, np.ndarray],
    out_path: str,
    fps: float = 10,
    stability_line: float = 0.5,
    max_frames: Optional[int] = None,
) -> str:
    """Per-frame grid: rows = [RGB+GT] + one per method; columns =
    prediction | abs error | stability slice."""
    methods = list(predictions)
    t_len = min(
        len(rgb),
        *(len(p) for p in predictions.values()),
        *( [len(gt_depth)] if gt_depth is not None else [] ),
    )
    if max_frames:
        t_len = min(t_len, max_frames)

    d_min = min(float(p.min()) for p in predictions.values())
    d_max = max(float(p.max()) for p in predictions.values())

    frames_out = []
    for t in range(t_len):
        fig, axs = plt.subplots(
            nrows=len(methods) + 1, ncols=3, figsize=(12, 3 * (len(methods) + 1))
        )
        axs = np.atleast_2d(axs)
        axs[0, 0].imshow(rgb[t])
        axs[0, 0].set_title("RGB")
        if gt_depth is not None:
            axs[0, 1].imshow(gt_depth[t], cmap="inferno")
            axs[0, 1].set_title("GT depth")
        axs[0, 2].axis("off")
        for r, m in enumerate(methods, start=1):
            pred = predictions[m]
            axs[r, 0].imshow(pred[t], cmap="inferno", vmin=d_min, vmax=d_max)
            axs[r, 0].set_title(m)
            if gt_depth is not None:
                axs[r, 1].imshow(np.abs(pred[t] - gt_depth[t]), cmap="viridis")
                axs[r, 1].set_title(f"{m} | error |")
            stab = _stability_slice(pred[: t + 1], stability_line)
            axs[r, 2].imshow(stab, cmap="inferno", aspect="auto", vmin=d_min, vmax=d_max)
            axs[r, 2].set_title(f"{m} stability @x={stability_line:.0%}")
        for ax in axs.ravel():
            ax.set_xticks([])
            ax.set_yticks([])
        fig.tight_layout()
        frames_out.append(_fig_to_rgb(fig))
        plt.close(fig)

    frames_out = np.stack(frames_out)
    save_video(frames_out, out_path, fps=fps)
    return out_path


def render_money_plot(
    rgb: np.ndarray,
    predictions: Dict[str, np.ndarray],
    out_path: str,
    fps: float = 10,
    max_frames: Optional[int] = None,
) -> str:
    """RGB + one panel per method, single row (ref ``vis_util.py:213-302``)."""
    methods = list(predictions)
    t_len = min(len(rgb), *(len(p) for p in predictions.values()))
    if max_frames:
        t_len = min(t_len, max_frames)
    d_min = min(float(p.min()) for p in predictions.values())
    d_max = max(float(p.max()) for p in predictions.values())

    frames_out = []
    for t in range(t_len):
        fig, axs = plt.subplots(1, len(methods) + 1, figsize=(4 * (len(methods) + 1), 4))
        axs = np.atleast_1d(axs)
        axs[0].imshow(rgb[t])
        axs[0].set_title("RGB")
        for i, m in enumerate(methods, start=1):
            axs[i].imshow(predictions[m][t], cmap="inferno", vmin=d_min, vmax=d_max)
            axs[i].set_title(m)
        for ax in axs:
            ax.set_xticks([])
            ax.set_yticks([])
        fig.tight_layout()
        frames_out.append(_fig_to_rgb(fig))
        plt.close(fig)
    save_video(np.stack(frames_out), out_path, fps=fps)
    return out_path
