"""Match visualization.

Re-implementation of make_matching_figure (reference:
model/loftr_src/utils/plotting.py:22-156): side-by-side pair with match lines,
error-colormapped when GT is available, dynamic alpha by match count.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def error_colors(errs: np.ndarray, thr: float, alpha: float = 1.0):
    """Green->red by err/(2*thr) (plotting.py:9-19)."""
    x = 1.0 - np.clip(errs / (thr * 2), 0, 1)
    c = np.clip(np.stack([2 - x * 2, x * 2, np.zeros_like(x)], -1), 0, 1)
    return np.concatenate([c, np.full_like(c[:, :1], alpha)], -1)


def dynamic_alpha(n: int) -> float:
    """Fewer lines -> more opaque (plotting.py:139-156 semantics)."""
    if n == 0:
        return 1.0
    milestones = [(0, 1.0), (300, 0.4), (1000, 0.1), (2000, 0.02)]
    for (a, va), (b_, vb) in zip(milestones[:-1], milestones[1:]):
        if n <= b_:
            return va + (n - a) / (b_ - a) * (vb - va)
    return 0.02


def make_matching_figure(
    img0: np.ndarray,
    img1: np.ndarray,
    mkpts0: np.ndarray,
    mkpts1: np.ndarray,
    color: Optional[np.ndarray] = None,
    text: Optional[list] = None,
    path: Optional[str] = None,
    dpi: int = 75,
):
    """Returns a matplotlib figure (or writes it to ``path``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 6), dpi=dpi)
    for ax, im in zip(axes, (img0, img1)):
        ax.imshow(im, cmap="gray")
        ax.get_yaxis().set_ticks([])
        ax.get_xaxis().set_ticks([])
    fig.tight_layout(pad=1)

    if len(mkpts0) > 0:
        if color is None:
            a = dynamic_alpha(len(mkpts0))
            color = np.tile([0.0, 1.0, 0.0, a], (len(mkpts0), 1))
        fig.canvas.draw()
        tf = fig.transFigure.inverted()
        f0 = tf.transform(axes[0].transData.transform(mkpts0))
        f1 = tf.transform(axes[1].transData.transform(mkpts1))
        fig.lines = [
            matplotlib.lines.Line2D((f0[i, 0], f1[i, 0]),
                                    (f0[i, 1], f1[i, 1]),
                                    transform=fig.transFigure,
                                    c=color[i], linewidth=1)
            for i in range(len(mkpts0))
        ]
        axes[0].scatter(mkpts0[:, 0], mkpts0[:, 1], c=color, s=4)
        axes[1].scatter(mkpts1[:, 0], mkpts1[:, 1], c=color, s=4)

    if text:
        axes[0].text(0.01, 0.99, "\n".join(text),
                     transform=axes[0].transAxes, fontsize=15, va="top",
                     ha="left", color="k",
                     bbox=dict(boxstyle="round", fc="w", alpha=0.8))
    if path:
        fig.savefig(path, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
        return None
    return fig
