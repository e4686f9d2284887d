"""Match visualization.

Serves the same role as the reference's match-figure logging (reference:
model/loftr_src/utils/plotting.py:22-156) with a different construction: the
two images are composited into one side-by-side canvas (numpy), and matches
are drawn as a single LineCollection in data coordinates — one axes, no
per-line figure-space transforms.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def error_colors(errs: np.ndarray, thr: float, alpha: float = 1.0):
    """Green->red by err/(2*thr) (plotting.py:9-19 color ramp)."""
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


def compose_pair(img0: np.ndarray, img1: np.ndarray, gap: int = 10):
    """Stack two grayscale images side by side on one canvas.

    Returns (canvas [H, W], x_offset of img1 on the canvas).
    """
    h = max(img0.shape[0], img1.shape[0])
    w = img0.shape[1] + gap + img1.shape[1]
    canvas = np.ones((h, w), np.float32)
    canvas[: img0.shape[0], : img0.shape[1]] = img0
    x1 = img0.shape[1] + gap
    canvas[: img1.shape[0], x1: x1 + img1.shape[1]] = img1
    return canvas, x1


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
    """Returns a matplotlib figure (or writes it to ``path`` and returns
    None). All drawing happens in the data coordinates of one composited
    canvas, so the segments need no figure-space transform gymnastics."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib.collections import LineCollection
    import matplotlib.pyplot as plt

    canvas, x1 = compose_pair(np.asarray(img0), np.asarray(img1))
    fig, ax = plt.subplots(
        figsize=(canvas.shape[1] / 100, canvas.shape[0] / 100), dpi=dpi)
    ax.imshow(canvas, cmap="gray", vmin=0, vmax=1)
    ax.set_axis_off()
    fig.subplots_adjust(left=0, right=1, top=1, bottom=0)

    n = len(mkpts0)
    if n:
        if color is None:
            color = np.broadcast_to(
                np.array([0.0, 1.0, 0.0, dynamic_alpha(n)]), (n, 4))
        p0 = np.asarray(mkpts0, np.float64)
        p1 = np.asarray(mkpts1, np.float64) + np.array([x1, 0.0])
        segments = np.stack([p0, p1], axis=1)          # [n, 2, 2]
        ax.add_collection(LineCollection(segments, colors=color,
                                         linewidths=1))
        ax.scatter(p0[:, 0], p0[:, 1], c=color, s=4)
        ax.scatter(p1[:, 0], p1[:, 1], c=color, s=4)

    if text:
        ax.annotate("\n".join(text), xy=(0.01, 0.99),
                    xycoords="axes fraction", fontsize=15, va="top",
                    ha="left", color="k",
                    bbox=dict(boxstyle="round", fc="w", alpha=0.8))
    if path:
        fig.savefig(path, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
        return None
    return fig


def make_geo_window_figure(
    img0: np.ndarray,
    img1: np.ndarray,
    H: np.ndarray,
    has_H: bool = True,
    scale: int = 8,
    window_size: int = 5,
    stride: int = 777,
    path: Optional[str] = None,
    dpi: int = 150,
):
    """GAM debug view: where does each (subsampled) image0 coarse cell look
    in image1 under the fitted homography?

    The diagnostic counterpart of the reference's cross_draw
    (reference: model/geo_module.py:120-193) built on this module's
    composited-canvas + LineCollection approach: cyan query cells on img0,
    lime (2r+1)^2 window cells on img1, one translucent line bundle per
    query. With has_H False (RANSAC failed — the case this view is for),
    the cross layers were identity; the figure says so instead of drawing
    a meaningless warp.
    """
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib.collections import LineCollection
    import matplotlib.pyplot as plt

    img0 = np.asarray(img0)
    img1 = np.asarray(img1)
    canvas, x1 = compose_pair(img0, img1)
    fig, ax = plt.subplots(
        figsize=(canvas.shape[1] / 100, canvas.shape[0] / 100), dpi=dpi)
    ax.imshow(canvas, cmap="gray", vmin=0, vmax=1)
    ax.set_axis_off()
    fig.subplots_adjust(left=0, right=1, top=1, bottom=0)

    if not has_H:
        ax.annotate("no homography (RANSAC failed) — cross layers identity",
                    xy=(0.01, 0.99), xycoords="axes fraction", fontsize=12,
                    va="top", ha="left", color="k",
                    bbox=dict(boxstyle="round", fc="w", alpha=0.8))
        if path:
            fig.savefig(path, bbox_inches="tight", pad_inches=0)
            plt.close(fig)
            return None
        return fig

    h0c, w0c = img0.shape[0] // scale, img0.shape[1] // scale
    h1, w1 = img1.shape[:2]
    r = window_size // 2
    H = np.asarray(H, np.float64)
    ids = np.arange(0, h0c * w0c, stride)
    q = np.stack([(ids % w0c) * scale, (ids // w0c) * scale], -1).astype(
        np.float64)                                         # query px (x, y)
    ph = np.concatenate([q, np.ones((len(q), 1))], 1) @ H.T
    ctr = ph[:, :2] / np.where(np.abs(ph[:, 2:]) < 1e-9, 1e-9, ph[:, 2:])
    offs = np.stack(np.meshgrid(np.arange(-r, r + 1) * scale,
                                np.arange(-r, r + 1) * scale,
                                indexing="xy"), -1).reshape(-1, 2)
    win = ctr[:, None, :] + offs[None]                      # [Q, W*W, 2]
    inb = ((win[..., 0] >= 0) & (win[..., 0] < w1)
           & (win[..., 1] >= 0) & (win[..., 1] < h1))

    segs, win_pts, q_pts = [], [], []
    for qi in range(len(q)):
        pts = win[qi][inb[qi]]
        if len(pts) == 0:
            continue
        pts_c = pts + np.array([x1, 0.0])
        segs.extend(np.stack([np.broadcast_to(q[qi], pts_c.shape), pts_c],
                             axis=1))
        win_pts.append(pts_c)
        q_pts.append(q[qi])
    if segs:
        ax.add_collection(LineCollection(
            np.asarray(segs), colors=(0.0, 1.0, 0.0, 0.08), linewidths=1))
        wp = np.concatenate(win_pts)
        ax.scatter(wp[:, 0], wp[:, 1], c="lime", s=2)
        qp = np.asarray(q_pts)
        ax.scatter(qp[:, 0], qp[:, 1], c="cyan", s=14)
    if path:
        fig.savefig(path, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
        return None
    return fig


def log_val_match_figure(tb, out, batch, step: int, tag: str = "val/matches"):
    """Render the first pair's predicted matches to TensorBoard.

    ``out`` is a model MatchOutput (needs ``.fine.mkpts0/mkpts1/valid``);
    ``batch`` carries image0/image1 as [B, H, W, 1] in [0, 1]. Mirrors the
    reference's per-validation match-figure logging from its Lightning loop
    (lightning_geoformer.py figure hooks) without coupling the train loop to
    matplotlib when figures are off.
    """
    import matplotlib.pyplot as plt

    mk0 = np.asarray(out.fine.mkpts0[0])
    mk1 = np.asarray(out.fine.mkpts1[0])
    ok = np.asarray(out.fine.valid[0]).astype(bool)
    img0 = np.asarray(batch["image0"][0, ..., 0])
    img1 = np.asarray(batch["image1"][0, ..., 0])
    fig = make_matching_figure(img0, img1, mk0[ok], mk1[ok],
                               text=[f"step {step}",
                                     f"{int(ok.sum())} matches"])
    tb.add_figure(tag, fig, step)
    plt.close(fig)
