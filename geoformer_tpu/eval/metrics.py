"""Benchmark metrics: error AUC, correctness rates, reprojection distances.

Numerically exact reimplementations of the reference's metric code
(reference: eval_tool/immatch/utils/hpatches_helper.py:13-57) so AUC numbers
are directly comparable.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def cal_error_auc(errors: Sequence[float], thresholds: Sequence[float]
                  ) -> np.ndarray:
    """Area under the cumulative error curve at each threshold
    (hpatches_helper.py:13-25). NaN errors count as infinite."""
    errors = np.asarray(errors, np.float64)
    errors = np.where(np.isnan(errors), np.inf, errors)
    if errors.size == 0:
        return np.zeros(len(thresholds))
    n = len(errors)
    errors = np.append([0.0], np.sort(errors))
    recalls = np.arange(n + 1) / n
    aucs = []
    for t in thresholds:
        last = np.searchsorted(errors, t)
        rcs = np.append(recalls[:last], recalls[last - 1])
        errs = np.append(errors[:last], t)
        aucs.append(np.trapezoid(rcs, x=errs) / t)
    return np.array(aucs)


def correctness(errors: Sequence[float], thresholds: Sequence[float]
                ) -> np.ndarray:
    """Fraction of errors below each threshold (NaN = failure)."""
    errors = np.asarray(errors, np.float64)
    errors = np.where(np.isnan(errors), np.inf, errors)
    if errors.size == 0:
        return np.zeros(len(thresholds))
    return np.array([(errors <= t).mean() for t in thresholds])


def reproj_dists(p1s: np.ndarray, p2s: np.ndarray, H: np.ndarray) -> np.ndarray:
    """Reprojection distances of p1s through H vs p2s
    (hpatches_helper.py:27-34)."""
    ph = np.concatenate([p1s, np.ones((len(p1s), 1))], axis=1)
    proj = ph @ H.T
    proj = proj[:, :2] / proj[:, 2:]
    return np.sqrt(((p2s - proj) ** 2).sum(axis=1))
