"""Lp / relative-Lp error metrics.

Behavioral mirror of /root/reference/scOT/metrics.py:4-55: errors are summed
over pixels AND over the channels present in the given slice, the relative
variant divides by the summed |target|^p with a 1e-10 zero-guard, takes the
(1/p)-th root and reports percent. Implemented for numpy arrays (metrics run on
host after device gather); every function also accepts jnp arrays.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def lp_error(preds, targets, p: int = 1) -> np.ndarray:
    """Absolute Lp error per sample, summed over channels and pixels.

    Args:
        preds, targets: arrays of shape (N, C, H, W) (or (N, C, ...)).
    Returns:
        (N,) array of per-sample errors.
    """
    preds = np.asarray(preds)
    targets = np.asarray(targets)
    n, c = preds.shape[0], preds.shape[1]
    err = np.abs(preds.reshape(n, c, -1) - targets.reshape(n, c, -1)) ** p
    return np.sum(err, axis=(1, 2)) ** (1.0 / p)


def relative_lp_error(preds, targets, p: int = 1, return_percent: bool = True) -> np.ndarray:
    """Relative Lp error per sample (percent by default)."""
    preds = np.asarray(preds)
    targets = np.asarray(targets)
    n, c = preds.shape[0], preds.shape[1]
    preds = preds.reshape(n, c, -1)
    targets = targets.reshape(n, c, -1)
    err = np.sum(np.abs(preds - targets) ** p, axis=(1, 2))
    norm = np.sum(np.abs(targets) ** p, axis=(1, 2))
    norm = np.where(norm == 0, 1e-10, norm)
    out = (err / norm) ** (1.0 / p)
    if return_percent:
        out = out * 100.0
    return out


def mean_relative_lp_error(preds, targets, p: int = 1, return_percent: bool = True):
    return np.mean(relative_lp_error(preds, targets, p, return_percent), axis=0)


def median_relative_lp_error(preds, targets, p: int = 1, return_percent: bool = True):
    return np.median(relative_lp_error(preds, targets, p, return_percent), axis=0)


def error_statistics(errors: np.ndarray, prefix: str = "relative_l1_error") -> Dict[str, float]:
    """Median/mean/std/min/max battery (reference train.py:347-359)."""
    return {
        f"median_{prefix}": float(np.median(errors, axis=0)),
        f"mean_{prefix}": float(np.mean(errors, axis=0)),
        f"std_{prefix}": float(np.std(errors, axis=0)),
        f"min_{prefix}": float(np.min(errors, axis=0)),
        f"max_{prefix}": float(np.max(errors, axis=0)),
    }


def compute_channel_group_metrics(
    preds,
    targets,
    channel_slice_list: Sequence[int],
    channel_names: Sequence[str],
) -> Dict[str, float]:
    """Full per-channel-group metric battery of the reference training script
    (train.py:344-398): per-group relative-L1 stats plus cross-group means.

    Args:
        preds, targets: (N, C, H, W).
        channel_slice_list: cumulative group boundaries, e.g. (0, 1, 3, 4).
        channel_names: printable name per group, e.g. ("rho", "uv", "p").
    """
    preds = np.asarray(preds)
    targets = np.asarray(targets)
    groups = len(channel_slice_list) - 1
    stats = []
    for i in range(groups):
        lo, hi = channel_slice_list[i], channel_slice_list[i + 1]
        errs = relative_lp_error(preds[:, lo:hi], targets[:, lo:hi], p=1, return_percent=True)
        stats.append(error_statistics(errs))

    if groups == 1:
        return dict(stats[0])

    out: Dict[str, float] = {
        "mean_relative_l1_error": float(
            np.mean([s["mean_relative_l1_error"] for s in stats])
        ),
        "mean_over_median_relative_l1_error": float(
            np.mean([s["median_relative_l1_error"] for s in stats])
        ),
    }
    for name, s in zip(channel_names, stats):
        for k, v in s.items():
            out[f"{name}/{k}"] = v
    return out
